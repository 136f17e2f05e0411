"""Logit parity of the generic config-driven decoder (models/decoder.py)
against HuggingFace transformers (torch CPU) across model families, on tiny
random models - the analogue of the reference's tests/models/ suite
(vllm_runner vs hf_runner comparisons over the 64-architecture zoo)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from kvcompress_tpu.models import decoder as D
from kvcompress_tpu.models.decoder import AttentionSpec
from kvcompress_tpu.models.registry import (config_from_hf,
                                            params_from_hf_state,
                                            supported_architectures)
from tests.test_llama_parity import (build_cache_and_tables,
                                     make_prefill_slot_map)

TINY = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=128,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)


def _mk(config_cls, arch, **kw):
    cfg = dict(TINY)
    cfg.update(kw)
    return config_cls(architectures=[arch], **cfg)


FAMILIES = {
    "gpt2": lambda: transformers.GPT2Config(
        architectures=["GPT2LMHeadModel"], vocab_size=256,
        n_embd=64, n_layer=2, n_head=4, n_positions=128,
        activation_function="gelu_new"),
    "opt": lambda: _mk(
        transformers.OPTConfig, "OPTForCausalLM",
        ffn_dim=128, word_embed_proj_dim=64, do_layer_norm_before=True,
        activation_function="relu"),
    "gpt_neox": lambda: _mk(
        transformers.GPTNeoXConfig, "GPTNeoXForCausalLM",
        rotary_pct=0.25, use_parallel_residual=True, hidden_act="gelu"),
    "gemma": lambda: _mk(
        transformers.GemmaConfig, "GemmaForCausalLM",
        num_key_value_heads=2, head_dim=16,
        hidden_activation="gelu_pytorch_tanh"),
    "gemma2": lambda: _mk(
        transformers.Gemma2Config, "Gemma2ForCausalLM",
        num_key_value_heads=2, head_dim=16,
        query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=64,
        hidden_activation="gelu_pytorch_tanh"),
    "phi3": lambda: _mk(
        transformers.Phi3Config, "Phi3ForCausalLM",
        num_key_value_heads=2),
    "phi": lambda: _mk(
        transformers.PhiConfig, "PhiForCausalLM",
        partial_rotary_factor=0.5, hidden_act="gelu_new"),
    "qwen2": lambda: _mk(
        transformers.Qwen2Config, "Qwen2ForCausalLM",
        num_key_value_heads=2),
    # sliding window SMALLER than the prompt so the window mask binds in
    # both prefill and decode (the reference rejects sliding-window models,
    # vllm/config.py:631-635; our XLA path implements them)
    "mistral_swa": lambda: _mk(
        transformers.MistralConfig, "MistralForCausalLM",
        num_key_value_heads=2, sliding_window=8),
    "stablelm": lambda: _mk(
        transformers.StableLmConfig, "StableLmForCausalLM",
        num_key_value_heads=2, partial_rotary_factor=0.25,
        use_qkv_bias=False, use_parallel_residual=False),
    "starcoder2": lambda: _mk(
        transformers.Starcoder2Config, "Starcoder2ForCausalLM",
        num_key_value_heads=2, use_bias=True, tie_word_embeddings=True,
        hidden_act="gelu_pytorch_tanh"),
    "mixtral": lambda: _mk(
        transformers.MixtralConfig, "MixtralForCausalLM",
        num_key_value_heads=2, num_local_experts=4, num_experts_per_tok=2),
    "gptj": lambda: transformers.GPTJConfig(
        architectures=["GPTJForCausalLM"], vocab_size=256,
        n_embd=64, n_layer=2, n_head=4, n_positions=128, rotary_dim=8,
        activation_function="gelu_new"),
    "falcon": lambda: _mk(
        transformers.FalconConfig, "FalconForCausalLM",
        multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False),
    "cohere": lambda: _mk(
        transformers.CohereConfig, "CohereForCausalLM",
        logit_scale=0.0625, use_qk_norm=False),
    "bloom": lambda: transformers.BloomConfig(
        architectures=["BloomForCausalLM"], vocab_size=256,
        hidden_size=64, n_layer=2, n_head=4,
        pad_token_id=0, bos_token_id=1, eos_token_id=2),
    "mpt": lambda: transformers.MptConfig(
        architectures=["MptForCausalLM"], vocab_size=256,
        d_model=64, n_heads=4, n_layers=2, expansion_ratio=4,
        max_seq_len=128),
    "gpt_bigcode": lambda: transformers.GPTBigCodeConfig(
        architectures=["GPTBigCodeForCausalLM"], vocab_size=256,
        n_embd=64, n_layer=2, n_head=4, n_positions=128,
        multi_query=True, activation_function="gelu_pytorch_tanh",
        bos_token_id=1, eos_token_id=2),
    "persimmon": lambda: _mk(
        transformers.PersimmonConfig, "PersimmonForCausalLM",
        partial_rotary_factor=0.5, qk_layernorm=True, hidden_act="relu2"),
    "qwen2_moe": lambda: _mk(
        transformers.Qwen2MoeConfig, "Qwen2MoeForCausalLM",
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, shared_expert_intermediate_size=64,
        decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=False),
}

# families whose decode path adds coverage beyond llama's
# (learned positions / sandwich norms+softcaps / MoE routing)
DECODE_FAMILIES = {"gpt2", "gemma2", "mixtral", "bloom", "mistral_swa"}


def _build(family):
    hf_cfg = FAMILIES[family]()
    torch.manual_seed(0)
    hf_model = transformers.AutoModelForCausalLM.from_config(hf_cfg).eval()
    state = {k: v.detach().numpy()
             for k, v in hf_model.state_dict().items()}
    cfg = config_from_hf(hf_cfg.to_dict())
    params = params_from_hf_state(state, cfg, dtype=jnp.float32)
    return hf_model, cfg, params


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_prefill_parity(family):
    hf_model, cfg, params = _build(family)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=11).tolist()
    n_decode = 2 if family in DECODE_FAMILIES else 0
    T_pad = 16

    seq = list(prompt)
    hf_logits = []
    for _ in range(n_decode + 1):
        with torch.no_grad():
            out = hf_model(torch.tensor([seq])).logits[0, -1].float().numpy()
        hf_logits.append(out)
        seq.append(int(out.argmax()))

    max_len = len(prompt) + n_decode + 1
    cache, bt, bs = build_cache_and_tables(cfg, max_len)
    seq_len = len(prompt)
    tokens = np.zeros(T_pad, np.int32)
    tokens[:seq_len] = prompt
    slot_map = make_prefill_slot_map(bt[:, 0], seq_len, T_pad, bs)

    last_hidden, cache = D.prefill(
        params, cfg, jnp.asarray(tokens), jnp.asarray(seq_len),
        jnp.asarray(slot_map), cache, jnp.asarray(0),
        AttentionSpec(mode="prefill"))
    logits = np.asarray(D.compute_logits(params, cfg, last_hidden))
    np.testing.assert_allclose(logits, hf_logits[0], rtol=3e-3, atol=3e-3)

    ctx_len = seq_len
    dspec = AttentionSpec(mode="decode")
    for step in range(n_decode):
        tok = int(np.argmax(logits))
        assert tok == int(hf_logits[step].argmax())
        pos = ctx_len
        ctx_len += 1
        ctx = np.full((cfg.num_layers, 1, cfg.num_kv_heads), ctx_len,
                      np.int32)
        sm = (bt[:, 0, :, (ctx_len - 1) // bs] * bs
              + (ctx_len - 1) % bs).astype(np.int32)[:, None, :]
        hidden, cache = D.decode(
            params, cfg,
            jnp.asarray([tok], jnp.int32), jnp.asarray([pos], jnp.int32),
            jnp.asarray(bt), jnp.asarray(ctx), jnp.asarray(sm), cache,
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), dspec)
        logits = np.asarray(D.compute_logits(params, cfg, hidden))[0]
        np.testing.assert_allclose(logits, hf_logits[step + 1], rtol=3e-3,
                                   atol=3e-3)


def test_registry_surface():
    archs = supported_architectures()
    for a in ("GPTBigCodeForCausalLM",
              "GPTJForCausalLM", "FalconForCausalLM", "CohereForCausalLM",
              "BloomForCausalLM", "MptForCausalLM", "PersimmonForCausalLM",
              "LlamaForCausalLM", "MistralForCausalLM", "Qwen2ForCausalLM",
              "GemmaForCausalLM", "Gemma2ForCausalLM", "Phi3ForCausalLM",
              "PhiForCausalLM", "GPT2LMHeadModel", "OPTForCausalLM",
              "GPTNeoXForCausalLM", "StableLmForCausalLM",
              "Starcoder2ForCausalLM", "InternLM2ForCausalLM",
              "MixtralForCausalLM", "Qwen2MoeForCausalLM",
              "GraniteForCausalLM", "OlmoForCausalLM",
              "BaichuanForCausalLM"):
        assert a in archs, a
