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
    "qwen3": lambda: _mk(
        transformers.Qwen3Config, "Qwen3ForCausalLM",
        num_key_value_heads=2, head_dim=16),
    "qwen3_moe": lambda: _mk(
        transformers.Qwen3MoeConfig, "Qwen3MoeForCausalLM",
        num_key_value_heads=2, head_dim=16, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True),
    "olmo2": lambda: _mk(
        transformers.Olmo2Config, "Olmo2ForCausalLM",
        num_key_value_heads=2),
    "olmoe": lambda: _mk(
        transformers.OlmoeConfig, "OlmoeForCausalLM",
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=False),
    "glm4": lambda: _mk(
        transformers.Glm4Config, "Glm4ForCausalLM",
        num_key_value_heads=2, head_dim=16, attention_bias=True),
    "nemotron": lambda: _mk(
        transformers.NemotronConfig, "NemotronForCausalLM",
        num_key_value_heads=2, hidden_act="relu2",
        partial_rotary_factor=0.5, norm_eps=1e-5),
    "dbrx": lambda: transformers.DbrxConfig(
        architectures=["DbrxForCausalLM"], vocab_size=256, d_model=64,
        n_heads=4, n_layers=2, max_seq_len=128, pad_token_id=0,
        attn_config={"kv_n_heads": 2, "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 64, "moe_num_experts": 4,
                    "moe_top_k": 2}),
    "granitemoe": lambda: _mk(
        transformers.GraniteMoeConfig, "GraniteMoeForCausalLM",
        num_key_value_heads=2, num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.25, logits_scaling=2.0),
    "phimoe": lambda: _mk(
        transformers.PhimoeConfig, "PhimoeForCausalLM",
        num_key_value_heads=2, num_local_experts=4, num_experts_per_tok=2,
        intermediate_size=64),
    # MLA families: HF decompresses per head; ours runs absorbed over the
    # latent cache - logit parity proves the two formulations agree
    "deepseek_v2": lambda: transformers.DeepseekV2Config(
        architectures=["DeepseekV2ForCausalLM"], vocab_size=256,
        hidden_size=64, intermediate_size=96, moe_intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, kv_lora_rank=16, q_lora_rank=None,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_group=1, topk_group=1, topk_method="greedy",
        norm_topk_prob=False, routed_scaling_factor=1.0,
        max_position_embeddings=128, pad_token_id=0),
    "deepseek_v3": lambda: transformers.DeepseekV3Config(
        architectures=["DeepseekV3ForCausalLM"], vocab_size=256,
        hidden_size=64, intermediate_size=96, moe_intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, kv_lora_rank=16, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=2.5,
        max_position_embeddings=128, pad_token_id=0),
}

# families whose decode path adds coverage beyond llama's
# (learned positions / sandwich norms+softcaps / MoE routing)
DECODE_FAMILIES = {"gpt2", "gemma2", "mixtral", "bloom", "mistral_swa",
                   "deepseek_v2", "olmo2", "dbrx", "phimoe"}


def _build(family):
    hf_cfg = FAMILIES[family]()
    torch.manual_seed(0)
    hf_model = transformers.AutoModelForCausalLM.from_config(hf_cfg).eval()
    state = {k: v.detach().numpy()
             for k, v in hf_model.state_dict().items()}
    cfg = config_from_hf(hf_cfg.to_dict())
    params = params_from_hf_state(state, cfg, dtype=jnp.float32)
    return hf_model, cfg, params


# Quick-tier flagship families (one per architectural mechanism: vanilla
# GQA, SWA, MoE, MLA, softcapping, ALiBi); the long tail runs under
# `pytest -m full` (VERDICT r03 item 8: default suite budget).
QUICK_FAMILIES = {"gpt2", "qwen2", "mistral_swa", "mixtral", "gemma2",
                  "bloom", "deepseek_v2"}


@pytest.mark.parametrize(
    "family",
    [f if f in QUICK_FAMILIES else pytest.param(f, marks=pytest.mark.full)
     for f in sorted(FAMILIES)])
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


def test_mla_engine_with_compression():
    """MLA end to end through the serving engine: the latent cache
    (num_kv_heads=1, head_size=rank+rope) prefills, decodes and COMPRESSES
    like any other family - KVC evicts whole latent tokens per layer."""
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.sampling_params import SamplingParams

    hf_model, cfg, params = _build("deepseek_v2")
    ecfg = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, cache_dtype="float32"),
        kvcompress=KVCompressConfig(compression_interval=4,
                                    max_kv_per_compression=1 << 16,
                                    max_cache_moves_per_compression=4096),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64,
                                  prefill_buckets=(16, 32)),
        parallel=ParallelConfig(),
    )
    eng = LLMEngine(ecfg, params, num_blocks=256, attn_impl="xla")
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=20).tolist()

    # greedy reference from HF (decompressed MLA)
    seq = list(prompt)
    for _ in range(6):
        with torch.no_grad():
            nxt = int(hf_model(torch.tensor([seq])).logits[0, -1].argmax())
        seq.append(nxt)

    rid = eng.add_request(None, prompt_token_ids=prompt,
                          sampling_params=SamplingParams(
                              temperature=0.0, max_tokens=6,
                              ignore_eos=True))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    assert outs[rid].outputs[0].token_ids == seq[len(prompt):]

    # and with compression: bounded divergence but must run + evict
    eng2 = LLMEngine(ecfg, params, num_blocks=256, attn_impl="xla")
    rid = eng2.add_request(None, prompt_token_ids=prompt,
                           sampling_params=SamplingParams(
                               temperature=0.0, max_tokens=6,
                               ignore_eos=True, max_cache_tokens=8,
                               protected_window_size=4))
    while eng2.has_unfinished_requests():
        eng2.step()
    assert eng2.scheduler.total_evicted_kvs > 0


def _llama_state(vocab=256, D=64, L=2, Hq=4, Hkv=2, I=128):
    torch.manual_seed(1)
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=D, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=Hq,
        num_key_value_heads=Hkv, max_position_embeddings=128)
    m = transformers.LlamaForCausalLM(cfg).eval()
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}, m


def test_registry_only_families_load_and_forward():
    """Families whose HF implementations need remote code (minicpm, orion,
    xverse, exaone): recipes are cited against the reference model files;
    this test checks config mapping + weight loading + a forward pass.
    Xverse is bit-identical llama, so it gets full HF logit parity via a
    llama checkpoint."""
    state, hf_model = _llama_state()
    base_hf = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, max_position_embeddings=128,
                   rms_norm_eps=1e-6)
    prompt = list(range(3, 14))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].float()

    def run(cfg, params):
        cache, bt, bs = build_cache_and_tables(cfg, 16)
        tokens = np.zeros(16, np.int32)
        tokens[:len(prompt)] = prompt
        sm = make_prefill_slot_map(bt[:, 0], len(prompt), 16, bs)
        hidden, _ = D.prefill(params, cfg, jnp.asarray(tokens),
                              jnp.asarray(len(prompt)), jnp.asarray(sm),
                              cache, jnp.asarray(0),
                              AttentionSpec(mode="prefill"))
        return np.asarray(D.compute_logits(params, cfg, hidden))

    # xverse == llama semantics: exact parity
    cfg = config_from_hf(dict(base_hf, architectures=["XverseForCausalLM"]))
    params = params_from_hf_state(state, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(run(cfg, params), hf_logits.numpy(),
                               rtol=3e-3, atol=3e-3)

    # minicpm: llama weights + muP multipliers change logits determinately
    cfg = config_from_hf(dict(base_hf, architectures=["MiniCPMForCausalLM"],
                              scale_emb=2.0, scale_depth=1.4,
                              dim_model_base=32,
                              tie_word_embeddings=False))
    assert cfg.embedding_multiplier == 2.0 and cfg.logits_scaling == 2.0
    out = run(cfg, params_from_hf_state(state, cfg, dtype=jnp.float32))
    assert np.isfinite(out).all()

    # orion: llama naming with layernorm
    cfg = config_from_hf(dict(base_hf, architectures=["OrionForCausalLM"]))
    assert cfg.norm_type == "layernorm"
    out = run(cfg, params_from_hf_state(state, cfg, dtype=jnp.float32))
    assert np.isfinite(out).all()

    # exaone: llama semantics under transformer.h naming -> rename the
    # llama tensors and require exact llama parity
    ren = {}
    for k, v in state.items():
        k2 = (k.replace("model.layers.", "transformer.h.")
               .replace("model.embed_tokens.weight", "transformer.wte.weight")
               .replace("model.norm.weight", "transformer.ln_f.weight")
               .replace("input_layernorm", "ln_1")
               .replace("post_attention_layernorm", "ln_2")
               .replace("self_attn.q_proj", "attn.attention.q_proj")
               .replace("self_attn.k_proj", "attn.attention.k_proj")
               .replace("self_attn.v_proj", "attn.attention.v_proj")
               .replace("self_attn.o_proj", "attn.attention.out_proj")
               .replace("mlp.gate_proj", "mlp.c_fc_0")
               .replace("mlp.up_proj", "mlp.c_fc_1")
               .replace("mlp.down_proj", "mlp.c_proj"))
        ren[k2] = v
    cfg = config_from_hf(dict(base_hf, architectures=["ExaoneForCausalLM"]))
    params = params_from_hf_state(ren, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(run(cfg, params), hf_logits.numpy(),
                               rtol=3e-3, atol=3e-3)


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
              "BaichuanForCausalLM",
              "Qwen3ForCausalLM", "Qwen3MoeForCausalLM",
              "Olmo2ForCausalLM", "OlmoeForCausalLM",
              "GlmForCausalLM", "Glm4ForCausalLM", "ChatGLMModel",
              "NemotronForCausalLM", "DbrxForCausalLM",
              "GraniteMoeForCausalLM", "PhimoeForCausalLM",
              "MiniCPMForCausalLM", "OrionForCausalLM",
              "XverseForCausalLM", "ExaoneForCausalLM",
              "QWenLMHeadModel", "DeciLMForCausalLM", "JAISLMHeadModel",
              "Phi3SmallForCausalLM", "DeepseekForCausalLM",
              "ArcticForCausalLM"):
        assert a in archs, a
    assert len(archs) >= 46, len(archs)


# ---------------------------------------------------------------------------
# Round-3 tranche: qwen-v1, decilm, jais, phi3-small, deepseek-v1, arctic
# ---------------------------------------------------------------------------

def _run_prefill(cfg, params, prompt, T_pad=16):
    cache, bt, bs = build_cache_and_tables(cfg, T_pad)
    tokens = np.zeros(T_pad, np.int32)
    tokens[:len(prompt)] = prompt
    sm = make_prefill_slot_map(bt[:, 0], len(prompt), T_pad, bs)
    hidden, _ = D.prefill(params, cfg, jnp.asarray(tokens),
                          jnp.asarray(len(prompt)), jnp.asarray(sm),
                          cache, jnp.asarray(0),
                          AttentionSpec(mode="prefill"))
    return np.asarray(D.compute_logits(params, cfg, hidden))


def test_qwen_v1_parity():
    """QWenLMHeadModel (reference qwen.py): llama semantics with fused
    biased c_attn, w2=gate / w1=up naming and intermediate halving. A
    renamed llama checkpoint must give exact llama logits."""
    state, hf_model = _llama_state(Hkv=4)
    prompt = list(range(3, 14))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].float()

    L, D_, = 2, 64
    ren = {}
    for i in range(L):
        p = f"model.layers.{i}."
        q = f"transformer.h.{i}."
        ren[q + "ln_1.weight"] = state[p + "input_layernorm.weight"]
        ren[q + "ln_2.weight"] = state[p + "post_attention_layernorm.weight"]
        cattn = np.concatenate([state[p + "self_attn.q_proj.weight"],
                                state[p + "self_attn.k_proj.weight"],
                                state[p + "self_attn.v_proj.weight"]], 0)
        ren[q + "attn.c_attn.weight"] = cattn
        ren[q + "attn.c_attn.bias"] = np.zeros(cattn.shape[0], np.float32)
        ren[q + "attn.c_proj.weight"] = state[p + "self_attn.o_proj.weight"]
        ren[q + "mlp.w2.weight"] = state[p + "mlp.gate_proj.weight"]
        ren[q + "mlp.w1.weight"] = state[p + "mlp.up_proj.weight"]
        ren[q + "mlp.c_proj.weight"] = state[p + "mlp.down_proj.weight"]
    ren["transformer.wte.weight"] = state["model.embed_tokens.weight"]
    ren["transformer.ln_f.weight"] = state["model.norm.weight"]
    ren["lm_head.weight"] = state["lm_head.weight"]

    hf = dict(architectures=["QWenLMHeadModel"], vocab_size=256,
              hidden_size=64, intermediate_size=256,  # halved to 128
              num_hidden_layers=2, num_attention_heads=4,
              seq_length=128, layer_norm_epsilon=1e-6,
              rotary_emb_base=10000.0)
    cfg = config_from_hf(hf)
    assert cfg.intermediate_size == 128
    params = params_from_hf_state(ren, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(_run_prefill(cfg, params, prompt),
                               hf_logits.numpy(), rtol=3e-3, atol=3e-3)


def test_decilm_variable_gqa_parity():
    """DeciLM: per-layer kv-head counts are normalised to uniform GQA by
    consecutive replication (reference decilm.py:49-55 _degroup_weight).
    Oracle: an HF llama whose layer-1 kv weights are the replicated
    pattern; the decilm checkpoint stores the unreplicated 2-head rows."""
    state, hf_model = _llama_state(Hkv=4)
    d = 16  # head size
    for which in ("k", "v"):
        key = f"model.layers.1.self_attn.{which}_proj.weight"
        w = state[key].reshape(4, d, -1)
        rep = np.repeat(w[:2], 2, axis=0).reshape(4 * d, -1)  # [A,A,B,B]
        state[key] = rep
        with torch.no_grad():
            getattr(hf_model.model.layers[1].self_attn,
                    f"{which}_proj").weight.copy_(torch.from_numpy(rep))
    prompt = list(range(3, 14))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].float()

    deci = dict(state)
    for which in ("k", "v"):
        key = f"model.layers.1.self_attn.{which}_proj.weight"
        deci[key] = state[key].reshape(4, d, -1)[0::2].reshape(2 * d, -1)

    hf = dict(architectures=["DeciLMForCausalLM"], vocab_size=256,
              hidden_size=64, intermediate_size=128, num_hidden_layers=2,
              num_attention_heads=4, num_key_value_heads_per_layer=[4, 2],
              max_position_embeddings=128, rms_norm_eps=1e-6)
    cfg = config_from_hf(hf)
    assert cfg.num_kv_heads == 4
    params = params_from_hf_state(deci, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(_run_prefill(cfg, params, prompt),
                               hf_logits.numpy(), rtol=3e-3, atol=3e-3)


def test_deepseek_v1_moe_parity():
    """DeepseekForCausalLM (reference deepseek.py): llama attention + MoE
    with softmax top-k routing. Oracle: an HF Mixtral checkpoint renamed to
    the deepseek-v1 tensor scheme (same routing semantics with
    norm_topk_prob=True, no shared experts)."""
    hf_cfg = _mk(transformers.MixtralConfig, "MixtralForCausalLM",
                 num_key_value_heads=2, num_local_experts=4,
                 num_experts_per_tok=2)
    torch.manual_seed(0)
    hf_model = transformers.AutoModelForCausalLM.from_config(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    prompt = list(range(3, 14))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].float()

    ren = {}
    for k, v in state.items():
        k2 = (k.replace("block_sparse_moe.gate.weight", "mlp.gate.weight")
               .replace("block_sparse_moe.experts.", "mlp.experts."))
        for e in range(4):
            k2 = (k2.replace(f"mlp.experts.{e}.w1.weight",
                             f"mlp.experts.{e}.gate_proj.weight")
                    .replace(f"mlp.experts.{e}.w3.weight",
                             f"mlp.experts.{e}.up_proj.weight")
                    .replace(f"mlp.experts.{e}.w2.weight",
                             f"mlp.experts.{e}.down_proj.weight"))
        ren[k2] = v

    hf = dict(architectures=["DeepseekForCausalLM"], vocab_size=256,
              hidden_size=64, intermediate_size=128, num_hidden_layers=2,
              num_attention_heads=4, num_key_value_heads=2,
              n_routed_experts=4, num_experts_per_tok=2,
              moe_intermediate_size=128, norm_topk_prob=True,
              n_shared_experts=0, max_position_embeddings=128,
              rms_norm_eps=1e-6)
    cfg = config_from_hf(hf)
    params = params_from_hf_state(ren, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(_run_prefill(cfg, params, prompt),
                               hf_logits.numpy(), rtol=3e-3, atol=3e-3)


def _phi3_small_hf():
    return dict(architectures=["Phi3SmallForCausalLM"], vocab_size=256,
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=128, layer_norm_epsilon=1e-5,
                rope_embedding_base=10000.0, rope_position_scale=1.0,
                mup_use_scaling=True, mup_attn_multiplier=1.0,
                mup_embedding_multiplier=10.0, mup_width_multiplier=8.0,
                gegelu_limit=20.0, hidden_act="gegelu",
                dense_attention_every_n_layers=1,
                tie_word_embeddings=True)


def test_phi3_small_loader_and_forward():
    """Phi3Small (reference phi3_small.py): head-major fused qkv
    deinterleave, interleaved gegelu gate/up columns, muP multipliers."""
    rng = np.random.default_rng(0)
    D_, I, L, Hq, Hkv, d = 64, 128, 2, 4, 2, 16
    qpk = Hq // Hkv

    def r(*s):
        return (rng.standard_normal(s) * 0.05).astype(np.float32)

    t = {"model.embed_tokens.weight": r(256, D_),
         "model.final_layernorm.weight": np.ones(D_, np.float32),
         "model.final_layernorm.bias": np.zeros(D_, np.float32)}
    qw = {}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(D_, np.float32)
        t[p + "input_layernorm.bias"] = np.zeros(D_, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(D_, np.float32)
        t[p + "post_attention_layernorm.bias"] = np.zeros(D_, np.float32)
        # build head-major fused qkv from known per-part weights
        q_, k_, v_ = r(Hkv, qpk * d, D_), r(Hkv, d, D_), r(Hkv, d, D_)
        qw[i] = (q_, k_, v_)
        t[p + "self_attn.query_key_value.weight"] = np.concatenate(
            [np.concatenate([q_[g], k_[g], v_[g]], 0) for g in range(Hkv)],
            0)
        t[p + "self_attn.query_key_value.bias"] = np.zeros(
            (Hq + 2 * Hkv) * d, np.float32)
        t[p + "self_attn.dense.weight"] = r(D_, D_)
        t[p + "self_attn.dense.bias"] = np.zeros(D_, np.float32)
        up = r(2 * I, D_)
        t[p + "mlp.up_proj.weight"] = up
        t[p + "mlp.up_proj.bias"] = np.zeros(2 * I, np.float32)
        t[p + "mlp.down_proj.weight"] = r(D_, I)
        t[p + "mlp.down_proj.bias"] = np.zeros(D_, np.float32)

    cfg = config_from_hf(_phi3_small_hf())
    assert cfg.attention_scale == 1.0 / 16  # mup: multiplier / head_dim
    assert cfg.embedding_multiplier == 10.0
    assert cfg.logits_scaling == 8.0  # divides
    params = params_from_hf_state(t, cfg, dtype=jnp.float32)
    # deinterleave checks
    wq = np.asarray(params["layers"]["wq"][0])  # [D, Hq*d]
    np.testing.assert_allclose(
        wq, np.concatenate([qw[0][0][g] for g in range(Hkv)], 0).T)
    wg = np.asarray(params["layers"]["w_gate"][0])
    np.testing.assert_allclose(
        wg, t["model.layers.0.mlp.up_proj.weight"][0::2].T)

    logits = _run_prefill(cfg, params, list(range(3, 14)))
    assert np.isfinite(logits).all()
    # muP scales must actually act: doubling the width multiplier halves
    # the logits
    cfg2 = config_from_hf(dict(_phi3_small_hf(), mup_width_multiplier=16.0))
    logits2 = _run_prefill(cfg2, params, list(range(3, 14)))
    np.testing.assert_allclose(logits2, logits / 2, rtol=1e-5, atol=1e-6)


def test_phi3_small_gegelu_matches_reference():
    """gegelu (reference phi3_small.py:59-70): interleaved halves, clamped,
    quick-gelu gate, (linear + 1)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 8)).astype(np.float32) * 30
    a_gelu, a_linear = x[..., 0::2], x[..., 1::2]
    limit = 20.0
    ag = np.minimum(a_gelu, limit)
    al = np.clip(a_linear, -limit, limit)
    want = (ag * (1 / (1 + np.exp(-1.702 * ag)))) * (al + 1)

    from kvcompress_tpu.config import ModelConfig
    cfg = ModelConfig(hidden_act="gegelu", gegelu_limit=limit,
                      mlp_type="gated")
    lw = {"w_gate": jnp.eye(8, 4, dtype=jnp.float32),
          "w_up": jnp.zeros((8, 4), jnp.float32),
          "w_down": jnp.eye(4, 8, dtype=jnp.float32)}
    # route gate = even cols, up = odd cols through identity projections
    gate_w = np.zeros((8, 4), np.float32)
    up_w = np.zeros((8, 4), np.float32)
    for j in range(4):
        gate_w[2 * j, j] = 1.0
        up_w[2 * j + 1, j] = 1.0
    lw["w_gate"] = jnp.asarray(gate_w)
    lw["w_up"] = jnp.asarray(up_w)
    got = np.asarray(D._dense_mlp(jnp.asarray(x), lw, cfg))
    np.testing.assert_allclose(got[:, :4], want, rtol=1e-5, atol=1e-5)


def test_phi3_small_blocksparse_rejected():
    with pytest.raises(ValueError, match="blocksparse"):
        config_from_hf(dict(_phi3_small_hf(),
                            blocksparse_block_size=64,
                            dense_attention_every_n_layers=2))


def test_jais_registry_and_scales():
    """JAIS (reference jais.py): alibi + muP scales + swiglu gating wired;
    Conv1D [in, out] tensors load untransposed."""
    D_, I, L, H = 64, 96, 2, 4
    rng = np.random.default_rng(2)

    def r(*s):
        return (rng.standard_normal(s) * 0.05).astype(np.float32)

    t = {"transformer.wte.weight": r(256, D_),
         "transformer.ln_f.weight": np.ones(D_, np.float32),
         "transformer.ln_f.bias": np.zeros(D_, np.float32)}
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = np.ones(D_, np.float32)
        t[p + "ln_1.bias"] = np.zeros(D_, np.float32)
        t[p + "ln_2.weight"] = np.ones(D_, np.float32)
        t[p + "ln_2.bias"] = np.zeros(D_, np.float32)
        t[p + "attn.c_attn.weight"] = r(D_, 3 * D_)
        t[p + "attn.c_attn.bias"] = np.zeros(3 * D_, np.float32)
        t[p + "attn.c_proj.weight"] = r(D_, D_)
        t[p + "attn.c_proj.bias"] = np.zeros(D_, np.float32)
        t[p + "mlp.c_fc.weight"] = r(D_, I)
        t[p + "mlp.c_fc.bias"] = np.zeros(I, np.float32)
        t[p + "mlp.c_fc2.weight"] = r(D_, I)
        t[p + "mlp.c_fc2.bias"] = np.zeros(I, np.float32)
        t[p + "mlp.c_proj.weight"] = r(I, D_)
        t[p + "mlp.c_proj.bias"] = np.zeros(D_, np.float32)

    hf = dict(architectures=["JAISLMHeadModel"], vocab_size=256,
              n_embd=64, n_head=4, n_layer=2, n_positions=128,
              n_inner=96, activation_function="swiglu",
              position_embedding_type="alibi",
              mup_embeddings_scale=3.0, mup_output_alpha=2.0,
              mup_width_scale=0.25, scale_qk_dot_by_d=True,
              layer_norm_epsilon=1e-5, tie_word_embeddings=True)
    cfg = config_from_hf(hf)
    assert cfg.alibi and cfg.pos_embedding == "none"
    assert cfg.embedding_multiplier == 3.0
    assert cfg.logits_scaling == 1.0 / 0.5   # 1 / (alpha * width_scale)
    assert cfg.attention_scale == 1.0 / 16   # 1/d, not 1/sqrt(d)
    assert cfg.mlp_type == "gated" and cfg.hidden_act == "silu"
    params = params_from_hf_state(t, cfg, dtype=jnp.float32)
    # swiglu orientation: c_fc2 is the gate
    np.testing.assert_allclose(
        np.asarray(params["layers"]["w_gate"][0]),
        t["transformer.h.0.mlp.c_fc2.weight"])
    logits = _run_prefill(cfg, params, list(range(3, 14)))
    assert np.isfinite(logits).all()
    # embedding scale acts on the forward
    cfg2 = config_from_hf(dict(hf, mup_embeddings_scale=6.0))
    logits2 = _run_prefill(cfg2, params, list(range(3, 14)))
    assert not np.allclose(logits2, logits)


def _arctic_rename_dense(state):
    """Rename a llama state dict into an all-dense arctic checkpoint."""
    ren = {}
    for k, v in state.items():
        k2 = (k.replace("mlp.gate_proj.weight", "block_sparse_moe.mlp.w1.weight")
               .replace("mlp.up_proj.weight", "block_sparse_moe.mlp.w3.weight")
               .replace("mlp.down_proj.weight", "block_sparse_moe.mlp.w2.weight"))
        ren[k2] = v
    return ren


def _arctic_hf(**over):
    hf = dict(architectures=["ArcticForCausalLM"], vocab_size=256,
              hidden_size=64, intermediate_size=128, num_hidden_layers=2,
              num_attention_heads=4, num_key_value_heads=2,
              num_local_experts=2, num_experts_per_tok=1,
              moe_layer_frequency=2, use_residual=True,
              max_position_embeddings=128, rms_norm_eps=1e-6)
    hf.update(over)
    return hf


def test_arctic_dense_layers_match_llama():
    """Arctic layers WITHOUT a router (dense FFN) follow the standard
    residual dataflow (reference arctic.py:352-357 else-branch), so an
    all-dense arctic checkpoint is exactly llama."""
    state, hf_model = _llama_state()
    prompt = list(range(3, 14))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].float()
    cfg = config_from_hf(_arctic_hf())
    params = params_from_hf_state(_arctic_rename_dense(state), cfg,
                                  dtype=jnp.float32)
    np.testing.assert_allclose(_run_prefill(cfg, params, prompt),
                               hf_logits.numpy(), rtol=3e-3, atol=3e-3)


def test_arctic_residual_moe_layer():
    """A use_residual MoE layer adds residual_mlp(residual_norm(post-attn))
    + experts(post_norm(PRE-attn)) (reference arctic.py:344-352). With the
    experts zeroed the layer must equal llama; with the FFN moved into
    expert slot 0 instead, the output must CHANGE (the routed branch reads
    the pre-attention stream, not the post-attention one)."""
    state, hf_model = _llama_state()
    prompt = list(range(3, 14))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].float()

    D_, I = 64, 128
    base = _arctic_rename_dense(state)
    p1 = "model.layers.1."
    # layer 1 becomes a use_residual MoE layer: residual_mlp takes the old
    # FFN (width I padded into the hidden-width residual slot), experts 0
    moe = dict(base)
    moe[p1 + "residual_mlp.w1.weight"] = moe.pop(
        p1 + "block_sparse_moe.mlp.w1.weight")
    moe[p1 + "residual_mlp.w3.weight"] = moe.pop(
        p1 + "block_sparse_moe.mlp.w3.weight")
    moe[p1 + "residual_mlp.w2.weight"] = moe.pop(
        p1 + "block_sparse_moe.mlp.w2.weight")
    moe[p1 + "residual_layernorm.weight"] = state[
        "model.layers.1.post_attention_layernorm.weight"]
    moe[p1 + "block_sparse_moe.gate.weight"] = np.zeros((2, D_), np.float32)
    for e in range(2):
        moe[p1 + f"block_sparse_moe.experts.{e}.w1.weight"] = np.zeros(
            (I, D_), np.float32)
        moe[p1 + f"block_sparse_moe.experts.{e}.w3.weight"] = np.zeros(
            (I, D_), np.float32)
        moe[p1 + f"block_sparse_moe.experts.{e}.w2.weight"] = np.zeros(
            (D_, I), np.float32)

    cfg = config_from_hf(_arctic_hf())
    params = params_from_hf_state(moe, cfg, dtype=jnp.float32)
    got = _run_prefill(cfg, params, prompt)
    np.testing.assert_allclose(got, hf_logits.numpy(), rtol=3e-3, atol=3e-3)

    # now move the FFN into expert 0 and zero the residual_mlp: must differ
    # from the zero-expert case because the routed input is PRE-attention
    swapped = dict(moe)
    for w in ("w1", "w3", "w2"):
        swapped[p1 + f"block_sparse_moe.experts.0.{w}.weight"] = \
            moe[p1 + f"residual_mlp.{w}.weight"]
    swapped[p1 + "residual_mlp.w1.weight"] = np.zeros((D_, D_), np.float32)
    swapped[p1 + "residual_mlp.w3.weight"] = np.zeros((D_, D_), np.float32)
    swapped[p1 + "residual_mlp.w2.weight"] = np.zeros((D_, D_), np.float32)
    params2 = params_from_hf_state(swapped, cfg, dtype=jnp.float32)
    got2 = _run_prefill(cfg, params2, prompt)
    assert not np.allclose(got2, got, atol=1e-4), (
        "routed branch appears to read the post-attention stream")


def test_arctic_use_residual_false_rejected():
    with pytest.raises(ValueError, match="use_residual"):
        config_from_hf(_arctic_hf(use_residual=False))


def test_known_unsupported_archs_fail_loudly():
    from kvcompress_tpu.models.registry import _KNOWN_UNSUPPORTED
    for arch, reason in _KNOWN_UNSUPPORTED.items():
        with pytest.raises(ValueError, match="intentionally unsupported"):
            config_from_hf(dict(architectures=[arch], vocab_size=16,
                                hidden_size=16, num_hidden_layers=1,
                                num_attention_heads=2,
                                intermediate_size=16))


def test_qwen_vl_rejected_loudly():
    """A Qwen-VL checkpoint declares the TEXT architecture string plus a
    `visual` config; the text loader must not serve it silently wrong
    (fail-loudly contract of _KNOWN_UNSUPPORTED)."""
    from kvcompress_tpu.models.registry import config_from_hf
    with pytest.raises(ValueError, match="Qwen-VL"):
        config_from_hf({"architectures": ["QWenLMHeadModel"],
                        "visual": {"image_size": 448},
                        "hidden_size": 64, "num_attention_heads": 4,
                        "num_hidden_layers": 2, "intermediate_size": 128,
                        "vocab_size": 256})


def test_arctic_residual_runs_quantized():
    """The arctic residual branch reads shared_gate/up/down through the
    quantization-aware view (_shared_mlp_view): an int8-quantized arctic
    model must trace and run (regression: bare lw["shared_gate"] reads
    KeyError'd after quantize_params renamed the leaves)."""
    from kvcompress_tpu.quantization.int8 import quantize_params
    state, _ = _llama_state()
    D_, I = 64, 128
    base = _arctic_rename_dense(state)
    p1 = "model.layers.1."
    base[p1 + "residual_mlp.w1.weight"] = base.pop(
        p1 + "block_sparse_moe.mlp.w1.weight")
    base[p1 + "residual_mlp.w3.weight"] = base.pop(
        p1 + "block_sparse_moe.mlp.w3.weight")
    base[p1 + "residual_mlp.w2.weight"] = base.pop(
        p1 + "block_sparse_moe.mlp.w2.weight")
    base[p1 + "residual_layernorm.weight"] = state[
        "model.layers.1.post_attention_layernorm.weight"]
    for e in range(2):
        pe = p1 + f"block_sparse_moe.experts.{e}."
        base[pe + "w1.weight"] = np.zeros((I, D_), np.float32)
        base[pe + "w3.weight"] = np.zeros((I, D_), np.float32)
        base[pe + "w2.weight"] = np.zeros((D_, I), np.float32)
    base[p1 + "block_sparse_moe.gate.weight"] = np.zeros(
        (2, D_), np.float32)
    cfg = config_from_hf(_arctic_hf())
    params = params_from_hf_state(base, cfg, dtype=jnp.float32)
    qparams = quantize_params(params)
    assert "shared_gate_q8" in qparams["layers"]
    logits = _run_prefill(cfg, qparams, list(range(3, 14)))
    assert np.all(np.isfinite(logits))
