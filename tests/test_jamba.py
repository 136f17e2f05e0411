"""Jamba hybrid model parity vs HF (reference vllm/model_executor/models/
jamba.py): full-prompt logits, stateful greedy generation through the
(conv, ssm, kv) carries, and the serving-surface rejection that mirrors
the reference's llama-only KVC path."""

import numpy as np
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from kvcompress_tpu.models import jamba as J


def tiny_jamba():
    cfg = transformers.JambaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=4,
        attn_layer_offset=1, attn_layer_period=2, expert_layer_offset=1,
        expert_layer_period=2, num_experts=3, num_experts_per_tok=2,
        max_position_embeddings=64, use_mamba_kernels=False,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    return transformers.JambaForCausalLM(cfg).eval(), cfg


@pytest.fixture(scope="module")
def model():
    m, hf_cfg = tiny_jamba()
    cfg = J.config_from_hf(hf_cfg.to_dict())
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = J.params_from_hf(state, cfg, dtype=jnp.float32)
    return m, cfg, params


def test_layer_layout(model):
    _, cfg, params = model
    assert [cfg.is_attn(i) for i in range(4)] == [False, True, False, True]
    assert [cfg.is_moe(i) for i in range(4)] == [False, True, False, True]
    assert "mamba" in params["layers"][0]
    assert "wq" in params["layers"][1]
    assert "router" in params["layers"][1]


def test_prompt_logits_match_hf(model):
    m, cfg, params = model
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, size=12)
    with torch.no_grad():
        ref = m(input_ids=torch.tensor(toks[None])).logits[0].numpy()
    got, _ = J.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.full
def test_greedy_generate_matches_hf(model):
    m, cfg, params = model
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=10).tolist()
    with torch.no_grad():
        out = m.generate(torch.tensor([prompt]), max_new_tokens=8,
                         do_sample=False)
    ref = out[0, len(prompt):].tolist()
    got = J.generate_greedy(params, cfg, prompt, 8)
    assert got == ref


def test_serving_surface_rejects_jamba():
    """Parity with the reference: its KVC engine blesses llama-family
    attention only; jamba is served by the VANILLA engine there, which
    has no counterpart here - the registry must reject it loudly."""
    from kvcompress_tpu.models.registry import config_from_hf
    with pytest.raises(ValueError, match="models/jamba"):
        config_from_hf({"architectures": ["JambaForCausalLM"]})


def test_pure_mamba_matches_hf():
    """MambaForCausalLM (reference models/mamba.py role): same mixer ops
    without dt/B/C norms or FFN sub-blocks; logits and stateful greedy
    generation must match HF."""
    cfg_hf = transformers.MambaConfig(
        vocab_size=128, hidden_size=32, state_size=8,
        num_hidden_layers=2, conv_kernel=4, expand=2, time_step_rank=4)
    torch.manual_seed(3)
    m = transformers.MambaForCausalLM(cfg_hf).eval()
    cfg = J.config_from_hf_mamba(cfg_hf.to_dict())
    assert not any(cfg.is_attn(i) or cfg.is_moe(i)
                   for i in range(cfg.num_layers))
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = J.params_from_hf_mamba(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(4)
    toks = rng.integers(0, 128, size=11)
    with torch.no_grad():
        ref = m(input_ids=torch.tensor(toks[None])).logits[0].numpy()
    got, _ = J.forward(params, cfg, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)

    prompt = rng.integers(0, 128, size=9).tolist()
    with torch.no_grad():
        out = m.generate(torch.tensor([prompt]), max_new_tokens=6,
                         do_sample=False)
    assert J.generate_greedy(params, cfg, prompt, 6) \
        == out[0, len(prompt):].tolist()
