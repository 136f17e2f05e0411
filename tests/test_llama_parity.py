"""Logit parity of the JAX Llama against HuggingFace transformers (torch CPU)
on a tiny random model - the analogue of the reference's vllm_runner vs
hf_runner greedy/logprob comparisons (tests/basic_correctness/)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from kvcompress_tpu.config import ModelConfig
from kvcompress_tpu.models import llama as L
from kvcompress_tpu.models.weights import params_from_hf_state, config_from_hf
from kvcompress_tpu.models.llama import KVCache, AttentionSpec


@pytest.fixture(scope="module")
def tiny_models():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    cfg = config_from_hf(hf_cfg.to_dict())
    params = params_from_hf_state(state, cfg, dtype=jnp.float32)
    return hf_model, cfg, params


def make_prefill_slot_map(bt_seq, seq_len, T_pad, bs):
    """bt_seq [L, H, nb] -> slot map [L, T, H] (-1 beyond seq_len)."""
    Ln, H, nb = bt_seq.shape
    t_idx = np.arange(T_pad)
    blocks = bt_seq[:, :, np.minimum(t_idx // bs, nb - 1)]  # [L, H, T]
    sm = blocks * bs + (t_idx % bs)[None, None, :]
    sm = np.where(t_idx[None, None, :] < seq_len, sm, -1)
    return sm.transpose(0, 2, 1).astype(np.int32)


def build_cache_and_tables(cfg, max_len, bs=4, num_seqs=1):
    nb = -(-max_len // bs)
    num_blocks = 1 + cfg.num_layers * cfg.num_kv_heads * nb * num_seqs
    d = cfg.head_size
    cache = KVCache(
        k=jnp.zeros((num_blocks, bs, d), jnp.float32),
        v=jnp.zeros((num_blocks, bs, d), jnp.float32),
        metrics=jnp.zeros((num_blocks, bs), jnp.float32),
        positions=jnp.full((num_blocks, bs), -1, jnp.int32),
    )
    bt = np.arange(
        1, num_blocks, dtype=np.int32).reshape(
        cfg.num_layers, num_seqs, cfg.num_kv_heads, nb)
    return cache, bt, bs


def test_prefill_and_decode_parity(tiny_models):
    hf_model, cfg, params = tiny_models
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=11).tolist()
    n_decode = 4
    T_pad = 16

    # HF reference: full forward over the growing sequence, greedy.
    seq = list(prompt)
    hf_logits = []
    for _ in range(n_decode + 1):
        with torch.no_grad():
            out = hf_model(torch.tensor([seq])).logits[0, -1].numpy()
        hf_logits.append(out)
        seq.append(int(out.argmax()))

    # Ours: prefill then paged decode steps.
    max_len = len(prompt) + n_decode + 1
    cache, bt, bs = build_cache_and_tables(cfg, max_len)
    nb = bt.shape[-1]
    spec = AttentionSpec(mode="prefill")

    seq_len = len(prompt)
    tokens = np.zeros(T_pad, np.int32)
    tokens[:seq_len] = prompt
    slot_map = make_prefill_slot_map(bt[:, 0], seq_len, T_pad, bs)

    last_hidden, cache = L.prefill(
        params, cfg, jnp.asarray(tokens), jnp.asarray(seq_len),
        jnp.asarray(slot_map), cache, jnp.asarray(0), spec)
    logits = np.asarray(L.compute_logits(params, cfg, last_hidden))
    np.testing.assert_allclose(logits, hf_logits[0], rtol=2e-3, atol=2e-3)

    # decode steps
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
        hidden, cache = L.decode(
            params, cfg,
            jnp.asarray([tok], jnp.int32), jnp.asarray([pos], jnp.int32),
            jnp.asarray(bt), jnp.asarray(ctx), jnp.asarray(sm), cache,
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), dspec)
        logits = np.asarray(L.compute_logits(params, cfg, hidden))[0]
        np.testing.assert_allclose(logits, hf_logits[step + 1], rtol=2e-3,
                                   atol=2e-3)


def test_decode_metrics_recorded(tiny_models):
    """Decode must accumulate positive metric mass on attended KVs."""
    hf_model, cfg, params = tiny_models
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=7).tolist()
    cache, bt, bs = build_cache_and_tables(cfg, 16)
    nb = bt.shape[-1]
    seq_len = len(prompt)
    T_pad = 8
    tokens = np.zeros(T_pad, np.int32)
    tokens[:seq_len] = prompt
    slot_map = make_prefill_slot_map(bt[:, 0], seq_len, T_pad, bs)
    _, cache = L.prefill(
        params, cfg, jnp.asarray(tokens), jnp.asarray(seq_len),
        jnp.asarray(slot_map), cache, jnp.asarray(0),
        AttentionSpec(mode="prefill"))
    m = np.asarray(cache.metrics)
    used = np.asarray(slot_map)[np.asarray(slot_map) >= 0]
    assert (m.reshape(-1)[used] > 0).any()
    # positions written
    p = np.asarray(cache.positions).reshape(-1)
    assert set(p[used].tolist()) == set(range(seq_len))
