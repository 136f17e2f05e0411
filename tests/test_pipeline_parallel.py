"""Pipeline parallelism: the GPipe shard_map schedule must reproduce the
plain scan-over-layers forward exactly (parallel/pipeline.py vs
models/decoder.py:620-643), for pp alone and composed with an auto TP axis
(the role of the reference's pp groups, parallel_state.py:798-807)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import ModelConfig
from kvcompress_tpu.models import decoder as D
from kvcompress_tpu.parallel.pipeline import (
    _causal_attn, build_pp_mesh, pipeline_forward, shard_params_pp)

L = 8


def tiny_cfg():
    return ModelConfig(
        num_layers=L, num_heads=4, num_kv_heads=2, head_size=16,
        hidden_size=64, intermediate_size=128, vocab_size=128,
        max_model_len=64, rope_theta=10000.0, dtype="float32")


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = D.init_params(cfg, seed=0, dtype=jnp.float32)
    return cfg, params


def reference_hidden(cfg, params, token_mb, pos_mb):
    def one(tok, pos):
        xs = jnp.zeros((cfg.num_layers, 1), jnp.int32)
        h, _ = D.forward(params, cfg, tok, pos, None, _causal_attn, xs)
        return h
    return jnp.stack([one(token_mb[i], pos_mb[i])
                      for i in range(token_mb.shape[0])])


@pytest.mark.parametrize("pp,tp", [(2, 1), (4, 1), (2, 2)])
def test_pipeline_matches_plain_forward(setup, pp, tp):
    if len(jax.devices()) < pp * tp:
        pytest.skip(f"needs {pp * tp} devices")
    cfg, params = setup
    rng = np.random.default_rng(0)
    M, Tm = 4, 16
    token_mb = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(M, Tm)),
                           jnp.int32)
    pos_mb = jnp.broadcast_to(jnp.arange(Tm, dtype=jnp.int32), (M, Tm))

    ref = np.asarray(reference_hidden(cfg, params, token_mb, pos_mb))

    mesh = build_pp_mesh(pp, tp)
    pparams = shard_params_pp(params, mesh)
    got = jax.jit(
        lambda pr, t, po: pipeline_forward(pr, cfg, t, po, mesh)
    )(pparams, token_mb, pos_mb)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_pipeline_rejects_indivisible_layers(setup):
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    cfg, params = setup
    mesh = build_pp_mesh(3, 1)
    tok = jnp.zeros((2, 8), jnp.int32)
    with pytest.raises(AssertionError, match="divisible"):
        pipeline_forward(params, cfg, tok, tok, mesh)
