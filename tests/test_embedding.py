"""Embedding mode: pooled/normalized prompt embeddings (reference
llama_embedding + PoolingParams + /v1/embeddings)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.pooling_params import PoolingParams
from tests.test_engine import VOCAB, tiny_cfg


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_cfg()
    params = init_llama_params(cfg.model, seed=0, dtype=jnp.float32)
    return LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")


def test_embed_shapes_and_norm(engine):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, VOCAB, size=9).tolist()
    emb = np.asarray(engine.programs.embed(np.asarray(ids, np.int32),
                                           len(ids)))
    assert emb.shape == (engine.cfg.model.hidden_size,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-5)


def test_embed_padding_invariant(engine):
    """Padding to a larger bucket must not change the embedding."""
    rng = np.random.default_rng(1)
    ids = rng.integers(0, VOCAB, size=7).tolist()
    f16 = engine.programs._build_embed(16, "mean", True)
    f32 = engine.programs._build_embed(32, "mean", True)
    t16 = np.zeros(16, np.int32)
    t32 = np.zeros(32, np.int32)
    t16[:7] = ids
    t32[:7] = ids
    e1 = np.asarray(f16(engine.programs.params, jnp.asarray(t16),
                        jnp.asarray(7)))
    e2 = np.asarray(f32(engine.programs.params, jnp.asarray(t32),
                        jnp.asarray(7)))
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-5)


def test_pooling_types_differ(engine):
    rng = np.random.default_rng(2)
    ids = rng.integers(0, VOCAB, size=8).tolist()
    arr = np.asarray(ids, np.int32)
    last = np.asarray(engine.programs.embed(arr, 8, pooling="last"))
    mean = np.asarray(engine.programs.embed(arr, 8, pooling="mean"))
    cls = np.asarray(engine.programs.embed(arr, 8, pooling="cls"))
    assert not np.allclose(last, mean)
    assert not np.allclose(last, cls)


def test_pooling_params_validation():
    with pytest.raises(ValueError):
        PoolingParams(pooling_type="max")
