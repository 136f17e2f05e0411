"""Pallas prefill flash-attention kernel vs the XLA reference
(ops/attention.py prefill_attention), interpret mode on CPU - the oracle
pattern of the reference's kernel tests (tests/kernels/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.ops import attention as att
from kvcompress_tpu.ops.pallas import prefill_attention as ppf


@pytest.mark.parametrize("seq_len,T", [(128, 128), (100, 128), (300, 512)])
@pytest.mark.parametrize("use_l2,use_maxpool", [(True, True), (False, False)])
def test_prefill_kernel_vs_xla(seq_len, T, use_l2, use_maxpool):
    rng = np.random.default_rng(seq_len + use_l2)
    Hq, Hkv, d = 4, 2, 128
    scale = d ** -0.5
    window, buffer_len = 32, 4
    q = jnp.asarray(rng.standard_normal((T, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.float32)

    out_ref, m_ref = att.prefill_attention(
        q, k, v, jnp.asarray(seq_len), scale,
        metric_window=window, buffer_len=jnp.asarray(buffer_len),
        use_l2=use_l2, use_average=False, use_maxpool=use_maxpool)

    out, m = ppf.prefill_attention(
        q, k, v, jnp.asarray(seq_len), scale,
        metric_window=window, buffer_len=jnp.asarray(buffer_len),
        use_l2=use_l2, use_average=False, use_maxpool=use_maxpool,
        q_block=128, chunk=128, interpret=True)

    mask = np.arange(T)[:, None] < seq_len
    np.testing.assert_allclose(
        np.asarray(out) * mask[..., None], np.asarray(out_ref) * mask[..., None],
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_kernel_logit_cap():
    rng = np.random.default_rng(7)
    T, Hq, Hkv, d = 128, 2, 2, 128
    seq_len = 77
    q = jnp.asarray(rng.standard_normal((T, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.float32)
    kwargs = dict(metric_window=16, buffer_len=jnp.asarray(0),
                  use_l2=True, use_average=False, use_maxpool=True,
                  logit_cap=20.0)
    out_ref, m_ref = att.prefill_attention(
        q, k, v, jnp.asarray(seq_len), d ** -0.5, **kwargs)
    out, m = ppf.prefill_attention(
        q, k, v, jnp.asarray(seq_len), d ** -0.5, q_block=128, chunk=128,
        interpret=True, **kwargs)
    mask = np.arange(T)[:, None] < seq_len
    np.testing.assert_allclose(
        np.asarray(out) * mask[..., None],
        np.asarray(out_ref) * mask[..., None], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=2e-5, atol=2e-5)
