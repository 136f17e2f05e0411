"""Selective-scan ops vs sequential numpy oracles, and prefill/step
consistency (the invariant the engine relies on: scanning a prompt then
stepping must equal scanning the whole sequence). Reference kernels:
vllm selective_scan_fwd / causal_conv1d used by models/jamba.py."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from kvcompress_tpu.ops import mamba as M


def np_selective_scan(x, dt, A, B, C, D, h0=None):
    T, di = x.shape
    ds = A.shape[1]
    h = np.zeros((di, ds), np.float32) if h0 is None else h0.copy()
    ys = []
    for t in range(T):
        a = np.exp(dt[t][:, None] * A)
        h = a * h + (dt[t] * x[t])[:, None] * B[t][None, :]
        ys.append(h @ C[t] + D * x[t])
    return np.stack(ys), h


def test_selective_scan_matches_sequential():
    rng = np.random.default_rng(0)
    T, di, ds = 17, 8, 4
    x = rng.normal(size=(T, di)).astype(np.float32)
    dt = np.abs(rng.normal(size=(T, di))).astype(np.float32) * 0.3
    A = -np.abs(rng.normal(size=(di, ds))).astype(np.float32)
    B = rng.normal(size=(T, ds)).astype(np.float32)
    C = rng.normal(size=(T, ds)).astype(np.float32)
    D = rng.normal(size=(di,)).astype(np.float32)
    h0 = rng.normal(size=(di, ds)).astype(np.float32)

    ref_y, ref_h = np_selective_scan(x, dt, A, B, C, D, h0)
    y, h = M.selective_scan(jnp.asarray(x), jnp.asarray(dt),
                            jnp.asarray(A), jnp.asarray(B),
                            jnp.asarray(C), jnp.asarray(D),
                            h0=jnp.asarray(h0))
    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=2e-4, atol=2e-4)


def test_causal_conv_matches_numpy():
    rng = np.random.default_rng(1)
    T, di, k = 12, 6, 4
    x = rng.normal(size=(T, di)).astype(np.float32)
    w = rng.normal(size=(di, k)).astype(np.float32)
    b = rng.normal(size=(di,)).astype(np.float32)
    init = rng.normal(size=(k - 1, di)).astype(np.float32)
    xp = np.concatenate([init, x])
    ref = np.stack([
        sum(xp[t + j] * w[:, j] for j in range(k)) + b for t in range(T)])
    got = M.causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                          init=jnp.asarray(init))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@dataclasses.dataclass
class _Cfg:
    rms_norm_eps: float = 1e-6


def _mixer_params(rng, D, di, ds, R, k):
    s = 0.2
    return {
        "in_proj": jnp.asarray(rng.normal(size=(D, 2 * di)) * s,
                               jnp.float32),
        "conv_w": jnp.asarray(rng.normal(size=(di, k)) * s, jnp.float32),
        "conv_b": jnp.asarray(rng.normal(size=(di,)) * s, jnp.float32),
        "x_proj": jnp.asarray(rng.normal(size=(di, R + 2 * ds)) * s,
                              jnp.float32),
        "dt_w": jnp.asarray(rng.normal(size=(R, di)) * s, jnp.float32),
        "dt_b": jnp.asarray(rng.normal(size=(di,)) * s, jnp.float32),
        "A_log": jnp.asarray(np.log(np.abs(
            rng.normal(size=(di, ds))) + 0.5), jnp.float32),
        "D": jnp.asarray(rng.normal(size=(di,)) * s, jnp.float32),
        "out_proj": jnp.asarray(rng.normal(size=(di, D)) * s, jnp.float32),
        "dt_ln": jnp.ones((R,), jnp.float32),
        "b_ln": jnp.ones((ds,), jnp.float32),
        "c_ln": jnp.ones((ds,), jnp.float32),
    }


def test_mixer_prefill_then_step_consistent():
    """scan(prompt) + step(token)... == scan(prompt + tokens): the engine
    invariant for prefill -> decode handoff."""
    rng = np.random.default_rng(2)
    D, di, ds, R, k = 16, 32, 4, 4, 4
    p = _mixer_params(rng, D, di, ds, R, k)
    cfg = _Cfg()
    T, extra = 10, 5
    x = jnp.asarray(rng.normal(size=(T + extra, D)), jnp.float32)

    full, _ = M.mixer_prefill(p, cfg, x)

    head, (conv, ssm) = M.mixer_prefill(p, cfg, x[:T])
    np.testing.assert_allclose(np.asarray(head), np.asarray(full[:T]),
                               rtol=2e-4, atol=2e-4)
    conv_s = conv[None]            # [1, di, k-1]
    ssm_s = ssm[None]
    ys = []
    for t in range(T, T + extra):
        y, conv_s, ssm_s = M.mixer_step(p, cfg, x[t][None], conv_s, ssm_s)
        ys.append(np.asarray(y[0]))
    np.testing.assert_allclose(np.stack(ys), np.asarray(full[T:]),
                               rtol=2e-3, atol=2e-3)
