"""Mamba selective-scan ops, TPU-native.

The role of the reference's mamba kernels (vllm selective_scan_fwd /
causal_conv1d CUDA ops used by models/jamba.py JambaMambaMixer:52-220).
The recurrence h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t is a first-order
linear scan, so prefill runs it as `jax.lax.associative_scan` (log-depth,
the classic TPU formulation - no sequential kernel needed) and decode is
one fused elementwise step. The causal depthwise conv (d_conv taps) is a
sum of shifted multiplies - XLA fuses it; no conv kernel required.

States per sequence (the reference's MambaCacheManager role):
  conv_state [d_inner, d_conv-1]  last inputs of the conv window
  ssm_state  [d_inner, d_state]   the scan carry
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def causal_conv1d(x: jax.Array, w: jax.Array, b: Optional[jax.Array],
                  init: Optional[jax.Array] = None) -> jax.Array:
    """x [T, di], w [di, k], init [k-1, di] (window before t=0; zeros if
    None) -> [T, di]."""
    T, di = x.shape
    k = w.shape[1]
    if init is None:
        init = jnp.zeros((k - 1, di), x.dtype)
    xp = jnp.concatenate([init.astype(x.dtype), x], axis=0)  # [T+k-1, di]
    y = jnp.zeros((T, di), jnp.float32)
    for j in range(k):
        y = y + xp[j:j + T].astype(jnp.float32) * w[:, j].astype(
            jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def selective_scan(x: jax.Array, dt: jax.Array, A: jax.Array,
                   B: jax.Array, C: jax.Array, D: jax.Array,
                   h0: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array]:
    """x, dt [T, di]; A [di, ds] (negative); B, C [T, ds]; D [di];
    h0 [di, ds] initial state. -> (y [T, di], h_final [di, ds]).

    h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t;  y_t = C_t.h_t + D x_t."""
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    a = jnp.exp(dtf[:, :, None] * A[None].astype(jnp.float32))
    b = (dtf * xf)[:, :, None] * B[:, None, :].astype(jnp.float32)

    def comb(l, r):
        la, lb = l
        ra, rb = r
        return la * ra, lb * ra + rb

    pa, pb = jax.lax.associative_scan(comb, (a, b), axis=0)
    h = pb if h0 is None else pb + pa * h0[None].astype(jnp.float32)
    y = jnp.einsum("tds,ts->td", h, C.astype(jnp.float32))
    y = y + xf * D.astype(jnp.float32)
    return y.astype(x.dtype), h[-1]


def selective_step(x: jax.Array, dt: jax.Array, A: jax.Array,
                   B: jax.Array, C: jax.Array, D: jax.Array,
                   h: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Single decode step, batched over leading axes: x, dt [.., di];
    B, C [.., ds]; h [.., di, ds]. -> (y [.., di], h_new)."""
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    a = jnp.exp(dtf[..., None] * A.astype(jnp.float32))
    hn = a * h + (dtf * xf)[..., None] * B[..., None, :].astype(
        jnp.float32)
    y = jnp.einsum("...ds,...s->...d", hn, C.astype(jnp.float32))
    y = y + xf * D.astype(jnp.float32)
    return y.astype(x.dtype), hn


def mixer_prefill(p: Dict[str, Any], cfg, x: jax.Array,
                  conv0: Optional[jax.Array] = None,
                  ssm0: Optional[jax.Array] = None):
    """Full JambaMambaMixer over a prompt. x [T, D] -> (y [T, D],
    (conv_state [di, k-1], ssm_state [di, ds])).

    p: in_proj [D, 2di] (+in_b), conv_w [di, k] (+conv_b), x_proj
    [di, R+2ds], dt_w [R, di], dt_b [di], A_log [di, ds], D [di],
    out_proj [di, D] (+out_b), optional dt_ln / b_ln / c_ln RMS weights
    (jamba normalizes dt/B/C; pure mamba omits them)."""
    di = p["conv_w"].shape[0]
    ds = p["A_log"].shape[1]
    R = p["dt_w"].shape[0]
    proj = x @ p["in_proj"].astype(x.dtype)
    if "in_b" in p:
        proj = proj + p["in_b"].astype(x.dtype)
    xs, gate = proj[:, :di], proj[:, di:]
    xc = causal_conv1d(xs, p["conv_w"], p.get("conv_b"),
                       init=None if conv0 is None else conv0.T)
    xc = jax.nn.silu(xc.astype(jnp.float32)).astype(x.dtype)
    dbc = xc @ p["x_proj"].astype(xc.dtype)               # [T, R+2ds]
    dtr, B, C = dbc[:, :R], dbc[:, R:R + ds], dbc[:, R + ds:]
    if "dt_ln" in p:  # jamba normalizes dt/B/C; pure mamba does not
        dtr = _rms(dtr, p["dt_ln"], cfg.rms_norm_eps)
        B = _rms(B, p["b_ln"], cfg.rms_norm_eps)
        C = _rms(C, p["c_ln"], cfg.rms_norm_eps)
    dt = jax.nn.softplus(
        dtr.astype(jnp.float32) @ p["dt_w"].astype(jnp.float32)
        + p["dt_b"].astype(jnp.float32))
    A = -jnp.exp(p["A_log"].astype(jnp.float32))
    y, h = selective_scan(xc, dt, A, B, C, p["D"], h0=ssm0)
    y = y * jax.nn.silu(gate.astype(jnp.float32)).astype(y.dtype)
    out = y @ p["out_proj"].astype(y.dtype)
    if "out_b" in p:
        out = out + p["out_b"].astype(out.dtype)
    k = p["conv_w"].shape[1]
    # conv window going forward: last k-1 PRE-conv inputs
    T = xs.shape[0]
    rows = (jnp.zeros((k - 1, di), x.dtype) if conv0 is None
            else conv0.T.astype(x.dtype))
    tail = jnp.concatenate([rows, xs], axis=0)[T:]
    return out, (tail.T, h)  # conv state in the step layout [di, k-1]


def mixer_step(p: Dict[str, Any], cfg, x: jax.Array, conv_state, ssm_state):
    """One decode step, batched: x [S, D], conv_state [S, di, k-1],
    ssm_state [S, di, ds] -> (y [S, D], new_conv, new_ssm)."""
    di = p["conv_w"].shape[0]
    ds = p["A_log"].shape[1]
    R = p["dt_w"].shape[0]
    proj = x @ p["in_proj"].astype(x.dtype)
    if "in_b" in p:
        proj = proj + p["in_b"].astype(x.dtype)
    xs, gate = proj[:, :di], proj[:, di:]
    # conv update: window = [conv_state | xs]
    win = jnp.concatenate([conv_state,
                           xs[..., None].astype(conv_state.dtype)],
                          axis=-1)                         # [S, di, k]
    xc = jnp.sum(win.astype(jnp.float32)
                 * p["conv_w"].astype(jnp.float32)[None], axis=-1)
    if "conv_b" in p:
        xc = xc + p["conv_b"].astype(jnp.float32)
    xc = jax.nn.silu(xc).astype(x.dtype)                   # [S, di]
    dbc = xc @ p["x_proj"].astype(xc.dtype)
    dtr, B, C = dbc[:, :R], dbc[:, R:R + ds], dbc[:, R + ds:]
    if "dt_ln" in p:  # jamba normalizes dt/B/C; pure mamba does not
        dtr = _rms(dtr, p["dt_ln"], cfg.rms_norm_eps)
        B = _rms(B, p["b_ln"], cfg.rms_norm_eps)
        C = _rms(C, p["c_ln"], cfg.rms_norm_eps)
    dt = jax.nn.softplus(
        dtr.astype(jnp.float32) @ p["dt_w"].astype(jnp.float32)
        + p["dt_b"].astype(jnp.float32))
    A = -jnp.exp(p["A_log"].astype(jnp.float32))
    y, hn = selective_step(xc, dt, A, B, C, p["D"], ssm_state)
    y = y * jax.nn.silu(gate.astype(jnp.float32)).astype(y.dtype)
    out = y @ p["out_proj"].astype(y.dtype)
    if "out_b" in p:
        out = out + p["out_b"].astype(out.dtype)
    new_conv = win[..., 1:]
    return out, new_conv, hn


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)
