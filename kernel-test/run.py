"""Standalone on-hardware kernel validation harness.

The role of the reference's kernel-test/ directory (nvcc + compute-sanitizer
executables outside pytest, run.sh): run every production Pallas kernel on
the CURRENT backend (the real TPU, unlike the pytest suite which pins the
CPU backend) and compare against the XLA oracles. Catches Mosaic-only
failure modes - tiling constraints, DMA alignment, VMEM pressure - that
interpret mode cannot.

Usage:  python kernel-test/run.py  [--sizes small|bench]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from kvcompress_tpu.ops import attention as att
from kvcompress_tpu.ops.pallas import paged_attention as ppa
from kvcompress_tpu.ops.pallas import prefill_attention as ppf

FAILURES = []


def check(name, got, want, atol, rtol=1e-2):
    diff = np.max(np.abs(np.asarray(got, np.float32)
                         - np.asarray(want, np.float32)))
    ok = np.allclose(np.asarray(got, np.float32),
                     np.asarray(want, np.float32), atol=atol, rtol=rtol)
    print(f"  {name}: max|diff|={diff:.5f} {'OK' if ok else 'FAIL'}")
    if not ok:
        FAILURES.append(name)


def test_tail_kernel(S, Hq, Hkv, d, bs, nb, KT, dtype):
    print(f"tail decode kernel S={S} Hq={Hq} Hkv={Hkv} d={d} bs={bs} "
          f"nb={nb} KT={KT} {dtype.__name__}")
    rng = np.random.default_rng(0)
    num_blocks = S * Hkv * nb + 64
    q = jnp.asarray(rng.standard_normal((S, Hq, d)), dtype)
    tk = jnp.asarray(rng.standard_normal((S, Hkv, KT, d)), dtype)
    tv = jnp.asarray(rng.standard_normal((S, Hkv, KT, d)), dtype)
    tlen = jnp.asarray(rng.integers(0, KT, size=S), jnp.int32)
    kc = jnp.asarray(rng.standard_normal((num_blocks, bs, d)), dtype)
    vc = jnp.asarray(rng.standard_normal((num_blocks, bs, d)), dtype)
    bt = jnp.asarray(rng.integers(1, num_blocks, size=(S, Hkv, nb)),
                     jnp.int32)
    ctx = jnp.asarray(
        np.maximum(rng.integers(0, nb * bs, size=(S, Hkv)),
                   np.asarray(tlen)[:, None] + 1), jnp.int32)

    out, mc, mt = ppa.paged_decode_attention_tail(
        q, tk, tv, tlen, kc, vc, bt, ctx, d ** -0.5,
        use_l2=True, record_metrics=True)

    # XLA oracle: emulate via dense gather + joint softmax
    n = bt.shape[-1] * bs
    phys = (bt[..., None] * bs
            + jnp.arange(bs, dtype=jnp.int32)).reshape(S, Hkv, -1)
    kg = kc.reshape(-1, d)[phys].astype(jnp.float32)
    vg = vc.reshape(-1, d)[phys].astype(jnp.float32)
    qpk = Hq // Hkv
    qq = q.reshape(S, Hkv, qpk, d).astype(jnp.float32)
    cached = jnp.maximum(ctx - tlen[:, None], 0)
    lg_c = jnp.einsum("shqd,shnd->shqn", qq, kg) * (d ** -0.5)
    col = jnp.arange(kg.shape[2])
    vc_mask = col[None, None, :] < cached[..., None]
    lg_c = jnp.where(vc_mask[:, :, None], lg_c, -1e30)
    lg_t = jnp.einsum("shqd,shkd->shqk", qq,
                      tk.astype(jnp.float32)) * (d ** -0.5)
    colt = jnp.arange(KT)
    vt = (colt[None, None, :] < tlen[:, None, None]) & (
        ctx > 0)[..., None]
    lg_t = jnp.where(vt[:, :, None], lg_t, -1e30)
    m = jnp.maximum(lg_c.max(-1, keepdims=True), lg_t.max(-1, keepdims=True))
    ec = jnp.where(vc_mask[:, :, None], jnp.exp(lg_c - m), 0)
    et = jnp.where(vt[:, :, None], jnp.exp(lg_t - m), 0)
    l = ec.sum(-1, keepdims=True) + et.sum(-1, keepdims=True) + 1e-9
    pc, pt = ec / l, et / l
    oref = (jnp.einsum("shqn,shnd->shqd", pc, vg)
            + jnp.einsum("shqk,shkd->shqd", pt,
                         tv.astype(jnp.float32))).reshape(S, Hq, d)
    atol = 2e-2 if dtype == jnp.bfloat16 else 2e-4
    check("out", out, oref, atol)
    check("m_cached", mc, (pc ** 2).sum(2), atol)
    check("m_tail", mt, (pt ** 2).sum(2), atol)


def test_prefill_kernel(T, Hq, Hkv, d, dtype):
    print(f"prefill flash kernel T={T} Hq={Hq} Hkv={Hkv} d={d} "
          f"{dtype.__name__}")
    rng = np.random.default_rng(1)
    seq_len = T - T // 4
    q = jnp.asarray(rng.standard_normal((T, Hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((T, Hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((T, Hkv, d)), dtype)
    kw = dict(metric_window=32, buffer_len=jnp.asarray(2), use_l2=True,
              use_average=False, use_maxpool=True)
    out, m = ppf.prefill_attention(q, k, v, jnp.asarray(seq_len),
                                   d ** -0.5, **kw)
    out_ref, m_ref = att.prefill_attention(q, k, v, jnp.asarray(seq_len),
                                           d ** -0.5, **kw)
    mask = (np.arange(T) < seq_len)[:, None, None]
    atol = 3e-2 if dtype == jnp.bfloat16 else 3e-4
    check("out", np.asarray(out) * mask, np.asarray(out_ref) * mask, atol)
    check("metrics", m, m_ref, atol)


def perf_prefill(T=6144, Hq=32, Hkv=8, d=128, iters=8):
    """On-chip prefill kernel TF/s at the bench shape (VERDICT round-2
    item 2: the head-grouped rewrite must be validated on hardware).
    Causal attention FLOPs ~= 4 * (T^2/2) * Hq * d (QK^T + PV)."""
    import time
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((T, Hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.bfloat16)
    kw = dict(metric_window=32, buffer_len=jnp.asarray(0), use_l2=True,
              use_average=False, use_maxpool=True)
    fn = jax.jit(lambda q, k, v: ppf.prefill_attention(
        q, k, v, jnp.asarray(T), d ** -0.5, **kw))
    out, m = fn(q, k, v)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out, m = fn(q, k, v)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    flops = 4 * (T * T / 2) * Hq * d
    print(f"prefill kernel T={T} Hq={Hq} d={d} bf16: best {best*1e3:.2f} "
          f"ms = {flops / best / 1e12:.1f} TF/s")


def perf_tail(S=64, Hq=32, Hkv=8, d=128, bs=16, nb=8, KT=16, iters=8):
    """Decode tail kernel latency at the bench's compressed table width."""
    import time
    rng = np.random.default_rng(3)
    num_blocks = S * Hkv * nb + 64
    q = jnp.asarray(rng.standard_normal((S, Hq, d)), jnp.bfloat16)
    tk = jnp.asarray(rng.standard_normal((S, Hkv, KT, d)), jnp.bfloat16)
    tv = jnp.asarray(rng.standard_normal((S, Hkv, KT, d)), jnp.bfloat16)
    tlen = jnp.full((S,), KT - 1, jnp.int32)
    kc = jnp.asarray(rng.standard_normal((num_blocks, bs, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((num_blocks, bs, d)), jnp.bfloat16)
    bt = jnp.asarray(rng.integers(1, num_blocks, size=(S, Hkv, nb)),
                     jnp.int32)
    ctx = jnp.full((S, Hkv), nb * bs, jnp.int32)
    fn = jax.jit(lambda *a: ppa.paged_decode_attention_tail(
        *a, d ** -0.5, use_l2=True, record_metrics=True))
    o, mc, mt = fn(q, tk, tv, tlen, kc, vc, bt, ctx)
    jax.block_until_ready(o)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        o, mc, mt = fn(q, tk, tv, tlen, kc, vc, bt, ctx)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    kv_bytes = (S * Hkv * (nb * bs + KT) * d * 2 * 2)
    print(f"tail kernel S={S} nb={nb} bs={bs}: best {best*1e6:.0f} us, "
          f"KV read {kv_bytes / best / 1e9:.0f} GB/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="small",
                   choices=["small", "bench", "perf"])
    args = p.parse_args()
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")

    if args.sizes == "small":
        test_tail_kernel(2, 8, 4, 128, 16, 16, 8, jnp.float32)
        test_tail_kernel(4, 8, 2, 128, 16, 32, 16, jnp.bfloat16)
        test_prefill_kernel(256, 8, 4, 128, jnp.float32)
    elif args.sizes == "perf":
        test_prefill_kernel(2048, 32, 8, 128, jnp.bfloat16)
        test_tail_kernel(8, 32, 8, 128, 16, 128, 16, jnp.bfloat16)
        perf_prefill()
        perf_tail()
    else:
        test_tail_kernel(8, 32, 8, 128, 16, 128, 16, jnp.bfloat16)
        test_prefill_kernel(2048, 32, 8, 128, jnp.bfloat16)

    if FAILURES:
        print(f"FAILED: {FAILURES}")
        sys.exit(1)
    print("all kernels OK")


if __name__ == "__main__":
    main()
