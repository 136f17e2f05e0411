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
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from kvcompress_tpu.ops import attention as att
from kvcompress_tpu.ops.pallas import paged_attention as ppa
from kvcompress_tpu.ops.pallas import prefill_attention as ppf

FAILURES = []
# recorded artifact (written to kernel-test/RESULTS.json unless --no-record):
# correctness max|diff| per kernel case + on-chip perf numbers, so each
# round leaves an auditable on-hardware validation record at HEAD
# (reference kernel-test/run.sh equivalent, with the output committed).
RECORD = {"checks": [], "perf": {}}


def check(name, got, want, atol, rtol=1e-2):
    diff = np.max(np.abs(np.asarray(got, np.float32)
                         - np.asarray(want, np.float32)))
    ok = np.allclose(np.asarray(got, np.float32),
                     np.asarray(want, np.float32), atol=atol, rtol=rtol)
    print(f"  {name}: max|diff|={diff:.5f} {'OK' if ok else 'FAIL'}")
    RECORD["checks"].append(
        {"case": RECORD.get("_case", ""), "name": name,
         "max_abs_diff": float(diff), "atol": atol, "ok": ok})
    if not ok:
        FAILURES.append(name)


def test_tail_kernel(S, Hq, Hkv, d, bs, nb, KT, dtype):
    RECORD["_case"] = (f"tail S={S} Hq={Hq} Hkv={Hkv} d={d} bs={bs} "
                       f"nb={nb} KT={KT} {dtype.__name__}")
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

    # XLA oracle: emulate via dense gather + joint softmax. HIGHEST matmul
    # precision: on the real MXU the default f32 einsum is a single bf16
    # pass, which would make the ORACLE the imprecise side of the compare.
    with jax.default_matmul_precision("highest"):
        return _tail_oracle_check(q, tk, tv, tlen, kc, vc, bt, ctx, out,
                                  mc, mt, S, Hq, Hkv, d, bs, nb, KT, dtype)


def _tail_oracle_check(q, tk, tv, tlen, kc, vc, bt, ctx, out, mc, mt,
                       S, Hq, Hkv, d, bs, nb, KT, dtype):
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
    # f32 on the real MXU is a single bf16 pass inside the kernel (by
    # design - HIGHEST precision would triple the matmul cost), so the
    # output tolerance is bf16-grade either way; softmax-normalised
    # metric rows stay tight.
    atol = 2e-2
    check("out", out, oref, atol)
    check("m_cached", mc, (pc ** 2).sum(2), atol)
    check("m_tail", mt, (pt ** 2).sum(2), atol)


def test_prefill_kernel(T, Hq, Hkv, d, dtype):
    RECORD["_case"] = f"prefill T={T} Hq={Hq} Hkv={Hkv} d={d} {dtype.__name__}"
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
    with jax.default_matmul_precision("highest"):  # see _tail_oracle_check
        out_ref, m_ref = att.prefill_attention(
            q, k, v, jnp.asarray(seq_len), d ** -0.5, **kw)
    mask = (np.arange(T) < seq_len)[:, None, None]
    atol = 3e-2  # bf16-grade: see the f32-on-MXU note in test_tail_kernel
    check("out", np.asarray(out) * mask, np.asarray(out_ref) * mask, atol)
    check("metrics", m, m_ref, 3e-3)


def test_prefill_cont_kernel(P, Tq, Hq, Hkv, d, dtype):
    """Chunked-prefill continuation: q_offset > 0, Tk = P + Tq > Tq."""
    RECORD["_case"] = (f"prefill_cont P={P} Tq={Tq} Hq={Hq} Hkv={Hkv} "
                      f"d={d} {dtype.__name__}")
    print(f"prefill continuation kernel P={P} Tq={Tq} Hq={Hq} Hkv={Hkv} "
          f"d={d} {dtype.__name__}")
    rng = np.random.default_rng(4)
    Tk = P + Tq
    chunk_len = Tq - Tq // 5
    q = jnp.asarray(rng.standard_normal((Tq, Hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((Tk, Hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((Tk, Hkv, d)), dtype)
    kw = dict(metric_window=32, buffer_len=jnp.asarray(2), use_l2=True,
              use_average=False, use_maxpool=True)
    out, m = ppf.prefill_attention(q, k, v, jnp.asarray(chunk_len),
                                   d ** -0.5, q_offset=P, **kw)
    with jax.default_matmul_precision("highest"):  # see _tail_oracle_check
        out_ref, m_ref = att.prefill_attention(
            q, k, v, jnp.asarray(chunk_len), d ** -0.5, q_offset=P, **kw)
    mask = (np.arange(Tq) < chunk_len)[:, None, None]
    atol = 3e-2  # bf16-grade: see the f32-on-MXU note in test_tail_kernel
    check("out", np.asarray(out) * mask, np.asarray(out_ref) * mask, atol)
    check("metrics", m, m_ref, 3e-3)


def _slope_time(make_fn, fresh_input, n1=2, n2=8, reps=3):
    """Per-iteration kernel time via the SLOPE method: t(n2) - t(n1) over
    (n2 - n1) chained iterations cancels both the tunnel round trip
    (~25 ms) and the result-fetch cost. Timing a single jitted call is
    WRONG on this backend twice over: jax.block_until_ready returns
    before remote execution completes (dispatch is async through the
    tunnel), and repeat dispatches with identical arguments can be served
    from the tunnel's result cache - so each rep draws FRESH inputs and
    forces a host fetch of a scalar reduction of the result."""
    import time
    f1, f2 = make_fn(n1), make_fn(n2)
    x = fresh_input()
    float(f1(x)); float(f2(x))  # compile both
    best = 1e9
    for _ in range(reps):
        x = fresh_input()
        float(x.sum())  # input resident before the clock starts
        t0 = time.perf_counter(); float(f1(x))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(x))
        tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    return best


def perf_prefill(T=6144, Hq=32, Hkv=8, d=128):
    """On-chip prefill kernel TF/s at the bench shape. Causal attention
    FLOPs ~= 4 * (T^2/2) * Hq * d (QK^T + PV); see _slope_time for why
    the earlier per-dispatch timing (45-47 "TF/s" in r04 RESULTS.json)
    under-reported by ~2x - it was measuring tunnel overhead."""
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.bfloat16)
    kw = dict(metric_window=32, buffer_len=jnp.asarray(0), use_l2=True,
              use_average=False, use_maxpool=True)

    def make_fn(n):
        @jax.jit
        def f(q):
            def body(qc, _):
                o, _m = ppf.prefill_attention(
                    qc, k, v, jnp.asarray(T), d ** -0.5, **kw)
                return o.astype(qc.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=n)
            return out.astype(jnp.float32).sum()
        return f

    def fresh():
        return jnp.asarray(
            np.random.standard_normal((T, Hq, d)), jnp.bfloat16)

    best = _slope_time(make_fn, fresh)
    flops = 4 * (T * T / 2) * Hq * d
    print(f"prefill kernel T={T} Hq={Hq} d={d} bf16: {best*1e3:.2f} "
          f"ms = {flops / best / 1e12:.1f} TF/s")
    RECORD["perf"]["prefill"] = {
        "T": T, "Hq": Hq, "Hkv": Hkv, "d": d, "dtype": "bfloat16",
        "best_ms": round(best * 1e3, 3),
        "tflops_per_s": round(flops / best / 1e12, 1),
        "method": "slope(n=2,8), fresh inputs, scalar fetch"}


def perf_tail(S=64, Hq=32, Hkv=8, d=128, bs=16, nb=8, KT=16,
              name="tail_decode"):
    """Decode tail kernel latency + achieved KV-read bandwidth. nb=8 is
    the bench's compressed table width; perf_tail_baseline() runs the
    UNCOMPRESSED width (VERDICT r04 item 4) where the kernel must be
    HBM-bound - that number pins the baseline denominator to physics."""
    rng = np.random.default_rng(3)
    num_blocks = S * Hkv * nb + 64
    tk = jnp.asarray(rng.standard_normal((S, Hkv, KT, d)), jnp.bfloat16)
    tv = jnp.asarray(rng.standard_normal((S, Hkv, KT, d)), jnp.bfloat16)
    tlen = jnp.full((S,), KT - 1, jnp.int32)
    kc = jnp.asarray(rng.standard_normal((num_blocks, bs, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((num_blocks, bs, d)), jnp.bfloat16)
    bt = jnp.asarray(rng.integers(1, num_blocks, size=(S, Hkv, nb)),
                     jnp.int32)
    ctx = jnp.full((S, Hkv), nb * bs, jnp.int32)

    def make_fn(n):
        @jax.jit
        def f(q):
            def body(qc, _):
                o, _mc, _mt = ppa.paged_decode_attention_tail(
                    qc, tk, tv, tlen, kc, vc, bt, ctx, d ** -0.5,
                    use_l2=True, record_metrics=True)
                return o.astype(qc.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=n)
            return out.astype(jnp.float32).sum()
        return f

    def fresh():
        return jnp.asarray(
            np.random.standard_normal((S, Hq, d)), jnp.bfloat16)

    best = _slope_time(make_fn, fresh, n1=4, n2=32)
    kv_bytes = (S * Hkv * (nb * bs + KT) * d * 2 * 2)
    print(f"{name} S={S} nb={nb} bs={bs}: {best*1e6:.0f} us, "
          f"KV read {kv_bytes / best / 1e9:.0f} GB/s")
    RECORD["perf"][name] = {
        "S": S, "Hq": Hq, "Hkv": Hkv, "d": d, "bs": bs, "nb": nb, "KT": KT,
        "dtype": "bfloat16", "best_us": round(best * 1e6),
        "kv_read_gb_per_s": round(kv_bytes / best / 1e9),
        "method": "slope(n=4,32), fresh inputs, scalar fetch"}


def perf_tail_baseline():
    """Uncompressed bench-baseline width: 10 sequences x 6144-token
    contexts (nb=384) - the shape whose kernel time sets the baseline
    denominator of the headline compression-gain ratio."""
    perf_tail(S=10, nb=384, name="tail_decode_baseline")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="small",
                   choices=["small", "bench", "perf"])
    p.add_argument("--no-record", action="store_true",
                   help="skip writing kernel-test/RESULTS.json")
    args = p.parse_args()
    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev})")
    RECORD["backend"] = dev.platform
    RECORD["device"] = str(dev)
    RECORD["sizes"] = args.sizes
    RECORD["git_head"] = _git_head()
    RECORD["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())

    if args.sizes == "small":
        test_tail_kernel(2, 8, 4, 128, 16, 16, 8, jnp.float32)
        test_tail_kernel(4, 8, 2, 128, 16, 32, 16, jnp.bfloat16)
        test_prefill_kernel(256, 8, 4, 128, jnp.float32)
        test_prefill_cont_kernel(256, 256, 8, 4, 128, jnp.float32)
    elif args.sizes == "perf":
        test_prefill_kernel(2048, 32, 8, 128, jnp.bfloat16)
        test_tail_kernel(8, 32, 8, 128, 16, 128, 16, jnp.bfloat16)
        test_prefill_cont_kernel(6144, 1024, 32, 8, 128, jnp.bfloat16)
        perf_prefill()
        perf_tail()
        perf_tail_baseline()
    else:
        test_tail_kernel(8, 32, 8, 128, 16, 128, 16, jnp.bfloat16)
        test_prefill_kernel(2048, 32, 8, 128, jnp.bfloat16)
        test_prefill_cont_kernel(6144, 1024, 32, 8, 128, jnp.bfloat16)

    RECORD["failures"] = list(FAILURES)
    RECORD.pop("_case", None)
    if not args.no_record:
        path = __file__.rsplit("/", 1)[0] + "/RESULTS.json"
        with open(path, "w") as f:
            json.dump(RECORD, f, indent=1)
        print(f"recorded {path}")
    if FAILURES:
        print(f"FAILED: {FAILURES}")
        sys.exit(1)
    print("all kernels OK")


def _git_head() -> str:
    import subprocess
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=__file__.rsplit("/", 2)[0], text=True).strip()
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
