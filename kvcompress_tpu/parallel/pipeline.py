"""Pipeline parallelism: a GPipe schedule inside one jitted SPMD program.

The reference implements PP with per-stage worker processes, NCCL
send/recv between pipeline ranks and one "virtual engine" per in-flight
microbatch (vllm/distributed/parallel_state.py:798-807 get_pp_group,
vllm/worker/worker.py + engine/llm_engine.py virtual-engine plumbing).
None of that process machinery exists here - the TPU-native formulation is
a MESH AXIS: layer-stacked parameters (already [L, ...] for the lax.scan
decoder trunk, models/decoder.py:620-643) shard their layer axis over a
"pipe" axis, and ONE shard_map program runs the classic GPipe software
pipeline: at tick t, stage p runs its local layer block on microbatch
t - p and hands the activations to stage p+1 with a single ppermute hop
over ICI. No host round-trips, no send/recv plumbing, no virtual engines -
the whole schedule (fill, steady state, drain) is `lax.scan` over
M + P - 1 ticks.

Composition with tensor parallelism: the mesh is ("pipe", "model"); only
"pipe" is manual inside the shard_map, "model" stays an auto (GSPMD) axis
so the megatron shardings of parallel/mesh.py apply unchanged WITHIN each
stage - XLA inserts the usual TP collectives per layer, and the ppermute
rides the pipe axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kvcompress_tpu.config import ModelConfig

PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def build_pp_mesh(pp_size: int, tp_size: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = pp_size * tp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(pp_size, tp_size)
    return Mesh(arr, (PIPE_AXIS, MODEL_AXIS))


def stage_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs placing each layer-stacked leaf's leading [L] axis on
    the pipe axis; embedding / final norm / lm_head replicate (stage 0 and
    stage P-1 use them; for very large vocabularies shard them over
    "model" via parallel/mesh.py on top of this)."""
    layers = {k: P(PIPE_AXIS) for k in params["layers"]}
    top = {k: P() for k in params if k != "layers"}
    top["layers"] = layers
    return top


def shard_params_pp(params, mesh: Mesh):
    specs = stage_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def pipeline_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_mb: jax.Array,      # [M, Tm] i32 microbatched tokens
    pos_mb: jax.Array,        # [M, Tm] i32 positions
    mesh: Mesh,
    attn_fn=None,             # (layer_xs, q, k, v, cache)->(out, cache);
                              # default full causal attention
    layer_xs: Any = None,     # pytree with leading [L] per-layer inputs
) -> jax.Array:
    """GPipe forward: returns final hidden states [M, Tm, D].

    Tick t, stage p processes microbatch t - p; M + P - 1 ticks drain the
    pipe. Bubble fraction = (P-1)/(M+P-1): callers pick M >= ~4P for
    steady-state efficiency. Output hidden states are psum-broadcast from
    the last stage so every device returns the full [M, Tm, D]."""
    from kvcompress_tpu.models import decoder as D

    Pp = mesh.shape[PIPE_AXIS]
    L = cfg.num_layers
    assert L % Pp == 0, f"num_layers={L} not divisible by pp={Pp}"
    M, Tm = token_mb.shape
    if attn_fn is None:
        attn_fn = _causal_attn
    if layer_xs is None:
        layer_xs = jnp.zeros((L, 1), jnp.int32)

    def stage_fn(local_layers, local_xs, top, tokens, positions):
        p = jax.lax.axis_index(PIPE_AXIS)
        pparams = dict(top)
        pparams["layers"] = local_layers
        D_ = cfg.hidden_size

        def tick(carry, t):
            h_prev, outs = carry
            mb = t - p
            valid = (mb >= 0) & (mb < M)
            mbc = jnp.clip(mb, 0, M - 1)
            tok = tokens[mbc]
            pos = positions[mbc]
            # stage 0 embeds; later stages consume the ppermuted hidden
            x0 = D._embed(pparams, cfg, tok, pos)
            x = jnp.where(p == 0, x0, h_prev).astype(x0.dtype)
            cos, sin = D.precompute_rope(cfg, pos)
            step = D._layer_step_fn(cfg, Tm, cos, sin, attn_fn,
                                    collect=False)
            (y, _), _ = jax.lax.scan(step, (x, None),
                                     (local_layers, local_xs))
            # last stage: final norm, record the finished microbatch
            fin = D._norm(y, pparams["final_norm"],
                          pparams.get("final_norm_b"), cfg)
            rec = jnp.where(valid & (p == Pp - 1), 1.0, 0.0)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, rec * fin + (1 - rec) * outs[mbc], mbc, 0)
            # hand activations to the next stage over ICI
            h_next = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, i + 1) for i in range(Pp - 1)])
            return (h_next, outs), None

        h0 = jnp.zeros((Tm, D_), top["embed"].dtype)
        outs0 = jnp.zeros((M, Tm, D_), jnp.float32)
        (_, outs), _ = jax.lax.scan(tick, (h0, outs0),
                                    jnp.arange(M + Pp - 1))
        # broadcast the last stage's outputs to every pipe rank
        outs = jax.lax.psum(
            jnp.where(p == Pp - 1, outs, jnp.zeros_like(outs)), PIPE_AXIS)
        return outs

    top = {k: v for k, v in params.items() if k != "layers"}
    shard = jax.shard_map(
        stage_fn, mesh=mesh, axis_names={PIPE_AXIS},
        in_specs=(P(PIPE_AXIS), P(PIPE_AXIS), P(), P(), P()),
        out_specs=P(), check_vma=False)
    return shard(params["layers"], layer_xs, top, token_mb, pos_mb)


# ---------------------------------------------------------------------------
# Serving-level pipeline parallelism: GPipe trunks over the PAGED cache
# (reference vllm/engine/llm_engine.py:406-438 virtual-engine PP +
# distributed/parallel_state.py:798-807 — re-formulated as one SPMD
# program: layer-stacked params and the per-layer cache state shard over
# the "pipe" mesh axis; activations hop stages via ppermute; the block
# allocator's layer-group-major partitions (core/state.py _group_flatten)
# guarantee every block id a stage's layers reference lives in that
# stage's pool shard, so the id -> local-shard translation below is a
# constant offset).
# ---------------------------------------------------------------------------


def pipeline_paged_decode(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mesh: Mesh,
    token_ids: jax.Array,      # [S]
    positions: jax.Array,      # [S]
    block_tables: jax.Array,   # [L, S, H, nb] GLOBAL block ids
    context_lens: jax.Array,   # [L, S, H]
    slot_mappings: jax.Array,  # [L, S, H] GLOBAL cache slots
    cache,                     # models.decoder.KVCache (pool leaves)
    buffer_lens: jax.Array,    # [S]
    active: jax.Array,         # [S] bool
    spec,                      # AttentionSpec (xla impl)
    microbatches: int = 0,     # 0 -> pipe size (classic GPipe M=P)
):
    """Batched one-token decode as a GPipe software pipeline: the S
    sequences split into M microbatches that flow through the pipe
    stages, each stage running its local layer block against its local
    slice of the paged cache (XLA oracle attention; per-stage Pallas
    comes later). Drop-in replacement for models.decoder.decode when
    pipeline_parallel_size > 1. Returns (hidden [S, D], cache')."""
    from kvcompress_tpu.models import decoder as D
    from kvcompress_tpu.models.decoder import KVCache
    from kvcompress_tpu.ops import attention as att

    Pp = mesh.shape[PIPE_AXIS]
    L = cfg.num_layers
    assert L % Pp == 0, (L, Pp)
    S = token_ids.shape[0]
    M = microbatches or Pp
    while S % M:  # S not divisible: fall back to fewer microbatches
        M -= 1
    Sm = S // M
    nb_pool, bs_cache = cache.k.shape[0], cache.k.shape[1]
    assert nb_pool % Pp == 0
    nb_local = nb_pool // Pp
    scale = D.attn_scale(cfg)
    al = (jnp.asarray(D.alibi_slopes(cfg.num_heads)) if cfg.alibi
          else None)
    win = D.window_array(cfg)
    quantized = cache.k_scale is not None
    D_size = cfg.hidden_size

    layer_xs = (slot_mappings, block_tables, context_lens)
    if win is not None:
        layer_xs = layer_xs + (jnp.asarray(win),)

    def stage_fn(local_layers, local_xs, pools, top, tokens, poss,
                 blens, act_all):
        p = jax.lax.axis_index(PIPE_AXIS)
        base_blk = p * nb_local
        base_slot = base_blk * bs_cache
        n_local_slots = nb_local * bs_cache
        pparams = dict(top)
        pparams["layers"] = local_layers

        def tick(carry, t):
            h_prev, pools_c, outs = carry
            mb = t - p
            valid = (mb >= 0) & (mb < M)
            s0 = jnp.clip(mb, 0, M - 1) * Sm
            tok = jax.lax.dynamic_slice_in_dim(tokens, s0, Sm)
            pos = jax.lax.dynamic_slice_in_dim(poss, s0, Sm)
            bl = jax.lax.dynamic_slice_in_dim(blens, s0, Sm)
            act = jax.lax.dynamic_slice_in_dim(act_all, s0, Sm) & valid
            # slice the per-sequence axes; the window array [L_local] has
            # no S axis and passes through whole
            lxs = tuple(
                jax.lax.dynamic_slice_in_dim(a, s0, Sm, axis=1)
                for a in local_xs[:3])
            if win is not None:
                lxs = lxs + (local_xs[3],)

            x0 = D._embed(pparams, cfg, tok, pos)
            x = jnp.where(p == 0, x0, h_prev).astype(x0.dtype)
            cos, sin = D.precompute_rope(cfg, pos)

            def attn_fn(lxs_l, q, k, v, cache_):
                if win is None:
                    sm_l, bt_l, ctx_l = lxs_l
                    w_kw = {}
                else:
                    sm_l, bt_l, ctx_l, w_l = lxs_l
                    w_kw = {"window": w_l}
                # GLOBAL -> stage-local translation (allocator invariant:
                # every id this stage's layers hold is in its range;
                # clamp covers beyond-context garbage incl. the trash
                # block, which attention masks out anyway)
                in_rng = (sm_l >= base_slot) & (sm_l
                                                < base_slot + n_local_slots)
                sm_loc = jnp.where(in_rng, sm_l - base_slot, n_local_slots)
                bt_loc = jnp.clip(bt_l - base_blk, 0, nb_local - 1)
                wrote = att.write_to_cache(
                    cache_.k, cache_.v, cache_.metrics, cache_.positions,
                    k, v,
                    jnp.where(act[:, None], sm_loc, -1),
                    jnp.where(act, pos, -1),
                    k_scale=cache_.k_scale, v_scale=cache_.v_scale)
                if quantized:
                    kc, vc, mc, pc, ks, vs = wrote
                    q_kw = {"k_scale": ks, "v_scale": vs}
                else:
                    kc, vc, mc, pc = wrote
                    ks = vs = None
                    q_kw = {}
                out, mc = att.paged_decode_attention(
                    q, kc, vc, mc, pc, bt_loc, ctx_l, pos, bl, scale,
                    active=act, use_l2=spec.use_l2,
                    record_metrics=spec.record_metrics,
                    logit_cap=cfg.attn_logit_softcap, alibi=al,
                    **w_kw, **q_kw)
                return out, KVCache(kc, vc, mc, pc, ks, vs)

            step = D._layer_step_fn(cfg, Sm, cos, sin, attn_fn,
                                    collect=False)
            (y, pools_n), _ = jax.lax.scan(step, (x, pools_c),
                                           (local_layers, lxs))
            fin = D._norm(y, pparams["final_norm"],
                          pparams.get("final_norm_b"), cfg)
            rec = jnp.where(valid & (p == Pp - 1), 1.0, 0.0)
            mbc = jnp.clip(mb, 0, M - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, rec * fin.astype(jnp.float32)
                + (1 - rec) * outs[mbc], mbc, 0)
            h_next = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, i + 1) for i in range(Pp - 1)])
            return (h_next, pools_n, outs), None

        h0 = jnp.zeros((Sm, D_size), top["embed"].dtype)
        outs0 = jnp.zeros((M, Sm, D_size), jnp.float32)
        (_, pools, outs), _ = jax.lax.scan(
            tick, (h0, pools, outs0), jnp.arange(M + Pp - 1))
        outs = jax.lax.psum(
            jnp.where(p == Pp - 1, outs, jnp.zeros_like(outs)), PIPE_AXIS)
        return outs.reshape(S, D_size), pools

    top = {k: v for k, v in params.items() if k != "layers"}
    pools_spec = jax.tree.map(lambda _: P(PIPE_AXIS), cache)
    lxs_spec = jax.tree.map(lambda _: P(PIPE_AXIS), layer_xs)
    shard = jax.shard_map(
        stage_fn, mesh=mesh, axis_names={PIPE_AXIS},
        in_specs=(P(PIPE_AXIS), lxs_spec, pools_spec, P(), P(), P(),
                  P(), P()),
        out_specs=(P(), pools_spec), check_vma=False)
    hidden, pools = shard(params["layers"], layer_xs, cache, top,
                          token_ids, positions, buffer_lens, active)
    return hidden, pools


def pipeline_paged_prefill(
    params: Dict[str, Any],
    cfg: ModelConfig,
    mesh: Mesh,
    token_ids: jax.Array,   # [T] padded prompt
    seq_len: jax.Array,     # [] actual length
    buffer_len: jax.Array,  # [] metric buffer
    spec,                   # AttentionSpec (xla impl)
):
    """Prompt pass across pipe stages (write_cache=False contract of
    models.decoder.prefill): returns (last_hidden [D], ks [L, T, H, d],
    vs, pfs [L, T, H]) with the [L] outputs pipe-sharded in place. One
    microbatch (a single prompt): stages idle during fill/drain — prompt
    chunk microbatching is the follow-up optimization; the capacity win
    (weights + cache split P ways) is what serving PP is for."""
    from kvcompress_tpu.models import decoder as D
    from kvcompress_tpu.ops import attention as att

    Pp = mesh.shape[PIPE_AXIS]
    L = cfg.num_layers
    assert L % Pp == 0, (L, Pp)
    T = token_ids.shape[0]
    scale = D.attn_scale(cfg)
    al = (jnp.asarray(D.alibi_slopes(cfg.num_heads)) if cfg.alibi
          else None)
    win = D.window_array(cfg)
    D_size = cfg.hidden_size
    Hkv, d = cfg.num_kv_heads, cfg.head_size

    layer_xs = (jnp.asarray(win) if win is not None
                else jnp.zeros((L, 1), jnp.int32))

    def stage_fn(local_layers, local_xs, top, tokens):
        p = jax.lax.axis_index(PIPE_AXIS)
        pparams = dict(top)
        pparams["layers"] = local_layers
        positions = jnp.arange(T, dtype=jnp.int32)
        x0 = D._embed(pparams, cfg, tokens, positions)
        cos, sin = D.precompute_rope(cfg, positions)
        Lp = L // Pp

        def attn_fn(lxs_l, q, k, v, cache_):
            w = lxs_l if win is not None else None
            out, pf = att.prefill_attention(
                q, k, v, seq_len, scale,
                metric_window=spec.metric_window,
                metric_block=spec.metric_block,
                buffer_len=buffer_len,
                use_l2=spec.use_l2, use_average=spec.use_average,
                use_maxpool=spec.use_maxpool,
                logit_cap=cfg.attn_logit_softcap, alibi=al, window=w)
            return out, cache_, (k, v, pf)

        step = D._layer_step_fn(cfg, T, cos, sin, attn_fn, collect=True)

        def tick(carry, t):
            h_prev, ks, vs, pfs, last = carry
            x = jnp.where(p == 0, x0, h_prev).astype(x0.dtype)
            (y, _), (k_n, v_n, pf_n) = jax.lax.scan(
                step, (x, None), (local_layers, local_xs))
            mine = (t == p)
            keep = lambda new, old: jnp.where(mine, new, old)  # noqa: E731
            ks, vs, pfs = (keep(k_n.astype(ks.dtype), ks),
                           keep(v_n.astype(vs.dtype), vs),
                           keep(pf_n, pfs))
            fin = D._norm(y, pparams["final_norm"],
                          pparams.get("final_norm_b"), cfg)
            last = jnp.where((t == Pp - 1) & (p == Pp - 1),
                             fin.astype(jnp.float32), last)
            h_next = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, i + 1) for i in range(Pp - 1)])
            return (h_next, ks, vs, pfs, last), None

        h0 = jnp.zeros((T, D_size), top["embed"].dtype)
        adt = top["embed"].dtype
        carry0 = (h0,
                  jnp.zeros((Lp, T, Hkv, d), adt),
                  jnp.zeros((Lp, T, Hkv, d), adt),
                  jnp.zeros((Lp, T, Hkv), jnp.float32),
                  jnp.zeros((T, D_size), jnp.float32))
        (_, ks, vs, pfs, last), _ = jax.lax.scan(
            tick, carry0, jnp.arange(Pp))
        last = jax.lax.psum(last, PIPE_AXIS)
        return last, ks, vs, pfs

    top = {k: v for k, v in params.items() if k != "layers"}
    shard = jax.shard_map(
        stage_fn, mesh=mesh, axis_names={PIPE_AXIS},
        in_specs=(P(PIPE_AXIS), P(PIPE_AXIS), P(), P()),
        out_specs=(P(), P(PIPE_AXIS), P(PIPE_AXIS), P(PIPE_AXIS)),
        check_vma=False)
    hidden, ks, vs, pfs = shard(params["layers"], layer_xs, top, token_ids)
    last = jnp.take(hidden, jnp.clip(seq_len - 1, 0), axis=0)
    return last, ks, vs, pfs


def _causal_attn(_, q, k, v, cache):
    """Full causal attention with GQA head repetition (parity oracle for
    tests; the serving engine passes its own cache-aware attn_fn)."""
    T, H, d = q.shape
    k = jnp.repeat(k, H // k.shape[1], axis=1)
    v = jnp.repeat(v, H // v.shape[1], axis=1)
    logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * d ** -0.5
    mask = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(mask[None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype), cache
