"""Jitted device programs: prefill, decode, compress, free.

The TPU-native replacement for the reference's worker/model-runner layer
(vllm/worker/model_runner.py + worker.py): instead of per-step host-built
metadata and kernel launches, each engine action is ONE fixed-shape XLA
program over the donated CacheState. Shapes are bucketed (prefill length,
compression batch/blocks) and compiled programs are cached per bucket.

Program inventory:
- prefill: allocate blocks for one prompt, run the model prefill pass
  (writes KVs + prefill metrics), sample the first token.
- decode: batched single-token step - device-side block append (free-stack
  pop where a head crosses a block boundary), model decode pass with fused
  metric recording, sampling. Mirrors the engine hot loop at reference
  llm_engine.py:1484-1679 with all per-head state staying on device.
- compress: the full eviction round (kvcompress/eviction.py run_compression).
- free: release all blocks of finished/preempted sequences.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.config import EngineConfig, cdiv
from kvcompress_tpu.core.state import (CacheState, effective_free_blocks,
                                        stack_pop, stack_push)
from kvcompress_tpu.kvcompress.eviction import run_compression
from kvcompress_tpu.models import decoder as llama  # generic decoder
from kvcompress_tpu.models.decoder import AttentionSpec, KVCache
from kvcompress_tpu.engine import sampler as sampler_mod
from kvcompress_tpu.engine.sampler import SamplingTensors


class DecodeOutput(NamedTuple):
    tokens: jax.Array          # [S] i32 (device-resident, fed back next step)
    positions_next: jax.Array  # [S] i32 (device-resident)
    rng_next: jax.Array        # PRNG key (device-resident)
    remaining_next: jax.Array = None  # [S] i32 (multi-step budget left)
    active_next: jax.Array = None     # [S] bool
    packed: jax.Array = None   # [kS + 2S + 1 + S] i32: token matrix |
    #                            block_counts | kv_counts | free_top |
    #                            active - ONE host fetch per k steps
    min_remaining_next: jax.Array = None  # [S] i32
    token_counts_next: jax.Array = None   # [S, V] i32 (penalties on)
    chosen_logprobs: jax.Array = None     # [k, S] f32 (logprobs on)
    top_logprobs: jax.Array = None        # [k, S, n] f32
    top_logprob_ids: jax.Array = None     # [k, S, n] i32


def _cache_of(state: CacheState) -> KVCache:
    return KVCache(state.k_cache, state.v_cache, state.kv_metrics,
                   state.kv_positions, state.k_scale, state.v_scale)


def _with_cache(state: CacheState, cache: KVCache, **kw) -> CacheState:
    return CacheState(
        k_cache=cache.k, v_cache=cache.v, kv_metrics=cache.metrics,
        kv_positions=cache.positions,
        block_tables=kw.get("block_tables", state.block_tables),
        context_lens=kw.get("context_lens", state.context_lens),
        free_stack=kw.get("free_stack", state.free_stack),
        free_top=kw.get("free_top", state.free_top),
        k_scale=cache.k_scale, v_scale=cache.v_scale,
    )


class EnginePrograms:
    def __init__(self, cfg: EngineConfig, params: Dict[str, Any],
                 attn_impl: str = "xla", mesh=None, draft=None,
                 proposer=None):
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        # draft-model speculative decoding: (ModelConfig, params) of the
        # proposer (reference vllm/spec_decode/multi_step_worker.py)
        self.draft = draft
        # head-based proposers: (ProposerSpec, params) for medusa /
        # mlp_speculator (reference vllm/spec_decode/medusa_worker.py,
        # mlp_speculator_worker.py); proposals are fused into the verify
        # program (models/proposers.py)
        self.proposer = proposer
        kc = cfg.kvcompress
        self.prefill_spec = AttentionSpec(
            mode="prefill", use_l2=kc.use_l2, use_average=kc.use_average,
            use_maxpool=kc.use_maxpool,
            record_metrics=kc.enabled and not kc.random_eviction,
            metric_window=kc.prefill_metric_collection_window_size,
            metric_block=kc.prefill_metric_collection_block_size,
            impl=attn_impl)
        self.decode_spec = AttentionSpec(
            mode="decode", use_l2=kc.use_l2, use_average=kc.use_average,
            record_metrics=kc.enabled and kc.record_decoding_metrics
            and not kc.random_eviction,
            impl=attn_impl)
        self._prefill_fns: Dict[Any, Any] = {}
        self._compress_fns: Dict[Tuple[int, int], Any] = {}
        self._decode_fns: Dict[Any, Any] = {}
        self._free_fn = None
        self._prefix_fns: Dict[Any, Any] = {}
        # serving PP: model trunks route through the GPipe shard_map
        # programs (parallel/pipeline.py) and allocator pops/pushes route
        # by (layer group, head group) so blocks stay stage-local
        self.pp = max(cfg.parallel.pipeline_parallel_size, 1)

    # ------------------------------------------------------------- prefill
    def _build_prefill(self, T: int, use_seeds: bool = False,
                       logprobs_n: int = 0, use_lora: bool = False,
                       use_guided: bool = False, use_pa: bool = False,
                       mm_n: int = 0):
        cfg, mcfg, ccfg = self.cfg, self.cfg.model, self.cfg.cache
        bs = ccfg.block_size
        nbb = cdiv(T, bs)
        spec = self.prefill_spec

        def prefill_fn(state: CacheState, params, tokens, seq_len, slot,
                       buffer_len, st: SamplingTensors, rng, lora_idx,
                       lora_scale, allowed_mask, pa_embed, pa_len,
                       mm_embed, mm_pos):
            L, S, H, B = state.block_tables.shape
            # allocate ceil(seq_len / bs) blocks per (layer, head)
            # (reference kvcompress/block_manager.py:196-222 _add_sequence)
            nb_seq = cdiv(seq_len, bs) if isinstance(seq_len, int) else (
                (seq_len + bs - 1) // bs)
            need = jnp.broadcast_to(
                jnp.arange(nbb, dtype=jnp.int32)[None, None, :] < nb_seq,
                (L, H, nbb))
            ids, free_top = stack_pop(state.free_stack, state.free_top,
                                      need, head_axis=1, layer_axis=0,
                                      layer_groups=self.pp)
            block_tables = state.block_tables.at[:, slot, :, :nbb].set(ids)
            context_lens = state.context_lens.at[:, slot, :].set(
                seq_len.astype(jnp.int32))

            t_idx = jnp.arange(T, dtype=jnp.int32)

            lora = (lora_idx, lora_scale) if use_lora else None
            if self.pp > 1:
                # GPipe prompt pass (serving PP); adapters/multimodal are
                # rejected at engine init under pp
                assert not (use_lora or use_pa or mm_n), \
                    "prefill features unsupported under pipeline parallel"
                from kvcompress_tpu.parallel.pipeline import (
                    pipeline_paged_prefill)
                last_hidden, ks, vs, pfs = pipeline_paged_prefill(
                    params, mcfg, self.mesh, tokens, seq_len, buffer_len,
                    spec)
            else:
                last_hidden, ks, vs, pfs = llama.prefill(
                    params, mcfg, tokens, seq_len, None,
                    _cache_of(state), buffer_len, spec, lora=lora,
                    prefix_embed=pa_embed if use_pa else None,
                    prefix_len=pa_len if use_pa else None,
                    inject_embed=mm_embed if mm_n else None,
                    inject_pos=mm_pos if mm_n else None,
                    mesh=self.mesh, write_cache=False)
            # Cache-write epilogue as whole-BLOCK-row scatters (the prompt
            # fills blocks contiguously, so [L,T,H] reshapes straight to
            # [L,H,nbb,bs]); per-slot flat scatters of the same bytes
            # measure ~5x slower on TPU. Unneeded blocks carry id 0 and
            # land on the trash block.
            assert T == nbb * bs, (T, nbb, bs)
            d = mcfg.head_size
            L_, H_ = ids.shape[0], ids.shape[1]
            k_rows = jnp.transpose(ks, (0, 2, 1, 3)).reshape(
                L_, H_, nbb, bs, d)
            v_rows = jnp.transpose(vs, (0, 2, 1, 3)).reshape(
                L_, H_, nbb, bs, d)
            if spec.record_metrics:
                pf_rows = jnp.transpose(pfs, (0, 2, 1)).reshape(
                    L_, H_, nbb, bs)
            else:  # XLA prefill_attention computes metrics unconditionally
                pf_rows = jnp.zeros((L_, H_, nbb, bs), jnp.float32)
            cache = _cache_of(state)
            k_scale, v_scale = cache.k_scale, cache.v_scale
            if k_scale is not None:
                from kvcompress_tpu.ops.kv_quant import quantize_kv
                k_rows, k_sc = quantize_kv(k_rows)
                v_rows, v_sc = quantize_kv(v_rows)
                k_scale = k_scale.at[ids].set(k_sc)
                v_scale = v_scale.at[ids].set(v_sc)
            pos_row = jnp.where(t_idx < seq_len, t_idx, -1).reshape(
                nbb, bs)[None, None]                     # [1, 1, nbb, bs]
            cache = KVCache(
                cache.k.at[ids].set(k_rows.astype(cache.k.dtype)),
                cache.v.at[ids].set(v_rows.astype(cache.v.dtype)),
                cache.metrics.at[ids].set(pf_rows),
                cache.positions.at[ids].set(
                    jnp.broadcast_to(pos_row, (L_, H_, nbb, bs))),
                k_scale, v_scale)
            logits = llama.compute_logits(params, mcfg, last_hidden)[None]
            logits = sampler_mod.apply_logit_bias(logits, st)
            if use_guided:
                logits = jnp.where(allowed_mask[None], logits, -1e30)
            token = sampler_mod.sample(
                logits, st, rng, positions=(seq_len - 1)[None],
                use_seeds=use_seeds, pre_processed=True)[0]
            lp = None
            if logprobs_n > 0:
                lp = sampler_mod.compute_logprobs(logits, token[None],
                                                  logprobs_n)
            new_state = _with_cache(
                state, cache, block_tables=block_tables,
                context_lens=context_lens, free_stack=state.free_stack,
                free_top=free_top)
            # packed [2]: token | effective free blocks - one host fetch
            return new_state, jnp.stack(
                [token, effective_free_blocks(free_top)]), lp

        return jax.jit(prefill_fn, donate_argnums=(0,))

    def prefill(self, state, tokens_np, seq_len: int, slot: int,
                buffer_len: int, st: SamplingTensors, rng,
                use_seeds: bool = False, logprobs_n: int = 0,
                lora_idx: int = 0, lora_scale=None, allowed_mask=None,
                pa_embed=None, pa_len: int = 0,
                mm_embed=None, mm_pos=None):
        buckets = [b for b in self.cfg.scheduler.prefill_buckets
                   if b >= seq_len]
        T = buckets[0] if buckets else self.cfg.scheduler.max_model_len
        # a bucket beyond the block tables' capacity would allocate past
        # max_blocks_per_head (default buckets start at 128, so small
        # max_model_len configs crashed the allocation scatter)
        bs_ = self.cfg.cache.block_size
        cap = self.cfg.max_blocks_per_head * bs_
        T = min(max(T, (seq_len + bs_ - 1) // bs_ * bs_), cap)
        use_lora = lora_scale is not None
        use_guided = allowed_mask is not None
        use_pa = pa_embed is not None
        mm_n = 0 if mm_embed is None else mm_embed.shape[0]
        key = (T, use_seeds, logprobs_n, use_lora, use_guided, use_pa,
               mm_n)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = self._build_prefill(
                T, use_seeds=use_seeds, logprobs_n=logprobs_n,
                use_lora=use_lora, use_guided=use_guided, use_pa=use_pa,
                mm_n=mm_n)
        tokens = np.zeros((T,), np.int32)
        tokens[:seq_len] = tokens_np
        if lora_scale is None:
            lora_scale = jnp.zeros((1,), jnp.float32)
        if allowed_mask is None:
            allowed_mask = jnp.zeros((1,), bool)
        if pa_embed is None:
            pa_embed = jnp.zeros((1, 1), jnp.float32)
        if mm_embed is None:
            mm_embed = jnp.zeros((1, 1), jnp.float32)
            mm_pos = jnp.full((1,), T, jnp.int32)  # dropped (out of range)
        return self._prefill_fns[key](
            state, self.params, jnp.asarray(tokens),
            jnp.asarray(seq_len, jnp.int32), jnp.asarray(slot, jnp.int32),
            jnp.asarray(buffer_len, jnp.int32), st, rng,
            jnp.asarray(lora_idx, jnp.int32), lora_scale, allowed_mask,
            pa_embed, jnp.asarray(pa_len, jnp.int32),
            jnp.asarray(mm_embed), jnp.asarray(mm_pos, jnp.int32))

    # ------------------------------------------- chunked-prefill continuation
    def _build_prefill_cont(self, T: int, nb_off: int, is_final: bool,
                            use_seeds: bool = False, logprobs_n: int = 0,
                            use_lora: bool = False, use_guided: bool = False,
                            mm_n: int = 0):
        """Continuation chunk of a prompt longer than the largest prefill
        bucket: tokens [nb_off*bs, nb_off*bs + chunk_len) attend the cached
        prefix (gathered per layer) plus themselves, write their KVs to
        freshly popped blocks at table positions [nb_off, nb_off + T/bs),
        and - on the final chunk - scatter the globally-windowed metric
        rows back over the prefix blocks and sample the first token.
        Intermediate chunks skip the metric pass and the sampler."""
        import dataclasses

        cfg, mcfg, ccfg = self.cfg, self.cfg.model, self.cfg.cache
        bs = ccfg.block_size
        nbb = cdiv(T, bs)
        P = nb_off * bs
        spec = dataclasses.replace(
            self.prefill_spec,
            record_metrics=self.prefill_spec.record_metrics and is_final)

        def cont_fn(state: CacheState, params, tokens, chunk_len, slot,
                    buffer_len, st: SamplingTensors, rng, lora_idx,
                    lora_scale, allowed_mask, mm_embed, mm_pos):
            L, S, H, B = state.block_tables.shape
            pre_ids = state.block_tables[:, slot, :, :nb_off]  # [L, H, nb]
            nb_seq = (chunk_len + bs - 1) // bs
            need = jnp.broadcast_to(
                jnp.arange(nbb, dtype=jnp.int32)[None, None, :] < nb_seq,
                (L, H, nbb))
            ids, free_top = stack_pop(state.free_stack, state.free_top,
                                      need, head_axis=1, layer_axis=0,
                                      layer_groups=self.pp)
            block_tables = state.block_tables.at[
                :, slot, :, nb_off:nb_off + nbb].set(ids)
            context_lens = state.context_lens.at[:, slot, :].set(
                (P + chunk_len).astype(jnp.int32))

            lora = (lora_idx, lora_scale) if use_lora else None
            last_hidden, ks, vs, pfs = llama.prefill_cont(
                params, mcfg, tokens, chunk_len, pre_ids,
                _cache_of(state), buffer_len, spec, lora=lora,
                inject_embed=mm_embed if mm_n else None,
                inject_pos=mm_pos if mm_n else None)
            # fresh-row epilogue (same block-row scatters as _build_prefill)
            assert T == nbb * bs, (T, nbb, bs)
            d = mcfg.head_size
            t_idx = jnp.arange(T, dtype=jnp.int32)
            k_rows = jnp.transpose(ks, (0, 2, 1, 3)).reshape(
                L, H, nbb, bs, d)
            v_rows = jnp.transpose(vs, (0, 2, 1, 3)).reshape(
                L, H, nbb, bs, d)
            if spec.record_metrics:   # pfs: [L, P + T, H]
                pf_rows = jnp.transpose(pfs[:, P:, :], (0, 2, 1)).reshape(
                    L, H, nbb, bs)
            else:
                pf_rows = jnp.zeros((L, H, nbb, bs), jnp.float32)
            cache = _cache_of(state)
            k_scale, v_scale = cache.k_scale, cache.v_scale
            if k_scale is not None:
                from kvcompress_tpu.ops.kv_quant import quantize_kv
                k_rows, k_sc = quantize_kv(k_rows)
                v_rows, v_sc = quantize_kv(v_rows)
                k_scale = k_scale.at[ids].set(k_sc)
                v_scale = v_scale.at[ids].set(v_sc)
            pos_row = jnp.where(t_idx < chunk_len, P + t_idx, -1).reshape(
                nbb, bs)[None, None]
            metrics = cache.metrics.at[ids].set(pf_rows)
            if spec.record_metrics:
                # final chunk: its metric pass covered the WHOLE prompt -
                # overwrite the prefix blocks' rows (earlier chunks wrote
                # window-relative values that are now superseded)
                pre_rows = jnp.transpose(pfs[:, :P, :], (0, 2, 1)).reshape(
                    L, H, nb_off, bs)
                metrics = metrics.at[pre_ids].set(pre_rows)
            cache = KVCache(
                cache.k.at[ids].set(k_rows.astype(cache.k.dtype)),
                cache.v.at[ids].set(v_rows.astype(cache.v.dtype)),
                metrics,
                cache.positions.at[ids].set(
                    jnp.broadcast_to(pos_row, (L, H, nbb, bs))),
                k_scale, v_scale)
            if is_final:
                logits = llama.compute_logits(params, mcfg,
                                              last_hidden)[None]
                logits = sampler_mod.apply_logit_bias(logits, st)
                if use_guided:
                    logits = jnp.where(allowed_mask[None], logits, -1e30)
                token = sampler_mod.sample(
                    logits, st, rng, positions=(P + chunk_len - 1)[None],
                    use_seeds=use_seeds, pre_processed=True)[0]
                lp = None
                if logprobs_n > 0:
                    lp = sampler_mod.compute_logprobs(
                        logits, token[None], logprobs_n)
            else:
                token = jnp.asarray(0, jnp.int32)
                lp = None
            new_state = _with_cache(
                state, cache, block_tables=block_tables,
                context_lens=context_lens, free_stack=state.free_stack,
                free_top=free_top)
            return new_state, jnp.stack(
                [token, effective_free_blocks(free_top)]), lp

        return jax.jit(cont_fn, donate_argnums=(0,))

    def prefill_cont(self, state, tokens_np, chunk_len: int, nb_off: int,
                     slot: int, buffer_len: int, st: SamplingTensors, rng,
                     is_final: bool, use_seeds: bool = False,
                     logprobs_n: int = 0, lora_idx: int = 0,
                     lora_scale=None, allowed_mask=None,
                     mm_embed=None, mm_pos=None):
        """Dispatch one continuation chunk (offset == nb_off * block_size).
        T buckets like prefill; the program is cached by ALL static flags
        (dict cache convention - see CLAUDE.md)."""
        seq_len = len(tokens_np)
        buckets = [b for b in self.cfg.scheduler.prefill_buckets
                   if b >= seq_len]
        T = buckets[0] if buckets else self.cfg.scheduler.max_model_len
        bs_ = self.cfg.cache.block_size
        cap = self.cfg.max_blocks_per_head * bs_ - nb_off * bs_
        T = min(max(T, (seq_len + bs_ - 1) // bs_ * bs_), cap)
        use_lora = lora_scale is not None
        use_guided = allowed_mask is not None
        mm_n = 0 if mm_embed is None else mm_embed.shape[0]
        key = ("cont", T, nb_off, is_final, use_seeds, logprobs_n,
               use_lora, use_guided, mm_n)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = self._build_prefill_cont(
                T, nb_off, is_final, use_seeds=use_seeds,
                logprobs_n=logprobs_n, use_lora=use_lora,
                use_guided=use_guided, mm_n=mm_n)
        tokens = np.zeros((T,), np.int32)
        tokens[:seq_len] = tokens_np
        if lora_scale is None:
            lora_scale = jnp.zeros((1,), jnp.float32)
        if allowed_mask is None:
            allowed_mask = jnp.zeros((1,), bool)
        if mm_embed is None:
            mm_embed = jnp.zeros((1, 1), jnp.float32)
            mm_pos = jnp.full((1,), T, jnp.int32)  # dropped (out of range)
        return self._prefill_fns[key](
            state, self.params, jnp.asarray(tokens),
            jnp.asarray(seq_len, jnp.int32), jnp.asarray(slot, jnp.int32),
            jnp.asarray(buffer_len, jnp.int32), st, rng,
            jnp.asarray(lora_idx, jnp.int32), lora_scale, allowed_mask,
            jnp.asarray(mm_embed), jnp.asarray(mm_pos, jnp.int32))

    # -------------------------------------------------------------- decode
    def _kernel_n_pad(self, nb: Optional[int] = None) -> int:
        """Logical metric width used by the decode kernel (matches the
        lane-alignment padding in ops/pallas/paged_attention.py)."""
        bs = self.cfg.cache.block_size
        if nb is None:
            nb = self.cfg.max_blocks_per_head
        if nb * bs <= 128:
            return nb * bs
        C = max(1, 128 // bs)
        return (nb + (-nb) % C) * bs

    def _build_decode(self, multi_steps: int = 1,
                      greedy_only: bool = False,
                      use_metric_buffer: bool = False,
                      use_penalties: bool = False,
                      use_seeds: bool = False,
                      logprobs_n: int = 0,
                      use_lora: bool = False,
                      use_guided: bool = False,
                      nb_bucket: Optional[int] = None):
        """One jitted program running `multi_steps` decode iterations via
        lax.scan: ONE dispatch + ONE host fetch per k tokens. EOS and
        max-tokens termination are enforced on device (a finished slot's
        active flag drops, freezing its cache), so overgeneration never
        corrupts state; the host trims the token matrix afterwards.
        (The reference's multi-step worker, vllm/worker/multi_step_*,
        achieves the same host-sync amortisation with CUDA-side advance.)

        On TPU the attention kernel reads the paged cache READ-ONLY and the
        burst's fresh KVs ride in dense tail buffers threaded through the
        scan carry; K/V/position/metric writes to the paged cache all
        happen ONCE per burst in the flush epilogue (single scatters) -
        per-step cache RMW DMAs were the dominant decode cost."""
        cfg, mcfg, ccfg = self.cfg, self.cfg.model, self.cfg.cache
        bs = ccfg.block_size
        spec = self.decode_spec

        tail_mode = spec.impl in ("pallas", "interpret")
        record = spec.record_metrics
        # bucketed attention width: the kernel's per-head cost scales with
        # the processed table width, so compressed workloads (tiny per-head
        # contexts) run over a much narrower slice of the block tables
        nb_tbl = min(nb_bucket or self.cfg.max_blocks_per_head,
                     self.cfg.max_blocks_per_head)
        n_pad = self._kernel_n_pad(nb_tbl)
        KT = multi_steps
        d = mcfg.head_size

        def decode_fn(state: CacheState, params, tokens, positions, active,
                      buffer_lens, st: SamplingTensors, rng, eos_ids,
                      ignore_eos, remaining, min_remaining, token_counts,
                      prompt_mask, lora_idx, lora_scale, allowed_mask):
            L, S, H, B = state.block_tables.shape

            acc0 = (jnp.zeros((L, S, H, n_pad), jnp.float32)
                    if tail_mode and record else None)
            acc_t0 = (jnp.zeros((L, S, H, KT), jnp.float32)
                      if tail_mode and record else None)
            tail0 = None
            if tail_mode:
                # int8 caches keep the burst tail UNQUANTIZED (bf16): fresh
                # KVs are quantized once, at the flush epilogue
                cdtype = state.k_cache.dtype
                if cdtype == jnp.int8:
                    cdtype = jnp.bfloat16
                tail0 = (jnp.zeros((L, S, H, KT, d), cdtype),
                         jnp.zeros((L, S, H, KT, d), cdtype),
                         jnp.full((S, KT), -1, jnp.int32),  # positions
                         jnp.zeros((S,), jnp.int32))        # count
            pos_dense0 = None
            if tail_mode and record and use_metric_buffer:
                # dense logical-space positions of the CACHED KVs; static
                # across the burst (the paged cache is read-only here)
                bt_v = state.block_tables[..., :nb_tbl]
                phys = (bt_v[..., None] * bs
                        + jnp.arange(bs, dtype=jnp.int32)).reshape(
                            L, S, H, nb_tbl * bs)
                pos_dense0 = state.kv_positions.reshape(-1)[phys]
                if n_pad > nb_tbl * bs:
                    pos_dense0 = jnp.pad(
                        pos_dense0,
                        ((0, 0),) * 3 + ((0, n_pad - nb_tbl * bs),),
                        constant_values=-1)

            def one_step(carry, _):
                (state, tokens, positions, active, rng, remaining,
                 min_remaining, token_counts, acc, acc_t, tail) = carry
                state, out, acc, acc_t, tail, token_counts, lp = decode_step(
                    state, params, tokens, positions, active, buffer_lens,
                    st, rng, acc, acc_t, tail, pos_dense0, token_counts,
                    prompt_mask, lora_idx, lora_scale, allowed_mask)
                remaining = remaining - active.astype(jnp.int32)
                min_remaining = min_remaining - active.astype(jnp.int32)
                is_eos = (jnp.isin(out.tokens, eos_ids) & ~ignore_eos
                          & (min_remaining <= 0))
                next_active = active & ~is_eos & (remaining > 0)
                carry = (state, out.tokens, out.positions_next, next_active,
                         out.rng_next, remaining, min_remaining,
                         token_counts, acc, acc_t, tail)
                return carry, (out.tokens, out.packed, lp)

            carry0 = (state, tokens, positions, active, rng, remaining,
                      min_remaining, token_counts, acc0, acc_t0, tail0)
            if multi_steps == 1:
                carry, (tok_seq, packed_seq, lp_seq) = one_step(carry0, None)
                tok_seq = tok_seq[None]
                last_packed = packed_seq
                if lp_seq is not None:
                    lp_seq = jax.tree.map(lambda x: x[None], lp_seq)
            else:
                carry, (tok_seq, packed_seq, lp_seq) = jax.lax.scan(
                    one_step, carry0, None, length=multi_steps)
                last_packed = packed_seq[-1]
            (state, tokens, positions, active, rng, remaining,
             min_remaining, token_counts, acc, acc_t, tail) = carry

            if tail_mode:
                state = flush_burst(state, acc, acc_t, tail)

            S_ = tokens.shape[0]
            max_nb = jnp.max(
                (state.context_lens + bs - 1) // bs).astype(jnp.int32)
            # packed: k*S tokens | blk | kv | free_top | active | max_nb
            packed = jnp.concatenate([
                tok_seq.reshape(-1), last_packed[S_:],
                active.astype(jnp.int32), max_nb[None]])
            lp_c = lp_t = lp_i = None
            if lp_seq is not None:
                lp_c, lp_t, lp_i = lp_seq
            return state, DecodeOutput(
                tokens=tokens, positions_next=positions, rng_next=rng,
                remaining_next=remaining, active_next=active,
                packed=packed, min_remaining_next=min_remaining,
                token_counts_next=token_counts,
                chosen_logprobs=lp_c, top_logprobs=lp_t,
                top_logprob_ids=lp_i)

        def flush_burst(state: CacheState, acc, acc_t, tail):
            """Burst epilogue: write the tail KVs/positions into the paged
            cache and fold the metric accumulators, each as one scatter
            (reference equivalents: reshape_and_cache_kvc per step +
            CompressionMetrics.aggregate_decode per step)."""
            tail_k, tail_v, tail_pos, tail_cnt = tail
            L, S, H, B = state.block_tables.shape
            nblk, bsz = state.kv_metrics.shape

            # Physical slots of every tail entry through the FINAL tables.
            # A head's logical index is NOT the token position (compression
            # compacts each head independently): tail entry i of a head with
            # final context c and tail length t sits at logical c - t + i.
            i_idx = jnp.arange(KT, dtype=jnp.int32)
            logical = (state.context_lens[..., None]
                       - tail_cnt[None, :, None, None]
                       + i_idx)                       # [L, S, H, KT]
            valid = (i_idx[None, None, None, :]
                     < tail_cnt[None, :, None, None]) & (logical >= 0)
            lc = jnp.clip(logical, 0)
            blk = jnp.take_along_axis(state.block_tables, lc // bsz,
                                      axis=-1)        # [L, S, H, KT]
            # drop sentinel must be a POSITIVE out-of-range index: negative
            # indices wrap in jnp scatters even under mode="drop"
            slots = jnp.where(valid, blk * bsz + lc % bsz, nblk * bsz)
            flat = slots.reshape(-1)
            p = tail_pos  # [S, KT] logical token positions (-1 empty)

            k_scale, v_scale = state.k_scale, state.v_scale
            if k_scale is not None:
                from kvcompress_tpu.ops.kv_quant import quantize_kv
                tail_k, k_sc = quantize_kv(tail_k)
                tail_v, v_sc = quantize_kv(tail_v)
                k_scale = k_scale.reshape(-1).at[flat].set(
                    k_sc.reshape(-1), mode="drop").reshape(k_scale.shape)
                v_scale = v_scale.reshape(-1).at[flat].set(
                    v_sc.reshape(-1), mode="drop").reshape(v_scale.shape)
            k_cache = state.k_cache.reshape(-1, d).at[flat].set(
                tail_k.reshape(-1, d).astype(state.k_cache.dtype),
                mode="drop").reshape(state.k_cache.shape)
            v_cache = state.v_cache.reshape(-1, d).at[flat].set(
                tail_v.reshape(-1, d).astype(state.v_cache.dtype),
                mode="drop").reshape(state.v_cache.shape)
            pos_vals = jnp.broadcast_to(p[None, :, None, :],
                                        (L, S, H, KT)).reshape(-1)
            kv_positions = state.kv_positions.reshape(-1).at[flat].set(
                pos_vals, mode="drop").reshape(state.kv_positions.shape)
            kv_metrics = state.kv_metrics.reshape(-1).at[flat].set(
                0.0, mode="drop").reshape(state.kv_metrics.shape)

            if record:
                # cached-part accumulator: block-row indexed adds through
                # the final tables (tail columns are zero in acc)
                bt_rows = state.block_tables[..., :nb_tbl].reshape(-1)
                updates = acc[..., :nb_tbl * bsz].reshape(-1, bsz)
                kv_metrics = kv_metrics.at[bt_rows].add(updates)
                # tail accumulator straight onto the freshly-zeroed slots
                kv_metrics = kv_metrics.reshape(-1).at[flat].add(
                    acc_t.reshape(-1), mode="drop").reshape(
                    kv_metrics.shape)

            return CacheState(
                k_cache=k_cache, v_cache=v_cache, kv_metrics=kv_metrics,
                kv_positions=kv_positions,
                block_tables=state.block_tables,
                context_lens=state.context_lens,
                free_stack=state.free_stack, free_top=state.free_top,
                k_scale=k_scale, v_scale=v_scale)

        def decode_step(state: CacheState, params, tokens, positions, active,
                        buffer_lens, st: SamplingTensors, rng, acc,
                        acc_t, tail, pos_dense, token_counts, prompt_mask,
                        lora_idx, lora_scale, allowed_mask):
            lora = (lora_idx, lora_scale) if use_lora else None
            rng, sample_rng = jax.random.split(rng)
            L, S, H, B = state.block_tables.shape
            ctx = state.context_lens
            # device-side batched append (reference
            # block_manager.py:269-307 _append_to_sequence_batch)
            need = active[None, :, None] & (ctx % bs == 0)
            ids, free_top = stack_pop(state.free_stack, state.free_top,
                                      need, head_axis=2, layer_axis=0,
                                      layer_groups=self.pp)
            li = jnp.arange(L)[:, None, None]
            si = jnp.arange(S)[None, :, None]
            hi = jnp.arange(H)[None, None, :]
            blk_idx = jnp.where(need, ctx // bs, B)  # drop where not needed
            block_tables = state.block_tables.at[li, si, hi, blk_idx].set(
                ids, mode="drop")
            new_ctx = ctx + active[None, :, None].astype(jnp.int32)
            last = new_ctx - 1

            if tail_mode:
                tail_k, tail_v, tail_pos, tail_cnt = tail
                tail_len = tail_cnt + active.astype(jnp.int32)
                hidden, tail_k, tail_v, m_cached, m_tail = (
                    llama.decode_tail(
                        params, mcfg, tokens, positions,
                        block_tables[..., :nb_tbl],
                        new_ctx, tail_k, tail_v, tail_cnt, tail_len,
                        _cache_of(state), active, spec, lora=lora,
                        mesh=self.mesh))
                # record the new tail entry's logical position
                srow = jnp.arange(S)
                wrow = jnp.where(active, tail_cnt, KT)
                tail_pos = tail_pos.at[srow, wrow].set(
                    positions, mode="drop")
                if record:
                    if use_metric_buffer:
                        rec = (pos_dense >= 0) & (
                            pos_dense
                            <= (positions - buffer_lens)[None, :, None,
                                                         None])
                        m_cached = jnp.where(rec, m_cached, 0.0)
                        rec_t = (tail_pos >= 0) & (
                            tail_pos
                            <= (positions - buffer_lens)[:, None])
                        m_tail = jnp.where(rec_t[None, :, None, :],
                                           m_tail, 0.0)
                    acc = acc + m_cached
                    acc_t = acc_t + m_tail
                tail = (tail_k, tail_v, tail_pos, tail_cnt
                        + active.astype(jnp.int32))
                cache = _cache_of(state)
            else:
                sm = jnp.take_along_axis(
                    block_tables, (last // bs)[..., None], axis=-1
                )[..., 0] * bs + last % bs  # [L, S, H]
                if self.pp > 1:
                    from kvcompress_tpu.parallel.pipeline import (
                        pipeline_paged_decode)
                    hidden, cache = pipeline_paged_decode(
                        params, mcfg, self.mesh, tokens, positions,
                        block_tables, new_ctx, sm, _cache_of(state),
                        buffer_lens, active, spec)
                else:
                    hidden, cache = llama.decode(
                        params, mcfg, tokens, positions, block_tables,
                        new_ctx, sm, _cache_of(state), buffer_lens, active,
                        spec, lora=lora)
            logits = llama.compute_logits(params, mcfg, hidden)
            if use_penalties:
                logits = sampler_mod.apply_penalties(
                    logits, token_counts, prompt_mask, st)
            logits = sampler_mod.apply_logit_bias(logits, st)
            if use_guided:
                logits = jnp.where(allowed_mask, logits, -1e30)
            out_tokens = sampler_mod.sample(
                logits, st, sample_rng, greedy_only=greedy_only,
                positions=positions, use_seeds=use_seeds,
                pre_processed=True)
            lp = None
            if logprobs_n > 0:
                lp = sampler_mod.compute_logprobs(logits, out_tokens,
                                                  logprobs_n)
            if use_penalties:
                S_ = out_tokens.shape[0]
                token_counts = token_counts.at[
                    jnp.arange(S_), out_tokens].add(
                    active.astype(jnp.int32))

            nb_alloc = (new_ctx + bs - 1) // bs
            seq_block_counts = jnp.sum(nb_alloc, axis=(0, 2)).astype(
                jnp.int32)
            seq_kv_counts = jnp.sum(new_ctx, axis=(0, 2)).astype(jnp.int32)

            new_state = _with_cache(
                state, cache, block_tables=block_tables,
                context_lens=new_ctx, free_top=free_top)
            packed = jnp.concatenate([
                out_tokens, seq_block_counts, seq_kv_counts,
                effective_free_blocks(free_top)[None]])
            out = DecodeOutput(
                tokens=out_tokens,
                positions_next=positions + active.astype(jnp.int32),
                rng_next=rng,
                packed=packed)
            return new_state, out, acc, acc_t, tail, token_counts, lp

        return jax.jit(decode_fn, donate_argnums=(0,))

    def decode(self, state, tokens, positions, active, buffer_lens,
               st: SamplingTensors, rng, eos_ids, ignore_eos, remaining,
               multi_steps: int = 1, greedy_only: bool = False,
               use_metric_buffer: bool = False,
               min_remaining=None, token_counts=None, prompt_mask=None,
               use_penalties: bool = False, use_seeds: bool = False,
               logprobs_n: int = 0, lora_idx=None, lora_scale=None,
               allowed_mask=None, nb_bucket: Optional[int] = None):
        use_lora = lora_scale is not None
        use_guided = allowed_mask is not None
        key = (multi_steps, greedy_only, use_metric_buffer, use_penalties,
               use_seeds, logprobs_n, use_lora, use_guided, nb_bucket)
        if key not in self._decode_fns:
            self._decode_fns[key] = self._build_decode(
                multi_steps, greedy_only, use_metric_buffer,
                use_penalties=use_penalties, use_seeds=use_seeds,
                logprobs_n=logprobs_n, use_lora=use_lora,
                use_guided=use_guided, nb_bucket=nb_bucket)
        if min_remaining is None:
            min_remaining = jnp.zeros_like(remaining)
        if lora_idx is None:
            lora_idx = jnp.zeros(tokens.shape, jnp.int32)
        if lora_scale is None:
            lora_scale = jnp.zeros((1,), jnp.float32)
        if allowed_mask is None:
            allowed_mask = jnp.zeros((1, 1), bool)
        return self._decode_fns[key](state, self.params, tokens, positions,
                               active,
                               buffer_lens, st, rng, eos_ids, ignore_eos,
                               remaining, min_remaining, token_counts,
                               prompt_mask, lora_idx, lora_scale,
                               allowed_mask)


    # -------------------------------------------------------------- embed
    def _build_embed(self, T: int, pooling: str, normalize: bool):
        """Embedding-mode forward (reference embedding worker + Pooler):
        full causal attention over the prompt, no cache interaction,
        pooled final hidden state."""
        mcfg = self.cfg.model

        def embed_fn(params, tokens, seq_len):
            positions = jnp.arange(T, dtype=jnp.int32)
            scale = llama.attn_scale(mcfg)

            def attn_fn(_, q, k, v, cache):
                out, _ = llama.att.prefill_attention(
                    q, k, v, seq_len, scale, metric_window=1,
                    buffer_len=jnp.asarray(0), use_l2=False,
                    use_average=False, use_maxpool=False,
                    logit_cap=mcfg.attn_logit_softcap)
                return out, cache

            hidden, _ = llama.forward(
                params, mcfg, tokens, positions, None, attn_fn,
                jnp.zeros((mcfg.num_layers, 1), jnp.int32))
            if pooling == "last":
                pooled = jnp.take(hidden, jnp.clip(seq_len - 1, 0), axis=0)
            elif pooling == "cls":
                pooled = hidden[0]
            else:  # mean over the real tokens
                mask = (jnp.arange(T) < seq_len)[:, None]
                pooled = jnp.sum(jnp.where(mask, hidden, 0), axis=0) / (
                    jnp.maximum(seq_len, 1).astype(hidden.dtype))
            pooled = pooled.astype(jnp.float32)
            if normalize:
                pooled = pooled / jnp.maximum(
                    jnp.linalg.norm(pooled), 1e-12)
            return pooled

        return jax.jit(embed_fn)

    def embed(self, tokens_np, seq_len: int, pooling: str = "last",
              normalize: bool = True):
        buckets = [b for b in self.cfg.scheduler.prefill_buckets
                   if b >= seq_len]
        T = buckets[0] if buckets else self.cfg.scheduler.max_model_len
        key = ("embed", T, pooling, normalize)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = self._build_embed(T, pooling, normalize)
        tokens = np.zeros((T,), np.int32)
        tokens[:seq_len] = tokens_np
        return self._prefill_fns[key](self.params, jnp.asarray(tokens),
                                      jnp.asarray(seq_len, jnp.int32))

    # ------------------------------------------------------------- speculate
    def draft_ring_init(self, W: int):
        """Draft KV ring buffers: a DENSE rolling window of the draft's
        last-W K/V per slot - no paging, no rollback machinery (rejected
        proposals are simply overwritten when the corrected tokens are
        re-ingested at the same ring positions next round). The TPU-first
        re-design of the reference's draft KV cache + recompute rollback
        (vllm/spec_decode/multi_step_worker.py + draft_model_runner.py)."""
        dcfg = self.draft[0]
        S = self.cfg.scheduler.max_num_seqs
        L, H, d = dcfg.num_layers, dcfg.num_kv_heads, dcfg.head_size
        dt = jnp.float32 if dcfg.dtype == "float32" else jnp.bfloat16
        return {
            "k": jnp.zeros((L, S, W, H, d), dt),
            "v": jnp.zeros((L, S, W, H, d), dt),
            "pos": jnp.full((S, W), -1, jnp.int32),  # abs position per slot
        }

    def _draft_attn_ring(self, dcfg, scale, positions, ring_pos):
        """Single-token batched attention over the ring (window-masked):
        the new token attends the valid ring entries plus itself."""

        def attn_fn(lxs, q, k, v, cache):
            ring_k_l, ring_v_l = lxs            # [S, W, Hkv, d] each
            S, Wn = ring_pos.shape
            qpk = dcfg.num_heads // dcfg.num_kv_heads
            qf = q.astype(jnp.float32)          # [S, Hq, d]
            krq = jnp.repeat(ring_k_l.astype(jnp.float32), qpk, axis=2)
            lg = jnp.einsum("shd,swhd->shw", qf, krq) * scale
            valid = ((ring_pos >= 0)
                     & (ring_pos < positions[:, None])
                     & (ring_pos >= positions[:, None] - Wn))
            lg = jnp.where(valid[:, None, :], lg, -1e30)
            kq_self = jnp.repeat(k.astype(jnp.float32), qpk, axis=1)
            lg_self = jnp.einsum("shd,shd->sh", qf, kq_self) * scale
            m = jnp.maximum(jnp.max(lg, axis=-1), lg_self)
            e = jnp.where(valid[:, None, :],
                          jnp.exp(lg - m[..., None]), 0.0)
            e_self = jnp.exp(lg_self - m)
            denom = e.sum(-1) + e_self
            vr = jnp.repeat(ring_v_l.astype(jnp.float32), qpk, axis=2)
            vq_self = jnp.repeat(v.astype(jnp.float32), qpk, axis=1)
            out = (jnp.einsum("shw,swhd->shd", e, vr)
                   + e_self[..., None] * vq_self) / denom[..., None]
            return out.astype(q.dtype), cache, (k, v)

        return attn_fn

    def _build_draft_round(self, W: int, Q_in: int, gamma: int):
        """One fused speculation round for the draft: ingest up to Q_in
        corrected/accepted tokens (teacher-forced; their K/V overwrite any
        stale proposal K/V at the same ring positions), then keep stepping
        to emit proposals - (Q_in + gamma) single-token batched steps in
        ONE dispatch, each appending to the ring."""
        dcfg, _ = self.draft
        scale = llama.attn_scale(dcfg)
        S = self.cfg.scheduler.max_num_seqs
        steps = Q_in + gamma
        eagle = dcfg.eagle

        def step(dparams, ring, tokens, positions, active, hid_in):
            # one batched single-token draft step; returns next-token argmax
            attn = self._draft_attn_ring(dcfg, scale, positions,
                                         ring["pos"])
            override = None
            if eagle:
                from kvcompress_tpu.models.eagle import fc_embed
                mask_pos = positions if dcfg.eagle_mask_pos0 else None
                override = lambda x: fc_embed(dparams, x, hid_in,  # noqa
                                              mask_pos)
            hidden, _, kv = llama.forward_collect(
                dparams, dcfg, tokens, positions, None, attn,
                (ring["k"], ring["v"]), embed_override=override)
            ks, vs = kv  # [L, S, Hkv, d] new K/V per layer
            slot = positions % W
            si = jnp.arange(S)
            wslot = jnp.where(active, slot, W)  # drop inactive writes
            rk = ring["k"].at[:, si, wslot].set(ks, mode="drop")
            rv = ring["v"].at[:, si, wslot].set(vs, mode="drop")
            rpos = ring["pos"].at[si, wslot].set(positions, mode="drop")
            logits = llama.compute_logits(dparams, dcfg, hidden)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return {"k": rk, "v": rv, "pos": rpos}, nxt, hidden

        def round_fn(dparams, ring, packed, tgt_hid):
            # packed [S, Q_in + 3] i32: ingest | n_in | pos0 | active -
            # ONE host->device transfer per speculation round (every
            # additional small transfer is a full tunnel RPC)
            ingest = packed[:, :Q_in]
            n_in = packed[:, Q_in]
            pos0 = packed[:, Q_in + 1]
            active = packed[:, Q_in + 2] > 0

            # step i uses ingest[:, i] while i < n_in
            # else the previously generated token; all steps emitted.
            # EAGLE: the fc hidden for ingested tokens is the TARGET's
            # (exported by the verify program, [S, Q_in]); proposal steps
            # chain the draft's own hidden (eagle.py autoregression)
            def one(carry, i):
                ring, prev_tok, prev_hid = carry
                tok = jnp.where(i < n_in,
                                ingest[:, jnp.minimum(i, Q_in - 1)],
                                prev_tok)
                if eagle:
                    th = tgt_hid[:, jnp.minimum(i, tgt_hid.shape[1] - 1)]
                    hid = jnp.where((i < n_in)[:, None],
                                    th.astype(jnp.float32), prev_hid)
                else:
                    hid = prev_hid
                pos = pos0 + i
                ring, nxt, hout = step(dparams, ring, tok, pos, active,
                                       hid)
                return (ring, nxt, hout.astype(jnp.float32)), nxt

            D_ = dcfg.hidden_size
            (ring, _, _), toks = jax.lax.scan(
                one, (ring, jnp.zeros((S,), jnp.int32),
                      jnp.zeros((S, D_), jnp.float32)),
                jnp.arange(steps, dtype=jnp.int32))
            # assemble the VERIFY token matrix in-program (no host or glue
            # dispatches between propose and verify): row = [current token
            # | gamma proposals], where seq s's proposals start at scan
            # step n_in[s]-1
            si = jnp.arange(S)
            k0 = jnp.maximum(n_in - 1, 0)
            cur = ingest[si, k0]
            idx = k0[:, None] + jnp.arange(gamma, dtype=jnp.int32)[None, :]
            props = toks[idx, si[:, None]]                # [S, gamma]
            vt = jnp.concatenate([cur[:, None], props], axis=1)
            vt = jnp.where(active[:, None], vt, -1)
            # verify's inputs come back on device too (no further
            # transfers): current position = pos0 + n_in - 1
            positions0 = pos0 + jnp.maximum(n_in - 1, 0)
            return ring, vt, positions0, active

        return jax.jit(round_fn, donate_argnums=(1,))

    def draft_round(self, ring, packed_np, gamma: int, tgt_hid=None):
        W = ring["pos"].shape[1]
        Q_in = packed_np.shape[1] - 3
        key = ("draft_round", W, Q_in, gamma)
        if key not in self._decode_fns:
            self._decode_fns[key] = self._build_draft_round(W, Q_in, gamma)
        if tgt_hid is None:
            # bootstrap zeros use the SAME (S, gamma+1, D) shape verify
            # exports: an (S, 1, D) first round would compile the whole
            # fused draft program twice (mid-serving retrace)
            S = self.cfg.scheduler.max_num_seqs
            tgt_hid = jnp.zeros((S, gamma + 1, self.draft[0].hidden_size),
                                jnp.float32)
        return self._decode_fns[key](
            self.draft[1], ring, jnp.asarray(packed_np), tgt_hid)

    def _build_draft_warm(self, W: int):
        """Ring warm-up: one batched forward over each sequence's last-W
        window writes the whole ring (after prefill / preemption)."""
        dcfg, _ = self.draft
        scale = llama.attn_scale(dcfg)

        def warm_one(dparams, tokens, pos0, wlen):
            positions = pos0 + jnp.arange(W, dtype=jnp.int32)

            def attn_fn(_, q, k, v, cache):
                T = q.shape[0]
                qpk = dcfg.num_heads // dcfg.num_kv_heads
                kt = jnp.repeat(k.astype(jnp.float32), qpk, axis=1)
                vt = jnp.repeat(v.astype(jnp.float32), qpk, axis=1)
                lg = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                                kt) * scale
                qpos = jnp.arange(T)[None, :, None]
                kpos = jnp.arange(T)[None, None, :]
                mask = (kpos <= qpos) & (kpos >= W - wlen)
                lg = jnp.where(mask, lg, -1e30)
                p = jax.nn.softmax(lg, axis=-1)
                out = jnp.einsum("hqk,khd->qhd", p, vt)
                return out.astype(q.dtype), cache, (k, v)

            xs = jnp.zeros((dcfg.num_layers, 1), jnp.int32)
            override = None
            if dcfg.eagle:
                # no target hiddens exist for prompt positions: warm with
                # zeros (quality-only; see models/eagle.py docstring)
                from kvcompress_tpu.models.eagle import fc_embed

                mask_pos = positions if dcfg.eagle_mask_pos0 else None

                def override(x):
                    return fc_embed(dparams, x,
                                    jnp.zeros_like(x, jnp.float32),
                                    mask_pos)
            _, _, kv = llama.forward_collect(dparams, dcfg, tokens,
                                             positions, None, attn_fn, xs,
                                             embed_override=override)
            return kv  # (k [L, W, H, d], v)

        def warm_fn(dparams, ring, windows, pos0, wlens, active):
            ks, vs = jax.vmap(
                lambda t, p, l: warm_one(dparams, t, p, l),
                out_axes=1)(windows, pos0, wlens)  # [L, S, W, H, d]
            # ring slot of window index j (position pos0 + j) = pos % W;
            # warmed rows are fully reset first (the batch slot may have
            # been reused by a different request)
            S = windows.shape[0]
            rpos = jnp.where(active[:, None], -1, ring["pos"])
            positions = pos0[:, None] + jnp.arange(W)[None, :]  # [S, W]
            valid = ((jnp.arange(W)[None, :] >= W - wlens[:, None])
                     & active[:, None])
            slot = jnp.where(valid, positions % W, W)
            si = jnp.arange(S)[:, None]
            rk = ring["k"].at[:, si, slot].set(ks, mode="drop")
            rv = ring["v"].at[:, si, slot].set(vs, mode="drop")
            rpos = rpos.at[si, slot].set(
                jnp.where(valid, positions, -1), mode="drop")
            return {"k": rk, "v": rv, "pos": rpos}

        return jax.jit(warm_fn, donate_argnums=(1,))

    def draft_warm(self, ring, windows_np, pos0_np, wlens_np, active_np):
        W = ring["pos"].shape[1]
        key = ("draft_warm", W)
        if key not in self._decode_fns:
            self._decode_fns[key] = self._build_draft_warm(W)
        return self._decode_fns[key](
            self.draft[1], ring, jnp.asarray(windows_np),
            jnp.asarray(pos0_np), jnp.asarray(wlens_np),
            jnp.asarray(active_np))

    def _build_verify(self, Q: int, sampled: bool = False,
                      typical=None):
        """Speculative verification program (reference vllm/spec_decode/:
        proposal scoring via batch expansion): process Q tokens per
        sequence (current + Q-1 proposals) in one pass, accept the longest
        matching prefix, roll back the cache for the rejected remainder.
        Metric recording is off on this path (the reference forbids spec
        decode with KVC entirely; compression metrics here come from
        prefill + regular steps).

        sampled=True implements the reference rejection sampler's modified
        rejection sampling (vllm/model_executor/layers/rejection_sampler.py
        _get_accepted/_get_recovered_probs) specialized to DETERMINISTIC
        proposers (all five of ours - ngram/draft/medusa/mlp/eagle - emit
        argmax or lookup proposals, i.e. a one-hot draft distribution):
        draw x_i ~ q_i (the fully-processed target distribution: logit
        bias, temperature, top-k/p, min-p - engine/sampler.py) with the
        SAME (seed, position)-keyed Gumbel noise as the non-speculative
        decode path, and accept proposal t_i iff x_i == t_i. For a one-hot
        draft p=e_t this IS min(1, q/p)-acceptance (P[x==t] = q(t)) and
        the emitted token on rejection IS the residual sample
        (P[x=y | x!=t] = q(y)/(1-q(t)) = norm(max(q - p, 0))), so the
        output distribution equals non-speculative sampling exactly -
        and for seeded rows the output STREAM is token-identical to the
        non-speculative engine, which tests/test_spec_sampled.py asserts.

        When a head-based proposer (medusa / mlp_speculator) is
        configured, the NEXT round's proposals are computed here from the
        hidden state at the accepted position and appended to the packed
        result - the proposer costs no extra dispatch or fetch (the
        reference instead runs the proposer as its own model pass,
        vllm/spec_decode/medusa_worker.py:61-87)."""
        cfg, mcfg, ccfg = self.cfg, self.cfg.model, self.cfg.cache
        bs = ccfg.block_size
        spec = AttentionSpec(
            mode="decode", record_metrics=False, impl="xla")
        # EAGLE drafts consume the target's per-position hiddens next
        # round; export them ON DEVICE (never fetched)
        eagle_out = self.draft is not None and self.draft[0].eagle

        def verify_fn(state: CacheState, params, tokens, positions0,
                      active, prop_params, st, rng):
            L, S, H, B = state.block_tables.shape
            ctx0 = state.context_lens

            # allocate blocks for up to Q new tokens (static small loop)
            block_tables = state.block_tables
            free_stack, free_top = state.free_stack, state.free_top
            li = jnp.arange(L)[:, None, None]
            si = jnp.arange(S)[None, :, None]
            hi = jnp.arange(H)[None, None, :]
            for i in range(Q):
                # capacity guard: near max_model_len a verify row can run
                # past the block tables; without the `< B` term the pop
                # would hand out blocks whose table write drops (leaked
                # forever - rollback reads the table) and the slot gather
                # below would clamp onto a LIVE block (KV corruption)
                need = (active[None, :, None]
                        & ((ctx0 + i) % bs == 0)
                        & ((ctx0 + i) // bs < B))
                ids, free_top = stack_pop(free_stack, free_top, need,
                                          head_axis=2)
                blk_idx = jnp.where(need, (ctx0 + i) // bs, B)
                block_tables = block_tables.at[li, si, hi, blk_idx].set(
                    ids, mode="drop")

            ctx_full = jnp.minimum(
                ctx0 + Q * active[None, :, None].astype(jnp.int32), B * bs)

            # slot mappings for the Q new logical positions; positions
            # past capacity get a POSITIVE out-of-range sentinel so the
            # cache write drops them (negative wraps)
            qi = jnp.arange(Q, dtype=jnp.int32)
            logical = ctx0[..., None] + qi            # [L, S, H, Q]
            blk = jnp.take_along_axis(
                block_tables, jnp.minimum(logical // bs, B - 1), axis=-1)
            sm = (blk * bs + logical % bs)            # [L, S, H, Q]
            sm = jnp.where(logical < B * bs, sm,
                           state.k_cache.shape[0] * bs)
            sm = jnp.transpose(sm, (0, 1, 3, 2))      # [L, S, Q, H]

            hidden, cache = llama.decode_multi(
                params, mcfg, tokens, positions0, block_tables, ctx_full,
                sm, _cache_of(state), active, spec)
            logits = llama.compute_logits(
                params, mcfg, hidden.reshape(S * Q, -1)).reshape(S, Q, -1)
            match_override = None
            if typical is not None:
                # typical acceptance (reference
                # typical_acceptance_sampler.py _evaluate_accepted_tokens,
                # Medusa 3.3.1): accept proposal t_i iff
                # p_target(t_i) > min(eps, alpha * exp(-H(p_target))),
                # p_target = softmax of processed logits at the row's
                # temperature; temperature==0 rows degenerate to one-hot
                # p so the rule reduces to greedy equality. On rejection
                # we emit the target ARGMAX at the reject position (the
                # reference substitutes argmax only at position 0 and
                # emits nothing for later rejects - our always-emit
                # variant is a strict superset of its acceptances).
                # ACCEPTED positions must emit the PROPOSAL token, not
                # the argmax: typical acceptance admits non-argmax
                # proposals, and the cache keeps the proposal KVs
                # (reference spec_decode_base_sampler._create_output
                # emits draft_token_ids at accepted slots).
                thr_eps, alpha = typical
                flat = logits.reshape(S * Q, -1)
                st_exp = st._replace(
                    **{f: (jnp.repeat(getattr(st, f), Q, axis=0))
                       for f in st._fields})
                flat = sampler_mod.apply_logit_bias(flat, st_exp)
                temp = jnp.maximum(st_exp.temperature, 1e-6)[:, None]
                p = jax.nn.softmax(flat.astype(jnp.float32) / temp,
                                   axis=-1).reshape(S, Q, -1)
                # recovery/bonus = target argmax over the PROCESSED
                # (biased) logits, consistent with how temp==0 rows
                # degenerate to greedy
                emit = jnp.argmax(flat, axis=-1).astype(
                    jnp.int32).reshape(S, Q)
                if Q > 1:
                    match_override = sampler_mod.typical_accept_mask(
                        p[:, :-1], tokens[:, 1:], thr_eps, alpha)
                    emit = emit.at[:, :-1].set(jnp.where(
                        match_override, tokens[:, 1:], emit[:, :-1]))
            elif sampled:
                # x_i ~ q_i with the decode path's (seed, position) noise
                # keying; greedy rows (temperature==0) reduce to argmax
                # inside sample(). Flattened [S*Q] with per-sequence
                # params repeated per slot.
                flat = logits.reshape(S * Q, -1)
                st_exp = st._replace(
                    **{f: (jnp.repeat(getattr(st, f), Q, axis=0))
                       for f in st._fields})
                flat = sampler_mod.apply_logit_bias(flat, st_exp)
                qi_ = jnp.arange(Q, dtype=jnp.int32)
                pos_flat = (positions0[:, None] + qi_[None, :]).reshape(-1)
                emit = sampler_mod.sample(
                    flat, st_exp, rng, positions=pos_flat,
                    use_seeds=True, pre_processed=True).reshape(S, Q)
            else:
                emit = jnp.argmax(logits, axis=-1).astype(
                    jnp.int32)  # [S, Q]

            # acceptance: proposal i+1 accepted iff it equals emit[i]
            # (greedy match, or the rejection-sampling coupling above),
            # or passes the typical-acceptance threshold
            if Q > 1:
                match = (match_override if match_override is not None
                         else emit[:, :-1] == tokens[:, 1:])  # [S, Q-1]
                acc = jnp.sum(jnp.cumprod(
                    match.astype(jnp.int32), axis=-1), axis=-1)  # [S]
            else:
                acc = jnp.zeros((S,), jnp.int32)
            n_out = jnp.where(active, acc + 1, 0)  # accepted outputs per seq

            # roll back: keep ctx0 + (acc + 1) KVs (inputs: current +
            # accepted proposals), free blocks allocated beyond
            keep = 1 + acc
            new_ctx = jnp.minimum(
                ctx0 + keep[None, :, None] * active[None, :, None].astype(
                    jnp.int32), B * bs)
            nb_keep = (new_ctx + bs - 1) // bs
            nb_full = (ctx_full + bs - 1) // bs
            blk_i = jnp.arange(B, dtype=jnp.int32)[None, None, None, :]
            freed = ((blk_i >= nb_keep[..., None])
                     & (blk_i < nb_full[..., None]))
            free_stack, free_top = stack_push(free_stack, free_top,
                                              block_tables, freed,
                                              head_axis=2)

            new_state = CacheState(
                k_cache=cache.k, v_cache=cache.v, kv_metrics=cache.metrics,
                kv_positions=cache.positions, block_tables=block_tables,
                context_lens=new_ctx, free_stack=free_stack,
                free_top=free_top,
                k_scale=cache.k_scale, v_scale=cache.v_scale)

            nb_alloc = (new_ctx + bs - 1) // bs
            seq_blocks = jnp.sum(nb_alloc, axis=(0, 2)).astype(jnp.int32)
            seq_kv = jnp.sum(new_ctx, axis=(0, 2)).astype(jnp.int32)
            # packed: emitted tokens [S*Q] | n_out | blocks | kv
            #         | [next-round proposals S*(Q-1), proposer only]
            #         | free_top
            parts = [emit.reshape(-1), n_out, seq_blocks, seq_kv]
            if self.proposer is not None and Q > 1:
                from kvcompress_tpu.models import proposers as prop
                pspec, _ = self.proposer
                hid = hidden.reshape(S, Q, -1)
                # hidden/emit at the last ACCEPTED input token: its
                # output token (the bonus) is next round's first input,
                # so head k's proposal lands at next-round offset k+1
                h_acc = jnp.take_along_axis(
                    hid, acc[:, None, None], axis=1)[:, 0]
                bonus = jnp.take_along_axis(emit, acc[:, None],
                                            axis=1)[:, 0]
                props = prop.propose(pspec, prop_params, h_acc, bonus,
                                     Q - 1)
                parts.append(props.reshape(-1))
            parts.append(effective_free_blocks(free_top)[None])
            packed = jnp.concatenate(parts)
            if eagle_out:
                return new_state, packed, hidden.reshape(
                    S, Q, -1).astype(jnp.float32)
            return new_state, packed

        return jax.jit(verify_fn, donate_argnums=(0,))

    def verify(self, state, tokens_np, positions_np, active_np, Q: int,
               st=None, rng=None):
        """Returns (state, packed, hid): hid is the [S, Q, D] device
        export for EAGLE drafts, else None. st (SamplingTensors) + rng
        select the rejection-sampling verify variant; None = greedy."""
        # dict cache keyed by ALL static flags (CLAUDE.md convention: a
        # single-slot cache retraces mid-serving if Q ever alternates)
        sampled = st is not None
        sc = self.cfg.speculative
        typical = None
        if sampled and sc.acceptance_method == "typical_acceptance_sampler":
            typical = (sc.typical_acceptance_sampler_posterior_threshold,
                       sc.typical_acceptance_sampler_posterior_alpha)
        elif sampled and sc.acceptance_method != "rejection_sampler":
            raise ValueError(
                f"unknown speculative acceptance_method "
                f"{sc.acceptance_method!r} (rejection_sampler | "
                "typical_acceptance_sampler)")
        key = ("verify", Q, sampled, typical)
        if key not in self._decode_fns:
            self._decode_fns[key] = self._build_verify(
                Q, sampled=sampled, typical=typical)
        out = self._decode_fns[key](
            state, self.params, jnp.asarray(tokens_np),
            jnp.asarray(positions_np), jnp.asarray(active_np),
            self.proposer[1] if self.proposer is not None else None,
            st, rng)
        return out if len(out) == 3 else (*out, None)

    # ------------------------------------------------------------ compress
    def _build_compress(self, B: int, nb: int):
        kc = self.cfg.kvcompress
        bias = None
        position_bins = None
        if kc.kv_head_bias_file:
            from kvcompress_tpu.kvcompress.head_bias import load_kv_head_bias
            hb = load_kv_head_bias(kc.kv_head_bias_file)
            bias, position_bins = hb.bias, hb.position_bins

        fn = functools.partial(
            run_compression, nb=nb,
            moves_cap=kc.max_cache_moves_per_compression,
            layer_groups=self.pp,
            num_sinks=kc.num_attention_sinks, use_average=kc.use_average,
            bias=bias, position_bins=position_bins,
            bias_weight=kc.kv_head_bias_weight,
            even_layer_evict=kc.even_layer_evict,
            random_eviction=kc.random_eviction)

        def compress_fn(state, slots, last_pos, protected, evict_blocks):
            state, blk_count, new_ctx_w = fn(
                state, slots, last_pos, protected, evict_blocks)
            seq_kv = jnp.sum(new_ctx_w, axis=(1, 2)).astype(jnp.int32)
            bs = self.cfg.cache.block_size
            seq_blocks = jnp.sum((new_ctx_w + bs - 1) // bs,
                                 axis=(1, 2)).astype(jnp.int32)
            # packed [3B+1]: evicted_blocks | seq_blocks | seq_kv | free_top
            packed = jnp.concatenate([
                blk_count.sum(axis=(1, 2)).astype(jnp.int32), seq_blocks,
                seq_kv, effective_free_blocks(state.free_top)[None]])
            return state, packed

        return jax.jit(compress_fn, donate_argnums=(0,))

    def compress(self, state, slots, last_pos, protected, evict_blocks,
                 nb: int):
        B = len(slots)
        # bucket B and nb to powers of two to bound compilations. Floor at
        # 4: prefill-ramp rounds batch 1-3 fresh sequences depending on
        # pipeline timing, so pow2 alone made the compiled variant set
        # NONDETERMINISTIC run to run (a warm pass would compile (1, nb)
        # and the measured pass then stall ~80s compiling (2, nb)). The
        # floor keeps the documented workspace-inflation bound: 4 * 416-nb
        # rows < the (64, 128) workspace the profile sizes temp against.
        S_ = self.cfg.scheduler.max_num_seqs
        Bb = min(S_, max(4, 1 << (B - 1).bit_length()))
        nbb = min(
            self.cfg.max_blocks_per_head,
            1 << (max(nb, 1) - 1).bit_length())
        key = (Bb, nbb)
        if key not in self._compress_fns:
            self._compress_fns[key] = self._build_compress(Bb, nbb)

        def pad(arr, fill):
            out = np.full((Bb,), fill, np.int32)
            out[:B] = arr
            return jnp.asarray(out)

        return self._compress_fns[key](
            state, pad(slots, -1), pad(last_pos, 0), pad(protected, 0),
            pad(evict_blocks, 0))

    # ---------------------------------------------------------------- free
    def _build_free(self):
        bs = self.cfg.cache.block_size

        def free_fn(state: CacheState, free_mask):
            # free all allocated blocks of the masked batch slots
            # (reference block_manager.py:224-259 _remove_sequence_batch)
            L, S, H, B = state.block_tables.shape
            ctx = state.context_lens
            nb_alloc = (ctx + bs - 1) // bs
            blk = jnp.arange(B, dtype=jnp.int32)[None, None, None, :]
            alloc = (blk < nb_alloc[..., None]) & free_mask[None, :, None,
                                                            None]
            stack, top = stack_push(state.free_stack, state.free_top,
                                    state.block_tables, alloc, head_axis=2,
                                    layer_axis=0, layer_groups=self.pp)
            context_lens = jnp.where(free_mask[None, :, None],
                                     0, ctx)
            return CacheState(
                k_cache=state.k_cache, v_cache=state.v_cache,
                kv_metrics=state.kv_metrics, kv_positions=state.kv_positions,
                block_tables=state.block_tables, context_lens=context_lens,
                free_stack=stack, free_top=top,
                k_scale=state.k_scale,
                v_scale=state.v_scale), effective_free_blocks(top)

        return jax.jit(free_fn, donate_argnums=(0,))

    def free_slots(self, state, slot_ids):
        if self._free_fn is None:
            self._free_fn = self._build_free()
        S = state.block_tables.shape[1]
        mask = np.zeros((S,), bool)
        mask[list(slot_ids)] = True
        return self._free_fn(state, jnp.asarray(mask))

    # ------------------------------------------------------ prefix caching
    # Copy-on-hit prefix caching (reference vllm/core/block_manager_v2.py
    # + block/prefix_caching_block.py, re-designed for the donated-state
    # runtime): a finished uncompressed sequence's full prompt blocks are
    # HARVESTED into a host-side pool (ownership transfer, no refcounts);
    # a later prompt sharing the prefix ADOPTS a fresh copy of those
    # blocks (block-row gather/scatter, HBM-bound) and prefills only the
    # suffix via the chunked-prefill continuation. Copying instead of
    # sharing keeps every invariant the reference's refcount/COW machinery
    # exists to protect: per-head block exclusivity, in-place compression,
    # and single-owner frees.

    def _build_prefix_harvest(self, NB: int):
        bs = self.cfg.cache.block_size

        def harvest_fn(state: CacheState, slot, keep):
            L, S, H, B = state.block_tables.shape
            row = state.block_tables[:, slot]           # [L, H, B]
            ctx = state.context_lens[:, slot]           # [L, H]
            nb_alloc = (ctx + bs - 1) // bs
            blk = jnp.arange(B, dtype=jnp.int32)[None, None, :]
            # free everything PAST the harvested prefix (partial prompt
            # block + generated-token blocks)
            tail = (blk >= keep) & (blk < nb_alloc[..., None])
            stack, top = stack_push(state.free_stack, state.free_top,
                                    row, tail, head_axis=1, layer_axis=0,
                                    layer_groups=self.pp)
            src = row[:, :, :NB]                        # [L, H, NB]
            ctx_new = state.context_lens.at[:, slot].set(0)
            new_state = CacheState(
                k_cache=state.k_cache, v_cache=state.v_cache,
                kv_metrics=state.kv_metrics,
                kv_positions=state.kv_positions,
                block_tables=state.block_tables, context_lens=ctx_new,
                free_stack=stack, free_top=top,
                k_scale=state.k_scale, v_scale=state.v_scale)
            return new_state, src, effective_free_blocks(top)

        return jax.jit(harvest_fn, donate_argnums=(0,))

    def prefix_harvest(self, state, slot: int, keep_blocks: int):
        """Transfer the first `keep_blocks` blocks of every (layer, head)
        of `slot` to the caller (returned as [L, H, NB]) and free the
        rest; the slot's context zeroes. NB is pow2-bucketed to bound
        compilations."""
        NB = 1 << (max(keep_blocks, 1) - 1).bit_length()
        NB = min(NB, self.cfg.max_blocks_per_head)
        key = ("harvest", NB)
        if key not in self._prefix_fns:
            self._prefix_fns[key] = self._build_prefix_harvest(NB)
        return self._prefix_fns[key](
            state, jnp.asarray(slot, jnp.int32),
            jnp.asarray(keep_blocks, jnp.int32))

    def _build_prefix_adopt(self, NB: int):
        bs = self.cfg.cache.block_size

        def adopt_fn(state: CacheState, src, slot, n_blocks):
            L, S, H, B = state.block_tables.shape
            nb_total = state.k_cache.shape[0]
            blk = jnp.arange(NB, dtype=jnp.int32)[None, None, :]
            need = jnp.broadcast_to(blk < n_blocks,
                                    (L, H, NB))         # [L, H, NB]
            ids, top = stack_pop(state.free_stack, state.free_top, need,
                                 head_axis=1, layer_axis=0,
                                 layer_groups=self.pp)
            bt = state.block_tables.at[:, slot, :, :NB].set(
                jnp.where(need, ids, 0))
            ctx = state.context_lens.at[:, slot].set(n_blocks * bs)
            # block-ROW copies (CLAUDE.md: row gathers, never flat
            # element gathers at this scale)
            src_f = jnp.clip(src.reshape(-1), 0, nb_total - 1)
            dst_f = jnp.where(need.reshape(-1), ids.reshape(-1),
                              nb_total)  # positive OOR sentinel: dropped
            def cp(arr):
                return arr.at[dst_f].set(arr[src_f], mode="drop")
            new_state = CacheState(
                k_cache=cp(state.k_cache), v_cache=cp(state.v_cache),
                kv_metrics=cp(state.kv_metrics),
                kv_positions=cp(state.kv_positions),
                block_tables=bt, context_lens=ctx,
                free_stack=state.free_stack, free_top=top,
                k_scale=(cp(state.k_scale) if state.k_scale is not None
                         else None),
                v_scale=(cp(state.v_scale) if state.v_scale is not None
                         else None))
            return new_state, effective_free_blocks(top)

        return jax.jit(adopt_fn, donate_argnums=(0,))

    def prefix_adopt(self, state, src_blocks, slot: int, n_blocks: int):
        """Allocate `n_blocks` fresh blocks per (layer, head) for `slot`
        and fill them with copies of the pool entry's blocks; sets the
        slot's context to the copied prefix so a chunked-prefill
        continuation can take over at nb_off = n_blocks."""
        NB = src_blocks.shape[-1]
        key = ("adopt", NB)
        if key not in self._prefix_fns:
            self._prefix_fns[key] = self._build_prefix_adopt(NB)
        return self._prefix_fns[key](
            state, src_blocks, jnp.asarray(slot, jnp.int32),
            jnp.asarray(n_blocks, jnp.int32))

    def _build_prefix_release(self, NB: int):
        def release_fn(state: CacheState, blocks, n_blocks):
            blk = jnp.arange(NB, dtype=jnp.int32)[None, None, :]
            mask = jnp.broadcast_to(blk < n_blocks, blocks.shape)
            stack, top = stack_push(state.free_stack, state.free_top,
                                    blocks, mask, head_axis=1,
                                    layer_axis=0, layer_groups=self.pp)
            new_state = CacheState(
                k_cache=state.k_cache, v_cache=state.v_cache,
                kv_metrics=state.kv_metrics,
                kv_positions=state.kv_positions,
                block_tables=state.block_tables,
                context_lens=state.context_lens,
                free_stack=stack, free_top=top,
                k_scale=state.k_scale, v_scale=state.v_scale)
            return new_state, effective_free_blocks(top)

        return jax.jit(release_fn, donate_argnums=(0,))

    def prefix_release(self, state, blocks, n_blocks: int):
        """Return a pool entry's blocks ([L, H, NB]) to the free stacks
        (LRU eviction of the prefix pool under memory pressure)."""
        NB = blocks.shape[-1]
        key = ("release", NB)
        if key not in self._prefix_fns:
            self._prefix_fns[key] = self._build_prefix_release(NB)
        return self._prefix_fns[key](
            state, blocks, jnp.asarray(n_blocks, jnp.int32))
