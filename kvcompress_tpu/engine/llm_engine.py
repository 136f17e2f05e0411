"""LLMEngine: the synchronous continuous-batching engine core.

The counterpart of reference vllm/engine/llm_engine.py:209-1679 with the KVC
hooks fused into device programs: step() = [compress?] -> [prefill | decode]
-> output processing. Compare the reference hot loop (llm_engine.py:1556-1658:
schedule_kvcompress + execute_cache_moves -> schedule -> clear_temp_metrics ->
execute_model -> aggregate_decode): here compression is one device program and
metric aggregation is fused into the attention ops, so a decode iteration is
a single XLA dispatch.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional, Sequence as Seq, Set

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: engine programs are fixed-shape and
# bucketed, so across restarts every program is a cache hit. The directory
# is backend-aware (utils/hostcache.py): TPU results are shared across
# hosts, while XLA:CPU AOT results embed the compile machine's CPU
# features (loading them elsewhere spams cpu_aot_loader errors and risks
# SIGILL) so CPU runs get a host-fingerprinted directory. Configured in
# LLMEngine.__init__ once the backend is known.
from kvcompress_tpu.utils import hostcache

from kvcompress_tpu.config import EngineConfig, cdiv
from kvcompress_tpu.core.scheduler import Scheduler
from kvcompress_tpu.core.state import init_cache_state
from kvcompress_tpu.engine.detokenizer import (IncrementalDetokenizer,
                                                check_stop_strings)
from kvcompress_tpu.engine.programs import EnginePrograms
from kvcompress_tpu.engine.sampler import SamplingTensors
from kvcompress_tpu.sampling_params import SamplingParams
from kvcompress_tpu.sequence import (CompletionOutput, RequestOutput,
                                     Sequence, SequenceStatus)
from kvcompress_tpu.utils.metrics import EngineStats
from kvcompress_tpu.utils.profiler import BENCHMARKER
from kvcompress_tpu.utils.tracing import TRACER

logger = logging.getLogger(__name__)


class LLMEngine:
    def __init__(
        self,
        cfg: EngineConfig,
        params,
        *,
        num_blocks: Optional[int] = None,
        eos_token_ids: Optional[Set[int]] = None,
        attn_impl: str = "auto",
        tokenizer=None,
        mesh=None,
        draft=None,  # (ModelConfig, params) for draft-model spec decode
        proposer=None,  # (ProposerSpec, params) for medusa/mlp_speculator
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        # pooled detokenization (KVC_TOKENIZER_POOL_SIZE>0 moves per-seq
        # detok off the serving thread; reference tokenizer_group/)
        self.tokenizer_group = None
        if tokenizer is not None:
            from kvcompress_tpu.transformers_utils.tokenizer_group import \
                TokenizerGroup
            self.tokenizer_group = TokenizerGroup(tokenizer)
        self.eos_token_ids = set(eos_token_ids or ())
        if tokenizer is not None and tokenizer.eos_token_id is not None:
            self.eos_token_ids.add(tokenizer.eos_token_id)

        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        hostcache.configure(jax.devices()[0].platform)
        # multi-step decode: tokens per host round-trip (reference
        # num_scheduler_steps); dominated by dispatch/fetch latency on TPU
        # (remote-tunnel round-trips measure ~25 ms, so bursts are long)
        self.multi_step = cfg.scheduler.num_scheduler_steps or (
            16 if on_tpu else 1)
        if attn_impl == "auto":
            # the pallas decode kernel DMAs [block_size, head_size] rows and
            # needs a full 128-lane last dim; alibi and sliding-window
            # models use the XLA path (windowed masking is implemented
            # there; the reference instead rejects sliding-window models,
            # vllm/config.py:631-635)
            attn_impl = ("pallas" if on_tpu
                         and cfg.model.head_size % 128 == 0
                         and not cfg.model.alibi
                         and not cfg.model.sliding_window
                         else "xla")
        if cfg.model.sliding_window:
            if attn_impl in ("pallas", "interpret"):
                raise ValueError(
                    "sliding-window attention runs on the XLA path only; "
                    f"attn_impl={attn_impl!r} is not supported "
                    "(pass attn_impl='xla' or 'auto')")
            if cfg.speculative.num_speculative_tokens > 0:
                raise ValueError(
                    "speculative decoding does not support sliding-window "
                    "models yet")
        if cfg.model.alibi and cfg.speculative.num_speculative_tokens > 0:
            # the verify program's multi-token attention has no alibi
            # bias; verifying against a different distribution than the
            # model's would be silently wrong, not slow
            raise ValueError(
                "speculative decoding does not support alibi models yet")
        self.attn_impl = attn_impl

        # Tensor parallelism: build the ("data", "model") mesh, shard the
        # weights (megatron specs) and the cache state (block pool + tables
        # on the kv-head axis) - the capability the reference lists as an
        # open question (vllm/kvcompress/README.md "How to support
        # multi-GPU?"; TP hard-blocked at vllm/config.py:702-703).
        pp = cfg.parallel.pipeline_parallel_size
        if pp > 1:
            # serving-level PP (parallel/pipeline.py GPipe trunks): the
            # model forward shard_maps over the pipe axis with the XLA
            # attention path; combinations that would silently change
            # semantics or need per-stage plumbing are rejected loudly
            if cfg.model.num_layers % pp:
                raise ValueError(
                    f"num_layers={cfg.model.num_layers} not divisible by "
                    f"pipeline_parallel_size={pp}")
            if cfg.speculative.num_speculative_tokens > 0:
                raise ValueError(
                    "speculative decoding with pipeline_parallel_size>1 "
                    "is not supported yet")
            if cfg.lora and cfg.lora.enable_lora:
                raise ValueError(
                    "LoRA with pipeline_parallel_size>1 is not supported "
                    "yet (per-stage bank plumbing)")
            if attn_impl == "pallas":
                raise ValueError(
                    "pipeline_parallel_size>1 runs the XLA attention path "
                    "(per-stage Pallas kernels land later); pass "
                    "attn_impl='xla' or 'auto'")
            attn_impl = "xla"
        if mesh is None and cfg.parallel.world_size > 1:
            from kvcompress_tpu.parallel.mesh import build_mesh
            mesh = build_mesh(cfg.parallel.tensor_parallel_size,
                              cfg.parallel.data_parallel_size,
                              pp_size=pp)
        self.mesh = mesh
        if mesh is not None:
            from kvcompress_tpu.parallel.mesh import MODEL_AXIS, shard_params
            tp = mesh.shape[MODEL_AXIS]
            if cfg.model.num_kv_heads % tp:
                raise ValueError(
                    f"num_kv_heads={cfg.model.num_kv_heads} not divisible "
                    f"by tensor_parallel_size={tp}")
            ep = cfg.parallel.enable_expert_parallel
            if ep:
                if not cfg.model.num_experts:
                    raise ValueError(
                        "enable_expert_parallel on a non-MoE model")
                if cfg.model.num_experts % tp:
                    raise ValueError(
                        f"num_experts={cfg.model.num_experts} not "
                        f"divisible by tensor_parallel_size={tp}")
            from kvcompress_tpu.models import decoder as _dec
            _dec.set_ep_mesh(mesh if ep else None)
            params = shard_params(params, mesh, ep=ep)
        else:
            from kvcompress_tpu.models import decoder as _dec
            _dec.set_ep_mesh(None)

        if num_blocks is None:
            t_prof = time.monotonic()
            num_blocks = cfg.cache.num_blocks or self._profile_num_blocks(
                params)
            logger.info("profiled cache sizing: %d blocks in %.1fs",
                        num_blocks, time.monotonic() - t_prof)
        self.num_blocks = num_blocks

        mc, sc, cc = cfg.model, cfg.scheduler, cfg.cache
        # one allocator partition per (pipe stage, TP shard) keeps every
        # head's blocks in that head's pool shard and every layer's blocks
        # in its stage's shard (see core/state.py)
        G = max(cfg.parallel.tensor_parallel_size, 1) * max(pp, 1)
        num_blocks -= num_blocks % G
        self.num_blocks = num_blocks
        cache_jdtype = {"bfloat16": jnp.bfloat16, "float16": jnp.bfloat16,
                        "int8": jnp.int8}.get(cc.cache_dtype, jnp.float32)
        self.state = init_cache_state(
            num_blocks=num_blocks, block_size=cc.block_size,
            head_size=mc.head_size, num_layers=mc.num_layers,
            max_num_seqs=sc.max_num_seqs, num_kv_heads=mc.num_kv_heads,
            max_blocks_per_head=cfg.max_blocks_per_head,
            cache_dtype=cache_jdtype,
            num_block_partitions=G,
        )
        if mesh is not None:
            from kvcompress_tpu.parallel.mesh import shard_state
            self.state = shard_state(self.state, mesh)
        self.prompt_adapter_bank = None
        if cfg.prompt_adapter and cfg.prompt_adapter.enable_prompt_adapter:
            from kvcompress_tpu.prompt_adapter import PromptAdapterBank
            self.prompt_adapter_bank = PromptAdapterBank.create(
                cfg.model, cfg.prompt_adapter.max_prompt_adapters,
                cfg.prompt_adapter.max_prompt_adapter_token,
                dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16"
                else jnp.float32)
        # artificial preemption fault injection (reference
        # VLLM_TEST_ENABLE_ARTIFICIAL_PREEMPT, core/scheduler.py:388-396)
        from kvcompress_tpu import envs
        self._check_invariants = envs.KVC_CHECK_INVARIANTS
        self._artificial_preempt = envs.KVC_TEST_ENABLE_ARTIFICIAL_PREEMPT
        self._artificial_preempt_rate = \
            envs.KVC_TEST_ARTIFICIAL_PREEMPT_RATE
        self.lora_bank = None
        if cfg.lora and cfg.lora.enable_lora:
            from kvcompress_tpu.lora.models import LoRABank
            self.lora_bank = LoRABank.create(
                cfg.model, cfg.lora.max_loras, cfg.lora.max_lora_rank,
                dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16"
                else jnp.float32)
            params = dict(params)
            params["layers"] = dict(params["layers"])
            params["layers"].update(self.lora_bank.layer_banks())
        if (cfg.speculative.num_speculative_tokens > 0
                and cfg.speculative.method in ("medusa", "mlp_speculator")
                and proposer is None):
            raise ValueError(
                f"speculative.method={cfg.speculative.method!r} needs "
                "proposer head weights (pass proposer=(spec, params) or a "
                "draft_model checkpoint dir on the LLM surface)")
        if (cfg.speculative.num_speculative_tokens > 0
                and cfg.speculative.method in ("draft", "eagle")
                and draft is None):
            raise ValueError(
                f"speculative.method={cfg.speculative.method!r} needs a "
                "draft model (pass draft=(cfg, params) or a draft_model "
                "checkpoint dir) - refusing to fall back to ngram "
                "proposals silently")
        self.programs = EnginePrograms(cfg, params, attn_impl=attn_impl,
                                       mesh=mesh, draft=draft,
                                       proposer=proposer)
        self.scheduler = Scheduler(cfg, num_blocks)
        self.stats = EngineStats()
        # prefix caching (copy-on-hit pool; core/prefix_cache.py)
        self.prefix_pool = None
        if cfg.cache.enable_prefix_caching:
            from kvcompress_tpu.core.prefix_cache import PrefixPool
            self.prefix_pool = PrefixPool(
                cfg.cache.block_size,
                cfg.model.num_layers * cfg.model.num_kv_heads,
                int(num_blocks * cfg.cache.prefix_pool_fraction))
        self._seqs: Dict[str, Sequence] = {}
        self._rng = jax.random.PRNGKey(cfg.seed)
        self._force_compress = False
        self._request_counter = 0
        self._carry: Optional[dict] = None
        # device-refreshed max allocated blocks per (layer, head): drives
        # the bucketed attention width of the decode program
        self._max_nb = 1
        # pipelined decode: burst N+1 is dispatched before burst N's
        # results are fetched, hiding the host round-trip (the remote
        # tunnel measures ~25 ms per dispatch+fetch)
        self.pipeline_decode = on_tpu
        self._draft_ring = None  # draft-model spec decode KV ring
        self._eagle_hid = None   # [S, Q, D] verify-exported hiddens
        # medusa/mlp_speculator proposals carried between rounds:
        # slot -> (seq_id, expected_len, np proposals [gamma])
        self._pending_props = {}
        self._pending = None  # (out, meta) of the in-flight burst
        self._pending_compress = None  # (packed, batch) of in-flight round
        self._pending_prefill = []     # in-flight prefills (depth <= 2)
        # free-block mirror versioning: snapshots from out-of-order
        # collects must never make the mirror read HIGHER than reality
        self._dispatch_seq = 0
        self._free_snap_id = 0
        # local-only usage record (reference usage_lib.py; opt-outs
        # KVC_NO_USAGE_STATS / KVC_DO_NOT_TRACK; nothing transmitted)
        from kvcompress_tpu.utils.usage import report_usage
        report_usage(
            cfg.model.architecture or "unknown",
            extra_kvs={"kvcompress_enabled": cfg.kvcompress.enabled,
                       "tensor_parallel_size":
                           cfg.parallel.tensor_parallel_size,
                       "num_blocks": int(num_blocks),
                       "attn_impl": attn_impl})

    def _note_dispatch(self) -> int:
        self._dispatch_seq += 1
        return self._dispatch_seq

    def _apply_free_snapshot(self, snap_id: int, value: int) -> None:
        """Update the free-block mirror from a device snapshot taken at
        dispatch order `snap_id`, subtracting worst-case allocations of any
        in-flight programs dispatched AFTER it (the mirror may be stale LOW,
        never HIGH)."""
        if snap_id < self._free_snap_id:
            return
        adj = 0
        for pp in self._pending_prefill:
            if pp["id"] > snap_id:
                adj += pp["blocks"]
        if self._pending is not None and self._pending[1]["id"] > snap_id:
            adj += self.scheduler.blocks_needed_next_decode(
                self._pending[1]["k"])
        self.scheduler.free_blocks = int(value) - adj
        self._free_snap_id = snap_id

    def _profile_num_blocks(self, params) -> int:
        """Profiled cache sizing (reference worker/worker.py:230-275
        determine_num_available_blocks + metrics.py:277-335
        profile_schedule_evictions): AOT-compile the LARGEST engine
        programs - prefill at the top bucket, decode at full table width,
        compression at the workspace cap - against a nominal tiny cache and
        read their peak temp memory from XLA's memory analysis, then give
        the remaining HBM to cache blocks. Falls back to the analytic sort
        bound when memory analysis is unavailable (CPU test backend)."""
        cc, mc, sc = self.cfg.cache, self.cfg.model, self.cfg.scheduler
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)() or {}
        # the axon tunnel device reports no memory_stats; v5e default 16 GB
        from kvcompress_tpu import envs
        total = stats.get("bytes_limit", 0) or envs.KVC_HBM_BYTES
        budget = int(total * cc.gpu_memory_utilization)
        params_bytes = sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree.leaves(params))
        if stats.get("bytes_in_use"):
            budget -= int(stats["bytes_in_use"])  # params already resident
        else:
            budget -= params_bytes
        try:
            temp = self._profile_temp_bytes(params)
        except Exception:  # pragma: no cover - backend without AOT analysis
            temp = self.cfg.kvcompress.max_kv_per_compression * 4 * 8
        L, S, H = mc.num_layers, sc.max_num_seqs, mc.num_kv_heads
        Bmax = self.cfg.max_blocks_per_head
        fixed = L * S * H * Bmax * 4 + L * S * H * 4  # tables + ctx lens
        per_block = cc.block_bytes(mc.head_size) + 4  # + free-stack entry
        nblocks = max(budget - temp - fixed, 0) // per_block
        return int(min(nblocks, 2 ** 24))

    def _profile_temp_bytes(self, params) -> int:
        """Peak temp bytes over the largest engine programs, from AOT
        compilation (no execution, no dummy data - XLA's memory analysis is
        exact where the reference must run a dummy forward and read the
        allocator high-water mark)."""
        from kvcompress_tpu.core.state import init_cache_state
        from kvcompress_tpu.engine.programs import EnginePrograms
        from kvcompress_tpu.engine.sampler import SamplingTensors

        cfg = self.cfg
        mc, sc, cc, kc = cfg.model, cfg.scheduler, cfg.cache, cfg.kvcompress
        G = (max(cfg.parallel.tensor_parallel_size, 1)
             * max(cfg.parallel.pipeline_parallel_size, 1))
        S = sc.max_num_seqs
        L, H = mc.num_layers, mc.num_kv_heads
        bs = cc.block_size
        nominal = init_cache_state(
            num_blocks=64 * G, block_size=bs, head_size=mc.head_size,
            num_layers=L, max_num_seqs=S, num_kv_heads=H,
            max_blocks_per_head=cfg.max_blocks_per_head,
            cache_dtype={"bfloat16": jnp.bfloat16, "float16": jnp.bfloat16,
                         "int8": jnp.int8}.get(cc.cache_dtype, jnp.float32),
            num_block_partitions=G)
        progs = EnginePrograms(cfg, params, attn_impl=self.attn_impl,
                               mesh=self.mesh)

        def temp_of(lowered, tag="") -> int:
            t0 = time.monotonic()
            ma = lowered.compile().memory_analysis()
            logger.info("profile compile %s: %.1fs", tag,
                        time.monotonic() - t0)
            if ma is None:
                raise RuntimeError("no memory analysis")
            return int(ma.temp_size_in_bytes)

        peaks = []
        # prefill at the largest bucket
        T = next((b for b in sc.prefill_buckets
                  if b >= sc.max_model_len), sc.max_model_len)
        st1 = SamplingTensors.from_params([None], pad_to=1,
                                          vocab_size=mc.vocab_size)
        rng = jax.random.PRNGKey(0)
        z = jnp.zeros((1,), jnp.float32)
        peaks.append(temp_of(progs._build_prefill(T).lower(
            nominal, params, jnp.zeros((T,), jnp.int32),
            jnp.asarray(T, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), st1, rng,
            jnp.asarray(0, jnp.int32), z, jnp.zeros((1,), bool),
            jnp.zeros((1, 1), jnp.float32), jnp.asarray(0, jnp.int32),
            jnp.zeros((1, 1), jnp.float32),
            jnp.full((1,), T, jnp.int32)), tag=f"prefill T={T}"))
        # decode burst at FULL table width (the transient regime before a
        # long prompt's first compression runs at wide buckets)
        k = self.multi_step
        nb_full = min(cfg.max_blocks_per_head,
                      1 << (cfg.max_blocks_per_head - 1).bit_length())
        st = SamplingTensors.from_params([None] * S, pad_to=S,
                                         vocab_size=mc.vocab_size)
        peaks.append(temp_of(progs._build_decode(
            multi_steps=k, greedy_only=True, nb_bucket=nb_full).lower(
            nominal, params, jnp.zeros((S,), jnp.int32),
            jnp.zeros((S,), jnp.int32), jnp.zeros((S,), bool),
            jnp.zeros((S,), jnp.int32), st, rng,
            jnp.asarray([-1], jnp.int32), jnp.zeros((S,), bool),
            jnp.zeros((S,), jnp.int32), jnp.zeros((S,), jnp.int32),
            None, None, jnp.zeros((S,), jnp.int32), z,
            jnp.zeros((1, 1), bool)), tag=f"decode nb={nb_full}"))
        if kc.enabled:
            # compression at the workspace cap: the scheduler bounds the
            # gathered workspace to max_kv_per_compression, and power-of-2
            # bucketing of (B, nb) inflates it at most 4x
            Bb = 1 << (S - 1).bit_length()
            nbb = max(1, cdiv(4 * kc.max_kv_per_compression,
                              Bb * L * H * bs))
            nbb = min(cfg.max_blocks_per_head,
                      1 << (nbb - 1).bit_length())
            zi = jnp.zeros((Bb,), jnp.int32)
            peaks.append(temp_of(progs._build_compress(Bb, nbb).lower(
                nominal, zi, zi, zi, zi), tag=f"compress B={Bb} nb={nbb}"))
        return max(peaks)

    # ------------------------------------------------------------- requests
    # ----------------------------------------------------------------- lora
    def add_lora(self, lora_request, weights=None, scaling=1.0) -> None:
        """Install an adapter into the bank (reference
        vllm/lora/worker_manager.py add_adapter). weights may be given
        directly ({target: (A [L,in,r], B [L,r,out])}) or loaded from the
        request's PEFT checkpoint path."""
        assert self.lora_bank is not None, "engine built without enable_lora"
        if weights is None:
            from kvcompress_tpu.lora.models import load_peft_adapter
            weights, scaling = load_peft_adapter(
                lora_request.lora_path, self.cfg.model)
        self.lora_bank.add(lora_request.lora_name, lora_request.lora_int_id,
                           weights, scaling)
        self._refresh_lora_params()

    def remove_lora(self, lora_name: str) -> None:
        assert self.lora_bank is not None
        self.lora_bank.remove(lora_name)
        self._refresh_lora_params()

    def _refresh_lora_params(self) -> None:
        params = dict(self.programs.params)
        params["layers"] = dict(params["layers"])
        params["layers"].update(self.lora_bank.layer_banks())
        self.programs.params = params
        self._carry = None

    def add_prompt_adapter(self, pa_request, embeddings=None) -> None:
        """Install a prompt adapter (reference
        vllm/prompt_adapter/worker_manager.py)."""
        assert self.prompt_adapter_bank is not None, \
            "engine built without enable_prompt_adapter"
        if embeddings is None:
            from kvcompress_tpu.prompt_adapter import (
                load_peft_prompt_adapter)
            embeddings = load_peft_prompt_adapter(
                pa_request.prompt_adapter_local_path)
        self.prompt_adapter_bank.add(
            pa_request.prompt_adapter_name, pa_request.prompt_adapter_id,
            np.asarray(embeddings))

    def add_request(
        self,
        request_id: Optional[str],
        prompt: Optional[str] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[int]] = None,
        lora_request=None,
        prompt_adapter_request=None,
        mm_embeds=None,      # [N, D] precomputed multimodal embeddings
        mm_positions=None,   # [N] prompt positions they replace
    ) -> str:
        if request_id is None:
            request_id = str(self._request_counter)
            self._request_counter += 1
        if prompt_token_ids is None:
            assert self.tokenizer is not None, "no tokenizer for str prompt"
            prompt_token_ids = self.tokenizer.encode(prompt)
        if len(prompt_token_ids) > self.cfg.scheduler.max_model_len:
            # reject loudly at submission (reference llm_engine.py
            # _validate_model_inputs) - the scheduler would otherwise have
            # to drop it without ever producing an output
            raise ValueError(
                f"prompt is {len(prompt_token_ids)} tokens but "
                f"max_model_len is {self.cfg.scheduler.max_model_len}")
        seq = Sequence(
            request_id=request_id,
            prompt_token_ids=list(prompt_token_ids),
            sampling_params=sampling_params or SamplingParams(),
            prompt=prompt,
        )
        if lora_request is not None:
            assert self.lora_bank is not None, \
                "engine built without enable_lora"
            if lora_request.lora_name not in self.lora_bank.name_to_slot:
                self.add_lora(lora_request)
            seq.lora_int_id = lora_request.lora_int_id
        if prompt_adapter_request is not None:
            assert self.prompt_adapter_bank is not None, \
                "engine built without enable_prompt_adapter"
            bank = self.prompt_adapter_bank
            if (prompt_adapter_request.prompt_adapter_name
                    not in bank.name_to_slot):
                self.add_prompt_adapter(prompt_adapter_request)
            slot = bank.name_to_slot[
                prompt_adapter_request.prompt_adapter_name]
            n_virtual = int(np.asarray(bank.n_virtual)[slot])
            # virtual tokens occupy the first positions: prepend
            # placeholders so cache/length accounting covers them
            seq.prompt_token_ids = [0] * n_virtual + seq.prompt_token_ids
            seq.prompt_adapter_slot = slot
            seq.prompt_adapter_virtual = n_virtual
            if len(seq.prompt_token_ids) > self.cfg.scheduler.max_model_len:
                # re-validate AFTER the virtual prefix: the scheduler
                # would otherwise silently drop the over-length sequence
                # (FINISHED_ABORTED with no output -> async callers hang)
                raise ValueError(
                    f"prompt ({len(prompt_token_ids)} tokens) plus "
                    f"{n_virtual} prompt-adapter virtual tokens exceeds "
                    f"max_model_len {self.cfg.scheduler.max_model_len}")
        if mm_embeds is not None:
            # multimodal: the prompt already contains N placeholder ids at
            # mm_positions; the prefill program scatters these embeddings
            # over them (reference llava.py merge_multimodal_embeddings)
            if prompt_adapter_request is not None:
                raise ValueError(
                    "multimodal embeddings cannot combine with a prompt "
                    "adapter (the soft-prompt prefix shifts the image "
                    "positions and the prefill program applies only one "
                    "embedding override)")
            assert len(mm_positions) == len(mm_embeds)
            seq.mm_embeds = jnp.asarray(mm_embeds)
            seq.mm_positions = np.asarray(mm_positions, np.int32)
        if seq.sampling_params.is_guided:
            assert self.tokenizer is not None, \
                "guided decoding needs a tokenizer"
            from kvcompress_tpu.guided import GuidedDecodingState
            seq.guided = GuidedDecodingState(
                seq.sampling_params, self.tokenizer,
                self.cfg.model.vocab_size, self.eos_token_ids)
        self._seqs[request_id] = seq
        self.scheduler.add_seq(seq)
        self.stats.counter("requests_added")
        TRACER.start_request(
            request_id,
            **{"gen_ai.request.max_tokens": sampling_params.max_tokens
               if sampling_params else None,
               "gen_ai.usage.prompt_tokens": len(prompt_token_ids)})
        return request_id

    def abort_request(self, request_id: str) -> None:
        self._flush_pending()
        self._collect_prefill()
        seq = self._seqs.get(request_id)
        if seq is None or seq.status.is_finished:
            return
        if seq.status == SequenceStatus.WAITING:
            self.scheduler.waiting.remove(seq)
            seq.status = SequenceStatus.FINISHED_ABORTED
        else:
            self._finish(seq, SequenceStatus.FINISHED_ABORTED)

    def has_unfinished_requests(self) -> bool:
        return bool(self.scheduler.waiting or self.scheduler.running
                    or self._pending is not None)

    # ----------------------------------------------------------------- step
    def step(self) -> List[RequestOutput]:
        t0 = time.monotonic()
        pending_outputs: List[RequestOutput] = []
        if self._pending is not None and self._should_flush():
            pending_outputs = self._flush_pending()
        with BENCHMARKER.range("compress"):
            self._maybe_compress()
        # under memory pressure, pooled prefixes are the first thing to
        # go - they are pure cache, a preempted sequence is lost work
        # (reference prefix_caching_block.py evictor-on-demand semantics)
        while (self.prefix_pool is not None and len(self.prefix_pool)
               and self.scheduler.must_preempt(self.multi_step)):
            self._release_one_prefix_entry()
        while (self.scheduler.must_preempt(self.multi_step)
               and len(self.scheduler.running) > 1):
            # drain in-flight work BEFORE choosing a victim: preempt_last
            # picks the newest arrival, which may be a prefill still in
            # flight - resetting it and then collecting that prefill would
            # append a stale token to the requeued sequence (the same
            # ordering abort_request preserves)
            pending_outputs += self._flush_pending()
            pending_outputs += self._collect_prefill()
            victim, slot = self.scheduler.preempt_last()
            if victim is None:
                break
            self.state, free_top = self.programs.free_slots(
                self.state, [slot])
            self._apply_free_snapshot(self._note_dispatch(), int(free_top))
            self.stats.counter("preemptions")

        if (self._artificial_preempt and self.scheduler.running
                and len(self.scheduler.running) > 1
                and np.random.random() < self._artificial_preempt_rate):
            self._flush_pending()
            victim, slot = self.scheduler.preempt_last()
            if victim is not None:
                self.state, free_top = self.programs.free_slots(
                    self.state, [slot])
                self._apply_free_snapshot(self._note_dispatch(),
                                          int(free_top))
                self._carry = None
                self.stats.counter("preemptions")
        outputs: List[RequestOutput] = []
        prefill_seq = self.scheduler.next_prefill()
        if (prefill_seq is None and self.scheduler.waiting
                and not self.scheduler.running):
            # admission failed with nothing running: the free-block mirror
            # may be stale LOW (a pipelined burst collected after frees
            # overwrites the mirror with its older snapshot) - refresh it
            # from the device and retry, otherwise the loop would spin
            from kvcompress_tpu.core.state import effective_free_blocks
            self._apply_free_snapshot(
                self._note_dispatch(),
                int(np.asarray(effective_free_blocks(self.state.free_top))))
            prefill_seq = self.scheduler.next_prefill()
        if (prefill_seq is None and self.scheduler.waiting
                and self.prefix_pool is not None):
            # admission still blocked: drain pooled prefixes before
            # letting a prompt starve
            while (len(self.prefix_pool) and not self.scheduler.
                   can_allocate(self.scheduler.waiting[0])):
                self._release_one_prefix_entry()
            prefill_seq = self.scheduler.next_prefill()
        if prefill_seq is not None:
            with BENCHMARKER.range("prefill"):
                outputs += self._do_prefill(prefill_seq)
        elif self.scheduler.running:
            if (self.cfg.speculative.num_speculative_tokens > 0
                    and all(self._spec_compatible(s)
                            for s in self.scheduler.running)):
                with BENCHMARKER.range("spec_decode"):
                    outputs += self._do_decode_spec()
            else:
                with BENCHMARKER.range("decode"):
                    outputs += self._do_decode()
        self._collect_compress()
        deferred = getattr(self, "_deferred_outputs", [])
        self._deferred_outputs = []
        outputs = deferred + pending_outputs + outputs
        self.stats.timer("step_seconds", time.monotonic() - t0)
        self.stats.gauge("num_requests_running",
                         len(self.scheduler.running))
        self.stats.gauge("num_requests_waiting",
                         len(self.scheduler.waiting))
        self.stats.gauge("gpu_cache_usage_perc",
                         1.0 - self.scheduler.free_blocks
                         / max(self.scheduler.total_blocks, 1))
        if self._check_invariants:
            from kvcompress_tpu.utils.invariants import \
                assert_block_invariants
            assert_block_invariants(self.state, self.prefix_pool)
        return outputs

    # ------------------------------------------------------------- prefill
    def _collect_prefill(self, drain: bool = True) -> List[RequestOutput]:
        """Collect the oldest in-flight prefill (drain=True: all of
        them). Prefills are pipelined two deep: dispatch N+1 goes out
        before N's sampled token is fetched, hiding the ~2 round-trips of
        host turnaround between consecutive prompts
        (reference batches prefills instead, core/scheduler.py:1060-1180;
        on TPU the device serializes programs anyway, so depth-2 dispatch
        pipelining recovers the same device utilization)."""
        if not self._pending_prefill:
            return []
        outs = self._collect_one_prefill()
        while drain and self._pending_prefill:
            outs += self._collect_one_prefill()
        return outs

    def _collect_one_prefill(self) -> List[RequestOutput]:
        pp = self._pending_prefill.pop(0)
        seq = pp["seq"]
        packed = np.asarray(pp["packed"])  # [token, free_top]
        self._apply_free_snapshot(pp["id"], int(packed[1]))
        if seq.status.is_finished:  # aborted while in flight
            return []
        seq.output_token_ids.append(int(packed[0]))
        self._max_nb = max(self._max_nb,
                           cdiv(seq.get_len() + 1,
                                self.cfg.cache.block_size))
        if seq.guided is not None:
            seq.guided.advance(int(packed[0]))
        if pp["lp_n"]:
            chosen, top_v, top_i = (np.asarray(x) for x in pp["lp"])
            seq.logprobs = seq.logprobs or []
            seq.logprobs.append(self._logprob_entry(
                int(packed[0]), float(chosen[0]), top_v[0], top_i[0]))
        seq.first_token_time = time.monotonic()
        return self._process_finished([seq])

    def _plan_prefill_chunks(self, P: int):
        """Chunk plan for prompts longer than the largest prefill bucket:
        [(offset, length)] with every offset block- and 128-aligned (the
        pallas continuation kernel tiles Tk by >= 128), or None to run the
        single-program path (prompt fits, or a gated feature combination
        falls back to the pre-chunking behavior of compiling a bigger
        bucket). The final chunk is kept >= the prefill metric window so
        its metric pass covers the window without revisiting earlier
        chunks (models/decoder.py prefill_cont contract)."""
        sc, mc = self.cfg.scheduler, self.cfg.model
        B = max(sc.prefill_buckets)
        if P <= B or B % 128:
            return None
        from kvcompress_tpu.models.decoder import window_array
        if (mc.alibi or window_array(mc) is not None or mc.kv_lora_rank
                or mc.prefix_lm
                or self.mesh is not None or self.programs.pp > 1):
            return None  # continuation not wired for these; old path works
        window = self.cfg.kvcompress.prefill_metric_collection_window_size
        offs = list(range(0, P, B))
        lens = [min(B, P - o) for o in offs]
        if lens[-1] < window:
            shift = -(-max(window - lens[-1], 1) // 128) * 128
            if lens[-2] > shift:
                offs[-1] -= shift
                lens[-1] += shift
                lens[-2] -= shift
            else:  # tiny buckets: merge the last two chunks instead
                lens[-2] += lens[-1]
                offs.pop()
                lens.pop()
        return list(zip(offs, lens))

    def _do_prefill_chunked(self, seq: Sequence, chunks) -> None:
        """Dispatch one prompt as sequential chunk programs over the same
        cache slot: the donated CacheState serializes them on device, and
        only the FINAL chunk's packed result is ever fetched, so the extra
        chunks cost no host round-trips. Beyond-parity: the reference
        declares chunked prefill unsupported with KVC
        (/root/reference/vllm/config.py enable_chunked_prefill checks)."""
        sp = seq.sampling_params
        st = SamplingTensors.from_params(
            [sp], pad_to=1, vocab_size=self.cfg.model.vocab_size)
        lp_n = sp.logprobs or 0
        bs = self.cfg.cache.block_size
        tokens = np.asarray(seq.prompt_token_ids, np.int32)
        base_kw = {}
        if self.lora_bank is not None:
            base_kw = dict(lora_idx=seq.lora_int_id,
                           lora_scale=self.lora_bank.scale)
        mm_e = getattr(seq, "mm_embeds", None)
        mm_p = seq.mm_positions if mm_e is not None else None
        packed = lp = None
        for i, (off, ln) in enumerate(chunks):
            final = i == len(chunks) - 1
            self._rng, key = jax.random.split(self._rng)
            kw = dict(base_kw)
            if mm_e is not None:
                msk = (mm_p >= off) & (mm_p < off + ln)
                if msk.any():
                    kw["mm_embed"] = mm_e[np.asarray(msk)]
                    kw["mm_pos"] = mm_p[msk] - off
            if i == 0:
                if getattr(seq, "prompt_adapter_slot", 0):
                    bank = self.prompt_adapter_bank
                    kw["pa_embed"] = bank.embeddings[
                        seq.prompt_adapter_slot]
                    kw["pa_len"] = seq.prompt_adapter_virtual
                self.state, packed, lp = self.programs.prefill(
                    self.state, tokens[:ln], ln, seq.slot,
                    sp.metric_collection_buffer_size, st, key,
                    use_seeds=sp.seed is not None, logprobs_n=0, **kw)
            else:
                if final and seq.guided is not None:
                    kw["allowed_mask"] = jnp.asarray(seq.guided.mask())
                self.state, packed, lp = self.programs.prefill_cont(
                    self.state, tokens[off:off + ln], ln, off // bs,
                    seq.slot, sp.metric_collection_buffer_size, st, key,
                    is_final=final, use_seeds=sp.seed is not None,
                    logprobs_n=lp_n if final else 0, **kw)
        self._carry = None  # batch composition changed
        self._pending_prefill.append({
            "seq": seq, "packed": packed, "lp": lp, "lp_n": lp_n,
            "id": self._note_dispatch(),
            "blocks": self.scheduler.blocks_needed_for_prefill(seq),
        })

    # ------------------------------------------------------ prefix caching
    def _release_one_prefix_entry(self) -> None:
        entry = self.prefix_pool.pop_lru()
        if entry is None:
            return
        self.state, free_top = self.programs.prefix_release(
            self.state, entry.blocks, entry.n_blocks)
        self._apply_free_snapshot(self._note_dispatch(), int(free_top))
        self.stats.counter("prefix_cache_evictions")

    def _prefix_plain_seq(self, seq: Sequence) -> bool:
        """Prefix pool participation requires a plain text prompt: mm
        embeds / prompt adapters / LoRA change the KVs a token id maps
        to, so content hashes would lie (the reference folds extra keys
        into the block hash; out of scope here)."""
        return (getattr(seq, "mm_embeds", None) is None
                and not getattr(seq, "prompt_adapter_slot", 0)
                and seq.lora_int_id == 0)

    def _try_prefix_hit(self, seq: Sequence):
        """On a pool hit: adopt a copy of the cached prefix blocks into
        the sequence's slot, then prefill only the suffix through the
        chunked-prefill continuation. Returns the dispatched pending
        entry, or None (fall through to the normal prefill)."""
        if self.prefix_pool is None or not self._prefix_plain_seq(seq):
            return None
        mc = self.cfg.model
        from kvcompress_tpu.models.decoder import window_array
        if (mc.alibi or window_array(mc) is not None or mc.kv_lora_rank
                or mc.prefix_lm or self.mesh is not None
                or self.programs.pp > 1):
            return None  # continuation not wired for these (chunk plan)
        res = self.prefix_pool.lookup(seq.prompt_token_ids)
        if res is None:
            return None
        entry, n = res
        bs = self.cfg.cache.block_size
        if (self.programs.prefill_spec.impl != "xla"
                and (n * bs) % 128):
            return None  # pallas continuation tiles Tk by 128
        sp = seq.sampling_params
        compress_on = (self.cfg.kvcompress.enabled
                       and (sp.max_cache_tokens >= 0
                            or sp.target_compression_rate < 1.0))
        window = self.cfg.kvcompress.prefill_metric_collection_window_size
        P = seq.num_prompt_tokens
        if compress_on and P - n * bs < window:
            return None  # suffix must cover the metric window
        cached = n * bs
        self.state, free_top = self.programs.prefix_adopt(
            self.state, entry.blocks, seq.slot, n)
        self._apply_free_snapshot(self._note_dispatch(), int(free_top))

        # suffix chunk plan (offsets shifted by the adopted prefix)
        suffix = P - cached
        plan = self._plan_prefill_chunks(suffix) or [(0, suffix)]
        chunks = [(cached + off, ln) for off, ln in plan]

        st = SamplingTensors.from_params(
            [sp], pad_to=1, vocab_size=self.cfg.model.vocab_size)
        lp_n = sp.logprobs or 0
        tokens = np.asarray(seq.prompt_token_ids, np.int32)
        packed = lp = None
        for i, (off, ln) in enumerate(chunks):
            final = i == len(chunks) - 1
            self._rng, key = jax.random.split(self._rng)
            kw = {}
            if final and seq.guided is not None:
                kw["allowed_mask"] = jnp.asarray(seq.guided.mask())
            self.state, packed, lp = self.programs.prefill_cont(
                self.state, tokens[off:off + ln], ln, off // bs,
                seq.slot, sp.metric_collection_buffer_size, st, key,
                is_final=final, use_seeds=sp.seed is not None,
                logprobs_n=lp_n if final else 0, **kw)
        self._carry = None  # batch composition changed
        self.stats.counter("prefix_cache_hit_tokens", cached)
        self.stats.counter("prefix_cache_hits")
        return {
            "seq": seq, "packed": packed, "lp": lp, "lp_n": lp_n,
            "id": self._note_dispatch(),
            "blocks": self.scheduler.blocks_needed_for_prefill(seq),
        }

    def _prefix_contribute(self, seq: Sequence) -> bool:
        """At normal finish of a never-compressed sequence: transfer its
        full prompt blocks to the pool instead of freeing them. Returns
        True when the slot was harvested (caller must not free it)."""
        if (self.prefix_pool is None or seq.compressed
                or not self._prefix_plain_seq(seq)):
            return False
        sp = seq.sampling_params
        if sp.max_cache_tokens >= 0 or sp.target_compression_rate < 1.0:
            return False
        n = self.prefix_pool.wants(seq.prompt_token_ids)
        if n < 1:
            return False
        self.state, blocks, free_top = self.programs.prefix_harvest(
            self.state, seq.slot, n)
        self._apply_free_snapshot(self._note_dispatch(), int(free_top))
        self.prefix_pool.contribute(seq.prompt_token_ids, blocks, n)
        self.stats.counter("prefix_cache_contributions")
        return True

    def _do_prefill(self, seq: Sequence) -> List[RequestOutput]:
        assert self._pending is None, \
            "prefill dispatched with a decode burst in flight"
        outputs = []
        while len(self._pending_prefill) >= 2:
            outputs += self._collect_one_prefill()
        hit = self._try_prefix_hit(seq)
        if hit is not None:
            self._pending_prefill.append(hit)
            self.stats.counter("prompt_tokens", seq.num_prompt_tokens)
            self.stats.counter("generation_tokens")
            if (self.cfg.kvcompress.enabled
                    and (seq.sampling_params.max_cache_tokens >= 0
                         or seq.sampling_params.target_compression_rate
                         < 1.0)):
                self._force_compress = True
            if not self.pipeline_decode:
                outputs += self._collect_prefill()
            return outputs
        chunks = self._plan_prefill_chunks(seq.num_prompt_tokens)
        if chunks is not None:
            self._do_prefill_chunked(seq, chunks)
            self.stats.counter("prompt_tokens", seq.num_prompt_tokens)
            self.stats.counter("generation_tokens")
            if (self.cfg.kvcompress.enabled
                    and (seq.sampling_params.max_cache_tokens >= 0
                         or seq.sampling_params.target_compression_rate
                         < 1.0)):
                self._force_compress = True
            if not self.pipeline_decode:
                outputs += self._collect_prefill()
            return outputs
        sp = seq.sampling_params
        st = SamplingTensors.from_params([sp], pad_to=1,
                                         vocab_size=self.cfg.model.vocab_size)
        self._rng, key = jax.random.split(self._rng)
        lp_n = sp.logprobs or 0
        lora_kw = {}
        if self.lora_bank is not None:
            lora_kw = dict(lora_idx=seq.lora_int_id,
                           lora_scale=self.lora_bank.scale)
        if seq.guided is not None:
            lora_kw["allowed_mask"] = jnp.asarray(seq.guided.mask())
        if getattr(seq, "prompt_adapter_slot", 0):
            bank = self.prompt_adapter_bank
            lora_kw["pa_embed"] = bank.embeddings[seq.prompt_adapter_slot]
            lora_kw["pa_len"] = seq.prompt_adapter_virtual
        if getattr(seq, "mm_embeds", None) is not None:
            lora_kw["mm_embed"] = seq.mm_embeds
            lora_kw["mm_pos"] = seq.mm_positions
        self.state, packed, lp = self.programs.prefill(
            self.state, np.asarray(seq.prompt_token_ids, np.int32),
            seq.num_prompt_tokens, seq.slot,
            sp.metric_collection_buffer_size, st, key,
            use_seeds=sp.seed is not None, logprobs_n=lp_n, **lora_kw)
        self._carry = None  # batch composition changed
        self._pending_prefill.append({
            "seq": seq, "packed": packed, "lp": lp, "lp_n": lp_n,
            "id": self._note_dispatch(),
            "blocks": self.scheduler.blocks_needed_for_prefill(seq),
        })
        self.stats.counter("prompt_tokens", seq.num_prompt_tokens)
        self.stats.counter("generation_tokens")
        # force compression after prefill for sequences with compression
        # enabled (reference core/scheduler.py:1163-1164, 1320-1331)
        if (self.cfg.kvcompress.enabled
                and (sp.max_cache_tokens >= 0
                     or sp.target_compression_rate < 1.0)):
            self._force_compress = True
        if not self.pipeline_decode:
            outputs += self._collect_prefill()
        return outputs

    # -------------------------------------------------------------- decode
    def _build_carry(self, running: List[Sequence]) -> dict:
        """Device-resident decode inputs, rebuilt only when the batch
        composition changes; between rebuilds the step feeds its own device
        outputs (tokens, positions, rng) back in - zero per-step host->device
        traffic on the steady decode path."""
        assert not self._pending_prefill, \
            "decode carry built with a prefill in flight"
        S = self.cfg.scheduler.max_num_seqs
        sig = tuple(sorted((s.slot, s.request_id) for s in running))
        if self._carry is not None and self._carry["sig"] == sig:
            return self._carry
        V = self.cfg.model.vocab_size
        tokens = np.zeros((S,), np.int32)
        positions = np.zeros((S,), np.int32)
        active = np.zeros((S,), bool)
        buffer_lens = np.zeros((S,), np.int32)
        ignore_eos = np.zeros((S,), bool)
        remaining = np.zeros((S,), np.int32)
        min_remaining = np.zeros((S,), np.int32)
        params_by_slot: List[Optional[SamplingParams]] = [None] * S
        max_len = self.cfg.scheduler.max_model_len
        for seq in running:
            s = seq.slot
            sp = seq.sampling_params
            active[s] = True
            tokens[s] = seq.last_token_id
            positions[s] = seq.get_len() - 1
            buffer_lens[s] = sp.metric_collection_buffer_size
            ignore_eos[s] = sp.ignore_eos
            budget = max_len - seq.get_len()
            if sp.max_tokens is not None:
                budget = min(budget, sp.max_tokens - seq.num_output_tokens)
            remaining[s] = max(budget, 0)
            min_remaining[s] = max(sp.min_tokens - seq.num_output_tokens, 0)
            params_by_slot[s] = sp
        greedy_only = all(s.sampling_params.greedy for s in running)
        use_seeds = any(s.sampling_params.seed is not None for s in running)
        use_penalties = SamplingTensors.any_penalties(
            [s.sampling_params for s in running])
        logprobs_n = max((s.sampling_params.logprobs or 0 for s in running),
                         default=0)
        token_counts = None
        prompt_mask = None
        if use_penalties:
            tc = np.zeros((S, V), np.int32)
            pm = np.zeros((S, V), bool)
            for seq in running:
                sl = seq.slot
                for t in seq.output_token_ids:
                    tc[sl, t] += 1
                pm[sl, np.asarray(seq.prompt_token_ids, np.int64) % V] = True
            token_counts = jnp.asarray(tc)
            prompt_mask = jnp.asarray(pm)
        lora_idx = None
        if self.lora_bank is not None:
            li = np.zeros((S,), np.int32)
            for seq in running:
                li[seq.slot] = seq.lora_int_id
            lora_idx = jnp.asarray(li)
        eos = sorted(self.eos_token_ids) or [-1]
        self._rng, key = jax.random.split(self._rng)
        self._carry = {
            "sig": sig,
            "tokens": jnp.asarray(tokens),
            "positions": jnp.asarray(positions),
            "active": jnp.asarray(active),
            "buffer_lens": jnp.asarray(buffer_lens),
            "st": SamplingTensors.from_params(params_by_slot, pad_to=S,
                                              vocab_size=V),
            "rng": key,
            "eos_ids": jnp.asarray(eos, jnp.int32),
            "ignore_eos": jnp.asarray(ignore_eos),
            "remaining": jnp.asarray(remaining),
            "min_remaining": jnp.asarray(min_remaining),
            "token_counts": token_counts,
            "prompt_mask": prompt_mask,
            "greedy_only": greedy_only,
            "use_seeds": use_seeds,
            "use_penalties": use_penalties,
            "logprobs_n": logprobs_n,
            "lora_idx": lora_idx,
            "use_metric_buffer": bool(buffer_lens.any()),
        }
        return self._carry

    def _should_flush(self) -> bool:
        """The in-flight burst must be collected before any OTHER program
        dispatch (compression / prefill / free), so scheduler mirrors are
        fresh when those decisions are made."""
        sc = self.scheduler
        if sc.waiting or not sc.running:
            return True
        kc = self.cfg.kvcompress
        if kc.enabled:
            n_iters = self.multi_step if sc.running else 1
            if (self._force_compress
                    or sc.iteration_count + n_iters
                    >= kc.compression_interval
                    or (kc.new_token_limit > -1
                        and sc.new_tokens > kc.new_token_limit)):
                return True
        # near-preemption: mirrors are stale by at most one burst of
        # allocations, so use a doubled bound
        if sc.free_blocks < 2 * sc.blocks_needed_next_decode(
                self.multi_step):
            return True
        return False

    def _flush_pending(self) -> List[RequestOutput]:
        if self._pending is None:
            return []
        out, meta = self._pending
        self._pending = None
        return self._collect_burst(out, meta)

    def _do_decode(self) -> List[RequestOutput]:
        S = self.cfg.scheduler.max_num_seqs
        k = self.multi_step
        running = list(self.scheduler.running)
        guided_seqs = [s for s in running if s.guided is not None]
        outputs: List[RequestOutput] = []
        outputs += self._collect_prefill()
        running = [s for s in running if not s.status.is_finished]
        if not running:
            return outputs
        sig = tuple(sorted((s.slot, s.request_id) for s in running))
        if self._pending is not None and self._pending[1]["sig"] != sig:
            outputs += self._flush_pending()
            running = [s for s in running
                       if not s.status.is_finished]
            if not running:
                return outputs
            sig = tuple(sorted((s.slot, s.request_id) for s in running))
        if guided_seqs:
            # masks change per emitted token, so guided batches run one
            # device step per host round-trip (and never pipeline)
            outputs += self._flush_pending()
            k = 1
        carry = self._build_carry(running)
        # bucketed table width: last device-reported max + burst growth,
        # rounded to the next power of two (bounded compile set). Under
        # pipelining _max_nb is stale by ONE uncollected burst (burst N+1
        # dispatches before burst N collects), so budget TWO bursts of
        # growth on top of the last device report.
        bs_ = self.cfg.cache.block_size
        need_nb = self._max_nb + 2 * cdiv(k, bs_) + 1
        nb_bucket = min(self.cfg.max_blocks_per_head,
                        1 << (max(need_nb, 1) - 1).bit_length())
        allowed_mask = None
        if guided_seqs:
            V = self.cfg.model.vocab_size
            am = np.ones((S, V), bool)
            for seq in guided_seqs:
                am[seq.slot] = seq.guided.mask()
            allowed_mask = jnp.asarray(am)
        self.state, out = self.programs.decode(
            self.state, carry["tokens"], carry["positions"],
            carry["active"], carry["buffer_lens"], carry["st"],
            carry["rng"], carry["eos_ids"], carry["ignore_eos"],
            carry["remaining"], multi_steps=k,
            greedy_only=carry["greedy_only"],
            use_metric_buffer=carry["use_metric_buffer"],
            min_remaining=carry["min_remaining"],
            token_counts=carry["token_counts"],
            prompt_mask=carry["prompt_mask"],
            use_penalties=carry["use_penalties"],
            use_seeds=carry["use_seeds"],
            logprobs_n=carry["logprobs_n"],
            lora_idx=carry["lora_idx"],
            lora_scale=(self.lora_bank.scale
                        if self.lora_bank is not None else None),
            allowed_mask=allowed_mask, nb_bucket=nb_bucket)
        # feed device outputs straight back into the carry (no host sync)
        carry["tokens"] = out.tokens
        carry["positions"] = out.positions_next
        carry["rng"] = out.rng_next
        carry["remaining"] = out.remaining_next
        carry["active"] = out.active_next
        carry["min_remaining"] = out.min_remaining_next
        carry["token_counts"] = out.token_counts_next
        meta = {"sig": sig, "running": running, "k": k,
                "logprobs_n": carry["logprobs_n"],
                "id": self._note_dispatch()}
        if self.pipeline_decode and not guided_seqs:
            prev = self._pending
            self._pending = (out, meta)
            if prev is not None:
                outputs += self._collect_burst(*prev)
            return outputs
        outputs += self._collect_burst(out, meta)
        return outputs

    def _set_counts(self, seq, blocks, kvs, ver: int) -> None:
        """Versioned per-sequence block/KV count mirror: collects can land
        out of dispatch order (a compress round is dispatched before, but
        collected after, the verify/decode program of the same step);
        applying an older program's counts would regress the mirror and
        under-size the next eviction."""
        if ver < getattr(seq, "_counts_ver", -1):
            return
        seq._counts_ver = ver
        seq.block_count = int(blocks)
        seq.kv_count = int(kvs)

    def _collect_burst(self, out, meta) -> List[RequestOutput]:
        S = self.cfg.scheduler.max_num_seqs
        k = meta["k"]
        # skip sequences finished (host-side) after this burst was dispatched
        running = [s for s in meta["running"]
                   if not s.status.is_finished]
        packed = np.asarray(out.packed)  # the single per-k-steps fetch
        self._max_nb = int(packed[-1])
        token_matrix = packed[:k * S].reshape(k, S)
        blk = packed[k * S:k * S + S]
        kvs = packed[k * S + S:k * S + 2 * S]
        self._apply_free_snapshot(meta["id"], int(packed[k * S + 2 * S]))
        lp_n = meta["logprobs_n"]
        if lp_n:
            chosen = np.asarray(out.chosen_logprobs)      # [k, S]
            top_v = np.asarray(out.top_logprobs)          # [k, S, n]
            top_i = np.asarray(out.top_logprob_ids)
        n_generated = 0
        fast = (not lp_n and all(
            s2.guided is None and not s2.sampling_params.stop
            for s2 in running))
        if fast:
            # native bulk stop scan (csrc/kvc_host.cpp) replaces the
            # per-(seq, token) Python loop on the common serving path
            from kvcompress_tpu.utils import host_ops
            Smax = token_matrix.shape[1]
            ig = np.zeros((Smax,), np.uint8)
            budget = np.full((Smax,), k, np.int32)
            min_left = np.zeros((Smax,), np.int32)
            act = np.zeros((Smax,), np.uint8)
            stop_ids = [()] * Smax
            max_len = self.cfg.scheduler.max_model_len
            for seq in running:
                sl = seq.slot
                sp = seq.sampling_params
                ig[sl] = sp.ignore_eos
                b = max_len - seq.get_len()
                if sp.max_tokens is not None:
                    b = min(b, sp.max_tokens - seq.num_output_tokens)
                budget[sl] = max(b, 0)
                min_left[sl] = max(sp.min_tokens - seq.num_output_tokens, 0)
                act[sl] = 1
                stop_ids[sl] = sp.stop_token_ids or ()
            accept, _ = host_ops.scan_stops(
                token_matrix, sorted(self.eos_token_ids), stop_ids, ig,
                budget, min_left, act)
            for seq in running:
                sl = seq.slot
                self._set_counts(seq, blk[sl], kvs[sl], meta["id"])
                n = int(accept[sl])
                seq.output_token_ids.extend(
                    int(t) for t in token_matrix[:n, sl])
                n_generated += n
        else:
            for seq in running:
                s = seq.slot
                self._set_counts(seq, blk[s], kvs[s], meta["id"])
                for t in range(k):
                    seq.output_token_ids.append(int(token_matrix[t, s]))
                    if seq.guided is not None:
                        seq.guided.advance(int(token_matrix[t, s]))
                    if lp_n and seq.sampling_params.logprobs:
                        seq.logprobs = seq.logprobs or []
                        seq.logprobs.append(self._logprob_entry(
                            int(token_matrix[t, s]), float(chosen[t, s]),
                            top_v[t, s], top_i[t, s]))
                    n_generated += 1
                    if self._check_stop(seq) is not None:
                        break
        self.scheduler.new_tokens += n_generated
        self.stats.counter("generation_tokens", n_generated)
        return self._process_finished(running)

    # ------------------------------------------------------------ speculate
    @staticmethod
    def _spec_compatible(s) -> bool:
        """Speculative rounds handle greedy AND sampled requests (the
        sampled verify implements the reference rejection-sampler
        semantics, engine/programs.py _build_verify). Excluded: guided
        masks and logprobs (per-token host coupling) and penalties (need
        the token-count history tensors the verify program doesn't
        carry) - those batches fall back to the regular decode burst."""
        sp = s.sampling_params
        return (s.guided is None and not sp.logprobs
                and sp.repetition_penalty == 1.0
                and sp.presence_penalty == 0.0
                and sp.frequency_penalty == 0.0)

    def _do_decode_spec(self) -> List[RequestOutput]:
        """One n-gram speculative round: propose per sequence from its own
        token history, verify Q = gamma + 1 tokens in one device pass,
        accept the longest matching prefix (reference vllm/spec_decode/
        ngram_worker + batch_expansion; greedy acceptance)."""
        from kvcompress_tpu.utils import host_ops

        pre = self._flush_pending() + self._collect_prefill()
        if pre:
            return pre + (self._do_decode_spec()
                          if self.scheduler.running else [])

        sc = self.cfg.speculative
        S = self.cfg.scheduler.max_num_seqs
        Q = sc.num_speculative_tokens + 1
        running = list(self.scheduler.running)

        tokens = np.full((S, Q), -1, np.int32)
        positions0 = np.zeros((S,), np.int32)
        active = np.zeros((S,), bool)
        n_proposed = 0
        use_draft = (sc.method in ("draft", "eagle")
                     and self.programs.draft is not None)
        if use_draft:
            # draft-model proposal over the draft's ring KV cache: warm
            # stale rings with one windowed forward, then ONE fused
            # program ingests the tokens accepted since last round
            # (overwriting any stale proposal K/V at the same ring slots)
            # and keeps stepping to emit gamma proposals
            W = sc.draft_window
            if self._draft_ring is None:
                self._draft_ring = self.programs.draft_ring_init(W)
            stale = []
            for seq in running:
                dp = getattr(seq, "draft_pos", None)
                if dp is None or not (1 <= seq.get_len() - 1 - dp <= Q):
                    stale.append(seq)
            if stale:
                windows = np.zeros((S, W), np.int32)
                pos0w = np.zeros((S,), np.int32)
                wlens = np.zeros((S,), np.int32)
                act_w = np.zeros((S,), bool)
                for seq in stale:
                    sl = seq.slot
                    hist = (seq.prompt_token_ids
                            + seq.output_token_ids)[:-1]
                    wl = min(len(hist), W)
                    windows[sl, W - wl:] = hist[-wl:]
                    wlens[sl] = wl
                    pos0w[sl] = len(hist) - W
                    act_w[sl] = True
                    seq.draft_pos = len(hist) - 1
                self._draft_ring = self.programs.draft_warm(
                    self._draft_ring, windows, pos0w, wlens, act_w)
            # one packed host array per round: ingest | n_in | pos0 |
            # active (every small transfer is a tunnel RPC)
            packed_in = np.zeros((S, Q + 3), np.int32)
            for seq in running:
                sl = seq.slot
                active[sl] = True
                hist = seq.prompt_token_ids + seq.output_token_ids
                new = hist[seq.draft_pos + 1:]
                assert 1 <= len(new) <= Q, (len(new), Q)
                packed_in[sl, :len(new)] = new
                packed_in[sl, Q] = len(new)
                packed_in[sl, Q + 1] = seq.draft_pos + 1
                packed_in[sl, Q + 2] = 1
                seq.draft_pos = len(hist) - 1
            # the draft round returns verify's full inputs on DEVICE -
            # zero host/glue dispatches between propose and verify
            (self._draft_ring, tokens, positions0,
             active_dev) = self.programs.draft_round(
                self._draft_ring, packed_in, Q - 1,
                tgt_hid=self._eagle_hid)
            active = active_dev
            n_proposed += (Q - 1) * len(running)
        elif self.programs.proposer is not None and sc.method in (
                "medusa", "mlp_speculator"):
            # head-based proposals were computed INSIDE last round's verify
            # program (engine/programs.py) and fetched with its packed
            # result; a slot's carry is valid only for the same sequence at
            # the expected length (stale after preemption, slot reuse, or a
            # non-spec step in between - verification makes staleness a
            # lost-speedup, never a correctness issue). A sequence's first
            # round proposes nothing and just bootstraps the hidden state.
            for seq in running:
                sl = seq.slot
                active[sl] = True
                tokens[sl, 0] = seq.last_token_id
                positions0[sl] = seq.get_len() - 1
                carry = self._pending_props.get(sl)
                if carry is not None and carry[0] == seq.request_id \
                        and carry[1] == seq.get_len():
                    tokens[sl, 1:] = carry[2][:Q - 1]
                    n_proposed += Q - 1
        else:
            for seq in running:
                sl = seq.slot
                active[sl] = True
                tokens[sl, 0] = seq.last_token_id
                positions0[sl] = seq.get_len() - 1
                hist = seq.prompt_token_ids + seq.output_token_ids
                props = host_ops.ngram_propose(
                    hist, sc.ngram_prompt_lookup_min,
                    sc.ngram_prompt_lookup_max, Q - 1)
                if props:
                    tokens[sl, 1:1 + len(props)] = props
                    n_proposed += len(props)

        # rejection-sampling verify for batches with any sampled (or
        # logit-biased) row; pure-greedy batches keep the cheaper argmax
        # program (sample()'s full-vocab sorts dominate small batches)
        st = rng_key = None
        if any(not s.sampling_params.greedy
               or getattr(s.sampling_params, "logit_bias", None)
               for s in running):
            params_by_slot = [None] * S
            for seq in running:
                params_by_slot[seq.slot] = seq.sampling_params
            st = SamplingTensors.from_params(
                params_by_slot, pad_to=S,
                vocab_size=self.cfg.model.vocab_size)
            self._rng, rng_key = jax.random.split(self._rng)
        self.state, packed, self._eagle_hid = self.programs.verify(
            self.state, tokens, positions0, active, Q, st=st, rng=rng_key)
        verify_snap = self._note_dispatch()
        packed = np.asarray(packed)
        greedy = packed[:S * Q].reshape(S, Q)
        n_out = packed[S * Q:S * Q + S]
        blk = packed[S * Q + S:S * Q + 2 * S]
        kvs = packed[S * Q + 2 * S:S * Q + 3 * S]
        props_round = None
        if self.programs.proposer is not None and Q > 1:
            base = S * Q + 3 * S
            props_round = packed[base:base + S * (Q - 1)].reshape(S, Q - 1)
        # versioned mirror update: verify runs AFTER any in-flight
        # compression (dispatch order serializes donated-state programs),
        # so its snapshot supersedes the pending compress fetch, which
        # _apply_free_snapshot will then correctly drop as stale
        self._apply_free_snapshot(verify_snap, int(packed[-1]))
        self._carry = None  # positions/tokens changed outside the carry

        n_generated = 0
        n_accepted = 0
        for seq in running:
            sl = seq.slot
            self._set_counts(seq, blk[sl], kvs[sl], verify_snap)
            n = int(n_out[sl])
            n_accepted += max(n - 1, 0)
            for t in range(n):
                seq.output_token_ids.append(int(greedy[sl, t]))
                n_generated += 1
                if self._check_stop(seq) is not None:
                    break
            if props_round is not None:
                # carry this round's fused proposals to the next round
                self._pending_props[sl] = (
                    seq.request_id, seq.get_len(), props_round[sl])
        self.scheduler.new_tokens += n_generated
        if running:
            self._max_nb = max(
                self._max_nb,
                max(cdiv(seq.get_len() + 1, self.cfg.cache.block_size)
                    for seq in running))
        self.stats.counter("generation_tokens", n_generated)
        self.stats.counter("spec_proposed_tokens", n_proposed)
        self.stats.counter("spec_accepted_tokens", n_accepted)
        return self._process_finished(running)

    # ------------------------------------------------------------ compress
    def _collect_compress(self) -> None:
        if self._pending_compress is None:
            return
        packed, batch, snap_id = self._pending_compress
        self._pending_compress = None
        packed = np.asarray(packed)  # one fetch
        B = (len(packed) - 1) // 3
        evicted = packed[:B]
        seq_blocks = packed[B:2 * B]
        seq_kv = packed[2 * B:3 * B]
        for i, seq in enumerate(batch.seqs):
            if seq.status.is_finished:
                continue
            self._set_counts(seq, seq_blocks[i], seq_kv[i], snap_id)
        self._apply_free_snapshot(snap_id, int(packed[3 * B]))
        n_evicted = int(evicted.sum()) * self.cfg.cache.block_size
        self.scheduler.total_evicted_kvs += n_evicted
        self.stats.counter("compression_rounds")
        self.stats.counter("evicted_kvs", n_evicted)

    def _maybe_compress(self) -> None:
        self._collect_compress()
        kc = self.cfg.kvcompress
        sc = self.scheduler
        if self._pending_prefill and kc.enabled:
            n_iters = self.multi_step if sc.running else 1
            will_compress = (
                self._force_compress
                or (sc.must_preempt(self.multi_step) and bool(sc.running))
                or sc.iteration_count + n_iters >= kc.compression_interval
                or (kc.new_token_limit > -1
                    and sc.new_tokens > kc.new_token_limit))
            if will_compress:
                # compression scheduling reads sequence lengths/positions;
                # the in-flight prefill's sampled token must land first
                self._deferred_outputs = getattr(self, "_deferred_outputs",
                                                 [])
                self._deferred_outputs += self._collect_prefill()
        force = self._force_compress or (
            self.scheduler.must_preempt(self.multi_step) and bool(self.scheduler.running))
        n_iters = self.multi_step if self.scheduler.running else 1
        batch = self.scheduler.schedule_compression(force=force,
                                                    n_iters=n_iters)
        self._force_compress = False
        if batch is None:
            return
        # workspace width: the scheduler's bound comes from uncompressed
        # sequence lengths; the device-reported max allocated blocks per
        # head is far tighter once sequences are compressed (the sort is
        # the documented compression bottleneck, reference config.py:974)
        nb = min(batch.nb_bucket,
                 self._max_nb + 2 * cdiv(self.multi_step,
                                         self.cfg.cache.block_size) + 1)
        self.state, packed = self.programs.compress(
            self.state,
            np.asarray(batch.slots, np.int32),
            np.asarray(batch.last_positions, np.int32),
            np.asarray(batch.protected, np.int32),
            np.asarray(batch.evict_blocks, np.int32),
            nb=nb,
        )
        # defer the fetch: it is collected at step end (overlapping the
        # decode burst) or at the next _maybe_compress, whichever first
        self._pending_compress = (packed, batch, self._note_dispatch())
        if not self.pipeline_decode:
            self._collect_compress()

    # ------------------------------------------------------------- outputs
    @staticmethod
    def _logprob_entry(token_id, chosen_lp, top_vals, top_ids) -> dict:
        entry = {int(t): float(v) for t, v in zip(top_ids, top_vals)}
        entry[int(token_id)] = float(chosen_lp)
        return entry

    def _update_text(self, seq: Sequence) -> str:
        """Incrementally detokenize new output tokens; returns the delta.
        A delta precomputed by _batch_update_text (tokenizer pool) is
        consumed instead of re-decoding."""
        if self.tokenizer is None or seq.stop_reason is not None:
            return ""
        if seq.pending_delta is not None:
            delta, seq.pending_delta = seq.pending_delta, None
        else:
            if seq.detokenizer is None:
                seq.detokenizer = IncrementalDetokenizer(
                    self.tokenizer, seq.sampling_params.skip_special_tokens)
            delta = seq.detokenizer.update(seq.output_token_ids)
        seq.output_text = seq.detokenizer.text
        return delta

    def _batch_update_text(self, seqs: List[Sequence]) -> None:
        """Detokenize all sequences' new tokens through the tokenizer
        group (thread pool when KVC_TOKENIZER_POOL_SIZE>0); deltas park
        on seq.pending_delta for _update_text to consume."""
        if self.tokenizer is None:
            return
        jobs, job_seqs = [], []
        for seq in seqs:
            if seq.stop_reason is not None or seq.pending_delta is not None:
                continue
            if seq.detokenizer is None:
                seq.detokenizer = IncrementalDetokenizer(
                    self.tokenizer, seq.sampling_params.skip_special_tokens)
            jobs.append((seq.detokenizer, seq.output_token_ids))
            job_seqs.append(seq)
        for seq, delta in zip(job_seqs,
                              self.tokenizer_group.batch_update(jobs)):
            seq.pending_delta = delta

    def _check_stop(self, seq: Sequence) -> Optional[SequenceStatus]:
        sp = seq.sampling_params
        if seq.stop_reason is not None:  # stop string matched earlier
            return SequenceStatus.FINISHED_STOPPED
        if seq.guided is not None and seq.guided.finished:
            return SequenceStatus.FINISHED_STOPPED
        last = seq.output_token_ids[-1]
        past_min = seq.num_output_tokens >= sp.min_tokens
        if past_min and not sp.ignore_eos and last in self.eos_token_ids:
            return SequenceStatus.FINISHED_STOPPED
        if past_min and sp.stop_token_ids and last in sp.stop_token_ids:
            return SequenceStatus.FINISHED_STOPPED
        if sp.stop and self.tokenizer is not None:
            delta = self._update_text(seq)
            if past_min and delta:
                match, pos = check_stop_strings(seq.output_text, sp.stop,
                                                len(delta))
                if match is not None:
                    seq.output_text = seq.output_text[:pos]
                    seq.stop_reason = match
                    return SequenceStatus.FINISHED_STOPPED
        if (sp.max_tokens is not None
                and seq.num_output_tokens >= sp.max_tokens):
            return SequenceStatus.FINISHED_LENGTH
        if seq.get_len() >= self.cfg.scheduler.max_model_len:
            return SequenceStatus.FINISHED_LENGTH
        return None

    def _finish(self, seq: Sequence, status: SequenceStatus) -> None:
        slot = seq.slot
        self.scheduler.finish_seq(seq, status)
        if slot >= 0:
            self.state, free_top = self.programs.free_slots(self.state,
                                                            [slot])
            self._apply_free_snapshot(self._note_dispatch(), int(free_top))
        seq.finish_time = time.monotonic()

    def _process_finished(self, seqs: List[Sequence]) -> List[RequestOutput]:
        outputs = []
        freed_slots = []
        self._batch_update_text(seqs)
        for seq in seqs:
            status = self._check_stop(seq)
            if status is not None:
                slot = seq.slot
                harvested = self._prefix_contribute(seq)
                self.scheduler.finish_seq(seq, status)
                if not harvested:
                    freed_slots.append(slot)
                seq.finish_time = time.monotonic()
                self._record_request_stats(seq)
                outputs.append(self._make_output(seq, finished=True))
            else:
                # in-progress output for streaming consumers (the reference
                # returns a RequestOutput for every scheduled seq each step)
                outputs.append(self._make_output(seq, finished=False))
        if freed_slots:
            self.state, free_top = self.programs.free_slots(
                self.state, freed_slots)
            self._apply_free_snapshot(self._note_dispatch(), int(free_top))
        n_finished = sum(1 for o in outputs if o.finished)
        if n_finished:
            self.stats.counter("requests_finished", n_finished)
        return outputs

    def _record_request_stats(self, seq: Sequence) -> None:
        """TTFT / TPOT / e2e latency histograms (reference
        vllm/engine/metrics.py histogram set) + request trace span."""
        e2e = seq.finish_time - seq.arrival_time
        self.stats.timer("e2e_request_latency_seconds", e2e)
        if seq.first_token_time is not None:
            ttft = seq.first_token_time - seq.arrival_time
            self.stats.timer("time_to_first_token_seconds", ttft)
            n_decode = max(seq.num_output_tokens - 1, 1)
            tpot = (seq.finish_time - seq.first_token_time) / n_decode
            self.stats.timer("time_per_output_token_seconds", tpot)
        TRACER.finish_request(
            seq.request_id,
            **{"gen_ai.usage.completion_tokens": seq.num_output_tokens,
               "gen_ai.response.finish_reason": seq.status.value,
               "kvc.compressed": seq.compressed})

    def _make_output(self, seq: Sequence,
                     finished: bool = True) -> RequestOutput:
        self._update_text(seq)
        reason = None
        if finished:
            reason = ("stop"
                      if seq.status == SequenceStatus.FINISHED_STOPPED
                      else "length")
        return RequestOutput(
            request_id=seq.request_id,
            prompt=seq.prompt,
            prompt_token_ids=seq.prompt_token_ids,
            outputs=[CompletionOutput(
                index=0, text=seq.output_text,
                token_ids=list(seq.output_token_ids),
                finish_reason=reason,
                logprobs=list(seq.logprobs) if seq.logprobs else None,
                stop_reason=seq.stop_reason)],
            finished=finished,
        )
