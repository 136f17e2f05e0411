"""Offline batch inference API (reference vllm/entrypoints/llm.py:31-277).

Usage:
    llm = LLM(model="/path/to/llama", enable_kvcompress=True)
    outputs = llm.generate(prompts, SamplingParams(max_cache_tokens=128))
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                   KVCompressConfig, LoRAConfig, ModelConfig,
                                   ParallelConfig, SchedulerConfig,
                                   SpeculativeConfig)
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.sampling_params import SamplingParams
from kvcompress_tpu.sequence import RequestOutput


def build_engine_config(
    model_cfg: ModelConfig,
    *,
    block_size: int = 16,
    max_num_seqs: int = 64,
    max_model_len: Optional[int] = None,
    gpu_memory_utilization: float = 0.9,
    kv_cache_dtype: str = "auto",
    enable_prefix_caching: bool = False,
    enable_kvcompress: bool = True,
    compression_interval: int = 16,
    max_kv_per_compression: int = 5_000_000,
    prefill_metric_collection_window_size: int = 32,
    prefill_metric_collection_block_size: int = 1024,
    metric_aggregation: str = "L2-maxpool",
    kv_head_bias_file: Optional[str] = None,
    kv_head_bias_weight: float = 1.0,
    record_decoding_metrics: bool = True,
    tensor_parallel_size: int = 1,
    data_parallel_size: int = 1,
    pipeline_parallel_size: int = 1,
    enable_lora: bool = False,
    max_loras: int = 4,
    max_lora_rank: int = 16,
    num_speculative_tokens: int = 0,
    speculative_method: str = "ngram",
    speculative_draft_model: Optional[str] = None,
    speculative_draft_window: int = 64,
    spec_decoding_acceptance_method: str = "rejection_sampler",
    typical_acceptance_sampler_posterior_threshold: float = 0.09,
    typical_acceptance_sampler_posterior_alpha: float = 0.3,
    ngram_prompt_lookup_min: int = 1,
    ngram_prompt_lookup_max: int = 4,
    num_scheduler_steps: int = 0,
    prefill_buckets: Optional[tuple] = None,
    enable_expert_parallel: bool = False,
    seed: int = 0,
) -> EngineConfig:
    """Assemble an EngineConfig the way reference
    EngineArgs.create_engine_config does (arg_utils.py:936-1222), including
    the metric-aggregation variants (arg_utils.py:868-886)."""
    use_l2 = "L2" in metric_aggregation
    use_average = "average" in metric_aggregation
    use_maxpool = "maxpool" in metric_aggregation
    max_model_len = max_model_len or model_cfg.max_model_len
    if kv_cache_dtype == "auto":
        kv_cache_dtype = ("bfloat16" if model_cfg.dtype == "bfloat16"
                          else "float32")
    return EngineConfig(
        model=model_cfg,
        cache=CacheConfig(block_size=block_size,
                          gpu_memory_utilization=gpu_memory_utilization,
                          cache_dtype=kv_cache_dtype,
                          enable_prefix_caching=enable_prefix_caching),
        kvcompress=KVCompressConfig(
            enabled=enable_kvcompress,
            compression_interval=compression_interval,
            max_kv_per_compression=max_kv_per_compression,
            prefill_metric_collection_window_size=(
                prefill_metric_collection_window_size),
            prefill_metric_collection_block_size=(
                prefill_metric_collection_block_size),
            use_l2=use_l2, use_average=use_average, use_maxpool=use_maxpool,
            record_decoding_metrics=record_decoding_metrics,
            kv_head_bias_file=kv_head_bias_file,
            kv_head_bias_weight=kv_head_bias_weight,
        ),
        scheduler=SchedulerConfig(max_num_seqs=max_num_seqs,
                                  max_model_len=max_model_len,
                                  num_scheduler_steps=num_scheduler_steps,
                                  **({"prefill_buckets":
                                      tuple(prefill_buckets)}
                                     if prefill_buckets else {})),
        parallel=ParallelConfig(
            tensor_parallel_size=tensor_parallel_size,
            data_parallel_size=data_parallel_size,
            pipeline_parallel_size=pipeline_parallel_size,
            enable_expert_parallel=enable_expert_parallel),
        lora=LoRAConfig(enable_lora=enable_lora, max_loras=max_loras,
                        max_lora_rank=max_lora_rank),
        speculative=SpeculativeConfig(
            num_speculative_tokens=num_speculative_tokens,
            method=speculative_method,
            draft_model=speculative_draft_model,
            draft_window=speculative_draft_window,
            acceptance_method=spec_decoding_acceptance_method,
            typical_acceptance_sampler_posterior_threshold=(
                typical_acceptance_sampler_posterior_threshold),
            typical_acceptance_sampler_posterior_alpha=(
                typical_acceptance_sampler_posterior_alpha),
            ngram_prompt_lookup_min=ngram_prompt_lookup_min,
            ngram_prompt_lookup_max=ngram_prompt_lookup_max),
        seed=seed,
    )


class LLM:
    def __init__(
        self,
        model: str,
        *,
        tokenizer: Optional[str] = None,
        dtype: str = "bfloat16",
        quantization: Optional[str] = None,
        num_blocks: Optional[int] = None,
        trust_remote_code: bool = False,
        **engine_kw,
    ):
        import jax.numpy as jnp
        from kvcompress_tpu.models.weights import load_model

        jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.model_dir = model
        model_cfg, params = load_model(model, dtype=jdtype)
        if quantization is None and model_cfg.checkpoint_quantization:
            # AWQ/GPTQ checkpoints serve int4 unless overridden
            quantization = "int4"
        cfg = build_engine_config(model_cfg, **engine_kw)

        # drafts load BEFORE quantization: EAGLE shares the target's
        # embed/lm_head, which quantize_params renames to _q8 leaves
        draft = None
        proposer = None
        if cfg.speculative.draft_model:
            if cfg.speculative.method in ("medusa", "mlp_speculator"):
                from kvcompress_tpu.models.proposers import load_proposer
                proposer = load_proposer(cfg.speculative.draft_model,
                                         dtype=jdtype)
            elif cfg.speculative.method == "eagle":
                from kvcompress_tpu.models.eagle import load_eagle
                draft = load_eagle(cfg.speculative.draft_model, model_cfg,
                                   params, dtype=jdtype)
            else:
                draft = load_model(cfg.speculative.draft_model, dtype=jdtype)

        if quantization == "int8":
            from kvcompress_tpu.quantization import quantize_params
            params = quantize_params(params)
        elif quantization == "fp8":
            from kvcompress_tpu.quantization.fp8 import (
                quantize_params as quantize_params_fp8)
            params = quantize_params_fp8(params)
        elif quantization == "int4":
            from kvcompress_tpu.quantization.int4 import (
                quantize_params as quantize_params_int4)
            params = quantize_params_int4(params)
        elif quantization is not None:
            raise ValueError(f"unsupported quantization {quantization}")

        self._vision = None
        self._vision_jit = None
        if (model_cfg.image_token_index is not None
                or model_cfg.audio_token_index is not None):
            from kvcompress_tpu.models.weights import load_multimodal
            self._vision = load_multimodal(model, dtype=jdtype)

        from transformers import AutoTokenizer
        # trust_remote_code loads tokenizer classes shipped INSIDE the
        # local checkpoint dir (reference transformers_utils/config.py +
        # tokenizer.py trust_remote_code plumbing; zero-egress: only
        # code already on disk can load)
        tok = AutoTokenizer.from_pretrained(
            tokenizer or model, trust_remote_code=trust_remote_code)
        if cfg.parallel.data_parallel_size > 1:
            from kvcompress_tpu.parallel.data_parallel import (
                DataParallelEngine)
            self.llm_engine = DataParallelEngine(
                cfg, params, num_blocks=num_blocks, tokenizer=tok,
                draft=draft, proposer=proposer)
        else:
            self.llm_engine = LLMEngine(cfg, params, num_blocks=num_blocks,
                                        tokenizer=tok, draft=draft,
                                        proposer=proposer)

    def generate(
        self,
        prompts: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[SamplingParams,
                                        List[SamplingParams]]] = None,
        prompt_token_ids: Optional[List[List[int]]] = None,
        use_tqdm: bool = False,
        multi_modal_data: Optional[List[Optional[dict]]] = None,
    ) -> List[RequestOutput]:
        """multi_modal_data: per-prompt {"image": pixel_values [3, H, W]
        (CLIP-normalized) or [k, 3, H, W] for several images}; each
        <image> placeholder in the prompt expands to one image's patch
        embeddings, in order (reference LLM.generate multi_modal_data +
        llava.py input mapper)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        n = len(prompts) if prompts is not None else len(prompt_token_ids)
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * n

        ids = []
        for i in range(n):
            p_ids = (prompt_token_ids[i] if prompt_token_ids else None)
            mm_kw = {}
            mm = multi_modal_data[i] if multi_modal_data else None
            if mm is not None:
                if p_ids is None:
                    p_ids = self.llm_engine.tokenizer.encode(prompts[i])
                p_ids, mm_kw = self._encode_images(p_ids, mm)
            ids.append(self.llm_engine.add_request(
                None,
                prompt=prompts[i] if prompts else None,
                prompt_token_ids=p_ids,
                sampling_params=sampling_params[i],
                **mm_kw,
            ))
        return self._run_engine(ids, use_tqdm)

    def _encode_images(self, prompt_ids, mm):
        """Run the vision side on each image and expand the prompt's
        <image> placeholders into patch positions. llava takes
        mm={"image": pixel_values [3,H,W] or [k,3,H,W]}; fuyu takes
        mm={"image_patches": [n, patch*patch*3]} as produced by the HF
        FuyuImageProcessor (the reference also delegates patchification
        to it)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from kvcompress_tpu.models.vision import (expand_image_tokens,
                                                  fuyu_image_embed,
                                                  llava_image_embed)
        if self._vision is None:
            raise ValueError(
                "multi_modal_data passed but the model has no vision "
                "tower")
        kind, vcfg, vparams = self._vision
        if kind == "ultravox":
            # audio: mm = {"audio_features": mel [num_mel_bins, T] (as
            # produced by WhisperFeatureExtractor) or [k, bins, T]};
            # each <|audio|> placeholder expands to one clip's projected
            # frame run
            from kvcompress_tpu.models.vision import ultravox_audio_embed
            if self._vision_jit is None:
                self._vision_jit = jax.jit(ultravox_audio_embed,
                                           static_argnums=1)
            mel = jnp.asarray(mm["audio_features"])
            if mel.ndim == 2:
                mel = mel[None]
            embeds = jnp.concatenate([
                self._vision_jit(vparams, vcfg, mel[k])
                for k in range(mel.shape[0])])
            aud_tok = self.llm_engine.cfg.model.audio_token_index
            n_per = embeds.shape[0] // mel.shape[0]
            new_ids, positions = expand_image_tokens(prompt_ids, aud_tok,
                                                     n_per)
            if len(positions) != embeds.shape[0]:
                raise ValueError(
                    f"prompt has {len(positions) // n_per} audio tokens "
                    f"but {mel.shape[0]} clips were passed")
            return new_ids, {"mm_embeds": embeds,
                             "mm_positions": np.asarray(positions)}
        if kind == "chameleon":
            # images become TEXT tokens (VQ-VAE codebook ids mapped onto
            # the BPE vocabulary): each <image> placeholder is REPLACED
            # by its token run - no embedding splice at all (reference
            # chameleon.py input mapper + model.get_image_tokens)
            from kvcompress_tpu.models.vision import chameleon_vq_indices
            vqcfg, img2bpe = vcfg
            if self._vision_jit is None:
                self._vision_jit = jax.jit(chameleon_vq_indices,
                                           static_argnums=1)
            px = jnp.asarray(mm["image"])
            if px.ndim == 3:
                px = px[None]
            runs = [img2bpe[np.asarray(
                self._vision_jit(vparams, vqcfg, px[k]))]
                for k in range(px.shape[0])]
            img_tok = self.llm_engine.cfg.model.image_token_index
            new_ids, run_i = [], 0
            for tok in prompt_ids:
                if tok == img_tok:
                    if run_i >= len(runs):
                        raise ValueError(
                            "more <image> tokens than images passed")
                    new_ids.extend(int(x) for x in runs[run_i])
                    run_i += 1
                else:
                    new_ids.append(tok)
            if run_i != len(runs):
                raise ValueError(
                    f"prompt has {run_i} <image> tokens but {len(runs)} "
                    "images were passed")
            return new_ids, {}
        if kind == "fuyu":
            patches = jnp.asarray(mm["image_patches"])
            embeds = fuyu_image_embed(vparams, patches)
        elif kind in ("blip2", "paligemma", "internvl"):
            from kvcompress_tpu.models.vision import (blip2_image_embed,
                                                      internvl_image_embed,
                                                      paligemma_image_embed)
            if self._vision_jit is None:
                fn = {"blip2": blip2_image_embed,
                      "paligemma": paligemma_image_embed,
                      "internvl": internvl_image_embed}[kind]
                self._vision_jit = jax.jit(fn, static_argnums=1)
            px = jnp.asarray(mm["image"])
            if px.ndim == 3:
                px = px[None]
            embeds = jnp.concatenate([
                self._vision_jit(vparams, vcfg, px[k])
                for k in range(px.shape[0])])
        elif kind == "minicpmv":
            # perceiver resampler: each image yields exactly query_num
            # embeddings regardless of resolution
            from kvcompress_tpu.models.vision import minicpmv_image_embed
            scfg, n_heads = vcfg
            px = jnp.asarray(mm["image"])
            if px.ndim == 3:
                px = px[None]
            embeds = jnp.concatenate([
                minicpmv_image_embed(vparams, scfg, n_heads, px[k])
                for k in range(px.shape[0])])
        elif kind == "phi3v":
            # HD transform: mm = {"image": tiles [1 + n_crops, 3, s, s]
            # (tile 0 = global resize, Phi3VImageProcessor layout),
            # "image_size": (padded_h, padded_w) in multiples of 336};
            # ONE <image> placeholder expands to the whole merged run
            from kvcompress_tpu.models.vision import phi3v_image_embed
            px = jnp.asarray(mm["image"])
            if px.ndim != 4:
                raise ValueError("phi3v expects tiled pixel_values "
                                 "[1 + n_crops, 3, s, s]")
            embeds = phi3v_image_embed(vparams, vcfg, px,
                                       tuple(mm["image_size"]))
        elif kind == "llava_next":
            # AnyRes: mm = {"image": tiles [n_tiles, 3, sz, sz] (tile 0 =
            # base resize, as produced by LlavaNextImageProcessor),
            # "image_size": (orig_h, orig_w)}; the merged run's length is
            # image-size-dependent, so ONE <image> placeholder expands to
            # the whole run
            from kvcompress_tpu.models.vision import llava_next_image_embed
            px = jnp.asarray(mm["image"])
            if px.ndim != 4:
                raise ValueError("llava-next expects tiled pixel_values "
                                 "[n_tiles, 3, s, s]")
            embeds = llava_next_image_embed(
                vparams, vcfg, px, tuple(mm["image_size"]),
                vcfg.grid_pinpoints)
        else:
            if self._vision_jit is None:
                # one jitted encoder for the LLM's lifetime (a fresh jit
                # per request would retrace the whole CLIP tower per call)
                self._vision_jit = jax.jit(llava_image_embed,
                                           static_argnums=1)
            px = jnp.asarray(mm["image"])
            if px.ndim == 3:
                px = px[None]
            embeds = jnp.concatenate([
                self._vision_jit(vparams, vcfg, px[k])
                for k in range(px.shape[0])])
        img_tok = self.llm_engine.cfg.model.image_token_index
        n_imgs = 1 if kind in ("fuyu", "llava_next", "phi3v") \
            else px.shape[0]
        n_per = embeds.shape[0] // n_imgs
        new_ids, positions = expand_image_tokens(prompt_ids, img_tok, n_per)
        if len(positions) != embeds.shape[0]:
            raise ValueError(
                f"prompt has {len(positions) // n_per} <image> tokens "
                f"but {n_imgs} images were passed")
        return new_ids, {"mm_embeds": embeds,
                         "mm_positions": np.asarray(positions)}

    def encode(
        self,
        prompts: Optional[Union[str, List[str]]] = None,
        pooling_params=None,
        prompt_token_ids: Optional[List[List[int]]] = None,
    ):
        """Embedding mode (reference LLM.encode + llama_embedding): pooled,
        optionally normalized hidden states per prompt."""
        from kvcompress_tpu.pooling_params import PoolingParams
        import numpy as np

        pp = pooling_params or PoolingParams()
        if isinstance(prompts, str):
            prompts = [prompts]
        if prompt_token_ids is None:
            tok = self.llm_engine.tokenizer
            prompt_token_ids = [tok.encode(p) for p in prompts]
        out = []
        for ids in prompt_token_ids:
            emb = self.llm_engine.programs.embed(
                np.asarray(ids, np.int32), len(ids),
                pooling=pp.pooling_type, normalize=pp.normalize)
            out.append(np.asarray(emb))
        return out

    def _run_engine(self, request_ids: List[str],
                    use_tqdm: bool) -> List[RequestOutput]:
        """(reference llm.py:684-735)"""
        pbar = None
        if use_tqdm:
            from tqdm.auto import tqdm
            pbar = tqdm(total=len(request_ids))
        results: Dict[str, RequestOutput] = {}
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                if out.finished:
                    results[out.request_id] = out
                    if pbar:
                        pbar.update(1)
        if pbar:
            pbar.close()
        return [results[rid] for rid in request_ids]
