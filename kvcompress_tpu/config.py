"""Engine configuration objects.

Mirrors the capability surface of the reference config system
(vllm/config.py:622-638,971-1143 and vllm/engine/arg_utils.py:783-915) with a
TPU-native shape: all limits are static so that every device program (prefill,
decode, compression) compiles to a fixed-shape XLA executable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclasses.dataclass
class ModelConfig:
    """Shape and metadata of the model being served.

    Populated either from a HuggingFace config (see models/registry.py) or
    directly for tests.
    """

    model: str = ""
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_size: int = 128
    hidden_size: int = 4096
    intermediate_size: int = 14336
    vocab_size: int = 128256
    max_model_len: int = 8192
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    rms_norm_eps: float = 1e-5
    dtype: str = "bfloat16"
    tie_word_embeddings: bool = False
    architecture: str = "LlamaForCausalLM"
    # source checkpoint's quant method ("awq"/"gptq") when it shipped
    # 4-bit packed weights; the LLM surface re-quantizes to the int4
    # runtime format by default (quantization/int4.py)
    checkpoint_quantization: Optional[str] = None
    # multimodal (llava-style): the placeholder token id expanded into
    # projected image embeddings; None = text-only model
    image_token_index: Optional[int] = None
    # audio multimodal (ultravox): the <|audio|> placeholder expanded
    # into projected whisper-encoder embeddings
    audio_token_index: Optional[int] = None
    # EAGLE draft head: layer-0 input is fc([token_embed; target_hidden])
    # (set on the DRAFT ModelConfig by models/eagle.py)
    eagle: bool = False
    # zero the fc output at position 0, matching how EAGLE checkpoints
    # are trained (reference eagle.py:91); synthetic self-draft test
    # constructors turn this off because their target doesn't mask
    eagle_mask_pos0: bool = True
    # Activation / misc knobs used by non-llama families.
    hidden_act: str = "silu"
    attention_bias: bool = False
    mlp_bias: bool = False
    logit_soft_cap: Optional[float] = None
    # Sliding-window attention: query at position p attends keys with
    # position > p - sliding_window (mistral/qwen2 semantics). Applied on
    # layers where layer_idx % sliding_window_every == 0 (gemma2 alternates
    # sliding/full with every=2; every=1 windows all layers). Unlike the
    # reference, which rejects sliding-window models outright
    # (vllm/config.py:631-635), the XLA attention path implements it.
    sliding_window: Optional[int] = None
    sliding_window_every: int = 1
    # Qwen2-style bias on QKV projections only.
    qkv_bias: bool = False
    # dbrx/olmo-0424: clamp qkv activations to +-clip_qkv before rope
    clip_qkv: Optional[float] = None
    # PaliGemma-style prefix-LM: the WHOLE prompt (image tokens + text
    # prefix) attends bidirectionally during prefill; generated tokens
    # stay causal (HF modeling_paligemma._update_causal_mask inference
    # branch). Prefill runs on the XLA attention path; decode is
    # mask-independent and keeps the pallas kernels.
    prefix_lm: bool = False

    # ---- generic-decoder architecture knobs (models/decoder.py) ----
    # These parameterize the one scan-over-layers forward so that every
    # decoder family of the reference model zoo
    # (vllm/model_executor/models/, 64 files) maps onto a single TPU
    # program shape instead of 64 hand-written modules.
    norm_type: str = "rmsnorm"          # "rmsnorm" | "layernorm"
    norm_bias: bool = False             # layernorm bias term
    rmsnorm_offset: bool = False        # gemma: y * (1 + w)
    parallel_residual: bool = False     # gpt-neox / phi / falcon style
    shared_input_norm: bool = False     # phi/cohere: one norm feeds attn+mlp
    use_post_norms: bool = False        # gemma2 sandwich norms
    pos_embedding: str = "rope"         # "rope" | "learned" | "none"
    learned_pos_offset: int = 0         # opt: positions offset by 2
    partial_rotary_factor: float = 1.0  # neox/phi/stablelm partial rotary
    mlp_type: str = "gated"             # "gated" (gate/up/down) | "plain"
    o_bias: bool = False                # bias on the attention output proj
    lm_head_bias: bool = False          # phi-2 has a biased lm head
    embedding_multiplier: float = 1.0   # gemma: sqrt(hidden_size)
    residual_multiplier: float = 1.0    # granite
    attention_scale: Optional[float] = None  # default head_size**-0.5
    attn_logit_softcap: Optional[float] = None  # gemma2
    logits_scaling: float = 1.0         # granite: logits /= logits_scaling
    gegelu_limit: Optional[float] = None  # phi3-small clamped gegelu
    rope_interleaved: bool = False      # gpt-j / cohere rotate-every-two
    qk_norm: bool = False               # persimmon/qwen3 per-head q/k norm
    qk_norm_full: bool = False          # olmo2/olmoe: norm over Hq*d
    # chameleon: LAYERNORM stats over head_dim (eps fixed at 1e-5, HF
    # ChameleonLayerNorm) with a per-(head, dim) affine weight AND bias
    qk_norm_per_head: bool = False
    # chameleon: token ids whose logits are masked to dtype-min at every
    # step (image-codebook tokens are not sampled in text generation)
    logit_suppress_tokens: Optional[tuple] = None
    no_pre_norm: bool = False           # olmo2: norm sublayer OUTPUTS only
    embed_norm: bool = False            # bloom word_embeddings_layernorm
    alibi: bool = False                 # bloom / mpt attention bias
    # MoE (mixtral / qwen2-moe / dbrx families)
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: Optional[int] = None
    moe_norm_topk_prob: bool = True
    moe_shared_expert_size: int = 0     # qwen2-moe shared expert
    # "softmax_topk" | "sparsemixer" (phimoe) | "sigmoid_noaux" (dsv3)
    moe_routing: str = "softmax_topk"
    moe_routed_scaling: float = 1.0     # deepseek routed_scaling_factor
    moe_n_group: int = 1                # deepseek group-limited routing
    moe_topk_group: int = 1
    # "grouped" = sort-based ragged_dot dispatch (T*k*d*i FLOPs, exact);
    # "dense" = all-experts einsum (T*E*d*i FLOPs) — the fallback for
    # cases where ragged_dot cannot be used (e.g. sharded expert dims)
    moe_dispatch: str = "grouped"
    # Arctic dense+MoE hybrid layers (snowflake): the routed-MoE branch
    # reads the PRE-attention residual through post_attention_layernorm
    # while a parallel dense MLP (residual_mlp / per-layer dense FFN) reads
    # the post-attention stream through its own norm
    # (reference arctic.py:330-357 ArcticDecoderLayer.forward)
    arctic_residual: bool = False
    # --- Multi-head Latent Attention (deepseek v2/v3) ---
    # The cache stores ONE vector per (layer, token): the normalized
    # compressed latent (kv_lora_rank) concatenated with the roped shared
    # k_pe (qk_rope_head_dim) - so head_size = kv_lora_rank +
    # qk_rope_head_dim and num_kv_heads = 1. Attention runs in ABSORBED
    # form: q_abs[h] = q_nope[h] @ W_kc[h] lives in latent space, so the
    # paged/pallas kernels run UNCHANGED as MQA over the latent cache;
    # the per-head value projection W_vc applies after attention.
    kv_lora_rank: Optional[int] = None
    q_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0

    @property
    def num_queries_per_kv(self) -> int:
        return self.num_heads // self.num_kv_heads

    def get_num_kv_heads(self, tp_size: int = 1) -> int:
        return max(1, self.num_kv_heads // tp_size)


@dataclasses.dataclass
class CacheConfig:
    """Paged KV cache shape.

    The cache is unified across layers: one (k, v) pair of tensors whose
    blocks each hold KVs of a single (layer, kv_head) pair, following
    reference vllm/worker/cache_engine.py:74-122 / vllm/core/kv_cache.py:31-46
    but laid out TPU-natively as [num_blocks, block_size, head_size].
    """

    block_size: int = 16
    num_blocks: int = 0  # 0 -> derived from memory utilisation at init
    gpu_memory_utilization: float = 0.9
    # "bfloat16" | "float32" | "int8" (per-KV-scale quantized cache, the
    # reference's --kv-cache-dtype fp8 counterpart; ~1.9x the block count
    # in the same HBM)
    cache_dtype: str = "bfloat16"
    # Prefix caching (reference --enable-prefix-caching,
    # block_manager_v2.py): finished uncompressed prompts' full blocks
    # are pooled and reused by copy for later prompts sharing the prefix
    # (core/prefix_cache.py). Like the reference's KVC restriction, a
    # compressed sequence's blocks never enter the pool.
    enable_prefix_caching: bool = False
    # ceiling on pooled physical blocks, as a fraction of the cache
    prefix_pool_fraction: float = 0.25

    def block_bytes(self, head_size: int) -> int:
        if self.cache_dtype == "int8":
            # k + v int8 + two f32 scales + metric(f32) + position(i32)
            return self.block_size * (2 * head_size + 8 + 4 + 4)
        itemsize = 2 if self.cache_dtype in ("bfloat16", "float16") else 4
        # k + v + metric(f32) + position(i32)
        return self.block_size * (2 * head_size * itemsize + 4 + 4)


@dataclasses.dataclass
class KVCompressConfig:
    """KV-Compress knobs.

    Mirrors reference vllm/config.py:971-1143 (KVCompressConfig) and the
    CLI flags at vllm/engine/arg_utils.py:783-915.
    """

    enabled: bool = True
    # Cadence: run compression every N engine iterations
    # (reference kvcompress/scheduler.py:565-575).
    compression_interval: int = 16
    # Alternative cadence: compress after this many new tokens (-1 = off).
    new_token_limit: int = -1
    # Hard cap on KVs touched per compression round; bounds the size of the
    # sort workspace (reference config.py:974-985).
    max_kv_per_compression: int = 5_000_000
    # Cap on scheduled cache moves per round (bounds the gather/scatter
    # workspace; total evicted KVs per round never exceeds this).
    max_cache_moves_per_compression: int = 262_144
    # Default per-request knobs (reference sampling_params.py:152-156).
    protected_window_size: int = 32
    target_compression_rate: float = 1.0
    max_cache_tokens: int = -1
    metric_collection_buffer_size: int = 0
    compress_once: bool = False
    # Metric aggregation flags (reference metrics.py:94-150).
    use_l2: bool = True
    use_average: bool = False
    use_maxpool: bool = True
    record_decoding_metrics: bool = True
    num_attention_sinks: int = 0
    random_eviction: bool = False
    even_layer_evict: bool = False
    # Per-head bias (reference metrics.py:44-81).
    kv_head_bias_file: Optional[str] = None
    kv_head_bias_weight: float = 1.0
    # Prefill metric collection (reference flash_attn.py:1122-1211).
    prefill_metric_collection_window_size: int = 32
    prefill_metric_collection_block_size: int = 1024
    # Derived from the model at engine build (reference arg_utils.py:1151-1182).
    num_layers: int = 0
    num_kv_heads: int = 0


@dataclasses.dataclass
class SchedulerConfig:
    max_num_seqs: int = 64
    max_num_batched_tokens: int = 8192
    max_model_len: int = 8192
    # Prefill length buckets (tokens are padded up to the nearest bucket so
    # XLA compiles a bounded set of prefill programs).
    prefill_buckets: Tuple[int, ...] = (128, 256, 512, 1024, 2048, 4096, 8192)
    # Watermark fraction of blocks kept free when admitting a prefill
    # (reference kvcompress/block_manager.py:356-382).
    watermark: float = 0.01
    # Decode iterations per host round-trip (0 = pick by platform; the
    # reference's --num-scheduler-steps multi-step decoding).
    num_scheduler_steps: int = 0


@dataclasses.dataclass
class SpeculativeConfig:
    """Speculative decoding (reference vllm/spec_decode/). Greedy-only
    here; the reference does not support spec decode with KVC at all.

    method "ngram": host-side n-gram proposal (reference ngram_worker).
    method "draft": a small draft model proposes gamma tokens in ONE
    fused device program - the draft recomputes a bounded recent window
    (draft_window tokens) instead of keeping its own paged cache, trading
    tiny-model FLOPs for zero draft state management (vs the reference's
    multi_step_worker + draft KV cache).
    methods "medusa" / "mlp_speculator": proposer heads on the target's
    hidden state (reference medusa_worker / mlp_speculator_worker),
    FUSED into the verification program - proposals for the next round
    ride back in the packed result (models/proposers.py). draft_model
    points at the head checkpoint directory."""
    num_speculative_tokens: int = 0  # 0 = disabled
    # "ngram" | "draft" | "medusa" | "mlp_speculator" | "eagle"
    method: str = "ngram"
    # temperature>0 acceptance rule (reference spec_decode_base_sampler
    # subclasses): "rejection_sampler" couples the target sample to the
    # proposal (distribution-preserving); "typical_acceptance_sampler"
    # accepts t_i iff p_target(t_i) > min(eps, alpha * exp(-H(p_target)))
    # (Medusa 3.3.1 - longer acceptances, deterministic approximation,
    # reference typical_acceptance_sampler.py)
    acceptance_method: str = "rejection_sampler"
    typical_acceptance_sampler_posterior_threshold: float = 0.09
    typical_acceptance_sampler_posterior_alpha: float = 0.3
    ngram_prompt_lookup_min: int = 1
    ngram_prompt_lookup_max: int = 4
    draft_model: Optional[str] = None  # HF dir for the draft (LLM surface)
    draft_window: int = 64           # context window the draft recomputes


@dataclasses.dataclass
class PromptAdapterConfig:
    """Prompt-adapter limits (reference vllm/config.py
    PromptAdapterConfig)."""
    enable_prompt_adapter: bool = False
    max_prompt_adapters: int = 4
    max_prompt_adapter_token: int = 64


@dataclasses.dataclass
class LoRAConfig:
    """Multi-adapter serving limits (reference vllm/config.py LoRAConfig)."""
    enable_lora: bool = False
    max_loras: int = 4
    max_lora_rank: int = 16


@dataclasses.dataclass
class ParallelConfig:
    """Mesh shape. data axis shards the batch; model axis shards weights and
    the kv-head dimension of the cache (KVC is embarrassingly parallel per
    head - see SURVEY.md section 2.7)."""

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # serving-level GPipe over the "pipe" mesh axis (parallel/pipeline.py);
    # layer-stacked weights and the per-layer cache shard by stage
    pipeline_parallel_size: int = 1
    # expert parallelism: MoE expert weights shard on the EXPERT axis over
    # the model mesh axis instead of the intermediate axis (beyond the
    # reference, whose fused_moe only TP-shards the intermediate dim).
    # Dense dispatch partitions via GSPMD; grouped dispatch runs a
    # shard_map over local experts with a psum combine
    # (models/decoder.py _moe_grouped_experts_ep)
    enable_expert_parallel: bool = False

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size
                * self.pipeline_parallel_size)


@dataclasses.dataclass
class EngineConfig:
    model: ModelConfig
    cache: CacheConfig
    kvcompress: KVCompressConfig
    scheduler: SchedulerConfig
    parallel: ParallelConfig
    lora: Optional[LoRAConfig] = None
    prompt_adapter: Optional[PromptAdapterConfig] = None
    speculative: Optional[SpeculativeConfig] = None
    seed: int = 0
    enforce_eager: bool = False

    def __post_init__(self):
        if self.lora is None:
            self.lora = LoRAConfig()
        if self.prompt_adapter is None:
            self.prompt_adapter = PromptAdapterConfig()
        if self.speculative is None:
            self.speculative = SpeculativeConfig()
        mc, sc, kc = self.model, self.scheduler, self.kvcompress
        kc.num_layers = mc.num_layers
        kc.num_kv_heads = mc.get_num_kv_heads(
            self.parallel.tensor_parallel_size
        ) if False else mc.num_kv_heads
        sc.max_model_len = min(sc.max_model_len, mc.max_model_len)

    @property
    def max_blocks_per_head(self) -> int:
        return cdiv(self.scheduler.max_model_len, self.cache.block_size)

    def min_blocks_for_seq(self, seq_len: int) -> int:
        """Blocks needed to prefill a sequence of seq_len tokens: one block
        per (layer, kv_head) per block_size tokens
        (reference kvcompress/block_manager.py:196-222)."""
        per_head = cdiv(seq_len, self.cache.block_size)
        return per_head * self.model.num_layers * self.model.num_kv_heads
