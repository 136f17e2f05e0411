"""Token sampling on device.

Covers the headline surface of reference
vllm/model_executor/layers/sampler.py: greedy, temperature, top-k, top-p,
min-p and repetition/presence/frequency penalties, vectorised over the batch
with per-sequence parameters. Seeded sampling uses a threaded jax PRNG key.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingTensors(NamedTuple):
    """Per-sequence sampling parameters, padded to the decode batch."""
    temperature: jax.Array        # [S] f32 (0 -> greedy)
    top_p: jax.Array              # [S] f32
    top_k: jax.Array              # [S] i32 (<=0 -> disabled)
    min_p: jax.Array              # [S] f32
    repetition_penalty: jax.Array  # [S] f32
    presence_penalty: jax.Array   # [S] f32
    frequency_penalty: jax.Array  # [S] f32

    @staticmethod
    def from_params(params_list, pad_to: int) -> "SamplingTensors":
        import numpy as np
        S = pad_to

        def arr(attr, default, dtype):
            out = np.full((S,), default, dtype)
            for i, p in enumerate(params_list):
                if p is not None:
                    out[i] = getattr(p, attr)
            return jnp.asarray(out)

        return SamplingTensors(
            temperature=arr("temperature", 0.0, "float32"),
            top_p=arr("top_p", 1.0, "float32"),
            top_k=arr("top_k", -1, "int32"),
            min_p=arr("min_p", 0.0, "float32"),
            repetition_penalty=arr("repetition_penalty", 1.0, "float32"),
            presence_penalty=arr("presence_penalty", 0.0, "float32"),
            frequency_penalty=arr("frequency_penalty", 0.0, "float32"),
        )


def apply_penalties(
    logits: jax.Array,        # [S, V] f32
    token_counts: jax.Array,  # [S, V] i32 occurrences in output so far
    prompt_mask: jax.Array,   # [S, V] bool tokens appearing in prompt
    t: SamplingTensors,
) -> jax.Array:
    seen = (token_counts > 0) | prompt_mask
    rp = t.repetition_penalty[:, None]
    logits = jnp.where(
        seen,
        jnp.where(logits > 0, logits / rp, logits * rp),
        logits,
    )
    logits = logits - t.frequency_penalty[:, None] * token_counts
    logits = logits - t.presence_penalty[:, None] * (token_counts > 0)
    return logits


def sample(
    logits: jax.Array,  # [S, V] f32
    t: SamplingTensors,
    rng: jax.Array,     # jax PRNG key
    token_counts: Optional[jax.Array] = None,
    prompt_mask: Optional[jax.Array] = None,
    greedy_only: bool = False,
) -> jax.Array:
    """Returns sampled token ids [S] i32. greedy_only is a static fast path
    (skips the full-vocab sorts, which dominate small-batch decode steps)."""
    S, V = logits.shape
    if token_counts is not None:
        logits = apply_penalties(logits, token_counts, prompt_mask, t)

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        return greedy

    temp = jnp.maximum(t.temperature, 1e-6)[:, None]
    scaled = logits / temp

    # top-k: mask logits below the k-th largest
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    k = jnp.where(t.top_k <= 0, V, jnp.minimum(t.top_k, V))
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    scaled = jnp.where(scaled < kth, NEG_INF, scaled)

    # top-p over the surviving distribution
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # smallest set with cumulative prob >= top_p: cut where the cumulative
    # mass before a token already reaches top_p
    cut = (cum - probs_sorted) >= t.top_p[:, None]
    cutoff = jnp.where(cut, -jnp.inf, sorted_desc).min(axis=-1,
                                                       keepdims=True)
    cutoff = jnp.where(jnp.isfinite(cutoff), cutoff, NEG_INF)
    scaled = jnp.where(scaled < cutoff, NEG_INF, scaled)

    # min-p: drop tokens below min_p * max prob
    probs = jax.nn.softmax(scaled, axis=-1)
    pmax = probs.max(axis=-1, keepdims=True)
    scaled = jnp.where(probs < t.min_p[:, None] * pmax, NEG_INF, scaled)

    sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(t.temperature == 0.0, greedy, sampled)
