"""Token sampling on device.

Covers the sampling surface of reference
vllm/model_executor/layers/sampler.py: greedy, temperature, top-k, top-p,
min-p, repetition/presence/frequency penalties, per-request logit bias,
per-request seeded sampling (position-keyed, so seeded requests are
reproducible regardless of batch composition), and top-k logprobs -
vectorised over the batch with per-sequence parameters.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30
MAX_LOGIT_BIAS = 32  # per-request logit_bias entries (padded)


class SamplingTensors(NamedTuple):
    """Per-sequence sampling parameters, padded to the decode batch."""
    temperature: jax.Array        # [S] f32 (0 -> greedy)
    top_p: jax.Array              # [S] f32
    top_k: jax.Array              # [S] i32 (<=0 -> disabled)
    min_p: jax.Array              # [S] f32
    repetition_penalty: jax.Array  # [S] f32
    presence_penalty: jax.Array   # [S] f32
    frequency_penalty: jax.Array  # [S] f32
    seed: jax.Array               # [S] i32 (-1 -> unseeded)
    bias_idx: jax.Array           # [S, MAX_LOGIT_BIAS] i32 (V -> pad)
    bias_val: jax.Array           # [S, MAX_LOGIT_BIAS] f32

    @staticmethod
    def from_params(params_list, pad_to: int,
                    vocab_size: int = 0) -> "SamplingTensors":
        import numpy as np
        S = pad_to

        def arr(attr, default, dtype):
            out = np.full((S,), default, dtype)
            for i, p in enumerate(params_list):
                if p is not None and getattr(p, attr, None) is not None:
                    out[i] = getattr(p, attr)
            return jnp.asarray(out)

        bias_idx = np.full((S, MAX_LOGIT_BIAS), max(vocab_size, 1), np.int32)
        bias_val = np.zeros((S, MAX_LOGIT_BIAS), np.float32)
        for i, p in enumerate(params_list):
            lb = getattr(p, "logit_bias", None) if p is not None else None
            if lb:
                for j, (tok, val) in enumerate(list(lb.items())
                                               [:MAX_LOGIT_BIAS]):
                    bias_idx[i, j] = int(tok)
                    bias_val[i, j] = float(val)

        return SamplingTensors(
            temperature=arr("temperature", 0.0, "float32"),
            top_p=arr("top_p", 1.0, "float32"),
            top_k=arr("top_k", -1, "int32"),
            min_p=arr("min_p", 0.0, "float32"),
            repetition_penalty=arr("repetition_penalty", 1.0, "float32"),
            presence_penalty=arr("presence_penalty", 0.0, "float32"),
            frequency_penalty=arr("frequency_penalty", 0.0, "float32"),
            seed=arr("seed", -1, "int32"),
            bias_idx=jnp.asarray(bias_idx),
            bias_val=jnp.asarray(bias_val),
        )

    @staticmethod
    def any_penalties(params_list) -> bool:
        return any(
            p is not None and (p.repetition_penalty != 1.0
                               or p.presence_penalty != 0.0
                               or p.frequency_penalty != 0.0)
            for p in params_list)


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


def apply_logit_bias(logits: jax.Array, t: SamplingTensors) -> jax.Array:
    """OpenAI-style per-request logit_bias (sparse add; pad index drops)."""
    S, V = logits.shape
    rows = jnp.arange(S)[:, None]
    return logits.at[rows, t.bias_idx].add(t.bias_val, mode="drop")


def compute_logprobs(
    logits: jax.Array,      # [S, V] f32 (pre-temperature, post-penalty)
    chosen: jax.Array,      # [S] i32 sampled token ids
    top_n: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(chosen_logprob [S], top_vals [S, top_n], top_ids [S, top_n]).
    Matches the reference sampler's logprobs semantics (log-softmax of the
    full processed logits, reference layers/sampler.py)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    chosen_lp = jnp.take_along_axis(lp, chosen[:, None], axis=-1)[:, 0]
    top_vals, top_ids = jax.lax.top_k(lp, top_n)
    return chosen_lp, top_vals, top_ids.astype(jnp.int32)


def typical_accept_mask(probs: jax.Array, proposals: jax.Array,
                        posterior_threshold: float,
                        posterior_alpha: float) -> jax.Array:
    """Typical-acceptance rule (reference
    typical_acceptance_sampler.py _evaluate_accepted_tokens, Medusa
    3.3.1): accept proposal t iff
    p(t) > min(posterior_threshold, alpha * exp(-H(p))).

    probs [..., V] target probabilities, proposals [...] i32 token ids;
    returns a boolean mask of the same leading shape.
    """
    pf = probs.astype(jnp.float32)
    cand = jnp.take_along_axis(pf, proposals[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    entropy = -jnp.sum(pf * jnp.log(pf + 1e-5), axis=-1)
    threshold = jnp.minimum(posterior_threshold,
                            posterior_alpha * jnp.exp(-entropy))
    return cand > threshold


def sample(
    logits: jax.Array,  # [S, V] f32
    t: SamplingTensors,
    rng: jax.Array,     # jax PRNG key
    token_counts: Optional[jax.Array] = None,
    prompt_mask: Optional[jax.Array] = None,
    greedy_only: bool = False,
    positions: Optional[jax.Array] = None,  # [S] i32 (for seeded sampling)
    use_seeds: bool = False,
    pre_processed: bool = False,
) -> jax.Array:
    """Returns sampled token ids [S] i32. greedy_only is a static fast path
    (skips the full-vocab sorts, which dominate small-batch decode steps).
    pre_processed=True means penalties/logit_bias were already applied."""
    S, V = logits.shape
    if not pre_processed:
        if token_counts is not None:
            logits = apply_penalties(logits, token_counts, prompt_mask, t)
        logits = apply_logit_bias(logits, t)

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

    # top-p over the TOP-K-FILTERED renormalized distribution (reference
    # sampler.py:418-438 masks top-k in the sorted logits before the
    # top-p softmax; computing it on the unmasked distribution makes
    # top-p a no-op whenever the top-k set holds less than top_p mass)
    sorted_masked = jnp.where(sorted_desc < kth, NEG_INF, sorted_desc)
    probs_sorted = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # smallest set with cumulative prob >= top_p: cut where the cumulative
    # mass before a token already reaches top_p
    cut = (cum - probs_sorted) >= t.top_p[:, None]
    cutoff = jnp.where(cut, -jnp.inf, sorted_masked).min(axis=-1,
                                                         keepdims=True)
    cutoff = jnp.where(jnp.isfinite(cutoff), cutoff, NEG_INF)
    scaled = jnp.where(scaled < cutoff, NEG_INF, scaled)

    # min-p: drop tokens below min_p * max prob
    probs = jax.nn.softmax(scaled, axis=-1)
    pmax = probs.max(axis=-1, keepdims=True)
    scaled = jnp.where(probs < t.min_p[:, None] * pmax, NEG_INF, scaled)

    # Gumbel-argmax sampling (== categorical). Seeded rows draw their noise
    # from a (seed, position)-derived key so a seeded request reproduces
    # exactly regardless of batch composition or multi-step phase.
    g_shared = jax.random.gumbel(rng, (S, V))
    if use_seeds and positions is not None:
        def row_gumbel(seed, pos):
            key = jax.random.fold_in(
                jax.random.PRNGKey(jnp.maximum(seed, 0)), pos)
            return jax.random.gumbel(key, (V,))

        g_seeded = jax.vmap(row_gumbel)(t.seed, positions)
        g = jnp.where((t.seed >= 0)[:, None], g_seeded, g_shared)
    else:
        g = g_shared
    sampled = jnp.argmax(scaled + g, axis=-1).astype(jnp.int32)
    return jnp.where(t.temperature == 0.0, greedy, sampled)
