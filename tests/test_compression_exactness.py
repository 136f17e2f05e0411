"""Exactness under mild compression: the reference's core quality contract.

The reference asserts EXACT greedy output (and ppl < 1.01) with
target_compression_rate=0.8 compression on the random-digit-repeat task
(tests/kvcompress/test_random_digit_repeat.py:186-232, compress_once=True
default per vllm/sampling_params.py). The claim being tested is that the
eviction-metric pipeline (attention-squared aggregation, GQA fold, maxpool,
buffer-window gating, per-head sort, block-budget selection) correctly
identifies the KVs the model does NOT need.

With zero egress we construct the property synthetically: a decoder trained
to copy a digit string that is preceded by a PREFIX OF FILLER tokens from a
disjoint alphabet. The model learns to ignore the filler entirely, so the
filler KVs receive near-zero attention -> lowest metrics -> evicted first.
Evicting 20% of the compressible KVs (which is well under the filler
fraction) must then leave greedy output bit-exact. A metric-pipeline bug
(wrong head fold, misaligned maxpool, position off-by-one) would evict
digit KVs instead and break exactness, so this is a true end-to-end gate.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import (CacheConfig, EngineConfig, KVCompressConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.sampling_params import SamplingParams

VOCAB = 256
SEP, BOS = 10, 11
DIGIT_LO, DIGIT_HI = 12, 200   # copyable symbols
FILLER_LO, FILLER_HI = 200, 256  # ignored symbols (disjoint alphabet)
N_DIGITS = 32                  # digits per eval prompt
N_FILLER = 32                  # filler prefix per eval prompt
PAD_T = 160


def _filler_batch(rng, B, T):
    """[BOS] filler*f digits [SEP] digits, loss on the repeated digits."""
    toks = np.zeros((B, T), np.int64)
    w = np.zeros((B, T), np.float32)
    for b in range(B):
        f = int(rng.integers(12, N_FILLER + 9))
        n = int(rng.integers(8, N_DIGITS + 9))
        filler = rng.integers(FILLER_LO, FILLER_HI, size=f)
        d = rng.choice(DIGIT_HI - DIGIT_LO, size=n, replace=False) + DIGIT_LO
        seq = np.concatenate([[BOS], filler, d, [SEP], d])
        toks[b, :len(seq)] = seq
        w[b, 1 + f + n + 1:len(seq)] = 1.0
    return toks, w


def copier_model_config():
    return ModelConfig(
        num_layers=2, num_heads=4, num_kv_heads=4, head_size=32,
        hidden_size=128, intermediate_size=256, vocab_size=VOCAB,
        max_model_len=PAD_T + 32, rope_theta=10000.0,
        tie_word_embeddings=True, dtype="float32")


# ---- LONG-context copier (paper-grid CR sweep, experiments/
# run_longbench_filler.py --grid paper): same arch, contexts up to ~1.9k
# tokens so CR=64 budgets still hold the answer digits + window ----
LONG_PAD_T = 1984


def long_copier_model_config():
    cfg = copier_model_config()
    import dataclasses
    return dataclasses.replace(cfg, max_model_len=LONG_PAD_T + 64)


def _long_filler_batch(rng, B, T):
    """Filler length sampled across the whole long range so the copier
    learns to ignore arbitrarily long prefixes (same task as
    _filler_batch, stretched)."""
    toks = np.zeros((B, T), np.int64)
    w = np.zeros((B, T), np.float32)
    for b in range(B):
        n = int(rng.integers(8, 41))
        f = int(rng.integers(100, T - 2 * n - 2))
        filler = rng.integers(FILLER_LO, FILLER_HI, size=f)
        d = rng.choice(DIGIT_HI - DIGIT_LO, size=n, replace=False) \
            + DIGIT_LO
        seq = np.concatenate([[BOS], filler, d, [SEP], d])
        toks[b, :len(seq)] = seq
        w[b, 1 + f + n + 1:len(seq)] = 1.0
    return toks, w


_ARTIFACT_LONG = os.path.join(os.path.dirname(__file__), "artifacts",
                              "filler_copier_long.npz")


_ARTIFACT = os.path.join(os.path.dirname(__file__), "artifacts",
                         "filler_copier.npz")


@pytest.fixture(scope="module")
def copier():
    """Decoder trained on the filler-prefix copy task. Loads the committed
    artifact (experiments/train_test_copier.py) when present - training
    takes ~25 min on this image's single CPU core - and falls back to
    training in-process otherwise."""
    cfg = copier_model_config()
    if os.path.exists(_ARTIFACT):
        from kvcompress_tpu.utils.params_io import load_params_npz
        return cfg, load_params_npz(_ARTIFACT)
    from experiments.run_digit_cr_sweep import train_copy_model
    cfg, params = train_copy_model(
        2400, seed=3, cfg=cfg, batch_fn=_filler_batch, batch_size=48,
        pad_t=PAD_T)
    return cfg, params


def make_engine(cfg, params, **kvc_kw):
    ecfg = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, cache_dtype="float32"),
        kvcompress=KVCompressConfig(
            compression_interval=4, max_kv_per_compression=1 << 18,
            max_cache_moves_per_compression=1 << 14, **kvc_kw),
        scheduler=SchedulerConfig(max_num_seqs=8,
                                  max_model_len=cfg.max_model_len,
                                  prefill_buckets=(PAD_T,)),
        parallel=ParallelConfig(),
    )
    return LLMEngine(ecfg, params, num_blocks=8192, attn_impl="xla")


def _prompts(n_prompts, seed=7):
    rng = np.random.default_rng(seed)
    prompts, expected = [], []
    for _ in range(n_prompts):
        filler = rng.integers(FILLER_LO, FILLER_HI, size=N_FILLER)
        d = (rng.choice(DIGIT_HI - DIGIT_LO, size=N_DIGITS, replace=False)
             + DIGIT_LO)
        prompts.append([BOS] + filler.tolist() + d.tolist() + [SEP])
        expected.append(d.tolist())
    return prompts, expected


def _generate(eng, prompts, **sp_kw):
    rids = []
    for i, p in enumerate(prompts):
        rids.append(eng.add_request(
            str(i), prompt_token_ids=p,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=N_DIGITS, ignore_eos=True,
                **sp_kw)))
    outs = {}
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                outs[out.request_id] = out
    return [outs[r].outputs[0].token_ids[:N_DIGITS] for r in rids]


def test_exact_match_under_mild_compression(copier):
    """The reference contract (test_random_digit_repeat.py:186-232): greedy
    output with target_compression_rate=0.8 (evict 20% of compressible KVs,
    once) is IDENTICAL to the uncompressed output."""
    cfg, params = copier
    prompts, expected = _prompts(8)

    base = _generate(make_engine(cfg, params), prompts)
    # the ceiling must be exact or the test is meaningless
    assert base == expected, "trained copier is not exact uncompressed"

    eng = make_engine(cfg, params)
    got = _generate(
        eng, prompts,
        target_compression_rate=0.8, protected_window_size=40,
        metric_collection_buffer_size=10, compress_once=True)
    assert eng.scheduler.total_evicted_kvs > 0, "compression never ran"
    n_exact = sum(g == e for g, e in zip(got, expected))
    assert n_exact == len(expected), (
        f"only {n_exact}/{len(expected)} exact under 0.8-rate compression; "
        f"first mismatch: {next((g, e) for g, e in zip(got, expected) if g != e)}"
    )


def test_exact_match_under_continual_compression(copier):
    """Stronger than the reference: CONTINUAL recompression (compress_once=
    False) at rate 0.8 also preserves exactness - each round's evictions
    keep landing on filler because the protected window covers the
    generation and the digit metrics stay dominant."""
    cfg, params = copier
    prompts, expected = _prompts(8, seed=11)
    eng = make_engine(cfg, params)
    got = _generate(
        eng, prompts,
        target_compression_rate=0.8, protected_window_size=40,
        metric_collection_buffer_size=10, compress_once=False)
    assert eng.scheduler.total_evicted_kvs > 0
    acc = np.mean([
        sum(a == b for a, b in zip(g, e)) / len(e)
        for g, e in zip(got, expected)])
    # continual 0.8-rate compounds; exactness may degrade slightly but the
    # metric pipeline must keep the copy mechanism intact
    assert acc >= 0.97, f"token accuracy {acc:.3f} under continual 0.8-rate"


def test_filler_evicted_before_digits(copier):
    """Mechanism check: after compression, surviving KV positions should
    exclude filler positions (1..N_FILLER) far more often than digit
    positions - i.e. the metric ranking actually found the redundant KVs."""
    cfg, params = copier
    prompts, _ = _prompts(4, seed=13)
    eng = make_engine(cfg, params)
    rids = []
    for i, p in enumerate(prompts):
        rids.append(eng.add_request(
            str(i), prompt_token_ids=p,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=N_DIGITS, ignore_eos=True,
                target_compression_rate=0.8, protected_window_size=40,
                metric_collection_buffer_size=10, compress_once=True)))
    for _ in range(16):  # enough steps to trigger compression
        eng.step()
    assert eng.has_unfinished_requests()
    eng._flush_pending()
    assert eng.scheduler.total_evicted_kvs > 0, "compression never ran"

    st = eng.state
    L, S, H, Bmax = st.block_tables.shape
    bs = st.block_size
    phys = (np.asarray(st.block_tables)[..., None] * bs
            + np.arange(bs)).reshape(L, S, H, Bmax * bs)
    pos = np.asarray(st.kv_positions).reshape(-1)[phys]
    ctx = np.asarray(st.context_lens)
    valid = np.arange(Bmax * bs)[None, None, None, :] < ctx[..., None]
    surviving = pos[valid]
    filler_surv = ((surviving >= 1) & (surviving <= N_FILLER)).sum()
    digit_surv = ((surviving > N_FILLER)
                  & (surviving <= N_FILLER + N_DIGITS)).sum()
    n_seqs = len(prompts)
    filler_total = N_FILLER * L * H * n_seqs
    digit_total = N_DIGITS * L * H * n_seqs
    filler_frac = filler_surv / filler_total
    digit_frac = digit_surv / digit_total
    # evictions concentrate on filler: digits survive (almost) untouched
    assert digit_frac > 0.98, f"digit survival {digit_frac:.3f}"
    assert filler_frac < digit_frac - 0.1, (
        f"filler {filler_frac:.3f} vs digit {digit_frac:.3f}")
