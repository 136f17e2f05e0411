"""Sampled (temperature>0) speculative decoding: the rejection-sampling
verify (engine/programs.py _build_verify sampled=True) must preserve the
target sampling distribution. Our proposers are deterministic (one-hot
draft distribution), for which the reference's modified rejection sampling
(vllm/model_executor/layers/rejection_sampler.py) is EXACTLY equivalent to
drawing x ~ q with the decode path's (seed, position)-keyed noise and
accepting while x matches the proposal — so a SEEDED request's output
stream must be token-identical with and without speculation. That
exact-match-on-seeded-streams property is the statistical contract
(VERDICT r03 item 3) and what these tests assert.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import SpeculativeConfig
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)


def _engine(params, spec_tokens, compression=False, method="ngram"):
    cfg = tiny_cfg(compression_interval=4 if compression else 16)
    cfg.speculative = SpeculativeConfig(
        num_speculative_tokens=spec_tokens, method=method)
    if not compression:
        cfg.kvcompress.enabled = False
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    eng.multi_step = 1
    return eng


def _gen(eng, reqs):
    rids = []
    for prompt, sp in reqs:
        rids.append(eng.add_request(None, prompt_token_ids=prompt,
                                    sampling_params=sp))
    outs = run_all(eng)
    return [outs[r].outputs[0].token_ids for r in rids]


def _rep_prompt(seed, n=20):
    rng = np.random.default_rng(seed)
    pattern = rng.integers(0, VOCAB, size=5).tolist()
    return (pattern * 5)[:n]


def test_seeded_sampled_stream_matches_nonspec(params):
    """temperature>0 + seed: spec output == non-spec output, token for
    token (the rejection-sampling coupling reproduces the decode
    sampler's (seed, position)-keyed draws exactly)."""
    prompt = _rep_prompt(0)
    for seed, temp, top_p, top_k in [(7, 0.8, 1.0, -1), (11, 1.3, 0.9, 8),
                                     (13, 0.6, 0.95, -1)]:
        sp = lambda: SamplingParams(  # noqa: E731
            temperature=temp, top_p=top_p, top_k=top_k, seed=seed,
            max_tokens=18, ignore_eos=True)
        plain = _gen(_engine(params, 0), [(prompt, sp())])[0]
        spec = _gen(_engine(params, 3), [(prompt, sp())])[0]
        assert spec == plain, (seed, temp)


def test_seeded_sampled_spec_accepts_tokens(params):
    """The sampled verify actually accepts proposals on repetitive text
    (otherwise it silently degenerates to one-token-per-round)."""
    prompt = _rep_prompt(1, n=25)
    eng = _engine(params, 3)
    # acceptance probability is q(proposal): the untrained tiny model is
    # near-uniform, so only a near-greedy temperature concentrates q
    # enough for ngram proposals to be accepted deterministically-ish
    sp = SamplingParams(temperature=0.02, seed=3, max_tokens=24,
                        ignore_eos=True)
    _gen(eng, [(prompt, sp)])
    assert eng.stats.counters.get("spec_accepted_tokens", 0) > 0
    # rollback accounting survives sampled rejections
    assert eng.scheduler.free_blocks == eng.scheduler.total_blocks


def test_mixed_greedy_and_sampled_batch(params):
    """Greedy rows in a sampled-verify batch still match the plain greedy
    stream (temperature==0 rows reduce to argmax inside sample())."""
    p_greedy = _rep_prompt(2)
    p_sampled = _rep_prompt(3)
    sp_g = lambda: SamplingParams(temperature=0.0, max_tokens=16,  # noqa
                                  ignore_eos=True)
    sp_s = lambda: SamplingParams(temperature=0.9, seed=5,  # noqa
                                  max_tokens=16, ignore_eos=True)
    plain_g = _gen(_engine(params, 0), [(p_greedy, sp_g())])[0]
    plain_s = _gen(_engine(params, 0), [(p_sampled, sp_s())])[0]
    both = _gen(_engine(params, 3), [(p_greedy, sp_g()),
                                     (p_sampled, sp_s())])
    assert both[0] == plain_g
    assert both[1] == plain_s


def test_sampled_spec_with_compression(params):
    """Sampled spec + KVC compression coexist; seeded stream still matches
    the non-spec compressed run (same cache state evolution)."""
    prompt = _rep_prompt(4, n=25)
    sp = lambda: SamplingParams(  # noqa: E731
        temperature=0.7, seed=9, max_tokens=16, ignore_eos=True,
        target_compression_rate=0.6, protected_window_size=8)
    plain = _gen(_engine(params, 0, compression=True), [(prompt, sp())])[0]
    eng = _engine(params, 3, compression=True)
    spec = _gen(eng, [(prompt, sp())])[0]
    assert spec == plain
    assert eng.scheduler.total_evicted_kvs > 0


def _typical_engine(params, spec_tokens, thr=0.09, alpha=0.3):
    cfg = tiny_cfg(compression_interval=16)
    cfg.kvcompress.enabled = False
    cfg.speculative = SpeculativeConfig(
        num_speculative_tokens=spec_tokens,
        acceptance_method="typical_acceptance_sampler",
        typical_acceptance_sampler_posterior_threshold=thr,
        typical_acceptance_sampler_posterior_alpha=alpha)
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    eng.multi_step = 1
    return eng


def test_typical_acceptance_temp0_degenerates_to_greedy(params):
    """temperature==0 rows make p_target one-hot, so the typical rule
    reduces to greedy equality: output must match the plain greedy
    stream exactly (logit_bias forces the sampled verify variant so the
    typical program actually runs)."""
    prompt = _rep_prompt(2)
    bias = {3: 1.5}
    sp = lambda: SamplingParams(  # noqa: E731
        temperature=0.0, logit_bias=dict(bias), max_tokens=16,
        ignore_eos=True)
    plain = _gen(_engine(params, 0), [(prompt, sp())])[0]
    typ = _gen(_typical_engine(params, 3), [(prompt, sp())])[0]
    assert typ == plain


def test_typical_accept_mask_matches_torch_oracle():
    """The acceptance rule matches an independent torch implementation
    of the reference formula (typical_acceptance_sampler.py
    _evaluate_accepted_tokens), including the 1e-5 entropy epsilon."""
    import torch
    import jax.numpy as jnp
    from kvcompress_tpu.engine.sampler import typical_accept_mask

    rng = np.random.default_rng(9)
    B, K, V = 4, 3, 32
    logits = rng.normal(scale=3.0, size=(B, K, V)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    proposals = rng.integers(0, V, size=(B, K)).astype(np.int32)
    thr_eps, alpha = 0.09, 0.3

    tp = torch.tensor(probs)
    cand = torch.gather(tp, dim=-1,
                        index=torch.tensor(proposals)[..., None].long()
                        ).squeeze(-1)
    ent = -torch.sum(tp * torch.log(tp + 1e-5), dim=-1)
    thr = torch.minimum(torch.full_like(ent, thr_eps),
                        torch.exp(-ent) * alpha)
    ref = (cand > thr).numpy()

    ours = np.asarray(typical_accept_mask(
        jnp.asarray(probs), jnp.asarray(proposals), thr_eps, alpha))
    np.testing.assert_array_equal(ours, ref)
    assert ref.any() and not ref.all()  # the case exercises both sides


def test_typical_acceptance_serves_sampled_requests(params):
    """Engine smoke at temperature>0: the typical variant compiles,
    serves, and emits max_tokens per request (its acceptances and
    recovery tokens keep the stream flowing)."""
    prompt = _rep_prompt(3, n=25)
    eng = _typical_engine(params, 3)
    sp = SamplingParams(temperature=1.0, max_tokens=16, ignore_eos=True)
    out = _gen(eng, [(prompt, sp)])[0]
    assert len(out) == 16


def test_typical_acceptance_emits_accepted_proposals(params):
    """Accepted positions must emit the PROPOSAL token, not the target
    argmax (reference spec_decode_base_sampler._create_output emits
    draft_token_ids at accepted slots): typical acceptance admits
    non-argmax proposals while the cache keeps the proposal KVs, so
    emitting argmax would diverge the token history from the cached
    sequence state. The invariant is checked directly on the verify
    program's packed output: for every verify call, the first
    (n_out - 1) emitted tokens of each row must equal the row's
    accepted proposals (tokens[1 : n_out]). A huge temperature
    flattens p_target so the entropy threshold accepts near-uniform
    ngram proposals that are rarely the argmax."""
    prompt = _rep_prompt(6, n=25)
    eng = _typical_engine(params, 3)
    orig_verify = eng.programs.verify
    accepted_total = 0
    mismatches = []

    def spy(state, tokens_np, positions_np, active_np, Q, st=None,
            rng=None):
        nonlocal accepted_total
        out = orig_verify(state, tokens_np, positions_np, active_np, Q,
                          st=st, rng=rng)
        packed = np.asarray(out[1])
        S = len(active_np)
        emit = packed[:S * Q].reshape(S, Q)
        n_out = packed[S * Q:S * Q + S]
        for s in range(S):
            if not active_np[s]:
                continue
            acc = int(n_out[s]) - 1
            accepted_total += max(acc, 0)
            for i in range(acc):
                if int(emit[s, i]) != int(tokens_np[s, 1 + i]):
                    mismatches.append(
                        (s, i, int(emit[s, i]), int(tokens_np[s, 1 + i])))
        return out

    eng.programs.verify = spy
    sp = SamplingParams(temperature=100.0, max_tokens=12, ignore_eos=True)
    _gen(eng, [(prompt, sp)])
    assert accepted_total > 0  # the threshold actually accepted proposals
    assert not mismatches, mismatches[:5]


def test_unknown_acceptance_method_rejected(params):
    prompt = _rep_prompt(4)
    cfg = tiny_cfg()
    cfg.kvcompress.enabled = False
    cfg.speculative = SpeculativeConfig(
        num_speculative_tokens=3, acceptance_method="nope")
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    eng.multi_step = 1
    sp = SamplingParams(temperature=0.9, max_tokens=8, ignore_eos=True)
    with pytest.raises(ValueError, match="acceptance_method"):
        _gen(eng, [(prompt, sp)])


@pytest.mark.full
def test_unseeded_sampled_distribution_chi2(params):
    """Unseeded rows: first-token distribution over repeated spec runs
    matches the non-spec sampler's distribution (chi-square on the
    top-token frequencies; both draw from the same processed q)."""
    prompt = _rep_prompt(5)

    def first_tokens(spec_tokens, n_runs, seed0):
        toks = []
        for i in range(n_runs):
            cfg = tiny_cfg()
            cfg.kvcompress.enabled = False
            cfg.seed = seed0 + i  # fresh engine rng per run
            cfg.speculative = SpeculativeConfig(
                num_speculative_tokens=spec_tokens)
            eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
            eng.multi_step = 1
            sp = SamplingParams(temperature=1.0, max_tokens=3,
                                ignore_eos=True)
            toks.append(_gen(eng, [(prompt, sp)])[0][1])
        return toks

    n = 60
    a = first_tokens(0, n, 1000)
    b = first_tokens(3, n, 5000)
    support = sorted(set(a) | set(b))
    fa = np.array([a.count(t) for t in support], float)
    fb = np.array([b.count(t) for t in support], float)
    # two-sample chi-square with pooled expectation; generous threshold
    # (this is a smoke-level distribution check; the seeded exact-match
    # tests above are the strict contract)
    pooled = (fa + fb) / 2.0
    mask = pooled >= 3
    if mask.sum() >= 2:
        chi2 = float((((fa - pooled) ** 2 + (fb - pooled) ** 2)
                      / np.maximum(pooled, 1e-9))[mask].sum())
        dof = int(mask.sum()) - 1
        # P(chi2 > dof + 4*sqrt(2*dof)) is tiny; flags gross mismatches
        assert chi2 < dof + 4.0 * np.sqrt(2.0 * dof) + 8.0, (chi2, dof)
