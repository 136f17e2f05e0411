"""Pipelined decode (burst N+1 dispatched before burst N is collected) must
produce exactly the same outputs as the synchronous path, across finishes,
compression rounds, and continuous batching."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)


def _run(params, pipeline: bool, n_seqs=5, interval=4):
    cfg = tiny_cfg(compression_interval=interval, max_num_seqs=3)
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    eng.multi_step = 3
    eng.pipeline_decode = pipeline
    rng = np.random.default_rng(7)
    rids = []
    for i in range(n_seqs):
        prompt = rng.integers(0, VOCAB,
                              size=int(rng.integers(5, 18))).tolist()
        rids.append(eng.add_request(
            None, prompt_token_ids=prompt,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=6 + i, ignore_eos=True,
                target_compression_rate=0.7, protected_window_size=4)))
    outs = run_all(eng)
    assert eng._pending is None
    return {r: outs[r].outputs[0].token_ids for r in rids}


def test_pipelined_matches_sync(params):
    sync = _run(params, pipeline=False)
    piped = _run(params, pipeline=True)
    assert piped == sync


def test_pipelined_with_eos(params):
    cfg = tiny_cfg()
    cfg.kvcompress.enabled = False
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, VOCAB, size=8).tolist()

    def run_one(pipeline):
        eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
        eng.multi_step = 4
        eng.pipeline_decode = pipeline
        base = eng.add_request(None, prompt_token_ids=prompt,
                               sampling_params=SamplingParams(
                                   temperature=0.0, max_tokens=12,
                                   ignore_eos=True))
        out = run_all(eng)[base].outputs[0].token_ids
        # second request: EOS on the 3rd generated token
        eng2 = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
        eng2.multi_step = 4
        eng2.pipeline_decode = pipeline
        eng2.eos_token_ids = {out[2]}
        rid = eng2.add_request(None, prompt_token_ids=prompt,
                               sampling_params=SamplingParams(
                                   temperature=0.0, max_tokens=12))
        return run_all(eng2)[rid].outputs[0].token_ids

    assert run_one(True) == run_one(False)


def test_abort_with_pending_burst(params):
    """Aborting a request while a burst is in flight must collect cleanly
    and free its slot."""
    from kvcompress_tpu.sampling_params import SamplingParams as SP
    cfg = tiny_cfg()
    cfg.kvcompress.enabled = False
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    eng.multi_step = 4
    eng.pipeline_decode = True
    rng = np.random.default_rng(11)
    r1 = eng.add_request(None, prompt_token_ids=rng.integers(
        0, VOCAB, size=8).tolist(),
        sampling_params=SP(temperature=0.0, max_tokens=40, ignore_eos=True))
    r2 = eng.add_request(None, prompt_token_ids=rng.integers(
        0, VOCAB, size=8).tolist(),
        sampling_params=SP(temperature=0.0, max_tokens=40, ignore_eos=True))
    for _ in range(4):
        eng.step()
    eng.abort_request(r1)
    outs = run_all(eng)
    assert r2 in outs and len(outs[r2].outputs[0].token_ids) == 40
    assert eng._pending is None
    assert eng.scheduler.free_blocks == eng.scheduler.total_blocks


def test_bucket_growth_across_boundary(params):
    """Generation crossing attention-width bucket boundaries (power-of-two
    table slices) must stay consistent with the sync path."""
    from kvcompress_tpu.sampling_params import SamplingParams as SP
    rng = np.random.default_rng(12)
    prompt = rng.integers(0, VOCAB, size=5).tolist()

    def run_one(pipeline):
        cfg = tiny_cfg(max_model_len=64)
        cfg.kvcompress.enabled = False
        eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
        eng.multi_step = 3
        eng.pipeline_decode = pipeline
        rid = eng.add_request(None, prompt_token_ids=prompt,
                              sampling_params=SP(temperature=0.0,
                                                 max_tokens=40,
                                                 ignore_eos=True))
        return run_all(eng)[rid].outputs[0].token_ids

    assert run_one(True) == run_one(False)
