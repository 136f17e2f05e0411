"""CI gate on score-under-compression through the REAL LongBench pipeline.

The synthetic equivalent of the reference's LongBench contract
(/root/reference/experiments/run_longbench.py:1-184 + README.md:78-110:
KVC at mild CR holds benchmark score): export the trained filler copier
as an HF checkpoint, run experiments/run_longbench.py (engine build,
budgets, predictions jsonl), score with experiments/eval.py qa_f1, and
assert the mild-CR score stays within a small delta of uncompressed.
A regression anywhere in the metric pipeline (aggregation, GQA fold,
maxpool, sort scheduler, compaction) drags the compressed score down and
fails this gate. The wide grid lives in
experiments/run_longbench_filler.py (--grid paper); this gate is the
fast always-on slice of it.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "experiments"))


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    from tests.test_compression_exactness import _ARTIFACT
    if not os.path.exists(_ARTIFACT):
        pytest.skip("filler copier artifact missing "
                    "(experiments/train_test_copier.py)")
    import run_longbench_filler as flb
    ckpt = str(tmp_path_factory.mktemp("lb_gate_ckpt"))
    flb.prepare_checkpoint(_ARTIFACT, ckpt)
    data_dir, _rows = flb.make_dataset(ckpt, n_rows=8, seed=23,
                                       name="filler_copy_gate")
    return flb, ckpt, data_dir


def test_mild_cr_score_within_delta_of_uncompressed(pipeline):
    flb, ckpt, data_dir = pipeline
    base = flb.score_budget(ckpt, data_dir, -1, name="filler_copy_gate")
    # budget 40 = CR ~1.65 on these 66-token contexts: mild compression,
    # the digits + protected window still fit
    mild = flb.score_budget(ckpt, data_dir, 40, name="filler_copy_gate")
    assert base > 0.9, f"uncompressed pipeline broken (qa_f1={base})"
    assert mild >= base - 0.05, (base, mild)
