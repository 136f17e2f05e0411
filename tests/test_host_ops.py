"""Native host ops (csrc/kvc_host.cpp) vs their Python fallbacks."""

import numpy as np
import pytest

from kvcompress_tpu.utils import host_ops


def _scan_py(*args):
    lib = host_ops._LIB
    host_ops._LIB = None
    tried = host_ops._TRIED
    host_ops._TRIED = True
    try:
        return host_ops.scan_stops(*args)
    finally:
        host_ops._LIB = lib
        host_ops._TRIED = tried


def test_native_library_builds():
    assert host_ops.native_available(), "g++ build of kvc_host.cpp failed"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_stops_matches_python(seed):
    rng = np.random.default_rng(seed)
    k, S, V = 8, 16, 50
    tokens = rng.integers(0, V, size=(k, S)).astype(np.int32)
    eos_ids = [2, 7]
    stop_ids = [rng.integers(0, V, size=rng.integers(0, 3)).tolist()
                for _ in range(S)]
    ignore_eos = rng.integers(0, 2, size=S).astype(np.uint8)
    budget = rng.integers(1, k + 3, size=S).astype(np.int32)
    min_left = rng.integers(0, 4, size=S).astype(np.int32)
    active = rng.integers(0, 2, size=S).astype(np.uint8)

    args = (tokens, eos_ids, stop_ids, ignore_eos, budget, min_left, active)
    a_n, r_n = host_ops.scan_stops(*args)
    a_p, r_p = _scan_py(*args)
    np.testing.assert_array_equal(a_n, a_p)
    np.testing.assert_array_equal(r_n, r_p)


def test_ngram_propose():
    # history: ... 5 6 7 9 9 1 5 6 7  -> suffix (5 6 7) matched earlier,
    # followed by 9 9 -> propose [9, 9, 1]
    ctx = [3, 5, 6, 7, 9, 9, 1, 5, 6, 7]
    out = host_ops.ngram_propose(ctx, min_gram=1, max_gram=4, k=3)
    assert out == [9, 9, 1]
    # no repeat -> no proposal
    assert host_ops.ngram_propose([1, 2, 3, 4, 5], 2, 4, 3) == []


def test_ngram_propose_fallback_matches():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = rng.integers(4, 40)
        ctx = rng.integers(0, 5, size=n).tolist()
        native = host_ops.ngram_propose(ctx, 1, 4, 4)
        lib = host_ops._LIB
        host_ops._LIB = None
        host_ops._TRIED = True
        try:
            fallback = host_ops.ngram_propose(ctx, 1, 4, 4)
        finally:
            host_ops._LIB = lib
            host_ops._TRIED = True
        assert native == fallback, (ctx, native, fallback)
