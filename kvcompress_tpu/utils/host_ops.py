"""ctypes bindings for the native host-side ops (csrc/kvc_host.cpp).

Lazy build: compiles the shared library with the system C++ toolchain on
first use into a build cache keyed by the SOURCE HASH (never a pre-built
binary - nothing opaque is loaded, and edits always trigger a rebuild);
every entry point has a pure NumPy/Python fallback so the engine works
without a compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _csrc_dir() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "csrc")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    from kvcompress_tpu import envs
    if envs.KVC_DISABLE_NATIVE:
        return None
    src = os.path.join(_csrc_dir(), "kvc_host.cpp")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        build_dir = os.path.join(_csrc_dir(), ".build")
        so = os.path.join(build_dir, f"libkvc_host-{digest}.so")
        if not os.path.exists(so):
            os.makedirs(build_dir, exist_ok=True)
            tmp = so + f".tmp.{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True)
            os.replace(tmp, so)  # atomic: concurrent builders race safely
        lib = ctypes.CDLL(so)
        lib.scan_stops.restype = None
        lib.ngram_propose.restype = ctypes.c_int
        lib.count_tokens.restype = None
        _LIB = lib
    except (OSError, subprocess.CalledProcessError):
        _LIB = None
    return _LIB


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def scan_stops(tokens: np.ndarray, eos_ids: Sequence[int],
               stop_ids_per_seq: List[Sequence[int]],
               ignore_eos: np.ndarray, budget: np.ndarray,
               min_left: np.ndarray, active: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
    """tokens [k, S] i32 -> (accept [S] i32, reason [S] i32)."""
    k, S = tokens.shape
    lib = _load()
    if lib is not None:
        tokens = np.ascontiguousarray(tokens, np.int32)
        eos = np.asarray(list(eos_ids), np.int32)
        flat = []
        offs = [0]
        for ids in stop_ids_per_seq:
            flat.extend(ids or ())
            offs.append(len(flat))
        flat_a = np.asarray(flat or [0], np.int32)
        offs_a = np.asarray(offs, np.int32)
        accept = np.zeros((S,), np.int32)
        reason = np.zeros((S,), np.int32)
        lib.scan_stops(
            _ptr(tokens), k, S, _ptr(eos), len(eos), _ptr(flat_a),
            _ptr(offs_a),
            np.ascontiguousarray(ignore_eos, np.uint8).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            _ptr(np.ascontiguousarray(budget, np.int32)),
            _ptr(np.ascontiguousarray(min_left, np.int32)),
            np.ascontiguousarray(active, np.uint8).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            _ptr(accept), _ptr(reason))
        return accept, reason
    # fallback
    accept = np.zeros((S,), np.int32)
    reason = np.zeros((S,), np.int32)
    eos_set = set(eos_ids)
    for s in range(S):
        if not active[s]:
            continue
        stops = set(stop_ids_per_seq[s] or ())
        for t in range(k):
            tok = int(tokens[t, s])
            accept[s] = t + 1
            past_min = (t + 1) >= min_left[s]
            if past_min and ((tok in eos_set and not ignore_eos[s])
                             or tok in stops):
                reason[s] = 1
                break
            if t + 1 >= budget[s]:
                reason[s] = 2
                break
    return accept, reason


def ngram_propose(ctx: Sequence[int], min_gram: int, max_gram: int,
                  k: int) -> List[int]:
    """Longest-suffix n-gram continuation proposal from the token history."""
    arr = np.asarray(ctx, np.int32)
    lib = _load()
    if lib is not None:
        out = np.zeros((k,), np.int32)
        n = lib.ngram_propose(_ptr(arr), len(arr), min_gram, max_gram, k,
                              _ptr(out))
        return out[:n].tolist()
    # fallback
    n = len(arr)
    for g in range(max_gram, min_gram - 1, -1):
        if g >= n:
            continue
        suffix = arr[n - g:]
        for start in range(n - g - 1, -1, -1):
            if np.array_equal(arr[start:start + g], suffix):
                follow = arr[start + g:n - g][:k]
                if len(follow):
                    return follow.tolist()
                break
    return []


def native_available() -> bool:
    return _load() is not None
