"""Flat-npz (de)serialization of a decoder param pytree.

One canonical round-trip for the trained-weight artifacts the tests and
experiments share (tests/artifacts/filler_copier.npz etc.): top-level
leaves keep their names, layer-stacked leaves are prefixed "layers.".
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def save_params_npz(path: str, params: Dict[str, Any],
                    compressed: bool = True) -> None:
    flat = {}
    for k, v in params.items():
        if k == "layers":
            for lk, lv in v.items():
                flat[f"layers.{lk}"] = np.asarray(lv, np.float32)
        else:
            flat[k] = np.asarray(v, np.float32)
    (np.savez_compressed if compressed else np.savez)(path, **flat)


def load_params_npz(path: str, dtype=None) -> Dict[str, Any]:
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    f = np.load(path)
    params: Dict[str, Any] = {"layers": {}}
    for k in f.files:
        v = jnp.asarray(f[k], dtype)
        if k.startswith("layers."):
            params["layers"][k[len("layers."):]] = v
        else:
            params[k] = v
    return params
