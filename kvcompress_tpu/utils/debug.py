"""Debug tensor checkpointer: record/replay equality bridge.

The role of reference vllm/debug.py:27-111 (CHECKPOINTER): named, counted
tensor dumps with a manifest; save mode writes .npy files, validate mode
asserts exact equality against a previously recorded run - the mechanism the
reference uses to prove engine/implementation parity
(tests/kvcompress/test_random_digit_repeat.py:72-177).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import numpy as np


class Checkpointer:
    def __init__(self):
        from kvcompress_tpu import envs
        self.save_dir: Optional[str] = envs.KVC_SAVE_CHECKPOINT or None
        self.load_dir: Optional[str] = envs.KVC_LOAD_CHECKPOINT or None
        self._counts: Dict[str, int] = {}
        self._manifest: Dict[str, int] = {}
        self.condition: Callable[[], bool] = lambda: True
        self.mismatches: int = 0
        if self.load_dir:
            self._load_manifest()

    def configure(self, save_dir: Optional[str] = None,
                  load_dir: Optional[str] = None) -> None:
        self.save_dir = save_dir
        self.load_dir = load_dir
        self._counts.clear()
        if load_dir:
            self._load_manifest()

    def _load_manifest(self):
        path = os.path.join(self.load_dir, "manifest.json")
        with open(path) as f:
            self._manifest = json.load(f)

    @property
    def enabled(self) -> bool:
        return bool(self.save_dir or self.load_dir)

    def checkpoint(self, name: str, tensor) -> None:
        """Save or validate one named tensor occurrence."""
        if not self.enabled or not self.condition():
            return
        arr = np.asarray(tensor)
        idx = self._counts.get(name, 0)
        self._counts[name] = idx + 1
        fname = f"{name}.{idx}.npy"
        if self.save_dir:
            os.makedirs(self.save_dir, exist_ok=True)
            np.save(os.path.join(self.save_dir, fname), arr)
            self._manifest[name] = self._counts[name]
            with open(os.path.join(self.save_dir, "manifest.json"),
                      "w") as f:
                json.dump(self._manifest, f)
        elif self.load_dir:
            ref = np.load(os.path.join(self.load_dir, fname))
            if not np.array_equal(ref, arr):
                self.mismatches += 1
                raise AssertionError(
                    f"checkpoint mismatch at {name}[{idx}]: "
                    f"max |diff| = "
                    f"{np.abs(ref.astype(np.float64) - arr.astype(np.float64)).max()}")


CHECKPOINTER = Checkpointer()
