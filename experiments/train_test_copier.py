"""Train and save the filler-prefix copier used by
tests/test_compression_exactness.py.

The test asserts the reference's exactness-under-mild-compression contract
(reference tests/kvcompress/test_random_digit_repeat.py:186-232) on a model
trained to ignore a filler prefix. Training takes ~25 min on this image's
single CPU core but ~1 min on the TPU chip, so the weights are generated
here (on whatever backend is default) and committed as a small npz the test
loads; the test falls back to training in-process when the artifact is
missing.

Usage: python experiments/train_test_copier.py [--steps 2400]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2400)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "artifacts",
        "filler_copier.npz"))
    args = p.parse_args(argv)

    import jax
    from tests.test_compression_exactness import (
        _filler_batch, copier_model_config)
    from experiments.run_digit_cr_sweep import train_copy_model

    print(f"training on backend: {jax.default_backend()}")
    cfg = copier_model_config()
    cfg, params = train_copy_model(
        args.steps, seed=3, cfg=cfg, batch_fn=_filler_batch,
        batch_size=48, pad_t=160)

    from kvcompress_tpu.utils.params_io import save_params_npz
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_params_npz(args.out, params)
    meta = {"steps": args.steps, "seed": 3, "batch_size": 48, "pad_t": 160,
            "trainer": "experiments/run_digit_cr_sweep.train_copy_model",
            "batch_fn": "tests/test_compression_exactness._filler_batch"}
    with open(args.out.replace(".npz", ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    sz = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({sz:.2f} MB)")


if __name__ == "__main__":
    main()
