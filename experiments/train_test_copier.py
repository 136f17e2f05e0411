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
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--long", action="store_true",
                   help="train the LONG-context copier (contexts to ~1.9k "
                        "tokens) for the paper-grid CR sweep; run on the "
                        "TPU chip - minutes there, hours on this 1-core "
                        "CPU")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    from tests.test_compression_exactness import (
        _filler_batch, _long_filler_batch, copier_model_config,
        long_copier_model_config, LONG_PAD_T)
    from experiments.run_digit_cr_sweep import train_copy_model

    print(f"training on backend: {jax.default_backend()}")
    art_dir = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "artifacts")
    if args.long:
        # long sequences square the attention cost: small batch, the
        # length variety in _long_filler_batch supplies the diversity
        cfg, batch_fn = long_copier_model_config(), _long_filler_batch
        steps = args.steps or 2400
        batch_size, pad_t = 8, LONG_PAD_T
        out = args.out or os.path.join(art_dir, "filler_copier_long.npz")
    else:
        cfg, batch_fn = copier_model_config(), _filler_batch
        steps = args.steps or 2400
        batch_size, pad_t = 48, 160
        out = args.out or os.path.join(art_dir, "filler_copier.npz")
    cfg, params = train_copy_model(
        steps, seed=3, cfg=cfg, batch_fn=batch_fn,
        batch_size=batch_size, pad_t=pad_t)

    from kvcompress_tpu.utils.params_io import save_params_npz
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    save_params_npz(out, params)
    meta = {"steps": steps, "seed": 3, "batch_size": batch_size,
            "pad_t": pad_t,
            "trainer": "experiments/run_digit_cr_sweep.train_copy_model",
            "batch_fn": batch_fn.__name__}
    with open(out.replace(".npz", ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    sz = os.path.getsize(out) / 1e6
    print(f"wrote {out} ({sz:.2f} MB)")


if __name__ == "__main__":
    main()
