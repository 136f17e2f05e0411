"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
full sharded path is testable without TPU hardware (SURVEY.md section 4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# keep test runs from appending to the local usage-stats file
# (tests/test_usage_stats.py exercises the path explicitly)
os.environ.setdefault("KVC_NO_USAGE_STATS", "1")

# The environment may have imported jax already (sitecustomize registering a
# TPU plugin), in which case env vars are too late: override the live config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs on the same host skip
# most XLA:CPU compiles (the bulk of suite wall time on this 1-core
# image). Host-fingerprinted dir per utils/hostcache (stale caches from
# OTHER machines spam cpu_aot_loader errors, hence the keying).
from kvcompress_tpu.utils import hostcache  # noqa: E402

hostcache.configure("cpu", "-tests")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
