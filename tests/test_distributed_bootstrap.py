"""Multi-process bootstrap smoke test (reference
vllm/distributed/parallel_state.py:838-951 init_distributed_environment +
initialize_model_parallel): two REAL jax CPU processes initialize the
distributed runtime, build the serving mesh over global devices, and run a
cross-process allgather - the thing the reference cannot test without GPUs
(SURVEY.md section 4)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

CHILD = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from kvcompress_tpu.parallel.distributed import (init_distributed,
                                                     is_driver)
    mesh = init_distributed(
        tp_size=4, dp_size=1,
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4 and jax.local_device_count() == 2
    assert mesh.shape["model"] == 4
    assert is_driver() == (pid == 0)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    got = multihost_utils.process_allgather(
        jnp.asarray([pid + 1], jnp.int32))
    assert sorted(int(x) for x in got.ravel()) == [1, 2], got
    print("BOOTSTRAP_OK", pid, flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.full
def test_two_process_bootstrap_and_allgather(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep
        + env.get("PYTHONPATH", ""))
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    try:
        outs = [p.communicate(timeout=180)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed runtime spawn timed out on this host")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable on this host:\n{out[-500:]}")
        assert p.returncode == 0, f"process {i} failed:\n{out[-2000:]}"
        assert f"BOOTSTRAP_OK {i}" in out
