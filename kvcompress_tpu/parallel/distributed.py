"""Multi-host bootstrap.

The role of reference vllm/distributed/parallel_state.py
init_distributed_environment / initialize_model_parallel (:838-951): on TPU
pods this collapses to jax.distributed.initialize (control plane) plus a
global device mesh - there are no NCCL/gloo process groups to build, and
collectives are XLA ops over ICI (intra-slice) / DCN (inter-slice) chosen by
the mesh axis order.

Usage on each host of a pod slice (or multi-slice with megascale env):

    from kvcompress_tpu.parallel.distributed import init_distributed
    mesh = init_distributed(tp_size=8, dp_size=num_hosts)

Single-process use (tests, one chip) needs no call at all.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from kvcompress_tpu.parallel.mesh import build_mesh


def init_distributed(
    tp_size: Optional[int] = None,
    dp_size: int = 1,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the jax distributed runtime (if multi-process) and build
    the serving mesh over all global devices.

    Environment fallbacks follow jax conventions (JAX_COORDINATOR_ADDRESS,
    TPU pod auto-detection); on a single process this only builds the mesh.
    """
    multiproc = (coordinator_address is not None
                 or num_processes is not None
                 or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if multiproc:
        # must run before ANY backend query (jax.process_count() would
        # initialize the local backend and make this call illegal)
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError:
            pass  # already initialized by the caller

    devices = jax.devices()
    if tp_size is None:
        tp_size = max(len(devices) // max(dp_size, 1), 1)
    return build_mesh(tp_size=tp_size, dp_size=dp_size, devices=devices)


def is_driver() -> bool:
    """True on the process that runs the engine control loop (process 0);
    the reference's driver-worker distinction (worker_base.py)."""
    return jax.process_index() == 0
