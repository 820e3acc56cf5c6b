"""Multi-host initialization: ICI within a slice, DCN across hosts.

The reference has no distributed story (SURVEY §2.3); this engine's is:
each host runs one process, `jax.distributed.initialize` wires the cluster,
and the (data, model) mesh spans every addressable device so GSPMD keeps
model-parallel collectives on ICI and only data-parallel gradient reductions
cross DCN (mesh axis order puts `model` innermost = fastest links).

Tested on one box by spawning two OS processes with virtual CPU devices and
joining them through ``initialize_cluster`` (collectives over Gloo, the CPU
stand-in for DCN): ``tests/parallel/test_multihost.py``.
"""

from __future__ import annotations

import logging
import os

import jax

from kobato_eyes_tpu.parallel.mesh import make_mesh

logger = logging.getLogger(__name__)


def initialize_cluster(
    coordinator_address: str | None = None,
    *,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host cluster (env-driven when args are None).

    Env fallbacks: KET_COORDINATOR, KET_NUM_PROCESSES, KET_PROCESS_ID —
    on Cloud TPU pods plain ``jax.distributed.initialize()`` autodetects.
    """
    coordinator_address = coordinator_address or os.environ.get("KET_COORDINATOR")
    if num_processes is None and "KET_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["KET_NUM_PROCESSES"])
    if process_id is None and "KET_PROCESS_ID" in os.environ:
        process_id = int(os.environ["KET_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "joined cluster: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def global_mesh(*, model_parallel: int = 1):
    """(data, model) mesh over every device in the cluster.

    ``model_parallel`` should divide the per-slice device count so tensor
    collectives never leave ICI.
    """
    n = jax.device_count()
    if model_parallel > jax.local_device_count():
        logger.warning(
            "model_parallel=%d exceeds local devices (%d): tensor collectives "
            "will cross DCN", model_parallel, jax.local_device_count(),
        )
    return make_mesh(data=n // model_parallel, model=model_parallel)
