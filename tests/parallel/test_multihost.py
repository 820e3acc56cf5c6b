"""Multi-host DCN path: two real processes joined via jax.distributed.

`parallel/distributed.py` was previously argument-plumbing only ("untestable
on a 1-host dev box" per its old docstring) — this suite proves it on one box
by spawning two OS processes, each with 4 virtual CPU devices, joined through
`initialize_cluster` into an 8-device cluster; `global_mesh(model_parallel=2)`
spans both processes and a jitted global reduction must see every shard
(collectives run over Gloo, the CPU stand-in for DCN).

slow-marked: two cold JAX inits + a gRPC rendezvous per test run.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[2]

_WORKER = """
import sys
import numpy as np

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from kobato_eyes_tpu.parallel.distributed import global_mesh, initialize_cluster

initialize_cluster(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == nproc * jax.local_device_count()

mesh = global_mesh(model_parallel=2)
assert mesh.shape == {"data": jax.device_count() // 2, "model": 2}, mesh.shape

# one row block per process: the global sum can only be right if the
# cross-process (DCN-analog) collective actually moved data
local = np.full((4, 8), float(pid + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), local
)
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(arr)
expected = 4 * 8 * sum(range(1, nproc + 1))
assert float(total) == expected, (float(total), expected)
print(f"proc{pid} OK total={float(total)}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_global_reduction(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(k), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for k in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for k, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{k} failed:\n{out}"
        assert f"proc{k} OK" in out, out


def test_env_driven_initialization(tmp_path):
    """KET_COORDINATOR / KET_NUM_PROCESSES / KET_PROCESS_ID env fallbacks."""
    worker = tmp_path / "worker_env.py"
    worker.write_text(
        _WORKER.replace(
            'initialize_cluster(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)',
            "initialize_cluster()",
        )
    )
    port = _free_port()
    procs = []
    for k in range(2):
        env = {
            **os.environ,
            "PYTHONPATH": str(REPO),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "KET_COORDINATOR": f"127.0.0.1:{port}",
            "KET_NUM_PROCESSES": "2",
            "KET_PROCESS_ID": str(k),
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(k), "2", str(port)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    for k, p in enumerate(procs):
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"proc{k} failed:\n{out}"
