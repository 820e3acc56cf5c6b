"""Multi-host DCN path: two real processes joined via jax.distributed.

`parallel/distributed.py` was previously argument-plumbing only ("untestable
on a 1-host dev box" per its old docstring) — this suite proves it on one box
by spawning two OS processes, each with 4 virtual CPU devices, joined through
`initialize_cluster` into an 8-device cluster; `global_mesh(model_parallel=2)`
spans both processes and a jitted global reduction must see every shard
(collectives run over Gloo, the CPU stand-in for DCN).

Readiness is phase-handshaked through marker files (ready -> joined -> exit),
each phase with its own <=120 s budget and immediate failure when either
process dies — a hang fails at the phase that hung instead of a blanket
subprocess timeout masking 1-core contention (round-2 weak item: the old
540 s communicate() budget).

slow-marked: two cold JAX inits + a gRPC rendezvous per test run.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[2]

PHASE_BUDGET_S = 120.0

_WORKER = """
import sys
from pathlib import Path

import numpy as np

pid, nproc, port, markers = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], Path(sys.argv[4])

from kobato_eyes_tpu.parallel.distributed import global_mesh, initialize_cluster

(markers / f"ready_{pid}").touch()  # imports done, about to rendezvous

INIT_CALL

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == nproc * jax.local_device_count()

(markers / f"joined_{pid}").touch()  # cluster rendezvous complete

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

_EXPLICIT_INIT = (
    'initialize_cluster(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)'
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _drain(procs) -> list[str]:
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out or "")
    return outs


def _wait_phase(procs, markers: list[Path], phase: str) -> None:
    """Block until every marker exists; fail FAST if any process exits
    non-zero, fail at PHASE_BUDGET_S if the phase hangs."""
    deadline = time.monotonic() + PHASE_BUDGET_S
    while time.monotonic() < deadline:
        for k, p in enumerate(procs):
            rc = p.poll()
            if rc is not None and rc != 0:
                outs = _drain(procs)
                raise AssertionError(
                    f"proc{k} died (rc={rc}) during phase {phase!r}:\n"
                    + "\n---\n".join(outs)
                )
        if all(m.exists() for m in markers):
            return
        time.sleep(0.2)
    outs = _drain(procs)
    raise AssertionError(
        f"phase {phase!r} not reached within {PHASE_BUDGET_S:.0f}s; "
        f"markers present: {[m.name for m in markers if m.exists()]}\n"
        + "\n---\n".join(outs)
    )


def _run_pair(tmp_path: Path, init_call: str, extra_env) -> list[str]:
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("INIT_CALL", init_call))
    markers = tmp_path / "markers"
    markers.mkdir()
    port = _free_port()
    procs = []
    for k in range(2):
        env = {
            **os.environ,
            "PYTHONPATH": str(REPO),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            **extra_env(k, port),
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(k), "2", str(port), str(markers)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    try:
        _wait_phase(procs, [markers / f"ready_{k}" for k in range(2)], "ready")
        _wait_phase(procs, [markers / f"joined_{k}" for k in range(2)], "joined")
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=PHASE_BUDGET_S)
            outs.append(out)
        for k, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc{k} failed:\n{out}"
        return outs
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def test_two_process_cluster_global_reduction(tmp_path):
    outs = _run_pair(tmp_path, _EXPLICIT_INIT, lambda k, port: {})
    for k, out in enumerate(outs):
        assert f"proc{k} OK" in out, out


def test_env_driven_initialization(tmp_path):
    """KET_COORDINATOR / KET_NUM_PROCESSES / KET_PROCESS_ID env fallbacks."""
    outs = _run_pair(
        tmp_path,
        "initialize_cluster()",
        lambda k, port: {
            "KET_COORDINATOR": f"127.0.0.1:{port}",
            "KET_NUM_PROCESSES": "2",
            "KET_PROCESS_ID": str(k),
        },
    )
    for k, out in enumerate(outs):
        assert f"proc{k} OK" in out, out
