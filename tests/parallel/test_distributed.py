"""Cluster-join plumbing (parallel/distributed.py) without real multi-host.

The two-process join itself is proven by test_multihost.py (opt-in marker);
these cover the env-driven argument resolution and the global-mesh layout
policy in the default suite.
"""

from __future__ import annotations

import jax
import pytest

from kobato_eyes_tpu.parallel import distributed


def test_initialize_cluster_env_fallbacks(monkeypatch):
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    monkeypatch.setenv("KET_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("KET_NUM_PROCESSES", "4")
    monkeypatch.setenv("KET_PROCESS_ID", "2")
    distributed.initialize_cluster()
    assert calls == [{
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }]


def test_initialize_cluster_explicit_args_win(monkeypatch):
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    monkeypatch.setenv("KET_COORDINATOR", "ignored:1")
    distributed.initialize_cluster("host:9999", num_processes=2, process_id=1)
    assert calls[0]["coordinator_address"] == "host:9999"
    assert calls[0]["num_processes"] == 2
    assert calls[0]["process_id"] == 1


def test_global_mesh_shape():
    mesh = distributed.global_mesh(model_parallel=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] == jax.device_count() // 2


def test_global_mesh_warns_when_model_crosses_hosts(caplog):
    """model_parallel beyond the local device count = tensor collectives over
    DCN; the layout policy warns (and the 8-device harness cannot actually
    build that mesh — data axis would be 0)."""
    with caplog.at_level("WARNING", logger="kobato_eyes_tpu.parallel.distributed"):
        with pytest.raises(Exception):
            distributed.global_mesh(model_parallel=2 * jax.device_count())
    assert any("will cross DCN" in r.message for r in caplog.records)
