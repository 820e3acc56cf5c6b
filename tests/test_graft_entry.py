"""The driver multi-chip dry run must never trust env vars.

Round-2 regression: ``dryrun_multichip`` took the in-process path whenever
``JAX_PLATFORMS=cpu`` + ``XLA_FLAGS=...device_count=N`` were set, but a
PYTHONPATH site hook (/root/.axon_site) silently overrides those and pins a
1-chip hardware platform — so the dry run died in ``make_mesh`` two driver
rounds running. The contract now: the parent ALWAYS re-execs a scrubbed
subprocess (child-marker gated), and the child verifies the device count it
actually got.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path
from types import SimpleNamespace

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __graft_entry__ as ge


def test_parent_reexecs_even_when_env_claims_cpu_mesh(monkeypatch):
    """Simulate the axon-site condition: env vars advertise an 8-device CPU
    mesh, but the platform underneath is something else. The parent must
    still re-exec the scrubbed subprocess instead of trusting the env."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    monkeypatch.delenv(ge._CHILD_MARKER, raising=False)

    calls = []

    def fake_run(cmd, **kw):
        calls.append((cmd, kw))
        return SimpleNamespace(returncode=0, stdout="", stderr="")

    ge.dryrun_multichip(8, _run=fake_run)
    assert len(calls) == 1, "parent must always re-exec the subprocess"
    _, kw = calls[0]
    env = kw["env"]
    assert env[ge._CHILD_MARKER] == "1"
    assert env["PYTHONPATH"] == str(ge._REPO_ROOT), "site hooks must be scrubbed"
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]


def test_parent_raises_on_child_failure(monkeypatch):
    monkeypatch.delenv(ge._CHILD_MARKER, raising=False)

    def fake_run(cmd, **kw):
        return SimpleNamespace(returncode=3, stdout="", stderr="boom")

    with pytest.raises(RuntimeError, match="rc=3"):
        ge.dryrun_multichip(8, _run=fake_run)


def test_child_marker_takes_in_process_path(monkeypatch):
    """With the child marker set, no subprocess is spawned; the impl runs
    in-process (our test env genuinely has the 8-device CPU mesh, but we stub
    the impl to keep this test fast)."""
    monkeypatch.setenv(ge._CHILD_MARKER, "1")
    ran = []
    monkeypatch.setattr(ge, "_dryrun_impl", lambda n: ran.append(n))

    def explode(*a, **kw):  # pragma: no cover - must not be reached
        raise AssertionError("child must not re-exec")

    ge.dryrun_multichip(8, _run=explode)
    assert ran == [8]


def test_child_fails_loud_when_device_count_short(monkeypatch):
    """The child's ground-truth check: fewer devices than requested -> a
    RuntimeError naming the backend, not a deep make_mesh crash."""
    with pytest.raises(RuntimeError, match="exposes"):
        ge._dryrun_impl(1024)


@pytest.mark.slow
def test_full_dryrun_via_subprocess_under_hostile_env():
    """End-to-end: run dryrun_multichip(8) from a parent whose env mimics the
    driver (vars set, but parent process may be on any platform). Must exit 0
    and print both ok lines."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop(ge._CHILD_MARKER, None)
    code = "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    assert "train ok" in proc.stdout
    assert "scan ok" in proc.stdout
    assert "query ok" in proc.stdout
    assert "ann ok" in proc.stdout
    assert "infer ok" in proc.stdout  # 5th proof: dp x tp tagger inference
