"""Regression tests for the driver entry's multi-chip wrapper.

Round-3 lesson: mutating XLA_FLAGS / jax_platforms after backend init
does not re-platform the process (VERDICT r03), so ``dryrun_multichip``
must re-exec its body in a subprocess whose environment forces a CPU
platform *before* Python starts. These tests pin the wrapper contract
without paying for the full dryrun body.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


class _FakeProc:
    def __init__(self, rc):
        self.returncode = rc


def test_wrapper_reexecs_with_cpu_forced_env(monkeypatch):
    captured = {}

    def fake_run(cmd, env=None, cwd=None):
        captured["cmd"] = cmd
        captured["env"] = env
        captured["cwd"] = cwd
        return _FakeProc(0)

    monkeypatch.delenv("_PEGASUS_DRYRUN_INNER", raising=False)
    # a stale device-count flag must be replaced, not merely appended-to
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2 --foo=bar"
    )
    monkeypatch.setattr(subprocess, "run", fake_run)

    graft.dryrun_multichip(8)

    env = captured["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_PEGASUS_DRYRUN_INNER"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "device_count=2" not in env["XLA_FLAGS"]
    assert "--foo=bar" in env["XLA_FLAGS"]
    repo = os.path.dirname(os.path.abspath(graft.__file__))
    assert captured["cwd"] == repo
    assert env["PYTHONPATH"].split(os.pathsep)[0] == repo
    assert captured["cmd"][0] == sys.executable
    assert "dryrun_multichip(8)" in captured["cmd"][-1]


def test_wrapper_propagates_child_failure(monkeypatch):
    monkeypatch.delenv("_PEGASUS_DRYRUN_INNER", raising=False)
    monkeypatch.setattr(
        subprocess, "run", lambda *a, **kw: _FakeProc(3)
    )
    import pytest

    with pytest.raises(RuntimeError, match="rc=3"):
        graft.dryrun_multichip(8)
