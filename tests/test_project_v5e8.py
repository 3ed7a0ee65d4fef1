"""benchmarks/project_v5e8.py — the auditable v5e-8 projection.

The ~8.2k scenes/hour claim (ARCHITECTURE.md) must be recomputable from
committed BENCH fields alone; these tests pin the arithmetic and the
BENCH_r*.json field plumbing (the driver wraps bench's JSON line under
a "parsed" key).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

from project_v5e8 import project  # noqa: E402


def test_pipelined_is_max_serial_is_sum():
    bench = {
        "device_scene_seconds": 4.0,
        "readback_bytes_per_scene": 600_000_000,
        "scene_seconds": 80.0,
        "scenes_per_hour": 45.0,
    }
    # 6 gbps = 0.75 GB/s -> transfer 0.8 s < device 4.0 s: device-bound
    out = project(bench, link_gbps=6.0, chips=8)
    assert out["transfer_seconds_per_scene"] == 0.8
    assert out["scene_seconds_pipelined"] == 4.0
    assert out["scene_seconds_serial"] == 4.8
    assert out["scenes_per_hour_per_chip_pipelined"] == 900.0
    assert out["scenes_per_hour_v5e8_pipelined"] == 7200.0
    # transfer-bound regime: slow link dominates
    slow = project(bench, link_gbps=0.6, chips=8)
    assert slow["scene_seconds_pipelined"] == 8.0
    # PEGASET hours: N * scene_s / (chips * 3600)
    assert out["pegaset_hours_v5e8"]["10000"] == round(
        10000 * 4.0 / (8 * 3600.0), 2
    )


def test_reads_driver_wrapped_bench_artifact(tmp_path):
    src = os.path.join(REPO, "BENCH_r03.json")
    if not os.path.exists(src):
        pytest.skip("no committed BENCH artifact")
    parsed = json.load(open(src)).get("parsed")
    if not parsed or parsed.get("device_scene_seconds") is None:
        pytest.skip("committed BENCH has no scene decomposition")
    out = tmp_path / "proj.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "project_v5e8.py"),
         "--bench", src, "--out", str(out)],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    proj = json.loads(out.read_text())
    assert proj["inputs"]["device_scene_seconds"] == parsed[
        "device_scene_seconds"
    ]
    assert proj["scenes_per_hour_v5e8_pipelined"] > 0
