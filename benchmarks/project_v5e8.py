"""Auditable v5e-8 scenes/hour projection from committed BENCH fields.

ARCHITECTURE.md derives "~8.2k scenes/hour device-bound on v5e-8" from
the measured per-scene device time; this script makes that derivation
REPRODUCIBLE: every input is a field of a committed BENCH_r*.json
(device_scene_seconds, readback_bytes_per_scene, scene_setup_seconds)
and the single unmeasurable factor — host link bandwidth, which the dev
tunnel cannot represent — is an explicit parameter.

Model (per chip):
    transfer_s = readback_bytes_per_scene / link_bandwidth
    scene_s    = max(device_scene_seconds, transfer_s)   # pipelined
    scene_s_np = device_scene_seconds + transfer_s       # no overlap
The generation path is scene-data-parallel with zero cross-chip traffic
(parallel/generation.py), so a v5e-8 slice multiplies by 8.

Usage: python benchmarks/project_v5e8.py [--bench BENCH_rNN.json]
           [--pcie-gbps 8] [--chips 8] [--out benchmarks/project_v5e8.json]
"""

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_bench() -> str:
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        raise FileNotFoundError("no BENCH_r*.json committed yet")
    return paths[-1]


def project(bench: dict, link_gbps: float, chips: int) -> dict:
    fields = bench.get("parsed", bench)
    dev_s = fields["device_scene_seconds"]
    rb_bytes = fields["readback_bytes_per_scene"]
    link_Bps = link_gbps * 1e9 / 8.0  # gigabits/s -> bytes/s
    transfer_s = rb_bytes / link_Bps
    overlap_s = max(dev_s, transfer_s)
    serial_s = dev_s + transfer_s
    return {
        "inputs": {
            "device_scene_seconds": dev_s,
            "readback_bytes_per_scene": rb_bytes,
            "assumed_link_gbps": link_gbps,
            "chips": chips,
            "measured_tunnel_scene_seconds": fields.get("scene_seconds"),
            "measured_tunnel_scenes_per_hour": fields.get("scenes_per_hour"),
        },
        "transfer_seconds_per_scene": round(transfer_s, 3),
        "scene_seconds_pipelined": round(overlap_s, 3),
        "scene_seconds_serial": round(serial_s, 3),
        "scenes_per_hour_per_chip_pipelined": round(3600.0 / overlap_s, 1),
        "scenes_per_hour_per_chip_serial": round(3600.0 / serial_s, 1),
        "scenes_per_hour_v5e8_pipelined": round(
            chips * 3600.0 / overlap_s, 1
        ),
        "scenes_per_hour_v5e8_serial": round(chips * 3600.0 / serial_s, 1),
        "pegaset_hours_v5e8": {
            # PEGASET regeneration cost at N scenes (BASELINE: < 1 h goal)
            str(n): round(n * overlap_s / (chips * 3600.0), 2)
            for n in (1000, 5000, 10000)
        },
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None,
                    help="BENCH_r*.json to project from (default: latest)")
    ap.add_argument("--pcie-gbps", type=float, default=8.0,
                    help="assumed host link bandwidth in gigabits/s "
                    "(8 gbps = 1 GB/s, a conservative fraction of PCIe3 x16)")
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "project_v5e8.json"))
    args = ap.parse_args(argv)

    path = args.bench or latest_bench()
    with open(path) as f:
        bench = json.load(f)
    result = {"bench_file": os.path.basename(path)}
    result.update(project(bench, args.pcie_gbps, args.chips))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    fields = bench.get("parsed", bench)
    if fields.get("device_scene_seconds") is None:
        sys.exit(1)


if __name__ == "__main__":
    main()
