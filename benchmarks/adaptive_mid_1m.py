"""Characterize the footprint-adaptive mid bucket at 1M splats (per camera).

VERDICT r4 item 4 premised that the 1M bench's ORBIT camera could skip the
mid-bucket sort and recover the round-4 throughput regression.  Measured,
that premise is false for the bench scene: the orbit view puts 181k splats
over the a_small=2 core — 5.5x the 32768 big budget — so `need_mid`
(ops/binning.py) fires on BOTH bench cameras and the adaptive lax.cond
never takes the cheap branch there.  It fires even at a far view: a TINY
splat straddling a tile corner has a 2x2-tile bbox (area 4 > a_small=2)
and ~18% of 1M splats do regardless of camera distance, so on dense
scenes at the large-tier a_small=2 the skip effectively never engages.

This script records that characterization as a committed artifact:
per-camera over-core splat count, the need_mid predicate, and measured
f/s with the adaptive cond (production default) vs mid forced always-on.
Run on the TPU chip:  python benchmarks/adaptive_mid_1m.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import merge
from pegasus_tpu.ops import binning
from pegasus_tpu.ops.projection import project_gaussians
from pegasus_tpu.ops.rasterize_pallas import rasterize_pallas
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud

BIG_BUDGET = 32768  # rasterize_pallas large-tier default
A_SMALL = 2


def _scene():
    rng = np.random.default_rng(11)
    env = make_plane_cloud(rng, n=820_000, size=2.0)
    objs = [
        make_box_cloud(
            rng, n=30_000,
            center=(0.1 * i - 0.2, 0.05 * i, 0.08),
            object_id=i + 1,
            rgb=((0.2 + 0.1 * i) % 1.0, 0.5, (0.9 - 0.1 * i) % 1.0),
        )
        for i in range(6)
    ]
    return jax.device_put(merge([env] + objs))


def _cam(eye, target):
    return Camera.look_at(
        eye=eye, target=target, up=(0, 0, 1),
        fovx=np.deg2rad(60), fovy=np.deg2rad(47), width=640, height=480,
    )


def _overcore(scene, cam):
    """Splats whose tile footprint exceeds the a_small core (area probe)."""
    proj = jax.jit(lambda s, c: project_gaussians(s, c, None, 1.0))(
        scene, cam
    )
    area = binning.bin_splats(
        proj, cam.width, cam.height, tile=16, a_small=A_SMALL,
        big_budget=BIG_BUDGET, a_big=8, _stage="area",
    )
    return int(jnp.sum((area > A_SMALL).astype(jnp.int32)))


def _fps(render, scene, cam, n_iters=20):
    out = render(scene, cam)
    jax.block_until_ready(out.rgb)
    t0 = time.time()
    for _ in range(n_iters):
        out = render(scene, cam)
    _ = float(out.rgb.sum())
    return round(n_iters / (time.time() - t0), 2), bool(out.overflow)


def main():
    scene = _scene()
    cameras = {
        # the two bench parity/throughput cameras (bench.py _bench_1m)
        "orbit": _cam((0.9, 0.7, 0.9), (0, 0, 0.05)),
        "grazing": _cam((0.85, 0.1, 0.10), (-0.6, 0, 0.04)),
        # a trajectory-realistic far view (the reference's random orbits
        # sit at 2-4x this scene's bench radius, pegasus.py:389-418):
        # measured, need_mid STILL fires here — corner-straddling tiny
        # splats keep the over-core count at 141k — and the view also
        # overflows the 1.8N entry cap (the robustness finding)
        "distant": _cam((2.8, 2.2, 2.6), (0, 0, 0.05)),
    }
    adaptive = jax.jit(
        lambda s, c: rasterize_pallas(s, c, max_objects=8)
    )
    forced = jax.jit(
        lambda s, c: rasterize_pallas(s, c, max_objects=8, adaptive_mid=False)
    )

    report = {"n_splats": int(scene.num_splats), "big_budget": BIG_BUDGET,
              "a_small": A_SMALL, "cameras": {}}
    for name, cam in cameras.items():
        n_over = _overcore(scene, cam)
        fps_a, ovf_a = _fps(adaptive, scene, cam)
        fps_f, ovf_f = _fps(forced, scene, cam)
        report["cameras"][name] = {
            "overcore_splats": n_over,
            "need_mid": n_over > BIG_BUDGET,
            "fps_adaptive": fps_a,
            "fps_mid_forced": fps_f,
            "overflow": ovf_a or ovf_f,
        }
        print(f"[adaptive-mid] {name}: overcore={n_over} "
              f"need_mid={n_over > BIG_BUDGET} "
              f"adaptive={fps_a} forced={fps_f}")

    report["note"] = (
        "need_mid fires at EVERY tested camera, including the distant "
        "one: a tiny splat straddling a tile corner has a 2x2-tile bbox "
        "(area 4 > a_small=2) and ~18% of 1M splats do regardless of "
        "distance, so over-core counts (140-245k) dwarf the 32768 big "
        "budget and the adaptive cond never takes the cheap branch on "
        "this scene family.  value_1m therefore holds at the with-mid "
        "throughput with both parity gates; the cond remains a "
        "correctness-neutral fast path for sparse footprint "
        "distributions.  The distant camera also overflows the 1.8N "
        "entry cap (overflow=true) — the finding that motivated "
        "threading TileBins.overflow through the generation paths."
    )
    out = os.path.join(os.path.dirname(__file__), "adaptive_mid_1m.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[adaptive-mid] wrote {out}")


if __name__ == "__main__":
    main()
