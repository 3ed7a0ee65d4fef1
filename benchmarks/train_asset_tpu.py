"""Full-scale asset training quality gate (runs on the real TPU chip).

The reference's quality control point is a 30k-iteration Inria training
run on photo reconstructions (reference: src/gs/gs_training.py:13-50,
checkpoints at 7k/30k).  The round-2 test suite only proved convergence
at toy scale (48x48 views, 1k capacity); this script demonstrates the
scaled claim on TPU through the differentiable Pallas pair:

  * GT scene: a textured ground plane + 4 colored boxes (~90k splats)
    rendered to 28 views at 256x256 ("really-rendered" photo stand-ins);
  * trainee: 200k-capacity cloud seeded with 40k noisy gray points;
  * 3000 iterations with the global Inria densify/prune schedule;
  * gate: held-out PSNR on 4 views never seen in training.

Writes benchmarks/train_asset_256.json and exits nonzero if the held-out
PSNR is below the gate.

Usage:  python benchmarks/train_asset_tpu.py [--iters 3000] [--gate 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import merge
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud
from pegasus_tpu.training.trainer import GSTrainer, TrainConfig, init_from_points
from pegasus_tpu.utils import sh as shlib


def build_gt_scene(rng):
    """Textured plane + 4 boxes: enough structure that a gray seed cloud
    must actually learn geometry + appearance (uniform-color scenes are
    trivially fittable and would not gate anything)."""
    env = make_plane_cloud(rng, n=60_000, size=1.2)
    # procedural texture: sinusoidal color field over the plane
    xy = np.asarray(env.xyz[:, :2])
    tex = np.stack(
        [
            0.45 + 0.3 * np.sin(xy[:, 0] * 14.0) * np.cos(xy[:, 1] * 9.0),
            0.4 + 0.25 * np.sin(xy[:, 1] * 11.0 + 1.3),
            0.35 + 0.3 * np.cos(xy[:, 0] * 7.0 + xy[:, 1] * 5.0),
        ],
        axis=1,
    )
    env = env.replace(
        f_dc=jnp.asarray(shlib.rgb2sh(np.clip(tex, 0, 1)))[:, None, :]
    )
    boxes = [
        make_box_cloud(
            rng, n=8_000,
            half_extents=(0.07, 0.05, 0.09),
            center=(0.22 * np.cos(a), 0.22 * np.sin(a), 0.09),
            rgb=c, object_id=i + 1,
        )
        for i, (a, c) in enumerate(
            zip(
                np.linspace(0, 2 * np.pi, 4, endpoint=False),
                [(0.85, 0.2, 0.15), (0.15, 0.6, 0.85), (0.9, 0.8, 0.2),
                 (0.3, 0.75, 0.3)],
            )
        )
    ]
    return merge([env] + boxes)


def orbit_cameras(n, width, height):
    cams = []
    for i, az in enumerate(np.linspace(0, 2 * np.pi, n, endpoint=False)):
        r = 0.62 + 0.08 * (i % 3)
        h = 0.38 + 0.1 * (i % 2)
        cams.append(
            Camera.look_at(
                eye=(r * np.cos(az), r * np.sin(az), h),
                target=(0, 0, 0.05), up=(0, 0, 1),
                fovx=np.deg2rad(55), fovy=np.deg2rad(55),
                width=width, height=height,
            )
        )
    return cams


def psnr(a, b) -> float:
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / mse) if mse > 0 else np.inf


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--capacity", type=int, default=200_000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--gate", type=float, default=20.0)
    ap.add_argument("--seed-points", type=int, default=40_000)
    ap.add_argument("--views", type=int, default=28,
                    help="total GT views; the last 4 are held out "
                    "(24 default views under-constrain 1-Mpx training: "
                    "30k iters OVERFIT to 27.9 dB held-out where 3k gave "
                    "30.3 — long runs at high resolution need more views)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "train_asset_256.json"))
    args = ap.parse_args(argv)

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(42)
    gt = jax.device_put(build_gt_scene(rng))
    w = h = args.size

    if platform == "cpu":
        from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled

        render = jax.jit(
            lambda cl, c: rasterize_tiled(cl, c, max_objects=1, max_per_tile=512)
        )
        backend = "tiled"
    else:
        from pegasus_tpu.ops.rasterize_pallas import rasterize_pallas

        render = jax.jit(lambda cl, c: rasterize_pallas(cl, c, max_objects=1))
        backend = "pallas"

    n_views = max(args.views, 8)
    cams = orbit_cameras(n_views, w, h)
    print(f"[train_asset] rendering {n_views} GT views at {w}x{h}...",
          flush=True)
    gts = [jnp.clip(render(gt, c).rgb, 0, 1) for c in cams]
    jax.block_until_ready(gts[-1])
    train_cams, test_cams = cams[:-4], cams[-4:]
    train_gts, test_gts = gts[:-4], gts[-4:]

    config = TrainConfig(
        capacity=args.capacity,
        iterations=args.iters,
        densify_from_iter=500,
        densify_until_iter=min(15_000, int(args.iters * 0.6)),
        densification_interval=150,
        opacity_reset_interval=100_000,  # a 3k run cannot recover a reset
        sh_increase_interval=1000,
        position_lr_max_steps=args.iters,
        max_split_per_round=16_384,
    )
    trainer = GSTrainer(config, width=w, height=h)
    print(f"[train_asset] trainer backend: {trainer.backend}", flush=True)

    idx = rng.choice(gt.num_splats, args.seed_points, replace=False)
    pts = np.asarray(gt.xyz)[idx] + rng.normal(size=(args.seed_points, 3)) * 0.01
    cloud0 = init_from_points(
        pts, np.full((args.seed_points, 3), 0.5, np.float32), config
    )
    state = trainer.init_state(cloud0, spatial_lr_scale=0.6)

    base_psnr = float(np.mean([
        psnr(jnp.clip(render(state.cloud, c).rgb, 0, 1), g)
        for c, g in zip(test_cams, test_gts)
    ]))
    print(f"[train_asset] seed held-out PSNR: {base_psnr:.2f} dB", flush=True)

    t0 = time.time()
    state, metrics = trainer.train(
        state, train_cams, train_gts, iterations=args.iters,
        scene_extent=0.7, seed=1, log_every=500,
    )
    jax.block_until_ready(state.cloud.xyz)
    wall = time.time() - t0

    heldout = float(np.mean([
        psnr(jnp.clip(render(state.cloud, c).rgb, 0, 1), g)
        for c, g in zip(test_cams, test_gts)
    ]))
    alive = int(np.asarray(state.cloud.alive).sum())
    report = {
        "platform": platform,
        "trainer_backend": trainer.backend,
        "resolution": f"{w}x{h}",
        "capacity": args.capacity,
        "iterations": args.iters,
        "seed_points": args.seed_points,
        "final_alive_splats": alive,
        "heldout_psnr_db": round(heldout, 2),
        "seed_psnr_db": round(base_psnr, 2),
        "train_wall_s": round(wall, 1),
        "iters_per_s": round(args.iters / wall, 2),
        "gate_db": args.gate,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)
    if heldout < args.gate:
        print(f"TRAINING QUALITY GATE FAILED: {heldout:.2f} < {args.gate} dB",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
