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


def _photo_texture(rng, xyz, base, octaves=4, jitter=0.08):
    """Photo-statistics albedo at splat positions: a multi-octave random
    Fourier field (structured texture down to ~5 mm wavelength) plus
    per-splat white noise (per-pixel variance like real photographs —
    the r03 sinusoidal stand-in was far smoother than any real capture,
    VERDICT r03 'What's missing' #2)."""
    x = np.asarray(xyz, np.float64)
    tex = np.tile(np.asarray(base, np.float64), (x.shape[0], 1))
    amp = 0.22
    for o in range(octaves):
        freq = 6.0 * (2.2 ** o)
        for c in range(3):
            k = rng.normal(size=3)
            k *= freq / np.linalg.norm(k)
            phase = rng.uniform(0, 2 * np.pi)
            tex[:, c] += amp * np.sin(x @ k + phase)
        amp *= 0.55
    tex += rng.normal(size=tex.shape) * jitter
    # shading gradient: one directional light, brightness varies across
    # the scene (photo captures are never uniformly lit)
    light = np.array([0.5, 0.3, 0.85])
    light /= np.linalg.norm(light)
    shade = 0.78 + 0.35 * np.tanh(x @ light * 1.8)
    return np.clip(tex * shade[:, None], 0.02, 0.98).astype(np.float32)


def build_gt_scene(rng, jitter_scale=1.0):
    """Textured plane + 4 boxes + background clutter with photo-like
    statistics: multi-frequency structured texture, per-splat noise,
    a shading gradient, and specular-ish brightness variation.  A gray
    seed cloud must learn real high-frequency appearance + geometry
    (the reference trains on real photographs,
    reference: src/reconstruction/object_reconstruction.py:196-201).

    jitter_scale scales the per-splat white-noise component only.  The
    GT is itself a 104k-splat cloud whose jitter is WHITE at the splat
    spacing — recovering it exactly needs splat-for-splat
    correspondence, so it acts as an irreducible PSNR floor that
    tightens with resolution (each 1-Mpx pixel averages 4x fewer GT
    splats than at 512^2).  jitter_scale=0 isolates that floor: same
    structured texture/shading/clutter/sensor noise, no white
    component (see benchmarks/train_asset_1024_30k_nojitter.json)."""
    env = make_plane_cloud(rng, n=60_000, size=1.2)
    env = env.replace(
        f_dc=jnp.asarray(
            shlib.rgb2sh(
                _photo_texture(rng, env.xyz, base=(0.42, 0.38, 0.34),
                               jitter=0.08 * jitter_scale)
            )
        )[:, None, :]
    )
    boxes = []
    for i, (a, c) in enumerate(
        zip(
            np.linspace(0, 2 * np.pi, 4, endpoint=False),
            [(0.7, 0.25, 0.2), (0.2, 0.5, 0.7), (0.75, 0.65, 0.25),
             (0.3, 0.6, 0.3)],
        )
    ):
        b = make_box_cloud(
            rng, n=8_000,
            half_extents=(0.07, 0.05, 0.09),
            center=(0.22 * np.cos(a), 0.22 * np.sin(a), 0.09),
            rgb=c, object_id=i + 1,
        )
        b = b.replace(
            f_dc=jnp.asarray(
                shlib.rgb2sh(_photo_texture(rng, b.xyz, base=c,
                                            jitter=0.1 * jitter_scale))
            )[:, None, :]
        )
        boxes.append(b)
    # background clutter: small random-colored debris around the rim
    clutter = []
    for j in range(10):
        az = rng.uniform(0, 2 * np.pi)
        r = rng.uniform(0.38, 0.54)
        col = tuple(rng.uniform(0.15, 0.85, size=3))
        cl = make_box_cloud(
            rng, n=1200,
            half_extents=tuple(rng.uniform(0.015, 0.045, size=3)),
            center=(r * np.cos(az), r * np.sin(az),
                    float(rng.uniform(0.015, 0.05))),
            rgb=col, object_id=0,
        )
        cl = cl.replace(
            f_dc=jnp.asarray(
                shlib.rgb2sh(
                    _photo_texture(rng, cl.xyz, base=col,
                                   jitter=0.12 * jitter_scale)
                )
            )[:, None, :]
        )
        clutter.append(cl)
    return merge([env] + boxes + clutter)


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
    ap.add_argument("--sensor-noise", type=float, default=0.008,
                    help="Gaussian noise std added to TRAINING views only "
                    "(photo sensor noise; held-out views stay clean so the "
                    "gate measures scene recovery, not noise replay)")
    ap.add_argument("--densify-until", type=int, default=None,
                    help="override the densify window end (default: "
                    "min(15000, 60%% of iters) — the Inria schedule)")
    ap.add_argument("--texture-jitter-scale", type=float, default=1.0,
                    help="scale on the GT's per-splat white-noise albedo "
                    "component; 0 isolates the splat-correspondence PSNR "
                    "floor (see build_gt_scene)")
    ap.add_argument("--densify-grad-scale", type=float, default=1.0,
                    help="multiplier on the Inria 2e-4 NDC densify "
                    "threshold (<1 densifies harder; 1-Mpx scenes are "
                    "under-split at the 512-calibrated default)")
    ap.add_argument("--densify-abs", action="store_true",
                    help="AbsGS-style |per-tile| gradient accumulation "
                    "(TrainConfig.densify_abs_grad); pair with a ~2x "
                    "densify-grad-scale (abs dominates the signed norm)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "train_asset_256.json"))
    args = ap.parse_args(argv)

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(42)
    gt = jax.device_put(build_gt_scene(rng, args.texture_jitter_scale))
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
    if args.sensor_noise > 0:
        train_gts = [
            jnp.clip(
                g + rng.normal(size=g.shape).astype(np.float32)
                * args.sensor_noise,
                0, 1,
            )
            for g in train_gts
        ]

    config = TrainConfig(
        capacity=args.capacity,
        iterations=args.iters,
        densify_from_iter=500,
        densify_until_iter=(
            args.densify_until
            if args.densify_until is not None
            else min(15_000, int(args.iters * 0.6))
        ),
        densify_grad_threshold=2e-4 * args.densify_grad_scale,
        densification_interval=150,
        opacity_reset_interval=100_000,  # a 3k run cannot recover a reset
        sh_increase_interval=1000,
        position_lr_max_steps=args.iters,
        max_split_per_round=16_384,
        densify_abs_grad=args.densify_abs,
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
        "gt": "photo-stats (multi-octave texture + per-splat noise + "
              "shading gradient + clutter)",
        "sensor_noise_std": args.sensor_noise,
        "texture_jitter_scale": args.texture_jitter_scale,
        "heldout_views_clean": True,
        "densify_until_iter": config.densify_until_iter,
        "densify_grad_threshold": config.densify_grad_threshold,
        "densify_abs_grad": config.densify_abs_grad,
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
