"""Training QUALITY gate: held-out PSNR after a short convergence run.

The round-1 suite exercised training mechanics only; this test proves the
full Inria-style loop (render -> L1+D-SSIM -> Adam -> densify/prune on the
global schedule) actually reconstructs a scene: train on 8 views of a
synthetic object, evaluate PSNR on 2 HELD-OUT views (the reference's
quality control is milestone PLYs + visual checks, gs_training.py:20-21;
here it is a numeric gate).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pegasus_tpu.camera import Camera
from pegasus_tpu.ops.rasterize_ref import rasterize_reference
from pegasus_tpu.testing import make_box_cloud
from pegasus_tpu.training.trainer import GSTrainer, TrainConfig, init_from_points


def _psnr(a, b) -> float:
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / mse) if mse > 0 else np.inf


@pytest.fixture(scope="module")
def views():
    rng = np.random.default_rng(5)
    gt_cloud = make_box_cloud(
        rng, n=400, half_extents=(0.08, 0.08, 0.1), rgb=(0.7, 0.3, 0.2),
        object_id=0,
    )
    render = jax.jit(
        lambda cl, c: rasterize_reference(cl, c, max_objects=1, chunk=512)
    )
    cams, gts = [], []
    for az in np.linspace(0, 2 * np.pi, 10, endpoint=False):
        eye = (0.5 * np.cos(az), 0.5 * np.sin(az), 0.35)
        cam = Camera.look_at(
            eye=eye, target=(0, 0, 0), up=(0, 0, 1),
            fovx=np.deg2rad(50), fovy=np.deg2rad(50), width=48, height=48,
        )
        cams.append(cam)
        gts.append(jnp.clip(render(gt_cloud, cam).rgb, 0, 1))
    return gt_cloud, cams, gts, render


def test_heldout_psnr_after_short_training(views):
    gt_cloud, cams, gts, render = views
    rng = np.random.default_rng(0)
    config = TrainConfig(
        capacity=1024,
        densify_from_iter=50,
        densify_until_iter=400,
        densification_interval=50,
        opacity_reset_interval=10_000,  # no reset inside this short run
        sh_increase_interval=100,
        position_lr_max_steps=600,
        max_split_per_round=512,
    )
    trainer = GSTrainer(config, width=48, height=48)

    idx = rng.choice(gt_cloud.num_splats, 300, replace=False)
    pts = np.asarray(gt_cloud.xyz)[idx] + rng.normal(size=(300, 3)) * 0.01
    cloud0 = init_from_points(pts, np.full((300, 3), 0.5, np.float32), config)
    state = trainer.init_state(cloud0, spatial_lr_scale=0.5)

    # baseline PSNR of the noisy gray seed
    base = np.mean([
        _psnr(jnp.clip(render(state.cloud, c).rgb, 0, 1), g)
        for c, g in zip(cams[8:], gts[8:])
    ])

    state, _ = trainer.train(
        state, cams[:8], gts[:8], iterations=600, scene_extent=0.5, seed=1
    )

    vals = [
        _psnr(jnp.clip(render(state.cloud, c).rgb, 0, 1), g)
        for c, g in zip(cams[8:], gts[8:])
    ]
    psnr = float(np.mean(vals))
    # densification must have engaged and views must reconstruct well
    assert int(np.asarray(state.cloud.alive).sum()) > 300
    assert psnr > base + 3.0, f"no quality gain: {base:.2f} -> {psnr:.2f} dB"
    assert psnr > 24.0, f"held-out PSNR too low: {vals}"


def test_wrapper_segments_respect_global_schedule(views):
    """Milestone segments must not restart densify windows: after the
    global cutoff, further train() segments keep the splat count frozen."""
    gt_cloud, cams, gts, render = views
    rng = np.random.default_rng(2)
    config = TrainConfig(
        capacity=1024,
        densify_from_iter=20,
        densify_until_iter=60,
        densification_interval=20,
        opacity_reset_interval=10_000,
        densify_grad_threshold=1e-7,  # densify aggressively while allowed
        max_split_per_round=128,
    )
    trainer = GSTrainer(config, width=48, height=48)
    pts = np.asarray(gt_cloud.xyz)[:200]
    cloud0 = init_from_points(pts, np.full((200, 3), 0.5, np.float32), config)
    state = trainer.init_state(cloud0)

    state, _ = trainer.train(state, cams[:8], gts[:8], iterations=80,
                             scene_extent=0.5, seed=3)
    alive_after_cutoff = int(np.asarray(state.cloud.alive).sum())
    assert alive_after_cutoff > 200  # densified inside the window

    # a second segment runs PAST the global cutoff: no more densification
    state, _ = trainer.train(state, cams[:8], gts[:8], iterations=80,
                             scene_extent=0.5, seed=4)
    alive_final = int(np.asarray(state.cloud.alive).sum())
    assert alive_final <= alive_after_cutoff
