"""Data-parallel training over a device mesh (camera-batch DP + psum).

The reference trains strictly single-GPU, batch size 1 (gs_training.py);
the DP step shards a camera batch over the mesh, averages gradients with
one psum, and applies a single replicated update — effectively Inria
with batch size = mesh size.  Verified: DP on 4 virtual devices matches
a hand-computed batch-averaged update, and DP training converges."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pegasus_tpu.camera import Camera
from pegasus_tpu.ops.rasterize_ref import rasterize_reference
from pegasus_tpu.parallel.mesh import make_mesh
from pegasus_tpu.testing import make_box_cloud
from pegasus_tpu.training.trainer import GSTrainer, TrainConfig, init_from_points


def _stack_cams(cams):
    return jax.tree.map(lambda *x: jnp.stack(x), *cams)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    gt_cloud = make_box_cloud(
        rng, n=300, half_extents=(0.08, 0.08, 0.1), rgb=(0.7, 0.3, 0.2),
        object_id=0,
    )
    render = jax.jit(
        lambda cl, c: rasterize_reference(cl, c, max_objects=1, chunk=512)
    )
    cams, gts = [], []
    for az in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        eye = (0.5 * np.cos(az), 0.5 * np.sin(az), 0.35)
        cam = Camera.look_at(
            eye=eye, target=(0, 0, 0), up=(0, 0, 1),
            fovx=np.deg2rad(50), fovy=np.deg2rad(50), width=32, height=32,
        )
        cams.append(cam)
        gts.append(jnp.clip(render(gt_cloud, cam).rgb, 0, 1))

    config = TrainConfig(capacity=512, densify_from_iter=10**9)
    trainer = GSTrainer(config, width=32, height=32)
    pts = np.asarray(gt_cloud.xyz)[:200] + rng.normal(size=(200, 3)) * 0.01
    cloud0 = init_from_points(pts, np.full((200, 3), 0.5, np.float32), config)
    state = trainer.init_state(cloud0, spatial_lr_scale=0.5)
    return trainer, state, cams, gts


def test_dp_matches_batch_average(setup):
    """One DP step over 4 cameras == one step on the 4-camera-averaged
    gradient (computed by hand from _loss_and_grads)."""
    trainer, state, cams, gts = setup
    mesh = make_mesh((4,), ("batch",), jax.devices()[:4])
    dp_step = trainer.make_dp_train_step(mesh)

    cams4 = _stack_cams(cams[:4])
    gts4 = jnp.stack(gts[:4])
    dp_state, dp_metrics = dp_step(state, cams4, gts4)

    # hand-compute the batch-averaged update
    grads, losses = [], []
    g2d_sum = denom_sum = 0.0
    for cam, gt in zip(cams[:4], gts[:4]):
        loss, aux, pg, og = trainer._loss_and_grads(state, cam, gt)
        g2d, denom = trainer._densify_stats(og)
        grads.append(pg)
        losses.append(float(loss))
        g2d_sum = g2d_sum + g2d
        denom_sum = denom_sum + denom
    pg_mean = jax.tree.map(lambda *x: sum(x) / 4.0, *grads)
    ref_state = trainer._apply_grads(state, pg_mean, g2d_sum, denom_sum)

    np.testing.assert_allclose(
        np.asarray(dp_state.cloud.xyz), np.asarray(ref_state.cloud.xyz),
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dp_state.xyz_grad_accum),
        np.asarray(ref_state.xyz_grad_accum), atol=2e-6,
    )
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), np.mean(losses), atol=1e-6
    )
    assert int(dp_state.step) == int(state.step) + 1


def test_dp_training_reduces_loss(setup):
    trainer, state, cams, gts = setup
    mesh = make_mesh((4,), ("batch",), jax.devices()[:4])
    dp_step = trainer.make_dp_train_step(mesh)
    cams8 = _stack_cams(cams)  # 8 cameras = 2 per device
    gts8 = jnp.stack(gts)

    _, m0 = dp_step(state, cams8, gts8)
    for _ in range(40):
        state, m = dp_step(state, cams8, gts8)
    assert float(m["loss"]) < 0.7 * float(m0["loss"])
    assert np.isfinite(float(m["loss"]))


def test_train_loop_with_mesh(setup):
    """GSTrainer.train(mesh=...) drives the DP step per iteration."""
    trainer, state, cams, gts = setup
    mesh = make_mesh((4,), ("batch",), jax.devices()[:4])
    state2, m = trainer.train(
        state, cams, gts, iterations=10, scene_extent=0.5, seed=2, mesh=mesh
    )
    assert int(state2.step) == int(state.step) + 10
    assert np.isfinite(float(m["loss"]))
