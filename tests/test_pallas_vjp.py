"""Differentiable Pallas rasterizer: forward parity + gradient parity vs
the tiled XLA backend's autodiff (interpret mode; the compiled pair is
benchmarked on hardware by benchmarks/train_step_tpu.py and bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import merge
from pegasus_tpu.ops.pallas_vjp import (
    rasterize_pallas_diff,
    rasterize_projected_pallas,
)
from pegasus_tpu.ops.projection import project_gaussians
from pegasus_tpu.ops.rasterize_pallas import rasterize_pallas
from pegasus_tpu.ops.rasterize_tiled import rasterize_projected_tiled
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud


def _scene(rng):
    env = make_plane_cloud(rng, n=300, size=1.0)
    box = make_box_cloud(rng, n=150, center=(0, 0, 0.08), object_id=1)
    return merge([env, box])


def _cam(w=32, h=32):
    return Camera.look_at(
        eye=(0.4, 0.3, 0.5), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(55), fovy=np.deg2rad(45), width=w, height=h,
    )


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 and nb == 0:
        return 1.0
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b) / (na * nb)


def test_diff_forward_matches_nondiff(rng):
    """The custom-VJP forward is the SAME kernel as rasterize_pallas."""
    scene = _scene(rng)
    cam = _cam()
    a = rasterize_pallas(
        scene, cam, background=(0.1, 0.2, 0.3), max_objects=2,
        chunk=128, interpret=True,
    )
    b = rasterize_pallas_diff(
        scene, cam, background=(0.1, 0.2, 0.3), max_objects=2,
        chunk=128, interpret=True,
    )
    for name in a._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


def _loss_weights(out):
    """A loss touching EVERY output channel group."""
    return (
        jnp.sum(out.rgb * jnp.cos(jnp.arange(out.rgb.size).reshape(out.rgb.shape)))
        + 0.3 * jnp.sum(out.depth * 0.05)
        + 0.2 * jnp.sum(out.alpha**2)
        + 0.7 * jnp.sum(out.seg_weights[..., 1])
        + 0.4 * jnp.sum(out.vis_weights**2)
        + 0.6 * jnp.sum(out.amodal[..., 1] * 0.5)
    )


def test_grad_parity_vs_tiled(rng):
    """Gradients w.r.t. every cloud parameter match the tiled backend's
    autodiff (same binning, same compositing semantics)."""
    scene = _scene(rng)
    cam = _cam()
    bg = jnp.zeros(3, jnp.float32)

    def loss_tiled(params):
        cloud = scene.replace(**params)
        proj = project_gaussians(cloud, cam)
        out = rasterize_projected_tiled(
            proj, cam.width, cam.height, bg, max_objects=2,
            max_per_tile=512, chunk=128,
        )
        return _loss_weights(out)

    def loss_pallas(params):
        cloud = scene.replace(**params)
        proj = project_gaussians(cloud, cam)
        out = rasterize_projected_pallas(
            proj, cam.width, cam.height, bg, max_objects=2,
            chunk=128, interpret=True,
        )
        return _loss_weights(out)

    params = {
        "xyz": scene.xyz, "f_dc": scene.f_dc, "f_rest": scene.f_rest,
        "opacity": scene.opacity, "scale": scene.scale, "rot": scene.rot,
    }
    lt, gt = jax.value_and_grad(loss_tiled)(params)
    lp, gp = jax.value_and_grad(loss_pallas)(params)

    assert np.isclose(float(lt), float(lp), rtol=1e-4), (lt, lp)
    for name in params:
        c = _cos(gt[name], gp[name])
        assert c > 0.999, f"{name}: cosine {c}"
        np.testing.assert_allclose(
            np.asarray(gp[name]), np.asarray(gt[name]),
            rtol=2e-2, atol=2e-4, err_msg=name,
        )


def test_grad_through_mean2d_offset(rng):
    """The densification screen-space gradient probe (trainer injects a
    zero offset after projection) flows through the Pallas backward."""
    scene = _scene(rng)
    cam = _cam()
    bg = jnp.zeros(3, jnp.float32)
    n = scene.num_splats

    def loss(offset, render):
        proj = project_gaussians(scene, cam)
        proj = proj._replace(
            mean_x=proj.mean_x + offset[:, 0],
            mean_y=proj.mean_y + offset[:, 1],
        )
        out = render(proj)
        return jnp.sum((jnp.clip(out.rgb, 0, 1) - 0.25) ** 2)

    off = jnp.zeros((n, 2), jnp.float32)
    g_tiled = jax.grad(loss)(
        off,
        lambda p: rasterize_projected_tiled(
            p, cam.width, cam.height, bg, max_objects=2,
            max_per_tile=512, chunk=128,
        ),
    )
    g_pallas = jax.grad(loss)(
        off,
        lambda p: rasterize_projected_pallas(
            p, cam.width, cam.height, bg, max_objects=2,
            chunk=128, interpret=True,
        ),
    )
    assert float(jnp.linalg.norm(g_pallas)) > 0
    c = _cos(g_tiled, g_pallas)
    assert c > 0.999, f"offset grad cosine {c}"


def test_dead_splats_get_zero_grads(rng):
    """Splats behind the camera / dead slots must receive exact zeros."""
    scene = _scene(rng)
    # mark the last 50 splats dead
    alive = np.ones(scene.num_splats, bool)
    alive[-50:] = False
    scene = scene.replace(alive=jnp.asarray(alive))
    cam = _cam()

    def loss(xyz):
        out = rasterize_pallas_diff(
            scene.replace(xyz=xyz), cam, max_objects=2,
            chunk=128, interpret=True,
        )
        return jnp.sum(out.rgb)

    g = np.asarray(jax.grad(loss)(scene.xyz))
    assert np.all(g[-50:] == 0.0)
    assert np.any(g[:-50] != 0.0)


def test_dense_tile_overflow_trap(rng):
    """Regression for the round-3 bench-parity incident: on clouds packing
    more than max_per_tile entries into hot tiles, the TILED backend
    silently truncates (counts = min(tile_count, max_per_tile)) and is NOT
    a valid gradient reference, while the Pallas pair composites every
    entry.  Measured on hardware: 26.8 dB vs golden at the 1024 default on
    a 60k-splat init cloud, 74.6 dB at 4096.  This miniature reproduces
    the geometry (thousands of small splats piled into a few tiles) and
    asserts both halves: adequately-sized tiled matches Pallas grads;
    undersized tiled does not match its own adequately-sized forward."""
    from pegasus_tpu.ops.rasterize_ref import rasterize_projected

    # 3000 low-opacity splats concentrated over ~4 tiles of a 64x64 image
    n = 3000
    cloud = make_box_cloud(
        rng, n=n, center=(0.0, 0.0, 0.0), half_extents=(0.03, 0.03, 0.03),
        rgb=(0.6, 0.4, 0.3), object_id=1,
    )
    op = np.full((n, 1), -2.2, np.float32)  # sigmoid ~ 0.1 (Inria init)
    cloud = cloud.replace(opacity=jnp.asarray(op))
    cam = Camera.look_at(
        eye=(0.25, 0.2, 0.22), target=(0, 0, 0), up=(0, 0, 1),
        fovx=np.deg2rad(50), fovy=np.deg2rad(50), width=64, height=64,
    )
    bg = jnp.zeros(3, jnp.float32)
    proj = project_gaussians(cloud, cam)

    # the fixture must actually overflow the small cap
    from pegasus_tpu.ops.binning import bin_splats
    bins = bin_splats(proj, cam.width, cam.height)
    max_count = int(np.asarray(bins.tile_count).max())
    assert max_count > 512, f"fixture too sparse: {max_count} entries/tile"

    golden = rasterize_projected(proj, cam.width, cam.height, bg, max_objects=2)

    def img(mpt):
        return rasterize_projected_tiled(
            proj, cam.width, cam.height, bg, max_objects=2,
            max_per_tile=mpt, chunk=128,
        ).rgb

    err_small = float(jnp.max(jnp.abs(img(512) - golden.rgb)))
    err_big = float(jnp.max(jnp.abs(img(4096) - golden.rgb)))
    assert err_big < 1e-3, f"adequately-sized tiled wrong: {err_big}"
    assert err_small > 1e-2, (
        f"fixture no longer overflows (err {err_small}); deepen it"
    )

    # gradient parity holds against the ADEQUATE reference
    def loss(params, render):
        c = cloud.replace(**params)
        p = project_gaussians(c, cam)
        return jnp.sum((jnp.clip(render(p).rgb, 0, 1) - 0.25) ** 2)

    params = {"xyz": cloud.xyz, "f_dc": cloud.f_dc, "opacity": cloud.opacity}
    g_t = jax.grad(loss)(params, lambda p: rasterize_projected_tiled(
        p, cam.width, cam.height, bg, max_objects=2,
        max_per_tile=4096, chunk=128))
    g_p = jax.grad(loss)(params, lambda p: rasterize_projected_pallas(
        p, cam.width, cam.height, bg, max_objects=2,
        chunk=128, interpret=True))
    for name in params:
        c = _cos(g_t[name], g_p[name])
        assert c > 0.999, f"{name}: cosine {c}"
