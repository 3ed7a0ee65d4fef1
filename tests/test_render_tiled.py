"""Tiled-rasterizer parity vs the golden renderer (>40 dB PSNR gate,
BASELINE.md renderer-parity target).

One shared config/scene per module — each distinct static config costs a
fresh XLA compile on CPU.
"""

import numpy as np
import pytest

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import merge
from pegasus_tpu.ops.rasterize_ref import rasterize_reference
from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud

BG = (0.1, 0.1, 0.1)


def psnr(a, b, peak=1.0):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(peak**2 / mse)


@pytest.fixture(scope="module")
def rendered():
    rng = np.random.default_rng(7)
    env = make_plane_cloud(rng, n=1200, size=2.0)
    b1 = make_box_cloud(rng, n=500, center=(0.05, 0.0, 0.08), object_id=1)
    b2 = make_box_cloud(
        rng, n=400, center=(-0.15, 0.1, 0.06), object_id=2, rgb=(0.2, 0.5, 0.9),
        half_extents=(0.05, 0.05, 0.05),
    )
    scene = merge([env, b1, b2])
    cam = Camera.look_at(
        eye=(0.6, 0.5, 0.8), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(55), fovy=np.deg2rad(45), width=120, height=88,
    )
    ref = rasterize_reference(scene, cam, background=BG, max_objects=4)
    til = rasterize_tiled(
        scene, cam, background=BG, max_objects=4,
        max_per_tile=1024, dup_factor=6, chunk=256,
    )
    return ref, til


def test_tiled_matches_golden_rgb_depth_alpha(rendered):
    ref, til = rendered
    assert til.rgb.shape == (88, 120, 3)  # non-tile-multiple height cropped
    p_rgb = psnr(ref.rgb, til.rgb)
    assert p_rgb > 40.0, f"rgb PSNR {p_rgb}"
    p_d = psnr(ref.depth, til.depth, peak=float(np.asarray(ref.depth).max()))
    assert p_d > 40.0, f"depth PSNR {p_d}"
    np.testing.assert_allclose(
        np.asarray(til.alpha), np.asarray(ref.alpha), atol=5e-3
    )


def test_tiled_matches_golden_seg_channels(rendered):
    ref, til = rendered
    for name in ("seg_weights", "vis_weights", "amodal"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(til, name))
        assert psnr(a, b) > 40.0, name
        disagree = np.mean((a >= 0.9) != (b >= 0.9))
        assert disagree < 2e-3, (name, disagree)


def test_tiled_hd_resolution_shapes(rng):
    """1280x720 (BASELINE eval config #3 resolution): tile-bit budget and
    cropping must hold at 80x45 tiles."""
    from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled

    env = make_plane_cloud(rng, n=400, size=2.0)
    b = make_box_cloud(rng, n=200, center=(0, 0, 0.08), object_id=1)
    scene = merge([env, b])
    cam = Camera.look_at(
        eye=(0.7, 0.5, 0.8), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(60), fovy=np.deg2rad(40), width=1280, height=720,
    )
    out = rasterize_tiled(scene, cam, max_objects=2, max_per_tile=256)
    assert out.rgb.shape == (720, 1280, 3)
    assert out.amodal.shape == (720, 1280, 2)
    a = np.asarray(out.rgb)
    assert np.isfinite(a).all() and a.max() > 0.05


@pytest.mark.parametrize("seed", [11, 23, 57])
def test_tiled_matches_golden_fuzz(seed):
    """Randomized scenes & viewpoints keep the >40 dB parity gate."""
    rng = np.random.default_rng(seed)
    from pegasus_tpu.testing import make_random_cloud

    env = make_plane_cloud(rng, n=600, size=1.5)
    parts = [env]
    for k in range(int(rng.integers(1, 4))):
        parts.append(
            make_random_cloud(
                rng, n=int(rng.integers(100, 300)),
                center=rng.uniform(-0.3, 0.3, 3) + [0, 0, 0.35],
                extent=0.2, object_id=k + 1,
            )
        )
    scene = merge(parts)
    az = rng.uniform(0, 2 * np.pi)
    cam = Camera.look_at(
        eye=(0.8 * np.cos(az), 0.8 * np.sin(az), rng.uniform(0.4, 1.0)),
        target=(0, 0, 0.1), up=(0, 0, 1),
        fovx=np.deg2rad(60), fovy=np.deg2rad(50), width=96, height=72,
    )
    ref = rasterize_reference(scene, cam, background=BG, max_objects=4)
    til = rasterize_tiled(scene, cam, background=BG, max_objects=4,
                          max_per_tile=2048)
    assert psnr(ref.rgb, til.rgb) > 40
    assert psnr(ref.amodal, til.amodal) > 40
