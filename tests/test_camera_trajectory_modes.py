"""Camera trajectory modes: random / sequence / random+zoom.

Round 1 only exercised 'sequence' directly; these cover the reference's
three modes (reference: src/gs/pegasus_setup.py:85-143), including the
pose1-double-scale zoom quirk reproduced deliberately."""

import numpy as np
import pytest

from pegasus_tpu.scene.camera_trajectory import create_camera_trajectory
from pegasus_tpu.testing import build_synthetic_dataset
from pegasus_tpu.io import colmap as cio
from pegasus_tpu.utils.pose import qvec2rotmat


@pytest.fixture(scope="module")
def extr(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    build_synthetic_dataset(root)
    sparse = root / "environment" / "asphalt" / "sparse" / "0"
    return (
        cio.read_images_binary(sparse / "images.bin"),
        cio.read_cameras_binary(sparse / "cameras.bin"),
    )


def _make(extr_pair, mode, seed=4, n=3, interp=4):
    imgs, cams = extr_pair
    intr = cams[min(cams.keys())]
    return create_camera_trajectory(
        cam_extr=imgs, focal_x=intr.params[0],
        intr_width=intr.width, intr_height=intr.height,
        render_width=64, render_height=48,
        num_cameras=n, num_interpolation_steps=interp,
        mode=mode, rng=np.random.default_rng(seed),
    )


@pytest.mark.parametrize("mode", ["random", "sequence", "random+zoom"])
def test_mode_produces_valid_cameras(extr, mode):
    cams = _make(extr, mode)
    assert len(cams) == 3 * 4
    for c in cams:
        R = np.asarray(c.R_w2c)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert c.width == 64 and c.height == 48


def test_sequence_starts_at_first_pose(extr):
    imgs, _ = extr
    cams = _make(extr, "sequence")
    first = imgs[min(imgs.keys())]
    # alpha=0 camera equals COLMAP pose 0 (hybrid [R_c2w | t_w2c] conv.)
    np.testing.assert_allclose(
        np.asarray(cams[0].R_w2c), qvec2rotmat(first.qvec), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cams[0].t_w2c), np.asarray(first.tvec), atol=1e-5
    )


def test_zoom_scales_translations_inward(extr):
    plain = _make(extr, "sequence")
    zoomed = _make(extr, "random+zoom", seed=11)
    # zoom multiplies pose translations by factors in (0.36, 1.0) — the
    # start window is random, so compare norm DISTRIBUTIONS, not pairs
    n_plain = np.mean([np.linalg.norm(np.asarray(c.t_w2c)) for c in plain])
    n_zoom = np.mean([np.linalg.norm(np.asarray(c.t_w2c)) for c in zoomed])
    assert n_zoom < n_plain * 1.0 + 1e-6
    assert n_zoom > 0.2 * n_plain


def test_random_mode_varies_with_seed(extr):
    a = _make(extr, "random", seed=1)
    b = _make(extr, "random", seed=2)
    ta = np.stack([np.asarray(c.t_w2c) for c in a])
    tb = np.stack([np.asarray(c.t_w2c) for c in b])
    assert not np.allclose(ta, tb)
