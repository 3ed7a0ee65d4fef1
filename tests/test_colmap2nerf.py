"""colmap2nerf converter: binary model -> valid transforms.json.

(Reference: vendored NVIDIA script src/utility/colmap2nerf.py:114-565;
this rebuild reads the binary model directly.)"""

import json
from pathlib import Path

import numpy as np
import pytest

from pegasus_tpu.testing import build_synthetic_dataset
from pegasus_tpu.utils.colmap2nerf import convert_colmap2nerf


def test_convert_writes_valid_transforms(tmp_path):
    build_synthetic_dataset(tmp_path)
    sparse = tmp_path / "environment" / "asphalt" / "sparse" / "0"
    out = tmp_path / "transforms.json"
    res = convert_colmap2nerf(sparse, out_path=out)

    data = json.loads(out.read_text())
    for key in ("camera_angle_x", "camera_angle_y", "frames", "aabb_scale"):
        assert key in data
    assert 0 < data["camera_angle_x"] < np.pi
    assert len(data["frames"]) == 16  # synthetic dataset registers 16 views
    for frame in data["frames"]:
        T = np.asarray(frame["transform_matrix"])
        assert T.shape == (4, 4)
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-9)
        assert frame["file_path"].startswith("images/")
    # recentring: camera centroid near the origin
    centers = np.asarray(
        [np.asarray(f["transform_matrix"])[:3, 3] for f in data["frames"]]
    )
    assert np.linalg.norm(centers.mean(axis=0)) < 0.3
    assert res == data


def test_keep_world_scale(tmp_path):
    build_synthetic_dataset(tmp_path)
    sparse = tmp_path / "environment" / "asphalt" / "sparse" / "0"
    raw = convert_colmap2nerf(sparse, keep_world_scale=True)
    from pegasus_tpu.io import colmap as cio
    from pegasus_tpu.utils.pose import qvec2rotmat

    imgs = cio.read_images_binary(sparse / "images.bin")
    first = sorted(imgs.values(), key=lambda i: i.name)[0]
    R = qvec2rotmat(first.qvec)
    c_expect = -R.T @ np.asarray(first.tvec)
    c_got = np.asarray(raw["frames"][0]["transform_matrix"])[:3, 3]
    np.testing.assert_allclose(c_got, c_expect, atol=1e-6)
