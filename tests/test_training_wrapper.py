"""End-to-end training wrapper: COLMAP scene on disk -> trained GS ply
(reference wrapper contract: src/gs/gs_training.py:13-50)."""

import numpy as np
import pytest

from pegasus_tpu.camera import Camera
from pegasus_tpu.io import colmap as cio
from pegasus_tpu.io.png import write_png
from pegasus_tpu.ops.rasterize_ref import rasterize_reference
from pegasus_tpu.testing import make_box_cloud, make_colmap_hemisphere
from pegasus_tpu.utils.pose import focal2fov


def test_train_wrapper_from_colmap_scene(tmp_path, rng):
    # materialize a tiny COLMAP scene: poses + rendered gt images + points
    W = H = 48
    focal = 60.0
    cams, images = make_colmap_hemisphere(
        n_images=6, radius=0.5, width=W, height=H, focal=focal
    )
    gt_cloud = make_box_cloud(
        rng, n=300, half_extents=(0.07, 0.07, 0.09), rgb=(0.6, 0.3, 0.2),
        object_id=0,
    )

    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    cio.write_cameras_binary(cams, sparse / "cameras.bin")
    cio.write_images_binary(images, sparse / "images.bin")

    pts_xyz = np.asarray(gt_cloud.xyz)[::4]
    pts = {
        i: cio.ColmapPoint3D(
            i, pts_xyz[i], np.array([128, 90, 70], np.uint8), 0.1,
            np.zeros(0, np.int32), np.zeros(0, np.int32),
        )
        for i in range(len(pts_xyz))
    }
    cio.write_points3d_binary(pts, sparse / "points3D.bin")

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    fov = focal2fov(focal, W)
    for im in images.values():
        cam = Camera.from_colmap(im.qvec, im.tvec, fov, fov, W, H)
        out = rasterize_reference(gt_cloud, cam, max_objects=1, chunk=512)
        write_png(
            img_dir / im.name,
            (np.clip(np.asarray(out.rgb), 0, 1) * 255).astype(np.uint8),
        )

    from pegasus_tpu.training.trainer import TrainConfig, train_gaussian_splatting_wrapper

    model_dir = tmp_path / "model"
    state = train_gaussian_splatting_wrapper(
        str(tmp_path),
        str(model_dir),
        TEST_ITERATION=(12,),
        SAVE_ITERATION=(12,),
        iterations=12,
        capacity=512,
    )
    ply = model_dir / "point_cloud" / "iteration_12" / "point_cloud.ply"
    assert ply.exists()

    from pegasus_tpu.gs.ply import load_gs_ply

    trained = load_gs_ply(str(ply))
    assert trained.num_splats > 0
    assert np.isfinite(np.asarray(trained.xyz)).all()
