"""Spherical (Ortery turntable) recipe end to end with a stub COLMAP.

The most involved reconstruction flow (reference:
src/reconstruction/spherical_object_reconstruction.py:96-215): preprocess
up+down image sets (masking + renumbering, down starts at 151), SfM
pose-LOCKED against a calibration reconstruction (point_triangulator),
register the down images into the model (image_registrator), train GS on
the fused set, alpha-shape URDF generation and gs_cleaning.  The stub
colmap answers every subprocess call so the whole chain executes.
"""

import os
import stat
from pathlib import Path

import numpy as np
import pytest

from pegasus_tpu.assets.registry import Asset
from pegasus_tpu.testing import build_synthetic_dataset

STUB = """#!/usr/bin/env python3
import os, shutil, sys
from pathlib import Path
cmd = sys.argv[1]
args = {}
it = iter(sys.argv[2:])
for k in it:
    args[k] = next(it, "")
model = Path(os.environ["COLMAP_STUB_MODEL"])
def install(dst):
    dst = Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    for f in ("cameras.bin", "images.bin", "points3D.bin"):
        if (model / f).exists():
            shutil.copyfile(model / f, dst / f)
if cmd == "mapper":
    install(Path(args["--output_path"]) / "0")
elif cmd in ("point_triangulator", "image_registrator"):
    install(args["--output_path"])
elif cmd in ("feature_extractor", "exhaustive_matcher", "vocab_tree_matcher"):
    db = args.get("--database_path")
    if db:
        Path(db).touch()
else:
    sys.exit(f"stub colmap: unexpected command {cmd}")
sys.exit(0)
"""

N_UP, N_DOWN = 6, 4


@pytest.fixture(scope="module")
def spherical_root(tmp_path_factory):
    import jax
    import imageio.v2 as imageio

    from pegasus_tpu.gs.ply import load_gs_ply
    from pegasus_tpu.io import colmap as cio
    from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled
    from pegasus_tpu.utils.pose import fov2focal, rotmat2qvec
    from pegasus_tpu.viewer import orbit_cameras

    root = tmp_path_factory.mktemp("sph")
    build_synthetic_dataset(root)
    base = Path(root) / "object" / "cup_noodles_04"
    cloud = load_gs_ply(
        base / "fused" / "gs" / "point_cloud" / "iteration_30000"
        / "point_cloud.ply"
    )

    w, h = 64, 48
    cams = orbit_cameras(
        center=tuple(np.asarray(cloud.centroid())), radius=0.5,
        n_views=N_UP + N_DOWN, width=w, height=h,
    )
    render = jax.jit(
        lambda c: rasterize_tiled(cloud, c, max_objects=1, max_per_tile=256)
    )

    # raw turntable "photos" + full-white masks for both hemispheres
    for hemi, cam_slice, n in (
        ("up", cams[:N_UP], N_UP),
        ("down", cams[N_UP:], N_DOWN),
    ):
        (base / hemi / "images").mkdir(parents=True, exist_ok=True)
        (base / hemi / "masks").mkdir(parents=True, exist_ok=True)
        for i, cam in enumerate(cam_slice):
            rgb = np.clip(np.asarray(render(cam).rgb), 0, 1)
            imageio.imwrite(
                base / hemi / "images" / f"raw_{i:03d}.png",
                (rgb * 255).astype(np.uint8),
            )
            imageio.imwrite(
                base / hemi / "masks" / f"raw_{i:03d}.png",
                np.full((h, w), 255, np.uint8),
            )

    # pre-baked sparse model with the RENUMBERED names the processors emit
    fovx = float(cams[0].fovx)
    fovy = float(cams[0].fovy)
    colmap_cams = {
        1: cio.ColmapCamera(
            id=1, model="PINHOLE", width=w, height=h,
            params=np.array(
                [fov2focal(fovx, w), fov2focal(fovy, h), w / 2, h / 2]
            ),
        )
    }
    imgs = {}
    names = [f"{i:04d}.png" for i in range(1, N_UP + 1)] + [
        f"{i:04d}.png" for i in range(151, 151 + N_DOWN)
    ]
    for i, (cam, name) in enumerate(zip(cams, names)):
        imgs[i + 1] = cio.ColmapImage(
            id=i + 1,
            qvec=rotmat2qvec(np.asarray(cam.R_w2c)),
            tvec=np.asarray(cam.t_w2c, np.float64),
            camera_id=1,
            name=name,
            xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), np.int64),
        )
    pts = {}
    xyz = np.asarray(cloud.xyz)[:: max(1, cloud.num_splats // 300)]
    for i, p in enumerate(xyz):
        pts[i + 1] = cio.ColmapPoint3D(
            id=i + 1, xyz=np.asarray(p, np.float64),
            rgb=np.array([200, 60, 60], np.uint8), error=0.1,
            image_ids=np.array([1]), point2D_idxs=np.array([0]),
        )
    model_src = Path(root) / "stub_model"
    model_src.mkdir()
    cio.write_cameras_binary(colmap_cams, model_src / "cameras.bin")
    cio.write_images_binary(imgs, model_src / "images.bin")
    cio.write_points3d_binary(pts, model_src / "points3D.bin")

    bin_dir = Path(root) / "bin"
    bin_dir.mkdir()
    exe = bin_dir / "colmap"
    exe.write_text(STUB)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return root, base, bin_dir, model_src


def test_spherical_recipe_end_to_end(spherical_root, monkeypatch):
    root, base, bin_dir, model_src = spherical_root
    from pegasus_tpu.reconstruction.recipes import (
        spherical_object_reconstruction,
    )

    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    monkeypatch.setenv("COLMAP_STUB_MODEL", str(model_src))

    obj = Asset(
        OBJECT_NAME="cup_noodles_04", ID=104, dataset_path=str(root),
        SCALE=False, ALPHA=0.4,
    )
    spherical_object_reconstruction(
        obj,
        calibration_reconstruction=str(model_src),
        train_iterations=50,
        run_training=True,
    )

    fused = base / "fused"
    # preprocessing renumbered both hemispheres into the fused image set
    assert (fused / "images" / "0001.png").exists()
    assert (fused / "images" / f"{151 + N_DOWN - 1:04d}.png").exists()
    up_list = (fused / "images" / "image_list_up.txt").read_text().split()
    down_list = (fused / "images" / "image_list_down.txt").read_text().split()
    assert len(up_list) == N_UP and up_list[0] == "0001.png"
    assert len(down_list) == N_DOWN and down_list[0] == "0151.png"

    # pose-locked SfM + registration installed the model
    assert (fused / "sparse" / "0" / "images.bin").exists()

    # training + meshing artifacts
    gs_out = fused / "gs" / "point_cloud" / "iteration_50"
    assert (gs_out / "point_cloud.ply").exists()
    assert Path(obj.urdf_obj_path).exists()
    assert Path(obj.urdf_file_path).exists()

    # gs_cleaning recentered the trained cloud near the origin
    from pegasus_tpu.gs.ply import load_gs_ply

    cleaned = load_gs_ply(gs_out / "point_cloud.ply")
    c = np.asarray(cleaned.centroid())
    assert np.linalg.norm(c) < 0.05, c


def test_in_the_wild_recipe_end_to_end(spherical_root, monkeypatch):
    """Handheld-scan flow: external masks + renumber, un-locked SfM,
    align2plane, down-registration, training, URDF + cleaning
    (reference: in_the_wild_object_reconstruction.py:35-219)."""
    import shutil

    root, base04, bin_dir, model_src = spherical_root
    from pegasus_tpu.reconstruction.recipes import (
        in_the_wild_object_reconstruction,
    )

    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    monkeypatch.setenv("COLMAP_STUB_MODEL", str(model_src))

    base = Path(root) / "object" / "cup_noodles_07"
    for hemi in ("up", "down"):
        for sub in ("images", "masks"):
            dst = base / hemi / sub
            if not dst.exists():
                shutil.copytree(base04 / hemi / sub, dst)

    obj = Asset(
        OBJECT_NAME="cup_noodles_07", ID=107, dataset_path=str(root),
        SCALE=False, ALPHA=0.4, DATASET_TYPE="wild",
    )
    in_the_wild_object_reconstruction(obj, train_iterations=40)

    fused = base / "fused"
    assert (fused / "images" / "0001.png").exists()
    assert (fused / "images" / "0151.png").exists()
    assert (fused / "sparse" / "0" / "images.bin").exists()
    assert (fused / "gs" / "point_cloud" / "iteration_40"
            / "point_cloud.ply").exists()
    assert Path(obj.urdf_obj_path).exists()


def test_calibration_recipe(spherical_root, monkeypatch, tmp_path):
    """Calibration-board reconstruction (the reusable pose prior,
    reference: calibration_reconstruction.py)."""
    import shutil

    root, base04, bin_dir, model_src = spherical_root
    from pegasus_tpu.reconstruction.recipes import calibration_reconstruction

    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    monkeypatch.setenv("COLMAP_STUB_MODEL", str(model_src))

    board_dir = Path(root) / "environment" / "board"
    (board_dir / "images").mkdir(parents=True, exist_ok=True)
    for src in sorted((base04 / "up" / "images").iterdir())[:4]:
        shutil.copyfile(src, board_dir / "images" / src.name)

    board = Asset(
        OBJECT_NAME="board", ID=2001, TYPE="environment",
        dataset_path=str(root), SCALE=False,
    )
    sparse = calibration_reconstruction(board)
    assert (Path(sparse) / "images.bin").exists()
    assert (Path(sparse) / "cameras.bin").exists()
