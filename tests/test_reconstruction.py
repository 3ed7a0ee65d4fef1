"""Offline reconstruction pipeline pieces (COLMAP-free parts)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pegasus_tpu.io import colmap as cio
from pegasus_tpu.testing import make_box_cloud, make_colmap_hemisphere


def test_alpha_shape_mesh_box(rng):
    from pegasus_tpu.reconstruction.urdf_gen import alpha_shape_mesh

    # dense points on a box surface + interior
    he = np.array([0.05, 0.04, 0.03])
    surf = rng.uniform(-1, 1, size=(3000, 3)) * he
    # push a third of them to the surface
    axis = rng.integers(0, 3, size=1000)
    sign = rng.choice([-1.0, 1.0], size=1000)
    surf[:1000, :][np.arange(1000), axis] = sign * he[axis]
    mesh = alpha_shape_mesh(surf, alpha=0.05)
    lo, hi = mesh.aabb()
    np.testing.assert_allclose(hi - lo, 2 * he, rtol=0.15)
    assert len(mesh.faces) > 50
    # surface is closed-ish: Euler characteristic of a closed surface
    # V - E + F = 2 for a sphere-like mesh; allow slack for alpha artifacts
    assert mesh.vertices.shape[0] > 50


def test_urdf_generator_from_gs_ply(tmp_path, rng):
    from pegasus_tpu.gs.ply import save_gs_ply
    from pegasus_tpu.physics.urdf import parse_urdf
    from pegasus_tpu.reconstruction.urdf_gen import URDFGenerator, gs_cleaning

    cloud = make_box_cloud(rng, n=2000, half_extents=(0.05, 0.05, 0.07),
                           center=(0.3, 0.2, 0.1))
    ply = tmp_path / "point_cloud.ply"
    save_gs_ply(cloud, str(ply))

    gen = URDFGenerator(ply, object_type="object", mass=0.3)
    obj_path = tmp_path / "obj.obj"
    urdf_path = tmp_path / "obj.urdf"
    mesh = gen.generate(obj_path, urdf_path, alpha=0.08)
    assert obj_path.exists() and urdf_path.exists()
    # mesh recentered at its center of mass
    np.testing.assert_allclose(mesh.get_center(), 0.0, atol=0.02)
    np.testing.assert_allclose(gen.center_translation, [-0.3, -0.2, -0.1],
                               atol=0.03)
    info = parse_urdf(urdf_path)
    assert info.mass == 0.3
    assert info.collision_mesh == "obj.obj"

    # gs_cleaning applies the recentering to the ply
    out_ply = tmp_path / "clean.ply"
    gs_cleaning(ply, t=gen.center_translation, R=gen.center_rotation,
                out_path=out_ply)
    from pegasus_tpu.gs.ply import load_gs_ply

    cleaned = load_gs_ply(str(out_ply))
    np.testing.assert_allclose(
        np.asarray(cleaned.xyz).mean(0), 0.0, atol=0.03
    )


def test_reconstruction_alignment(tmp_path, rng):
    """A tilted plane of sparse points must align to z=0 with cameras
    consistent (align2plane contract, SURVEY 2.3.3)."""
    from pegasus_tpu.reconstruction.alignment import ReconstructionAlignment
    from pegasus_tpu.utils.pose import qvec2rotmat

    # build a synthetic colmap model: plane tilted by R0, offset by d0
    R0 = Rotation.from_euler("xy", [0.4, -0.25]).as_matrix()
    pts_plane = rng.uniform(-1, 1, size=(400, 3))
    pts_plane[:, 2] = 0.0
    world_pts = pts_plane @ R0.T + np.array([0.1, -0.2, 0.5])

    cams, images = make_colmap_hemisphere(n_images=8, radius=2.0)
    # move cameras to the tilted world too (above the plane)
    points = {
        i: cio.ColmapPoint3D(i, world_pts[i], np.array([100, 100, 100], np.uint8),
                             0.1, np.zeros(0, np.int32), np.zeros(0, np.int32))
        for i in range(len(world_pts))
    }
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    cio.write_cameras_binary(cams, sparse / "cameras.bin")
    cio.write_images_binary(images, sparse / "images.bin")
    cio.write_points3d_binary(points, sparse / "points3D.bin")

    align = ReconstructionAlignment(sparse)
    T = align.align2plane(plane_size=2.0)
    align.save()

    pts2 = cio.read_points3d_binary(sparse / "points3D.bin")
    zs = np.array([p.xyz[2] for p in pts2.values()])
    assert np.abs(zs).max() < 0.02  # plane now at z = 0

    # camera poses transformed consistently: w2c still valid rotations
    imgs2 = cio.read_images_binary(sparse / "images.bin")
    for im in imgs2.values():
        R = qvec2rotmat(im.qvec)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_image_processor_masks_and_renumbers(tmp_path, rng):
    from PIL import Image

    from pegasus_tpu.reconstruction.image_prep import OrteryImageProcessor

    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    for name in ("a.png", "b.png"):
        Image.fromarray(
            (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        ).save(img_dir / name)
        m = np.zeros((16, 16), np.uint8)
        m[4:12, 4:12] = 255
        Image.fromarray(m).save(mask_dir / name)

    out = tmp_path / "fused"
    proc = OrteryImageProcessor(img_dir, mask_dir, out, hemisphere="down")
    written = proc.process(image_list_name="image_list_down.txt")
    assert written == ["0151.png", "0152.png"]
    arr = np.asarray(Image.open(out / "0151.png"))
    assert (arr[:4] == 0).all()  # masked-out region is background
    assert arr[4:12, 4:12].sum() > 0
    assert (out / "image_list_down.txt").read_text().splitlines() == written


def test_colmap_driver_gates_gracefully(tmp_path):
    from pegasus_tpu.reconstruction.colmap_driver import (
        COLMAPReconstruction,
        ColmapNotFoundError,
    )

    reco = COLMAPReconstruction(
        image_path=tmp_path, output_path=tmp_path / "out",
        colmap_exe="definitely_not_colmap_xyz",
    )
    with pytest.raises(ColmapNotFoundError):
        reco.run()


def test_scale_scene_by_const(tmp_path):
    from pegasus_tpu.reconstruction.colmap_driver import COLMAPReconstruction

    cams, images = make_colmap_hemisphere(n_images=4)
    sparse = tmp_path / "out" / "sparse" / "0"
    sparse.mkdir(parents=True)
    cio.write_cameras_binary(cams, sparse / "cameras.bin")
    cio.write_images_binary(images, sparse / "images.bin")

    reco = COLMAPReconstruction(image_path=tmp_path, output_path=tmp_path / "out")
    before = cio.read_images_binary(sparse / "images.bin")
    reco.scale_scene_by_const(2.5)
    after = cio.read_images_binary(sparse / "images.bin")
    for k in before:
        np.testing.assert_allclose(
            after[k].tvec, np.asarray(before[k].tvec) * 2.5, atol=1e-9
        )


def test_aruco_ray_intersection():
    from pegasus_tpu.reconstruction.aruco_scale import _ls_ray_intersection

    target = np.array([0.3, -0.2, 0.5])
    rng = np.random.default_rng(0)
    origins = rng.normal(size=(10, 3)) * 2
    dirs = target - origins
    est = _ls_ray_intersection(origins, dirs)
    np.testing.assert_allclose(est, target, atol=1e-8)
