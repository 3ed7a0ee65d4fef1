import numpy as np

from pegasus_tpu.gs.ply import load_gs_ply, save_gs_ply
from pegasus_tpu.io import colmap as colmap_io
from pegasus_tpu.testing import make_random_cloud, make_colmap_hemisphere


def test_gs_ply_roundtrip(tmp_path, rng):
    c = make_random_cloud(rng, n=17)
    path = str(tmp_path / "point_cloud.ply")
    save_gs_ply(c, path)
    c2 = load_gs_ply(path)
    for field in ("xyz", "f_dc", "f_rest", "opacity", "scale", "rot"):
        np.testing.assert_allclose(
            np.asarray(getattr(c2, field)),
            np.asarray(getattr(c, field)),
            atol=1e-6,
            err_msg=field,
        )


def test_gs_ply_layout_is_channel_major(tmp_path, rng):
    """On-disk f_rest must be [R..., G..., B...] per splat (Inria layout,
    reference: src/gs/gaussian_model.py:212-213)."""
    from pegasus_tpu.gs.ply import read_ply_vertex_data

    c = make_random_cloud(rng, n=3)
    path = str(tmp_path / "p.ply")
    save_gs_ply(c, path)
    v = read_ply_vertex_data(path)
    f_rest = np.asarray(c.f_rest)  # [N, 15, 3]
    # f_rest_0..14 are the R channel of coefficients 0..14
    for k in range(15):
        np.testing.assert_allclose(v[f"f_rest_{k}"], f_rest[:, k, 0], atol=1e-6)
    for k in range(15):
        np.testing.assert_allclose(v[f"f_rest_{15+k}"], f_rest[:, k, 1], atol=1e-6)


def test_colmap_binary_roundtrip(tmp_path):
    cams, images = make_colmap_hemisphere(n_images=5)
    colmap_io.write_cameras_binary(cams, tmp_path / "cameras.bin")
    colmap_io.write_images_binary(images, tmp_path / "images.bin")
    cams2 = colmap_io.read_cameras_binary(tmp_path / "cameras.bin")
    images2 = colmap_io.read_images_binary(tmp_path / "images.bin")
    assert set(cams2) == set(cams)
    assert cams2[1].model == "PINHOLE"
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    assert set(images2) == set(images)
    for k in images:
        np.testing.assert_allclose(images2[k].qvec, images[k].qvec)
        np.testing.assert_allclose(images2[k].tvec, images[k].tvec)
        assert images2[k].name == images[k].name


def test_colmap_points3d_roundtrip(tmp_path, rng):
    pts = {
        7: colmap_io.ColmapPoint3D(
            7,
            rng.normal(size=3),
            np.array([10, 20, 30], np.uint8),
            0.5,
            np.array([1, 2], np.int32),
            np.array([3, 4], np.int32),
        )
    }
    colmap_io.write_points3d_binary(pts, tmp_path / "points3D.bin")
    pts2 = colmap_io.read_points3d_binary(tmp_path / "points3D.bin")
    np.testing.assert_allclose(pts2[7].xyz, pts[7].xyz)
    np.testing.assert_array_equal(pts2[7].rgb, pts[7].rgb)
    np.testing.assert_array_equal(pts2[7].image_ids, pts[7].image_ids)


def test_o3d_ply_roundtrip(tmp_path):
    """save_o3d_ply writes a plain xyz/rgb cloud readable by the generic
    vertex reader (the reference's point_cloud_o3d.ply companion)."""
    import numpy as np

    from pegasus_tpu.gs.ply import read_ply_vertex_data, save_o3d_ply
    from pegasus_tpu.testing import make_box_cloud

    cloud = make_box_cloud(np.random.default_rng(0), n=128, rgb=(0.8, 0.2, 0.1))
    path = tmp_path / "point_cloud_o3d.ply"
    save_o3d_ply(cloud, str(path))
    v = read_ply_vertex_data(str(path))
    assert len(v["x"]) == 128
    np.testing.assert_allclose(v["x"], np.asarray(cloud.xyz)[:, 0], atol=1e-6)
    # colors decode back to the source rgb (uint8 rounding)
    assert abs(float(np.mean(v["red"])) / 255.0 - 0.8) < 0.03
    assert v["red"].mean() > v["blue"].mean()
