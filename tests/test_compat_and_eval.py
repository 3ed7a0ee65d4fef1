"""Compat layer (GaussianModel / PegasusSetup / render wrappers), eval
metrics, PNG writer and misc utilities."""

import json
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.model import GaussianModel
from pegasus_tpu.gs.ply import save_gs_ply
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud


def test_gaussian_model_facade(tmp_path, rng):
    cloud = make_box_cloud(rng, n=64)
    path = str(tmp_path / "o.ply")
    save_gs_ply(cloud, path)

    gm = GaussianModel(3).load_ply(path)
    assert gm.get_xyz.shape == (64, 3)

    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("z", 0.3).as_matrix()
    T[:3, 3] = [0.1, 0, 0]
    before = np.asarray(gm.cloud.xyz).mean(0)
    gm.apply_transformation(T)
    after = np.asarray(gm.cloud.xyz).mean(0)
    np.testing.assert_allclose(after - before, [0.1, 0, 0], atol=1e-5)

    gm2 = GaussianModel(3).load_ply(path)
    gm.merge_gaussians(gm2)
    assert gm.get_xyz.shape[0] == 128

    gm.mask_points(np.arange(128) < 100)
    assert gm.get_xyz.shape[0] == 100

    pts, cols = gm.get_point_cloud()
    assert pts.shape == (100, 3) and cols.shape == (100, 3)
    assert cols.min() >= 0 and cols.max() <= 1


def test_denoise_point_cloud(rng):
    cloud = make_box_cloud(rng, n=128)
    gm = GaussianModel(3)
    gm.cloud = cloud
    # inject an outlier far away
    import jax.numpy as jnp

    gm.cloud = gm.cloud.replace(xyz=gm.cloud.xyz.at[0].set(jnp.array([9.0, 9, 9])))
    gm.denoise_point_cloud(nb_points=4, radius=0.1)
    assert gm.get_xyz.shape[0] == 127


def test_render_compat_wrappers(rng):
    from pegasus_tpu.ops.render import (
        render_rgb_and_depth,
        render_semanticsegmentation_mask,
        render_silhouette_mask,
        render_visib_mask,
    )
    from pegasus_tpu.gs.cloud import merge
    from pegasus_tpu.utils.colors import generate_colors

    env = make_plane_cloud(rng, n=256)
    obj = make_box_cloud(rng, n=128, center=(0, 0, 0.08), object_id=1)
    cam = Camera.look_at(
        eye=(0.4, 0.3, 0.5), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(55), fovy=np.deg2rad(45), width=32, height=32,
    )
    colors = generate_colors(1, mode="rgb")

    rgb, depth = render_rgb_and_depth(cam, merge([env, obj.with_object_id(1)]))
    assert rgb.shape == (32, 32, 3) and depth.shape == (32, 32, 1)

    vis, seg_img = render_visib_mask(cam, env, {1: obj}, colors)
    assert vis.shape == (32, 32, 1)
    assert np.asarray(vis).any()

    sil = render_silhouette_mask(cam, {1: obj}, env, color_set=colors)
    assert np.asarray(sil).sum() >= np.asarray(vis).sum()  # amodal >= visible

    sem = render_semanticsegmentation_mask(cam, env, {1: obj}, colors)
    assert sem.dtype == np.uint8 and sem.shape == (32, 32, 3)


def test_pose_error_metrics(rng):
    from pegasus_tpu import eval as bop_eval

    pts = rng.normal(size=(100, 3)) * 0.05
    R_gt = Rotation.from_euler("xyz", [0.2, -0.1, 0.4]).as_matrix()
    t_gt = np.array([0.1, 0.05, 0.4])

    # perfect estimate
    assert bop_eval.add(R_gt, t_gt, R_gt, t_gt, pts) < 1e-9
    assert bop_eval.re(R_gt, R_gt) < 1e-3
    assert bop_eval.te(t_gt, t_gt) == 0.0

    # translation offset shows up linearly in ADD and te
    t_off = t_gt + [0.01, 0, 0]
    np.testing.assert_allclose(
        bop_eval.add(R_gt, t_off, R_gt, t_gt, pts), 0.01, atol=1e-6
    )
    # adi <= add always
    R_est = Rotation.from_euler("z", 0.1).as_matrix() @ R_gt
    assert bop_eval.adi(R_est, t_gt, R_gt, t_gt, pts) <= bop_eval.add(
        R_est, t_gt, R_gt, t_gt, pts
    ) + 1e-9
    # mssd with the true symmetry recovers near-zero for a symmetric pose:
    # need R_gt @ S == R_est, i.e. S = R_gt^T R_est
    sym = {"R": R_gt.T @ R_est, "t": np.zeros(3)}
    v = bop_eval.mssd(R_est, t_gt, R_gt, t_gt, pts, syms=[{"R": np.eye(3), "t": np.zeros(3)}, sym])
    assert v < 1e-6
    # mspd sane
    K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1.0]])
    assert bop_eval.mspd(R_gt, t_gt, R_gt, t_gt, K, pts) < 1e-6


def test_native_png_roundtrip(tmp_path, rng):
    from pegasus_tpu.io.png import write_png
    import imageio.v2 as imageio

    rgb = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    depth = (rng.random((37, 53)) * 60000).astype(np.uint16)
    gray = (rng.random((37, 53)) * 255).astype(np.uint8)
    for name, img in [("a.png", rgb), ("b.png", depth), ("c.png", gray)]:
        write_png(tmp_path / name, img)
        back = np.asarray(imageio.imread(tmp_path / name))
        np.testing.assert_array_equal(back, img)


def test_bop_dataset_checker(tmp_path):
    from pegasus_tpu.eval import check_bop_dataset

    # empty tree -> errors, not crash
    (tmp_path / "ds").mkdir()
    report = check_bop_dataset(tmp_path, "ds")
    assert not report["ok"]
    assert any("camera.json" in e for e in report["errors"])


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    from pegasus_tpu.training.checkpoint import restore_checkpoint, save_checkpoint
    from pegasus_tpu.training.trainer import GSTrainer, TrainConfig, init_from_points

    config = TrainConfig(capacity=64)
    trainer = GSTrainer(config, width=16, height=16)
    pts = rng.normal(size=(32, 3)) * 0.1
    state = trainer.init_state(
        init_from_points(pts, np.full((32, 3), 0.5, np.float32), config)
    )
    path = tmp_path / "ckpt"
    save_checkpoint(state, path)
    restored = restore_checkpoint(state, path)
    np.testing.assert_allclose(
        np.asarray(restored.cloud.xyz), np.asarray(state.cloud.xyz)
    )


def test_ssao_and_normals(rng):
    import jax.numpy as jnp

    from pegasus_tpu.ops.postprocess import apply_ssao, normals_from_depth, ssao

    # a step edge in depth produces occlusion near the edge
    depth = np.ones((32, 32), np.float32) * 2.0
    depth[:, 16:] = 1.0  # right half closer
    n = np.asarray(normals_from_depth(jnp.asarray(depth)))
    assert n.shape == (32, 32, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    ao = np.asarray(ssao(jnp.asarray(depth)))
    assert ao.min() < 0.999  # some occlusion somewhere
    assert ao.max() <= 1.0
    rgb = np.asarray(
        apply_ssao(jnp.ones((32, 32, 3)), jnp.asarray(depth))
    )
    assert rgb.max() <= 1.0


def test_turntable_renders_mp4(tmp_path, rng):
    from pegasus_tpu.viewer import orbit_cameras, render_turntable

    cams = orbit_cameras(n_views=4, width=32, height=32)
    assert len(cams) == 4
    cloud = make_box_cloud(rng, n=128)
    out = render_turntable(
        cloud, str(tmp_path / "turn.mp4"), n_views=4, width=32, height=32,
    )
    import os

    assert os.path.getsize(out) > 1000


def test_live_viewer_serves_frames(rng):
    import urllib.request

    from pegasus_tpu.viewer import serve_viewer

    cloud = make_box_cloud(rng, n=64)
    server = serve_viewer(
        cloud, host="127.0.0.1", port=0, width=32, height=32, blocking=False
    )
    try:
        port = server.server_address[1]
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ).read()
        assert b"pegasus-tpu viewer" in html
        jpg = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame?az=30&el=20&r=0.8", timeout=60
        ).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
    finally:
        server.shutdown()


def test_engine_simulate_variants(tmp_path, rng):
    from pegasus_tpu.physics.engine import PhysicsEngine
    from pegasus_tpu.testing import build_synthetic_dataset
    from pegasus_tpu.assets.registry import Asset

    root = tmp_path / "ds"
    build_synthetic_dataset(root, object_names=("cup_noodles_04",))
    env = Asset(OBJECT_NAME="asphalt", ID=1003, TYPE="environment",
                dataset_path=str(root))
    obj = Asset(OBJECT_NAME="cup_noodles_04", ID=104, dataset_path=str(root))
    eng = PhysicsEngine(str(root / "urdf"), str(tmp_path / "t.json"),
                        simulation_steps=40, seed=0)
    eng.add_object(env, start_pos=(0, 0, 0))
    eng.add_object(obj, start_pos=(0, 0, 0.2))
    pos, rot = eng.simulate_variants(4, seed=1)
    assert pos.shape[0] == 4 and pos.shape[1] == 40
    assert np.isfinite(pos).all()
    # variants start from different random orientations
    assert np.abs(rot[0, 0, 1] - rot[1, 0, 1]).max() > 1e-3


def test_numerics_debug_hooks():
    """checkify wrapper carries NaN errors as values; assert_finite
    audits pytrees host-side (SURVEY 5 sanitizer gap)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from pegasus_tpu.utils.observability import assert_finite, checked

    def bad(x):
        return jnp.log(x) / (x - x.mean())

    err, _ = checked(bad)(jnp.array([0.0, 1.0, 2.0]))
    with _pytest.raises(Exception):
        err.throw()

    assert_finite({"ok": jnp.ones(3)})
    with _pytest.raises(FloatingPointError):
        assert_finite({"bad": jnp.array([1.0, jnp.nan])}, name="render")
