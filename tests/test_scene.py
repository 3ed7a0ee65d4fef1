import json
import numpy as np
import jax.numpy as jnp
from pathlib import Path

import pytest
from scipy.spatial.transform import Rotation

from pegasus_tpu.scene.composition import (
    SceneTemplate,
    pose_scene,
    poses_from_trajectory_step,
)
from pegasus_tpu.scene.trajectory import Trajectory, AssetInfo
from pegasus_tpu.scene.camera_trajectory import create_camera_trajectory
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud, make_colmap_hemisphere


def _template(rng, pad_to=None):
    env = make_plane_cloud(rng, n=64)
    a = make_box_cloud(rng, n=32, center=(0.2, 0, 0.1), object_id=1)
    b = make_box_cloud(rng, n=16, center=(-0.2, 0, 0.1), object_id=2)
    return SceneTemplate.build(env, [a, b], pad_to=pad_to), (env, a, b)


def test_identity_poses_are_noop(rng):
    tpl, (env, a, b) = _template(rng)
    R = jnp.tile(jnp.eye(3), (3, 1, 1))
    t = jnp.zeros((3, 3))
    posed = pose_scene(tpl, R, t)
    np.testing.assert_allclose(
        np.asarray(posed.xyz), np.asarray(tpl.cloud.xyz), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(posed.f_rest), np.asarray(tpl.cloud.f_rest), atol=1e-4
    )


def test_pose_scene_matches_per_object_transform(rng):
    tpl, (env, a, b) = _template(rng, pad_to=128)
    Ra = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    Rb = Rotation.random(random_state=2).as_matrix().astype(np.float32)
    ta = np.array([0.1, 0.2, 0.3], np.float32)
    tb = np.array([-0.1, 0.0, 0.5], np.float32)

    R = jnp.stack([jnp.eye(3), jnp.asarray(Ra), jnp.asarray(Rb)])
    t = jnp.stack([jnp.zeros(3), jnp.asarray(ta), jnp.asarray(tb)])
    posed = pose_scene(tpl, R, t)

    # same op done the reference way: each object transformed alone
    a_t = a.transformed(Ra, ta)  # pivot = centroid (reference semantics)
    b_t = b.transformed(Rb, tb)

    na, nb = a.num_splats, b.num_splats
    n_env = env.num_splats
    np.testing.assert_allclose(
        np.asarray(posed.xyz[n_env : n_env + na]), np.asarray(a_t.xyz), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(posed.xyz[n_env + na : n_env + na + nb]),
        np.asarray(b_t.xyz),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(posed.f_rest[n_env : n_env + na]),
        np.asarray(a_t.f_rest),
        atol=1e-3,
    )
    # env untouched
    np.testing.assert_allclose(
        np.asarray(posed.xyz[:n_env]), np.asarray(env.xyz), atol=1e-6
    )
    # padding stays dead
    assert not np.asarray(posed.alive[n_env + na + nb :]).any()


def _tiny_trajectory():
    T, B = 5, 2
    times_t = np.zeros((B, T, 3))
    times_q = np.zeros((B, T, 4))
    times_q[..., 3] = 1.0
    times_t[1, :, 2] = np.linspace(0.5, 0.0, T)  # object falling
    rot = Rotation.from_euler("z", np.linspace(0, 0.4, T)[:, None])
    times_q[1] = rot.as_quat()
    return Trajectory(
        environment=AssetInfo(name="plane", class_name="Plane", bullet_ids=[0]),
        objects={
            "box": AssetInfo(
                name="box", class_name="Box", bullet_ids=[1], object_ID=104,
                center_of_mass=[0, 0, 0],
            )
        },
        times_t=times_t,
        times_q=times_q,
    )


def test_trajectory_json_roundtrip(tmp_path):
    traj = _tiny_trajectory()
    path = tmp_path / "sim.json"
    traj.to_json(path)
    # schema check against the reference writer's layout
    # (reference: physical_simulation.py:163-168)
    raw = json.loads(path.read_text())
    assert set(raw.keys()) == {"asset_infos", "trajectory"}
    assert "environment" in raw["asset_infos"] and "object" in raw["asset_infos"]
    assert raw["asset_infos"]["object"]["box"]["object_ID"] == 104
    assert "t" in raw["trajectory"]["1"]["0"] and "q" in raw["trajectory"]["1"]["0"]

    back = Trajectory.from_json(path)
    np.testing.assert_allclose(back.times_t, traj.times_t, atol=1e-12)
    np.testing.assert_allclose(back.times_q, traj.times_q, atol=1e-12)
    assert back.objects["box"].object_ID == 104


def test_poses_from_trajectory_step():
    traj = _tiny_trajectory()
    R, t = poses_from_trajectory_step(traj.times_t, traj.times_q, 2)
    # env forced to identity
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[0]), 0.0, atol=1e-6)
    # object matches scipy
    want = Rotation.from_quat(traj.times_q[1, 2]).as_matrix()
    np.testing.assert_allclose(np.asarray(R[1]), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t[1]), traj.times_t[1, 2], atol=1e-6)


REFERENCE_FIXTURE = Path("/root/reference/src/engine/simulation_steps.json")


@pytest.mark.skipif(not REFERENCE_FIXTURE.exists(), reason="reference not mounted")
def test_load_reference_fixture():
    """The only data fixture the reference ships (SURVEY 2.1) must parse."""
    traj = Trajectory.from_json(REFERENCE_FIXTURE)
    assert traj.environment.class_name == "Asphalt"
    assert traj.num_bodies == 2
    assert traj.num_steps > 100
    info = traj.objects["cup_noodles_04"]
    assert info.object_ID == 104
    # quaternions are unit-ish at the end (Bullet normalizes)
    qn = np.linalg.norm(traj.times_q[1, -1])
    assert abs(qn - 1) < 1e-3


def test_camera_trajectory_matches_reference_conventions(rng):
    cams_intr, images = make_colmap_hemisphere(n_images=12)
    cam_list = create_camera_trajectory(
        cam_extr=images,
        focal_x=600.0,
        intr_width=640,
        intr_height=480,
        render_width=320,
        render_height=240,
        num_cameras=3,
        num_interpolation_steps=4,
        mode="sequence",
        rng=rng,
    )
    assert len(cam_list) == 12  # num_cameras * interpolation steps
    # first camera = first colmap pose exactly
    from pegasus_tpu.utils.pose import qvec2rotmat

    c0 = cam_list[0]
    np.testing.assert_allclose(
        np.asarray(c0.R_w2c), qvec2rotmat(images[1].qvec), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(c0.t_w2c), images[1].tvec, atol=1e-5)
    assert c0.width == 320 and c0.height == 240
    # fov derived from focal: 2*atan(w/(2f))
    assert abs(float(c0.fovx) - 2 * np.arctan(640 / (2 * 600.0))) < 1e-6
