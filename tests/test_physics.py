import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from pegasus_tpu.physics import rigid_body as rb
from pegasus_tpu.utils import quaternion as quat


def box_params(half=(0.05, 0.05, 0.08), mass=1.0, n_bodies=2):
    """Body 0 = static env (plane), body 1 = box with 8 corner points."""
    he = np.asarray(half)
    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    )
    corners = signs * he
    # face centers give face-face contacts vertical support points
    face_centers = np.concatenate([np.diag(he), -np.diag(he)], axis=0)
    pts = np.concatenate([corners, face_centers], axis=0)
    P = len(pts)
    points = np.zeros((n_bodies, P, 3), np.float32)
    point_mask = np.zeros((n_bodies, P), bool)
    points[1] = pts
    point_mask[1] = True
    inv_mass = np.array([0.0] + [1.0 / mass] * (n_bodies - 1), np.float32)
    ext = 2 * he
    inertia = (mass / 12.0) * np.array(
        [ext[1] ** 2 + ext[2] ** 2, ext[0] ** 2 + ext[2] ** 2, ext[0] ** 2 + ext[1] ** 2]
    )
    inv_inertia = np.zeros((n_bodies, 3), np.float32)
    inv_inertia[1:] = 1.0 / inertia
    return rb.RigidBodyParams(
        inv_mass=jnp.asarray(inv_mass),
        inv_inertia=jnp.asarray(inv_inertia),
        points=jnp.asarray(points),
        point_mask=jnp.asarray(point_mask),
        radius=jnp.asarray(np.full(n_bodies, float(np.linalg.norm(he)), np.float32)),
        friction=jnp.full((n_bodies,), 0.5),
        restitution=jnp.zeros((n_bodies,)),
        body_mask=jnp.ones((n_bodies,), bool),
    )


def test_box_drop_settles_on_plane():
    """Drop a flat box from 0.3 m: it must land and come to rest with its
    bottom face on z=0 within the reference's 310-step budget
    (rest-pose parity target, BASELINE.md)."""
    params = box_params()
    state0 = rb.RigidBodyState.rest(
        pos=np.array([[0, 0, 0], [0.0, 0.0, 0.3]], np.float32),
        rot=np.array([[1, 0, 0, 0], [1, 0, 0, 0]], np.float32),
    )
    traj, final = rb.simulate(params, state0, n_steps=310)
    # came to rest
    assert float(jnp.linalg.norm(final.linvel[1])) < 0.1
    assert float(jnp.linalg.norm(final.angvel[1])) < 1.0
    # resting height: center ~ half extent above the plane
    assert abs(float(final.pos[1, 2]) - 0.08) < 0.02
    # orientation still flat (box dropped flat stays flat)
    R = np.asarray(quat.quat_to_rotmat(final.rot[1]))
    assert abs(R[2, 2]) > 0.99
    # env never moved
    np.testing.assert_allclose(np.asarray(final.pos[0]), 0.0, atol=1e-6)
    # trajectory has the full time axis
    assert traj.pos.shape[0] == 310


def test_tilted_box_falls_onto_a_face():
    """A box dropped with a random tilt must end with one of its principal
    axes aligned to gravity (i.e. resting on a face, not an edge)."""
    tilt = Rotation.from_euler("xy", [0.4, 0.3]).as_quat()  # xyzw
    q0 = np.roll(tilt, 1)
    params = box_params(half=(0.06, 0.06, 0.06))
    state0 = rb.RigidBodyState.rest(
        pos=np.array([[0, 0, 0], [0, 0, 0.25]], np.float32),
        rot=np.array([[1, 0, 0, 0], q0], np.float32),
    )
    _, final = rb.simulate(params, state0, n_steps=600)
    R = np.asarray(quat.quat_to_rotmat(final.rot[1]))
    # one body axis (column) is within ~8 deg of +-z
    align = np.abs(R[2, :]).max()
    assert align > 0.99, align
    assert float(jnp.linalg.norm(final.linvel[1])) < 0.1
    assert abs(float(final.pos[1, 2]) - 0.06) < 0.02


def test_energy_dissipates_no_explosion():
    params = box_params()
    state0 = rb.RigidBodyState.rest(
        pos=np.array([[0, 0, 0], [0, 0, 0.5]], np.float32),
        rot=np.array([[1, 0, 0, 0], [1, 0, 0, 0]], np.float32),
    )
    traj, final = rb.simulate(params, state0, n_steps=500)
    z = np.asarray(traj.pos)[:, 1, 2]
    assert z.min() > -0.05  # never tunnels through the floor
    assert z.max() <= 0.5 + 1e-4  # never gains energy
    assert np.all(np.isfinite(np.asarray(traj.pos)))


def test_two_boxes_do_not_interpenetrate():
    params = box_params(n_bodies=3)
    # second dynamic box shares geometry of body 1
    params = params.replace(
        points=params.points.at[2].set(params.points[1]),
        point_mask=params.point_mask.at[2].set(params.point_mask[1]),
    )
    state0 = rb.RigidBodyState.rest(
        pos=np.array([[0, 0, 0], [0, 0, 0.2], [0.01, 0, 0.5]], np.float32),
        rot=np.tile(np.array([1, 0, 0, 0], np.float32), (3, 1)),
    )
    _, final = rb.simulate(params, state0, n_steps=600)
    d = float(jnp.linalg.norm(final.pos[1] - final.pos[2]))
    # centers separated by at least ~one box height (sphere contact proxy)
    assert d > 0.1, d


def test_simulate_batch_vmaps():
    params = box_params()
    state0 = rb.RigidBodyState.rest(
        pos=np.array([[0, 0, 0], [0, 0, 0.3]], np.float32),
        rot=np.array([[1, 0, 0, 0], [1, 0, 0, 0]], np.float32),
    )
    V = 4
    params_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (V,) + x.shape), params)
    states_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (V,) + x.shape), state0)
    traj, final = rb.simulate_batch(params_b, states_b, n_steps=50)
    assert traj.pos.shape == (V, 50, 2, 3)
    # identical inputs -> identical outputs across the batch
    np.testing.assert_allclose(
        np.asarray(traj.pos[0]), np.asarray(traj.pos[-1]), atol=1e-6
    )


def test_box_stacks_on_box():
    """Point-vs-OBB pair contacts let a box REST on another box (the
    sphere proxy could not hold a stack)."""
    params = box_params(half=(0.06, 0.06, 0.04), n_bodies=3)
    params = params.replace(
        points=params.points.at[2].set(params.points[1]),
        point_mask=params.point_mask.at[2].set(params.point_mask[1]),
        half_extents=jnp.tile(jnp.array([0.06, 0.06, 0.04]), (3, 1)),
        radius=jnp.full((3,), float(np.linalg.norm([0.06, 0.06, 0.04]))),
    )
    # drop slightly off-center (exactly axis-aligned equal boxes are a
    # measure-zero configuration; a few mm offset is the realistic case)
    state0 = rb.RigidBodyState.rest(
        pos=np.array([[0, 0, 0], [0, 0, 0.05], [0.008, 0.004, 0.25]], np.float32),
        rot=np.tile(np.array([1, 0, 0, 0], np.float32), (3, 1)),
    )
    _, final = rb.simulate(params, state0, n_steps=800)
    z = np.asarray(final.pos)[:, 2]
    # bottom box on the floor, top box resting ON it (z approx 3*h = 0.12)
    assert abs(z[1] - 0.04) < 0.02, z
    assert 0.09 < z[2] < 0.16, z
    assert float(jnp.linalg.norm(final.linvel[2])) < 0.15
    # stacked, not side by side
    xy_off = np.linalg.norm(np.asarray(final.pos)[2, :2] - np.asarray(final.pos)[1, :2])
    assert xy_off < 0.06, xy_off
