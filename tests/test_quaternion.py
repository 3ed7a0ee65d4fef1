import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pegasus_tpu.utils import quaternion as quat
from pegasus_tpu.utils import pose


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_matches_scipy(rng):
    q_wxyz = random_quats(rng, 64)
    R = np.asarray(quat.quat_to_rotmat(jnp.asarray(q_wxyz)))
    R_scipy = Rotation.from_quat(np.roll(q_wxyz, -1, axis=-1)).as_matrix()
    np.testing.assert_allclose(R, R_scipy, atol=1e-5)


def test_rotmat_to_quat_roundtrip(rng):
    q_wxyz = random_quats(rng, 128)
    q_wxyz[q_wxyz[:, 0] < 0] *= -1
    R = quat.quat_to_rotmat(jnp.asarray(q_wxyz))
    q_back = np.asarray(quat.rotmat_to_quat(R))
    np.testing.assert_allclose(q_back, q_wxyz, atol=1e-5)


def test_rotmat_to_quat_edge_cases():
    # 180-degree rotations stress the branch selection
    for axis in range(3):
        R = -np.eye(3)
        R[axis, axis] = 1.0
        q = np.asarray(quat.rotmat_to_quat(jnp.asarray(R)))
        R_back = np.asarray(quat.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_quat_mul_matches_scipy(rng):
    a = random_quats(rng, 32)
    b = random_quats(rng, 32)
    got = np.asarray(quat.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = (
        Rotation.from_quat(np.roll(a, -1, -1)) * Rotation.from_quat(np.roll(b, -1, -1))
    ).as_quat()
    want = np.roll(want, 1, -1)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    R = quat.quat_to_rotmat(jnp.asarray(q))
    want = np.einsum("nij,nj->ni", np.asarray(R), v)
    got = np.asarray(quat.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_slerp_endpoints_and_midpoint(rng):
    q1 = random_quats(rng, 8)
    q2 = random_quats(rng, 8)
    s0 = np.asarray(quat.slerp(jnp.asarray(q1), jnp.asarray(q2), 0.0))
    s1 = np.asarray(quat.slerp(jnp.asarray(q1), jnp.asarray(q2), 1.0))
    # endpoints up to sign
    for got, want in ((s0, q1), (s1, q2)):
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got, want * sign, atol=1e-5)
    # reference numpy slerp agreement at alpha=0.37
    for i in range(8):
        want = pose.quaternion_slerp(q1[i], q2[i], 0.37)
        got = np.asarray(quat.slerp(jnp.asarray(q1[i]), jnp.asarray(q2[i]), 0.37))
        sign = np.sign(got @ want)
        np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_pose_interpolation_matches_reference_contract():
    # interpolate_pose: lerp position + SLERP rotation
    # (reference: src/utility/pose_interpolation.py:87-107)
    rng = np.random.default_rng(3)
    R1 = Rotation.random(random_state=1).as_matrix()
    R2 = Rotation.random(random_state=2).as_matrix()
    p1 = pose.se3(R1, rng.normal(size=3))
    p2 = pose.se3(R2, rng.normal(size=3))
    mid = pose.interpolate_pose(0.5, 0.0, p1, 1.0, p2)
    np.testing.assert_allclose(mid[:3, 3], 0.5 * (p1[:3, 3] + p2[:3, 3]), atol=1e-9)
    # rotation is a valid rotation between the two
    assert np.allclose(mid[:3, :3] @ mid[:3, :3].T, np.eye(3), atol=1e-9)
    key = Rotation.from_matrix(mid[:3, :3])
    a1 = (key.inv() * Rotation.from_matrix(R1)).magnitude()
    a2 = (key.inv() * Rotation.from_matrix(R2)).magnitude()
    np.testing.assert_allclose(a1, a2, atol=1e-6)
    # endpoints
    np.testing.assert_allclose(
        pose.interpolate_pose(0.0, 0.0, p1, 1.0, p2), p1, atol=1e-6
    )
    np.testing.assert_allclose(
        pose.interpolate_pose(1.0, 0.0, p1, 1.0, p2), p2, atol=1e-6
    )


def test_qvec_rotmat_roundtrip(rng):
    q = random_quats(rng, 10)
    q[q[:, 0] < 0] *= -1
    for i in range(10):
        R = pose.qvec2rotmat(q[i])
        np.testing.assert_allclose(pose.rotmat2qvec(R), q[i], atol=1e-9)
