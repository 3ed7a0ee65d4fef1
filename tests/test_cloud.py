import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pegasus_tpu.gs import cloud as cloudlib
from pegasus_tpu.gs.cloud import GaussianCloud, merge
from pegasus_tpu.testing import make_random_cloud


def test_identity_transform_is_noop(rng):
    c = make_random_cloud(rng, n=32)
    c2 = c.transformed(np.eye(3), np.zeros(3))
    np.testing.assert_allclose(np.asarray(c2.xyz), np.asarray(c.xyz), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2.f_rest), np.asarray(c.f_rest), atol=1e-4)
    # rot normalized but same rotation
    from pegasus_tpu.utils import quaternion as quat

    R1 = np.asarray(quat.quat_to_rotmat(c.get_rotation()))
    R2 = np.asarray(quat.quat_to_rotmat(c2.rot))
    np.testing.assert_allclose(R1, R2, atol=1e-5)


def test_transform_rotates_about_centroid(rng):
    # reference semantics: rotation about the cloud mean, then translation
    # (reference: src/gs/gaussian_model.py:485-497)
    c = make_random_cloud(rng, n=64, center=(1.0, 2.0, 3.0))
    R = Rotation.random(random_state=5).as_matrix()
    t = np.array([0.1, -0.2, 0.3])
    c2 = c.transformed(R, t)
    mean = np.asarray(c.xyz).mean(axis=0)
    want = (np.asarray(c.xyz) - mean) @ R.T + mean + t
    np.testing.assert_allclose(np.asarray(c2.xyz), want, atol=1e-4)
    # centroid moves by exactly t
    np.testing.assert_allclose(
        np.asarray(c2.xyz).mean(axis=0), mean + t, atol=1e-4
    )


def test_transform_origin_pivot(rng):
    c = make_random_cloud(rng, n=16)
    R = Rotation.random(random_state=6).as_matrix()
    t = np.zeros(3)
    c2 = c.transformed(R, t, pivot="origin")
    want = np.asarray(c.xyz) @ R.T
    np.testing.assert_allclose(np.asarray(c2.xyz), want, atol=1e-5)


def test_covariance_rotates_covariantly(rng):
    c = make_random_cloud(rng, n=16)
    R = Rotation.random(random_state=9).as_matrix()
    cov_before = np.asarray(c.covariance())
    c2 = c.transformed(R, np.zeros(3), pivot="origin")
    cov_after = np.asarray(c2.covariance())
    want = np.einsum("ij,njk,lk->nil", R, cov_before, R)
    np.testing.assert_allclose(cov_after, want, atol=1e-5)


def test_merge_and_padding(rng):
    a = make_random_cloud(rng, n=10, object_id=0)
    b = make_random_cloud(rng, n=6, object_id=1)
    m = merge([a, b])
    assert m.num_splats == 16
    assert np.asarray(m.object_id[:10]).max() == 0
    assert np.asarray(m.object_id[10:]).min() == 1

    p = m.padded(32)
    assert p.num_splats == 32
    assert not np.asarray(p.alive[16:]).any()
    np.testing.assert_allclose(np.asarray(p.get_opacity()[16:]), 0.0, atol=1e-6)


def test_masked_kills_splats(rng):
    c = make_random_cloud(rng, n=8)
    keep = np.array([True, False] * 4)
    c2 = c.masked(keep)
    assert np.asarray(c2.alive).sum() == 4
    assert np.asarray(c2.get_opacity()[1]) == 0.0


def test_with_flat_color(rng):
    c = make_random_cloud(rng, n=8)
    c2 = c.with_flat_color((0.2, 0.6, 0.9))
    np.testing.assert_allclose(
        np.asarray(c2.get_rgb()), np.tile([[0.2, 0.6, 0.9]], (8, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(c2.f_rest), 0.0)


def test_incremental_vs_direct_pose(rng):
    """Dynamic mode applies delta poses per frame
    (reference: src/gs/pegasus_setup.py:178-193).  Composing deltas must
    track the direct pose closely."""
    c = make_random_cloud(rng, n=32)
    rots = [Rotation.random(random_state=i) for i in range(8)]
    # incremental: q_delta = q_t * q_{t-1}^-1 applied per step
    inc = c.transformed(rots[0].as_matrix(), np.zeros(3))
    for i in range(1, 8):
        delta = (rots[i] * rots[i - 1].inv()).as_matrix()
        inc = inc.transformed(delta, np.zeros(3))
    direct = c.transformed(rots[-1].as_matrix(), np.zeros(3))
    np.testing.assert_allclose(
        np.asarray(inc.xyz), np.asarray(direct.xyz), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(inc.f_rest), np.asarray(direct.f_rest), atol=5e-3
    )
