"""GS-submodule utility surface (pegasus_tpu/compat_utils.py).

Contracts from the reference's call sites (src/gs/gaussian_model.py:27-32)
cross-checked against the repo's own pytree math where both exist."""

import numpy as np

from pegasus_tpu import compat_utils as cu


def test_inverse_sigmoid_roundtrip():
    x = np.array([0.05, 0.3, 0.7, 0.95])
    y = cu.inverse_sigmoid(x)
    np.testing.assert_allclose(1.0 / (1.0 + np.exp(-y)), x, rtol=1e-12)


def test_expon_lr_endpoints_and_delay():
    f = cu.get_expon_lr_func(1e-3, 1e-5, max_steps=1000)
    np.testing.assert_allclose(f(0), 1e-3, rtol=1e-12)
    np.testing.assert_allclose(f(1000), 1e-5, rtol=1e-12)
    # log-linear midpoint = geometric mean
    np.testing.assert_allclose(f(500), np.sqrt(1e-3 * 1e-5), rtol=1e-12)
    assert f(-1) == 0.0
    g = cu.get_expon_lr_func(1e-3, 1e-5, lr_delay_steps=100,
                             lr_delay_mult=0.1, max_steps=1000)
    np.testing.assert_allclose(g(0), 0.1 * 1e-3, rtol=1e-12)
    assert g(100) > g(0)


def test_build_rotation_matches_quaternion_module():
    from pegasus_tpu.utils.quaternion import quat_to_rotmat

    rng = np.random.default_rng(0)
    q = rng.normal(size=(32, 4))
    R_np = cu.build_rotation(q)
    R_jax = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(R_np, R_jax, atol=1e-6)
    # orthonormality
    eye = np.einsum("nij,nkj->nik", R_np, R_np)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-12)


def test_scaling_rotation_covariance():
    rng = np.random.default_rng(1)
    s = np.exp(rng.normal(size=(16, 3)) * 0.3)
    q = rng.normal(size=(16, 4))
    L = cu.build_scaling_rotation(s, q)
    cov = np.einsum("nij,nkj->nik", L, L)
    six = cu.strip_symmetric(cov)
    # symmetric positive-definite with the documented storage order
    np.testing.assert_allclose(six[:, 0], cov[:, 0, 0])
    np.testing.assert_allclose(six[:, 4], cov[:, 1, 2])
    assert (np.linalg.eigvalsh(cov) > 0).all()


def test_world2view_against_camera_module():
    from pegasus_tpu.utils.quaternion import quat_to_rotmat

    rng = np.random.default_rng(2)
    q = rng.normal(size=(1, 4))
    Rw2c = np.asarray(quat_to_rotmat(q))[0]
    t = rng.normal(size=3)
    # reference stores R TRANSPOSED (cam-to-world rotation)
    W2C = cu.getWorld2View2(Rw2c.T, t)
    np.testing.assert_allclose(W2C[:3, :3], Rw2c, atol=1e-6)
    np.testing.assert_allclose(W2C[:3, 3], t, atol=1e-6)
    pt = rng.normal(size=(5, 3))
    # row-vector convention: x_cam = [x, 1] @ W2C.T
    out = cu.geom_transform_points(pt, W2C.T)
    np.testing.assert_allclose(out, pt @ Rw2c.T + t, atol=1e-5)


def test_basic_point_cloud_and_mkdir(tmp_path):
    pc = cu.BasicPointCloud(
        points=np.zeros((4, 3)), colors=np.ones((4, 3)), normals=np.zeros((4, 3))
    )
    assert pc.points.shape == (4, 3)
    d = tmp_path / "a" / "b"
    cu.mkdir_p(d)
    cu.mkdir_p(d)  # idempotent
    assert d.is_dir()
