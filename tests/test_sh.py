import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pegasus_tpu.utils import sh as shlib


def random_dirs(rng, n):
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray([[0.1, 0.5, 0.9]])
    np.testing.assert_allclose(
        np.asarray(shlib.sh2rgb(shlib.rgb2sh(rgb))), np.asarray(rgb), atol=1e-6
    )


def test_eval_sh_dc_only(rng):
    # deg 0: constant C0 * dc regardless of direction
    sh = rng.normal(size=(5, 1, 3)).astype(np.float32)
    dirs = random_dirs(rng, 5).astype(np.float32)
    out = np.asarray(shlib.eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs)))
    np.testing.assert_allclose(out, shlib.C0 * sh[:, 0, :], atol=1e-6)


def test_band_rotation_is_orthogonal(rng):
    R = Rotation.random(random_state=7).as_matrix()
    for band in (1, 2, 3):
        D = np.asarray(shlib.sh_band_rotation(jnp.asarray(R, jnp.float32), band))
        np.testing.assert_allclose(D @ D.T, np.eye(D.shape[0]), atol=1e-4)


def test_band_rotation_identity():
    for band in (1, 2, 3):
        D = np.asarray(shlib.sh_band_rotation(jnp.eye(3, dtype=jnp.float32), band))
        np.testing.assert_allclose(D, np.eye(D.shape[0]), atol=1e-5)


def test_band_rotation_composition(rng):
    R1 = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    R2 = Rotation.random(random_state=2).as_matrix().astype(np.float32)
    for band in (1, 2, 3):
        D12 = np.asarray(shlib.sh_band_rotation(jnp.asarray(R1 @ R2), band))
        D1 = np.asarray(shlib.sh_band_rotation(jnp.asarray(R1), band))
        D2 = np.asarray(shlib.sh_band_rotation(jnp.asarray(R2), band))
        np.testing.assert_allclose(D12, D1 @ D2, atol=1e-4)


def test_sh_rotation_functional_identity(rng):
    """The ground-truth property: rotating coefficients by R makes the
    radiance field rotate with the object, i.e.
        f_rotated(d) == f(R^T d)    for all directions d.
    This is the contract the reference implements with e3nn Wigner-D
    matrices (reference: src/gs/gaussian_model.py:507-546)."""
    n = 4
    f_dc = rng.normal(size=(n, 1, 3)).astype(np.float32)
    f_rest = rng.normal(size=(n, 15, 3)).astype(np.float32)
    R = Rotation.random(random_state=11).as_matrix().astype(np.float32)

    rotated_rest = np.asarray(
        shlib.rotate_sh_rest(jnp.asarray(f_rest), jnp.asarray(R), deg=3)
    )

    dirs = random_dirs(rng, 50).astype(np.float32)
    sh_orig = np.concatenate([f_dc, f_rest], axis=1)
    sh_rot = np.concatenate([f_dc, rotated_rest], axis=1)

    # f_rotated evaluated at d
    got = np.asarray(
        shlib.eval_sh(
            3,
            jnp.asarray(sh_rot)[:, None, :, :],
            jnp.asarray(dirs)[None, :, :],
        )
    )  # [n, 50, 3]
    # f evaluated at R^T d
    back_dirs = dirs @ R  # (R^T d)^T = d^T R
    want = np.asarray(
        shlib.eval_sh(
            3,
            jnp.asarray(sh_orig)[:, None, :, :],
            jnp.asarray(back_dirs)[None, :, :],
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)
