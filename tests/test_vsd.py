"""Native vsd vs bop_toolkit's own visibility/cost logic.

The visibility module of bop_toolkit is pure numpy, so it can be imported
from the reference checkout and fed OUR rendered distance images — if our
vsd agrees with the error assembled from bop_toolkit's masks and the
published formula (pose_error.py:48-95), the native implementation is
faithful end to end.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from pegasus_tpu.eval import depth_to_dist, render_mesh_depth, vsd
from pegasus_tpu.io.mesh import TriMesh

BOP_LIB = Path("/root/reference/submodules/bop_toolkit")


def _box_mesh(he=(30.0, 40.0, 25.0)) -> TriMesh:
    hx, hy, hz = he
    v = np.array(
        [[sx * hx, sy * hy, sz * hz]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    f = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
         [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
         [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32,
    )
    return TriMesh(v, f)


K = np.array([[120.0, 0, 64.0], [0, 120.0, 48.0], [0, 0, 1.0]])
W, H = 128, 96


def test_mesh_depth_renderer_geometry():
    """Front face of a box at z=500 must read ~475 (500 - hz=25)."""
    mesh = _box_mesh()
    depth = render_mesh_depth(mesh, np.eye(3), [0, 0, 500.0], K, W, H)
    assert (depth > 0).any()
    center = depth[H // 2, W // 2]
    np.testing.assert_allclose(center, 475.0, atol=1.0)
    # footprint roughly matches the projected box: 60 x 80 mm at z=475
    w_px = 2 * 30.0 * K[0, 0] / 475.0
    cols = (depth > 0).any(axis=0).sum()
    assert abs(cols - w_px) < 4


def test_vsd_zero_for_identical_pose():
    mesh = _box_mesh()
    R, t = np.eye(3), np.array([0, 0, 500.0])
    depth_test = render_mesh_depth(mesh, R, t, K, W, H)
    errs = vsd(R, t, R, t, depth_test, K, delta=15.0, taus=[20.0],
               normalized_by_diameter=False, diameter=100.0, mesh=mesh)
    assert errs[0] < 1e-9


def test_vsd_increases_with_misalignment():
    mesh = _box_mesh()
    R, t = np.eye(3), np.array([0, 0, 500.0])
    depth_test = render_mesh_depth(mesh, R, t, K, W, H)
    diam = float(np.linalg.norm([60, 80, 50]))
    taus = list(np.arange(0.05, 0.51, 0.05))
    small = vsd(R, t + [2, 0, 0], R, t, depth_test, K, 15.0, taus, True,
                diam, mesh)
    large = vsd(R, t + [40, 0, 0], R, t, depth_test, K, 15.0, taus, True,
                diam, mesh)
    assert np.mean(small) < np.mean(large)
    assert 0.0 <= np.mean(small) <= 1.0 and np.mean(large) <= 1.0


@pytest.mark.skipif(not BOP_LIB.exists(), reason="reference not available")
def test_vsd_agrees_with_bop_toolkit_logic():
    """Assemble vsd from bop_toolkit's OWN visibility masks + published
    formula over our rendered distance images; must match our vsd."""
    sys.path.insert(0, str(BOP_LIB))
    try:
        from bop_toolkit_lib import visibility
    except Exception as e:  # pragma: no cover
        pytest.skip(f"bop_toolkit visibility not importable: {e}")
    finally:
        sys.path.pop(0)

    mesh = _box_mesh()
    R_gt, t_gt = np.eye(3), np.array([0, 0, 500.0])
    ang = np.deg2rad(12.0)
    R_est = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1.0]]
    )
    t_est = t_gt + np.array([8.0, -5.0, 20.0])
    # scene depth: the object in GT pose plus a near plane occluder strip
    depth_test = render_mesh_depth(mesh, R_gt, t_gt, K, W, H)
    depth_test[:, :20] = 300.0

    delta, taus = 15.0, [0.05, 0.1, 0.2, 0.5]
    diam = float(np.linalg.norm([60, 80, 50]))

    ours = vsd(R_est, t_est, R_gt, t_gt, depth_test, K, delta, taus, True,
               diam, mesh)

    # bop_toolkit's pipeline with the same rendered depths
    depth_est = render_mesh_depth(mesh, R_est, t_est, K, W, H)
    depth_gt = render_mesh_depth(mesh, R_gt, t_gt, K, W, H)
    dist_test = depth_to_dist(depth_test, K)
    dist_gt = depth_to_dist(depth_gt, K)
    dist_est = depth_to_dist(depth_est, K)
    visib_gt = visibility.estimate_visib_mask_gt(
        dist_test, dist_gt, delta, visib_mode="bop19"
    )
    visib_est = visibility.estimate_visib_mask_est(
        dist_test, dist_est, visib_gt, delta, visib_mode="bop19"
    )
    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    dists = np.abs(dist_gt[inter] - dist_est[inter]) / diam
    theirs = []
    for tau in taus:
        costs = dists >= tau
        theirs.append(
            (costs.sum() + union.sum() - inter.sum()) / float(union.sum())
        )
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_native_zbuffer_matches_numpy_reference():
    """csrc/zbuffer.cpp must reproduce the NumPy z-buffer to the ulp
    (same bbox / inclusive-edge / perspective-correct-1/z rules)."""
    import pegasus_tpu.io.zbuffer as zb

    if not zb.available():
        pytest.skip("no native zbuffer (compiler unavailable)")

    rng = np.random.default_rng(3)
    mesh = _box_mesh()
    for _ in range(4):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0, np.pi)
        kx, ky, kz = axis
        Km = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
        R = np.eye(3) + np.sin(ang) * Km + (1 - np.cos(ang)) * Km @ Km
        t = np.array([rng.uniform(-20, 20), rng.uniform(-15, 15),
                      rng.uniform(300, 600)])
        native = zb.render_depth(mesh.vertices, mesh.faces, R, t, K, W, H)
        assert native is not None
        lib, failed = zb._LIB, zb._LIB_FAILED
        zb._LIB, zb._LIB_FAILED = None, True  # force the NumPy path
        try:
            ref = render_mesh_depth(mesh, R, t, K, W, H)
        finally:
            zb._LIB, zb._LIB_FAILED = lib, failed
        np.testing.assert_allclose(native, ref, rtol=1e-12, atol=1e-12)
