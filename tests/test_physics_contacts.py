"""Contact-fidelity regressions beyond the single-cup Bullet cross-check:

  * edge contact: a thin plank leaning across a box's top edge must come
    to rest WITHOUT tunneling through the box (the point-vs-hull narrow
    phase must resolve contacts where no hull vertex of either body is
    inside the other — the classic failure of pure point sampling);
  * multi-object drops: simultaneous bodies must land without
    interpenetrating each other, with tight (12 mm / 60 mm) rest gates on
    the deterministic flat-drop scenario (reference behavior:
    physical_simulation.py:125-152 steps all bodies jointly in Bullet).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pegasus_tpu.physics import rigid_body as rb
from pegasus_tpu.utils import quaternion as quat


def _box_points(he):
    """Corners + face centers + edge midpoints of a box (26 points)."""
    he = np.asarray(he, np.float64)
    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    corners = signs * he
    faces = np.concatenate([np.diag(he), -np.diag(he)], axis=0)
    edges = []
    for ax in range(3):
        o1, o2 = (ax + 1) % 3, (ax + 2) % 3
        for s1 in (-1, 1):
            for s2 in (-1, 1):
                p = np.zeros(3)
                p[o1] = s1 * he[o1]
                p[o2] = s2 * he[o2]
                edges.append(p)
    return np.concatenate([corners, faces, np.asarray(edges)], axis=0)


def multi_box_params(halfs, masses, friction=0.5):
    """Body 0 = static plane env; bodies 1..N = boxes."""
    n_bodies = 1 + len(halfs)
    pts_list = [_box_points(h) for h in halfs]
    P = max(len(p) for p in pts_list)
    points = np.zeros((n_bodies, P, 3), np.float32)
    point_mask = np.zeros((n_bodies, P), bool)
    he_arr = np.full((n_bodies, 3), 1e-3, np.float32)
    inv_mass = np.zeros(n_bodies, np.float32)
    inv_inertia = np.zeros((n_bodies, 3), np.float32)
    radius = np.full(n_bodies, 1e-3, np.float32)
    for i, (h, m) in enumerate(zip(halfs, masses), start=1):
        p = pts_list[i - 1]
        points[i, : len(p)] = p
        point_mask[i, : len(p)] = True
        he_arr[i] = h
        inv_mass[i] = 1.0 / m
        ext = 2 * np.asarray(h)
        inertia = (m / 12.0) * np.array(
            [
                ext[1] ** 2 + ext[2] ** 2,
                ext[0] ** 2 + ext[2] ** 2,
                ext[0] ** 2 + ext[1] ** 2,
            ]
        )
        inv_inertia[i] = 1.0 / inertia
        radius[i] = float(np.linalg.norm(h))
    return rb.RigidBodyParams(
        inv_mass=jnp.asarray(inv_mass),
        inv_inertia=jnp.asarray(inv_inertia),
        points=jnp.asarray(points),
        point_mask=jnp.asarray(point_mask),
        radius=jnp.asarray(radius),
        friction=jnp.full((n_bodies,), friction),
        restitution=jnp.zeros((n_bodies,)),
        body_mask=jnp.ones((n_bodies,), bool),
        half_extents=jnp.asarray(he_arr),
    )


def _max_penetration_into_box(pos_a, rot_a, points_a, pos_b, rot_b, he_b):
    """Deepest penetration of body A's sample points into box B (m)."""
    Ra = np.asarray(quat.quat_to_rotmat(jnp.asarray(rot_a)))
    Rb = np.asarray(quat.quat_to_rotmat(jnp.asarray(rot_b)))
    world = pos_a + points_a @ Ra.T
    local = (world - pos_b) @ Rb
    pen = np.min(he_b - np.abs(local), axis=-1)  # >0 => inside
    return float(pen.max())


def test_plank_leaning_on_box_edge_contact():
    """A thin plank released leaning across a box's top edge must resolve
    the edge contact: settle, never tunnel into the box, and end supported
    (one end region near the ground, the middle across the box)."""
    box_he = (0.05, 0.05, 0.025)
    plank_he = (0.10, 0.02, 0.004)
    params = multi_box_params([box_he, plank_he], [0.5, 0.05], friction=0.6)

    # plank tilted so it crosses the box's +x top edge (x = 0.05, z = 0.05)
    tilt = np.deg2rad(22.0)
    rot_p = np.array(
        [np.cos(tilt / 2), 0.0, np.sin(tilt / 2), 0.0], np.float32
    )  # pitch about +y: +x end dips down
    # center placed so the plank's underside grazes the edge at release
    pos_p = np.array([0.09, 0.0, 0.062], np.float32)
    pos0 = np.array([[0, 0, 0], [0, 0, box_he[2]], pos_p], np.float32)
    rot0 = np.array(
        [[1, 0, 0, 0], [1, 0, 0, 0], list(rot_p)], np.float32
    )
    state0 = rb.RigidBodyState.rest(pos0, rot0)
    traj, final = rb.simulate(params, state0, n_steps=1200)

    pts_p = np.asarray(params.points[2])[np.asarray(params.point_mask[2])]
    pos_t = np.asarray(traj.pos)
    rot_t = np.asarray(traj.rot)
    # no tunneling at ANY step: plank points never sink deep into the box
    worst = max(
        _max_penetration_into_box(
            pos_t[s, 2], rot_t[s, 2], pts_p,
            pos_t[s, 1], rot_t[s, 1], np.asarray(box_he),
        )
        for s in range(0, pos_t.shape[0], 10)
    )
    assert worst < 0.010, f"plank tunnels {worst * 1e3:.1f} mm into the box"
    # plank does not fall through the ground either
    assert pos_t[:, 2, 2].min() > 0.0

    # settled
    assert float(jnp.linalg.norm(final.linvel[2])) < 0.25
    # final pose: still leaning in band between flat-on-ground and
    # flat-on-box-top (it may slide off and land flat — both are physical;
    # tunneling through the box or ground is the failure mode regressed)
    z_end = float(final.pos[2, 2])
    assert 0.002 < z_end < 0.08, f"plank center z {z_end:.3f} out of band"


def test_multi_object_drop_tight_rest_gates():
    """Four boxes dropped side by side: 12 mm rest-height gate, 60 mm
    lateral-drift gate, and pairwise non-penetration at rest (VERDICT r2
    item 5: multi-object fixture with halved tolerances)."""
    he = (0.03, 0.03, 0.02)
    n = 4
    drops = np.array(
        [[-0.10, -0.10], [0.10, -0.10], [-0.10, 0.10], [0.10, 0.10]]
    )
    params = multi_box_params([he] * n, [0.2] * n)
    pos0 = np.zeros((n + 1, 3), np.float32)
    rot0 = np.tile([1.0, 0, 0, 0], (n + 1, 1)).astype(np.float32)
    for i in range(n):
        pos0[i + 1, :2] = drops[i]
        pos0[i + 1, 2] = 0.15 + 0.03 * i
    state0 = rb.RigidBodyState.rest(pos0, rot0)
    traj, final = rb.simulate(params, state0, n_steps=1000)

    pos_f = np.asarray(final.pos)
    for i in range(1, n + 1):
        assert abs(pos_f[i, 2] - he[2]) < 0.012, (
            f"body {i} rest z {pos_f[i, 2]:.4f} vs {he[2]}"
        )
        drift = np.linalg.norm(pos_f[i, :2] - drops[i - 1])
        # r4: flat symmetric drops measure 0 mm drift; 20 mm of slack is
        # plenty (was 60 mm)
        assert drift < 0.020, f"body {i} drifted {drift * 1e3:.0f} mm"
        assert float(jnp.linalg.norm(final.linvel[i])) < 0.15

    # pairwise non-penetration at rest
    pts = np.asarray(params.points[1])[np.asarray(params.point_mask[1])]
    rot_f = np.asarray(final.rot)
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            if i == j:
                continue
            pen = _max_penetration_into_box(
                pos_f[i], rot_f[i], pts, pos_f[j], rot_f[j], np.asarray(he)
            )
            assert pen < 0.004, f"bodies {i},{j} interpenetrate {pen * 1e3:.1f} mm"


def test_stacked_drop_no_interpenetration():
    """A box dropped squarely onto another must stack: top box rests at
    bottom-top + own-half within 12 mm, no interpenetration (the pair
    impulse path carries the full weight through the contact)."""
    he = (0.04, 0.04, 0.03)
    params = multi_box_params([he, he], [0.3, 0.3])
    pos0 = np.array(
        [[0, 0, 0], [0, 0, he[2]], [0.005, 0.0, 0.25]], np.float32
    )
    rot0 = np.tile([1.0, 0, 0, 0], (3, 1)).astype(np.float32)
    state0 = rb.RigidBodyState.rest(pos0, rot0)
    traj, final = rb.simulate(params, state0, n_steps=1200)

    pos_f = np.asarray(final.pos)
    # bottom box stays put
    assert abs(pos_f[1, 2] - he[2]) < 0.012
    # top box rests on the bottom one
    assert abs(pos_f[2, 2] - 3 * he[2]) < 0.012, (
        f"top box rest z {pos_f[2, 2]:.4f} vs {3 * he[2]}"
    )
    pts = np.asarray(params.points[1])[np.asarray(params.point_mask[1])]
    pen = _max_penetration_into_box(
        pos_f[2], np.asarray(final.rot)[2], pts,
        pos_f[1], np.asarray(final.rot)[1], np.asarray(he),
    )
    assert pen < 0.006, f"stack interpenetrates {pen * 1e3:.1f} mm"


def _corners_only_params(halfs, masses, friction=0.5):
    """Like multi_box_params but collision points are the 8 CORNERS only —
    no face centers or edge midpoints, so point-vs-hull cannot resolve a
    mid-span edge crossing and the edge-edge narrow phase is isolated."""
    n_bodies = 1 + len(halfs)
    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )
    points = np.zeros((n_bodies, 8, 3), np.float32)
    point_mask = np.zeros((n_bodies, 8), bool)
    he_arr = np.full((n_bodies, 3), 1e-3, np.float32)
    inv_mass = np.zeros(n_bodies, np.float32)
    inv_inertia = np.zeros((n_bodies, 3), np.float32)
    radius = np.full(n_bodies, 1e-3, np.float32)
    for i, (h, m) in enumerate(zip(halfs, masses), start=1):
        points[i] = signs * np.asarray(h, np.float32)
        point_mask[i] = True
        he_arr[i] = h
        inv_mass[i] = 1.0 / m
        ext = 2 * np.asarray(h)
        inertia = (m / 12.0) * np.array(
            [
                ext[1] ** 2 + ext[2] ** 2,
                ext[0] ** 2 + ext[2] ** 2,
                ext[0] ** 2 + ext[1] ** 2,
            ]
        )
        inv_inertia[i] = 1.0 / inertia
        radius[i] = float(np.linalg.norm(h))
    return rb.RigidBodyParams(
        inv_mass=jnp.asarray(inv_mass),
        inv_inertia=jnp.asarray(inv_inertia),
        points=jnp.asarray(points),
        point_mask=jnp.asarray(point_mask),
        radius=jnp.asarray(radius),
        friction=jnp.full((n_bodies,), friction),
        restitution=jnp.zeros((n_bodies,)),
        body_mask=jnp.ones((n_bodies,), bool),
        half_extents=jnp.asarray(he_arr),
    )


def test_crossed_thin_boxes_edge_edge_contact():
    """Two long thin boxes crossed like an X: the upper one must come to
    rest ON the lower one purely through an edge-edge contact — no vertex
    of either box is ever inside the other, the failure case of pure
    point-vs-hull narrow phases (Bullet resolves it via GJK edge-edge
    features, reference: physical_simulation.py:126).  The counterfactual
    (edge pass masked off) is asserted to TUNNEL, proving the fixture
    isolates the edge-edge path."""
    he1 = (0.25, 0.03, 0.03)  # long in x, on the ground
    he2 = (0.03, 0.25, 0.03)  # long in y, dropped crossing it
    params = _corners_only_params([he1, he2], [0.5, 0.2], friction=0.6)

    pos0 = np.array(
        [[0, 0, 0], [0, 0, he1[2]], [0.0, 0.0, 0.14]], np.float32
    )
    rot0 = np.tile([1.0, 0, 0, 0], (3, 1)).astype(np.float32)
    state0 = rb.RigidBodyState.rest(pos0, rot0)

    traj, final = rb.simulate(params, state0, n_steps=1500)
    z_top = float(final.pos[2, 2])
    rest_z = 2 * he1[2] + he2[2]  # 0.09: resting across box1's top
    assert abs(z_top - rest_z) < 0.012, (
        f"crossed box rest z {z_top:.4f} vs {rest_z} — edge contact failed"
    )
    assert abs(float(final.pos[1, 2]) - he1[2]) < 0.012
    assert float(jnp.linalg.norm(final.linvel[2])) < 0.2

    # counterfactual: with edge-edge contacts masked off, the upper box
    # falls THROUGH the lower one (corners never penetrate its hull)
    params_no_edge = params.replace(
        edge_mask=jnp.zeros_like(params.edge_mask)
    )
    _, final_ne = rb.simulate(params_no_edge, state0, n_steps=1500)
    z_ne = float(final_ne.pos[2, 2])
    assert z_ne < rest_z - 0.025, (
        f"counterfactual rested at {z_ne:.4f} — fixture does not isolate "
        "the edge-edge path"
    )


def test_hull_edges_from_mesh_box():
    """A box mesh yields exactly its 12 sharp edges (coplanar-crease
    filtering must not drop real corners), padded and masked to cap."""
    from pegasus_tpu.physics.engine import hull_edges_from_mesh

    he = np.array([0.05, 0.03, 0.02])
    verts = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    ) * he
    a, b, mask = hull_edges_from_mesh(verts, k=24)
    assert mask.sum() == 12
    lengths = np.linalg.norm(b[mask] - a[mask], axis=1)
    expect = sorted([2 * he[0]] * 4 + [2 * he[1]] * 4 + [2 * he[2]] * 4)
    np.testing.assert_allclose(sorted(lengths), expect, atol=1e-6)
    # endpoints are hull vertices
    for p in np.concatenate([a[mask], b[mask]]):
        assert np.min(np.linalg.norm(verts - p, axis=1)) < 1e-6


def test_hull_edges_cap_keeps_longest():
    """With more sharp edges than the cap, the longest are kept."""
    from pegasus_tpu.physics.engine import hull_edges_from_mesh

    rng = np.random.default_rng(3)
    verts = rng.normal(size=(64, 3))
    a8, b8, m8 = hull_edges_from_mesh(verts, k=8)
    a99, b99, m99 = hull_edges_from_mesh(verts, k=512)
    if m99.sum() > 8:
        assert m8.sum() == 8
        l8 = np.sort(np.linalg.norm(b8[m8] - a8[m8], axis=1))[::-1]
        l99 = np.sort(np.linalg.norm(b99[m99] - a99[m99], axis=1))[::-1]
        np.testing.assert_allclose(l8, l99[:8], atol=1e-9)


def test_edge_normal_oriented_by_facet_not_centers():
    """A steeply tilted rod whose LOW end is crossed from above by a second
    rod: the true contact normal points DOWN (from the upper rod j toward
    the lower rod i), but the body-center offset points UP (i's center is
    far above j's).  The manifold must orient by j's binding hull facet,
    not by centers — a center-oriented normal here flips the impulse and
    pulls the rods together."""
    import pegasus_tpu.physics.rigid_body as rbm

    theta = np.deg2rad(60.0)
    he_i = (0.4, 0.02, 0.02)   # long rod, tilted about +y: +x end dips
    he_j = (0.02, 0.4, 0.02)   # crossing rod, long in y
    params = _corners_only_params([he_i, he_j], [0.3, 0.3])

    rot_i = np.array(
        [np.cos(theta / 2), 0.0, np.sin(theta / 2), 0.0], np.float32
    )
    end = np.array([0.4 * np.cos(theta), 0.0, -0.4 * np.sin(theta)])
    pos_i = np.array([0.0, 0.0, 0.45], np.float32)
    low_end = pos_i + end.astype(np.float32)      # z ~ 0.104
    # j crosses just above i's low end: i's upper surface ~ low_end.z+0.02,
    # j's lower surface 0.02 below its center -> ~3 mm overlap
    pos_j = np.array([low_end[0], 0.0, low_end[2] + 0.037], np.float32)

    pos0 = np.stack([np.zeros(3, np.float32), pos_i, pos_j])
    rot0 = np.stack(
        [np.array([1, 0, 0, 0], np.float32), rot_i,
         np.array([1, 0, 0, 0], np.float32)]
    )
    state = rb.RigidBodyState.rest(pos0, rot0)

    active, pen, n, r_i, r_j, m_eff, _ = rbm._edge_manifold(state, params)
    act = np.asarray(active[1, 2])
    nz = np.asarray(n[1, 2, :, 2])
    assert act.any(), "no edge contact found at the crossing"
    # every active contact normal points DOWN (from j toward i), despite
    # pos_i - pos_j having a +z component of ~0.3
    assert float(pos0[1, 2] - pos0[2, 2]) > 0.25
    # the SAT cross axis of a 60-deg rod and a y-rod has |n_z| = 0.5; the
    # point is its SIGN: facet orientation gives -0.5, centers give +0.5
    assert (nz[act] < -0.3).all(), f"normals not facet-oriented: {nz[act]}"
