"""simulate_variants must collide against the baked heightfield.

Round-1's batch path silently used a flat plane while the sequential
path used the env's relief (VERDICT weak #5).  Here the environment mesh
is a raised plateau: every batched variant's object must come to rest ON
the plateau (z ~ plateau height + half extent), not at the flat-plane
height.
"""

from pathlib import Path

import numpy as np
import pytest

from pegasus_tpu.assets.registry import Asset
from pegasus_tpu.io.mesh import TriMesh, save_obj
from pegasus_tpu.physics.engine import PhysicsEngine
from pegasus_tpu.physics.urdf import generate_urdf

PLATEAU = 0.15


def _plateau_mesh() -> TriMesh:
    """A 1x1 ground square with a raised 0.5x0.5 plateau at z=PLATEAU."""
    quads = [
        # ground ring (4 corners at z=0) — coarse outer square
        ([-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]),
        # plateau top
        (
            [-0.25, -0.25, PLATEAU], [0.25, -0.25, PLATEAU],
            [0.25, 0.25, PLATEAU], [-0.25, 0.25, PLATEAU],
        ),
    ]
    verts, faces = [], []
    for quad in quads:
        base = len(verts)
        verts.extend(quad)
        faces.append([base, base + 1, base + 2])
        faces.append([base, base + 2, base + 3])
    return TriMesh(np.asarray(verts, np.float64), np.asarray(faces, np.int32))


@pytest.fixture()
def plateau_assets(tmp_path):
    urdf = tmp_path / "urdf"
    urdf.mkdir()
    mesh = _plateau_mesh()
    save_obj(mesh, urdf / "plateau.obj")
    generate_urdf(
        urdf / "plateau.urdf", "plateau.obj", "plateau", mass=0.0,
        center_of_mass=(0, 0, 0), static=True,
    )
    box = TriMesh(
        np.asarray(
            [[sx * 0.03, sy * 0.03, sz * 0.03]
             for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float64,
        ),
        np.asarray(
            [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
             [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
             [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32,
        ),
    )
    save_obj(box, urdf / "cube.obj")
    generate_urdf(
        urdf / "cube.urdf", "cube.obj", "cube", mass=0.1,
        center_of_mass=(0, 0, 0),
    )
    env = Asset(OBJECT_NAME="plateau", ID=1001, TYPE="environment",
                dataset_path=str(tmp_path))
    obj = Asset(OBJECT_NAME="cube", ID=7, dataset_path=str(tmp_path))
    return urdf, env, obj


def test_batch_variants_ride_the_heightfield(plateau_assets, tmp_path):
    urdf, env, obj = plateau_assets
    engine = PhysicsEngine(
        asset_folder=str(urdf),
        output_path_json=str(tmp_path / "sim.json"),
        simulation_steps=600,
        seed=0,
    )
    engine.add_object(env, start_pos=(0, 0, 0))
    engine.add_object(obj, start_pos=(0.0, 0.0, 0.45))  # above the plateau
    assert engine.heightfield is not None
    # the baked field knows the plateau
    from pegasus_tpu.physics.heightfield import height_at

    h_center = float(height_at(engine.heightfield, 0.0, 0.0))
    assert abs(h_center - PLATEAU) < 0.03

    pos, rot = engine.simulate_variants(n_variants=4, seed=3)
    rest = pos[:, -1, 1, :]  # [V, 3] final cube pose
    # every variant rests ON the local terrain (plateau top, or the
    # ground ring if it tumbled off the edge) — the old batch path put
    # every variant at flat-plane height regardless of relief
    on_plateau = 0
    for v in range(rest.shape[0]):
        h_local = float(height_at(engine.heightfield, rest[v, 0], rest[v, 1]))
        assert abs(rest[v, 2] - (h_local + 0.03)) < 0.045, (
            v, rest[v], h_local
        )
        on_plateau += h_local > 0.1
    assert on_plateau >= 2, "expected most drops to settle on the plateau"

    # cross-check vs the sequential path: same terrain-consistent law
    traj = engine.simulate(write_json=False)
    seq = np.asarray(traj.times_t)[1, -1]
    h_seq = float(height_at(engine.heightfield, seq[0], seq[1]))
    assert abs(seq[2] - (h_seq + 0.03)) < 0.045
