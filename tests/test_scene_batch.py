"""Sharded scene-variant generation (BASELINE eval config #5, small)."""

import numpy as np
import jax
import jax.numpy as jnp

from pegasus_tpu.camera import Camera
from pegasus_tpu.parallel.mesh import make_mesh
from pegasus_tpu.parallel.scene_batch import generate_scene_variants
from pegasus_tpu.physics import rigid_body as rb
from pegasus_tpu.scene.composition import SceneTemplate
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud


def test_generate_scene_variants_sharded(rng):
    env = make_plane_cloud(rng, n=512, size=1.5)
    objs = [
        make_box_cloud(rng, n=128, object_id=1),
        make_box_cloud(rng, n=128, object_id=2, rgb=(0.2, 0.6, 0.9)),
    ]
    template = SceneTemplate.build(env, objs)
    n_bodies = template.num_bodies

    corners = np.array(
        [[sx * 0.05, sy * 0.05, sz * 0.08]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )
    params = rb.RigidBodyParams(
        inv_mass=jnp.array([0.0] + [5.0] * (n_bodies - 1)),
        inv_inertia=jnp.tile(jnp.full((1, 3), 1e3), (n_bodies, 1)),
        points=jnp.tile(corners[None], (n_bodies, 1, 1)),
        point_mask=jnp.ones((n_bodies, 8), bool),
        radius=jnp.full((n_bodies,), 0.11),
        friction=jnp.full((n_bodies,), 0.5),
        restitution=jnp.zeros((n_bodies,)),
        body_mask=jnp.ones((n_bodies,), bool),
    )
    cam = Camera.look_at(
        eye=(0.6, 0.5, 0.7), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(55), fovy=np.deg2rad(45), width=48, height=32,
    )

    mesh = make_mesh((8,), ("scene",))
    res = generate_scene_variants(
        template, params, cam, n_variants=16, n_steps=250, seed=3, mesh=mesh,
        drop_height=(0.12, 0.18),
        max_objects=4,
    )
    assert res.rgb.shape == (16, 32, 48, 3)
    assert bool(jnp.all(jnp.isfinite(res.rgb)))
    # variants differ (randomized drops)
    assert float(jnp.abs(res.rgb[0] - res.rgb[1]).max()) > 0.01
    # objects settled: final z above the plane, below the drop window
    z = np.asarray(res.final_pos)[:, 1:3, 2]
    assert z.min() > 0.0 and z.max() < 0.28  # settled (may rest on a neighbor)
    # rest orientations are unit quaternions
    qn = np.linalg.norm(np.asarray(res.final_rot), axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)
