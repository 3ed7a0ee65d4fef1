"""Decompose the per-frame device program (pose / rasterize / encode+pack).

The bench scene loop measured ~55 ms/frame device-side while the bare
rasterizer runs at ~15 ms (67.7 f/s) — this script attributes the gap.
Each stage is timed as its own jitted program with K-iteration fori_loop
bodies where possible; otherwise composite differences (dispatch floor
through the dev tunnel is ~2.7 ms/call, so per-call timing at 30+ reps
is accurate to ~0.1 ms/frame).

Run on the TPU chip:  python benchmarks/frame_stage_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import merge
from pegasus_tpu.ops.render import encode_frame, pack_frame_bytes, render_frame
from pegasus_tpu.scene.composition import SceneTemplate, pose_scene
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3, out


def main():
    rng = np.random.default_rng(7)
    env = make_plane_cloud(rng, n=150_000, size=2.0)
    objs = [
        make_box_cloud(
            rng, n=10_000,
            center=(0.1 * i - 0.2, 0.05 * i, 0.08),
            object_id=i + 1,
            rgb=((0.2 + 0.1 * i) % 1.0, 0.5, (0.9 - 0.1 * i) % 1.0),
        )
        for i in range(6)
    ]
    template = SceneTemplate.build(env, objs, pad_to=256_000)
    template = jax.device_put(template)
    body_R = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (7, 1, 1))
    body_t = jnp.zeros((7, 3), jnp.float32)
    colors = jnp.asarray(rng.random((6, 3)), jnp.float32)
    cam = Camera.look_at(
        eye=(0.9, 0.7, 0.9), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(60), fovy=np.deg2rad(47), width=640, height=480,
    )

    if jax.default_backend() == "cpu":
        from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled as rfn
    else:
        from pegasus_tpu.ops.rasterize_pallas import rasterize_pallas as rfn

    pose_p = jax.jit(pose_scene)
    render_p = jax.jit(
        lambda s, c, col: render_frame(s, c, col, rasterize_fn=rfn)
    )
    pack_p = jax.jit(lambda f: pack_frame_bytes(encode_frame(f)))
    full_p = jax.jit(
        lambda t, R, tr, c, col: pack_frame_bytes(
            encode_frame(
                render_frame(pose_scene(t, R, tr), c, col, rasterize_fn=rfn)
            )
        )
    )
    render_pack_p = jax.jit(
        lambda s, c, col: pack_frame_bytes(
            encode_frame(render_frame(s, c, col, rasterize_fn=rfn))
        )
    )

    ms_pose, posed = timeit(pose_p, template, body_R, body_t)
    ms_render, frame = timeit(render_p, posed, cam, colors)
    ms_pack, _ = timeit(pack_p, frame)
    ms_rp, _ = timeit(render_pack_p, posed, cam, colors)
    ms_full, _ = timeit(full_p, template, body_R, body_t, cam, colors)

    print(f"pose_scene       : {ms_pose:7.2f} ms")
    print(f"render_frame     : {ms_render:7.2f} ms")
    print(f"encode+pack      : {ms_pack:7.2f} ms")
    print(f"render+pack fused: {ms_rp:7.2f} ms")
    print(f"full frame       : {ms_full:7.2f} ms")
    print(f"-> static-mode hoist saves ~{ms_full - ms_rp:.2f} ms/frame "
          f"({(ms_full - ms_rp) * 0.3:.1f} s per 300-frame scene)")


if __name__ == "__main__":
    main()
