"""Attribute bin_splats' internal cost at 1M splats (in-context, via DCE).

Times jitted truncations of the real binning computation — XLA dead-code
eliminates everything past the returned value, so differences attribute
stages IN CONTEXT (fusion included), unlike the isolated probes in
render_stage_tpu.py.

Run on the TPU chip:  python benchmarks/binning_stage_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import merge
from pegasus_tpu.ops import binning
from pegasus_tpu.ops.projection import project_gaussians
from pegasus_tpu.testing import make_box_cloud, make_plane_cloud

K = 20


def loop_time(make_body, init_carry):
    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, K, make_body, c0)

    out = run(init_carry)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.time()
    out = run(init_carry)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.time() - t0) / K * 1e3


def profile(n_env, n_obj_each, label, a_small, big_budget, a_big, entry_cap,
            mid_budget=0):
    rng = np.random.default_rng(7)
    env = make_plane_cloud(rng, n=n_env, size=2.0)
    objs = [
        make_box_cloud(
            rng, n=n_obj_each,
            center=(0.1 * i - 0.2, 0.05 * i, 0.08),
            object_id=i + 1,
            rgb=((0.2 + 0.1 * i) % 1.0, 0.5, (0.9 - 0.1 * i) % 1.0),
        )
        for i in range(6)
    ]
    scene = jax.device_put(merge([env] + objs))
    n = scene.num_splats
    cam = Camera.look_at(
        eye=(0.9, 0.7, 0.9), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(60), fovy=np.deg2rad(47), width=640, height=480,
    )
    proj = jax.jit(lambda s: project_gaussians(s, cam, None, 1.0))(scene)
    jax.block_until_ready(proj.mean_x)
    chunk = 512

    def run_to(stage):
        def body(i, c):
            p = proj._replace(mean_x=proj.mean_x + c * 0)
            b = binning.bin_splats(
                p, cam.width, cam.height, tile=16, a_small=a_small,
                big_budget=min(big_budget, n), a_big=a_big,
                lane_pad=chunk + 256, entry_cap=entry_cap,
                mid_budget=mid_budget,
                _stage=None if stage in ("full", "bounds") else stage,
            )
            if stage == "full":
                return b.params_t[0, 0] * 1e-20
            if stage == "bounds":  # sort + segment bounds, gather DCE'd
                return b.tile_start[0].astype(jnp.float32) * 1e-20
            leaf = jax.tree_util.tree_leaves(b)[0]
            return leaf.reshape(-1)[0].astype(jnp.float32) * 1e-20

        return loop_time(body, jnp.float32(0))

    print(f"\n== {label}: N={n:,} ==")
    prev = 0.0
    for stage in ("area", "small_key", "big_compact", "big_key",
                  "keys_vals", "sort", "bounds", "full"):
        ms = run_to(stage)
        print(f"{stage:12s}: {ms:7.2f} ms  (+{ms - prev:6.2f})")
        prev = ms


def main():
    profile(150_000, 10_000, "210k", 4, 16384, 12, None)
    # production 1M tier (rasterize_pallas defaults): mid bucket +
    # 1.8N entry cap; winner fields ride the compaction sort as packed
    # payloads (a_mid fixed at 4 inside bin_splats' default)
    profile(820_000, 30_000, "1M", 2, 32768, 8, 1_800_000,
            mid_budget=262_144)


if __name__ == "__main__":
    main()
