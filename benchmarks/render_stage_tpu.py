"""Decompose the rasterizer itself: project / bin(sort) / gather / kernel.

frame_stage_tpu.py attributes the frame program (pose/render/pack); this
script goes one level down into `rasterize_pallas` to attribute the render
stage between the projection math, the binning sort, the post-sort
parameter gather, and the Pallas composite kernel — at BOTH headline
scales (210k and 1M splats).

Each stage is timed as a K-iteration `lax.fori_loop` whose carry
perturbs the next iteration's input by 0 (dispatch-latency-immune device
timing; the tunnel's per-call RPC jitter never enters).

Run on the TPU chip:  python benchmarks/render_stage_tpu.py
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
    """Time K chained iterations of a jitted fori_loop body (ms/iter)."""

    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, K, make_body, c0)

    out = run(init_carry)
    jax.block_until_ready(out)
    # sync via tiny scalar fetch (block_until_ready alone is unreliable
    # through tunneled backends)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.asarray(leaves[0]).reshape(-1)[0])
    t0 = time.time()
    out = run(init_carry)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.asarray(leaves[0]).reshape(-1)[0])
    return (time.time() - t0) / K * 1e3


def build_scene(n_env, n_obj_each):
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
    return jax.device_put(merge([env] + objs))


def profile(n_env, n_obj_each, label):
    from pegasus_tpu.ops.rasterize_pallas import (
        LARGE_SCENE_SPLATS, MEDIUM_SCENE_SPLATS, composite_tiles_pallas,
        rasterize_pallas,
    )

    scene = build_scene(n_env, n_obj_each)
    n = scene.num_splats
    cam = Camera.look_at(
        eye=(0.9, 0.7, 0.9), target=(0, 0, 0.05), up=(0, 0, 1),
        fovx=np.deg2rad(60), fovy=np.deg2rad(47), width=640, height=480,
    )
    # mirror rasterize_pallas' size-tier defaults
    chunk, tile = 512, 16
    a_small = 2 if n > LARGE_SCENE_SPLATS else 4
    big_budget = 32768 if n > LARGE_SCENE_SPLATS else 16384
    a_big = 8 if n > LARGE_SCENE_SPLATS else 12
    if n > LARGE_SCENE_SPLATS:
        entry_cap = int(1.5 * n)
    elif n > MEDIUM_SCENE_SPLATS:
        entry_cap = int(3.2 * n)
    else:
        entry_cap = None

    xyz0 = scene.xyz

    # stage 1: projection
    def proj_body(i, c):
        s = scene.replace(xyz=xyz0 + c * 0)
        p = project_gaussians(s, cam, None, 1.0)
        return p.mean_x[0] * 1e-20

    ms_proj = loop_time(proj_body, jnp.float32(0))

    # stage 2: binning (sort + gather), fed a fresh projection each iter
    proj = jax.jit(lambda s: project_gaussians(s, cam, None, 1.0))(scene)
    jax.block_until_ready(proj.mean_x)

    def bin_body(i, c):
        p = proj._replace(mean_x=proj.mean_x + c * 0)
        b = binning.bin_splats(
            p, cam.width, cam.height, tile=tile, a_small=a_small,
            big_budget=min(big_budget, n), a_big=a_big,
            lane_pad=chunk + 256, entry_cap=entry_cap,
        )
        return b.params_t[0, 0] * 1e-20

    ms_bin = loop_time(bin_body, jnp.float32(0))

    # stage 2b: the sort alone (keys + 1 index payload at this M)
    bins = jax.jit(
        lambda p: binning.bin_splats(
            p, cam.width, cam.height, tile=tile, a_small=a_small,
            big_budget=min(big_budget, n), a_big=a_big,
            lane_pad=chunk + 256, entry_cap=entry_cap,
        )
    )(proj)
    jax.block_until_ready(bins.params_t)
    # jit returns the static int fields as device scalars; restore ints
    bins = bins._replace(
        n_tiles_x=int(bins.n_tiles_x), n_tiles_y=int(bins.n_tiles_y),
        tile=int(bins.tile),
    )
    m_slots = a_small * n + a_big * min(big_budget, n)
    rng = np.random.default_rng(0)
    keys0 = jnp.asarray(
        rng.integers(0, 2**30, size=m_slots, dtype=np.int32)
    )
    vals0 = jnp.asarray(rng.integers(0, n, size=m_slots, dtype=np.int32))

    def sort_body(i, c):
        k2, v2 = jax.lax.sort(
            (keys0 + c * 0, vals0), num_keys=2, is_stable=False
        )
        return k2[0] * 0

    ms_sort = loop_time(sort_body, jnp.int32(0))

    # stage 2c: the post-sort parameter gather alone
    m_len = bins.params_t.shape[1]
    src0 = jnp.asarray(
        rng.integers(0, n, size=m_len, dtype=np.int32)
    )
    packed0 = jnp.zeros((n + 1, binning.PARAM_DIM), jnp.float32)

    def gather_body(i, c):
        g = (packed0 + c * 0)[src0].T
        return g[0, 0] * 1e-20

    ms_gather = loop_time(gather_body, jnp.float32(0))

    # stage 3: composite kernel on fixed bins
    def comp_body(i, c):
        b = bins._replace(params_t=bins.params_t + c * 0)
        out = composite_tiles_pallas(
            b, cam.width, cam.height, jnp.zeros((3,), jnp.float32),
            max_objects=8, chunk=chunk, tiles_per_program=4,
        )
        return out.rgb[0, 0, 0] * 1e-20

    ms_comp = loop_time(comp_body, jnp.float32(0))

    # full rasterize for reference
    def full_body(i, c):
        s = scene.replace(xyz=xyz0 + c * 0)
        out = rasterize_pallas(s, cam, max_objects=8)
        return out.rgb[0, 0, 0] * 1e-20

    ms_full = loop_time(full_body, jnp.float32(0))

    print(f"\n== {label}: {n:,} splats, M_slots={m_slots:,}, "
          f"M_sorted={m_len:,} ==")
    print(f"projection            : {ms_proj:7.2f} ms")
    print(f"binning (sort+gather) : {ms_bin:7.2f} ms")
    print(f"  - sort (key+1 payld): {ms_sort:7.2f} ms  [isolated, M_slots]")
    print(f"  - param row-gather  : {ms_gather:7.2f} ms  [isolated, M_sorted]")
    print(f"composite kernel      : {ms_comp:7.2f} ms")
    print(f"full rasterize_pallas : {ms_full:7.2f} ms "
          f"({1e3 / ms_full:.1f} f/s)")


def main():
    profile(150_000, 10_000, "210k bench scene")
    profile(820_000, 30_000, "1M bench scene")


if __name__ == "__main__":
    main()
