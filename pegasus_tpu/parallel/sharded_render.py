"""Splat-axis model parallelism for the rasterizer.

Front-to-back alpha compositing is associative under the 'over' operator:

    (c1, T1) over (c2, T2) = (c1 + T1 * c2, T1 * T2)

so a depth-sorted splat array split into contiguous shards composites
locally per device and then reduces ACROSS devices in shard order — the
tensor-parallel analog for scenes too large for one chip's HBM, with one
log-depth combine on the ICI instead of any splat traffic.

This generalizes to every channel the renderer emits:
  * premultiplied accumulations (rgb, depth, alpha, seg, vis) combine as
    acc = acc_near + T_near * acc_far;
  * amodal log-transmittances combine additively.

Implementation: shard_map over the 'splat' mesh axis; each shard runs the
golden compositor on its slice (any backend works — the math contract is
RenderOutputs + transmittances), then an all_gather of per-shard tile
accumulators followed by an ordered fold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import GaussianCloud
from pegasus_tpu.ops.projection import project_gaussians
from pegasus_tpu.ops.rasterize_ref import RenderOutputs


def rasterize_splat_sharded(
    cloud: GaussianCloud,
    cam: Camera,
    mesh: Mesh,
    axis: str = "splat",
    background=(0.0, 0.0, 0.0),
    max_objects: int = 8,
    chunk: int = 256,
) -> RenderOutputs:
    """Render with the splat axis sharded over `axis`.

    The cloud must be padded so num_splats % axis_size == 0 (use
    GaussianCloud.padded).  Splats are depth-sorted globally first so each
    shard owns a depth-contiguous segment; the ordered cross-shard 'over'
    fold then reproduces sequential compositing exactly.
    """
    n_shards = mesh.shape[axis]
    n = cloud.num_splats
    if n % n_shards:
        raise ValueError(f"pad splats ({n}) to a multiple of {n_shards}")

    proj = project_gaussians(cloud, cam)
    # global depth order -> contiguous shards are depth-contiguous
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    proj = jax.tree.map(lambda x: x[order], proj)

    width, height = cam.width, cam.height
    k = max_objects

    def shard_fn(proj_shard):
        from pegasus_tpu.ops.rasterize_ref import rasterize_projected

        out = rasterize_projected(
            proj_shard, width, height,
            background=jnp.zeros(3, jnp.float32),
            max_objects=k, chunk=chunk,
        )
        t_full = (1.0 - out.alpha)[..., None]
        # vis channels need their own transmittance: environment-excluded
        # accumulated alpha = sum over objects of vis weights is NOT the
        # alpha (weights overlap-free, sum = 1 - t_ne). Recover exactly:
        t_ne = 1.0 - jnp.sum(out.vis_weights, axis=-1, keepdims=True)
        amodal_log = jnp.log1p(-jnp.clip(out.amodal, 0.0, 1.0 - 1e-7))
        payload = jnp.concatenate(
            [
                out.rgb,
                out.depth[..., None],
                out.alpha[..., None],
                out.seg_weights,
                out.vis_weights,
                amodal_log,
                t_full,
                t_ne,
            ],
            axis=-1,
        )  # [H, W, 5 + 3K + 2]
        # gather every shard's payload along a new leading axis
        return jax.lax.all_gather(payload, axis)

    specs = P(axis)
    gathered = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: specs, proj),),
        out_specs=P(None),
        check_vma=False,
    )(proj)
    # gathered: [n_shards, H, W, C] identical on every device

    def over(near, far):
        acc_n, am_n, tf_n, tn_n = near
        acc_f, am_f, tf_f, tn_f = far
        # premultiplied channels: full-scene ones scale by t_full,
        # env-free vis channels scale by t_noenv
        full_part = acc_n[..., : 5 + k] + tf_n * acc_f[..., : 5 + k]
        vis_part = acc_n[..., 5 + k : 5 + 2 * k] + tn_n * acc_f[..., 5 + k : 5 + 2 * k]
        return (
            jnp.concatenate([full_part, vis_part], axis=-1),
            am_n + am_f,
            tf_n * tf_f,
            tn_n * tn_f,
        )

    def unpack(i):
        g = gathered[i]
        return (
            g[..., : 5 + 2 * k],
            g[..., 5 + 2 * k : 5 + 3 * k],
            g[..., 5 + 3 * k : 5 + 3 * k + 1],
            g[..., 5 + 3 * k + 1 : 5 + 3 * k + 2],
        )

    state = unpack(0)
    for i in range(1, n_shards):
        state = over(state, unpack(i))
    acc, amodal_log, t_full, _t_ne = state

    background = jnp.asarray(background, jnp.float32)
    rgb = acc[..., 0:3] + t_full * background[None, None, :]
    return RenderOutputs(
        rgb=rgb,
        depth=acc[..., 3],
        alpha=acc[..., 4],
        seg_weights=acc[..., 5 : 5 + k],
        vis_weights=acc[..., 5 + k : 5 + 2 * k],
        amodal=1.0 - jnp.exp(amodal_log),
    )
