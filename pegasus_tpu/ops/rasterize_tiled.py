"""Tiled rasterizer: XLA-native tile binning + dense MXU compositing.

The production render path (golden-model semantics, TPU-shaped execution).
Where the reference's CUDA rasterizer builds ragged per-tile lists with a
global (tile, depth)-key radix sort and runs a divergent per-pixel loop,
this backend keeps every shape static and every hot op dense:

  1. project all splats (ops/projection.py);
  2. depth-sort the splat array once (XLA sort, N entries);
  3. duplicate splats into the image tiles they overlap via the
     "expand-by-searchsorted" trick under a STATIC duplication budget;
  4. stable-sort the (tile_id, splat)-pairs by tile id only — stability
     preserves the depth order from step 2, so no composite key is needed;
  5. pad each tile's list to a static per-tile budget and gather the splat
     parameters into dense [n_tiles, L, ...] blocks;
  6. composite: per chunk of L, per-pixel alphas -> exclusive cumprod in
     log space -> ONE batched matmul [n_tiles, px, C] @ [n_tiles, C, F]
     against the per-splat feature matrix (rgb, depth, alpha-carrier and
     object one-hots) — front-to-back "over" becomes MXU work.

Budget overflow degrades gracefully: entries are depth-ordered, so an
overflowing tile loses its FARTHEST splats first (background), never the
front ones.  Parity vs the golden renderer is gated at >40 dB PSNR in
tests/test_render_tiled.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.lax import Precision

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import GaussianCloud
from pegasus_tpu.ops.projection import ProjectedGaussians, project_gaussians
from pegasus_tpu.ops.rasterize_ref import RenderOutputs

_PREC = Precision.HIGHEST


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_objects", "tile", "max_per_tile",
        "dup_factor", "chunk",
    ),
)
def rasterize_projected_tiled(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    background: jnp.ndarray,
    max_objects: int = 8,
    tile: int = 16,
    max_per_tile: int = 1024,
    dup_factor: int = 4,
    chunk: int = 256,
) -> RenderOutputs:
    n = proj.mean2d.shape[0]
    ntx = _cdiv(width, tile)
    nty = _cdiv(height, tile)
    n_tiles = ntx * nty
    px_per_tile = tile * tile

    # -- 1/2: depth order ------------------------------------------------------
    sort_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    proj = jax.tree.map(lambda x: x[order], proj)

    # -- 3: tile bboxes + duplication ------------------------------------------
    mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    tx0 = jnp.clip(jnp.floor((mx - r) / tile), 0, ntx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile), 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / tile), 0, nty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) / tile), 0, nty - 1).astype(jnp.int32)
    # off-screen cull
    onscreen = (
        proj.valid
        & (mx + r >= 0) & (mx - r < width)
        & (my + r >= 0) & (my - r < height)
    )
    w_t = tx1 - tx0 + 1
    h_t = ty1 - ty0 + 1
    area = jnp.where(onscreen, w_t * h_t, 0)

    m_budget = dup_factor * n
    offsets = jnp.cumsum(area) - area  # exclusive
    total = offsets[-1] + area[-1]

    slots = jnp.arange(m_budget, dtype=jnp.int32)
    src = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32) - 1
    src = jnp.clip(src, 0, n - 1)
    rank = slots - offsets[src]
    slot_valid = (slots < total) & (area[src] > 0)
    tx = tx0[src] + rank % w_t[src]
    ty = ty0[src] + rank // w_t[src]
    tile_id = jnp.where(slot_valid, ty * ntx + tx, n_tiles).astype(jnp.int32)

    # -- 4: stable sort by tile id (depth order preserved within tiles) --------
    sorted_tile, sorted_src = jax.lax.sort(
        (tile_id, src), num_keys=1, is_stable=True
    )

    # -- 5: per-tile dense gather ----------------------------------------------
    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_end = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    counts = jnp.minimum(tile_end - tile_start, max_per_tile)

    l_idx = jnp.arange(max_per_tile, dtype=jnp.int32)
    gather_pos = jnp.clip(tile_start[:, None] + l_idx[None, :], 0, m_budget - 1)
    entry_valid = l_idx[None, :] < counts[:, None]  # [n_tiles, L]
    splat_of = sorted_src[gather_pos]  # [n_tiles, L]

    # per-entry parameters (gathered once, consumed chunk-by-chunk)
    g_mean = proj.mean2d[splat_of]  # [n_tiles, L, 2]
    g_conic = proj.conic[splat_of]  # [n_tiles, L, 3]
    g_opac = jnp.where(entry_valid, proj.opacity[splat_of], 0.0)
    g_radius = proj.radius[splat_of]
    k = max_objects
    g_feat = jnp.concatenate(
        [
            proj.color[splat_of],  # 3
            proj.depth[splat_of][..., None],  # 1
            jnp.ones_like(g_opac)[..., None],  # 1 (alpha carrier)
            jax.nn.one_hot(jnp.clip(proj.object_id[splat_of], 0, k - 1), k),
        ],
        axis=-1,
    )  # [n_tiles, L, 5 + K]
    g_is_env = proj.object_id[splat_of] == 0

    # -- 6: compositing ----------------------------------------------------------
    ty_ids = jnp.arange(n_tiles, dtype=jnp.int32) // ntx
    tx_ids = jnp.arange(n_tiles, dtype=jnp.int32) % ntx
    in_y = jnp.arange(tile, dtype=jnp.float32)
    in_x = jnp.arange(tile, dtype=jnp.float32)
    pix_y = (ty_ids[:, None] * tile)[..., None] + in_y[None, :, None]  # [T, t, 1]
    pix_x = (tx_ids[:, None] * tile)[..., None] + in_x[None, None, :]  # [T, 1, t]
    pxs = jnp.broadcast_to(pix_x, (n_tiles, tile, tile)).reshape(
        n_tiles, px_per_tile
    )
    pys = jnp.broadcast_to(pix_y, (n_tiles, tile, tile)).reshape(
        n_tiles, px_per_tile
    )

    n_chunks = _cdiv(max_per_tile, chunk)
    f_dim = 5 + k

    def chunk_alphas(c_i):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c_i * chunk, chunk, axis=1)
        mean = sl(g_mean)
        conic = sl(g_conic)
        opac = sl(g_opac)
        rad = sl(g_radius)
        dx = pxs[:, :, None] - mean[:, None, :, 0]  # [T, P, C]
        dy = pys[:, :, None] - mean[:, None, :, 1]
        a = conic[:, None, :, 0]
        b = conic[:, None, :, 1]
        c = conic[:, None, :, 2]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = opac[:, None, :] * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(alpha, 0.99)
        inside = (jnp.abs(dx) <= rad[:, None, :]) & (jnp.abs(dy) <= rad[:, None, :])
        keep = (power <= 0.0) & (alpha >= 1.0 / 255.0) & inside
        return jnp.where(keep, alpha, 0.0)  # [T, P, C]

    def body(carry, c_i):
        t_full, t_ne, acc, acc_ne, amodal_log = carry
        alphas = chunk_alphas(c_i)
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c_i * chunk, chunk, axis=1)
        feat = sl(g_feat)  # [T, C, F]
        is_env = sl(g_is_env)  # [T, C]
        onehot = feat[..., 5:]  # [T, C, K]

        log1m = jnp.log1p(-alphas)  # [T, P, C]
        excl = jnp.exp(jnp.cumsum(log1m, axis=2) - log1m)
        w_full = alphas * excl * t_full[..., None]  # [T, P, C]
        acc = acc + jnp.einsum("tpc,tcf->tpf", w_full, feat, precision=_PREC)
        t_full = t_full * jnp.exp(jnp.sum(log1m, axis=2))

        alphas_ne = jnp.where(is_env[:, None, :], 0.0, alphas)
        log1m_ne = jnp.log1p(-alphas_ne)
        excl_ne = jnp.exp(jnp.cumsum(log1m_ne, axis=2) - log1m_ne)
        w_ne = alphas_ne * excl_ne * t_ne[..., None]
        acc_ne = acc_ne + jnp.einsum(
            "tpc,tck->tpk", w_ne, onehot, precision=_PREC
        )
        t_ne = t_ne * jnp.exp(jnp.sum(log1m_ne, axis=2))

        amodal_log = amodal_log + jnp.einsum(
            "tpc,tck->tpk", log1m, onehot, precision=_PREC
        )
        return (t_full, t_ne, acc, acc_ne, amodal_log), None

    init = (
        jnp.ones((n_tiles, px_per_tile), jnp.float32),
        jnp.ones((n_tiles, px_per_tile), jnp.float32),
        jnp.zeros((n_tiles, px_per_tile, f_dim), jnp.float32),
        jnp.zeros((n_tiles, px_per_tile, k), jnp.float32),
        jnp.zeros((n_tiles, px_per_tile, k), jnp.float32),
    )
    (t_full, _t_ne, acc, acc_ne, amodal_log), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks)
    )

    background = jnp.asarray(background, jnp.float32)

    def untile(x):
        ch = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(nty, ntx, tile, tile, ch)
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(
            nty * tile, ntx * tile, ch
        )
        return x[:height, :width]

    rgb = untile(acc[..., 0:3]) + untile(t_full[..., None]) * background[None, None, :]
    depth = untile(acc[..., 3:4])[..., 0]
    alpha = untile(acc[..., 4:5])[..., 0]
    seg = untile(acc[..., 5:])
    seg_ne = untile(acc_ne)
    amodal = 1.0 - jnp.exp(untile(amodal_log))

    return RenderOutputs(
        rgb=rgb,
        depth=depth,
        alpha=alpha,
        seg_weights=seg,
        vis_weights=seg_ne,
        amodal=amodal,
    )


def rasterize_tiled(
    cloud: GaussianCloud,
    cam: Camera,
    background=(0.0, 0.0, 0.0),
    sh_degree: int | None = None,
    scaling_modifier: float = 1.0,
    max_objects: int = 8,
    tile: int = 16,
    max_per_tile: int = 1024,
    dup_factor: int = 4,
    chunk: int = 256,
) -> RenderOutputs:
    """Drop-in alternative to rasterize_reference (same RenderOutputs)."""
    proj = project_gaussians(cloud, cam, sh_degree, scaling_modifier)
    return rasterize_projected_tiled(
        proj,
        cam.width,
        cam.height,
        jnp.asarray(background, jnp.float32),
        max_objects=max_objects,
        tile=tile,
        max_per_tile=max_per_tile,
        dup_factor=dup_factor,
        chunk=chunk,
    )
