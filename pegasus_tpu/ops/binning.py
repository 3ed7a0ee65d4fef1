"""Tile binning: projected splats -> depth-ordered per-tile entry lists.

Shared front-end of the tiled XLA and Pallas rasterizer backends.  The
CUDA reference builds this structure with a global (tile|depth)-key radix
sort over dynamically-counted duplicates; the TPU formulation keeps every
shape static:

  * duplication uses per-splat slot grids with STATIC caps — a cheap
    'small' bucket (most splats cover 1-6 tiles) plus a top_k-compacted
    'big' bucket — no searchsorted over the expansion (a measured 166 ms
    trap on TPU: binary-search gathers are ~25 GB/s);
  * depth ordering rides the sort key: key = tile_id << depth_bits |
    depth_rank, so ONE 32-bit sort yields per-tile depth-ordered segments;
  * per-entry splat parameters are gathered once into a packed
    [M, 16] float32 matrix in sorted-entry order, so downstream consumers
    read contiguous rows (Pallas DMAs exact segments; XLA slices padded
    blocks).

Entry budget overflow drops the FARTHEST entries of a tile first (keys are
depth-ordered), degrading background before foreground.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pegasus_tpu.ops.projection import ProjectedGaussians

# packed parameter layout (one row per tile-entry)
PARAM_DIM = 16
P_MX, P_MY = 0, 1
P_CA, P_CB, P_CC = 2, 3, 4
P_OPAC = 5
P_R, P_G, P_B = 6, 7, 8
P_DEPTH = 9
P_RADIUS = 10
P_OBJ = 11
P_ENV = 12  # 1.0 if environment splat (object_id == 0)


class TileBins(NamedTuple):
    """Per-tile entry segments over a padded packed parameter matrix.

    Segment starts are aligned to the compositing chunk size (``block``):
    every tile's entries occupy whole [block, 16] groups, so the Pallas
    backend can DMA lane-aligned [16, block] slabs and the XLA backend can
    slice dense windows.  Padding entries point at an all-zero parameter
    row (opacity 0) and are additionally masked by tile_count.
    """

    params: jnp.ndarray  # [M_pad, 16] packed entry params, (tile, depth)-ordered
    tile_start: jnp.ndarray  # [n_tiles] entry offset, multiple of block
    tile_count: jnp.ndarray  # [n_tiles] real entry count per tile
    n_tiles_x: int
    n_tiles_y: int
    tile: int
    block: int


def _pack_params(proj: ProjectedGaussians) -> jnp.ndarray:
    n = proj.mean2d.shape[0]
    cols = [
        proj.mean2d[:, 0],
        proj.mean2d[:, 1],
        proj.conic[:, 0],
        proj.conic[:, 1],
        proj.conic[:, 2],
        proj.opacity,
        proj.color[:, 0],
        proj.color[:, 1],
        proj.color[:, 2],
        proj.depth,
        proj.radius,
        proj.object_id.astype(jnp.float32),
        (proj.object_id == 0).astype(jnp.float32),
    ]
    packed = jnp.stack(cols, axis=1)
    pad = PARAM_DIM - packed.shape[1]
    return jnp.pad(packed, ((0, 0), (0, pad)))


def bin_splats(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    tile: int = 16,
    a_small: int = 6,
    big_budget: int = 8192,
    a_big: int = 64,
    block: int = 256,
) -> TileBins:
    n = proj.mean2d.shape[0]
    ntx = -(-width // tile)
    nty = -(-height // tile)
    n_tiles = ntx * nty

    tile_bits = max(1, math.ceil(math.log2(n_tiles + 2)))
    depth_bits = 31 - tile_bits
    rank_shift = max(0, math.ceil(math.log2(max(n, 2))) - depth_bits)

    # depth ranks (global front-to-back order)
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    depth_rank = (
        jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    )
    rank_q = depth_rank >> rank_shift

    # clipped tile bboxes
    mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    tx0 = jnp.clip(jnp.floor((mx - r) / tile), 0, ntx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile), 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / tile), 0, nty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) / tile), 0, nty - 1).astype(jnp.int32)
    onscreen = (
        proj.valid
        & (mx + r >= 0) & (mx - r < width)
        & (my + r >= 0) & (my - r < height)
    )
    w_t = tx1 - tx0 + 1
    h_t = ty1 - ty0 + 1
    area = jnp.where(onscreen, w_t * h_t, 0)
    is_big = area > a_small

    # big bucket: compact the (rare) wide splats via top_k
    big_vals, big_idx = jax.lax.top_k(area * is_big, big_budget)
    in_big = jnp.zeros(n, bool).at[big_idx].set(big_vals > a_small)

    def emit(src_idx, cap):
        """[K, cap] tile ids (+sentinel) for each source splat, row-major
        over its clipped bbox; entries beyond the bbox area are invalid."""
        s_tx0, s_ty0 = tx0[src_idx], ty0[src_idx]
        s_w, s_h = w_t[src_idx], h_t[src_idx]
        # overflow fallback: shrink the bbox around the mean tile
        over = (s_w * s_h) > cap
        cw = jnp.clip(jnp.floor(mx[src_idx] / tile), 0, ntx - 1).astype(jnp.int32)
        ch = jnp.clip(jnp.floor(my[src_idx] / tile), 0, nty - 1).astype(jnp.int32)
        side = max(1, int(math.isqrt(cap)))
        s_tx0 = jnp.where(over, jnp.clip(cw - side // 2, 0, ntx - 1), s_tx0)
        s_ty0 = jnp.where(over, jnp.clip(ch - side // 2, 0, nty - 1), s_ty0)
        s_w = jnp.where(over, jnp.minimum(side, ntx - s_tx0), s_w)
        s_h = jnp.where(over, jnp.minimum(cap // side, nty - s_ty0), s_h)

        slot = jnp.arange(cap, dtype=jnp.int32)[None, :]
        txs = s_tx0[:, None] + slot % s_w[:, None]
        tys = s_ty0[:, None] + slot // s_w[:, None]
        valid = slot < (s_w * s_h)[:, None]
        return txs, tys, valid

    # small bucket: every splat, capped at a_small slots
    small_src = jnp.arange(n, dtype=jnp.int32)
    s_txs, s_tys, s_valid = emit(small_src, a_small)
    s_valid = s_valid & (area > 0)[:, None] & (~in_big)[:, None]
    small_tile = s_tys * ntx + s_txs
    small_key = jnp.where(
        s_valid,
        (small_tile << depth_bits) | rank_q[:, None],
        jnp.int32((n_tiles << depth_bits)),
    )
    small_val = jnp.broadcast_to(small_src[:, None], small_key.shape)

    # big bucket
    b_txs, b_tys, b_valid = emit(big_idx, a_big)
    b_valid = b_valid & in_big[big_idx][:, None]
    big_tile = b_tys * ntx + b_txs
    big_key = jnp.where(
        b_valid,
        (big_tile << depth_bits) | rank_q[big_idx][:, None],
        jnp.int32((n_tiles << depth_bits)),
    )
    big_val = jnp.broadcast_to(big_idx[:, None], big_key.shape)

    keys = jnp.concatenate([small_key.reshape(-1), big_key.reshape(-1)])
    vals = jnp.concatenate([small_val.reshape(-1), big_val.reshape(-1)])

    sorted_key, sorted_src = jax.lax.sort((keys, vals), num_keys=1, is_stable=True)
    entry_tile = (sorted_key >> depth_bits).astype(jnp.int32)
    m_total = keys.shape[0]

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(entry_tile, tile_ids, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(entry_tile, tile_ids, side="right").astype(jnp.int32)
    counts = seg_end - seg_start

    # block-align every tile segment (static upper bound on the padded size)
    padded_counts = ((counts + block - 1) // block) * block
    padded_start = jnp.cumsum(padded_counts) - padded_counts
    m_pad = ((m_total + block - 1) // block) * block + n_tiles * block

    entry_valid = entry_tile < n_tiles
    tile_of = jnp.clip(entry_tile, 0, n_tiles - 1)
    within = jnp.arange(m_total, dtype=jnp.int32) - seg_start[tile_of]
    dest = jnp.where(entry_valid, padded_start[tile_of] + within, m_pad)

    # inverse mapping: padded position -> source splat (dummy row = n)
    inv = jnp.full((m_pad + 1,), n, jnp.int32).at[dest].set(sorted_src)[:m_pad]

    packed = jnp.concatenate(
        [_pack_params(proj), jnp.zeros((1, PARAM_DIM), jnp.float32)], axis=0
    )
    params_pad = packed[inv]  # [M_pad, 16]

    return TileBins(
        params=params_pad,
        tile_start=padded_start,
        tile_count=counts,
        n_tiles_x=ntx,
        n_tiles_y=nty,
        tile=tile,
        block=block,
    )
