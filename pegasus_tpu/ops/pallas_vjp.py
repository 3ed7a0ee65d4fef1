"""Differentiable Pallas rasterizer: custom VJP around the tile compositor.

The reference serves BOTH generation and training from one CUDA rasterizer
with a hand-written backward (reference: src/gs/gs_training.py:13-50 drives
the submodule's train.training, whose gradient kernel re-walks each tile's
splat list).  Here the fast TPU forward (ops/rasterize_pallas.py) gets the
same treatment: ``composite_core`` is a ``jax.custom_vjp`` whose backward
is a second Pallas kernel over the same depth-ordered tile segments
(ops/binning.py).  Everything AROUND the core — projection, binning
(gather -> scatter-add transpose), background blend, untiling — is plain
JAX and differentiates under XLA, so ``rasterize_projected_pallas`` is a
drop-in differentiable replacement for ``rasterize_projected_tiled`` in
the trainer.

Backward math (per pixel p, entries e in depth order within the tile):

    out_A[f] = sum_e w_e feat_e[f],   w_e = a_e * T_excl(e),
    T_excl(e) = prod_{e'<e} (1 - a_{e'}),   t_out = prod_e (1 - a_e)

    dL/da_e = T_excl(e) * (feat_e . gA)
              - [ S_>e + t_out * g_t ] / (1 - a_e)
    S_>e    = sum_{e'>e} w_{e'} (feat_{e'} . gA)

computed in TWO forward-order passes (pass 1 accumulates the totals
S = sum_e w_e (feat_e . gA) and the final transmittances; pass 2 forms
suffix sums as S - prefix with the same blocked-MXU lane cumsum the
forward uses) — no back-to-front walk and no divisions by running
transmittance chains (the CUDA backward's T = T_final / (1-a) recurrence).
The noenv (vis) and amodal channel groups add their own terms through the
same machinery.  Per-entry parameter gradients then chain through
alpha = min(opac * exp(power), 0.99) to conic/mean/opacity rows and
through the compositing weights to color/depth rows, and are accumulated
into the global [16, M] gradient matrix with read-modify-write DMA (grid
programs run sequentially on a TensorCore, so the RMW is race-free; the
output aliases a zeros input so masked window lanes stay exact zeros).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import GaussianCloud
from pegasus_tpu.ops import binning
from pegasus_tpu.ops.binning import TileBins, bin_splats
from pegasus_tpu.ops.projection import ProjectedGaussians, project_gaussians
from pegasus_tpu.ops.rasterize_ref import RenderOutputs
from pegasus_tpu.ops.rasterize_pallas import (
    _ALIGN,
    _composite_kernel,
    _make_cumsum_lanes,
)


class CompositeCfg(NamedTuple):
    """Static (hashable) compositor configuration for the custom VJP."""

    tile: int
    ntx: int
    nty: int
    chunk: int
    max_objects: int
    interpret: bool


def _forward_call(cfg: CompositeCfg, params_t, tile_start, tile_count):
    """The forward tile compositor (single-tile-per-program kernel)."""
    n_tiles = cfg.ntx * cfg.nty
    px_n = cfg.tile * cfg.tile
    f_out = 5 + 3 * cfg.max_objects + 2
    w_lanes = cfg.chunk + _ALIGN
    kernel = functools.partial(
        _composite_kernel,
        tile=cfg.tile, ntx=cfg.ntx, chunk=cfg.chunk,
        max_objects=cfg.max_objects, packed8=False,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, px_n, f_out), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, binning.PARAM_DIM, w_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, px_n, f_out), jnp.float32),
        interpret=cfg.interpret,
    )(tile_start, tile_count, params_t)


def _composite_bwd_kernel(
    # scalar prefetch
    start_ref,  # [n_tiles] i32
    count_ref,  # [n_tiles] i32
    # inputs
    params_hbm,  # [16, M_pad] f32, ANY
    g_ref,  # [1, PX, F_OUT] f32 VMEM block (cotangent of this tile)
    dzero_hbm,  # [16, M_pad] f32, ANY — aliased to the output (zeros)
    # outputs
    dout_hbm,  # [16, M_pad] f32, ANY (aliases dzero_hbm)
    # scratch
    buf_ref,  # [2, 16, W] f32 VMEM (param windows, double-buffered)
    gio_ref,  # [16, W] f32 VMEM (gradient RMW window)
    sem_ref,  # DMA semaphores (2,)
    gsem_ref,  # DMA semaphore for the RMW stream
    *,
    tile: int,
    ntx: int,
    chunk: int,
    max_objects: int,
):
    i = pl.program_id(0)
    start = start_ref[i]
    count = count_ref[i]
    base = (start // _ALIGN) * _ALIGN
    off = start - base
    px_n = tile * tile
    k = max_objects
    w_lanes = chunk + _ALIGN

    ty = i // ntx
    tx = i % ntx
    lin = jax.lax.broadcasted_iota(jnp.int32, (px_n, 1), 0)
    pxs = (lin % tile + tx * tile).astype(jnp.float32)
    pys = (lin // tile + ty * tile).astype(jnp.float32)

    n_chunks = (count + chunk - 1) // chunk
    cumsum_lanes = _make_cumsum_lanes(w_lanes)

    g = g_ref[0]  # [PX, F_OUT]
    gA = g[:, 0 : 5 + k]  # full composite channels (rgb, depth, alpha, seg)
    gB = g[:, 5 + k : 5 + 2 * k]  # vis (noenv) channels
    gC = g[:, 5 + 2 * k : 5 + 3 * k]  # amodal log channels
    gtf = g[:, 5 + 3 * k : 5 + 3 * k + 1]  # t_full output
    gtn = g[:, 5 + 3 * k + 1 : 5 + 3 * k + 2]  # t_ne output

    kl = jax.lax.broadcasted_iota(jnp.int32, (k, w_lanes), 0).astype(
        jnp.float32
    )
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (1, w_lanes), 1)

    def get_dma(slot, c_i):
        return pltpu.make_async_copy(
            params_hbm.at[:, pl.ds(base + c_i * chunk, w_lanes)],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    def recompute(p, c_i):
        """Exact forward per-chunk quantities (must match _composite_kernel)."""
        entry_ok = (
            (w_ids >= off)
            & (w_ids < off + chunk)
            & (c_i * chunk + (w_ids - off) < count)
        )
        mx = p[binning.P_MX : binning.P_MX + 1, :]
        my = p[binning.P_MY : binning.P_MY + 1, :]
        ca = p[binning.P_CA : binning.P_CA + 1, :]
        cb = p[binning.P_CB : binning.P_CB + 1, :]
        cc = p[binning.P_CC : binning.P_CC + 1, :]
        opac = p[binning.P_OPAC : binning.P_OPAC + 1, :]
        rad = p[binning.P_RADIUS : binning.P_RADIUS + 1, :]
        is_env = p[binning.P_ENV : binning.P_ENV + 1, :] > 0.5
        dx = pxs - mx  # [PX, W]
        dy = pys - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        exppow = jnp.exp(jnp.minimum(power, 0.0))
        raw = opac * exppow
        alpha = jnp.minimum(raw, 0.99)
        keep = (
            (power <= 0.0)
            & (alpha >= 1.0 / 255.0)
            & (jnp.abs(dx) <= rad)
            & (jnp.abs(dy) <= rad)
            & entry_ok
        )
        alphas = jnp.where(keep, alpha, 0.0)
        obj = p[binning.P_OBJ : binning.P_OBJ + 1, :]
        onehot_t = (jnp.abs(kl - obj) < 0.5).astype(jnp.float32)  # [K, W]
        feat_t = jnp.concatenate(
            [
                p[binning.P_R : binning.P_B + 1, :],
                p[binning.P_DEPTH : binning.P_DEPTH + 1, :],
                jnp.ones((1, w_lanes), jnp.float32),
                onehot_t,
            ],
            axis=0,
        )  # [5 + K, W]
        unclamped = raw < 0.99
        return (
            dx, dy, ca, cb, cc, exppow, alphas, keep, unclamped, is_env,
            onehot_t, feat_t,
        )

    def dot_pf(a, b):  # a [PX, F] x b [F, W] -> [PX, W]
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_px(a, b):  # a [PX, F] x b [PX, W] -> [F, W] (contract pixels)
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pass 1: totals S_full, S_ne and final transmittances --------------
    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body1(c_i, carry):
        t_full, t_ne, s_full, s_ne = carry
        slot = c_i % 2

        @pl.when(c_i + 1 < n_chunks)
        def _():
            get_dma((c_i + 1) % 2, c_i + 1).start()

        get_dma(slot, c_i).wait()
        p = buf_ref[slot]
        (_dx, _dy, _ca, _cb, _cc, _ep, alphas, _keep, _uc, is_env,
         onehot_t, feat_t) = recompute(p, c_i)

        log1m = jnp.log1p(-alphas)
        excl = jnp.exp(cumsum_lanes(log1m) - log1m)
        w_full = alphas * excl * t_full
        fg = dot_pf(gA, feat_t)  # [PX, W]
        s_full = s_full + jnp.sum(w_full * fg, axis=1, keepdims=True)
        t_full = t_full * jnp.exp(jnp.sum(log1m, axis=1, keepdims=True))

        # noenv group: skip for object-free chunks (same data-dependent
        # scf.if the forward uses; a chunk with no object entries leaves
        # t_ne and s_ne unchanged since alphas_ne would be all-zero)
        has_obj = jnp.any((~is_env) & (alphas > 0.0))

        def ne_pass(_):
            alphas_ne = jnp.where(is_env, 0.0, alphas)
            log1m_ne = jnp.log1p(-alphas_ne)
            excl_ne = jnp.exp(cumsum_lanes(log1m_ne) - log1m_ne)
            w_ne = alphas_ne * excl_ne * t_ne
            fg_ne = dot_pf(gB, onehot_t)
            return (
                s_ne + jnp.sum(w_ne * fg_ne, axis=1, keepdims=True),
                t_ne * jnp.exp(jnp.sum(log1m_ne, axis=1, keepdims=True)),
            )

        s_ne, t_ne = jax.lax.cond(
            has_obj, ne_pass, lambda _: (s_ne, t_ne), None
        )
        return (t_full, t_ne, s_full, s_ne)

    ones_px = jnp.ones((px_n, 1), jnp.float32)
    zeros_px = jnp.zeros((px_n, 1), jnp.float32)
    tff, tnf, s_full_tot, s_ne_tot = jax.lax.fori_loop(
        0, n_chunks, body1, (ones_px, ones_px, zeros_px, zeros_px)
    )

    # ---- pass 2: per-entry gradients, RMW into the global matrix -----------
    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body2(c_i, carry):
        t_full, t_ne, r_full, r_ne = carry
        slot = c_i % 2

        @pl.when(c_i + 1 < n_chunks)
        def _():
            get_dma((c_i + 1) % 2, c_i + 1).start()

        get_dma(slot, c_i).wait()
        p = buf_ref[slot]
        (dx, dy, ca, cb, cc, exppow, alphas, keep, unclamped, is_env,
         onehot_t, feat_t) = recompute(p, c_i)

        # full-composite group
        log1m = jnp.log1p(-alphas)
        t_excl = jnp.exp(cumsum_lanes(log1m) - log1m) * t_full  # [PX, W]
        w_full = alphas * t_excl
        fg = dot_pf(gA, feat_t)
        contrib = w_full * fg
        pref = cumsum_lanes(contrib) + r_full
        suffix = s_full_tot - pref
        da = t_excl * fg - (suffix + tff * gtf) / (1.0 - alphas)

        # noenv (vis) group — skipped for object-free chunks: the da_ne
        # term is masked to object lanes anyway, and contrib_ne/t_ne are
        # unchanged when alphas_ne is all-zero
        has_obj = jnp.any((~is_env) & (alphas > 0.0))

        def ne_pass(_):
            alphas_ne = jnp.where(is_env, 0.0, alphas)
            log1m_ne = jnp.log1p(-alphas_ne)
            t_excl_ne = jnp.exp(cumsum_lanes(log1m_ne) - log1m_ne) * t_ne
            w_ne = alphas_ne * t_excl_ne
            fg_ne = dot_pf(gB, onehot_t)
            contrib_ne = w_ne * fg_ne
            pref_ne = cumsum_lanes(contrib_ne) + r_ne
            suffix_ne = s_ne_tot - pref_ne
            da_ne = t_excl_ne * fg_ne - (suffix_ne + tnf * gtn) / (
                1.0 - alphas_ne
            )
            nt = t_ne * jnp.exp(jnp.sum(log1m_ne, axis=1, keepdims=True))
            return jnp.where(is_env, 0.0, da_ne), contrib_ne, nt

        def ne_skip(_):
            return (
                jnp.zeros((px_n, w_lanes), jnp.float32),
                jnp.zeros((px_n, w_lanes), jnp.float32),
                t_ne,
            )

        da_ne_m, contrib_ne, new_t_ne = jax.lax.cond(
            has_obj, ne_pass, ne_skip, None
        )
        da = da + da_ne_m

        # amodal group: d/da of log1p(-a) accumulated per object channel
        ga = dot_pf(gC, onehot_t)
        da = da - ga / (1.0 - alphas)

        # chain through alpha = min(opac * exp(power), 0.99), gated exactly
        # like the forward where() (no gradient at culled or clamped lanes)
        gate = (keep & unclamped).astype(jnp.float32)
        da = da * gate
        d_opac = jnp.sum(da * exppow, axis=0, keepdims=True)  # [1, W]
        dpow = da * alphas  # d raw / d power = raw = alpha when unclamped
        d_ca = jnp.sum(dpow * (-0.5 * dx * dx), axis=0, keepdims=True)
        d_cb = jnp.sum(dpow * (-dx * dy), axis=0, keepdims=True)
        d_cc = jnp.sum(dpow * (-0.5 * dy * dy), axis=0, keepdims=True)
        d_mx = jnp.sum(dpow * (ca * dx + cb * dy), axis=0, keepdims=True)
        d_my = jnp.sum(dpow * (cc * dy + cb * dx), axis=0, keepdims=True)

        # feature gradients: dfeat[f, e] = sum_p w_e(p) gA(p, f)
        gfeat = dot_px(gA, w_full)  # [5 + K, W]; rows 0:3 rgb, 3 depth

        dwin = jnp.concatenate(
            [
                d_mx, d_my, d_ca, d_cb, d_cc, d_opac,
                gfeat[0:4, :],  # P_R, P_G, P_B, P_DEPTH
                jnp.zeros((binning.PARAM_DIM - 10, w_lanes), jnp.float32),
            ],
            axis=0,
        )  # [16, W]

        # read-modify-write into the global gradient matrix; serialized, so
        # the 128-lane overlap with the previous window (and the previous
        # tile's trailing window) accumulates instead of clobbering
        rd = pltpu.make_async_copy(
            dout_hbm.at[:, pl.ds(base + c_i * chunk, w_lanes)],
            gio_ref,
            gsem_ref,
        )
        rd.start()
        rd.wait()
        gio_ref[:, :] = gio_ref[:, :] + dwin
        wr = pltpu.make_async_copy(
            gio_ref,
            dout_hbm.at[:, pl.ds(base + c_i * chunk, w_lanes)],
            gsem_ref,
        )
        wr.start()
        wr.wait()

        t_full = t_full * jnp.exp(jnp.sum(log1m, axis=1, keepdims=True))
        r_full = r_full + jnp.sum(contrib, axis=1, keepdims=True)
        r_ne = r_ne + jnp.sum(contrib_ne, axis=1, keepdims=True)
        return (t_full, new_t_ne, r_full, r_ne)

    jax.lax.fori_loop(
        0, n_chunks, body2, (ones_px, ones_px, zeros_px, zeros_px)
    )


def _backward_call(cfg: CompositeCfg, params_t, tile_start, tile_count, g):
    n_tiles = cfg.ntx * cfg.nty
    px_n = cfg.tile * cfg.tile
    f_out = 5 + 3 * cfg.max_objects + 2
    w_lanes = cfg.chunk + _ALIGN
    kernel = functools.partial(
        _composite_bwd_kernel,
        tile=cfg.tile, ntx=cfg.ntx, chunk=cfg.chunk,
        max_objects=cfg.max_objects,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # params
            pl.BlockSpec(
                (1, px_n, f_out), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # cotangent
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, binning.PARAM_DIM, w_lanes), jnp.float32),
            pltpu.VMEM((binning.PARAM_DIM, w_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dzero = jnp.zeros_like(params_t)
    # alias index 4 counts the scalar-prefetch operands (starts, counts)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(params_t.shape, jnp.float32),
        input_output_aliases={4: 0},
        interpret=cfg.interpret,
    )(tile_start, tile_count, params_t, g, dzero)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_core(cfg: CompositeCfg, params_t, tile_start, tile_count):
    """Tile compositor with a Pallas forward AND backward.

    Returns the raw per-tile accumulator tensor [n_tiles, px, 5+3K+2]
    (same channel layout as the forward kernel docstring)."""
    return _forward_call(cfg, params_t, tile_start, tile_count)


def _core_fwd(cfg, params_t, tile_start, tile_count):
    out = _forward_call(cfg, params_t, tile_start, tile_count)
    return out, (params_t, tile_start, tile_count)


def _core_bwd(cfg, res, g):
    params_t, tile_start, tile_count = res
    dparams = _backward_call(cfg, params_t, tile_start, tile_count, g)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return dparams, f0(tile_start), f0(tile_count)


composite_core.defvjp(_core_fwd, _core_bwd)


def composite_tiles_pallas_diff(
    bins: TileBins,
    width: int,
    height: int,
    background: jnp.ndarray,
    max_objects: int = 8,
    chunk: int = 256,
    interpret: bool = False,
) -> RenderOutputs:
    """Differentiable twin of composite_tiles_pallas (same outputs)."""
    cfg = CompositeCfg(
        tile=bins.tile, ntx=bins.n_tiles_x, nty=bins.n_tiles_y,
        chunk=chunk, max_objects=max_objects, interpret=interpret,
    )
    out = composite_core(cfg, bins.params_t, bins.tile_start, bins.tile_count)

    tile = bins.tile
    ntx, nty = bins.n_tiles_x, bins.n_tiles_y
    k = max_objects
    background = jnp.asarray(background, jnp.float32)

    def untile(x):
        ch = x.shape[-1]
        x = x.reshape(nty, ntx, tile, tile, ch)
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(
            nty * tile, ntx * tile, ch
        )
        return x[:height, :width]

    acc = untile(out[..., 0 : 5 + 2 * k])
    amodal_log = untile(out[..., 5 + 2 * k : 5 + 3 * k])
    t_full = untile(out[..., 5 + 3 * k : 5 + 3 * k + 1])[..., 0]
    rgb = acc[..., 0:3] + t_full[..., None] * background[None, None, :]
    return RenderOutputs(
        rgb=rgb,
        depth=acc[..., 3],
        alpha=acc[..., 4],
        seg_weights=acc[..., 5 : 5 + k],
        vis_weights=acc[..., 5 + k : 5 + 2 * k],
        amodal=1.0 - jnp.exp(amodal_log),
    )


def rasterize_projected_pallas(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    background,
    max_objects: int = 8,
    tile: int = 16,
    chunk: int = 256,
    a_small: int = 4,
    big_budget: int = 16384,
    a_big: int = 36,
    interpret: bool = False,
    abs_grad_sink=None,
) -> RenderOutputs:
    """Differentiable projected-splat rasterizer on the Pallas pair.

    Signature-compatible with rasterize_projected_tiled so the trainer can
    select backends; binning (gather) transposes to a scatter-add under
    autodiff, exactly like the tiled path.

    abs_grad_sink: optional [N, 2] zeros whose jax.grad is the per-splat
    sum of |per-entry mean2d cotangents| (AbsGS-style densify statistic;
    see binning._gather_rows_structured)."""
    bins = bin_splats(
        proj, width, height, tile=tile,
        a_small=a_small, big_budget=big_budget, a_big=a_big,
        lane_pad=chunk + 2 * _ALIGN,
        # structure-aware gather transpose (fast training backward); the
        # tiled backend keeps the plain scatter transpose, so grad-parity
        # tests cross-validate two independent transpose implementations
        with_entry_origin=True,
        abs_grad_sink=abs_grad_sink,
    )
    return composite_tiles_pallas_diff(
        bins, width, height, jnp.asarray(background, jnp.float32),
        max_objects=max_objects, chunk=chunk, interpret=interpret,
    )


def rasterize_pallas_diff(
    cloud: GaussianCloud,
    cam: Camera,
    background=(0.0, 0.0, 0.0),
    sh_degree: int | None = None,
    scaling_modifier: float = 1.0,
    max_objects: int = 8,
    tile: int = 16,
    chunk: int = 256,
    a_small: int = 4,
    big_budget: int = 16384,
    a_big: int = 36,
    interpret: bool = False,
) -> RenderOutputs:
    """Differentiable drop-in for rasterize_pallas (cloud-level API)."""
    proj = project_gaussians(cloud, cam, sh_degree, scaling_modifier)
    return rasterize_projected_pallas(
        proj, cam.width, cam.height,
        jnp.asarray(background, jnp.float32),
        max_objects=max_objects, tile=tile, chunk=chunk,
        a_small=a_small, big_budget=min(big_budget, cloud.num_splats),
        a_big=a_big, interpret=interpret,
    )
