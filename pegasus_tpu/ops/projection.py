"""3D Gaussian -> 2D screen-space projection (EWA splatting).

The shared geometric front-end of every rasterizer backend here (golden
JAX, tiled XLA, Pallas).  Replaces the CUDA ``preprocess`` stage of the
reference's depth-diff-gaussian-rasterization submodule (the kernel invoked
by ``render``, reference: src/gs/render.py:16): world->camera transform,
perspective Jacobian, cov2D with the +0.3 px low-pass, conic inversion,
radius estimate and SH->RGB view-dependent color.

Pure function of (cloud, camera); fully batched, fuses into one XLA
program.  All math float32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.lax import Precision

_PREC = Precision.HIGHEST

from pegasus_tpu.camera import Camera
from pegasus_tpu.gs.cloud import GaussianCloud
from pegasus_tpu.utils import sh as shlib


class ProjectedGaussians(NamedTuple):
    """Screen-space splats, one entry per input splat (dead ones masked)."""

    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray  # [N, 3] upper-triangular inverse cov2D (a, b, c)
    color: jnp.ndarray  # [N, 3] view-dependent RGB (>= 0)
    opacity: jnp.ndarray  # [N] post-sigmoid alpha multiplier
    depth: jnp.ndarray  # [N] camera-space z
    radius: jnp.ndarray  # [N] float pixel radius (3 sigma)
    valid: jnp.ndarray  # [N] bool: alive, in front, non-degenerate
    object_id: jnp.ndarray  # [N] int32


def project_gaussians(
    cloud: GaussianCloud,
    cam: Camera,
    sh_degree: int | None = None,
    scaling_modifier: float = 1.0,
    near: float = 0.2,
) -> ProjectedGaussians:
    xyz = cloud.xyz
    n = xyz.shape[0]

    # world -> camera
    t = cam.world_to_cam(xyz)  # [N, 3]
    tz = t[:, 2]
    in_front = tz > near  # CUDA near-cull at 0.2

    tanx, tany = cam.tan_half_fov()
    fx, fy = cam.focal_px()

    # frustum clamp before the Jacobian (CUDA computeCov2D)
    limx = 1.3 * tanx
    limy = 1.3 * tany
    tz_safe = jnp.where(in_front, tz, 1.0)
    txtz = jnp.clip(t[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    # perspective Jacobian J [N, 2, 3]
    z_inv = 1.0 / tz_safe
    z_inv2 = z_inv * z_inv
    J = jnp.stack(
        [
            jnp.stack([fx * z_inv, jnp.zeros_like(tz), -fx * tx * z_inv2], axis=-1),
            jnp.stack([jnp.zeros_like(tz), fy * z_inv, -fy * ty * z_inv2], axis=-1),
        ],
        axis=-2,
    )

    # cov2D = J W Sigma W^T J^T + 0.3 I
    W = cam.R_w2c  # [3, 3]
    cov3d = cloud.covariance(scaling_modifier)  # [N, 3, 3]
    JW = jnp.matmul(J, W, precision=_PREC)  # [N, 2, 3]
    cov2d = jnp.matmul(
        jnp.matmul(JW, cov3d, precision=_PREC),
        jnp.swapaxes(JW, -1, -2),
        precision=_PREC,
    )  # [N, 2, 2]
    cov_a = cov2d[:, 0, 0] + 0.3
    cov_b = cov2d[:, 0, 1]
    cov_c = cov2d[:, 1, 1] + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    nondegenerate = det > 0.0
    det_safe = jnp.where(nondegenerate, det, 1.0)
    conic = jnp.stack(
        [cov_c / det_safe, -cov_b / det_safe, cov_a / det_safe], axis=-1
    )

    # 3-sigma radius from the larger eigenvalue (CUDA: ceil(3 sqrt(lambda1)))
    mid = 0.5 * (cov_a + cov_c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # pixel-space mean; ndc2Pix convention ((ndc+1)*S - 1) / 2
    x_ndc = t[:, 0] / (tanx * tz_safe)
    y_ndc = t[:, 1] / (tany * tz_safe)
    mean_x = ((x_ndc + 1.0) * cam.width - 1.0) * 0.5
    mean_y = ((y_ndc + 1.0) * cam.height - 1.0) * 0.5
    mean2d = jnp.stack([mean_x, mean_y], axis=-1)

    # view-dependent color: dir from camera center to splat (CUDA convention)
    if sh_degree is None:
        sh_degree = cloud.sh_degree
    dirs = xyz - cam.camera_center
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    feats = cloud.get_features()[:, : (sh_degree + 1) ** 2, :]
    color = jnp.maximum(shlib.eval_sh(sh_degree, feats, dirs) + 0.5, 0.0)

    valid = cloud.alive & in_front & nondegenerate

    return ProjectedGaussians(
        mean2d=mean2d,
        conic=conic,
        color=color,
        opacity=cloud.get_opacity()[:, 0],
        depth=tz,
        radius=jnp.where(valid, radius, 0.0),
        valid=valid,
        object_id=cloud.object_id,
    )


def splat_alpha_at_pixels(
    proj: ProjectedGaussians, px: jnp.ndarray, py: jnp.ndarray
) -> jnp.ndarray:
    """Per (pixel, splat) alpha with the CUDA cutoffs.

    px, py: [P] pixel centers. Returns [P, N] alphas in [0, 0.99].
    Contribution rules match the reference rasterizer: power > 0 -> skip,
    alpha < 1/255 -> skip, plus our (documented) pixel-granular 3-sigma box
    cull standing in for CUDA's tile-granularity rect cull.
    """
    dx = px[:, None] - proj.mean2d[None, :, 0]  # [P, N]
    dy = py[:, None] - proj.mean2d[None, :, 1]
    a, b, c = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    power = -0.5 * (a[None, :] * dx * dx + c[None, :] * dy * dy) - b[None, :] * dx * dy
    alpha = proj.opacity[None, :] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(alpha, 0.99)
    inside = (jnp.abs(dx) <= proj.radius[None, :]) & (
        jnp.abs(dy) <= proj.radius[None, :]
    )
    keep = (
        (power <= 0.0)
        & (alpha >= 1.0 / 255.0)
        & inside
        & proj.valid[None, :]
    )
    return jnp.where(keep, alpha, 0.0)
