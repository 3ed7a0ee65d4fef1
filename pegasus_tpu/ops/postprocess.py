"""Screen-space post-processing: depth normals + SSAO (JAX).

Port of the reference's offline SSAO prototype
(reference: src/gs/ao_test.py: normals from depth via Sobel :37-67, SSAO
from depth+normals :126-152, applied to RGB :184-188).  Pure JAX, so it
can be fused onto the end of a render batch; not wired into the default
pipeline (the reference never wired it either).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sobel(depth: jnp.ndarray):
    """(dz/dx, dz/dy) via 3x3 Sobel filters on an [H, W] depth map."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    ky = kx.T

    def conv(img, k):
        return jax.lax.conv_general_dilated(
            img[None, :, :, None],
            k[:, :, None, None],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]

    return conv(depth, kx), conv(depth, ky)


def normals_from_depth(depth: jnp.ndarray, strength: float = 1.0) -> jnp.ndarray:
    """[H, W, 3] unit normal map from camera-space depth (ao_test.py:37-67)."""
    gx, gy = _sobel(depth)
    n = jnp.stack([-gx * strength, -gy * strength, jnp.ones_like(depth)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def ssao(
    depth: jnp.ndarray,
    normals: jnp.ndarray | None = None,
    radius_px: int = 8,
    n_samples: int = 16,
    strength: float = 1.0,
    key=None,
) -> jnp.ndarray:
    """[H, W] ambient-occlusion factor in [0, 1] (1 = unoccluded).

    Horizon-style screen-space AO: sample depth at fixed offsets around
    each pixel; occlusion accumulates where neighbors are closer to the
    camera than the center by more than a normal-dependent bias
    (ao_test.py:126-152).
    """
    if normals is None:
        normals = normals_from_depth(depth)
    key = key if key is not None else jax.random.PRNGKey(0)
    h, w = depth.shape
    angles = jnp.linspace(0, 2 * jnp.pi, n_samples, endpoint=False)
    radii = (jnp.arange(n_samples) % 4 + 1) / 4.0 * radius_px
    dx = jnp.round(jnp.cos(angles) * radii).astype(jnp.int32)
    dy = jnp.round(jnp.sin(angles) * radii).astype(jnp.int32)

    def sample_occlusion(carry, i):
        occ = carry
        shifted = jnp.roll(jnp.roll(depth, dy[i], axis=0), dx[i], axis=1)
        bias = 0.01 + 0.02 * (1.0 - normals[..., 2])
        diff = depth - shifted  # >0 when the neighbor is closer
        contrib = jnp.clip(diff - bias, 0.0, 0.1) / 0.1
        return occ + contrib, None

    occ, _ = jax.lax.scan(sample_occlusion, jnp.zeros_like(depth),
                          jnp.arange(n_samples))
    ao = 1.0 - jnp.clip(strength * occ / n_samples, 0.0, 1.0)
    return jnp.where(depth > 0, ao, 1.0)


def apply_ssao(rgb: jnp.ndarray, depth: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Darken RGB by the AO factor (ao_test.py:184-188)."""
    ao = ssao(depth, **kwargs)
    return jnp.clip(rgb * ao[..., None], 0.0, 1.0)
