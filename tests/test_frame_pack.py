"""pack_frame_bytes / unpack_frame_bytes roundtrip.

The packed frame is the only tensor crossing the device->host link per
frame, so its layout is load-bearing: rgb, uint16-mm depth, and the
bit-packed visib/amodal masks ride the wire; the semantic color image is
reconstructed host-side from visib bits + palette (it is flat palette
color by construction — reference: src/gs/render.py:100-129 renders
per-object flat colors).
"""

import numpy as np
import jax.numpy as jnp

from pegasus_tpu.ops.render import (
    FrameDataPoints,
    encode_frame,
    pack_frame_bytes,
    unpack_frame_bytes,
)


def _synthetic_frame(rng, h=12, w=16, k=3):
    rgb = rng.random((h, w, 3), dtype=np.float32)
    depth = rng.random((h, w), dtype=np.float32) * 3.0
    # mutually exclusive visib masks (weights sum <= 1 in the renderer)
    owner = rng.integers(0, k + 1, size=(h, w))  # 0 = background
    visib = np.stack([owner == i + 1 for i in range(k)], axis=-1)
    amodal = visib | (rng.random((h, w, k)) > 0.8)
    seg = np.zeros((h, w, 3), np.float32)
    return FrameDataPoints(
        rgb=jnp.asarray(rgb),
        depth=jnp.asarray(depth),
        alpha=jnp.ones((h, w), jnp.float32),
        mask_visib=jnp.asarray(visib),
        mask_amodal=jnp.asarray(amodal),
        seg_image=jnp.asarray(seg),
        vis_weights=jnp.asarray(visib, jnp.float32),
    )


def test_pack_unpack_roundtrip(rng):
    k = 3
    frame = _synthetic_frame(rng, k=k)
    palette = np.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.25, 0.5, 0.75]], np.float32
    )
    packed = np.asarray(pack_frame_bytes(encode_frame(frame)))
    # layout: 3 rgb + 2 depth + ceil(2K/8) mask bytes — no sem plane
    assert packed.shape[-1] == 5 + -(-2 * k // 8)

    data = unpack_frame_bytes(packed, k, palette=palette)
    np.testing.assert_array_equal(
        data["rgb_u8"],
        np.clip(np.asarray(frame.rgb) * 255 + 0.5, 0, 255).astype(np.uint8),
    )
    np.testing.assert_array_equal(
        data["depth_mm"],
        np.clip(np.asarray(frame.depth) * 1000, 0, 65535).astype(np.uint16),
    )
    np.testing.assert_array_equal(data["mask_visib"], np.asarray(frame.mask_visib))
    np.testing.assert_array_equal(data["mask_amodal"], np.asarray(frame.mask_amodal))

    # sem reconstruction: exact palette color where a visib mask is set,
    # black elsewhere
    visib = np.asarray(frame.mask_visib)
    pal_u8 = np.clip(palette * 255 + 0.5, 0, 255).astype(np.uint8)
    expect = np.zeros(visib.shape[:2] + (3,), np.uint8)
    for i in range(k):
        expect[visib[..., i]] = pal_u8[i]
    np.testing.assert_array_equal(data["sem_u8"], expect)

    # no palette -> black sem, everything else unchanged
    data2 = unpack_frame_bytes(packed, k)
    assert data2["sem_u8"].sum() == 0
    np.testing.assert_array_equal(data2["rgb_u8"], data["rgb_u8"])


def test_unpack_batch_axis(rng):
    """unpack works on a [N, H, W, C] chunk exactly as on one frame."""
    k = 2
    frames = [_synthetic_frame(rng, k=k) for _ in range(3)]
    packed = np.stack(
        [np.asarray(pack_frame_bytes(encode_frame(f))) for f in frames]
    )
    palette = np.array([[1, 0, 0], [0, 0, 1]], np.float32)
    batch = unpack_frame_bytes(packed, k, palette=palette)
    for j, f in enumerate(frames):
        one = unpack_frame_bytes(packed[j], k, palette=palette)
        for key in one:
            np.testing.assert_array_equal(batch[key][j], one[key])
        np.testing.assert_array_equal(
            one["mask_visib"], np.asarray(f.mask_visib)
        )
