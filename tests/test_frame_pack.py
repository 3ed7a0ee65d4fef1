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

import jax
import pytest

from pegasus_tpu.ops.render import (
    FrameDataPoints,
    encode_frame,
    pack_frame_bytes,
    rle_max_runs,
    rle_pack_chunk,
    rle_unpack_chunk,
    split_frame_planes,
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


def _pack_chunk(frames, max_runs):
    """Stack frames -> (dense, sparse) chunk -> jitted RLE pack."""
    planes = [split_frame_planes(encode_frame(f)) for f in frames]
    dense = jnp.stack([d for d, _ in planes])
    sparse = jnp.stack([s for _, s in planes])
    buf, fb = jax.jit(rle_pack_chunk, static_argnums=2)(
        dense, sparse, max_runs
    )
    return np.asarray(buf), fb


def test_rle_chunk_roundtrip(rng):
    """RLE-compacted chunk decodes bit-identically to the plain path."""
    k, c, h, w = 3, 4, 12, 16
    frames = [_synthetic_frame(rng, h=h, w=w, k=k) for _ in range(c)]
    palette = np.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.25, 0.5, 0.75]], np.float32
    )
    # random-owner frames are maximally run-dense; use an ample test
    # budget (production frames are block-sparse, see the budget test)
    max_runs = 4096
    buf, _ = _pack_chunk(frames, max_runs)

    got = rle_unpack_chunk(buf, (c, h, w), k, max_runs, palette=palette)
    plain = unpack_frame_bytes(
        np.stack([np.asarray(pack_frame_bytes(encode_frame(f)))
                  for f in frames]),
        k, palette=palette,
    )
    for key in plain:
        np.testing.assert_array_equal(got[key], plain[key])


def test_rle_overflow_fallback(rng):
    """Run budget overflow: host decodes from the raw fallback planes;
    without a fallback it raises instead of truncating silently."""
    k, c, h, w = 3, 2, 12, 16
    frames = [_synthetic_frame(rng, h=h, w=w, k=k) for _ in range(c)]
    max_runs = 4  # synthetic frames have far more runs than this
    buf, sparse_dev = _pack_chunk(frames, max_runs)
    n_runs = int(np.frombuffer(buf[:4].tobytes(), dtype="<u4")[0])
    assert n_runs > max_runs

    fetches = []

    def fallback():
        fetches.append(1)
        return np.asarray(sparse_dev)

    got = rle_unpack_chunk(
        buf, (c, h, w), k, max_runs, fallback_sparse=fallback
    )
    assert fetches == [1]
    plain = unpack_frame_bytes(
        np.stack([np.asarray(pack_frame_bytes(encode_frame(f)))
                  for f in frames]),
        k,
    )
    for key in plain:
        np.testing.assert_array_equal(got[key], plain[key])

    with pytest.raises(ValueError, match="RLE overflow"):
        rle_unpack_chunk(buf, (c, h, w), k, max_runs)


def _blocky_frame(rng, h, w, k):
    """Scene-shaped frame: smooth depth, objects as compact rectangles —
    the sparsity profile the RLE budget is sized for."""
    rgb = rng.random((h, w, 3), dtype=np.float32)
    depth = 1.2 + 0.8 * np.linspace(0, 1, w, dtype=np.float32)[None, :]
    depth = np.broadcast_to(depth, (h, w)).copy()
    visib = np.zeros((h, w, k), bool)
    for i in range(k):
        y0 = (i * h) // (k + 1)
        x0 = (i * w) // (k + 1)
        visib[y0:y0 + h // 4, x0:x0 + w // 4, i] = True
    amodal = visib.copy()
    return FrameDataPoints(
        rgb=jnp.asarray(rgb),
        depth=jnp.asarray(depth),
        alpha=jnp.ones((h, w), jnp.float32),
        mask_visib=jnp.asarray(visib),
        mask_amodal=jnp.asarray(amodal),
        seg_image=jnp.zeros((h, w, 3), jnp.float32),
        vis_weights=jnp.asarray(visib, jnp.float32),
    )


def test_rle_budget_cuts_transfer(rng):
    """Scene-shaped frames fit the production run budget, and the
    fixed-budget buffer is materially smaller than the 6 B/px packed
    chunk (the whole point of the compact path)."""
    # wide-ish frames: run count grows per-ROW (depth-band crossings,
    # object edges) while the budget grows per-PIXEL, so the production
    # 640-wide regime needs a non-toy width to be representative
    k, c, h, w = 3, 4, 64, 256
    frames = [_blocky_frame(rng, h=h, w=w, k=k) for _ in range(c)]
    mb = -(-2 * k // 8)
    max_runs = rle_max_runs(c, h, w, 1 + mb)
    buf, _ = _pack_chunk(frames, max_runs)
    n_runs = int(np.frombuffer(buf[:4].tobytes(), dtype="<u4")[0])
    assert n_runs <= max_runs  # no overflow on scene-shaped content
    plain_bytes = c * h * w * (5 + mb)
    assert buf.size < 0.75 * plain_bytes

    got = rle_unpack_chunk(buf, (c, h, w), k, max_runs)
    plain = unpack_frame_bytes(
        np.stack([np.asarray(pack_frame_bytes(encode_frame(f)))
                  for f in frames]),
        k,
    )
    for key in plain:
        np.testing.assert_array_equal(got[key], plain[key])


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
