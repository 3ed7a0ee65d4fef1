"""Semantic color assignment for segmentation rendering.

Reproduces the reference's evenly-spaced HLS palette
(reference: src/utility/graphic_utils.py:40-60) that is injected into each
object's SH DC term for the segmentation passes (reference:
pegasus.py:218-234).  In PEGASUS-TPU the renderer emits exact per-pixel
object IDs, so these colors are only needed to *paint* the semantic
segmentation image — never to decode masks.
"""

from __future__ import annotations

import colorsys

import numpy as np


def generate_colors(n: int, mode: str = "bgr") -> np.ndarray:
    """n evenly-spaced HLS colors as float32 [n, 3] in [0,1]."""
    colors = []
    for i in range(n):
        hue = i / n
        saturation = 0.7
        lightness = 0.6
        rgb = colorsys.hls_to_rgb(hue, lightness, saturation)
        if mode == "bgr":
            colors.append((rgb[2], rgb[1], rgb[0]))
        elif mode == "rgb":
            colors.append(tuple(rgb))
        else:
            raise ValueError(f"Color mode {mode} is not supported")
    return np.asarray(colors, dtype=np.float32)
