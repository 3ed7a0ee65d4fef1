"""PEGASUS-TPU: a TPU-native 6DoF object-pose dataset generator.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of meyerls/PEGASUS
(Physically Enhanced Gaussian Splatting Simulation System): composes
pre-reconstructed 3D-Gaussian-Splatting environments and objects into new
scenes, drops the objects with a rigid-body physics engine, renders
RGB / depth / segmentation from interpolated camera trajectories, and writes
BOP-format pose-estimation training data.

Design goals (vs the CUDA/torch reference):
  * one fused rasterizer pass emits RGB + depth + per-pixel object IDs
    (the reference needs 3 + N_objects CUDA passes per frame,
    reference: pegasus.py:293-332, src/gs/render.py:36-129)
  * immutable `GaussianCloud` pytrees; poses are applied functionally
    (the reference deep-copies and mutates torch tensors per frame,
    reference: pegasus.py:255-264)
  * physics is a vmapped JAX rigid-body stepper: hundreds of scene
    variants simulate in parallel (reference: single PyBullet process,
    src/engine/physical_simulation.py)
  * scale-out via jax.sharding over a device mesh; no NCCL-style code.
"""

__version__ = "0.1.0"

from pegasus_tpu.gs.cloud import GaussianCloud, merge
from pegasus_tpu.camera import Camera
from pegasus_tpu.config import GenerationConfig

__all__ = ["GaussianCloud", "merge", "Camera", "GenerationConfig", "__version__"]
