"""Live sanity check: spin an asset and watch SE(3)+SH rotation hold up.

Equivalent of the reference's rotating-object viewer loop
(reference: src/gs/gs_object_rotation.py:49-118, applying Rz(0.05) per
frame), writing an mp4 instead of streaming to SIBR.

Usage: python examples/rotating_object.py <point_cloud.ply> [out.mp4] [n_frames] [size]
"""

import sys

import numpy as np
import jax

from pegasus_tpu.gs.ply import load_gs_ply
from pegasus_tpu.utils.pose import rotate_z


def main():
    ply_path = sys.argv[1] if len(sys.argv) > 1 else None
    out = sys.argv[2] if len(sys.argv) > 2 else "rotating_object.mp4"
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 126
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 480
    if ply_path:
        cloud = load_gs_ply(ply_path)
    else:
        from pegasus_tpu.testing import make_box_cloud

        cloud = make_box_cloud(np.random.default_rng(0), n=2000)

    import cv2
    from pegasus_tpu.camera import Camera
    from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled

    center = np.asarray(cloud.centroid())
    spread = np.linalg.norm(np.asarray(cloud.xyz) - center, axis=1)
    radius = float(np.quantile(spread, 0.95)) * 3.5
    cam = Camera.look_at(
        eye=center + np.array([radius, 0, radius * 0.5]),
        target=center, up=(0, 0, 1),
        fovx=np.deg2rad(50), fovy=np.deg2rad(50), width=size, height=size,
    )
    render = jax.jit(
        lambda c: rasterize_tiled(c, cam, background=(1.0, 1.0, 1.0)).rgb
    )

    writer = cv2.VideoWriter(
        out, cv2.VideoWriter_fourcc(*"mp4v"), 20, (size, size)
    )
    R = rotate_z(0.05)  # the reference's per-frame increment
    for _ in range(n_frames):  # 126 = full revolution
        rgb = np.asarray(np.clip(render(cloud) * 255, 0, 255)).astype(np.uint8)
        writer.write(rgb[:, :, ::-1])
        cloud = cloud.transformed(R, np.zeros(3))
    writer.release()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
