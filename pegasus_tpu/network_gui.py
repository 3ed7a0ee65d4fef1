"""SIBR remote-viewer TCP protocol (Inria ``network_gui`` wire format).

The reference drives the SIBR remote viewer over a raw TCP socket
(reference: pegasus.py:84-86, 249-279; src/gs/gs_viewer.py:59-73) through
the gaussian-splatting submodule's ``network_gui`` module.  This is a
JAX-era server side of that same wire protocol, so existing SIBR viewer
builds can connect unchanged:

  client -> server:  4-byte little-endian length, then a JSON object with
      resolution_x/y, train, fov_x/fov_y, z_near/z_far, shs_python,
      rot_scale_python, keep_alive, scaling_modifier, view_matrix (16),
      view_projection_matrix (16);
  server -> client:  raw H*W*3 uint8 image bytes (row-major RGB), then
      4-byte little-endian length + ascii "verify" string (the model
      path in the reference).

Module-level API mirrors the reference exactly: ``init``,
``try_connect``, ``receive``, ``send`` and the module global ``conn``.
"""

from __future__ import annotations

import json
import socket
from typing import Optional, Tuple

import numpy as np

host = "127.0.0.1"
port = 6009
conn: Optional[socket.socket] = None
addr = None
listener: Optional[socket.socket] = None


def init(wish_host: str = "127.0.0.1", wish_port: int = 6009) -> None:
    global host, port, listener
    host, port = wish_host, wish_port
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect() -> None:
    global conn, addr
    if listener is None:
        return
    try:
        conn, addr = listener.accept()
        conn.settimeout(None)
    except (BlockingIOError, socket.timeout, OSError):
        pass


def _recv_exact(n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return buf


def read() -> dict:
    n = int.from_bytes(_recv_exact(4), "little")
    return json.loads(_recv_exact(n).decode("utf-8"))


def send(message_bytes: Optional[bytes], verify: str) -> None:
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def camera_from_message(message: dict):
    """Decode the SIBR camera: view_matrix is the transposed W2C with
    columns 1,2 sign-flipped (the Inria MiniCam convention)."""
    from pegasus_tpu.camera import Camera

    import jax.numpy as jnp

    V = np.asarray(message["view_matrix"], np.float32).reshape(4, 4)
    V[:, 1] = -V[:, 1]
    V[:, 2] = -V[:, 2]
    W2C = V.T  # rows [R_w2c | t]
    return Camera(
        R_w2c=jnp.asarray(W2C[:3, :3]),
        t_w2c=jnp.asarray(W2C[:3, 3]),
        fovx=jnp.asarray(float(message["fov_x"]), jnp.float32),
        fovy=jnp.asarray(float(message["fov_y"]), jnp.float32),
        width=int(message["resolution_x"]),
        height=int(message["resolution_y"]),
        znear=float(message.get("z_near", 0.01)),
        zfar=float(message.get("z_far", 100.0)),
    )


def receive() -> Tuple[object, bool, bool, bool, bool, float]:
    """(custom_cam, do_training, shs_python, rot_scale_python, keep_alive,
    scaling_modifier) — the reference's 6-tuple."""
    message = read()
    width = message["resolution_x"]
    height = message["resolution_y"]
    custom_cam = None
    if width != 0 and height != 0:
        custom_cam = camera_from_message(message)
    return (
        custom_cam,
        bool(message.get("train", False)),
        bool(message.get("shs_python", False)),
        bool(message.get("rot_scale_python", False)),
        bool(message.get("keep_alive", True)),
        float(message.get("scaling_modifier", 1.0)),
    )


def serve_frame(rgb01: np.ndarray, verify: str = "pegasus_tpu") -> None:
    """Send one rendered frame ([H, W, 3] float 0..1 or uint8)."""
    img = np.asarray(rgb01)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    send(np.ascontiguousarray(img).tobytes(), verify)


def close() -> None:
    global conn, listener
    if conn is not None:
        try:
            conn.close()
        except OSError:
            pass
        conn = None
    if listener is not None:
        try:
            listener.close()
        except OSError:
            pass
        listener = None


def gaussian_splatting_viewer(
    ply_path: str,
    ip: str = "127.0.0.1",
    port_: int = 6009,
    max_frames: Optional[int] = None,
    background=(0.0, 0.0, 0.0),
) -> int:
    """Serve one GS ply to a SIBR remote viewer over the wire protocol
    (reference: src/gs/gs_viewer.py:22-87).  Returns frames served."""
    global conn

    from pegasus_tpu.gs.ply import load_gs_ply
    from pegasus_tpu.ops.rasterize_ref import rasterize_reference

    cloud = load_gs_ply(ply_path)
    init(ip, port_)
    served = 0
    try:
        while max_frames is None or served < max_frames:
            if conn is None:
                try_connect()
                continue
            try:
                cam, _, _, _, keep_alive, scaling = receive()
                img_bytes = None
                if cam is not None:
                    out = rasterize_reference(
                        cloud, cam, background=background,
                        scaling_modifier=scaling,
                    )
                    img = np.clip(np.asarray(out.rgb), 0, 1)
                    img_bytes = (
                        (img * 255).astype(np.uint8).tobytes()
                    )
                    served += 1
                send(img_bytes, str(ply_path))
                if not keep_alive:
                    break
            except Exception:
                conn = None
    finally:
        close()
    return served
