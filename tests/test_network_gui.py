"""SIBR network_gui wire-protocol tests over a loopback socket.

A fake SIBR client speaks the Inria wire format (4-byte little-endian
length + JSON request; raw RGB bytes + length-prefixed verify string
back) against our server (pegasus_tpu/network_gui.py), proving existing
viewer builds can connect unchanged (reference: pegasus.py:84-86,
249-279; src/gs/gs_viewer.py:59-73).
"""

import json
import socket
import threading

import numpy as np
import pytest


def _client_request(sock, width, height, view=None, train=False):
    if view is None:
        view = np.eye(4, dtype=np.float32)
    msg = {
        "resolution_x": width,
        "resolution_y": height,
        "train": train,
        "fov_x": 1.0,
        "fov_y": 0.8,
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": [float(v) for v in view.flatten()],
        "view_projection_matrix": [float(v) for v in np.eye(4).flatten()],
    }
    payload = json.dumps(msg).encode("utf-8")
    sock.sendall(len(payload).to_bytes(4, "little"))
    sock.sendall(payload)


def _client_read_frame(sock, width, height):
    n = width * height * 3
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed mid-frame"
        buf += chunk
    vlen = int.from_bytes(sock.recv(4), "little")
    verify = sock.recv(vlen).decode("ascii")
    return np.frombuffer(buf, np.uint8).reshape(height, width, 3), verify


def test_wire_roundtrip():
    from pegasus_tpu import network_gui as ng

    ng.init("127.0.0.1", 0)
    port = ng.listener.getsockname()[1]

    client = socket.create_connection(("127.0.0.1", port), timeout=60)
    ng.try_connect()
    assert ng.conn is not None

    w, h = 32, 24
    # camera placed to look at the origin from +z (SIBR convention view)
    _client_request(client, w, h)
    cam, do_training, shs, rot, keep_alive, scaling = ng.receive()
    assert cam is not None
    assert cam.width == w and cam.height == h
    assert not do_training and keep_alive and scaling == 1.0

    img = (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)
    ng.serve_frame(img, verify="model_path")
    got, verify = _client_read_frame(client, w, h)
    np.testing.assert_array_equal(got, img)
    assert verify == "model_path"

    # a resolution_x == 0 message means "no camera" (reference semantics)
    _client_request(client, 0, 0)
    cam2, *_ = ng.receive()
    assert cam2 is None

    client.close()
    ng.close()


def test_viewer_serves_renders(tmp_path):
    """gaussian_splatting_viewer end-to-end: a client requests 2 frames
    of a real ply and receives plausible renders."""
    from pegasus_tpu import network_gui as ng
    from pegasus_tpu.gs.ply import save_gs_ply
    from pegasus_tpu.testing import make_box_cloud

    rng = np.random.default_rng(1)
    cloud = make_box_cloud(rng, n=300, rgb=(0.8, 0.2, 0.2), object_id=0)
    ply = tmp_path / "point_cloud.ply"
    save_gs_ply(cloud, str(ply))

    # serve on an ephemeral port: pre-bind via port_=0 is not in the
    # reference API, so pick a free port first
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    result = {}

    def server():
        result["served"] = ng.gaussian_splatting_viewer(
            str(ply), ip="127.0.0.1", port_=port, max_frames=2
        )

    th = threading.Thread(target=server, daemon=True)
    th.start()

    # connect (retry until the listener is up)
    client = None
    for _ in range(100):
        try:
            client = socket.create_connection(("127.0.0.1", port), timeout=60)
            break
        except OSError:
            import time

            time.sleep(0.05)
    assert client is not None

    w, h = 40, 30
    # W2C looking at origin from (0, 0, 1.2): R=I with z flip handled by
    # the protocol's column negation, so build the matrix the client way:
    R_w2c = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    t_w2c = np.array([0, 0, 1.2], np.float32)
    W2C = np.eye(4, dtype=np.float32)
    W2C[:3, :3] = R_w2c
    W2C[:3, 3] = t_w2c
    view = W2C.T.copy()  # transposed storage
    view[:, 1] = -view[:, 1]
    view[:, 2] = -view[:, 2]

    imgs = []
    for _ in range(2):
        _client_request(client, w, h, view=view)
        img, verify = _client_read_frame(client, w, h)
        imgs.append(img)
        assert verify == str(ply)
    # then release the server loop
    client.close()
    th.join(timeout=120)
    assert result.get("served") == 2
    # the box is red-ish and visible
    assert imgs[0].mean() > 1
    assert imgs[0][..., 0].sum() > imgs[0][..., 2].sum()


def test_publish2gui_serves_during_generation(tmp_path):
    """PEGASUS(publish2gui=True) answers a SIBR client's request while
    generating frames (reference: pegasus.py:249-279)."""
    from pegasus_tpu import network_gui as ng
    from pegasus_tpu.assets.registry import Asset
    from pegasus_tpu.pegasus import PEGASUS
    from pegasus_tpu.testing import build_synthetic_dataset

    root = tmp_path / "data"
    build_synthetic_dataset(root)
    env = Asset(OBJECT_NAME="asphalt", ID=1003, TYPE="environment",
                dataset_path=str(root), DROP_REGION=(0.05, 0.05),
                DROP_HEIGHT=(0.2, 0.25))
    objs = [Asset(OBJECT_NAME="cup_noodles_04", ID=104, dataset_path=str(root))]

    old_port = PEGASUS.PORT
    PEGASUS.PORT = 0  # ephemeral
    try:
        pegasus = PEGASUS(
            dataset_path=str(root), env_dataset_path=str(root),
            urdf_asset_folder=str(root / "urdf"),
            gs_env_list=[env], gs_object_list=objs,
            render_height=40, render_width=48, num_cameras=1,
            simulation_steps=20, num_camera_interpolation_steps=4,
            mode="static", camera_trajectory_mode="sequence",
            dataset_base_path=str(tmp_path / "out"), seed=1,
            publish2gui=True, QUIET=True,
        )
        port = ng.listener.getsockname()[1]
        client = socket.create_connection(("127.0.0.1", port), timeout=60)
        # queue one camera request BEFORE the frame loop polls
        w, h = 32, 24
        R_w2c = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
        W2C = np.eye(4, dtype=np.float32)
        W2C[:3, :3] = R_w2c
        W2C[:3, 3] = [0, 0, 1.2]
        view = W2C.T.copy()
        view[:, 1] = -view[:, 1]
        view[:, 2] = -view[:, 2]
        _client_request(client, w, h, view=view)

        name = "gui_run"
        pegasus.init_bullet([env], objs, name, 1, 1, 1, random=False)
        pegasus.init(name, 1)
        pegasus.init_start_position()
        pegasus.generate_dataset(["rgb"], save_bop=True, save_video=False)
        pegasus.save2bop()

        client.settimeout(120)
        img, verify = _client_read_frame(client, w, h)
        assert img.shape == (h, w, 3)
        assert verify == str(root)
        client.close()
    finally:
        PEGASUS.PORT = old_port
        ng.close()


def test_gui_serves_during_training(tmp_path):
    """train_gaussian_splatting_wrapper(gui=True) answers a SIBR client
    mid-training: one receive -> render-current-cloud -> send cycle, then
    the client's train=True releases the loop (reference:
    src/gs/gs_training.py:43-44 enables the same server)."""
    import time

    from pegasus_tpu import network_gui as ng
    from pegasus_tpu.camera import Camera
    from pegasus_tpu.io import colmap as cio
    from pegasus_tpu.io.png import write_png
    from pegasus_tpu.ops.rasterize_ref import rasterize_reference
    from pegasus_tpu.testing import make_box_cloud, make_colmap_hemisphere
    from pegasus_tpu.training.trainer import train_gaussian_splatting_wrapper
    from pegasus_tpu.utils.pose import focal2fov

    rng = np.random.default_rng(3)
    W = H = 32
    focal = 40.0
    cams, images = make_colmap_hemisphere(
        n_images=4, radius=0.5, width=W, height=H, focal=focal
    )
    gt_cloud = make_box_cloud(
        rng, n=200, half_extents=(0.07, 0.07, 0.09), rgb=(0.7, 0.3, 0.2),
        object_id=0,
    )
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    cio.write_cameras_binary(cams, sparse / "cameras.bin")
    cio.write_images_binary(images, sparse / "images.bin")
    pts_xyz = np.asarray(gt_cloud.xyz)[::4]
    pts = {
        i: cio.ColmapPoint3D(
            i, pts_xyz[i], np.array([150, 80, 60], np.uint8), 0.1,
            np.zeros(0, np.int32), np.zeros(0, np.int32),
        )
        for i in range(len(pts_xyz))
    }
    cio.write_points3d_binary(pts, sparse / "points3D.bin")
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    fov = focal2fov(focal, W)
    for im in images.values():
        cam = Camera.from_colmap(im.qvec, im.tvec, fov, fov, W, H)
        out = rasterize_reference(gt_cloud, cam, max_objects=1, chunk=512)
        write_png(
            img_dir / im.name,
            (np.clip(np.asarray(out.rgb), 0, 1) * 255).astype(np.uint8),
        )

    # ephemeral port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    model_dir = tmp_path / "model"
    result = {}

    def server():
        result["state"] = train_gaussian_splatting_wrapper(
            str(tmp_path), str(model_dir),
            TEST_ITERATION=(3,), SAVE_ITERATION=(3,), iterations=3,
            capacity=512, gui=True, ip="127.0.0.1", port=port,
        )

    th = threading.Thread(target=server, daemon=True)
    th.start()

    client = None
    deadline = time.time() + 300
    while time.time() < deadline:
        try:
            client = socket.create_connection(("127.0.0.1", port), timeout=60)
            break
        except OSError:
            time.sleep(0.05)
    assert client is not None
    client.settimeout(300)

    # camera looking at the origin from +z, client-side view encoding
    w, h = 32, 24
    R_w2c = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    W2C = np.eye(4, dtype=np.float32)
    W2C[:3, :3] = R_w2c
    W2C[:3, 3] = [0, 0, 1.2]
    view = W2C.T.copy()
    view[:, 1] = -view[:, 1]
    view[:, 2] = -view[:, 2]

    # cycle 1: request a render of the in-training cloud
    _client_request(client, w, h, view=view)
    img, verify = _client_read_frame(client, w, h)
    assert img.shape == (h, w, 3)
    assert verify == str(model_dir)
    assert img.mean() > 0.5  # the seeded cloud is visible, not all-black

    # cycle 2: train=True releases the hook back to training
    _client_request(client, 0, 0, train=True)
    vlen = int.from_bytes(client.recv(4), "little")
    assert client.recv(vlen).decode("ascii") == str(model_dir)
    client.close()

    th.join(timeout=600)
    assert not th.is_alive()
    assert (model_dir / "point_cloud" / "iteration_3" / "point_cloud.ply").exists()
