"""PEGASUS orchestrator: physics -> composition -> render -> BOP export.

API-compatible rebuild of the reference's ``PEGASUS`` class
(reference: pegasus.py:36-396): same lifecycle
``init_bullet -> init -> init_start_position -> generate_dataset -> save2bop``,
same constructor vocabulary, same trajectory-JSON handoff — but the frame
loop is one jitted render per camera emitting EVERY modality (the reference
re-merges clouds and invokes the CUDA rasterizer 3 + N_objects times per
frame, pegasus.py:255-332).

Key differences (deliberate, documented):
  * physics runs on the vmappable JAX engine (same JSON schema);
  * dynamic-mode ground truth records the pose AT EACH FRAME's timestep —
    the reference freezes R_init/t_init at timestep 0 and writes that for
    every dynamic frame (pegasus_setup.py:160-193 never updates them);
    pass ``freeze_dynamic_gt_pose=True`` for bit-exact reference behavior;
  * masks come from exact per-object compositing weights, not 0.1
    color-distance decoding.
"""

from __future__ import annotations

import functools
import logging
import time
from pathlib import Path
from typing import Dict, List, Literal, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from pegasus_tpu.assets.registry import Asset
from pegasus_tpu.gs.ply import load_gs_ply
from pegasus_tpu.io import colmap as colmap_io
from pegasus_tpu.io.bop_writer import BOPDatasetWriter
from pegasus_tpu.io.mesh import load_mesh
from pegasus_tpu.ops.render import (encode_frame, pack_frame_bytes,
                                    render_frame, rle_max_runs,
                                    rle_pack_chunk, rle_unpack_chunk,
                                    split_frame_planes, unpack_frame_bytes)
from pegasus_tpu.physics.engine import PhysicsEngine
from pegasus_tpu.scene.camera_trajectory import create_camera_trajectory
from pegasus_tpu.scene.composition import SceneTemplate, pose_scene
from pegasus_tpu.scene.trajectory import Trajectory
from pegasus_tpu.scene.video import VideoStreams, draw_object_centers
from pegasus_tpu.utils.colors import generate_colors


class PEGASUS:
    """End-to-end 6DoF pose dataset generator."""

    LOAD_ITERATION: int = 30_000
    SH_DEGREE: int = 3
    IP: str = "127.0.0.1"
    PORT: int = 6009

    def __init__(
        self,
        dataset_path: str,
        env_dataset_path: Optional[str],
        urdf_asset_folder: Union[str, list],
        gs_env_list: List[Asset],
        gs_object_list: List[Asset],
        mode: Literal["dynamic", "static"] = "static",
        camera_trajectory_mode: Literal["random", "sequence", "random+zoom"] = "random",
        render_height: int = 480,
        render_width: int = 640,
        num_cameras: int = 1,
        simulation_steps: int = 100,
        num_camera_interpolation_steps: int = 1,
        dataset_base_path: str = "./dataset",
        background=(0.0, 0.0, 0.0),
        seed: Optional[int] = None,
        splat_budget: Optional[int] = None,
        rasterize_fn=None,
        unit_scale: float = 1000.0,
        QUIET: bool = False,
        publish2gui: bool = False,  # serve frames to a SIBR viewer (TCP)
        frame_chunk: int = 8,  # frames per dispatch/readback (1 = per-frame)
        compact_readback: bool = False,  # RLE the sparse planes (depth-hi
        # + mask bits) device-side before the chunk fetch: ~30% less
        # transfer, lossless.  Opt-in: worth it on slow links (tunnels,
        # congested PCIe); fast links just pay the host decode.
        freeze_dynamic_gt_pose: bool = False,  # reference quirk: dynamic
        # scene_gt keeps the t=0 pose for every frame (pegasus.py:360-365
        # always writes R_init/t_init set at pegasus_setup.py:160-176)
    ):
        # one-time amortization: persist XLA executables across processes
        # (the TPU analogue of the reference's install-time CUDA build)
        from pegasus_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.dataset_path = dataset_path
        self.env_dataset_path = env_dataset_path or dataset_path
        self.urdf_asset_folder = urdf_asset_folder
        self.render_height = render_height
        self.render_width = render_width
        self.num_cameras = num_cameras
        self.num_camera_interpolation_steps = num_camera_interpolation_steps
        self.simulation_steps = simulation_steps
        self.mode = mode
        self.camera_trajectory_mode = camera_trajectory_mode
        self.dataset_base_path = dataset_base_path
        self.background = background
        self.fps = 50
        self.rng = np.random.default_rng(seed)
        self.splat_budget = splat_budget
        self.unit_scale = unit_scale
        self.publish2gui = publish2gui
        if publish2gui:
            # SIBR remote-viewer socket, same wire protocol as the
            # reference (pegasus.py:84-86; pegasus_tpu/network_gui.py)
            from pegasus_tpu import network_gui

            network_gui.init(self.IP, self.PORT)
        self.rasterize_fn = rasterize_fn
        self.QUIET = QUIET
        self.frame_chunk = max(1, int(frame_chunk))
        self.compact_readback = bool(compact_readback)
        self.freeze_dynamic_gt_pose = freeze_dynamic_gt_pose

        # Preload GS clouds + COLMAP poses once (reference: pegasus.py:89-117)
        self.gaussian_environment_pre_load: Dict[str, dict] = {}
        for env in gs_env_list:
            cloud = load_gs_ply(env.gaussian_point_cloud_path(self.LOAD_ITERATION))
            reco = Path(env.reconstruction_path)
            cam_extr = colmap_io.read_images_binary(reco / "sparse/0/images.bin")
            cam_intr = colmap_io.read_cameras_binary(reco / "sparse/0/cameras.bin")
            self.gaussian_environment_pre_load[env.object_name] = {
                "gs": cloud,
                "cam_extr": cam_extr,
                "cam_intr": cam_intr,
                "asset": env,
            }

        self.gaussian_object_pre_load: Dict[str, dict] = {}
        for obj in gs_object_list:
            obj.mode = "fused"
            cloud = load_gs_ply(obj.gaussian_point_cloud_path(self.LOAD_ITERATION))
            self.gaussian_object_pre_load[obj.object_name] = {
                "gs": cloud,
                "asset": obj,
            }

        # object meshes for the BOP writer (cached once; the reference
        # re-reads them per frame, pegasus_bop.py:464-466)
        self.object_meshes = {}
        for obj in gs_object_list:
            mesh_path = Path(obj.urdf_obj_path)
            if mesh_path.exists():
                self.object_meshes[obj.ID] = load_mesh(mesh_path)

    # -- physics -----------------------------------------------------------------

    def init_bullet(
        self,
        env_list: List[Asset],
        obj_list: List[Asset],
        dataset_name: str,
        scene_id: int,
        min_num_objects: int = 1,
        max_num_objects: int = 1,
        random: bool = True,
    ) -> None:
        """Drop a random object subset onto a random environment
        (reference: pegasus.py:166-216)."""
        engine_path = (
            Path(self.dataset_base_path)
            / dataset_name
            / "engine"
            / f"{scene_id:06d}_simulation_steps.json"
        )
        if not random:
            self.rng = np.random.default_rng(42)

        min_num_objects = min(min_num_objects, len(obj_list))
        max_num_objects = min(max_num_objects, len(obj_list))

        select_env = env_list[int(self.rng.integers(0, len(env_list)))]
        self.selected_env_name = select_env.object_name
        n_objects = int(self.rng.integers(min_num_objects, max_num_objects + 1))
        idx = self.rng.choice(len(obj_list), n_objects, replace=False).tolist()
        selected = [obj_list[i] for i in idx]
        self.selected_object_ids = [int(o.ID) for o in selected]

        from pegasus_tpu.physics.engine import MAX_BODIES

        engine = PhysicsEngine(
            asset_folder=self.urdf_asset_folder,
            output_path_json=str(engine_path),
            simulation_steps=self.simulation_steps,
            seed=int(self.rng.integers(0, 2**31)),
            # auto-size the body capacity: rich scenes (eval config 4,
            # "30 objects x 5 envs") must not hit the static default cap
            max_bodies=max(MAX_BODIES, max_num_objects + 1),
        )
        engine.add_object(select_env, start_pos=select_env.START_POSITION_PYBULLET)
        for obj in selected:
            engine.add_object(obj, start_pos=select_env.define_start_pos(self.rng))
        self.trajectory = engine.simulate()
        self.physics_file = engine.trajectory_path
        self.py_engine = engine

    # -- per-scene setup -----------------------------------------------------------

    def init(self, dataset_name: str, scene_id: int) -> None:
        """Build the camera trajectory + BOP writer for one scene
        (reference: pegasus.py:119-164)."""
        self.dataset_name = dataset_name
        self.scene_id = scene_id
        if not hasattr(self, "trajectory"):
            self.trajectory = Trajectory.from_json(self.physics_file)

        env_entry = self.gaussian_environment_pre_load[self.selected_env_name]
        cam_intr = env_entry["cam_intr"]
        intr = colmap_io.colmap_intrinsics(cam_intr[min(cam_intr.keys())])
        fx, fy, _, _ = intr
        width0 = cam_intr[min(cam_intr.keys())].width
        height0 = cam_intr[min(cam_intr.keys())].height

        self.pegasus_dataset = BOPDatasetWriter(
            dataset_name=dataset_name,
            dataset_output_path=Path(self.dataset_base_path),
            camera_intr={"fx": fx, "fy": fy, "width": width0, "height": height0},
            render_width=self.render_width,
            render_height=self.render_height,
            object_models=self.object_meshes,
            scene_id=scene_id,
            unit_scale=self.unit_scale,
        )

        self.viewport_cam_list = create_camera_trajectory(
            cam_extr=env_entry["cam_extr"],
            focal_x=fx,
            intr_width=width0,
            intr_height=height0,
            render_width=self.render_width,
            render_height=self.render_height,
            num_cameras=self.num_cameras,
            num_interpolation_steps=self.num_camera_interpolation_steps,
            mode=self.camera_trajectory_mode,
            rng=self.rng,
        )

        self.video = VideoStreams(
            str(self.pegasus_dataset.video_path),
            self.render_width,
            self.render_height,
            fps=self.fps,
        )

    # -- scene composition ------------------------------------------------------------

    def init_start_position(self) -> None:
        """Merge env + objects into the scene template and fetch poses
        (reference: pegasus.py:218-245)."""
        traj = self.trajectory
        bullet_ids = traj.object_bullet_ids()
        id_to_asset = traj.bullet_id_to_asset()

        self.semantic_colors = generate_colors(len(bullet_ids), mode="rgb")
        self._semantic_colors_dev = jnp.asarray(self.semantic_colors, jnp.float32)

        env_cloud = self.gaussian_environment_pre_load[self.selected_env_name]["gs"]
        object_clouds = []
        self.bullet_to_real_id = {}
        for bid in bullet_ids:
            info = id_to_asset[bid]
            object_clouds.append(self.gaussian_object_pre_load[info.name]["gs"])
            self.bullet_to_real_id[bid] = info.object_ID

        self.template = SceneTemplate.build(
            env_cloud, object_clouds, pad_to=self.splat_budget
        )
        self.bullet_ids = bullet_ids

        # body pose arrays (bullet body b -> template body index b)
        self.times_t = jnp.asarray(traj.times_t, jnp.float32)
        self.times_q = jnp.asarray(traj.times_q, jnp.float32)

        step = 0 if self.mode == "dynamic" else traj.num_steps - 1
        self._initial_step = step

    def _body_poses_at(self, step: int):
        from pegasus_tpu.scene.composition import poses_from_trajectory_step

        step = min(step, self.trajectory.num_steps - 1)
        return poses_from_trajectory_step(self.times_t, self.times_q, step)

    # -- main loop ------------------------------------------------------------------

    @functools.cached_property
    def _pose_program(self):
        return jax.jit(pose_scene)

    @functools.cached_property
    def _rasterize_kwargs(self):
        kwargs = {}
        if self.rasterize_fn is not None:
            kwargs["rasterize_fn"] = self.rasterize_fn
        elif jax.default_backend() != "cpu":
            # TPU: fused Pallas compositor; CPU falls back to the portable
            # tiled XLA backend
            from pegasus_tpu.ops.rasterize_pallas import rasterize_pallas

            kwargs["rasterize_fn"] = rasterize_pallas
        else:
            from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled

            kwargs["rasterize_fn"] = rasterize_tiled
        return kwargs

    @functools.cached_property
    def _chunk_program(self):
        """Static-mode chunk: C frames of one posed scene as ONE dispatch.

        lax.map over a stacked camera batch (NOT vmap: the Pallas kernel
        has no batching rule, and a chip renders one frame at a time
        anyway).  One dispatch + one readback per C frames amortizes the
        per-call round trip (~2.7 ms dispatch + ~50 ms fetch latency on
        tunneled links; 300 per-frame fetches cost ~15 s/scene in latency
        alone).

        With ``compact_readback`` the chunk's sparse planes are RLE-packed
        on-device and the program returns ``(buf, sparse, overflow)`` — the
        host fetches only ``buf`` and touches ``sparse`` solely on
        run-budget overflow (see ops/render.py rle_pack_chunk).  The plain
        path returns ``(packed, overflow)``.  ``overflow`` is the [C] bool
        per-frame binning entry-cap flag (ops/binning.py TileBins) — it
        rides the prefetched readback so dense frames over large scenes
        cannot silently truncate bottom-image tiles in written datasets."""
        background = self.background
        kwargs = self._rasterize_kwargs
        compact = self.compact_readback

        @jax.jit
        def fn(scene, cams, colors):
            def one(c):
                frame = render_frame(
                    scene, c, colors, background=background, **kwargs
                )
                enc = encode_frame(frame)
                return (
                    split_frame_planes(enc) if compact
                    else pack_frame_bytes(enc)
                ), frame.overflow

            out, ovf = jax.lax.map(one, cams)
            if compact:
                dense, sparse = out
                c, h, w = dense.shape[:3]
                buf, fallback = rle_pack_chunk(
                    dense, sparse, rle_max_runs(c, h, w, sparse.shape[-1])
                )
                return buf, fallback, ovf
            return out, ovf

        return fn

    @functools.cached_property
    def _chunk_program_dynamic(self):
        """Dynamic-mode chunk: per-frame body poses ride the map."""
        background = self.background
        kwargs = self._rasterize_kwargs
        compact = self.compact_readback

        @jax.jit
        def fn(template, cams, body_Rs, body_ts, colors):
            def one(args):
                c, R, t = args
                scene = pose_scene(template, R, t)
                frame = render_frame(
                    scene, c, colors, background=background, **kwargs
                )
                enc = encode_frame(frame)
                return (
                    split_frame_planes(enc) if compact
                    else pack_frame_bytes(enc)
                ), frame.overflow

            out, ovf = jax.lax.map(one, (cams, body_Rs, body_ts))
            if compact:
                dense, sparse = out
                c, h, w = dense.shape[:3]
                buf, fallback = rle_pack_chunk(
                    dense, sparse, rle_max_runs(c, h, w, sparse.shape[-1])
                )
                return buf, fallback, ovf
            return out, ovf

        return fn

    @functools.cached_property
    def _scene_program(self):
        """Jitted render + modality decode + pack on an already-POSED cloud.

        Posing is a separate program (`_pose_program`) memoized by
        `_posed_scene`: in static mode every frame of a scene shares one
        body pose, so re-posing per frame wastes 28.5 ms/frame at 210k
        splats on v5e (benchmarks/frame_stage_tpu.py) — 12 s per 300-frame
        scene.  Splitting also measures FASTER than the fused
        pose+render program even in dynamic mode (58.2 vs 69.7 ms/frame).

        The semantic palette is a RUNTIME argument, not a closure capture:
        ``init_start_position`` recomputes ``semantic_colors`` per scene
        (the reference re-derives colors per scene, pegasus.py:218-234), so
        baking it in at first trace would render every later scene with the
        first scene's K (collapsed mask channels, wrong palette, masks
        bit-unpacked with the wrong K).  jit retraces only when K — the
        palette's shape — changes.
        """
        background = self.background
        kwargs = self._rasterize_kwargs

        @jax.jit
        def fn(scene, cam, colors):
            frame = render_frame(scene, cam, colors, background=background, **kwargs)
            # encode + pack on-device: the frame loop is readback-bound,
            # not render-bound — one uint8 tensor = one host round trip
            return pack_frame_bytes(encode_frame(frame))

        return fn

    def _posed_scene(self, template, body_R, body_t):
        """pose_scene memoized on argument IDENTITY: static-mode loops pass
        the same pose arrays every frame, so the scene poses once per scene;
        dynamic mode builds fresh arrays per step and misses naturally.  The
        entry keeps strong references to its key objects so ids cannot be
        recycled while it lives."""
        key = (id(template), id(body_R), id(body_t))
        cached = getattr(self, "_posed_cache", None)
        if cached is not None and cached[0] == key:
            return cached[2]
        posed = self._pose_program(template, body_R, body_t)
        self._posed_cache = (key, (template, body_R, body_t), posed)
        return posed

    def _poses_np(self, body_R, body_t):
        """Host copies of the body poses, memoized like `_posed_scene` (the
        gt writer needs them every frame; one fetch per scene in static
        mode instead of one blocking round trip per frame)."""
        key = (id(body_R), id(body_t))
        cached = getattr(self, "_poses_np_cache", None)
        if cached is not None and cached[0] == key:
            return cached[2]
        out = (np.asarray(body_R), np.asarray(body_t))
        self._poses_np_cache = (key, (body_R, body_t), out)
        return out

    def _frame_fn(self, template, body_R, body_t, cam):
        return self._scene_program(
            self._posed_scene(template, body_R, body_t),
            cam,
            self._semantic_colors_dev,
        )

    def _serve_gui(self, body_R, body_t) -> None:
        """Answer one pending SIBR viewer request, non-blocking (the
        reference's per-frame network_gui loop, pegasus.py:249-279)."""
        import select
        import socket

        from pegasus_tpu import network_gui as ng

        if ng.listener is None:
            return
        if ng.conn is None:
            ng.try_connect()
            if ng.conn is None:
                return
        try:
            # only read when a request is already pending — a poll timeout
            # mid-message would desync the length-prefixed stream
            readable, _, _ = select.select([ng.conn], [], [], 0.0)
            if not readable:
                return
            ng.conn.settimeout(2.0)
            cam, _, _, _, _, scaling = ng.receive()
            ng.conn.settimeout(None)
            img_bytes = None
            if cam is not None:
                scene = self._posed_scene(self.template, body_R, body_t)
                frame = render_frame(
                    scene, cam, self._semantic_colors_dev,
                    background=self.background,
                    rasterize_fn=self._gui_rasterize_fn,
                )
                img = np.clip(np.asarray(frame.rgb), 0.0, 1.0)
                img_bytes = (img * 255).astype(np.uint8).tobytes()
            ng.send(img_bytes, self.dataset_path)
        except (socket.timeout, BlockingIOError):
            try:
                ng.conn.settimeout(None)
            except OSError:
                ng.conn = None
        except Exception:
            ng.conn = None

    @functools.cached_property
    def _gui_rasterize_fn(self):
        if self.rasterize_fn is not None:
            return self.rasterize_fn
        if jax.default_backend() != "cpu":
            from pegasus_tpu.ops.rasterize_pallas import rasterize_pallas

            return rasterize_pallas
        from pegasus_tpu.ops.rasterize_tiled import rasterize_tiled

        return rasterize_tiled

    def generate_dataset(
        self,
        data_points: List[str],
        save_bop: bool = True,
        save_video: bool = True,
    ) -> None:
        """Render the camera trajectory and write all requested modalities
        (reference: pegasus.py:247-390).

        Frames render in chunks of ``frame_chunk`` cameras: one jitted
        lax.map dispatch and ONE device->host fetch per chunk (the loop is
        readback-latency-bound on tunneled links — 300 per-frame fetches
        pay ~50 ms latency each).  Chunks are pipelined: while one chunk's
        bytes stream back on a reader thread, the next renders.  The SIBR
        GUI (publish2gui) is polled once per chunk."""
        import tqdm

        writer = self.pegasus_dataset
        n_frames = len(self.viewport_cam_list)
        n_objects = len(self.semantic_colors)
        chunk = max(1, min(self.frame_chunk, n_frames))
        n_chunks = -(-n_frames // chunk)

        from concurrent.futures import ThreadPoolExecutor

        readers = ThreadPoolExecutor(max_workers=4)
        DEPTH = 3  # chunks in flight: enough that a congestion spike on
        # one fetch (tunneled links jitter 3-300 ms per RPC) does not
        # stall the device between chunks

        # static mode: one pose per scene — the SAME arrays every dispatch,
        # so `_posed_scene` / `_poses_np` hit their identity caches and the
        # per-chunk device program is render+pack only
        static_poses = (
            None
            if self.mode == "dynamic"
            else self._body_poses_at(self._initial_step)
        )

        def _stack_cams(idxs):
            cams = [self.viewport_cam_list[i] for i in idxs]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

        def dispatch(ci):
            lo = ci * chunk
            idxs = list(range(lo, min(lo + chunk, n_frames)))
            # pad the tail chunk to the compiled size (extras discarded)
            padded = idxs + [idxs[-1]] * (chunk - len(idxs))
            cams = _stack_cams(padded)
            if static_poses is not None:
                body_R, body_t = static_poses
                posed = self._posed_scene(self.template, body_R, body_t)
                packed = self._chunk_program(
                    posed, cams, self._semantic_colors_dev
                )
                poses_fut = readers.submit(self._poses_np, body_R, body_t)
                per_frame_pose = False
            else:
                rt = [
                    self._body_poses_at(self._initial_step + i)
                    for i in padded
                ]
                body_Rs = jnp.stack([r for r, _ in rt])
                body_ts = jnp.stack([t for _, t in rt])
                packed = self._chunk_program_dynamic(
                    self.template, cams, body_Rs, body_ts,
                    self._semantic_colors_dev,
                )
                poses_fut = readers.submit(
                    lambda: (np.asarray(body_Rs), np.asarray(body_ts))
                )
                per_frame_pose = True
            if self.compact_readback:
                buf, sparse_dev, ovf_dev = packed
                # ship the RLE buffer; the raw sparse planes stay on
                # device as the overflow fallback
                fut = readers.submit(np.asarray, buf)
            else:
                sparse_dev = None
                buf, ovf_dev = packed
                fut = readers.submit(np.asarray, buf)
            # [C] bool binning entry-cap flags: a tiny fetch that rides
            # the same overlapped reader pool (one extra RPC per chunk,
            # hidden by the buf transfer it shares the pipeline with)
            ovf_fut = readers.submit(np.asarray, ovf_dev)
            return (fut, poses_fut, per_frame_pose, idxs, sparse_dev,
                    ovf_fut)

        # reference-quirk compat: dynamic scene_gt frozen at the initial
        # timestep (the render still follows the trajectory)
        frozen_gt = (
            tuple(np.asarray(a) for a in self._body_poses_at(self._initial_step))
            if (self.mode == "dynamic" and self.freeze_dynamic_gt_pose)
            else None
        )

        inflight = [dispatch(ci) for ci in range(min(DEPTH, n_chunks))]
        next_ci = len(inflight)
        progress = tqdm.tqdm(total=n_frames, disable=self.QUIET)
        # per-scene transfer accounting: bytes shipped device->host and
        # time BLOCKED on fetches (a lower bound on transfer cost — the
        # pipeline overlaps the rest with decode + PNG writes)
        readback_bytes = 0
        fetch_stall_s = 0.0
        overflow_frames = 0

        for _ in range(n_chunks):
            (fut, poses_fut, per_frame_pose, idxs, sparse_dev,
             ovf_fut) = inflight.pop(0)
            if next_ci < n_chunks:
                inflight.append(dispatch(next_ci))
                next_ci += 1
            t_wait = time.perf_counter()
            raw = fut.result()
            fetch_stall_s += time.perf_counter() - t_wait
            readback_bytes += raw.nbytes
            # per-frame entry-cap flags (padded tail frames excluded)
            overflow_frames += int(ovf_fut.result()[: len(idxs)].sum())
            if self.compact_readback:
                h, w = self.render_height, self.render_width
                p = 1 + (2 * n_objects + 7) // 8
                data = rle_unpack_chunk(
                    raw, (chunk, h, w), n_objects,
                    rle_max_runs(chunk, h, w, p),
                    palette=self.semantic_colors,
                    fallback_sparse=lambda sd=sparse_dev: np.asarray(sd),
                    with_depth_m=save_video,
                )
            else:
                data = unpack_frame_bytes(
                    raw, n_objects, palette=self.semantic_colors,
                    with_depth_m=save_video,
                )
            poses_np = poses_fut.result()
            if self.publish2gui:
                if per_frame_pose:
                    r, t = self._body_poses_at(
                        self._initial_step + idxs[-1]
                    )
                    self._serve_gui(r, t)
                else:
                    self._serve_gui(*static_poses)

            for j, i in enumerate(idxs):
                if per_frame_pose:
                    body_R_np = poses_np[0][j]
                    body_t_np = poses_np[1][j]
                else:
                    body_R_np, body_t_np = poses_np
                cam = self.viewport_cam_list[i]
                rgb_u8 = data["rgb_u8"][j]
                depth_mm = data["depth_mm"][j]
                mask_visib = data["mask_visib"][j]
                mask_amodal = data["mask_amodal"][j]
                sem_u8 = data["sem_u8"][j]

                writer.add_scene_camera(i)
                if save_bop:
                    writer.write_training_data(
                        frame_id=i,
                        rgb=rgb_u8 if "rgb" in data_points else None,
                        depth_mm=depth_mm if ("depth" in data_points or "rgb" in data_points) else None,
                        mask_amodal=mask_amodal if "seg_sil" in data_points else None,
                        mask_visib=mask_visib if "seg_vis" in data_points else None,
                        sem_mask=sem_u8 if "sem_seg" in data_points else None,
                    )
                    gt_R, gt_t = (
                        frozen_gt if frozen_gt is not None
                        else (body_R_np, body_t_np)
                    )
                    object_poses = [
                        {
                            "bullet_id": bid,
                            "obj_id": self.bullet_to_real_id.get(bid, bid),
                            "R_init": gt_R[bid],
                            "t_init": gt_t[bid],
                        }
                        for bid in self.bullet_ids
                    ]
                    writer.add_scene_gt(
                        frame_id=i,
                        cam_R_w2c=np.asarray(cam.R_w2c),
                        cam_t_w2c=np.asarray(cam.t_w2c),
                        object_poses=object_poses,
                    )

                if save_video:
                    # float planes only the video overlay consumes
                    depth = data["depth_m"][j]
                    seg_img = sem_u8.astype(np.float32) / 255.0
                    centers = np.stack(
                        [
                            np.asarray(self.template.pivots[bid]) + body_t_np[bid]
                            for bid in self.bullet_ids
                        ]
                    ) if self.bullet_ids else np.zeros((0, 3))
                    center_img = draw_object_centers(
                        rgb_u8,
                        centers,
                        np.asarray(writer.K),
                        np.asarray(cam.R_w2c),
                        np.asarray(cam.t_w2c),
                        self.semantic_colors,
                    )
                    self.video.write_frame(
                        rgb=rgb_u8, depth=depth, seg=seg_img,
                        center_image=center_img,
                    )
                progress.update(1)
        progress.close()
        readers.shutdown(wait=True)
        self.last_render_stats = {
            "readback_bytes": int(readback_bytes),
            "fetch_stall_s": round(fetch_stall_s, 3),
            "binning_overflow_frames": int(overflow_frames),
        }
        if overflow_frames:
            # written frames are missing far splats in bottom-image tiles;
            # the dataset is structurally valid but photometrically short.
            # Raise rasterize's entry_cap (or lower splat_budget) and
            # re-generate the scene — resumable via generate.py.
            logging.getLogger("pegasus_tpu").warning(
                "binning entry cap overflowed on %d/%d frames: rendered "
                "images silently dropped far splats in bottom-image tiles "
                "(raise entry_cap via rasterize kwargs, or reduce "
                "splat_budget)", overflow_frames, n_frames,
            )

    def save2bop(self) -> None:
        """Finalize scene annotations (reference: pegasus.py:392-396)."""
        self.video.close()
        self.pegasus_dataset.save_scene_annotations()
        self.pegasus_dataset.close()
        if not self.QUIET:
            print("Saved BOP data")
