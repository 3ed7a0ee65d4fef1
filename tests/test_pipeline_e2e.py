"""End-to-end slice: synthetic assets -> physics -> render -> BOP on disk.

Covers BASELINE.json eval config #1/#2 shape on CPU: objects dropped onto
an environment, camera trajectory rendered at small resolution, full BOP
tree written and schema-checked (the reference main loop,
pegasus.py:494-533).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from pegasus_tpu.assets.registry import Asset
from pegasus_tpu.pegasus import PEGASUS
from pegasus_tpu.testing import build_synthetic_dataset


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataset")
    build_synthetic_dataset(root)
    return root


def _assets(root):
    env = Asset(
        OBJECT_NAME="asphalt", ID=1003, TYPE="environment",
        dataset_path=str(root), DROP_REGION=(0.1, 0.1), DROP_HEIGHT=(0.2, 0.3),
    )
    objs = [
        Asset(OBJECT_NAME="cup_noodles_04", ID=104, dataset_path=str(root)),
        Asset(OBJECT_NAME="cup_noodles_07", ID=107, dataset_path=str(root)),
    ]
    return env, objs


@pytest.mark.parametrize("mode", ["static", "dynamic"])
def test_full_pipeline(synthetic_root, tmp_path, mode):
    env, objs = _assets(synthetic_root)
    out = tmp_path / "out"

    pegasus = PEGASUS(
        dataset_path=str(synthetic_root),
        env_dataset_path=str(synthetic_root),
        urdf_asset_folder=str(synthetic_root / "urdf"),
        gs_env_list=[env],
        gs_object_list=objs,
        render_height=60,
        render_width=80,
        num_cameras=1,
        simulation_steps=60,
        num_camera_interpolation_steps=3,
        mode=mode,
        camera_trajectory_mode="sequence",
        dataset_base_path=str(out),
        seed=3,
    )

    dataset_name = f"pegasus_test_{mode}"
    scene_id = 1
    pegasus.init_bullet(
        env_list=[env], obj_list=objs, dataset_name=dataset_name,
        scene_id=scene_id, min_num_objects=2, max_num_objects=2, random=False,
    )
    pegasus.init(dataset_name=dataset_name, scene_id=scene_id)
    pegasus.init_start_position()
    pegasus.generate_dataset(
        data_points=["rgb", "depth", "seg_vis", "seg_sil", "sem_seg"],
        save_bop=True,
        save_video=True,
    )
    pegasus.save2bop()

    scene = out / dataset_name / "train" / f"{scene_id:06d}"
    # BOP tree (reference layout: pegasus_bop.py:312-346)
    assert (out / dataset_name / "camera.json").exists()
    assert (out / dataset_name / "models" / "models_info.json").exists()
    assert (out / dataset_name / "models" / "obj_000104.ply").exists()
    for sub in ("rgb", "depth", "mask", "mask_visib", "sem_mask"):
        assert (scene / sub).is_dir()

    n_frames = 3
    for i in range(n_frames):
        assert (scene / "rgb" / f"{i:06d}.png").exists()
        assert (scene / "depth" / f"{i:06d}.png").exists()
        assert (scene / "mask" / f"{i:06d}_000000.png").exists()
        assert (scene / "mask_visib" / f"{i:06d}_000001.png").exists()

    # depth is uint16 PNG in millimeters
    import imageio.v2 as imageio

    depth = imageio.imread(scene / "depth" / "000000.png")
    assert depth.dtype == np.uint16
    assert 200 < depth[depth > 0].mean() < 5000  # plausible mm range

    # rgb actually shows content (plane + objects, not empty)
    rgb = imageio.imread(scene / "rgb" / "000000.png")
    assert rgb.mean() > 10

    # per-frame binning entry-cap flags surfaced through the chunked
    # readback: a small scene must report zero overflowed frames
    assert pegasus.last_render_stats["binning_overflow_frames"] == 0

    # scene_camera/gt jsons
    with open(scene / "scene_camera.json") as f:
        scene_cam = json.load(f)
    assert len(scene_cam) == n_frames
    K = np.asarray(scene_cam["0"]["cam_K"]).reshape(3, 3)
    assert K[0, 0] > 0 and K[2, 2] == 1

    with open(scene / "scene_gt.json") as f:
        scene_gt = json.load(f)
    assert len(scene_gt) == n_frames
    entry = scene_gt["0"][0]
    for key in ("cam_R_m2c", "cam_t_m2c", "obj_id", "bullet_obj_id"):
        assert key in entry
    R = np.asarray(entry["cam_R_m2c"]).reshape(3, 3)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert entry["obj_id"] in (104, 107)
    assert "projected_points" in entry

    # models_info in millimeters with diameter
    with open(out / dataset_name / "models" / "models_info.json") as f:
        minfo = json.load(f)
    assert "104" in minfo
    # box half extents (0.04,0.04,0.06) -> diameter = |(80,80,120)| mm
    want_d = np.linalg.norm([80, 80, 120])
    np.testing.assert_allclose(minfo["104"]["diameter"], want_d, rtol=1e-3)

    # physics trajectory JSON written with the reference schema
    engine_json = out / dataset_name / "engine" / f"{scene_id:06d}_simulation_steps.json"
    assert engine_json.exists()
    raw = json.loads(engine_json.read_text())
    assert "asset_infos" in raw and "trajectory" in raw

    # videos exist
    vids = list((out / dataset_name / "video" / f"{scene_id:06d}").glob("*.mp4"))
    assert len(vids) == 5


def test_gt_info_and_ndds_conversion(synthetic_root, tmp_path):
    from pegasus_tpu.io.bop_writer import (
        calculate_gt_info,
        convert_scenewise_to_imagewise_ndds,
    )

    env, objs = _assets(synthetic_root)
    out = tmp_path / "out"
    pegasus = PEGASUS(
        dataset_path=str(synthetic_root),
        env_dataset_path=str(synthetic_root),
        urdf_asset_folder=str(synthetic_root / "urdf"),
        gs_env_list=[env],
        gs_object_list=objs,
        render_height=48,
        render_width=64,
        num_cameras=1,
        simulation_steps=40,
        num_camera_interpolation_steps=2,
        mode="static",
        camera_trajectory_mode="sequence",
        dataset_base_path=str(out),
        seed=5,
    )
    name = "gtinfo_test"
    pegasus.init_bullet([env], objs, name, 1, 2, 2, random=False)
    pegasus.init(name, 1)
    pegasus.init_start_position()
    pegasus.generate_dataset(["rgb", "depth", "seg_vis", "seg_sil", "sem_seg"])
    pegasus.save2bop()

    calculate_gt_info(out, name, [1])
    info_path = out / name / "train" / "000001" / "scene_gt_info.json"
    assert info_path.exists()
    info = json.loads(info_path.read_text())
    rec = info["0"][0]
    for key in ("bbox_obj", "bbox_visib", "px_count_all", "px_count_visib",
                "visib_fract"):
        assert key in rec
    assert 0.0 <= rec["visib_fract"] <= 1.0

    ndds_out = tmp_path / "ndds"
    convert_scenewise_to_imagewise_ndds(
        str(out / name / "train"), str(ndds_out), "1"
    )
    assert (ndds_out / "000000.png").exists()
    assert (ndds_out / "000000.json").exists()
    assert (ndds_out / "_camera_settings.json").exists()
    meta = json.loads((ndds_out / "000000.json").read_text())
    assert "objects" in meta and len(meta["objects"]) == 2


def test_dynamic_gt_tracks_motion(synthetic_root, tmp_path):
    """Dynamic-mode scene_gt must record per-frame poses (the reference
    freezes the t=0 pose for every dynamic frame — deliberate fix,
    see pegasus_tpu/pegasus.py docstring)."""
    env, objs = _assets(synthetic_root)
    out = tmp_path / "out"
    pegasus = PEGASUS(
        dataset_path=str(synthetic_root),
        env_dataset_path=str(synthetic_root),
        urdf_asset_folder=str(synthetic_root / "urdf"),
        gs_env_list=[env],
        gs_object_list=objs,
        render_height=40,
        render_width=48,
        num_cameras=1,
        simulation_steps=80,
        num_camera_interpolation_steps=4,
        mode="dynamic",
        camera_trajectory_mode="sequence",
        dataset_base_path=str(out),
        seed=9,
    )
    name = "dyn_gt"
    pegasus.init_bullet([env], objs, name, 1, 1, 1, random=False)
    pegasus.init(name, 1)
    pegasus.init_start_position()
    pegasus.generate_dataset(["rgb", "depth"], save_bop=True, save_video=False)
    pegasus.save2bop()

    with open(out / name / "train" / "000001" / "scene_gt.json") as f:
        gt = json.load(f)
    t0 = np.asarray(gt["0"][0]["T_m2w"]).reshape(4, 4)[:3, 3]
    t3 = np.asarray(gt["3"][0]["T_m2w"]).reshape(4, 4)[:3, 3]
    # object is falling during the first timesteps -> pose must change
    assert np.linalg.norm(t3 - t0) > 1e-4


def test_dynamic_gt_freeze_compat(synthetic_root, tmp_path):
    """freeze_dynamic_gt_pose=True reproduces the reference quirk: every
    dynamic frame's scene_gt carries the t=0 pose (pegasus.py:360-365
    always writes the R_init/t_init set at pegasus_setup.py:160-176)."""
    env, objs = _assets(synthetic_root)
    out = tmp_path / "out"
    pegasus = PEGASUS(
        dataset_path=str(synthetic_root),
        env_dataset_path=str(synthetic_root),
        urdf_asset_folder=str(synthetic_root / "urdf"),
        gs_env_list=[env],
        gs_object_list=objs,
        render_height=40,
        render_width=48,
        num_cameras=1,
        simulation_steps=80,
        num_camera_interpolation_steps=4,
        mode="dynamic",
        camera_trajectory_mode="sequence",
        dataset_base_path=str(out),
        seed=9,
        freeze_dynamic_gt_pose=True,
    )
    name = "dyn_gt_frozen"
    pegasus.init_bullet([env], objs, name, 1, 1, 1, random=False)
    pegasus.init(name, 1)
    pegasus.init_start_position()
    pegasus.generate_dataset(["rgb", "depth"], save_bop=True, save_video=False)
    pegasus.save2bop()

    with open(out / name / "train" / "000001" / "scene_gt.json") as f:
        gt = json.load(f)
    t0 = np.asarray(gt["0"][0]["T_m2w"]).reshape(4, 4)
    t3 = np.asarray(gt["3"][0]["T_m2w"]).reshape(4, 4)
    np.testing.assert_allclose(t3, t0, atol=1e-12)


def test_splat_budget_static_shapes(synthetic_root, tmp_path):
    """splat_budget pads every scene to one static cloud size, so varying
    object subsets reuse ONE compiled render program."""
    env, objs = _assets(synthetic_root)
    out = tmp_path / "out"
    pegasus = PEGASUS(
        dataset_path=str(synthetic_root),
        env_dataset_path=str(synthetic_root),
        urdf_asset_folder=str(synthetic_root / "urdf"),
        gs_env_list=[env],
        gs_object_list=objs,
        render_height=40,
        render_width=48,
        num_cameras=1,
        simulation_steps=30,
        num_camera_interpolation_steps=2,
        mode="static",
        camera_trajectory_mode="sequence",
        dataset_base_path=str(out),
        seed=1,
        splat_budget=6000,
    )
    name = "budget_test"
    for scene_id, n_obj in ((1, 1), (2, 2)):
        pegasus.init_bullet([env], objs, name, scene_id, n_obj, n_obj)
        pegasus.init(name, scene_id)
        pegasus.init_start_position()
        assert pegasus.template.cloud.num_splats == 6000
        assert len(pegasus.semantic_colors) == n_obj
        pegasus.generate_dataset(
            ["rgb", "depth", "seg_vis", "seg_sil", "sem_seg"],
            save_bop=True, save_video=False,
        )
        pegasus.save2bop()

    import imageio.v2 as imageio

    # Scene 2 has MORE objects than scene 1: the render program must be
    # re-specialized per scene (the palette is a runtime argument of the
    # jitted frame fn).  A stale K=1 program would collapse object 2 into
    # object 1's mask channel and bit-unpack masks with the wrong K.
    for scene_id, n_obj in ((1, 1), (2, 2)):
        scene = out / name / "train" / f"{scene_id:06d}"
        assert (scene / "rgb" / "000000.png").exists()
        # exactly n_obj mask channels per frame, each with visible pixels
        masks = sorted((scene / "mask").glob("000000_*.png"))
        assert len(masks) == n_obj
        for p in masks:
            m = np.asarray(imageio.imread(p)) > 127
            assert m.sum() > 0, f"empty amodal mask {p}"
        vis = sorted((scene / "mask_visib").glob("000000_*.png"))
        assert len(vis) == n_obj
        total_vis = 0
        for p in vis:
            m = np.asarray(imageio.imread(p)) > 127
            total_vis += int(m.sum())
        assert total_vis > 0
        # semantic palette must be the per-scene n_obj palette: every
        # non-black sem pixel is close to one of generate_colors(n_obj)
        from pegasus_tpu.utils.colors import generate_colors

        sem = np.asarray(imageio.imread(scene / "sem_mask" / "000000.png"))
        sem_f = sem.astype(np.float32) / 255.0
        fg = sem_f.reshape(-1, 3)
        fg = fg[fg.sum(axis=1) > 0.5]
        assert len(fg) > 0
        palette = generate_colors(n_obj, mode="rgb")
        d = np.linalg.norm(fg[:, None, :] - palette[None], axis=-1)
        # fully-covering pixels sit exactly on a palette color; allow
        # blended boundary pixels by checking the median distance
        assert np.median(d.min(axis=1)) < 0.15
