"""Batch generation driver: multi-scene run with resume + stats + NDDS."""

import json
from pathlib import Path

import numpy as np
import pytest

from pegasus_tpu.assets.registry import Asset
from pegasus_tpu.config import GenerationConfig
from pegasus_tpu.generate import run_generation, write_targets_bop19
from pegasus_tpu.testing import build_synthetic_dataset


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen_dataset")
    build_synthetic_dataset(root)
    return root


def test_run_generation_multi_scene(synthetic_root, tmp_path):
    env = Asset(
        OBJECT_NAME="asphalt", ID=1003, TYPE="environment",
        dataset_path=str(synthetic_root), DROP_REGION=(0.1, 0.1),
        DROP_HEIGHT=(0.2, 0.3),
    )
    objs = [
        Asset(OBJECT_NAME="cup_noodles_04", ID=104, dataset_path=str(synthetic_root)),
        Asset(OBJECT_NAME="cup_noodles_07", ID=107, dataset_path=str(synthetic_root)),
    ]
    out = tmp_path / "out"
    config = GenerationConfig(
        dataset_path=str(synthetic_root),
        urdf_asset_folder=str(synthetic_root / "urdf"),
        dataset_base_path=str(out),
        dataset_name="batch_test",
        num_scenes=2,
        min_num_objects=1,
        max_num_objects=2,
        render_width=64,
        render_height=48,
        num_cameras=1,
        num_camera_interpolation_steps=2,
        simulation_steps=40,
        camera_trajectory_mode="sequence",
        save_video=False,
        seed=7,
    )
    stats = run_generation(config, [env], objs)
    assert len(stats.records) == 2
    assert stats.summary()["mean_frames_per_s"] > 0
    # per-scene transfer accounting from the render loop: every scene
    # shipped its packed frames device->host and recorded the stall
    for rec in stats.records:
        assert rec["readback_bytes"] > 0
        assert rec["fetch_stall_s"] >= 0

    ds = out / "batch_test"
    for sid in (1, 2):
        assert (ds / "train" / f"{sid:06d}" / "scene_gt.json").exists()
        assert (ds / "train" / f"{sid:06d}" / "scene_gt_info.json").exists()
    assert (ds / "generation_config.json").exists()
    assert (ds / "generation_stats.jsonl").exists()
    assert (ds / "train_ndds").exists()

    # resume: second run skips completed scenes
    stats2 = run_generation(config, [env], objs)
    assert len(stats2.records) == 0

    # BOP19 targets
    write_targets_bop19(out, "batch_test")
    targets = json.loads((ds / "test_targets_bop19.json").read_text())
    assert targets and {"im_id", "obj_id", "scene_id", "inst_count"} <= set(
        targets[0]
    )

    # structural validation passes
    from pegasus_tpu.eval import check_bop_dataset

    report = check_bop_dataset(out, "batch_test")
    assert report["ok"], report["errors"]


def test_compact_readback_bitwise_identical(synthetic_root, tmp_path):
    """compact_readback=True (device-side RLE of the sparse planes) writes
    a byte-identical BOP tree to the plain path — it is a transfer
    encoding, not a new modality path."""
    env = Asset(
        OBJECT_NAME="asphalt", ID=1003, TYPE="environment",
        dataset_path=str(synthetic_root), DROP_REGION=(0.1, 0.1),
        DROP_HEIGHT=(0.2, 0.3),
    )
    objs = [
        Asset(OBJECT_NAME="cup_noodles_04", ID=104, dataset_path=str(synthetic_root)),
        Asset(OBJECT_NAME="cup_noodles_07", ID=107, dataset_path=str(synthetic_root)),
    ]

    def gen(name, compact):
        config = GenerationConfig(
            dataset_path=str(synthetic_root),
            urdf_asset_folder=str(synthetic_root / "urdf"),
            dataset_base_path=str(tmp_path / name),
            dataset_name=name,
            num_scenes=1,
            min_num_objects=2,
            max_num_objects=2,
            render_width=64,
            render_height=48,
            num_cameras=2,
            num_camera_interpolation_steps=2,
            simulation_steps=40,
            camera_trajectory_mode="sequence",
            save_video=False,
            seed=11,
            frame_chunk=3,  # 4 frames in chunks of 3: exercises tail pad
            compact_readback=compact,
        )
        run_generation(config, [env], objs)
        return tmp_path / name / name

    plain = gen("plain", False)
    compact = gen("compact", True)

    plain_files = sorted(
        p.relative_to(plain) for p in plain.rglob("*") if p.is_file()
    )
    compact_files = sorted(
        p.relative_to(compact) for p in compact.rglob("*") if p.is_file()
    )
    assert plain_files == compact_files
    checked = 0
    for rel in plain_files:
        if rel.suffix in (".png", ".json"):
            a = (plain / rel).read_bytes()
            b = (compact / rel).read_bytes()
            if rel.name == "generation_config.json":
                continue  # differs by the flag itself
            assert a == b, f"mismatch in {rel}"
            checked += 1
    assert checked > 10  # rgb/depth/masks/sem + gt jsons actually compared
