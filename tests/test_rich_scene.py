"""Rich scenes beyond the default physics capacity (eval config 4 shape).

The reference wires 3-6 objects; BASELINE eval config 4 asks for dozens.
The engine's body capacity must auto-size from max_num_objects so a
12-object drop simulates, renders and annotates correctly end to end.
"""

import json

import numpy as np
import pytest

from pegasus_tpu.assets.registry import Asset
from pegasus_tpu.pegasus import PEGASUS
from pegasus_tpu.testing import build_synthetic_dataset

N_OBJ = 12


@pytest.fixture(scope="module")
def rich_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("rich")
    names = tuple(f"cup_noodles_{i:02d}" for i in range(1, N_OBJ + 1))
    build_synthetic_dataset(root, object_names=names, obj_splats=256,
                            env_splats=1024)
    return root, names


def test_twelve_object_scene(rich_root, tmp_path):
    root, names = rich_root
    env = Asset(
        OBJECT_NAME="asphalt", ID=1003, TYPE="environment",
        dataset_path=str(root), DROP_REGION=(0.25, 0.25),
        DROP_HEIGHT=(0.2, 0.4),
    )
    objs = [
        Asset(OBJECT_NAME=n, ID=100 + i + 1, dataset_path=str(root))
        for i, n in enumerate(names)
    ]
    out = tmp_path / "out"
    pegasus = PEGASUS(
        dataset_path=str(root), env_dataset_path=str(root),
        urdf_asset_folder=str(root / "urdf"),
        gs_env_list=[env], gs_object_list=objs,
        render_height=60, render_width=80, num_cameras=1,
        simulation_steps=120, num_camera_interpolation_steps=2,
        mode="static", camera_trajectory_mode="sequence",
        dataset_base_path=str(out), seed=3,
    )
    name = "rich"
    pegasus.init_bullet([env], objs, name, 1, N_OBJ, N_OBJ, random=False)
    assert len(pegasus.py_engine._bodies) == N_OBJ + 1
    pegasus.init(name, 1)
    pegasus.init_start_position()
    assert len(pegasus.semantic_colors) == N_OBJ
    pegasus.generate_dataset(["rgb", "depth", "seg_vis", "seg_sil"],
                             save_bop=True, save_video=False)
    pegasus.save2bop()

    scene = out / name / "train" / "000001"
    gt = json.loads((scene / "scene_gt.json").read_text())
    assert len(gt["0"]) == N_OBJ
    masks = sorted((scene / "mask_visib").glob("000000_*.png"))
    assert len(masks) == N_OBJ

    # all objects ended at plausible rest heights (on/above the ground,
    # no tunneling, none launched)
    for e in gt["0"]:
        t = np.asarray(e["T_m2w"]).reshape(4, 4)[:3, 3]
        assert -0.02 < t[2] < 0.6, t
