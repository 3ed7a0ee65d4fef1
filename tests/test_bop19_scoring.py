"""Native BOP19 scorer end-to-end: generate -> results CSV -> AR.

The reference scores generated datasets by shelling into bop_toolkit's
eval_bop19_pose.py; pegasus_tpu.eval.score_bop19 reproduces that flow
natively (vsd over the z-buffer mesh renderer + mssd + mspd with the
published thresholds).  Perfect estimates must score AR = 1.0 and
perturbed ones strictly lower.
"""

import json

import numpy as np
import pytest

from pegasus_tpu.assets.registry import Asset
from pegasus_tpu.eval import score_bop19
from pegasus_tpu.pegasus import PEGASUS
from pegasus_tpu.testing import build_synthetic_dataset


@pytest.fixture(scope="module")
def scored_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataset")
    build_synthetic_dataset(root)
    out = tmp_path_factory.mktemp("out")
    env = Asset(
        OBJECT_NAME="asphalt", ID=1003, TYPE="environment",
        dataset_path=str(root), DROP_REGION=(0.05, 0.05),
        DROP_HEIGHT=(0.2, 0.25),
    )
    objs = [
        Asset(OBJECT_NAME="cup_noodles_04", ID=104, dataset_path=str(root)),
        Asset(OBJECT_NAME="cup_noodles_07", ID=107, dataset_path=str(root)),
    ]
    pegasus = PEGASUS(
        dataset_path=str(root), env_dataset_path=str(root),
        urdf_asset_folder=str(root / "urdf"),
        gs_env_list=[env], gs_object_list=objs,
        render_height=48, render_width=64, num_cameras=1,
        simulation_steps=40, num_camera_interpolation_steps=2,
        mode="static", camera_trajectory_mode="sequence",
        dataset_base_path=str(out), seed=5,
    )
    name = "score_me"
    pegasus.init_bullet([env], objs, name, 1, 2, 2, random=False)
    pegasus.init(name, 1)
    pegasus.init_start_position()
    pegasus.generate_dataset(["rgb", "depth", "seg_vis", "seg_sil"],
                             save_bop=True, save_video=False)
    pegasus.save2bop()
    # gt-info, like the real pipeline (reference: pegasus.py:536) — the
    # scorer's visib_fract filter needs it to skip fully occluded GTs
    from pegasus_tpu.io.bop_writer import calculate_gt_info

    calculate_gt_info(out, name, [1])
    return out, name


def _results_csv(out, name, path, R_noise=None, t_noise=(0, 0, 0)):
    scene = out / name / "train" / "000001"
    gt = json.loads((scene / "scene_gt.json").read_text())
    lines = ["scene_id,im_id,obj_id,score,R,t,time"]
    for fid, entries in gt.items():
        for e in entries:
            R = np.asarray(e["cam_R_m2c"]).reshape(3, 3)
            t = np.asarray(e["cam_t_m2c"])
            if R_noise is not None:
                R = R_noise @ R
            t = t + np.asarray(t_noise)
            lines.append(
                f"1,{fid},{e['obj_id']},1.0,"
                + " ".join(f"{v:.8f}" for v in R.flatten())
                + ","
                + " ".join(f"{v:.6f}" for v in t)
                + ",0.1"
            )
    path.write_text("\n".join(lines))
    return path


def test_perfect_estimates_score_one(scored_dataset, tmp_path):
    out, name = scored_dataset
    csv = _results_csv(out, name, tmp_path / "perfect.csv")
    scores = score_bop19(csv, out, name)
    # 2 frames x 2 objects, but cup_noodles_04 is near-subpixel at 64x48
    # (2 visible px in frame 0, fully occluded in frame 1) so the BOP
    # visib_fract >= 0.1 filter keeps only the 2 cup_noodles_07 GTs
    assert scores["n_gt"] == 2
    assert scores["AR_mssd"] == 1.0
    assert scores["AR_mspd"] == 1.0
    assert scores["AR_vsd"] > 0.95  # vsd==0 for identical poses
    assert scores["AR"] > 0.98


def test_bad_estimates_score_lower(scored_dataset, tmp_path):
    out, name = scored_dataset
    ang = np.deg2rad(35.0)
    Rz = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1.0]]
    )
    csv = _results_csv(
        out, name, tmp_path / "bad.csv", R_noise=Rz, t_noise=(60.0, -40.0, 80.0)
    )
    scores = score_bop19(csv, out, name)
    good = score_bop19(_results_csv(out, name, tmp_path / "p.csv"), out, name)
    assert scores["AR"] < good["AR"]
    assert scores["AR_mssd"] < 1.0
    assert 0.0 <= scores["AR"] <= 1.0


def test_items_and_splatdepth_rescore(scored_dataset, tmp_path):
    """return_items exposes the per-GT recall distribution; scoring vsd
    against the dataset's own splat depth (vsd_est_depth='dataset')
    removes the mesh-vs-splat representation gap, so GT-as-estimates
    must recover AR_vsd == 1.0 exactly unless the writer's depth and
    mask_visib disagree (VERDICT r4 item 3)."""
    out, name = scored_dataset
    csv = _results_csv(out, name, tmp_path / "perfect.csv")
    scores = score_bop19(csv, out, name, return_items=True)
    items = scores["items"]
    assert len(items) == scores["n_gt"] == 2
    for it in items:
        assert it["recall_mssd"] == 1.0
        assert it["recall_mspd"] == 1.0
        assert 0.0 <= it["recall_vsd"] <= 1.0
    # average of per-item recalls must reproduce the aggregate
    rv = np.mean([it["recall_vsd"] for it in items])
    assert abs(rv - scores["AR_vsd"]) < 1e-12

    splat = score_bop19(csv, out, name, vsd_est_depth="dataset")
    assert splat["AR_vsd"] == 1.0
    assert splat["AR_mssd"] == 1.0


def test_missing_estimates_penalized(scored_dataset, tmp_path):
    out, name = scored_dataset
    csv = tmp_path / "empty.csv"
    csv.write_text("scene_id,im_id,obj_id,score,R,t,time\n")
    scores = score_bop19(csv, out, name)
    assert scores["AR"] == 0.0
