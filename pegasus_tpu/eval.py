"""BOP pose-error metrics and dataset self-checks (L10 glue).

The reference defers evaluation to the bop_toolkit submodule (SURVEY 2.5,
L10).  bop_toolkit remains usable on our output (the formats match); this
module provides the standard pose errors natively so generated datasets
can be validated without the external dependency:

  add / adi  — (average) distance of model points, indistinguishable
               variant for symmetric objects;
  mssd       — maximum symmetry-aware surface distance;
  mspd       — maximum symmetry-aware projection distance;
  re / te    — rotation (deg) / translation errors;
  check_bop_dataset — structural validation of a generated BOP tree.

(vsd needs a depth renderer; use render + our depth output or bop_toolkit.)
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def _transform(R, t, pts):
    return pts @ np.asarray(R).T + np.asarray(t).reshape(1, 3)


def add(R_est, t_est, R_gt, t_gt, pts) -> float:
    """Average distance of corresponding model points (ADD)."""
    return float(
        np.linalg.norm(
            _transform(R_est, t_est, pts) - _transform(R_gt, t_gt, pts), axis=1
        ).mean()
    )


def adi(R_est, t_est, R_gt, t_gt, pts) -> float:
    """ADD-S / ADI: nearest-point distance (symmetric objects)."""
    from scipy.spatial import cKDTree

    est = _transform(R_est, t_est, pts)
    gt = _transform(R_gt, t_gt, pts)
    return float(cKDTree(est).query(gt, k=1)[0].mean())


def mssd(R_est, t_est, R_gt, t_gt, pts, syms=None) -> float:
    """Maximum symmetry-aware surface distance (bop_toolkit pose_error)."""
    syms = syms or [{"R": np.eye(3), "t": np.zeros(3)}]
    best = np.inf
    est = _transform(R_est, t_est, pts)
    for s in syms:
        pts_s = _transform(s["R"], s["t"], pts)
        gt = _transform(R_gt, t_gt, pts_s)
        best = min(best, float(np.linalg.norm(est - gt, axis=1).max()))
    return best


def _project(K, R, t, pts):
    cam = _transform(R, t, pts)
    uv = cam @ np.asarray(K).T
    return uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)


def mspd(R_est, t_est, R_gt, t_gt, K, pts, syms=None) -> float:
    """Maximum symmetry-aware projection distance."""
    syms = syms or [{"R": np.eye(3), "t": np.zeros(3)}]
    best = np.inf
    est = _project(K, R_est, t_est, pts)
    for s in syms:
        pts_s = _transform(s["R"], s["t"], pts)
        gt = _project(K, R_gt, t_gt, pts_s)
        best = min(best, float(np.linalg.norm(est - gt, axis=1).max()))
    return best


def re(R_est, R_gt) -> float:
    """Rotation error in degrees."""
    cos = (np.trace(np.asarray(R_est) @ np.asarray(R_gt).T) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


def te(t_est, t_gt) -> float:
    return float(np.linalg.norm(np.asarray(t_est) - np.asarray(t_gt)))


# ---------------------------------------------------------------------------


def check_bop_dataset(dataset_root, dataset_name: str) -> dict:
    """Structural self-check of a generated BOP tree (the role
    bop_toolkit's check_results scripts play for results files).
    Returns a report dict; raises on hard violations."""
    root = Path(dataset_root) / dataset_name
    report = {"dataset": str(root), "scenes": {}, "errors": []}

    cam_path = root / "camera.json"
    if not cam_path.exists():
        report["errors"].append("missing camera.json")
    else:
        cam = json.loads(cam_path.read_text())
        for key in ("fx", "fy", "cx", "cy", "width", "height", "depth_scale"):
            if key not in cam:
                report["errors"].append(f"camera.json missing {key}")

    minfo_path = root / "models" / "models_info.json"
    model_ids = set()
    if minfo_path.exists():
        minfo = json.loads(minfo_path.read_text())
        for mid, entry in minfo.items():
            model_ids.add(int(mid))
            for key in ("diameter", "min_x", "size_x"):
                if key not in entry:
                    report["errors"].append(f"models_info[{mid}] missing {key}")
            if not (root / "models" / f"obj_{int(mid):06d}.ply").exists():
                report["errors"].append(f"missing obj_{int(mid):06d}.ply")
    else:
        report["errors"].append("missing models/models_info.json")

    train = root / "train"
    for scene_dir in sorted(train.iterdir()) if train.exists() else []:
        if not scene_dir.is_dir():
            continue
        srep = {"frames": 0, "missing": []}
        gt_path = scene_dir / "scene_gt.json"
        cam_path = scene_dir / "scene_camera.json"
        if not gt_path.exists() or not cam_path.exists():
            srep["missing"].append("scene_gt/scene_camera json")
            report["scenes"][scene_dir.name] = srep
            continue
        scene_gt = json.loads(gt_path.read_text())
        scene_cam = json.loads(cam_path.read_text())
        if set(scene_gt.keys()) != set(scene_cam.keys()):
            srep["missing"].append("frame-id mismatch gt vs camera")
        for fid, entries in scene_gt.items():
            srep["frames"] += 1
            f = int(fid)
            if not (scene_dir / "rgb" / f"{f:06d}.png").exists():
                srep["missing"].append(f"rgb/{f:06d}.png")
            for j, entry in enumerate(entries):
                R = np.asarray(entry["cam_R_m2c"]).reshape(3, 3)
                if abs(np.linalg.det(R) - 1.0) > 1e-2:
                    report["errors"].append(
                        f"{scene_dir.name}/{fid}[{j}] cam_R_m2c not a rotation"
                    )
                if model_ids and entry["obj_id"] not in model_ids:
                    report["errors"].append(
                        f"{scene_dir.name}/{fid}[{j}] unknown obj_id "
                        f"{entry['obj_id']}"
                    )
        report["scenes"][scene_dir.name] = srep

    report["ok"] = not report["errors"]
    return report
