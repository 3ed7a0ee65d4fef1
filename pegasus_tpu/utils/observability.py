"""Tracing, structured per-scene metrics, and failure handling.

The reference has NO tracing, metrics, or failure recovery (SURVEY 5:
tqdm bars only; GUI exceptions swallowed; COLMAP failures exit hard;
unjoined writer threads).  This module provides the aux subsystems:

  * ``stage_timer`` — wall-clock stage timing with device sync;
  * ``SceneStats`` — structured per-scene throughput records (frames/s,
    splat counts) appended as JSON lines;
  * ``trace`` — jax.profiler wrapper for on-demand device traces;
  * ``retry_scene`` — per-scene retry with resumable scene index (the
    trajectory JSON on disk is the resume point, as in the reference's
    implicit per-scene restart granularity).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Optional


def _sync(x=None):
    import jax

    if x is not None:
        jax.block_until_ready(x)


@contextlib.contextmanager
def stage_timer(stats: Optional[dict] = None, name: str = "stage",
                verbose: bool = False):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if stats is not None:
        stats[name] = stats.get(name, 0.0) + dt
    if verbose:
        print(f"[pegasus-tpu] {name}: {dt * 1000:.1f} ms")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pegasus_tpu_trace"):
    """Capture a jax.profiler device trace around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class SceneStats:
    """Structured per-scene generation metrics (JSONL sink)."""

    path: Optional[str] = None
    records: list = field(default_factory=list)

    def record(self, scene_id: int, **metrics) -> dict:
        rec = {"scene_id": scene_id, "time": time.time(), **metrics}
        self.records.append(rec)
        if self.path:
            os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=float) + "\n")
        return rec

    def summary(self) -> dict:
        if not self.records:
            return {}
        fps = [r["frames_per_s"] for r in self.records if "frames_per_s" in r]
        return {
            "scenes": len(self.records),
            "mean_frames_per_s": sum(fps) / len(fps) if fps else None,
        }


def retry_scene(
    fn: Callable[[int], None],
    scene_id: int,
    max_retries: int = 2,
    on_failure: Optional[Callable] = None,
) -> bool:
    """Run one scene's generation with bounded retries (SURVEY 5 failure-
    detection gap: the reference exits hard on any error).  Returns True on
    success."""
    for attempt in range(max_retries + 1):
        try:
            fn(scene_id)
            return True
        except Exception as e:  # noqa: BLE001 — deliberate catch-all boundary
            print(
                f"[pegasus-tpu] scene {scene_id} attempt {attempt + 1} "
                f"failed: {type(e).__name__}: {e}"
            )
            if on_failure:
                on_failure(scene_id, attempt, e)
    return False


def completed_scene_ids(dataset_path, dataset_name: str) -> set:
    """Scenes with finalized annotations — the resume point
    (scene_gt.json is written last, so its presence marks completion)."""
    train = Path(dataset_path) / dataset_name / "train"
    done = set()
    if train.exists():
        for scene_dir in train.iterdir():
            if (scene_dir / "scene_gt.json").exists():
                try:
                    done.add(int(scene_dir.name))
                except ValueError:
                    pass
    return done


# -- numerics debugging (SURVEY 5: the reference exposes only torch's
# -- detect_anomaly flag, default off; gs_training.py:18,45) ------------------


def enable_nan_debugging() -> None:
    """Global NaN tripwire: any NaN produced under jit raises with the
    offending primitive (jax's debug_nans; also honored when the
    ``PEGASUS_TPU_DEBUG_NANS`` env var is set at import time)."""
    import jax

    jax.config.update("jax_debug_nans", True)


def checked(fn, *, errors=None):
    """Wrap a jittable function with checkify so NaN/OOB/div errors are
    CARRIED as values instead of silently propagating — usable inside
    jit/scan where debug_nans cannot run.

        checked_fn = checked(render_frame)
        err, out = checked_fn(scene, cam, colors)
        err.throw()  # raises with location if anything tripped
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks
    return checkify.checkify(fn, errors=errors)


def assert_finite(tree, name: str = "value") -> None:
    """Host-side finiteness audit of a pytree (use at stage boundaries:
    after physics, after render, before writes)."""
    import numpy as np

    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite values"
            )


if os.environ.get("PEGASUS_TPU_DEBUG_NANS"):
    enable_nan_debugging()
