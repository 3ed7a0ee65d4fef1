"""In-process pycolmap driver: orchestration, layout, stage cache.

The real pycolmap bindings are optional (SURVEY 2.2: SfM is
external/offline); these tests drive
reconstruction/pycolmap_driver.InProcessReconstruction through a stub
backend that records calls and materializes the artifacts each stage is
contractually expected to produce (reference:
colmap-wrapper/reconstruction/recunstruction.py:212-341).
"""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from pegasus_tpu.reconstruction.pycolmap_driver import (
    DSLR_CAMERA,
    UNKNOWN_CAMERA,
    InProcessReconstruction,
    PycolmapNotFoundError,
)


class _Opts:
    """Minimal stand-in for a pycolmap options object."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def todict(self):
        return dict(self.__dict__)


class _Map:
    def __init__(self, sparse_dir):
        self.sparse_dir = Path(sparse_dir)

    def write(self, path):
        (Path(path) / "points3D.bin").write_bytes(b"")


class StubPycolmap:
    """Records every pipeline call; writes the expected on-disk artifacts."""

    def __init__(self):
        self.calls = []

    # option factories -----------------------------------------------------
    def SiftExtractionOptions(self):
        return _Opts(max_image_size=3200)

    def SiftMatchingOptions(self):
        return _Opts(max_ratio=0.8)

    def ExhaustiveMatchingOptions(self):
        return _Opts(block_size=50)

    def SpatialMatchingOptions(self):
        return _Opts(max_num_neighbors=50, ignore_z=True)

    def IncrementalMapperOptions(self):
        return _Opts(min_num_matches=15)

    def PatchMatchOptions(self):
        return _Opts(window_radius=5, num_iterations=5, max_image_size=-1)

    def StereoFusionOptions(self):
        return _Opts(max_image_size=-1, num_threads=1)

    def CameraMode(self, mode):
        return mode

    def Camera(self, **kw):
        return _Opts(**kw)

    # pipeline stages ------------------------------------------------------
    def extract_features(self, database, images, camera_mode, sift_options):
        self.calls.append(("extract", str(images)))
        Path(database).write_bytes(b"db")

    def match_exhaustive(self, database_path, sift_options, matching_options):
        self.calls.append(("match_exhaustive", str(database_path)))

    def match_spatial(self, database_path, sift_options, matching_options):
        self.calls.append(("match_spatial", str(database_path)))

    def incremental_mapping(self, database_path, image_path, output_path, options):
        self.calls.append(("map", str(image_path)))
        return [_Map(output_path)]

    def undistort_images(self, mvs, sparse, images):
        self.calls.append(("undistort", str(mvs)))
        (Path(mvs) / "images").mkdir(parents=True, exist_ok=True)

    def patch_match_stereo(self, mvs, options):
        self.calls.append(("pms", str(mvs)))
        assert options.window_radius == 8 and options.num_iterations == 7

    def stereo_fusion(self, output_path, workspace_path, workspace_format,
                      input_type, options):
        self.calls.append(("fusion", str(output_path)))
        Path(output_path).write_bytes(b"ply")


def _write_images(folder: Path, n=3):
    folder.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        Image.fromarray(
            np.full((8, 8, 3), 40 * i, np.uint8)
        ).save(folder / f"img{i}.png")


def test_full_pipeline_and_stage_cache(tmp_path):
    imgs = tmp_path / "imgs"
    _write_images(imgs)
    stub = StubPycolmap()
    reco = InProcessReconstruction(
        images=imgs, output=tmp_path / "out", backend=stub
    )
    projects = reco.run()

    # single-project layout straight under output (no numeric subdir)
    assert set(projects) == {0}
    p = projects[0]
    assert p["database"].exists()
    assert (p["sparse"] / "points3D.bin").exists()
    assert (p["mvs"] / "fused.ply").exists()
    stages = [c[0] for c in stub.calls]
    assert stages == [
        "extract", "match_exhaustive", "map", "undistort", "pms", "fusion"
    ]

    # second run: every option-stamped stage is skipped (undistort keys on
    # the images dir existing)
    n = len(stub.calls)
    reco2 = InProcessReconstruction(
        images=imgs, output=tmp_path / "out", backend=stub
    )
    reco2.run()
    assert len(stub.calls) == n

    # a changed option invalidates exactly the affected stamp
    stamp = p["option"] / "patch_match_stereo_options.json"
    stamp.write_text("{}")
    reco2.patch_match_stereo()
    assert [c[0] for c in stub.calls[n:]] == ["pms"]


def test_multi_project_layout_and_spatial(tmp_path):
    root = tmp_path / "sessions"
    _write_images(root / "a")
    _write_images(root / "b")
    stub = StubPycolmap()
    reco = InProcessReconstruction(
        images=root, output=tmp_path / "out", matching="spatial",
        camera=DSLR_CAMERA, dense=False, backend=stub,
    )
    projects = reco.run()
    assert set(projects) == {0, 1}
    assert projects[0]["output"].name == "0"
    assert projects[1]["output"].name == "1"
    stages = [c[0] for c in stub.calls]
    assert stages.count("extract") == 2
    assert stages.count("match_spatial") == 2
    assert "undistort" not in stages  # dense=False stops after SfM


def test_missing_backend_raises(tmp_path, monkeypatch):
    _write_images(tmp_path / "imgs")
    import pegasus_tpu.reconstruction.pycolmap_driver as mod

    monkeypatch.setattr(mod, "_import_pycolmap", lambda: None)
    reco = InProcessReconstruction(
        images=tmp_path / "imgs", output=tmp_path / "out"
    )
    assert reco.backend is None
    with pytest.raises(PycolmapNotFoundError):
        reco.run()
    assert not mod.available()


def test_camera_presets():
    assert UNKNOWN_CAMERA.model == "SIMPLE_PINHOLE"
    assert DSLR_CAMERA.model == "OPENCV" and len(DSLR_CAMERA.params) == 8
    cam = DSLR_CAMERA.to_camera(StubPycolmap())
    assert cam.width == 6000 and cam.params[0] == pytest.approx(4518.9)
