"""Worked example: the reference's __main__ scene loop on PEGASUS-TPU.

Mirrors reference pegasus.py:399-557 — wire environments + objects from
the rosters, run N scenes of physics + rendering, export BOP (+NDDS).
Point DATASET_PATH / PEGASET_PATH at the released archives
(README.md:218-253) or at a synthetic dataset from
pegasus_tpu.testing.build_synthetic_dataset.
"""

import os

from pegasus_tpu.assets.cup_noodle_dataset import *  # noqa: F401,F403
from pegasus_tpu.assets.dataset_envs import *  # noqa: F401,F403
from pegasus_tpu.assets.ycb_objects import *  # noqa: F401,F403
from pegasus_tpu.config import GenerationConfig
from pegasus_tpu.generate import run_generation

DATASET_PATH = os.environ.get("RAMEN_PATH", "./data/RamenDataset")
PEGASET_PATH = os.environ.get("PEGASET_PATH", "./data/PEGASET")
ENV_DATASET_PATH = DATASET_PATH

if __name__ == "__main__":
    env_list = [
        MannholeCover(ENV_DATASET_PATH),  # noqa: F405
        Cobblestone(ENV_DATASET_PATH),  # noqa: F405
        Asphalt(ENV_DATASET_PATH),  # noqa: F405
        Tiles(ENV_DATASET_PATH),  # noqa: F405
        Grass(ENV_DATASET_PATH),  # noqa: F405
        Wood(DATASET_PATH),  # noqa: F405
    ]
    obj_list = [
        Pen(PEGASET_PATH),  # noqa: F405
        Scissors(PEGASET_PATH),  # noqa: F405
        SmallClamp(PEGASET_PATH),  # noqa: F405
        LargeClamp(PEGASET_PATH),  # noqa: F405
    ]

    config = GenerationConfig(
        dataset_path=PEGASET_PATH,
        env_dataset_path=ENV_DATASET_PATH,
        urdf_asset_folder=[
            f"{DATASET_PATH}/urdf",
            f"{PEGASET_PATH}/urdf",
        ],
        dataset_name="pegasus_ycb_test",
        num_scenes=10,
        min_num_objects=3,
        max_num_objects=6,
        render_width=640,
        render_height=480,
        num_cameras=10,
        num_camera_interpolation_steps=30,
        simulation_steps=310,
        mode="dynamic",
        convert_scenewise_to_imagewise=True,
    )
    run_generation(config, env_list, obj_list)
