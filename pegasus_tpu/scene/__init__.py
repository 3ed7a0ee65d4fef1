from pegasus_tpu.scene.composition import SceneTemplate, pose_scene
from pegasus_tpu.scene.trajectory import Trajectory
