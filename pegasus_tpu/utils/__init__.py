from pegasus_tpu.utils import quaternion, pose, sh, colors
