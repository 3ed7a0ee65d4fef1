from pegasus_tpu.gs.cloud import GaussianCloud
from pegasus_tpu.gs.ply import load_gs_ply, save_gs_ply
