from pegasus_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pegasus_tpu.parallel.generation import run_generation_sharded
from pegasus_tpu.parallel.scene_batch import generate_scene_variants

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "run_generation_sharded",
    "generate_scene_variants",
]
