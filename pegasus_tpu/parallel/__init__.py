from pegasus_tpu.parallel.mesh import make_mesh, shard_batch
