from nerf_experiments_tpu.parallel import mesh, shard
