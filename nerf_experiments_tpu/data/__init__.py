from nerf_experiments_tpu.data import blender, sampler, synthetic
