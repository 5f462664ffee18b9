from nerf_experiments_tpu.training import optim, schedules
