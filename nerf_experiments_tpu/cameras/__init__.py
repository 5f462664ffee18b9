from nerf_experiments_tpu.cameras import extrinsics, calibration
