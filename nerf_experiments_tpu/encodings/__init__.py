from nerf_experiments_tpu.encodings import fourier, activations
