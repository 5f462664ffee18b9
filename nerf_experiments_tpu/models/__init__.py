from nerf_experiments_tpu.models import common, nerf_mlp, garf, siren, nerf2d, ingp
