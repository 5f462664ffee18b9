from nerf_experiments_tpu.systems import barf, garf_system
