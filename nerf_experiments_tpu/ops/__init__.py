from nerf_experiments_tpu.ops import (
    hashgrid,
    kabsch,
    lie,
    metrics,
    proposal,
    rays,
    render,
    sampling,
)
