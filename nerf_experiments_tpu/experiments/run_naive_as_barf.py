"""Naive-NeRF-architecture-as-BARF A/B experiment.

Parity with `barf/run_naive_as_barf.py`: the BARF calibration pipeline with
the "naive" architecture end of the interpolation (position re-injected at
every segment, direction fed everywhere, density from the color head).
"""
from nerf_experiments_tpu.experiments import run_barf


def main(argv=None):
    argv = list(argv or [])
    argv = [
        "--n_segments", "4",
        "--no-delayed_direction",
        "--delayed_density",
    ] + argv
    return run_barf.main(argv)


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
