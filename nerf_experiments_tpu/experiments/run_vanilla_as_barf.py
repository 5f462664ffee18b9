"""Vanilla-NeRF-architecture-as-BARF A/B experiment.

Parity with `barf/run_vanilla_as_barf.py`: the BARF calibration pipeline
with the vanilla NeRF architecture knobs (2 segments, delayed direction,
density from the trunk) — used to validate that architecture refactors
preserve behavior (SURVEY.md §4.2 "experiment-as-test" pattern).
"""
from nerf_experiments_tpu.experiments import run_barf


def main(argv=None):
    argv = list(argv or [])
    argv = ["--n_segments", "2", "--delayed_direction"] + argv
    return run_barf.main(argv)


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
