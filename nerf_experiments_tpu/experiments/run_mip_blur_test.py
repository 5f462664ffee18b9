"""Mip blur-schedule test: IPE + image-blur schedule without pose noise.

Parity with `barf/run_mip_blur_test.py`: the Mip-BARF pipeline with zero
camera noise and a start blur sigma of 15 — isolates the effect of the
coupled blur/IPE sigma schedule on reconstruction quality.
"""
from nerf_experiments_tpu.experiments import run_bip_barf


def main(argv=None):
    argv = [
        "--camera_origin_noise_sigma", "0.0",
        "--camera_rotation_noise_sigma", "0.0",
        "--start_blur_sigma", "15.0",
        "--start_pixel_width_sigma", "15.0",
        "--max_blur_sigma", "15.0",
    ] + list(argv or [])
    return run_bip_barf.main(argv)


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
