"""SARF entry point — `sarf/main.py` preset of the unified GARF-family
runner (damped-cosine activations, frequency LR factor 128, near-zero
camera LR, 40 epochs)."""
from nerf_experiments_tpu.experiments import garf_main


def main(argv=None):
    argv = ["--activation", "sarf"] + list(argv or [])
    return garf_main.main(argv)


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
