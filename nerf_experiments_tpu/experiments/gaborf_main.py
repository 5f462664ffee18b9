"""GaborF entry point — `gaborf/main.py` preset of the unified GARF-family
runner (Gabor activations, LR factor 128, init U(0,2), 20 epochs)."""
from nerf_experiments_tpu.experiments import garf_main


def main(argv=None):
    argv = ["--activation", "gabor"] + list(argv or [])
    return garf_main.main(argv)


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
