"""Regenerate the golden-image fixtures (run from repo root on CPU):

    JAX_PLATFORMS=cpu python tests/golden_gen.py

Only regenerate when an estimator change is INTENDED; the point of the
fixtures is that accidental estimator drift breaks test_golden instead of
silently shifting images."""

import pathlib
import sys

import numpy as np

from gpu_pathtracer_tpu.utils.platform import apply_platform_env

apply_platform_env()  # sitecustomize forces the axon TPU plugin otherwise

import jax  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from test_golden import (  # noqa: E402
    GOLDEN_DIR,
    render_fog_sppm_golden,
    render_pt_golden,
    render_sppm_golden,
    render_sss_pt_golden,
)


def main():
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    np.save(GOLDEN_DIR / "pt_cornell_32.npy", render_pt_golden())
    np.save(GOLDEN_DIR / "sppm_box_16.npy", render_sppm_golden())
    np.save(GOLDEN_DIR / "fog_sppm_16.npy", render_fog_sppm_golden())
    np.save(GOLDEN_DIR / "sss_pt_32.npy", render_sss_pt_golden())
    print("golden fixtures written to", GOLDEN_DIR)


if __name__ == "__main__":
    main()
