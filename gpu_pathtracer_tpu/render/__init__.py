from gpu_pathtracer_tpu.render.integrator import render_image, trace_paths
from gpu_pathtracer_tpu.render.sppm import (
    render_sppm,
    render_sppm_differentiable,
)

__all__ = [
    "render_image",
    "trace_paths",
    "render_sppm",
    "render_sppm_differentiable",
]
