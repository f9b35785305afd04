from gpu_pathtracer_tpu.render.integrator import render_image, trace_paths

__all__ = ["render_image", "trace_paths"]
