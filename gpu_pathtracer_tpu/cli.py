"""CLI entry point: ``python -m gpu_pathtracer_tpu.cli <master_file> <out>``.

Two positional args exactly like the reference binary (main.cu:71-72).
"""

from gpu_pathtracer_tpu.renderer import main

if __name__ == "__main__":
    raise SystemExit(main())
