"""Top-level rendering driver: master-file config -> image file.

TPU-native equivalent of the reference's `main()` (`src/main.cu:61-1904`):
parse the tab-separated master file, load OBJ/MTL + textures, build the
device scene (BVHs, light tree, material table), dispatch on render_mode
(1 = path tracing, 2 = SPPM), and write PPM/PNG output.

Usage (CLI parity with main.cu:71-72):

    python -m gpu_pathtracer_tpu.renderer <master_file_path> <image_output_path>
"""

from __future__ import annotations

import pathlib
import sys
import time

import jax
import numpy as np

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.models.scene import Scene, build_scene
from gpu_pathtracer_tpu.utils.config import RenderConfig, parse_master_file
from gpu_pathtracer_tpu.utils.image import save_png, save_ppm
from gpu_pathtracer_tpu.utils.obj_io import load_scene, _load_image_rgb


def _log(stage: str):
    """Stage timing banners (string_util.h:90-111)."""
    class _Ctx:
        def __enter__(self):
            self.t0 = time.time()
            print(f"[gpu_pathtracer_tpu] {stage} ...", flush=True)
            return self

        def __exit__(self, *exc):
            print(
                f"[gpu_pathtracer_tpu] {stage} done in {time.time() - self.t0:.2f}s",
                flush=True,
            )
    return _Ctx()


def load_scene_from_config(cfg: RenderConfig) -> tuple[Scene, Camera]:
    with _log("scene load"):
        host = load_scene(cfg.input_folder_path, cfg.obj_filename)
        sky_image = None
        if cfg.texture_bg_path:
            p = pathlib.Path(cfg.texture_bg_path)
            if not p.is_absolute():
                p = pathlib.Path(cfg.input_folder_path) / p
            if p.exists():
                # reference decodes rows bottom-up (read_image_util.h:47-72)
                sky_image = np.asarray(_load_image_rgb(p))[::-1]
    with _log("device scene build"):
        scene = build_scene(host, sky_emission=cfg.sky_emission, sky_image=sky_image)
    camera = Camera.create(
        eye=cfg.eye,
        center=cfg.center,
        up=cfg.up,
        fovy_deg=cfg.fovy,
        width=cfg.image_width,
        height=cfg.image_height,
        aperture=cfg.aperture,
        focus_dist=cfg.focus_dist,
    )
    return scene, camera


def render_from_config(cfg: RenderConfig, key=None) -> np.ndarray:
    """Render and return (H, W, 3) linear radiance."""
    from gpu_pathtracer_tpu.render import render_image

    scene, camera = load_scene_from_config(cfg)
    if key is None:
        key = jax.random.key(cfg.seed)
    out_prefix = str(pathlib.Path(cfg.image_output_path).with_suffix(""))
    if cfg.sss_pts_per_object > 0:
        from gpu_pathtracer_tpu.render.sss import attach_sss

        with _log("SSS point cloud + first pass"):
            scene = attach_sss(
                scene,
                jax.random.fold_in(key, 777),
                pts_per_object=cfg.sss_pts_per_object,
                sample_size=cfg.pathtracing_sample_size,
                level=cfg.pathtracing_level,
                hittable_pdf_weight=cfg.hittable_pdf_weight,
            )
        if scene.sss is not None:
            # SSS point-cloud splat debug image (main.cu:1240-1260 _pts.ppm)
            from gpu_pathtracer_tpu.render.splat import splat_points
            from gpu_pathtracer_tpu.utils.image import save_ppm

            save_ppm(
                np.asarray(
                    splat_points(
                        camera, scene.sss.pos, scene.sss.color,
                        cfg.image_width, cfg.image_height, scene.sss.valid,
                    )
                ),
                f"{out_prefix}_pts.ppm",
            )
    if cfg.render_mode == 2:
        if cfg.shard_rays:
            # config-driven scale-out (reference parity target: the 2-arg
            # CLI drives the full machine, main.cu:71-72): photon pass
            # mesh-sharded + pixel arrays GSPMD-sharded over all devices
            from gpu_pathtracer_tpu.parallel.sppm_shard import (
                render_sppm_distributed,
            )

            with _log(f"SPPM render (sharded over {jax.device_count()} devices)"):
                img = render_sppm_distributed(
                    scene, camera, cfg, key, output_prefix=out_prefix
                )
        else:
            from gpu_pathtracer_tpu.render.sppm import render_sppm

            with _log("SPPM render"):
                img = render_sppm(
                    scene, camera, cfg, key, output_prefix=out_prefix
                )
    elif cfg.shard_rays:
        from gpu_pathtracer_tpu.parallel.shard import render_image_distributed

        with _log(f"path-tracing render (sharded over {jax.device_count()} devices)"):
            img = render_image_distributed(
                scene,
                camera,
                key,
                width=cfg.image_width,
                height=cfg.image_height,
                sample_size=cfg.pathtracing_sample_size,
                dof_sample_size=cfg.dof_sample_size,
                level=cfg.pathtracing_level,
                hittable_pdf_weight=cfg.hittable_pdf_weight,
                stack_size=cfg.max_stack,
            )
            img = np.asarray(jax.block_until_ready(img))
    else:
        with _log("path-tracing render"):
            img = render_image(
                scene,
                camera,
                key,
                width=cfg.image_width,
                height=cfg.image_height,
                sample_size=cfg.pathtracing_sample_size,
                dof_sample_size=cfg.dof_sample_size,
                level=cfg.pathtracing_level,
                hittable_pdf_weight=cfg.hittable_pdf_weight,
                stack_size=cfg.max_stack,
            )
            img = np.asarray(jax.block_until_ready(img))
    return np.asarray(img)


def main(argv=None):
    from gpu_pathtracer_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    # multi-host launch (SURVEY §2.7): no-op unless GPT_TPU_COORDINATOR /
    # GPT_TPU_NUM_PROCESSES / GPT_TPU_PROCESS_ID (or AUTO) are set
    from gpu_pathtracer_tpu.parallel.dist import init_distributed

    init_distributed()
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 1:
        print(__doc__)
        return 2
    cfg = parse_master_file(argv[0])
    if len(argv) > 1:
        cfg.image_output_path = argv[1]
    img = render_from_config(cfg)
    out = pathlib.Path(cfg.image_output_path)
    with _log(f"write {out}"):
        if out.suffix.lower() == ".png":
            save_png(img, out)
        else:
            save_ppm(img, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
