"""Scene I/O (OBJ/MTL/config) and camera tests."""

import numpy as np
import jax.numpy as jnp

from gpu_pathtracer_tpu.models.camera import Camera
from gpu_pathtracer_tpu.utils import config, image, obj_io, testscenes


class TestConfig:
    def test_master_file_roundtrip(self, tmp_path):
        p = testscenes.cornell_master_file(tmp_path, width=128, height=96, spp=8)
        cfg = config.parse_master_file(p)
        assert cfg.image_width == 128 and cfg.image_height == 96
        assert cfg.pathtracing_sample_size == 8
        assert cfg.render_mode == 1
        assert cfg.eye == (0.5, 0.5, 2.4)
        # aperture 0 forces dof_sample_size to 1 (input_param.h:99-104)
        assert cfg.aperture == 0.0 and cfg.dof_sample_size == 1

    def test_unknown_keys_ignored(self, tmp_path):
        f = tmp_path / "m.txt"
        f.write_text("image_width\t64\nbogus_key\t1\n")
        cfg = config.parse_master_file(f)
        assert cfg.image_width == 64


class TestObjIO:
    def test_cornell_scene_loads(self, tmp_path):
        obj, _ = testscenes.make_cornell_box(tmp_path, spheres=True, sphere_subdiv=1)
        scene = obj_io.load_scene(tmp_path, obj)
        # 6 quads = 12 wall tris + 3 icospheres at subdiv 1 = 3*80 tris
        assert scene.tri_p.shape == (12 + 240, 3, 3)
        assert scene.materials.num == 7  # default + 6 named
        assert scene.materials.name[0] == "Default_123"
        assert scene.num_objects == 9
        # glass: d 0.0 -> t_r = 1, Ni clamped to [1,1000]
        gi = scene.materials.name.index("glass")
        assert scene.materials.t_r[gi] == 1.0
        assert scene.materials.n_i[gi] == 1.5
        # reference default material values (read_file_util.h:240-271)
        np.testing.assert_allclose(scene.materials.kd[0], [0.9, 0.9, 0.9])
        assert scene.materials.t_r[0] == 0.0
        assert scene.materials.priority[0] == -1
        # light has emission
        li = scene.materials.name.index("light")
        np.testing.assert_allclose(scene.materials.ke[li], [15, 15, 15])
        # normals: walls use geometric normal (no vn), spheres use vn
        assert np.allclose(np.linalg.norm(scene.tri_n, axis=-1), 1.0, atol=1e-4)
        # floor normal points up
        np.testing.assert_allclose(scene.tri_n[0, 0], [0, 1, 0], atol=1e-6)

    def test_atlas_default_slot(self, tmp_path):
        obj, _ = testscenes.make_cornell_box(tmp_path, spheres=False)
        scene = obj_io.load_scene(tmp_path, obj)
        assert scene.atlas.rgb.shape[0] == 1  # only the white default
        np.testing.assert_allclose(scene.atlas.rgb[0], [1, 1, 1])
        assert np.all(scene.materials.tex_slot == 0)


class TestImage:
    def test_ppm_roundtrip(self, tmp_path):
        img = np.random.default_rng(0).uniform(0, 1, (4, 6, 3)).astype(np.float32)
        path = tmp_path / "x.ppm"
        image.save_ppm(img, path)
        back = image.load_ppm(path)
        expect = (255.99 * image.tonemap(img)).astype(np.int32)
        np.testing.assert_array_equal(back, expect.astype(np.uint8))


class TestCamera:
    def _cam(self, aperture=0.0):
        return Camera.create(
            eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
            fovy_deg=40.0, width=64, height=64, aperture=aperture, focus_dist=2.0,
        )

    def test_center_ray(self):
        cam = self._cam()
        o, d = cam.generate_rays(
            jnp.array([31.5]), jnp.array([31.5]), jnp.array([0.5]), jnp.array([0.7])
        )
        np.testing.assert_allclose(np.asarray(o[0]), [0.5, 0.5, 2.4], atol=1e-6)
        np.testing.assert_allclose(np.asarray(d[0]), [0, 0, -1.0], atol=1e-2)

    def test_corner_rays_distinct_and_unit(self):
        cam = self._cam()
        i = jnp.array([0.5, 0.5, 63.5, 63.5])
        j = jnp.array([0.5, 63.5, 0.5, 63.5])
        o, d = cam.generate_rays(i, j, jnp.full(4, 0.5), jnp.full(4, 0.7))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
        assert len({tuple(np.round(np.asarray(x), 4)) for x in d}) == 4
        # top-left ray points left (-x) and up (+y)
        assert d[0, 0] < 0 and d[0, 1] > 0

    def test_project_inverts_ray(self):
        cam = self._cam()
        i = jnp.array([10.5, 40.5, 62.5])
        j = jnp.array([5.5, 33.5, 1.5])
        _, d = cam.generate_rays(i, j, jnp.full(3, 0.5), jnp.full(3, 0.7))
        # project() expects the un-normalized "direction + w" form used by the
        # reference splatter; feed a scaled direction whose -w component is 1
        d_scaled = d / (-linalg_dot(d, np.asarray(cam.w)))[:, None]
        pi, pj = cam.project(jnp.asarray(d_scaled))
        np.testing.assert_array_equal(np.asarray(pi), np.floor(np.asarray(i)))
        np.testing.assert_array_equal(np.asarray(pj), np.floor(np.asarray(j)))

    def test_dof_jitters_origin(self):
        cam = self._cam(aperture=0.2)
        o1, d1 = cam.generate_rays(
            jnp.array([31.5]), jnp.array([31.5]), jnp.array([0.1]), jnp.array([0.9])
        )
        o2, d2 = cam.generate_rays(
            jnp.array([31.5]), jnp.array([31.5]), jnp.array([0.8]), jnp.array([0.2])
        )
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        # both rays converge at the focus plane
        t1 = 2.0 / -float(d1[0] @ cam.w)
        t2 = 2.0 / -float(d2[0] @ cam.w)
        p1 = np.asarray(o1[0] + t1 * d1[0])
        p2 = np.asarray(o2[0] + t2 * d2[0])
        np.testing.assert_allclose(p1, p2, atol=1e-5)


def linalg_dot(a, b):
    return np.sum(np.asarray(a) * np.asarray(b), axis=-1)


def test_dof_decorrelated_estimator_matches_reference_structure(tmp_path):
    """Documented DoF deviation (render_image docstring): the reference
    draws ONE lens sample per DoF sample and reuses the camera ray for all
    `sample_size` inner samples (pathtracing.h:277-280); render_image draws
    a fresh lens sample every sample.  Both estimate the same (lens x path)
    integral — this asserts the two estimators agree within MC noise on a
    defocused scene (a structural bias, e.g. wrong normalization or lens
    coupling, would shift the mean)."""
    import jax

    from gpu_pathtracer_tpu.models.scene import build_scene
    from gpu_pathtracer_tpu.render.integrator import render_image, trace_paths
    from gpu_pathtracer_tpu.utils.obj_io import load_scene

    testscenes.make_cornell_box(tmp_path, spheres=True, sphere_subdiv=0)
    scene = build_scene(load_scene(tmp_path, "box.obj"))
    n = 12
    cam = Camera.create(
        eye=(0.5, 0.5, 2.4), center=(0.5, 0.5, 0.0), up=(0, 1, 0),
        fovy_deg=40.0, width=n, height=n, aperture=0.3, focus_dist=1.2,
    )
    dof, spp, n_keys = 16, 4, 6

    ours = []
    for k in range(n_keys):
        img = render_image(
            scene, cam, jax.random.key(k), width=n, height=n,
            sample_size=spp, dof_sample_size=dof, level=3,
            hittable_pdf_weight=0.5,
        )
        assert np.isfinite(np.asarray(img)).all()
        ours.append(float(img.mean()))

    # reference-structured estimator: lens sample fixed within each group
    ii, jj = jnp.meshgrid(
        jnp.arange(n, dtype=jnp.float32), jnp.arange(n, dtype=jnp.float32),
        indexing="ij",
    )
    pi, pj = ii.reshape(-1) + 0.5, jj.reshape(-1) + 0.5
    ref = []
    for k in range(n_keys):
        key = jax.random.key(100 + k)
        total = jnp.zeros((n * n, 3))
        for s in range(dof):
            skey = jax.random.fold_in(key, s)
            u1 = jax.random.uniform(jax.random.fold_in(skey, 0), (n * n,))
            u2 = jax.random.uniform(jax.random.fold_in(skey, 1), (n * n,))
            o, d = cam.generate_rays(pi, pj, u1, u2)
            for m in range(spp):
                total = total + trace_paths(
                    scene, o, d, jax.random.fold_in(skey, 100 + m), level=3,
                    hittable_pdf_weight=0.5,
                )
        ref.append(float((total / (dof * spp)).mean()))

    # same expectation: the two estimator means must agree within 4 sigma of
    # their combined standard error (deterministic given the fixed keys; a
    # structural bias — wrong 1/n normalization, lens coupling — would be a
    # multiple of the means themselves and blow far past this bound)
    ours, ref = np.asarray(ours), np.asarray(ref)
    se = np.sqrt(ours.var(ddof=1) / n_keys + ref.var(ddof=1) / n_keys)
    diff = abs(ours.mean() - ref.mean())
    assert diff < 4.0 * se + 0.02 * ref.mean(), (
        ours.tolist(), ref.tolist(), diff, se
    )
