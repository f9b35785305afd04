"""Unit tests for the nested-dielectric stack and BSDF sampler
(reference semantics: material.h:130-651, material_list_operations.h:9-58)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.constants import VACUUM_PRIORITY
from gpu_pathtracer_tpu.ops import materials, texture


def make_table(rows):
    """rows: list of dicts with optional overrides."""
    m = len(rows)

    def col(k, default, dim=None):
        vals = [r.get(k, default) for r in rows]
        return jnp.asarray(vals, jnp.float32)

    atlas = texture.Atlas(
        rgb=jnp.ones((1, 3), jnp.float32),
        offsets=jnp.zeros((1,), jnp.int32),
        heights=jnp.ones((1,), jnp.int32),
        widths=jnp.ones((1,), jnp.int32),
    )
    n_s = col("n_s", 1.0)
    t_r = col("t_r", 0.0)
    n_s = jnp.where((n_s >= 1e6) & (t_r > 0), jnp.inf, n_s)
    return materials.MaterialTable(
        kd=col("kd", (0.5, 0.5, 0.5)),
        ks=col("ks", (0.0, 0.0, 0.0)),
        ke=col("ke", (0.0, 0.0, 0.0)),
        tf=col("tf", (1.0, 1.0, 1.0)),
        n_s=n_s,
        n_i=col("n_i", 1.0),
        t_r=t_r,
        bm=col("bm", 1.0),
        path_length=col("path_length", 0.0),
        scattering_coef=col("scattering_coef", 0.0),
        absorption_coef=col("absorption_coef", 0.0),
        g=col("g", 0.0),
        priority=jnp.asarray([r.get("priority", -1) for r in rows], jnp.int32),
        tex_slot=jnp.zeros((m, 5), jnp.int32),
        atlas=atlas,
    )


class TestStack:
    def test_init_has_nullptr(self):
        ids, length = materials.stack_init((2,), 4)
        assert (np.asarray(length) == 1).all()
        assert (np.asarray(ids)[:, 0] == materials.NULL_MAT).all()

    def test_add_and_duplicate(self):
        ids, length = materials.stack_init((1,), 4)
        t = jnp.array([0], jnp.int32)
        ids, length = materials.stack_add(ids, length, t, jnp.array([True]))
        assert int(length[0]) == 2 and int(ids[0, 1]) == 0
        # adding again is a no-op (is_material_inside)
        ids, length = materials.stack_add(ids, length, t, jnp.array([True]))
        assert int(length[0]) == 2

    def test_remove_last_occurrence_and_compact(self):
        ids, length = materials.stack_init((1,), 6)
        for mid in (3, 5, 7):
            ids, length = materials.stack_add(
                ids, length, jnp.array([mid], jnp.int32), jnp.array([True])
            )
        assert int(length[0]) == 4
        ids, length = materials.stack_remove(
            ids, length, jnp.array([5], jnp.int32), jnp.array([True])
        )
        assert int(length[0]) == 3
        assert list(np.asarray(ids)[0, :3]) == [materials.NULL_MAT, 3, 7]
        assert int(ids[0, 3]) == materials.EMPTY_SLOT
        # removing something absent is a no-op
        ids2, length2 = materials.stack_remove(
            ids, length, jnp.array([42], jnp.int32), jnp.array([True])
        )
        assert int(length2[0]) == 3
        np.testing.assert_array_equal(np.asarray(ids2), np.asarray(ids))

    def test_find_highest_prioritised(self):
        # priorities: glass=1 (higher), fog=2 (lower value wins)
        table = make_table([
            dict(priority=1, n_i=1.5, t_r=1.0),
            dict(priority=2, n_i=1.0, t_r=1.0),
        ])
        ids, length = materials.stack_init((1,), 4)
        for mid in (1, 0):  # push fog then glass
            ids, length = materials.stack_add(
                ids, length, jnp.array([mid], jnp.int32), jnp.array([True])
            )
        hp, shp = materials.find_highest_prioritised(table, ids, length)
        assert int(hp[0]) == 0  # glass (priority 1) wins
        assert int(shp[0]) == 1  # fog is second
        # empty-ish stack: only nullptr -> hp = nullptr, no second
        ids0, len0 = materials.stack_init((1,), 4)
        hp0, shp0 = materials.find_highest_prioritised(table, ids0, len0)
        assert int(hp0[0]) == materials.NULL_MAT
        assert int(shp0[0]) == materials.NULL_MAT

    def test_vacuum_priority(self):
        table = make_table([dict(priority=5)])
        assert int(table.get_priority(jnp.array([-1], jnp.int32))[0]) == VACUUM_PRIORITY
        assert int(table.get_priority(jnp.array([0], jnp.int32))[0]) == 5


def _sample(table, mat_id, v_in, normal, stack_ids, stack_len, key=0, force=False):
    r = mat_id.shape[0]
    return materials.sample_bsdf(
        table,
        mat_id,
        jnp.zeros((r, 3)),
        v_in,
        normal,
        jnp.zeros((r, 2)),
        stack_ids,
        stack_len,
        jax.random.key(key),
        force_refract=force,
    )


class TestBSDF:
    def test_false_hit_passthrough(self):
        """Hitting a lower-priority (higher value) boundary while inside a
        higher-priority medium passes straight through (material.h:509-530)."""
        table = make_table([
            dict(priority=1, n_i=1.5, t_r=1.0),  # glass
            dict(priority=2, n_i=1.0, t_r=1.0),  # fog
        ])
        ids, length = materials.stack_init((1,), 4)
        ids, length = materials.stack_add(
            ids, length, jnp.array([0], jnp.int32), jnp.array([True])
        )
        v_in = jnp.array([[0.0, 0.0, -1.0]])
        normal = jnp.array([[0.0, 0.0, 1.0]])
        ref = _sample(table, jnp.array([1], jnp.int32), v_in, normal, ids, length)
        assert bool(ref.false_hit[0])
        np.testing.assert_allclose(np.asarray(ref.dir), np.asarray(v_in))
        np.testing.assert_allclose(np.asarray(ref.filter), 1.0)
        assert bool(ref.entering[0])
        assert int(ref.next_mat[0]) == 0  # the glass stays the medium

    def test_mirror_glass_entering_refracts_or_reflects(self):
        table = make_table([dict(n_i=1.5, t_r=1.0, n_s=1e9, priority=1)])
        r = 512
        v_in = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (r, 1))
        normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
        ids, length = materials.stack_init((r,), 4)
        ref = _sample(table, jnp.zeros((r,), jnp.int32), v_in, normal, ids, length)
        d = np.asarray(ref.dir)
        refr = np.asarray(ref.refracted)
        # normal incidence: refraction continues straight, reflection returns
        assert np.abs(d[refr] - np.array([0.0, 0.0, -1.0])).max() < 1e-5
        assert np.abs(d[~refr] - np.array([0.0, 0.0, 1.0])).max() < 1e-5
        # Schlick at normal incidence for n=1.5: r0 = 0.04
        assert 0.01 < (~refr).mean() < 0.10
        assert np.asarray(ref.entering)[refr].all()
        assert (np.asarray(ref.next_mat)[refr] == 0).all()

    def test_snell_angle(self):
        """45-degree incidence into n=1.5 with forced refraction: Snell."""
        table = make_table([dict(n_i=1.5, t_r=1.0, n_s=1e9, priority=1)])
        s = np.sin(np.radians(45))
        v_in = jnp.array([[s, 0.0, -s]], jnp.float32)
        normal = jnp.array([[0.0, 0.0, 1.0]])
        ids, length = materials.stack_init((1,), 4)
        ref = _sample(
            table, jnp.zeros((1,), jnp.int32), v_in, normal, ids, length,
            force=True,
        )
        d = np.asarray(ref.dir)[0]
        sin_out = np.linalg.norm(d[:2])
        np.testing.assert_allclose(sin_out, s / 1.5, rtol=1e-4)
        assert d[2] < 0

    def test_total_internal_reflection(self):
        """Exiting glass beyond the critical angle always reflects."""
        table = make_table([dict(n_i=1.5, t_r=1.0, n_s=1e9, priority=1)])
        # inside glass: stack holds the glass
        ids, length = materials.stack_init((1,), 4)
        ids, length = materials.stack_add(
            ids, length, jnp.array([0], jnp.int32), jnp.array([True])
        )
        # 60 deg > critical angle asin(1/1.5) = 41.8 deg; v_in exits (dot > 0)
        s, c = np.sin(np.radians(60)), np.cos(np.radians(60))
        v_in = jnp.array([[s, 0.0, c]], jnp.float32)
        normal = jnp.array([[0.0, 0.0, 1.0]])
        ref = _sample(table, jnp.zeros((1,), jnp.int32), v_in, normal, ids, length)
        assert bool(ref.reflected[0]) and not bool(ref.refracted[0])
        d = np.asarray(ref.dir)[0]
        np.testing.assert_allclose(d, [s, 0.0, -c], atol=1e-5)
        assert int(ref.next_mat[0]) == 0  # still inside the glass

    def test_diffuse_vs_specular_pick(self):
        table = make_table([dict(kd=(0.5, 0.5, 0.5), ks=(0.5, 0.5, 0.5), n_s=10.0)])
        r = 2048
        v_in = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (r, 1))
        normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
        ids, length = materials.stack_init((r,), 4)
        ref = _sample(table, jnp.zeros((r,), jnp.int32), v_in, normal, ids, length)
        frac_spec = np.asarray(ref.reflected).mean()
        assert 0.45 < frac_spec < 0.55  # |ks|/(|kd|+|ks|) = 0.5
        # diffuse samples stay in the upper hemisphere
        d = np.asarray(ref.dir)[np.asarray(ref.diffuse)]
        assert (d[:, 2] > 0).all()
        # diffuse filter = kd
        f = np.asarray(ref.filter)[np.asarray(ref.diffuse)]
        np.testing.assert_allclose(f, 0.5, atol=1e-6)

    def test_specular_energy(self):
        """E[filter * factor] over the Phong lobe ~= ks for a high exponent:
        filter*pdf^-1 telescopes to ks (n+2)/(n+1) (vector_util.h:75-159,
        218-228)."""
        table = make_table([dict(kd=(0, 0, 0), ks=(0.8, 0.8, 0.8), n_s=100.0)])
        r = 4096
        v_in = jnp.tile(
            jnp.asarray([[np.sin(0.3), 0.0, -np.cos(0.3)]], jnp.float32), (r, 1)
        )
        normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
        ids, length = materials.stack_init((r,), 4)
        ref = _sample(table, jnp.zeros((r,), jnp.int32), v_in, normal, ids, length)
        # replicate change_ref_ray with w=0: factor = scat/(pi * samp) using
        # the NORMALIZED specular pdf (material_operations.h:59-65, 148)
        from gpu_pathtracer_tpu.ops import sampling

        samp = np.asarray(
            sampling.specular_sampling_pdf(
                v_in, ref.dir, normal, ref.perfect_dir, ref.n, ref.refracted
            )
        )
        scat = np.asarray(
            sampling.scattering_pdf(normal, ref.dir, ref.diffuse, v_in, ref.refracted)
        )
        factor = np.where(samp > 0, scat / np.pi / np.maximum(samp, 1e-20), 0.0)
        w = np.asarray(ref.filter)[:, 0] * np.clip(factor, 0, 0.9999)
        # energy ratio (n+2)/(n+1) with hemisphere clipping losses
        assert 0.7 < w.mean() < 0.9, w.mean()
