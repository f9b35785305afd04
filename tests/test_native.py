"""Native host runtime (csrc/) vs the pure-Python oracle."""

import pathlib
import tempfile

import numpy as np
import pytest

from gpu_pathtracer_tpu.utils import image, native, obj_io


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_obj_parse_matches_python(lib, tmp_path):
    obj = tmp_path / "scene.obj"
    obj.write_text(
        "\n".join(
            [
                "mtllib scene.mtl",
                "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0", "v 0 0 1",
                "vt 0 0", "vt 1 0", "vt 1 1",
                "vn 0 0 1", "vn 0 1 0",
                "usemtl red",
                "f 1/1/1 2/2/1 3/3/1 4/1/1",  # quad -> 2 tris
                "f 1 2 5",  # no vt/vn
                "usemtl blue",
                "f 1//2 3//2 5//2",  # vn only
                "f 2/2 3/3 4/1",  # vt only
            ]
        )
    )
    (tmp_path / "scene.mtl").write_text(
        "newmtl red\nKd 1 0 0\nnewmtl blue\nKd 0 0 1\n"
    )
    mtls, texs = obj_io.collect_mtllib_and_textures(tmp_path, "scene.obj")
    atlas = obj_io.TextureAtlas.build(tmp_path, texs)
    mats = obj_io.parse_mtl(tmp_path, mtls, atlas)

    raw_native = native.parse_obj_native(obj, mats.name)
    assert raw_native is not None
    raw_python = obj_io._parse_obj_python(obj, mats)
    names = ("vidx", "tidx", "nidx", "mat", "obj", "verts", "uvs", "norms")
    for name, a, b in zip(names, raw_native, raw_python):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_obj_parse_cornell_asset(lib):
    folder = pathlib.Path(__file__).parent / "assets" / "cornell"
    mtls, texs = obj_io.collect_mtllib_and_textures(folder, "box.obj")
    atlas = obj_io.TextureAtlas.build(folder, texs)
    mats = obj_io.parse_mtl(folder, mtls, atlas)
    raw_native = native.parse_obj_native(folder / "box.obj", mats.name)
    raw_python = obj_io._parse_obj_python(folder / "box.obj", mats)
    assert raw_native is not None
    for a, b in zip(raw_native, raw_python):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ppm_writer_matches_python(lib, tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 2.0, (13, 17, 3)).astype(np.float32)
    img[0, 0] = np.nan  # NaN scrubbing path

    p_native = tmp_path / "native.ppm"
    assert native.write_ppm_native(p_native, np.nan_to_num(img))

    monkeypatch.setenv("GPT_TPU_NO_NATIVE", "1")
    native._lib_cache.clear()
    p_python = tmp_path / "python.ppm"
    image.save_ppm(img, p_python)
    native._lib_cache.clear()
    monkeypatch.delenv("GPT_TPU_NO_NATIVE")

    a = image.load_ppm(p_native)
    b = image.load_ppm(p_python)
    np.testing.assert_array_equal(a, b)


def test_jpeg_roundtrip(lib, tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
    p = tmp_path / "t.jpg"
    PIL.fromarray(img).save(p, quality=95)

    dec = native.decode_jpeg_native(p)
    assert dec is not None and dec.shape == (24, 32, 3)
    ref = np.asarray(PIL.open(p).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(dec, ref, atol=2 / 255.0)

    flipped = native.decode_jpeg_native(p, flip_rows=True)
    np.testing.assert_array_equal(flipped, dec[::-1])
