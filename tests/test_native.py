"""Native C++ loader tests (auto-built; falls back to PIL when unavailable)."""

import numpy as np
import pytest
from PIL import Image

from lpr_tpu.native import (
    _fallback_batch,
    decode_image,
    load_letterbox_batch,
    native_available,
)


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, ext in enumerate(["png", "jpg", "png", "jpg"]):
        arr = (rng.rand(60, 90, 3) * 255).astype(np.uint8)
        p = str(d / f"im{i}.{ext}")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_available()


def test_decode_image_roundtrip(img_files):
    data = open(img_files[0], "rb").read()
    img = decode_image(data)
    ref = np.asarray(Image.open(img_files[0]).convert("RGB"))
    assert img.shape == ref.shape
    np.testing.assert_array_equal(img, ref)  # PNG is lossless


def test_batch_matches_pil(img_files):
    out = load_letterbox_batch(img_files, (128, 128), fill=0)
    ref = _fallback_batch(img_files, 128, 128, 0)
    assert out.shape == (4, 128, 128, 3)
    diff = np.abs(out.astype(int) - ref.astype(int)).max()
    assert diff <= 2  # bilinear rounding differences only


def test_batch_missing_file(img_files):
    out = load_letterbox_batch(img_files[:1] + ["/nonexistent.png"],
                               (64, 64), fill=7)
    assert out.shape == (2, 64, 64, 3)
    assert (out[1] == 7).all()  # failed slot filled


def test_pack_front_batch_matches_numpy():
    """Native letterbox+quarter-grid pack == the numpy reference packer.

    Pad-only geometry (720p -> 736x1280) must be byte-exact; a true
    resize may differ by 1 LSB (float vs numpy/cv2 bilinear rounding)."""
    from lpr_tpu.native import pack_front_batch
    from lpr_tpu.ops.pallas.yolo_front import front_geom, \
        pack_front_frames_host

    rng = np.random.RandomState(3)
    g = front_geom(736, 1280)
    frames = rng.randint(0, 256, (2, 720, 1280, 3), np.uint8)
    a = pack_front_batch(frames, (736, 1280))
    assert a is not None and a.shape == (2, 64, g.rp * g.cp)
    np.testing.assert_array_equal(
        a, pack_front_frames_host(frames, (736, 1280)))

    small = rng.randint(0, 256, (1, 360, 640, 3), np.uint8)
    b = pack_front_batch(small, (736, 1280))
    ref = pack_front_frames_host(small, (736, 1280))
    assert np.abs(b.astype(int) - ref.astype(int)).max() <= 1
