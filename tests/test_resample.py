"""MXU-native resampler parity vs the gather-based reference sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.ops import image as im
from lpr_tpu.ops.resample import (
    affine_resample,
    crop_rotated_fast,
    extract_tile,
    plate_tile,
    resize_matmul,
)


def _smooth_frame(h=240, w=320):
    yy, xx = np.mgrid[0:h, 0:w]
    return jnp.asarray(
        (np.stack([np.sin(yy / 30), np.cos(xx / 40), (yy + xx) / (h + w)], -1)
         * 0.5 + 0.5).astype(np.float32)
    )


def test_resize_matmul_matches_gather_resize():
    img = _smooth_frame(64, 96)
    a = np.asarray(resize_matmul(img, (32, 48)))
    b = np.asarray(im.resize_bilinear(img, (32, 48)))
    # jax.image.resize antialiases on downscale; tolerance reflects that
    assert np.abs(a - b).mean() < 0.01


def test_extract_tile_identity():
    img = _smooth_frame(64, 128)
    tile = extract_tile(img, jnp.asarray([64.0, 32.0]),
                        jnp.asarray([128.0, 64.0]), (64, 128))
    np.testing.assert_allclose(np.asarray(tile), np.asarray(img), atol=1e-4)


def test_crop_rotated_fast_parity_smooth():
    frame = _smooth_frame()
    box = jnp.asarray([60.0, 80.0, 260.0, 140.0])
    for angle in (0.0, 0.15, -0.2):
        a = jnp.float32(angle)
        ref = np.asarray(im.crop_rotated(frame, box, a, (32, 192)))
        fast = np.asarray(crop_rotated_fast(frame, box, a, (32, 192)))
        assert np.abs(ref - fast).max() < 2e-3, angle


def test_crop_rotated_fast_halves_and_mask():
    frame = _smooth_frame()
    box = jnp.asarray([60.0, 80.0, 260.0, 140.0])
    a = jnp.float32(0.1)
    tile, geom = plate_tile(frame, box)
    kw = dict(tile=tile, tile_geom=geom)
    top = crop_rotated_fast(frame, box, a, (16, 96), v_range=(-0.5, 0.0), **kw)
    bot = crop_rotated_fast(frame, box, a, (16, 96), v_range=(0.0, 0.5), **kw)
    full = crop_rotated_fast(frame, box, a, (32, 96), **kw)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([top, bot], 0)), np.asarray(full), atol=2e-2
    )
    sq_ref = np.asarray(im.crop_rotated(frame, box, a, (64, 64), square=True,
                                        mask_outside=True))
    sq_fast = np.asarray(crop_rotated_fast(frame, box, a, (64, 64),
                                           square=True, mask_outside=True))
    # identical masked region
    np.testing.assert_array_equal(sq_ref == 0, sq_fast == 0)
    assert np.abs(sq_ref - sq_fast).max() < 5e-3
