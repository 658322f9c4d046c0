"""Wire-codec roundtrips: host encode (native + numpy) vs XLA decode."""

import numpy as np
import pytest

from popsift_tpu import wirecodec as wc


def _images():
    rng = np.random.default_rng(7)
    smooth = rng.random((240, 384)).astype(np.float32)
    for _ in range(4):
        smooth = (smooth + np.roll(smooth, 1, 0) + np.roll(smooth, 1, 1)
                  + np.roll(smooth, -1, 0) + np.roll(smooth, -1, 1)) / 5
    smooth = (smooth * 255).astype(np.uint8)
    return [
        ("smooth", smooth),
        ("flat", np.full((96, 128), 200, np.uint8)),
        ("ramp", (np.arange(200)[None, :] * np.ones((81, 1))
                  % 256).astype(np.uint8)),
        ("odd", smooth[:233, :131]),
        ("tiny", smooth[:8, :16]),
        ("extremes", np.tile(np.array([[0, 255]], np.uint8), (64, 64))),
    ]


@pytest.mark.parametrize("name,img", _images(), ids=lambda v: v
                         if isinstance(v, str) else "")
def test_roundtrip_exact(name, img):
    buf = wc._encode_u8_numpy(img)
    if buf is None:
        return  # raw fallback is always correct
    bits = int(buf[:16].view(np.uint32)[2])
    dec = np.asarray(wc.decode_u8(buf, *img.shape, bits))
    np.testing.assert_array_equal(dec, img)


@pytest.mark.parametrize("name,img", _images(), ids=lambda v: v
                         if isinstance(v, str) else "")
def test_native_matches_numpy(name, img):
    if wc._host_native is None or not hasattr(wc._host_native,
                                               "encode_e2v2"):
        pytest.skip("native extension not built")
    nat = wc._host_native.encode_e2v2(img, wc._BUCKET)
    ref = wc._encode_u8_numpy(img)
    if ref is None:
        assert nat is None
    else:
        np.testing.assert_array_equal(nat, ref)


def test_noise_falls_back_to_raw():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (256, 512)).astype(np.uint8)
    assert wc._encode_u8_numpy(img) is None


def test_upload_path_small_image_skips_codec():
    img = np.full((16, 16), 3, np.uint8)
    out = np.asarray(wc.upload_image_u8(img, None))
    np.testing.assert_array_equal(out, img)


def test_upload_path_codec_image():
    name, img = _images()[0]
    out = np.asarray(wc.upload_image_u8(img, None))
    np.testing.assert_array_equal(out, img)


def test_worst_case_deltas_exact():
    """Every delta magnitude 0..128 appears; escapes must stay lossless."""
    row = np.zeros(257, np.uint8)
    vals = [0]
    v = 0
    for step in range(1, 129):
        v = (v + step) % 256
        vals.append(v)
        v = (v - step) % 256
        vals.append(v)
    row[:len(vals[:257])] = vals[:257]
    img = np.tile(row, (16, 1))
    buf = wc._encode_u8_numpy(img)
    if buf is None:
        return
    bits = int(buf[:16].view(np.uint32)[2])
    dec = np.asarray(wc.decode_u8(buf, *img.shape, bits))
    np.testing.assert_array_equal(dec, img)


def test_bitmap_tier_selected_and_roundtrip():
    """Mostly-zero residuals must select the E2v3 bitmap scheme (bits=1)
    and stay lossless, including escapes."""
    rng = np.random.default_rng(5)
    h, w = 192, 320
    d2 = np.zeros((h, w), np.int16)
    # ~15% +-1 residuals, ~1% escapes
    m = rng.random((h, w))
    d2[m < 0.075] = 1
    d2[(m >= 0.075) & (m < 0.15)] = -1
    d2[m > 0.99] = rng.integers(-100, 100)
    d2 = d2 % 256
    dy = np.cumsum(d2, axis=1) % 256
    img = (np.cumsum(dy, axis=0) % 256).astype(np.uint8)
    buf = wc._encode_u8_numpy(img)
    assert buf is not None
    bits = int(buf[:16].view(np.uint32)[2])
    assert bits == 1
    dec = np.asarray(wc.decode_u8(buf, h, w, bits))
    np.testing.assert_array_equal(dec, img)
    if wc._host_native is not None and hasattr(wc._host_native,
                                               "encode_e2v2"):
        nat = wc._host_native.encode_e2v2(img, wc._BUCKET)
        np.testing.assert_array_equal(nat, buf)


def test_bitmap_tier_all_zero_residuals():
    """A flat image (zero nonzeros) must survive the nz=0 edge of the
    bitmap scheme whichever scheme wins."""
    img = np.full((64, 96), 77, np.uint8)
    buf = wc._encode_u8_numpy(img)
    assert buf is not None
    bits = int(buf[:16].view(np.uint32)[2])
    dec = np.asarray(wc.decode_u8(buf, *img.shape, bits))
    np.testing.assert_array_equal(dec, img)


def test_four_bit_tier_roundtrip():
    """Content whose residuals overflow the 2-bit codes but fit nibbles
    must select the 4-bit tier and stay lossless."""
    rng = np.random.default_rng(3)
    d2 = rng.integers(-5, 6, (128, 256)).astype(np.int16) % 256
    dy = np.cumsum(d2, axis=1) % 256
    img = (np.cumsum(dy, axis=0) % 256).astype(np.uint8)
    buf = wc._encode_u8_numpy(img)
    assert buf is not None
    bits = int(buf[:16].view(np.uint32)[2])
    assert bits == 4
    dec = np.asarray(wc.decode_u8(buf, *img.shape, bits))
    np.testing.assert_array_equal(dec, img)
