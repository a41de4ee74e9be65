"""Baseline JPEG codec (functions/jpeg.py): round-trip quality, subsampling
variants, restart markers, grayscale, odd dimensions, sniffing integration.

The codec is lossy by quantization only — a solid-color image (DC-only
blocks) must round-trip EXACTLY; smooth gradients must exceed 40 dB PSNR at
quality 85+.
"""

import numpy as np
import pytest

from geotrellis_contrib_ray.functions import codecs, jpeg


def _gradient(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (w + h))], axis=-1
    ).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / mse)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0", "4:2:2"])
def test_jpeg_roundtrip_psnr(sub):
    img = _gradient()
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsampling=sub))
    assert out.shape == img.shape
    assert _psnr(out, img) > 40.0


def test_jpeg_solid_color_exact():
    # a constant block is pure DC: quantization cannot touch it at q>=90
    img = np.full((17, 13, 3), [200, 30, 90], dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) == 0


def test_jpeg_quality_monotone_size():
    img = _gradient()
    sizes = [len(jpeg.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_restart_markers_bit_identical():
    img = _gradient()
    a = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
    b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, restart_interval=2))
    assert np.array_equal(a, b)  # restarts change framing, not pixels
    # the restart stream must actually contain RST markers
    data = jpeg.encode_jpeg(img, quality=85, restart_interval=2)
    assert any(
        data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7 for i in range(2, len(data) - 3)
    )


def test_jpeg_grayscale():
    yy, xx = np.mgrid[0:40, 0:56]
    g = ((xx + yy) * 255 // (40 + 56)).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))
    assert out.shape == (40, 56, 3)
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 3
    assert np.array_equal(out[..., 0], out[..., 1])


def test_jpeg_noise_stress():
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(noise, quality=95))
    assert out.shape == noise.shape  # entropy coder handles dense AC + ZRL


def test_jpeg_odd_dims_not_multiple_of_mcu():
    img = _gradient(19, 23)
    for sub in ("4:4:4", "4:2:0"):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsampling=sub))
        assert out.shape == (19, 23, 3)


def test_sniff_routes_jpeg():
    img = _gradient(16, 16)
    data = jpeg.encode_jpeg(img, quality=90)
    out = codecs.sniff_and_decode_image(data)
    assert out.shape == (16, 16, 3)
    assert _psnr(out, img) > 35.0


def test_jpeg_rejects_progressive_frames():
    img = _gradient(16, 16)
    data = bytearray(jpeg.encode_jpeg(img, quality=90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline only"):
        jpeg.decode_jpeg(bytes(data))
