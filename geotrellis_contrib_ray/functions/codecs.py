"""Pure-stdlib multimedia codecs (struct + zlib + wave): PPM / BMP / PNG
images and PCM WAV audio, encode + decode.

These make the multimodal stages' decode step REAL in this dependency-free
environment: no Pillow/libsndfile needed for the formats a synthetic or
pre-normalized corpus actually carries.  Exotic formats (JPEG/MP3/video)
still route to an external-codec backend at deploy time.

All decoders return numpy arrays; all encoders are deterministic
byte-for-byte (PNG uses filter 0 + fixed zlib level), so tests can assert
exact round-trips.
"""

from __future__ import annotations

import struct
import wave
import zlib
from io import BytesIO

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6, maxval 255)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    return np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (row_len - w * 3)
    for r in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[r].tobytes() + pad
    return header + dib + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    (dib_size, w, h) = struct.unpack_from("<Iii", data, 14)
    (planes, bpp) = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=row_len * h, offset=offset)
    rows = raw.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


# ---------------------------------------------------------------------------
# PNG (8-bit truecolor RGB/RGBA, non-interlaced; all 5 scanline filters)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c in (3, 4) and img.dtype == np.uint8
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for r in range(h):
        raw += b"\x00" + img[r].tobytes()  # filter 0 per scanline
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or color_type not in (2, 6) or interlace:
                raise ValueError(
                    f"only 8-bit RGB/RGBA non-interlaced PNG supported "
                    f"(depth={bit_depth}, color={color_type})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    nch = 3 if color_type == 2 else 4
    stride = w * nch
    raw = zlib.decompress(bytes(idat))
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1)
        if f == 0:
            cur = line.copy()
        elif f == 1:  # Sub
            cur = line.copy()
            for i in range(nch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - nch])) & 0xFF
        elif f == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - nch]) if i >= nch else 0
                cur[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = cur[i - nch] if i >= nch else np.uint8(0)
                ul = prev[i - nch] if i >= nch else np.uint8(0)
                cur[i] = (int(line[i]) + int(_paeth(np.uint8(left), prev[i], np.uint8(ul)))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = cur
        prev = cur
    img = out.reshape(h, w, nch)
    return np.ascontiguousarray(img[:, :, :3])  # drop alpha


# ---------------------------------------------------------------------------
# WAV (PCM via stdlib wave)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (or int16) -> 16-bit mono PCM WAV bytes."""
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
        samples = np.round(samples * 32767.0).astype(np.int16)
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono float32 samples in [-1, 1], sample_rate).
    Multi-channel input is mixed down by averaging."""
    with wave.open(BytesIO(data), "rb") as wf:
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        arr = arr.reshape(-1, nch).mean(axis=1)
    return arr, rate


def decode_wav_int16(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (raw mono int16 samples, sample_rate) — no float
    normalization, so integer DSP over the samples is bit-exact (the
    audio-energy oracle sums squares of these values)."""
    with wave.open(BytesIO(data), "rb") as wf:
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if width != 2:
        raise ValueError(f"decode_wav_int16 needs 16-bit PCM, got width {width}")
    arr = np.frombuffer(frames, dtype="<i2")
    if nch > 1:
        arr = arr.reshape(-1, nch)[:, 0].copy()  # first channel, no mixdown
    return arr, rate


# ---------------------------------------------------------------------------
# sniffing
# ---------------------------------------------------------------------------


def sniff_and_decode_image(data: bytes) -> np.ndarray:
    if data.startswith(b"P6"):
        return decode_ppm(data)
    if data.startswith(b"BM"):
        return decode_bmp(data)
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if data.startswith(b"\xff\xd8"):
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError("unrecognized image format (supported: PPM/BMP/PNG/JPEG)")


def sniff_and_decode_audio(data: bytes) -> np.ndarray:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)[0]
    raise ValueError("unrecognized audio format (supported: PCM WAV)")
