"""Vendored pure-Python media codecs for the real-decode seam.

The container has no PIL/ffmpeg/soundfile, but two uncompressed formats
are fully decodable with struct + numpy alone, which makes the
``fake=False`` path of ``multimodal.columns`` real and testable:

- BMP: Windows bitmap, BITMAPINFOHEADER, BI_RGB (uncompressed) 24/32-bit.
  Format reference: the public BMP file format specification
  (BITMAPFILEHEADER + BITMAPINFOHEADER layouts).
- WAV: RIFF/WAVE with a PCM ``fmt `` chunk, 8/16/32-bit integer samples.
  Parsed manually (not via the stdlib ``wave`` module) so tests can
  generate fixtures with ``wave`` as an INDEPENDENT implementation.
- PNG: non-interlaced 8-bit-depth images, every color type (gray,
  RGB, palette, gray+alpha, RGBA) and all five scanline filters
  (None/Sub/Up/Average/Paeth), inflated with stdlib ``zlib``. Format
  reference: the public PNG specification (RFC 2083 / W3C PNG, chunk
  layout + filter algorithms). Tests implement the FORWARD filter
  direction independently in numpy and hand-pack chunks, so the
  codec's unfilter path is pinned by a second implementation.

Formats needing non-stdlib decoders (JPEG/MP3/...) still raise
NotImplementedError — that seam is where PIL/ffmpeg would plug in on a
real cluster.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class MediaDecodeError(ValueError):
    """Malformed or unsupported media payload."""


# ---------------------------------------------------------------------------
# BMP


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (H, W, 3) uint8 RGB array.

    Handles bottom-up (positive height) and top-down (negative height) row
    order and the 4-byte row padding the format requires.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaDecodeError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise MediaDecodeError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise MediaDecodeError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise MediaDecodeError(f"unsupported BMP bit depth {bpp}")
    if width <= 0 or height == 0:
        raise MediaDecodeError(f"bad BMP dimensions {width}x{height}")
    bottom_up = height > 0
    h = abs(height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3          # rows pad to 4 bytes
    need = pixel_off + stride * h
    if len(payload) < need:
        raise MediaDecodeError(
            f"truncated BMP: need {need} bytes, have {len(payload)}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=pixel_off).reshape(h, stride)
    img = rows[:, : width * nch].reshape(h, width, nch)
    if bottom_up:
        img = img[::-1]
    # stored as BGR(A) -> return RGB
    return np.ascontiguousarray(img[:, :, 2::-1])


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a bottom-up 24-bit BMP."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise MediaDecodeError(f"expected (H, W, 3), got {arr.shape}")
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)   # bottom-up BGR
    pixels = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    return header + info + pixels


# ---------------------------------------------------------------------------
# PNG

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}   # color type -> samples/px


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to an (H, W, 3) uint8 RGB array.

    Supports all five color types (palette via PLTE; alpha channels are
    dropped, grayscale replicated to RGB — matching the codec contract
    ``decode_bmp`` set). Interlaced (Adam7) images and bit depths other
    than 8 raise MediaDecodeError.
    """
    if payload[:8] != PNG_SIGNATURE:
        raise MediaDecodeError("not a PNG payload")
    ihdr = plte = None
    idat: list[bytes] = []
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise MediaDecodeError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length                       # len + type + data + crc
    if ihdr is None or len(ihdr) < 13:
        raise MediaDecodeError("PNG missing IHDR")
    if not idat:
        raise MediaDecodeError("PNG missing IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    if comp != 0 or filt != 0:
        raise MediaDecodeError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise MediaDecodeError("interlaced (Adam7) PNG unsupported")
    if depth != 8:
        raise MediaDecodeError(f"unsupported PNG bit depth {depth}")
    nch = _PNG_CHANNELS.get(color)
    if nch is None:
        raise MediaDecodeError(f"bad PNG color type {color}")
    if color == 3 and (plte is None or len(plte) % 3):
        raise MediaDecodeError("palette PNG missing/malformed PLTE")
    if w <= 0 or h <= 0:
        raise MediaDecodeError(f"bad PNG dimensions {w}x{h}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"bad PNG zlib stream: {e}") from e
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise MediaDecodeError(
            f"PNG data size {len(raw)} != {(stride + 1) * h}")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = nch                                    # bytes per pixel at depth 8
    at = 0
    for y in range(h):
        ftype = raw[at]
        cur = np.frombuffer(raw, np.uint8, stride, at + 1).copy()
        at += stride + 1
        if ftype == 0:                           # None
            pass
        elif ftype == 2:                         # Up (uint8 wraps mod 256)
            cur += prev
        elif ftype == 1:                         # Sub: left-dependent scan
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif ftype == 3:                         # Average
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:                         # Paeth predictor
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise MediaDecodeError(f"bad PNG filter type {ftype} (row {y})")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, nch)
    if color == 3:
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(img.max(initial=0)) >= len(pal):
            raise MediaDecodeError("PNG palette index out of range")
        return np.ascontiguousarray(pal[img[:, :, 0]])
    if color == 0:                               # gray -> replicate
        return np.ascontiguousarray(np.repeat(img, 3, axis=2))
    if color == 4:                               # gray+alpha -> drop alpha
        return np.ascontiguousarray(np.repeat(img[:, :, :1], 3, axis=2))
    if color == 6:                               # RGBA -> drop alpha
        return np.ascontiguousarray(img[:, :, :3])
    return np.ascontiguousarray(img)             # RGB


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a filter-0 truecolor PNG."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise MediaDecodeError(f"expected (H, W, 3), got {arr.shape}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# WAV


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a PCM RIFF/WAVE payload.

    Returns ``(samples, sample_rate, channels)`` where samples is a
    float32 array of shape (n_frames, channels) scaled to [-1, 1].
    Supports integer PCM at 8 (unsigned), 16, and 32 bits, plus
    format 3 (IEEE float32).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)         # chunks pad to even length
    if fmt is None or data is None:
        raise MediaDecodeError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if channels <= 0:
        raise MediaDecodeError(f"bad WAV channel count {channels}")
    if audio_fmt == 3 and bits == 32:
        samples = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif audio_fmt == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 1 and bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                   - 128.0) / 128.0
    else:
        raise MediaDecodeError(
            f"unsupported WAV format {audio_fmt} / {bits}-bit")
    n = (len(samples) // channels) * channels
    return samples[:n].reshape(-1, channels), int(rate), int(channels)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode float32 samples in [-1, 1] (frames x channels or 1-D mono)
    as 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    pcm = np.clip(arr * 32767.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
