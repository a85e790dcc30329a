"""Vendored pure-Python media codecs for the real-decode seam.

The container has no PIL/ffmpeg/soundfile, but two uncompressed formats
are fully decodable with struct + numpy alone, which makes the
``fake=False`` path of ``multimodal.columns`` real and testable:

- BMP: Windows bitmap, BITMAPINFOHEADER — BI_RGB 24/32-bit truecolor,
  8-bit palettized, and BI_RLE8 run-length compression (encoded runs,
  absolute mode with word alignment, end-of-line/bitmap and delta
  escapes). Format reference: the public BMP file format specification
  (BITMAPFILEHEADER + BITMAPINFOHEADER layouts). Tests pin RLE8 with an
  independent forward RLE encoder.
- WAV: RIFF/WAVE with a PCM ``fmt `` chunk, 8/16/32-bit integer samples.
  Parsed manually (not via the stdlib ``wave`` module) so tests can
  generate fixtures with ``wave`` as an INDEPENDENT implementation.
- PNG: 8-bit-depth images, both interlace methods (none/Adam7 —
  seven independently-filtered passes), every color type (gray,
  RGB, palette, gray+alpha, RGBA) and all five scanline filters
  (None/Sub/Up/Average/Paeth), inflated with stdlib ``zlib``. Format
  reference: the public PNG specification (RFC 2083 / W3C PNG, chunk
  layout + filter algorithms). Tests implement the FORWARD filter
  direction independently in numpy and hand-pack chunks, so the
  codec's unfilter path is pinned by a second implementation.

- JPEG: baseline sequential DCT (SOF0, 8-bit, Huffman), any sampling
  factors with nearest chroma upsampling, restart intervals — AND full
  progressive (SOF2): spectral selection, successive approximation
  (DC bit-plane + AC correction-bit refinement), EOB runs, tables/DRI
  redefined between scans. Format reference: the public JPEG
  specification (ITU-T T.81, Annex F + Annex G) + JFIF BT.601 color
  mapping. Tests implement the FORWARD pipelines (FDCT, quantize,
  baseline Huffman AND a progressive scan-splitting encoder)
  independently, pinning both inverse paths.

- GIF: full LZW decompression (variable code width, clear/end codes,
  12-bit cap with deferred clear), global and local color tables,
  4-pass interlacing — plus ANIMATION: decode_gif_frames composites
  full-canvas frames with graphic-control transparency, frame offsets,
  and all disposal methods (keep / restore-to-background /
  restore-to-previous). Format reference: the public GIF89a
  specification (incl. Appendix F). Tests pin it with an INDEPENDENT
  forward LZW compressor, a multi-frame encoder, and a scalar
  reference compositor written in the test file.

- FLAC: the full lossless decode path — CONSTANT/VERBATIM/FIXED/LPC
  subframes, Rice and Rice2 residual partitions with escape codes,
  wasted bits, all four stereo assignments (independent, left/side,
  right/side, mid/side), variable block sizes. Format reference: the
  public FLAC specification (xiph.org / RFC 9639). Tests pin it with
  an independent forward FLAC encoder written in the test file.

- TIFF: baseline 8-bit gray/RGB, chunky layout, both byte orders, any
  strip split, MinIsWhite inversion; compressions none/LZW (MSB-first
  early-change codes + horizontal-differencing predictor)/PackBits.
  Format reference: the public TIFF 6.0 specification (baseline Part 1
  + Sections 13/14). Tests hand-pack IFDs and pin the decoders with
  independent forward PackBits/LZW encoders.

- AIFF/AIFF-C: big-endian PCM 8/16/24/32-bit + the 'sowt'
  little-endian variant, 80-bit extended sample rates; compressed AIFC
  types raise. Sun AU: G.711 mu/A-law, linear 8/16/32, float 32/64.
  Format references: the public AIFF-1.3/AIFF-C and Sun/NeXT .au
  specifications. Tests pin both with the stdlib aifc/sunau modules as
  INDEPENDENT forward implementations.

- AVI: RIFF video container, both directions — motion-JPEG ('MJPG',
  one standalone baseline JPEG per frame) and uncompressed bottom-up
  BGR DIB (BI_RGB 24/32-bit) streams, '##dc'/'##db' chunk ids,
  LIST('rec ') grouping, word-aligned padding, hdrl geometry/fps.
  Format reference: the public AVI RIFF specification (Video for
  Windows header layouts). Tests pin the reader with a hand-packed
  container built independently of the writer.
- JPEG ENCODER: forward baseline pipeline (BT.601, optional 2x2
  chroma subsampling, FDCT, IJG quality scaling of the Annex K
  tables) with per-image OPTIMAL Huffman tables via the published
  T.81 Annex K.2 procedure — supplies MJPEG payloads and closes the
  encode half of the image seam.

Formats needing non-stdlib decoders (MP3/AAC/Vorbis/Opus, WebP, JPEG-in-TIFF,
arithmetic-coded JPEG, codec video — H.264/VP9/AV1) still raise
NotImplementedError — that seam is where PIL/ffmpeg would plug in on a
real cluster.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class MediaDecodeError(ValueError):
    """Malformed or unsupported media payload."""



def _decode_guard(fn):
    """Error contract for every image decoder: a malformed payload of
    the right container type raises MediaDecodeError — never a raw
    IndexError/struct.error/numpy ValueError from deep inside the
    parser. Corrupt bytes are normal in a 100 TB corpus; callers filter
    on ONE exception type (pinned by truncation fuzz in tests)."""
    import functools

    @functools.wraps(fn)
    def wrapped(payload, *args, **kwargs):
        try:
            return fn(payload, *args, **kwargs)
        except MediaDecodeError:
            raise
        except (IndexError, struct.error, ValueError, OverflowError) as e:
            raise MediaDecodeError(
                f"malformed payload in {fn.__name__}: {e}") from e
    return wrapped


# ---------------------------------------------------------------------------
# BMP


def _bmp_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 decompression into an (h, w) index raster, rows in
    STORED (bottom-up) order. Escapes per the public BMP spec: 0 = end
    of line, 1 = end of bitmap, 2 = delta move, n>=3 = absolute run
    (word-aligned); count>0 = repeat value count times."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:                            # encoded run
            if y >= h or x + cnt > w:
                raise MediaDecodeError("BMP RLE run out of bounds")
            out[y, x:x + cnt] = val
            x += cnt
        elif val == 0:                         # end of line
            x, y = 0, y + 1
        elif val == 1:                         # end of bitmap
            return out
        elif val == 2:                         # delta
            if i + 1 >= n:
                raise MediaDecodeError("truncated BMP RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                                  # absolute mode: val bytes
            if y >= h or x + val > w or i + val > n:
                raise MediaDecodeError("BMP RLE absolute run out of bounds")
            out[y, x:x + val] = np.frombuffer(data, np.uint8, val, i)
            x += val
            i += val + (val & 1)               # pad to word boundary
    return out


@_decode_guard
def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP to an (H, W, 3) uint8 RGB array: uncompressed
    24/32-bit truecolor, uncompressed 8-bit palettized, and RLE8-
    compressed 8-bit palettized (BI_RLE8, incl. end-of-line/bitmap and
    delta escapes). Handles bottom-up (positive height) and top-down
    (negative height) row order and 4-byte row padding.
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
    if width <= 0 or height == 0:
        raise MediaDecodeError(f"bad BMP dimensions {width}x{height}")
    _check_pixel_budget("BMP", width, abs(height))
    if bpp == 8 and compression in (0, 1):
        (clr_used,) = struct.unpack_from("<I", payload, 46)
        n_pal = clr_used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_pal > len(payload):
            raise MediaDecodeError("truncated BMP color table")
        pal = np.frombuffer(payload, np.uint8, 4 * n_pal,
                            pal_off).reshape(n_pal, 4)[:, 2::-1]  # BGRA->RGB
        bottom_up = height > 0
        h = abs(height)
        if compression == 1:                   # BI_RLE8
            if not bottom_up:
                raise MediaDecodeError("top-down RLE8 BMP is invalid")
            idx = _bmp_rle8(payload[pixel_off:], width, h)
        else:                                  # uncompressed palettized
            stride = (width + 3) & ~3
            if pixel_off + stride * h > len(payload):
                raise MediaDecodeError("truncated BMP pixel data")
            rows = np.frombuffer(payload, np.uint8, stride * h,
                                 pixel_off).reshape(h, stride)
            idx = rows[:, :width]
        if int(idx.max(initial=0)) >= n_pal:
            raise MediaDecodeError("BMP palette index out of range")
        img = pal[idx]
        return np.ascontiguousarray(img[::-1] if bottom_up else img)
    if compression != 0:
        raise MediaDecodeError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise MediaDecodeError(f"unsupported BMP bit depth {bpp}")
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

# Decoder-side pixel budget: header-declared dimensions beyond this are
# rejected with MediaDecodeError BEFORE any allocation, so a malicious
# 60000x60000 header over a 100-byte body cannot turn into a MemoryError
# that escapes the decode-error contract (~768 MB of RGB at the cap).
_MAX_PIXELS = 1 << 28


def _check_pixel_budget(fmt: str, w: int, h: int) -> None:
    if w * h > _MAX_PIXELS:
        raise MediaDecodeError(
            f"{fmt} dimensions {w}x{h} exceed the decoder pixel budget")

# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7_PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, at: int, w: int, h: int,
                  nch: int) -> tuple[np.ndarray, int]:
    """Reverse the five PNG scanline filters over one (sub-)image of
    ``h`` rows x ``w`` pixels starting at byte ``at``; returns the
    (h, w*nch) sample array and the new stream position. Each Adam7
    pass is filtered independently, so callers reset state per pass."""
    stride = w * nch
    if at + (stride + 1) * h > len(raw):
        raise MediaDecodeError("truncated PNG scanline data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = nch                                    # bytes per pixel at depth 8
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
    return out, at


@_decode_guard
def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to an (H, W, 3) uint8 RGB array.

    Supports all five color types (palette via PLTE; alpha channels are
    dropped, grayscale replicated to RGB — matching the codec contract
    ``decode_bmp`` set) and both interlace methods (none / Adam7 —
    seven independently-filtered sub-images placed back on the pass
    grid). Bit depths other than 8 raise MediaDecodeError.
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
    if interlace not in (0, 1):
        raise MediaDecodeError(f"bad PNG interlace method {interlace}")
    if depth != 8:
        raise MediaDecodeError(f"unsupported PNG bit depth {depth}")
    nch = _PNG_CHANNELS.get(color)
    if nch is None:
        raise MediaDecodeError(f"bad PNG color type {color}")
    if color == 3 and (plte is None or len(plte) % 3):
        raise MediaDecodeError("palette PNG missing/malformed PLTE")
    if w <= 0 or h <= 0:
        raise MediaDecodeError(f"bad PNG dimensions {w}x{h}")
    _check_pixel_budget("PNG", w, h)
    # geometry-derived expected byte count BEFORE inflating or
    # allocating — a header-declared 60000x60000 over a 10-byte body
    # must raise MediaDecodeError, not MemoryError, and a decompression
    # bomb must not inflate past the header's claim (bound + 1)
    passes = []
    if interlace == 0:
        expected = (w * nch + 1) * h
    else:
        expected = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            passes.append((x0, y0, dx, dy, pw, ph))
            expected += (pw * nch + 1) * ph
    try:
        raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise MediaDecodeError(f"bad PNG zlib stream: {e}") from e
    if len(raw) != expected:
        raise MediaDecodeError(
            f"PNG data size {len(raw)} != {expected}")
    if interlace == 0:
        img = _png_unfilter(raw, 0, w, h, nch)[0].reshape(h, w, nch)
    else:
        # Adam7: seven independently-filtered sub-images placed back on
        # the (dy, dx) grid; empty passes contribute no bytes
        img = np.zeros((h, w, nch), dtype=np.uint8)
        at = 0
        for x0, y0, dx, dy, pw, ph in passes:
            sub, at = _png_unfilter(raw, at, pw, ph, nch)
            img[y0::dy, x0::dx] = sub.reshape(ph, pw, nch)
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
# JPEG (baseline sequential DCT)

# zigzag scan order: index i of the scan -> position in the 8x8 block
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal 8-point DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_DCT_C = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                    * np.cos((2 * x + 1) * u * np.pi / 16.0)
                    for x in range(8)] for u in range(8)])


def _jpeg_huffman_table(bits: list[int], vals: bytes) -> dict:
    """Canonical JPEG Huffman table -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment, undoing the
    FF00 byte stuffing and stopping at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.cur = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise MediaDecodeError("JPEG entropy data truncated")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise MediaDecodeError("JPEG entropy data truncated")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1              # stuffed FF
            else:
                # a real marker inside entropy data (premature)
                raise MediaDecodeError(
                    f"unexpected marker FF{nxt:02X} in JPEG scan")
        return b

    def read_bit(self) -> int:
        if self.bit == 0:
            self.cur = self._next_byte()
            self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise MediaDecodeError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.bit = 0
        d = self.data
        if (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise MediaDecodeError("expected JPEG restart marker")


def _jpeg_extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _jpeg_read_dqt(seg: bytes, qt: dict) -> None:
    """Parse one DQT segment into the quant-table dict (shared by the
    baseline and progressive marker walks — T.81 B.2.4.1)."""
    at = 0
    while at < len(seg):
        pq, tq = seg[at] >> 4, seg[at] & 15
        if pq != 0:
            raise MediaDecodeError("16-bit JPEG quant tables unsupported")
        if len(seg) < at + 65:
            raise MediaDecodeError("truncated JPEG DQT segment")
        qt[tq] = np.frombuffer(seg, np.uint8, 64, at + 1).astype(np.int32)
        at += 65


def _jpeg_read_dht(seg: bytes, huff_dc: dict, huff_ac: dict) -> None:
    """Parse one DHT segment into the Huffman-table dicts (shared by the
    baseline and progressive marker walks — T.81 B.2.4.2)."""
    at = 0
    while at < len(seg):
        if len(seg) < at + 17:
            raise MediaDecodeError("truncated JPEG DHT segment")
        tc, th = seg[at] >> 4, seg[at] & 15
        bits = list(seg[at + 1:at + 17])
        n = sum(bits)
        vals = seg[at + 17:at + 17 + n]
        if len(vals) < n:
            raise MediaDecodeError("truncated JPEG DHT values")
        (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_huffman_table(bits, vals)
        at += 17 + n


@_decode_guard
def decode_jpeg(payload: bytes,
                color_transform: str = "auto") -> np.ndarray:
    """Decode a baseline sequential JPEG (SOF0, 8-bit, Huffman) to an
    (H, W, 3) uint8 RGB array. Supports 1- and 3-component images with
    arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 included; chroma
    upsampled nearest), restart intervals, and FF00 byte stuffing.
    Progressive (SOF2) decodes via the multi-scan coefficient
    accumulator below; arithmetic coding and 12-bit precision raise.

    ``color_transform``: "auto" treats a 3-component stream as JFIF
    YCbCr unless the stream itself declares RGB (an Adobe APP14
    segment with transform 0, or component IDs 'R','G','B'); "ycbcr" /
    "rgb" force the mapping — TIFF passes "rgb" for
    PhotometricInterpretation=2 JPEG strips, whose components are
    stored as RGB with no transform (TIFF Technical Note #2).

    Format reference: the public JPEG specification (ITU-T T.81 —
    marker layout, canonical Huffman construction, EXTEND, zigzag,
    Annex A IDCT) and the JFIF YCbCr <-> RGB (BT.601) mapping. The test
    suite implements the FORWARD pipeline (FDCT, quantization, Huffman
    encoding with the Annex K example tables) independently, so this
    inverse path is pinned by a second implementation.
    """
    if color_transform not in ("auto", "ycbcr", "rgb"):
        raise ValueError(f"unknown color_transform {color_transform!r}")
    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    adobe_transform = None
    pos = 2
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise MediaDecodeError(f"bad JPEG marker sync at {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue                       # parameterless
        (seglen,) = struct.unpack_from(">H", d, pos)
        seg = d[pos + 2:pos + seglen]
        if marker == 0xDB:                 # DQT
            _jpeg_read_dqt(seg, qt)
        elif marker == 0xC4:               # DHT
            _jpeg_read_dht(seg, huff_dc, huff_ac)
        elif marker in (0xC0, 0xC2):       # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise MediaDecodeError(f"unsupported JPEG precision {prec}")
            _check_pixel_budget("JPEG", max(w, 1), max(h, 1))
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                f"unsupported JPEG frame type FF{marker:02X} "
                "(only baseline SOF0 / progressive SOF2)")
        elif marker == 0xDD:               # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]      # APP14: 0 = no transform (RGB)
        elif marker == 0xDA:               # SOS -> entropy data follows
            ct = color_transform
            if ct == "auto":
                ids = [c["id"] for c in frame["comps"]] if frame else []
                ct = ("rgb" if adobe_transform == 0
                      or ids == [0x52, 0x47, 0x42] else "ycbcr")
            if frame is not None and frame.get("progressive"):
                return _jpeg_decode_progressive(
                    d, pos - 2, frame, qt, huff_dc, huff_ac,
                    restart_interval, ct)
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, td_ta = struct.unpack_from(">BB", seg, 1 + 2 * i)
                scan.append({"id": cs, "dc": td_ta >> 4, "ac": td_ta & 15})
            return _jpeg_decode_scan(d, pos + seglen, frame, scan, qt,
                                     huff_dc, huff_ac, restart_interval,
                                     ct)
        pos += seglen
    raise MediaDecodeError("JPEG missing SOS")


def _jpeg_decode_scan(d, pos, frame, scan, qt, huff_dc, huff_ac,
                      restart_interval, color_transform="ycbcr"):
    if frame is None:
        raise MediaDecodeError("JPEG SOS before SOF0")
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for sc in scan:
        if sc["id"] not in by_id:
            raise MediaDecodeError(f"JPEG scan references component {sc['id']}")
    if len(scan) != len(comps):
        raise MediaDecodeError("JPEG multi-scan images unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        planes[c["id"]] = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    reader = _JpegBitReader(d, pos)
    pred = {c["id"]: 0 for c in comps}
    coeffs = np.zeros(64, dtype=np.int32)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                pred = {c["id"]: 0 for c in comps}
            n_mcu += 1
            for sc in scan:
                c = by_id[sc["id"]]
                dc_tab = huff_dc.get(sc["dc"])
                ac_tab = huff_ac.get(sc["ac"])
                q = qt.get(c["tq"])
                if dc_tab is None or ac_tab is None or q is None:
                    raise MediaDecodeError("JPEG missing huff/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs[:] = 0
                        s = reader.decode_symbol(dc_tab)
                        diff = _jpeg_extend(reader.receive(s), s)
                        pred[c["id"]] += diff
                        coeffs[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, sz = rs >> 4, rs & 15
                            if rs == 0:
                                break              # EOB
                            if rs == 0xF0:
                                k += 16            # ZRL
                                continue
                            k += r
                            if k > 63:
                                raise MediaDecodeError("JPEG AC overrun")
                            coeffs[k] = _jpeg_extend(reader.receive(sz), sz)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coeffs * q
                        spatial = (_DCT_C.T @ block.reshape(8, 8)
                                   @ _DCT_C) + 128.0
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[c["id"]][py:py + 8, px:px + 8] = spatial
    return _jpeg_to_rgb(planes, comps, hmax, vmax, h, w, color_transform)


def _jpeg_to_rgb(planes, comps, hmax, vmax, h, w, color_transform="ycbcr"):
    """Shared output tail: chroma upsample + color mapping (JFIF BT.601
    for "ycbcr", direct stack for "rgb" streams — Adobe transform 0 /
    TIFF photometric 2)."""
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    if color_transform == "rgb":
        rgb = np.stack(out_planes, axis=2)
        return np.ascontiguousarray(np.clip(np.round(rgb), 0, 255
                                            ).astype(np.uint8))
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.ascontiguousarray(np.clip(np.round(rgb), 0, 255
                                        ).astype(np.uint8))


def _jpeg_decode_progressive(d, pos, frame, qt, huff_dc, huff_ac,
                             restart_interval, color_transform="ycbcr"):
    """Progressive JPEG (SOF2): decode every scan into per-component
    coefficient arrays, then dequantize + IDCT once at the end.

    Implements the full progressive feature set of T.81 Annex G.2:
    spectral selection (DC and AC band scans), successive approximation
    (DC bit-plane refinement via bitwise OR, AC refinement with
    correction bits), EOB runs — including correction-bit reads for
    blocks consumed inside an EOB run — interleaved and non-interleaved
    scan geometry, restart intervals, and tables redefined between
    scans. ``pos`` points at the first SOS marker."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # zigzag-order coefficient store over the full interleaved grid
    coef = {c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                              dtype=np.int32) for c in comps}
    while pos + 2 <= len(d):
        if d[pos] != 0xFF:
            raise MediaDecodeError(f"bad JPEG marker sync at {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:                 # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", d, pos)
        seg = d[pos + 2:pos + seglen]
        if marker == 0xC4:                 # DHT (tables may change per scan)
            _jpeg_read_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDB:
            _jpeg_read_dqt(seg, qt)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, td_ta = struct.unpack_from(">BB", seg, 1 + 2 * i)
                if cs not in by_id:
                    raise MediaDecodeError(
                        f"JPEG scan references component {cs}")
                scan.append({"id": cs, "dc": td_ta >> 4, "ac": td_ta & 15})
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            reader = _JpegBitReader(d, pos + seglen)
            _jpeg_progressive_sos(reader, frame, by_id, scan, ss, se,
                                  ahal >> 4, ahal & 15, coef,
                                  huff_dc, huff_ac, restart_interval,
                                  mcus_x, mcus_y, hmax, vmax)
            # skip trailing pad bits / fill bytes to the next marker
            pos = reader.pos
            while (pos + 1 < len(d)
                   and not (d[pos] == 0xFF and d[pos + 1] not in (0, 0xFF))):
                pos += 1
            continue
        pos += seglen
    # reconstruct: dequantize (zigzag), inverse zigzag, IDCT per block
    planes = {}
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise MediaDecodeError("JPEG missing quant table")
        cz = coef[c["id"]]                 # (by, bx, 64) zigzag
        nat = np.zeros_like(cz, dtype=np.float64)
        nat[..., _ZIGZAG] = cz * q
        by, bx = cz.shape[:2]
        blocks = nat.reshape(by, bx, 8, 8)
        spat = np.einsum("ab,yxbc,cd->yxad", _DCT_C.T, blocks,
                         _DCT_C) + 128.0
        planes[c["id"]] = spat.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return _jpeg_to_rgb(planes, comps, hmax, vmax, h, w, color_transform)


def _jpeg_progressive_sos(reader, frame, by_id, scan, ss, se, ah, al, coef,
                          huff_dc, huff_ac, restart_interval,
                          mcus_x, mcus_y, hmax, vmax):
    """Decode one progressive scan's entropy data into ``coef``."""
    h, w = frame["h"], frame["w"]
    if ss == 0:                            # ---- DC scan ----
        if se != 0:
            raise MediaDecodeError("JPEG DC scan with Se != 0")
        pred = {sc["id"]: 0 for sc in scan}
        if len(scan) > 1:                  # interleaved MCU walk
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    unit = []
                    for sc in scan:
                        c = by_id[sc["id"]]
                        for byy in range(c["v"]):
                            for bxx in range(c["h"]):
                                unit.append((sc, my * c["v"] + byy,
                                             mx * c["h"] + bxx))
                    units.append(unit)
        else:
            sc = scan[0]
            c = by_id[sc["id"]]
            cw = -(-w * c["h"] // hmax)       # component sample dims
            ch_ = -(-h * c["v"] // vmax)
            nbx, nby = -(-cw // 8), -(-ch_ // 8)
            units = [[(sc, yy, xx)] for yy in range(nby)
                     for xx in range(nbx)]
        for i, unit in enumerate(units):
            if restart_interval and i and i % restart_interval == 0:
                reader.restart()
                pred = {s["id"]: 0 for s in scan}
            for sc, yy, xx in unit:
                cf = coef[sc["id"]]
                if ah == 0:                # first DC pass
                    tab = huff_dc.get(sc["dc"])
                    if tab is None:
                        raise MediaDecodeError("JPEG missing DC table")
                    s = reader.decode_symbol(tab)
                    pred[sc["id"]] += _jpeg_extend(reader.receive(s), s)
                    cf[yy, xx, 0] = pred[sc["id"]] << al
                else:                      # bit-plane refinement
                    if reader.read_bit():
                        cf[yy, xx, 0] |= 1 << al
        return
    # ---- AC scan: exactly one component, non-interleaved geometry ----
    if len(scan) != 1:
        raise MediaDecodeError("JPEG AC progressive scan must have ns=1")
    sc = scan[0]
    c = by_id[sc["id"]]
    tab = huff_ac.get(sc["ac"])
    if tab is None:
        raise MediaDecodeError("JPEG missing AC table")
    cw = -(-w * c["h"] // hmax)               # component sample dims
    ch_ = -(-h * c["v"] // vmax)
    nbx, nby = -(-cw // 8), -(-ch_ // 8)
    cz = coef[sc["id"]]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    n_blk = 0
    for yy in range(nby):
        for xx in range(nbx):
            if restart_interval and n_blk and n_blk % restart_interval == 0:
                reader.restart()
                eobrun = 0
            n_blk += 1
            cf = cz[yy, xx]
            if ah == 0:                    # ---- AC first pass ----
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_symbol(tab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:         # EOBn
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += 16            # ZRL
                        continue
                    k += r
                    if k > se:
                        raise MediaDecodeError("JPEG AC band overrun")
                    cf[k] = _jpeg_extend(reader.receive(s), s) << al
                    k += 1
                continue
            # ---- AC refinement pass (T.81 G.2, incl. EOB-run reads) ----
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode_symbol(tab)
                    r, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if r < 15:         # EOBn: run INCLUDES this block
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # r == 15: ZRL — skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise MediaDecodeError(
                                "JPEG refinement size != 1")
                        val = p1 if reader.read_bit() else m1
                    while k <= se:         # advance, correcting history
                        if cf[k] != 0:
                            if reader.read_bit() and not (cf[k] & p1):
                                cf[k] += p1 if cf[k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        cf[k] = val
                    k += 1
            if eobrun > 0:
                # inside an EOB run: nonzero-history coefficients in the
                # remainder of the band still receive correction bits
                while k <= se:
                    if cf[k] != 0:
                        if reader.read_bit() and not (cf[k] & p1):
                            cf[k] += p1 if cf[k] > 0 else m1
                    k += 1
                eobrun -= 1


# ---------------------------------------------------------------------------
# JPEG encoder (forward baseline path)

# Annex K.1 / K.2 example quantization tables (ITU-T T.81) — the public
# starting point every encoder scales by its quality knob.
_JPEG_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_JPEG_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)


def _jpeg_quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-convention quality scaling of the Annex K tables (1-100)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q

    def s(tab):
        return np.clip(np.floor((tab * scale + 50.0) / 100.0),
                       1, 255).astype(np.int32)

    return s(_JPEG_QL), s(_JPEG_QC)


def _jpeg_code_lengths(freq256: np.ndarray) -> tuple[np.ndarray, list[int]]:
    """Optimal Huffman code lengths for one JPEG table, per the published
    T.81 Annex K.2 procedure (Code_size / Count_BITS / Adjust_BITS):
    repeated least-frequency merges tracked through an OTHERS chain, a
    reserved 257th symbol guaranteeing the all-ones code stays unused,
    and the >16-bit fold-down. Returns (BITS[1..16] histogram, symbols
    in DHT order)."""
    freq = np.zeros(257, dtype=np.int64)
    freq[:256] = freq256
    freq[256] = 1                          # reserved: keeps all-1s unused
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)
    while True:
        nz = np.nonzero(freq)[0]
        if len(nz) <= 1:
            break
        # v1 = least FREQ (largest index on ties); v2 = next least
        order = nz[np.lexsort((-nz, freq[nz]))]
        v1, v2 = int(order[0]), int(order[1])
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    bits = np.zeros(60, dtype=np.int64)    # depth < 57 for 257 leaves
    for s in codesize[codesize > 0]:
        bits[int(s)] += 1
    i = len(bits) - 1                      # Adjust_BITS: fold >16 down
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16                                 # drop the reserved symbol's code
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    syms = sorted((s for s in range(256) if codesize[s] > 0),
                  key=lambda s: (codesize[s], s))
    return bits[1:17], syms


def _jpeg_canonical_codes(bits16: np.ndarray,
                          syms: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Figure C.2): {sym: (len, code)}."""
    lengths: list[int] = []
    for ln in range(1, 17):
        lengths.extend([ln] * int(bits16[ln - 1]))
    table: dict[int, tuple[int, int]] = {}
    code, last = 0, lengths[0] if lengths else 0
    for sym, ln in zip(syms, lengths):
        code <<= ln - last
        table[sym] = (ln, code)
        code += 1
        last = ln
    return table


class _JpegBitWriter:
    """MSB-first bit packer with FF00 byte stuffing and 1-padding."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits) for a DC difference / AC coefficient."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _jpeg_plane_zigzag(plane: np.ndarray, q: np.ndarray,
                       mcus_y: int, mcus_x: int,
                       hh: int, vv: int) -> np.ndarray:
    """FDCT + quantize + zigzag one component plane padded to the MCU
    grid. Returns (blocks_y, blocks_x, 64) int32 in zigzag order."""
    ph, pw = mcus_y * vv * 8, mcus_x * hh * 8
    p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
               mode="edge")
    blocks = (p.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3).astype(np.float64) - 128.0)
    coef = np.einsum("ux,byxz,vz->byuv", _DCT_C, blocks, _DCT_C,
                     optimize=True)
    quant = np.round(coef / q).astype(np.int32)
    return quant.reshape(ph // 8, pw // 8, 64)[..., _ZIGZAG]


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 RGB or (H, W) grayscale array as a
    baseline sequential JPEG (SOF0, 8-bit, Huffman).

    The forward pipeline follows the public specification end to end:
    JFIF BT.601 color transform, optional 2x2 chroma subsampling
    (averaged), edge-padded MCU tiling, orthonormal FDCT, IJG-style
    quality scaling of the Annex K example quantization tables, and
    per-image OPTIMAL Huffman tables generated with the published T.81
    Annex K.2 procedure (so the emitted DHT segments are tuned to the
    actual symbol distribution, not the example tables). Decodable by
    ``decode_jpeg`` above and by any standards-compliant reader; this
    closes the encode half of the image seam and supplies the MJPEG
    payloads for the AVI container codec below.

    Reference analogue: none — the reference engine carries no media
    (nearest is opaque content fetch, src/attribute_data_type.h:71);
    beyond-reference operator per SURVEY.md §2.10.
    """
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_jpeg expects a uint8 array")
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W, 3) RGB or (H, W) gray")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    ql, qc = _jpeg_quality_tables(quality)
    qtabs = [ql.reshape(8, 8)] if gray else [ql.reshape(8, 8),
                                             qc.reshape(8, 8)]

    if gray:
        comp_hv = [(1, 1)]
        planes = [a.astype(np.float64)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            he, we = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            cr = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = cb.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            comp_hv = [(2, 2), (1, 1), (1, 1)]
        else:
            comp_hv = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(hh for hh, _ in comp_hv)
    vmax = max(vv for _, vv in comp_hv)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    zz = [_jpeg_plane_zigzag(p, qtabs[min(ci, 1)], mcus_y, mcus_x, hh, vv)
          for ci, (p, (hh, vv)) in enumerate(zip(planes, comp_hv))]

    # MCU-interleaved unit order: (comp, block_y, block_x)
    units: list[tuple[int, int, int]] = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hh, vv) in enumerate(comp_hv):
                for by in range(vv):
                    for bx in range(hh):
                        units.append((ci, my * vv + by, mx * hh + bx))

    ntab = 1 if gray else 2
    dc_freq = [np.zeros(256, dtype=np.int64) for _ in range(ntab)]
    ac_freq = [np.zeros(256, dtype=np.int64) for _ in range(ntab)]
    pred = [0] * len(comp_hv)
    for ci, by, bx in units:                # pass 1: symbol frequencies
        t = min(ci, 1)
        u = zz[ci][by, bx]
        s, _ = _jpeg_magnitude(int(u[0]) - pred[ci])
        pred[ci] = int(u[0])
        dc_freq[t][s] += 1
        run = 0
        for k in range(1, 64):
            v = int(u[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_freq[t][0xF0] += 1
                run -= 16
            s, _ = _jpeg_magnitude(v)
            ac_freq[t][(run << 4) | s] += 1
            run = 0
        if run:
            ac_freq[t][0x00] += 1

    dc_tabs, ac_tabs, dht = [], [], []
    for t in range(ntab):
        for kind, freqs, tabs in (("dc", dc_freq, dc_tabs),
                                  ("ac", ac_freq, ac_tabs)):
            f = freqs[t]
            if f.sum() == 0:
                f = f.copy()
                f[0] = 1
            bits16, syms = _jpeg_code_lengths(f)
            tabs.append(_jpeg_canonical_codes(bits16, syms))
            cls = 0x00 if kind == "dc" else 0x10
            dht.append(bytes([cls | t])
                       + bytes(int(x) for x in bits16) + bytes(syms))

    bw = _JpegBitWriter()
    pred = [0] * len(comp_hv)
    for ci, by, bx in units:                # pass 2: emit
        t = min(ci, 1)
        u = zz[ci][by, bx]
        s, extra = _jpeg_magnitude(int(u[0]) - pred[ci])
        pred[ci] = int(u[0])
        ln, c = dc_tabs[t][s]
        bw.put(c, ln)
        bw.put(extra, s)
        run = 0
        for k in range(1, 64):
            v = int(u[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, c = ac_tabs[t][0xF0]
                bw.put(c, ln)
                run -= 16
            s, extra = _jpeg_magnitude(v)
            ln, c = ac_tabs[t][(run << 4) | s]
            bw.put(c, ln)
            bw.put(extra, s)
            run = 0
        if run:
            ln, c = ac_tabs[t][0x00]
            bw.put(c, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for t, q in enumerate(qtabs):
        out += seg(0xDB, bytes([t]) + bytes(
            q.reshape(64)[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (hh, vv) in enumerate(comp_hv):
        sof += bytes([ci + 1, (hh << 4) | vv, min(ci, 1)])
    out += seg(0xC0, sof)
    for d in dht:
        out += seg(0xC4, d)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# GIF

def _gif_lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first variable-width codes starting at
    min_code_size+1 bits, clear/end control codes, 12-bit table cap with
    deferred clear. Returns the palette-index stream (uint8, clipped to
    ``npix``). Format reference: the public GIF89a specification,
    Appendix F (LZW compression)."""
    clear = 1 << min_code_size
    end = clear + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < npix:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(roots)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise MediaDecodeError("LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise MediaDecodeError("LZW: code out of range")
        out += entry
        prev = entry
        # widen when the next code could reference the next table slot
        # (stop at the 12-bit cap: the encoder must emit clear to grow)
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < npix:
        raise MediaDecodeError(
            f"LZW: stream ended at {len(out)} of {npix} pixels")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_header(payload: bytes):
    """(width, height, global color table | None, background index, pos)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaDecodeError("not a GIF payload")
    if len(payload) < 13:
        raise MediaDecodeError("truncated GIF header")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    bg = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(payload):
            raise MediaDecodeError("truncated global color table")
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    return w, h, gct, bg, pos


def _gif_image_at(payload: bytes, pos: int, gct):
    """Parse one image descriptor (payload[pos] == 0x2C): returns
    (index raster (ih, iw), palette, left, top, next pos) with LZW
    decode and interlace reordering applied."""
    if pos + 10 > len(payload):
        raise MediaDecodeError("truncated image descriptor")
    left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
    ipacked = payload[pos + 9]
    pos += 10
    pal = gct
    if ipacked & 0x80:                         # local color table wins
        n = 2 << (ipacked & 7)
        if pos + 3 * n > len(payload):
            raise MediaDecodeError("truncated local color table")
        pal = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    if pal is None:
        raise MediaDecodeError("GIF image has no color table")
    if iw == 0 or ih == 0:
        raise MediaDecodeError(f"bad GIF frame size {iw}x{ih}")
    _check_pixel_budget("GIF", iw, ih)
    min_code_size = payload[pos]
    pos += 1
    if not 2 <= min_code_size <= 11:
        raise MediaDecodeError(f"bad LZW min code size {min_code_size}")
    data = bytearray()
    while pos < len(payload) and payload[pos]:
        cnt = payload[pos]
        data += payload[pos + 1:pos + 1 + cnt]
        pos += cnt + 1
    pos += 1                                   # block terminator
    idx = _gif_lzw_decode(bytes(data), min_code_size, iw * ih)
    if idx.max(initial=0) >= len(pal):
        raise MediaDecodeError("GIF pixel index outside palette")
    rows = idx.reshape(ih, iw)
    if ipacked & 0x40:                         # interlaced: reorder rows
        order = [r for start, step in _GIF_INTERLACE_PASSES
                 for r in range(start, ih, step)]
        deinter = np.empty_like(rows)
        deinter[order] = rows
        rows = deinter
    return rows, pal, left, top, pos


@_decode_guard
def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/GIF89a to (H, W, 3) uint8 RGB.

    Full LZW decompression, global and local color tables, and Adam-style
    4-pass row interlacing. Extension blocks (graphic control, comments,
    application) are skipped; animation frames beyond the first are not
    decoded — feature extraction wants one representative raster, the
    same contract as ``decode_jpeg`` (use ``decode_gif_frames`` for the
    composited animation). The frame's own geometry is returned (GIF
    frames may be smaller than the logical screen).
    Format reference: the public GIF89a specification."""
    _, _, gct, _, pos = _gif_header(payload)
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:                      # extension: label + subblocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:                    # image descriptor
            rows, pal, _, _, _ = _gif_image_at(payload, pos, gct)
            return np.ascontiguousarray(pal[rows])
        elif block == 0x3B:                    # trailer
            break
        else:
            raise MediaDecodeError(f"unknown GIF block 0x{block:02x}")
    raise MediaDecodeError("GIF contains no image data")


@_decode_guard
def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """Decode an animated GIF into COMPOSITED full-canvas frames:
    ``(frames, delays)`` where frames are (H, W, 3) uint8 RGB over the
    logical screen and delays are per-frame seconds (graphic-control
    delay in centiseconds; 0 when unspecified).

    Implements the GIF89a animation model: graphic control extensions
    (transparent index — transparent pixels leave the canvas
    unchanged), frame offsets smaller than the screen, and all disposal
    methods (keep, restore-to-background, restore-to-previous). The
    canvas starts at the background color (black when the background
    index has no table entry). Format reference: the public GIF89a
    specification (and its widely-documented animation semantics).

    Memory bound: the SAME pixel budget that guards a single image
    applies to the CUMULATIVE frames-x-canvas allocation — a tiny
    payload declaring a huge screen plus many one-pixel frames would
    otherwise amplify into hundreds of full-canvas copies; the decode
    raises MediaDecodeError (the documented decode-bomb contract)
    before the allocation that would cross the budget."""
    w, h, gct, bg, pos = _gif_header(payload)
    _check_pixel_budget("GIF", w, h)
    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, dtype=np.uint8))
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).astype(np.uint8).copy()
    frames: list[np.ndarray] = []
    delays: list[float] = []
    disposal, tindex, delay_cs = 0, None, 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:
            label = payload[pos + 1] if pos + 1 < len(payload) else 0
            pos += 2
            if label == 0xF9 and pos < len(payload) and payload[pos] >= 4:
                gpacked = payload[pos + 1]
                (delay_cs,) = struct.unpack_from("<H", payload, pos + 2)
                disposal = (gpacked >> 2) & 7
                tindex = payload[pos + 4] if gpacked & 1 else None
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:
            if (len(frames) + 1) * w * h > _MAX_PIXELS:
                raise MediaDecodeError(
                    f"GIF animation exceeds the pixel budget: "
                    f"{len(frames) + 1} frames x {w}x{h} canvas")
            rows, pal, left, top, pos = _gif_image_at(payload, pos, gct)
            ih, iw = rows.shape
            if left + iw > w or top + ih > h:
                raise MediaDecodeError("GIF frame exceeds logical screen")
            region = canvas[top:top + ih, left:left + iw]
            before = region.copy() if disposal == 3 else None
            rgb = pal[rows]
            if tindex is not None:
                mask = rows != tindex
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            delays.append(delay_cs / 100.0)
            if disposal == 2:                  # restore to background
                region[:] = bg_rgb
            elif disposal == 3 and before is not None:
                region[:] = before
            disposal, tindex, delay_cs = 0, None, 0
            if max_frames is not None and len(frames) >= max_frames:
                break
        elif block == 0x3B:
            break
        else:
            raise MediaDecodeError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise MediaDecodeError("GIF contains no image data")
    return frames, delays


# ---------------------------------------------------------------------------
# TIFF (baseline: uncompressed, PackBits, LZW)

def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773): control byte n in
    0..127 copies n+1 literals, 129..255 repeats the next byte 257-n
    times, 128 is a no-op. Packets never span rows, so a strip decodes
    as one continuous stream."""
    out = bytearray()
    i = 0
    n_data = len(data)
    while i < n_data and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= n_data:
                break
            out += data[i:i + 1] * (257 - n)
            i += 1
    if len(out) < expected:
        raise MediaDecodeError(
            f"PackBits strip ended at {len(out)} of {expected} bytes")
    return bytes(out[:expected])


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (compression 5): fixed 256-symbol alphabet
    (clear=256, EOI=257), MSB-first bit packing, and the spec's
    EARLY-CHANGE width growth — the code width bumps when the next free
    code reaches 2^w - 1, one code earlier than GIF's LZW. Format
    reference: TIFF 6.0 specification, Section 13."""
    CLEAR, EOI = 256, 257
    roots = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(roots)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits and len(out) < expected:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 3].ljust(3, b"\0"),
                               "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == CLEAR:
            table = list(roots)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise MediaDecodeError("TIFF LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise MediaDecodeError("TIFF LZW: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:   # early change
            width += 1
    if len(out) < expected:
        raise MediaDecodeError(
            f"TIFF LZW strip ended at {len(out)} of {expected} bytes")
    return bytes(out[:expected])


def _tiff_read_values(p: bytes, bo: str, typ: int, cnt: int,
                      inline_off: int) -> list[int]:
    """SHORT/LONG value arrays: <=4 inline bytes hold the values
    directly, larger arrays live at the LONG offset in the value slot.
    Any other field type for these tags (BYTE, RATIONAL, ...) is
    rejected rather than mis-parsed as LONG."""
    if typ not in (3, 4):
        raise MediaDecodeError(f"unsupported TIFF value type {typ}")
    size = 2 if typ == 3 else 4
    fmt = "H" if typ == 3 else "I"
    if size * cnt <= 4:
        off = inline_off
    else:
        (off,) = struct.unpack_from(bo + "I", p, inline_off)
    if off + size * cnt > len(p):
        raise MediaDecodeError("TIFF value array out of bounds")
    return list(struct.unpack_from(bo + fmt * cnt, p, off))


def _tiff_read_raw(p: bytes, bo: str, typ: int, cnt: int,
                   inline_off: int) -> bytes:
    """BYTE/UNDEFINED tag payloads (e.g. JPEGTables): <=4 bytes inline,
    larger blocks at the LONG offset in the value slot."""
    if typ not in (1, 7):
        raise MediaDecodeError(f"unsupported TIFF byte-tag type {typ}")
    if cnt <= 4:
        off = inline_off
    else:
        (off,) = struct.unpack_from(bo + "I", p, inline_off)
    if off + cnt > len(p):
        raise MediaDecodeError("TIFF byte tag out of bounds")
    return p[off:off + cnt]


def _tiff_decode_jpeg_strips(payload: bytes, bo: str, tags: dict,
                             width: int, height: int,
                             offsets: list[int], counts: list[int],
                             rows_per_strip: int,
                             photometric: int) -> np.ndarray:
    """TIFF compression 7 — "new-style" JPEG-in-TIFF (TIFF Technical
    Note #2): every strip is a self-contained JPEG interchange stream;
    the optional JPEGTables tag (347) carries an abbreviated
    tables-only stream (SOI <DQT/DHT...> EOI) whose segments inject
    after each strip's SOI before decoding. Strips decode through the
    in-repo baseline/progressive JPEG decoder and stack vertically.
    PhotometricInterpretation picks the color mapping:
    6 (YCbCr) and 1 (gray) use the decoder's JFIF output;
    2 (RGB stored directly in the JPEG stream, valid per TechNote 2)
    decodes with ``color_transform="rgb"`` — NO BT.601 step, the three
    components already are R,G,B; MinIsWhite (0) inverts afterwards
    like the baseline path."""
    tables_body = b""
    if 347 in tags:
        typ, cnt, voff = tags[347]
        raw = _tiff_read_raw(payload, bo, typ, cnt, voff)
        if len(raw) >= 4 and raw[:2] == b"\xff\xd8" \
                and raw[-2:] == b"\xff\xd9":
            tables_body = raw[2:-2]
        elif raw:
            raise MediaDecodeError(
                "bad TIFF JPEGTables stream (want SOI ... EOI)")
    parts: list[np.ndarray] = []
    rows_done = 0
    for o, c in zip(offsets, counts):
        if o + c > len(payload):
            raise MediaDecodeError("TIFF strip out of bounds")
        strip = payload[o:o + c]
        if strip[:2] != b"\xff\xd8":
            raise MediaDecodeError("TIFF JPEG strip missing SOI")
        if tables_body:
            strip = b"\xff\xd8" + tables_body + strip[2:]
        arr = decode_jpeg(strip,
                          color_transform="rgb" if photometric == 2
                          else "auto")
        strip_rows = min(rows_per_strip, height - rows_done)
        if arr.shape[0] < strip_rows or arr.shape[1] < width:
            raise MediaDecodeError(
                f"TIFF JPEG strip {arr.shape[:2]} smaller than layout "
                f"({strip_rows}, {width})")
        parts.append(arr[:strip_rows, :width])
        rows_done += strip_rows
        if rows_done >= height:
            break
    if rows_done < height:
        raise MediaDecodeError(
            f"truncated TIFF JPEG data: {rows_done} < {height} rows")
    img = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    if photometric == 0:
        img = 255 - img
    return np.ascontiguousarray(img)


@_decode_guard
def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a baseline 8-bit TIFF (gray or RGB, chunky planar layout,
    any strip split) to (H, W, 3) uint8 RGB — grayscale replicated,
    alpha/extra samples dropped, MinIsWhite inverted. Compressions:
    none (1), LZW (5, incl. the horizontal-differencing predictor),
    PackBits (32773), and new-style JPEG (7, per-strip interchange
    streams + the shared JPEGTables tag, decoded by the in-repo T.81
    decoder). Old-style JPEG (6) and exotic schemes raise — that
    remains the PIL seam. Format reference: the public TIFF 6.0
    specification (baseline Part 1 + Sections 13/14) and TIFF
    Technical Note #2 for compression 7."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise MediaDecodeError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", payload, 2)
    if magic != 42:
        raise MediaDecodeError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise MediaDecodeError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        if off + 12 > len(payload):
            raise MediaDecodeError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, off)
        tags[tag] = (typ, cnt, off + 8)

    def scalar(tag: int, default: int | None = None) -> int | None:
        if tag not in tags:
            return default
        typ, cnt, voff = tags[tag]
        return _tiff_read_values(payload, bo, typ, cnt, voff)[0]

    width, height = scalar(256), scalar(257)
    if not width or not height:
        raise MediaDecodeError("TIFF missing dimensions")
    compression = scalar(259, 1)
    if compression not in (1, 5, 6, 7, 32773):
        raise MediaDecodeError(
            f"unsupported TIFF compression {compression} (baseline "
            "none/LZW/PackBits + JPEG-in-TIFF; exotic schemes are the "
            "PIL seam)")
    predictor = scalar(317, 1)
    if predictor not in (1, 2):
        raise MediaDecodeError(f"unsupported TIFF predictor {predictor}")
    photometric = scalar(262, 1)
    spp = scalar(277, 1)
    if not 1 <= spp <= 8:
        raise MediaDecodeError(f"bad TIFF samples-per-pixel {spp}")
    # budget the full sample count (after spp is known): a compressed
    # strip can expand a tiny payload to width*height*spp bytes
    _check_pixel_budget("TIFF", width * spp, height)
    if 258 in tags:
        typ, cnt, voff = tags[258]
        depths = _tiff_read_values(payload, bo, typ, cnt, voff)
        if any(d != 8 for d in depths):
            raise MediaDecodeError(f"unsupported TIFF bit depths {depths}")
    if 284 in tags and scalar(284) != 1:
        raise MediaDecodeError("unsupported TIFF planar configuration")
    if compression == 6:
        # old-style JPEG-in-TIFF (TIFF 6.0 Section 22, withdrawn by
        # TechNote 2): the COMMON form stores one complete interchange
        # stream at JPEGInterchangeFormat (513) [+ length (514)] —
        # decodable by the in-repo T.81 decoder directly. The
        # tables-split variant (per-strip entropy data with JPEGProc/
        # JPEGQTables/JPEGDCTables/JPEGACTables pointers, tags
        # 512/519-521, no interchange stream) stays the documented PIL
        # seam: the spec is ambiguous enough that TechNote 2 withdrew
        # it, and real files are vanishingly rare.
        if 513 not in tags:
            raise MediaDecodeError(
                "old-style TIFF JPEG (compression 6) without a "
                "JPEGInterchangeFormat stream: the tables-split "
                "variant is the PIL seam (decode_fn)")
        jo = scalar(513)
        if jo is None or not 0 <= jo < len(payload):
            raise MediaDecodeError(
                "bad TIFF JPEGInterchangeFormat offset")
        jl = scalar(514, len(payload) - jo)
        stream = payload[jo:jo + max(jl, 0)]
        if stream[:2] != b"\xff\xd8":
            raise MediaDecodeError(
                "TIFF JPEGInterchangeFormat stream missing SOI")
        arr = decode_jpeg(stream, color_transform="rgb"
                          if photometric == 2 else "auto")
        if arr.shape[0] < height or arr.shape[1] < width:
            raise MediaDecodeError(
                f"TIFF old-style JPEG {arr.shape[:2]} smaller than "
                f"layout ({height}, {width})")
        img = arr[:height, :width]
        if photometric == 0:
            img = 255 - img
        return np.ascontiguousarray(img)
    if 273 not in tags or 279 not in tags:
        raise MediaDecodeError("TIFF missing strip layout")
    typ, cnt, voff = tags[273]
    offsets = _tiff_read_values(payload, bo, typ, cnt, voff)
    typ, cnt, voff = tags[279]
    counts = _tiff_read_values(payload, bo, typ, cnt, voff)
    if len(offsets) != len(counts):
        raise MediaDecodeError("TIFF strip offset/count mismatch")
    rows_per_strip = scalar(278, height)
    if compression == 7:  # predictor applies to LZW/deflate only
        return _tiff_decode_jpeg_strips(payload, bo, tags, width, height,
                                        offsets, counts, rows_per_strip,
                                        photometric)
    need = width * height * spp
    buf = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(payload):
            raise MediaDecodeError("TIFF strip out of bounds")
        raw = payload[o:o + c]
        strip_rows = min(rows_per_strip, height - si * rows_per_strip)
        strip_need = max(0, strip_rows) * width * spp
        if compression == 5:
            raw = _tiff_lzw_decode(raw, strip_need)
        elif compression == 32773:
            raw = _packbits_decode(raw, strip_need)
        buf += raw
        if len(buf) >= need:
            break
    if len(buf) < need:
        raise MediaDecodeError(
            f"truncated TIFF pixel data: {len(buf)} < {need}")
    img = np.frombuffer(bytes(buf[:need]), dtype=np.uint8).reshape(
        height, width, spp)
    if predictor == 2:
        # horizontal differencing: each sample stores the delta to the
        # previous pixel's same channel — a uint8 cumsum wraps mod 256
        # natively (no 8x int64 temporary on a budget-sized image)
        img = np.cumsum(img, axis=1, dtype=np.uint8)
    if photometric == 0:                       # MinIsWhite: invert
        img = 255 - img
    if spp == 1:
        return np.ascontiguousarray(np.repeat(img, 3, axis=2))
    if spp == 2:                               # gray + alpha
        return np.ascontiguousarray(np.repeat(img[:, :, :1], 3, axis=2))
    return np.ascontiguousarray(img[:, :, :3])


# ---------------------------------------------------------------------------
# FLAC (free lossless audio codec — public xiph.org specification)

class _FlacBitReader:
    """MSB-first bit reader (no byte stuffing, unlike JPEG's)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def bits(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise MediaDecodeError("FLAC bitstream truncated")
        v = 0
        bp = self.bitpos
        d = self.data
        while n:
            byte_i, off = bp >> 3, bp & 7
            take = min(8 - off, n)
            chunk = (d[byte_i] >> (8 - off - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            bp += take
            n -= take
        self.bitpos = bp
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        while self.bits(1) == 0:
            n += 1
            if n > 1 << 20:
                raise MediaDecodeError("FLAC runaway unary code")
        return n

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
# frame-header sample-rate codes are skipped (explicit 8/16-bit forms
# consumed, table forms ignored): the STREAMINFO rate governs output
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _flac_utf8_number(br: _FlacBitReader) -> int:
    lead = br.bits(8)
    if lead < 0x80:
        return lead
    n = 0
    while (lead << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise MediaDecodeError("bad FLAC UTF-8 coded number")
    v = lead & (0x7F >> n)
    for _ in range(n - 1):
        c = br.bits(8)
        if c >> 6 != 0b10:
            raise MediaDecodeError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _flac_residual(br: _FlacBitReader, blocksize: int, order: int):
    """Rice-coded residual: 2-bit method, partition order, per-partition
    parameter (escape -> raw n-bit samples), zigzag-mapped values."""
    method = br.bits(2)
    if method > 1:
        raise MediaDecodeError(f"bad FLAC residual method {method}")
    plen = 4 + method                        # rice / rice2 parameter width
    escape = (1 << plen) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    if blocksize % nparts != 0:
        raise MediaDecodeError("FLAC blocksize not divisible by partitions")
    if porder > 0 and (blocksize >> porder) <= order:
        raise MediaDecodeError("bad FLAC partition order")
    out = np.empty(blocksize - order, dtype=np.int64)
    at = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise MediaDecodeError("bad FLAC partition layout")
        param = br.bits(plen)
        if param == escape:
            raw = br.bits(5)
            for i in range(n):
                out[at + i] = br.sbits(raw) if raw else 0
        else:
            for i in range(n):
                q = br.unary()
                v = (q << param) | br.bits(param)
                out[at + i] = (v >> 1) ^ -(v & 1)     # zigzag
        at += n
    return out


_FLAC_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _flac_subframe(br: _FlacBitReader, blocksize: int, bps: int):
    if br.bits(1):
        raise MediaDecodeError("bad FLAC subframe sync bit")
    stype = br.bits(6)
    wasted = 0
    if br.bits(1):                            # wasted-bits flag
        wasted = br.unary() + 1
        bps -= wasted
    if stype == 0:                            # CONSTANT
        out = np.full(blocksize, br.sbits(bps), dtype=np.int64)
    elif stype == 1:                          # VERBATIM
        out = np.array([br.sbits(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= stype <= 12:                    # FIXED order 0-4
        order = stype - 8
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(order):
            out[i] = br.sbits(bps)
        res = _flac_residual(br, blocksize, order)
        co = _FLAC_FIXED[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(co):
                pred += c * int(out[i - 1 - j])
            out[i] = res[i - order] + pred
    elif stype >= 32:                         # LPC order 1-32
        order = stype - 31
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(order):
            out[i] = br.sbits(bps)
        prec = br.bits(4)
        if prec == 15:
            raise MediaDecodeError("invalid FLAC LPC precision")
        prec += 1
        shift = br.sbits(5)
        if shift < 0:
            raise MediaDecodeError("negative FLAC LPC shift")
        coefs = [br.sbits(prec) for _ in range(order)]
        res = _flac_residual(br, blocksize, order)
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * int(out[i - 1 - j])
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise MediaDecodeError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


@_decode_guard
def decode_flac(payload: bytes):
    """Decode a native FLAC stream to ``(samples, rate, channels)`` —
    float32 in [-1, 1], shape (n_frames, channels), same contract as
    ``decode_wav``. Full feature set: CONSTANT/VERBATIM/FIXED/LPC
    subframes, Rice and Rice2 residual partitions incl. escape codes,
    wasted bits, all four channel assignments (independent, left/side,
    right/side, mid/side), variable block sizes and UTF-8 frame
    numbers. CRCs are not verified (corpus filtering wants samples, not
    integrity proofs). Format reference: the public FLAC specification
    (xiph.org / RFC 9639)."""
    if payload[:4] != b"fLaC":
        raise MediaDecodeError("not a FLAC payload")
    pos = 4
    info = None
    while pos + 4 <= len(payload):            # metadata blocks
        hdr = payload[pos]
        (length,) = struct.unpack(">I", b"\0" + payload[pos + 1:pos + 4])
        if hdr & 0x7F == 0:                   # STREAMINFO
            si = payload[pos + 4:pos + 4 + length]
            if len(si) < 18:
                raise MediaDecodeError("truncated FLAC STREAMINFO")
            br = _FlacBitReader(si)
            br.bits(80)                       # min/max blocksize+framesize
            rate = br.bits(20)
            channels = br.bits(3) + 1
            bps = br.bits(5) + 1
            total = br.bits(36)
            info = (rate, channels, bps, total)
        pos += 4 + length
        if hdr & 0x80:                        # last-metadata flag
            break
    if info is None:
        raise MediaDecodeError("FLAC missing STREAMINFO")
    rate, channels, bps, total = info
    if not rate or not channels:
        raise MediaDecodeError("bad FLAC STREAMINFO")
    br = _FlacBitReader(payload, pos)
    chunks = []
    got = 0
    while (total == 0 or got < total) and br.bitpos + 40 <= len(payload) * 8:
        start_byte = br.bitpos >> 3
        if br.bits(14) != 0b11111111111110:
            if total == 0 and chunks:
                # unknown stream length (STREAMINFO total=0 is legal):
                # trailing non-frame bytes (padding, appended tags) end
                # the stream — but only when NO further frame sync
                # exists in the remainder; otherwise this is mid-stream
                # corruption and silently returning truncated audio
                # would poison downstream features
                rest = payload[start_byte:]
                more = rest.find(b"\xff", 1)
                while more != -1:
                    if (more + 1 < len(rest)
                            and rest[more + 1] & 0xFC == 0xF8):
                        raise MediaDecodeError(
                            "bad FLAC frame sync mid-stream")
                    more = rest.find(b"\xff", more + 1)
                break
            raise MediaDecodeError("bad FLAC frame sync")
        br.bits(1)                            # reserved
        br.bits(1)                            # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        chan_code = br.bits(4)
        ss_code = br.bits(3)
        br.bits(1)                            # reserved
        _flac_utf8_number(br)                 # frame/sample number
        if bs_code == 0:
            raise MediaDecodeError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = br.bits(8) + 1
        elif bs_code == 7:
            blocksize = br.bits(16) + 1
        elif bs_code in _FLAC_BLOCKSIZES:
            blocksize = _FLAC_BLOCKSIZES[bs_code]
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        fbps = _FLAC_BPS.get(ss_code, bps) if ss_code else bps
        br.bits(8)                            # header CRC-8 (unchecked)
        if chan_code < 8:
            nch = chan_code + 1
            if nch != channels:
                raise MediaDecodeError("FLAC channel count mismatch")
            subs = [_flac_subframe(br, blocksize, fbps)
                    for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise MediaDecodeError("FLAC stereo mode on non-stereo")
            a = _flac_subframe(br, blocksize, fbps + (1 if chan_code == 9
                                                      else 0))
            b = _flac_subframe(br, blocksize, fbps + (1 if chan_code != 9
                                                      else 0))
            if chan_code == 8:                # left/side
                subs = [a, a - b]
            elif chan_code == 9:              # side/right (side first)
                subs = [a + b, b]
            else:                             # mid/side
                mid2 = (a << 1) | (b & 1)
                subs = [(mid2 + b) >> 1, (mid2 - b) >> 1]
        else:
            raise MediaDecodeError(f"reserved FLAC channels {chan_code}")
        br.align()
        br.bits(16)                           # frame CRC-16 (unchecked)
        chunks.append(np.stack(subs, axis=1))
        got += blocksize
    if not chunks:
        raise MediaDecodeError("FLAC stream has no frames")
    pcm = np.concatenate(chunks, axis=0)
    if total:
        pcm = pcm[:total]
    return ((pcm / float(1 << (bps - 1))).astype(np.float32), rate,
            channels)


# ---------------------------------------------------------------------------
# WAV


def _g711_ulaw_table() -> np.ndarray:
    """256-entry mu-law -> linear int16 expansion table, built from the
    published ITU-T G.711 decode formula (the CCITT reference ulaw2linear:
    complement, (mantissa<<3 + 0x84) << segment, re-bias, sign)."""
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _g711_alaw_table() -> np.ndarray:
    """256-entry A-law -> linear int16 table from the published ITU-T
    G.711 decode formula (toggle even bits with 0x55, segment-scaled
    mantissa with the half-step offset, sign)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108, (t + 0x108) << (seg - 1).clip(0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW2LIN: np.ndarray | None = None
_ALAW2LIN: np.ndarray | None = None


def _ulaw_table() -> np.ndarray:
    """Lazily-built shared mu-law expansion table (WAV + AU)."""
    global _ULAW2LIN
    if _ULAW2LIN is None:
        _ULAW2LIN = _g711_ulaw_table()
    return _ULAW2LIN


def _alaw_table() -> np.ndarray:
    global _ALAW2LIN
    if _ALAW2LIN is None:
        _ALAW2LIN = _g711_alaw_table()
    return _ALAW2LIN

# IMA/DVI ADPCM published tables (IMA Digital Audio Focus and Technical
# Working Groups recommended practice; also multimedia ADPCM references)
_ADPCM_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_ADPCM_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)


def _decode_ima_adpcm(data: bytes, channels: int,
                      block_align: int) -> np.ndarray:
    """Decode WAV-embedded IMA ADPCM (format 0x11) to float32 frames.

    WAV blocks start with a 4-byte state header per channel (predictor
    int16, step index uint8, reserved byte); nibble data follows in
    4-byte-per-channel interleaved words, low nibble first. The nibble
    loop runs once per sample POSITION but vectorizes across all blocks
    (state arrays shaped (n_blocks, channels)) — the 100 TB-shape cost is
    O(samples_per_block) numpy steps regardless of payload count."""
    if block_align <= 4 * channels or block_align % (4 * channels):
        raise MediaDecodeError(f"bad IMA ADPCM block align {block_align}")
    nblocks = len(data) // block_align
    if nblocks == 0:
        return np.zeros((0, channels), dtype=np.float32)
    blocks = np.frombuffer(data, dtype=np.uint8,
                           count=nblocks * block_align)
    blocks = blocks.reshape(nblocks, block_align)
    # per-channel 4-byte state headers
    hdr = blocks[:, : 4 * channels].reshape(nblocks, channels, 4)
    predictor = (hdr[:, :, 0].astype(np.int32)
                 | (hdr[:, :, 1].astype(np.int32) << 8))
    predictor = np.where(predictor >= 0x8000, predictor - 0x10000, predictor)
    index = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
    body = blocks[:, 4 * channels:]
    # interleave: 4 bytes (8 nibbles) per channel, round-robin
    words = body.reshape(nblocks, -1, channels, 4)     # (B, W, C, 4)
    lo = (words & 0x0F).astype(np.uint8)
    hi = (words >> 4).astype(np.uint8)
    # per word: nibble order low,high per byte -> 8 samples per channel
    nibbles = np.empty(words.shape[:3] + (8,), dtype=np.uint8)
    nibbles[..., 0::2] = lo
    nibbles[..., 1::2] = hi
    # (B, C, samples_after_header)
    nibbles = nibbles.transpose(0, 2, 1, 3).reshape(nblocks, channels, -1)
    spb = nibbles.shape[2]
    out = np.empty((nblocks, channels, spb + 1), dtype=np.int16)
    out[:, :, 0] = predictor.astype(np.int16)
    for i in range(spb):
        nib = nibbles[:, :, i].astype(np.int32)
        step = _ADPCM_STEPS[index]
        diff = step >> 3
        diff += np.where(nib & 1, step >> 2, 0)
        diff += np.where(nib & 2, step >> 1, 0)
        diff += np.where(nib & 4, step, 0)
        predictor = np.clip(
            np.where(nib & 8, predictor - diff, predictor + diff),
            -32768, 32767)
        index = np.clip(index + _ADPCM_INDEX[nib & 7], 0, 88)
        out[:, :, i + 1] = predictor.astype(np.int16)
    # (B, C, S) -> (B*S, C) frame order
    frames = out.transpose(0, 2, 1).reshape(-1, channels)
    return frames.astype(np.float32) / 32768.0


@_decode_guard
def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a RIFF/WAVE payload.

    Returns ``(samples, sample_rate, channels)`` where samples is a
    float32 array of shape (n_frames, channels) scaled to [-1, 1].
    Supports integer PCM at 8 (unsigned), 16, and 32 bits, format 3
    (IEEE float32), the ITU-T G.711 companded formats (6 = A-law,
    7 = mu-law), and IMA/DVI ADPCM (format 0x11) — every layout a
    telephony/speech corpus commonly holds short of MP3/AAC.
    """
    global _ULAW2LIN, _ALAW2LIN
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
    audio_fmt, channels, rate, _, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0)
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
    elif audio_fmt == 7 and bits == 8:       # G.711 mu-law
        samples = (_ulaw_table()[np.frombuffer(data, dtype=np.uint8)]
                   .astype(np.float32) / 32768.0)
    elif audio_fmt == 6 and bits == 8:       # G.711 A-law
        samples = (_alaw_table()[np.frombuffer(data, dtype=np.uint8)]
                   .astype(np.float32) / 32768.0)
    elif audio_fmt == 0x11 and bits == 4:    # IMA/DVI ADPCM
        return (_decode_ima_adpcm(data, channels, block_align),
                int(rate), int(channels))
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

# ---------------------------------------------------------------------------
# AVI (RIFF) container — MJPEG and uncompressed-DIB video
#
# The classic motion-JPEG layout: RIFF('AVI ') holding LIST('hdrl')
# [avih main header + per-stream LIST('strl') with strh/strf] and
# LIST('movi') with one '##dc'/'##db' chunk per frame (optionally
# grouped under LIST('rec ')), plus an optional idx1 index. Frame
# payloads are either standalone baseline JPEGs ('MJPG') or bottom-up
# BGR DIBs (BI_RGB), both of which the codecs above handle — so this
# container makes the video decode path REAL without ffmpeg. Format
# reference: the public AVI RIFF specification (Microsoft Video for
# Windows: AVIMAINHEADER / AVISTREAMHEADER / BITMAPINFOHEADER layouts).


def _riff_chunk(ckid: bytes, data: bytes) -> bytes:
    pad = b"\0" if len(data) & 1 else b""
    return ckid + struct.pack("<I", len(data)) + data + pad


def _riff_list(listtype: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", listtype + payload)


def _dib_from_frame(frame: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> bottom-up BGR rows padded to 4 bytes."""
    h, w = frame.shape[:2]
    row = w * 3
    stride = (row + 3) & ~3
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, :row] = frame[::-1, :, ::-1].reshape(h, row)
    return out.tobytes()


def _frame_from_dib(data: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    if len(data) < stride * h:
        raise MediaDecodeError("AVI DIB frame truncated")
    rows = np.frombuffer(data[:stride * h], dtype=np.uint8)
    px = rows.reshape(h, stride)[:, :w * nch].reshape(h, w, nch)
    return np.ascontiguousarray(px[::-1, :, 2::-1])   # flip rows, BGR(A)->RGB


def encode_avi(frames: list[np.ndarray], fps: float = 30.0,
               codec: str = "MJPG", quality: int = 85) -> bytes:
    """Encode (H, W, 3) uint8 RGB frames as a single-video-stream AVI.

    ``codec="MJPG"`` stores each frame as a standalone baseline JPEG
    from ``encode_jpeg`` (the motion-JPEG convention); ``codec="DIB "``
    stores uncompressed bottom-up BGR bitmaps (BI_RGB). Writes a
    spec-complete hdrl (avih + strh/strf), the movi frame chunks, and
    an idx1 keyframe index.
    """
    if codec not in ("MJPG", "DIB "):
        raise ValueError("codec must be 'MJPG' or 'DIB '")
    if not frames:
        raise ValueError("encode_avi: no frames")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        f = np.asarray(f)
        if f.dtype != np.uint8 or f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("encode_avi expects (H, W, 3) uint8 frames")
        if f.shape[:2] != (h, w):
            raise ValueError("encode_avi: frames must share one geometry")
        payloads.append(encode_jpeg(f, quality=quality)
                        if codec == "MJPG" else _dib_from_frame(f))

    scale, rate = 1000, max(1, int(round(fps * 1000)))
    usec = max(1, int(round(1e6 * scale / rate)))
    bufsize = max(len(p) for p in payloads)
    avih = struct.pack("<14I", usec, bufsize * rate // scale, 0, 0x10,
                       len(payloads), 0, 1, bufsize, w, h, 0, 0, 0, 0)
    fourcc = b"MJPG" if codec == "MJPG" else b"DIB "
    strh = (b"vids" + fourcc
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0,
                          len(payloads), bufsize, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    compression = b"MJPG" if codec == "MJPG" else b"\0\0\0\0"
    strf = (struct.pack("<IiiHH", 40, w, h, 1, 24) + compression
            + struct.pack("<IiiII", len(payloads[0]), 0, 0, 0, 0))
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih)
                      + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                                   + _riff_chunk(b"strf", strf)))
    movi_chunks, idx, off = [], [], 4      # offsets from the 'movi' fourcc
    for p in payloads:
        movi_chunks.append(_riff_chunk(b"00dc", p))
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(p)))
        off += len(movi_chunks[-1])
    movi = _riff_list(b"movi", b"".join(movi_chunks))
    idx1 = _riff_chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_subchunks(data: bytes, pos: int, end: int):
    """Yield (ckid, payload_start, payload_len) walking word-aligned
    RIFF chunks; stops (rather than raising) at a truncated tail."""
    while pos + 8 <= end:
        ckid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > end:
            return
        yield ckid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi_frames(payload: bytes, max_frames: int | None = None
                      ) -> tuple[list[np.ndarray], float]:
    """Decode an AVI's first video stream to ((H, W, 3) uint8 RGB frame
    list, fps). Handles 'MJPG' (frames via ``decode_jpeg``) and BI_RGB
    'DIB ' (24/32-bit bottom-up BGR) payloads, '##dc'/'##db' chunk ids,
    LIST('rec ') grouping, and word-aligned chunk padding; other
    compressions raise — codec video stays the declared ffmpeg seam.
    ``max_frames`` bounds the decode of pathological files.
    """
    d = bytes(payload)
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        raise MediaDecodeError("not a RIFF/AVI payload")
    end = min(len(d), 8 + struct.unpack_from("<I", d, 4)[0])
    fps, stream_no, vids_no = None, 0, None
    w = h = bpp = None
    compression = None
    frames: list[np.ndarray] = []

    def parse_strl(pos, cend):
        nonlocal fps, vids_no, w, h, bpp, compression, stream_no
        is_vids = False
        for ckid, at, size in _riff_subchunks(d, pos, cend):
            if ckid == b"strh" and size >= 36:
                if d[at:at + 4] == b"vids" and vids_no is None:
                    is_vids = True
                    vids_no = stream_no
                    scale, rate = struct.unpack_from("<II", d, at + 20)
                    if scale and rate:
                        fps = rate / scale
            elif ckid == b"strf" and is_vids and size >= 20:
                bw, bh = struct.unpack_from("<ii", d, at + 4)
                (bc,) = struct.unpack_from("<H", d, at + 14)
                w, h, bpp = bw, abs(bh), bc
                compression = d[at + 16:at + 20]
        stream_no += 1

    def decode_frame(at, size):
        data = d[at:at + size]
        if compression == b"MJPG" or (compression is None
                                      and data[:2] == b"\xff\xd8"):
            frames.append(decode_jpeg(data))
        elif compression in (b"\0\0\0\0", b"DIB "):
            if not w or not h or bpp not in (24, 32):
                raise MediaDecodeError("AVI DIB stream missing geometry")
            _check_pixel_budget("AVI", w, h)
            frames.append(_frame_from_dib(data, w, h, bpp))
        else:
            raise MediaDecodeError(
                "unsupported AVI compression "
                f"{compression!r} (only MJPG / BI_RGB DIB; codec video "
                "is the ffmpeg seam)")

    def walk_movi(pos, cend):
        tag = (b"%02ddc" % vids_no, b"%02ddb" % vids_no) \
            if vids_no is not None else (b"00dc", b"00db")
        for ckid, at, size in _riff_subchunks(d, pos, cend):
            if max_frames is not None and len(frames) >= max_frames:
                return
            if ckid == b"LIST" and d[at:at + 4] == b"rec ":
                walk_movi(at + 4, at + size)
            elif ckid in tag and size > 0:
                decode_frame(at, size)

    movi_spans = []
    for ckid, at, size in _riff_subchunks(d, 12, end):
        if ckid != b"LIST":
            continue
        ltype, lat, lend = d[at:at + 4], at + 4, at + size
        if ltype == b"hdrl":
            for ckid2, at2, size2 in _riff_subchunks(d, lat, lend):
                if ckid2 == b"LIST" and d[at2:at2 + 4] == b"strl":
                    parse_strl(at2 + 4, at2 + size2)
                elif ckid2 == b"avih" and size2 >= 40:
                    usec, = struct.unpack_from("<I", d, at2)
                    aw, ah = struct.unpack_from("<II", d, at2 + 32)
                    if fps is None and usec:
                        fps = 1e6 / usec
                    if not w:
                        w, h = aw, ah
        elif ltype == b"movi":
            movi_spans.append((lat, lend))
    if not movi_spans:
        raise MediaDecodeError("AVI missing movi list")
    for lat, lend in movi_spans:
        walk_movi(lat, lend)
    return frames, float(fps or 0.0)

# ---------------------------------------------------------------------------
# AIFF / AIFF-C (big-endian PCM) and Sun AU — the two classic
# uncompressed audio containers besides WAV. Format references: the
# public AIFF-1.3/AIFF-C specifications (FORM/COMM/SSND chunk layout,
# 80-bit extended sample rate) and the Sun/NeXT .au header layout.
# Tests pin both decoders with the stdlib aifc/sunau modules as
# INDEPENDENT forward implementations (same pattern as WAV vs `wave`).


def _aiff_ext80(ext80: bytes) -> float | None:
    """COMM's 80-bit extended-precision sample rate (sign + 15-bit
    exponent, 64-bit mantissa, big-endian). Returns None — never raises,
    never a nonsense value — outside the plausible sample-rate range.
    The single shared parser: the metadata sniffer imports THIS (codecs
    is pyspark-free, so the dependency points this way)."""
    if len(ext80) < 10:
        return None
    (se,) = struct.unpack_from(">H", ext80, 0)
    mant = int.from_bytes(ext80[2:10], "big")
    if mant == 0 or se & 0x8000:
        return None
    exp = (se & 0x7FFF) - 16383 - 63
    if not -80 <= exp <= 0:
        return None
    rate = mant * (2.0 ** exp)
    return rate if 1.0 <= rate <= 1e7 else None


@_decode_guard
def decode_aiff(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode AIFF / AIFF-C to (float32 frames x channels in [-1, 1],
    rate, channels). Supports 8/16/24/32-bit PCM, big-endian (AIFF and
    AIFC 'NONE') and little-endian (AIFC 'sowt'); compressed AIFC
    types raise — they are the ffmpeg seam."""
    d = bytes(payload)
    if len(d) < 12 or d[:4] != b"FORM" or d[8:12] not in (b"AIFF", b"AIFC"):
        raise MediaDecodeError("not an AIFF payload")
    is_aifc = d[8:12] == b"AIFC"
    ch = bits = rate = None
    little = False
    data = None
    pos = 12
    while pos + 8 <= len(d):
        cid = d[pos:pos + 4]
        (size,) = struct.unpack_from(">I", d, pos + 4)
        if pos + 8 + size > len(d):
            break
        body = d[pos + 8:pos + 8 + size]
        if cid == b"COMM" and size >= 18:
            ch, _frames, bits = struct.unpack_from(">HIH", body, 0)
            rate = _aiff_ext80(body[8:18])
            if is_aifc and size >= 22:
                comp = body[18:22]
                if comp == b"sowt":
                    little = True
                elif comp != b"NONE":
                    raise MediaDecodeError(
                        f"unsupported AIFC compression {comp!r} "
                        "(only NONE/sowt; compressed AIFC is the "
                        "ffmpeg seam)")
        elif cid == b"SSND" and size >= 8:
            off, _block = struct.unpack_from(">II", body, 0)
            data = body[8 + off:]
        pos += 8 + size + (size & 1)
    if not ch or not bits or not rate or data is None:
        raise MediaDecodeError("AIFF missing COMM/SSND")
    bo = "<" if little else ">"
    if bits == 8:                       # AIFF 8-bit is SIGNED
        samples = np.frombuffer(data, dtype=np.int8).astype(
            np.float32) / 128.0
    elif bits == 16:
        samples = np.frombuffer(data[:len(data) - len(data) % 2],
                                dtype=f"{bo}i2").astype(
            np.float32) / 32768.0
    elif bits == 24:
        raw = np.frombuffer(data[:len(data) - len(data) % 3],
                            dtype=np.uint8).reshape(-1, 3)
        if little:
            val = (raw[:, 0].astype(np.int32)
                   | raw[:, 1].astype(np.int32) << 8
                   | raw[:, 2].astype(np.int32) << 16)
        else:
            val = (raw[:, 2].astype(np.int32)
                   | raw[:, 1].astype(np.int32) << 8
                   | raw[:, 0].astype(np.int32) << 16)
        val = (val ^ 0x800000) - 0x800000          # sign-extend 24-bit
        samples = val.astype(np.float32) / 8388608.0
    elif bits == 32:
        samples = np.frombuffer(data[:len(data) - len(data) % 4],
                                dtype=f"{bo}i4").astype(
            np.float32) / 2147483648.0
    else:
        raise MediaDecodeError(f"unsupported AIFF bit depth {bits}")
    n = (len(samples) // ch) * ch
    return samples[:n].reshape(-1, ch), int(round(rate)), int(ch)


_AU_PCM = {2: (np.int8, 128.0), 3: (">i2", 32768.0),
           5: (">i4", 2147483648.0)}


@_decode_guard
def decode_au(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a Sun/NeXT .au payload to (float32 frames x channels,
    rate, channels). Encodings: G.711 mu-law (1) / A-law (27) via the
    shared tables, linear PCM 8/16/32-bit (2/3/5), float32/float64
    (6/7); others (ADPCM variants) raise."""
    d = bytes(payload)
    if len(d) < 24 or d[:4] != b".snd":
        raise MediaDecodeError("not a Sun AU payload")
    hdr, dsize, enc, rate, ch = struct.unpack_from(">IIIII", d, 4)
    if hdr < 24 or hdr > len(d) or not ch or not rate:
        raise MediaDecodeError("malformed AU header")
    end = len(d) if dsize in (0, 0xFFFFFFFF) else min(len(d), hdr + dsize)
    data = d[hdr:end]
    if enc == 1:
        samples = (_ulaw_table()[np.frombuffer(data, dtype=np.uint8)]
                   .astype(np.float32) / 32768.0)
    elif enc == 27:
        samples = (_alaw_table()[np.frombuffer(data, dtype=np.uint8)]
                   .astype(np.float32) / 32768.0)
    elif enc in _AU_PCM:
        dt, scale = _AU_PCM[enc]
        samples = np.frombuffer(
            data[:len(data) - len(data) % np.dtype(dt).itemsize],
            dtype=dt).astype(np.float32) / scale
    elif enc == 6:
        samples = np.frombuffer(
            data[:len(data) - len(data) % 4], dtype=">f4").astype(np.float32)
    elif enc == 7:
        samples = np.frombuffer(
            data[:len(data) - len(data) % 8], dtype=">f8").astype(np.float32)
    else:
        raise MediaDecodeError(f"unsupported AU encoding {enc}")
    n = (len(samples) // ch) * ch
    return samples[:n].reshape(-1, ch), int(rate), int(ch)
