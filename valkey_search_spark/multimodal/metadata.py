"""Header-sniffing media metadata — the decode-free corpus filter.

At 100 TB you do not decode a payload to learn its dimensions: a
training-data curation pass filters by format / width / height /
duration FIRST and only decodes survivors. This module parses just the
container headers (all from the public format specifications) and the
DataFrame operator bounds what crosses the Arrow boundary: the JVM
slices a fixed-size payload PREFIX (default 64 KiB) and computes the
total length, so per-row transfer cost is O(prefix) regardless of media
size — a 2 GB video costs the same to sniff as a 2 KB icon.

Formats (detection always works; dimension/duration fields are null when
the needed header lies beyond the prefix):

- images: BMP, PNG (IHDR), JPEG (SOF0-15 marker walk — including
  progressive, which the decoder seam does not decode), GIF87a/89a,
  WebP (VP8 lossy / VP8L lossless / VP8X extended)
- audio: WAV (fmt + data chunks; duration from byte rate), FLAC
  (STREAMINFO), MP3 (first MPEG audio frame header; Xing/Info VBR frame
  count when present, else CBR estimate from the first frame's bitrate),
  Ogg (Vorbis identification header / OpusHead), AIFF (COMM chunk with
  its 80-bit extended-float sample rate)
- video: MP4/ISO-BMFF (mvhd duration + tkhd track dimensions; the moov
  box is found in the prefix for faststart files and in the TAIL slice
  otherwise — both common layouts), Matroska/WebM (EBML detection only)

The reference engine carries no media (its closest analogue is opaque
content fetch, /root/reference/src/attribute_data_type.h:71); this is a
beyond-reference training-pipeline operator per SURVEY.md §2.10.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_FIELDS = [
    T.StructField("format", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bit_depth", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_sec", T.DoubleType()),
    T.StructField("payload_bytes", T.LongType()),
    # EXIF orientation 1-8 (JPEG APP1 / TIFF tag 274); null when absent.
    # A corpus filter drops or fixes rotated images WITHOUT decoding.
    T.StructField("orientation", T.IntegerType()),
]

_EMPTY = {f.name: None for f in MEDIA_META_FIELDS}


def _img(fmt, w=None, h=None, ch=None, depth=None, orient=None):
    d = dict(_EMPTY)
    d.update(format=fmt, kind="image", width=w, height=h, channels=ch,
             bit_depth=depth, orientation=orient)
    return d


def _aud(fmt, rate=None, ch=None, depth=None, dur=None):
    d = dict(_EMPTY)
    d.update(format=fmt, kind="audio", sample_rate=rate, channels=ch,
             bit_depth=depth, duration_sec=dur)
    return d


def _vid(fmt, w=None, h=None, dur=None):
    d = dict(_EMPTY)
    d.update(format=fmt, kind="video", width=w, height=h,
             duration_sec=dur)
    return d


# ---------------------------------------------------------------------------
# image containers

def _bmp_depth_channels(bpp: int):
    """(channels, per-channel bit depth) from the BMP bits-per-pixel
    field: 1/4/8 bpp are palettized single-channel at that depth; 24/32
    are 3/4 byte channels; 16 bpp (5-6-5 / 5-5-5-1 packings) has no
    uniform per-channel depth, so bit_depth is reported null there."""
    if bpp in (1, 4, 8):
        return 1, bpp
    if bpp == 24:
        return 3, 8
    if bpp == 32:
        return 4, 8
    if bpp == 16:
        return 3, None
    return (max(1, bpp // 8), 8 if bpp % 8 == 0 else None) if bpp else (None, None)


def _sniff_bmp(p: bytes):
    if len(p) < 26:
        return _img("bmp")
    (hdr_size,) = struct.unpack_from("<I", p, 14)
    if hdr_size == 12:                        # OS/2 BITMAPCOREHEADER
        w, h = struct.unpack_from("<HH", p, 18)
        (bpp,) = struct.unpack_from("<H", p, 24)
        return _img("bmp", w, h, *_bmp_depth_channels(bpp))
    if hdr_size < 40 or len(p) < 30:          # unknown DIB header layout
        return _img("bmp")
    w, h = struct.unpack_from("<ii", p, 18)
    (bpp,) = struct.unpack_from("<H", p, 28)
    return _img("bmp", abs(w), abs(h), *_bmp_depth_channels(bpp))


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _sniff_png(p: bytes):
    if len(p) < 26 or p[12:16] != b"IHDR":
        return _img("png")
    w, h = struct.unpack_from(">II", p, 16)
    depth, ctype = p[24], p[25]
    return _img("png", w, h, _PNG_CHANNELS.get(ctype), depth)


def _tiff_first_ifd(t: bytes, tags: tuple[int, ...]) -> dict[int, int]:
    """First-IFD walk over a TIFF header (standalone file or the body
    embedded in a JPEG APP1 Exif segment): SHORT/LONG single-count
    values for the requested tags, bounds-checked, both endiannesses.
    Shared by _sniff_tiff and the Exif orientation reader so the two
    cannot drift."""
    if len(t) < 8 or t[:2] not in (b"II", b"MM"):
        return {}
    bo = "<" if t[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", t, 4)
    if ifd_off + 2 > len(t):
        return {}
    (n_entries,) = struct.unpack_from(bo + "H", t, ifd_off)
    vals: dict[int, int] = {}
    for e in range(min(n_entries, 256)):
        off = ifd_off + 2 + e * 12
        if off + 12 > len(t):
            break
        tag, typ, cnt = struct.unpack_from(bo + "HHI", t, off)
        if tag in tags and cnt == 1:
            if typ == 3:                       # SHORT, left-justified
                (v,) = struct.unpack_from(bo + "H", t, off + 8)
            elif typ == 4:                     # LONG
                (v,) = struct.unpack_from(bo + "I", t, off + 8)
            else:
                continue
            vals[tag] = v
    return vals


def _valid_orientation(v):
    """EXIF orientation is 1-8 by spec; anything else reports null —
    the same rule for standalone TIFF and JPEG-embedded Exif."""
    return v if v is not None and 1 <= v <= 8 else None


# SOF markers carry frame dimensions; C4=DHT, C8=JPG(reserved), CC=DAC do not
def _sniff_tiff(p: bytes):
    """Baseline TIFF: endianness marker + magic 42, first IFD walk for
    ImageWidth (256) / ImageLength (257) / BitsPerSample (258) /
    Orientation (274) / SamplesPerPixel (277)."""
    vals = _tiff_first_ifd(p, (256, 257, 258, 274, 277))
    return _img("tiff", vals.get(256), vals.get(257), vals.get(277),
                vals.get(258), orient=_valid_orientation(vals.get(274)))


_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def _exif_orientation(seg: bytes):
    """Tag 274 from the TIFF IFD embedded in a JPEG APP1 Exif segment —
    the body after 'Exif\\0\\0' IS a TIFF header, so the shared
    first-IFD walk does the parsing."""
    if seg[:6] != b"Exif\x00\x00":
        return None
    return _valid_orientation(_tiff_first_ifd(seg[6:], (274,)).get(274))


def _sniff_jpeg(p: bytes):
    orient = None
    pos = 2
    n = len(p)
    while pos + 4 <= n:
        if p[pos] != 0xFF:
            pos += 1                          # tolerate fill bytes
            continue
        marker = p[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            pos += 2                          # standalone markers
            continue
        if pos + 4 > n:
            break
        (seglen,) = struct.unpack_from(">H", p, pos + 2)
        if marker == 0xE1:                    # APP1: EXIF orientation
            o = _exif_orientation(p[pos + 4:pos + 2 + seglen])
            orient = o if o is not None else orient
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                break
            depth = p[pos + 4]
            h, w = struct.unpack_from(">HH", p, pos + 5)
            ch = p[pos + 9] if pos + 9 < n else None
            return _img("jpeg", w, h, ch, depth, orient=orient)
        if marker == 0xDA:                    # start of scan: no SOF seen
            break
        pos += 2 + seglen
    return _img("jpeg", orient=orient)


def _sniff_gif(p: bytes):
    if len(p) < 10:
        return _img("gif")
    w, h = struct.unpack_from("<HH", p, 6)
    return _img("gif", w, h, 3, 8)


def _sniff_webp(p: bytes):
    if len(p) < 16:
        return _img("webp")
    cid = p[12:16]
    if cid == b"VP8 " and len(p) >= 30 and p[23:26] == b"\x9d\x01\x2a":
        w = struct.unpack_from("<H", p, 26)[0] & 0x3FFF
        h = struct.unpack_from("<H", p, 28)[0] & 0x3FFF
        return _img("webp", w, h, 3, 8)
    if cid == b"VP8L" and len(p) >= 25 and p[20] == 0x2F:
        bits = struct.unpack_from("<I", p, 21)[0]
        # bit 28 is the alpha HINT: channels 4 only when it is set
        return _img("webp", (bits & 0x3FFF) + 1,
                    ((bits >> 14) & 0x3FFF) + 1,
                    4 if (bits >> 28) & 1 else 3, 8)
    if cid == b"VP8X" and len(p) >= 30:
        w = int.from_bytes(p[24:27], "little") + 1
        h = int.from_bytes(p[27:30], "little") + 1
        return _img("webp", w, h, None, 8)
    return _img("webp")


def _sniff_avi(p: bytes):
    """AVI main header (avih) inside LIST('hdrl'): dwMicroSecPerFrame,
    dwTotalFrames, dwWidth, dwHeight — geometry + duration with no frame
    decode. hdrl sits at the front of the file by spec, so the bounded
    prefix always covers it."""
    w = h = dur = None
    pos, end = 12, len(p)
    while pos + 8 <= end:
        ckid = p[pos:pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        if ckid == b"LIST" and p[pos + 8:pos + 12] == b"hdrl":
            ipos, iend = pos + 12, min(end, pos + 8 + size)
            while ipos + 8 <= iend:
                ck2 = p[ipos:ipos + 4]
                (sz2,) = struct.unpack_from("<I", p, ipos + 4)
                if ck2 == b"avih" and ipos + 8 + 40 <= iend:
                    usec, = struct.unpack_from("<I", p, ipos + 8)
                    frames, = struct.unpack_from("<I", p, ipos + 8 + 16)
                    aw, ah = struct.unpack_from("<II", p, ipos + 8 + 32)
                    w, h = aw or None, ah or None
                    if usec and frames:
                        dur = frames * usec / 1e6
                    return _vid("avi", w, h, dur)
                ipos += 8 + sz2 + (sz2 & 1)
            break
        pos += 8 + size + (size & 1)
    return _vid("avi")


# ---------------------------------------------------------------------------
# audio containers

def _sniff_wav(p: bytes):
    pos = 12
    rate = ch = bits = byte_rate = None
    data_size = None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        if cid == b"fmt " and pos + 24 <= len(p):
            _, ch, rate, byte_rate, _, bits = struct.unpack_from(
                "<HHIIHH", p, pos + 8)
        elif cid == b"data":
            data_size = size
            break                             # data body may exceed prefix
        pos += 8 + size + (size & 1)
    dur = None
    if data_size is not None and byte_rate:
        dur = data_size / byte_rate
    return _aud("wav", rate, ch, bits, dur)


def _sniff_flac(p: bytes):
    # fLaC then metadata block header; STREAMINFO is always first
    if len(p) < 42 or (p[4] & 0x7F) != 0:
        return _aud("flac")
    si = p[8:42]                              # 34-byte STREAMINFO
    packed = int.from_bytes(si[10:18], "big")
    rate = (packed >> 44) & 0xFFFFF
    ch = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total_samples = packed & 0xFFFFFFFFF
    dur = total_samples / rate if rate and total_samples else None
    return _aud("flac", rate or None, ch, bits, dur)


# MPEG audio tables (public, ISO/IEC 11172-3 / 13818-3)
_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320, 0]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                     144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000],      # MPEG1
              2: [22050, 24000, 16000],      # MPEG2
              0: [11025, 12000, 8000]}       # MPEG2.5


def _sniff_mp3(p: bytes, total: int):
    pos = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        tag = ((p[6] & 0x7F) << 21 | (p[7] & 0x7F) << 14
               | (p[8] & 0x7F) << 7 | (p[9] & 0x7F))
        pos = 10 + tag
    n = len(p)
    while pos + 4 <= n:
        if p[pos] == 0xFF and (p[pos + 1] & 0xE0) == 0xE0:
            ver = (p[pos + 1] >> 3) & 0x3    # 3=MPEG1 2=MPEG2 0=MPEG2.5
            layer = (p[pos + 1] >> 1) & 0x3  # 1=L3 2=L2 3=L1
            br_idx = (p[pos + 2] >> 4) & 0xF
            sr_idx = (p[pos + 2] >> 2) & 0x3
            mode = (p[pos + 3] >> 6) & 0x3
            if ver != 1 and layer == 1 and sr_idx != 3:
                rate = _MP3_RATES[ver][sr_idx]
                ch = 1 if mode == 3 else 2
                kbps = (_MP3_BITRATE_V1L3 if ver == 3
                        else _MP3_BITRATE_V2L3)[br_idx]
                spf = 1152 if ver == 3 else 576   # samples/frame, layer III
                dur = None
                # Xing/Info VBR header: frame count beats the CBR estimate
                side = (36 if ver == 3 else 21) if mode != 3 else \
                       (21 if ver == 3 else 13)
                xoff = pos + 4 + side - 4
                if (xoff + 12 <= n and p[xoff:xoff + 4] in (b"Xing", b"Info")
                        and struct.unpack_from(">I", p, xoff + 4)[0] & 1):
                    frames = struct.unpack_from(">I", p, xoff + 8)[0]
                    dur = frames * spf / rate
                elif kbps:
                    dur = (total - pos) * 8 / (kbps * 1000)
                return _aud("mp3", rate, ch, None, dur)
        pos += 1
    return _aud("mp3")


def _ogg_last_granule(suffix: bytes) -> int | None:
    """Absolute granule position of the LAST Ogg page header found in the
    payload tail — by spec the stream's total sample count (Vorbis) or
    48 kHz-unit count (Opus).

    A bare 'OggS' byte collision inside compressed audio would yield a
    confidently wrong duration, so a candidate is only trusted when the
    rest of the fixed header is plausible too: stream_structure_version
    must be 0 (the only version ever defined) and header_type uses only
    its three defined flag bits (<= 7) — same false-positive discipline
    as the MP4 trailing-moov scanner."""
    i = suffix.rfind(b"OggS")
    while i >= 0:
        if (i + 14 <= len(suffix)
                and suffix[i + 4] == 0 and suffix[i + 5] <= 7):
            (granule,) = struct.unpack_from("<q", suffix, i + 6)
            if granule >= 0:
                return granule
        i = suffix.rfind(b"OggS", 0, i)
    return None


def _sniff_ogg(p: bytes, suffix: bytes):
    granule = _ogg_last_granule(suffix)
    i = p.find(b"\x01vorbis")
    if i >= 0 and i + 16 <= len(p):
        ch = p[i + 11]
        (rate,) = struct.unpack_from("<I", p, i + 12)
        dur = granule / rate if granule and rate else None
        return _aud("ogg", rate or None, ch or None, None, dur)
    i = p.find(b"OpusHead")
    if i >= 0 and i + 16 <= len(p):
        ch = p[i + 9]
        (rate,) = struct.unpack_from("<I", p, i + 12)
        # Opus granules tick at 48 kHz regardless of the input rate
        dur = granule / 48000.0 if granule else None
        return _aud("ogg", rate or None, ch or None, None, dur)
    return _aud("ogg")


def _aiff_rate(ext80: bytes) -> float | None:
    """COMM 80-bit extended sample rate — the ONE shared parser lives
    in codecs (pyspark-free, so the import points this way)."""
    from .codecs import _aiff_ext80

    return _aiff_ext80(ext80)


def _ebml_doctype(p: bytes) -> str:
    """Classify an EBML payload by its DocType element (ID 0x4282 +
    size varint + ASCII string) rather than a raw substring scan — a
    muxer-app string containing 'webm' must not flip the format."""
    i = p.find(b"\x42\x82", 4)
    while i >= 0 and i + 3 <= len(p):
        first = p[i + 2]
        if first:                              # EBML varint size
            width = 8 - first.bit_length() + 1
            if i + 2 + width <= len(p):
                size = first & (0xFF >> width)
                for b in p[i + 3: i + 2 + width]:
                    size = (size << 8) | b
                val = p[i + 2 + width: i + 2 + width + size]
                if val == b"webm":
                    return "webm"
                if val == b"matroska":
                    return "mkv"
        i = p.find(b"\x42\x82", i + 2)
    return "mkv"


def _sniff_aiff(p: bytes):
    pos = 12
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (size,) = struct.unpack_from(">I", p, pos + 4)
        if cid == b"COMM" and pos + 8 + 18 <= len(p):
            ch, frames = struct.unpack_from(">HI", p, pos + 8)
            (bits,) = struct.unpack_from(">H", p, pos + 14)
            rate = _aiff_rate(p[pos + 16: pos + 26])
            dur = frames / rate if rate and frames else None
            return _aud("aiff", int(rate) if rate else None, ch or None,
                        bits or None, dur)
        pos += 8 + size + (size & 1)          # chunks pad to even length
    return _aud("aiff")


_AU_BITS = {1: 8, 2: 8, 3: 16, 4: 24, 5: 32, 6: 32, 7: 64, 27: 8}


def _sniff_au(p: bytes, total_len: int):
    """Sun/NeXT .au: fixed big-endian header — encoding maps to bit
    depth; duration from the data size (header field, or payload length
    when the writer left it 0xFFFFFFFF 'unknown')."""
    hdr, dsize, enc, rate, ch = struct.unpack_from(">IIIII", p, 4)
    if hdr < 24 or not ch or not rate or rate > 10_000_000:
        return _aud("au")
    bits = _AU_BITS.get(enc)
    if dsize in (0, 0xFFFFFFFF):
        dsize = max(0, total_len - hdr)
    dur = None
    if bits and dsize:
        dur = dsize / (rate * ch * (bits // 8))
    return _aud("au", int(rate), int(ch), bits, dur)


def _box_size_ok(data: bytes, i: int, ver, sizes: tuple[int, int]) -> bool:
    """A candidate box tag at offset ``i`` is genuine only if the 4-byte
    size field preceding it matches the FIXED FullBox size for its
    version — mvhd/tkhd have no variable parts, so this check rejects
    random tag-byte collisions inside compressed mdat data (a bare
    4-byte tag scan collides ~1.5e-5 per 64 KiB slice; tag+size+version
    agreement is ~2^-40)."""
    if i < 4 or ver not in (0, 1):
        return False
    (size,) = struct.unpack_from(">I", data, i - 4)
    return size == sizes[ver]


def _mp4_scan(data: bytes):
    """(duration_sec, width, height) from mvhd/tkhd FullBox layouts
    found by validated tag scan — works on a bounded slice whether moov
    leads (faststart) or trails the mdat."""
    dur = None
    i = data.find(b"mvhd")
    while i >= 0 and dur is None:
        ver = data[i + 4] if i + 5 <= len(data) else None
        if _box_size_ok(data, i, ver, (108, 120)):
            if ver == 0 and i + 24 <= len(data):
                ts, d = struct.unpack_from(">II", data, i + 16)
                if ts:
                    dur = d / ts
            elif ver == 1 and i + 36 <= len(data):
                (ts,) = struct.unpack_from(">I", data, i + 24)
                (d,) = struct.unpack_from(">Q", data, i + 28)
                if ts:
                    dur = d / ts
        i = data.find(b"mvhd", i + 4)
    w = h = None
    j = data.find(b"tkhd")
    while j >= 0 and w is None:
        ver = data[j + 4] if j + 5 <= len(data) else None
        if _box_size_ok(data, j, ver, (92, 104)):
            off = j + 80 if ver == 0 else j + 92
            if off + 8 <= len(data):
                wf, hf = struct.unpack_from(">II", data, off)
                if wf >> 16 and hf >> 16:     # audio tracks carry 0x0
                    w, h = wf >> 16, hf >> 16
        j = data.find(b"tkhd", j + 4)
    return dur, w, h


def _sniff_mp4(p: bytes, suffix: bytes):
    dur, w, h = _mp4_scan(p)
    if (dur is None or w is None) and suffix:
        d2, w2, h2 = _mp4_scan(suffix)
        dur = dur if dur is not None else d2
        if w is None:
            w, h = w2, h2
    return _vid("mp4", w, h, dur)


# ---------------------------------------------------------------------------
def sniff_media(prefix: bytes, total_len: int, suffix: bytes = b"") -> dict:
    """Classify a payload from its header prefix and pull the cheap
    metadata out. Returns a dict matching MEDIA_META_FIELDS; ``format``
    is None for unrecognized payloads. ``suffix`` is an optional bounded
    tail slice — container formats that keep stream totals at the END
    (Ogg's last-page granule position) get their duration from it."""
    p = prefix
    out = dict(_EMPTY)
    if len(p) >= 2 and p[:2] == b"BM":
        out = _sniff_bmp(p)
    elif p[:8] == b"\x89PNG\r\n\x1a\n":
        out = _sniff_png(p)
    elif p[:2] == b"\xff\xd8":
        out = _sniff_jpeg(p)
    elif p[:6] in (b"GIF87a", b"GIF89a"):
        out = _sniff_gif(p)
    elif p[:4] in (b"II*\x00", b"MM\x00*"):
        out = _sniff_tiff(p)
    elif p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        out = _sniff_webp(p)
    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        out = _sniff_wav(p)
    elif p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        out = _sniff_avi(p)
    elif p[:4] == b"fLaC":
        out = _sniff_flac(p)
    elif p[:4] == b"OggS":
        # the prefix doubles as the tail ONLY when it covers the whole
        # payload — a mid-stream page granule from a truncated prefix
        # would report a confidently wrong (tiny) duration
        tail = suffix if suffix else (p if total_len <= len(p) else b"")
        out = _sniff_ogg(p, tail)
    elif len(p) >= 12 and p[4:8] == b"ftyp":
        out = _sniff_mp4(p, suffix if suffix else b"")
    elif p[:4] == b"\x1a\x45\xdf\xa3":         # EBML (Matroska family)
        out = _vid(_ebml_doctype(p))
    elif p[:4] == b"FORM" and p[8:12] in (b"AIFF", b"AIFC"):
        out = _sniff_aiff(p)
    elif p[:4] == b".snd" and len(p) >= 24:
        out = _sniff_au(p, total_len)
    elif p[:3] == b"ID3" or (len(p) >= 2 and p[0] == 0xFF
                             and (p[1] & 0xE0) == 0xE0):
        out = _sniff_mp3(p, total_len)
    out["payload_bytes"] = total_len
    return out


def media_metadata(df: DataFrame, binary_col: str = "payload",
                   prefix_bytes: int = 65536,
                   suffix_bytes: int = 4096) -> DataFrame:
    """Attach a ``<binary_col>_meta`` struct by sniffing container
    headers — no decode, no full-payload transfer.

    Scale shape: the JVM computes ``length(payload)`` and slices the
    first ``prefix_bytes`` plus the last ``suffix_bytes`` BEFORE the
    Arrow boundary, so the Python sniffer receives a bounded slice per
    row regardless of payload size; the full binary column never leaves
    the JVM. The tail slice serves formats that keep stream totals at
    the end (Ogg's last-page granule). Dimension fields whose header
    lies past the prefix (e.g. a JPEG SOF behind >64 KiB of EXIF) come
    back null — raise ``prefix_bytes`` for such corpora."""
    meta_t = T.StructType(MEDIA_META_FIELDS)

    @F.pandas_udf(meta_t)
    def sniff(prefixes: pd.Series, lengths: pd.Series,
              suffixes: pd.Series) -> pd.DataFrame:
        rows = []
        for p, ln, sfx in zip(prefixes, lengths, suffixes):
            if p is None:
                rows.append(dict(_EMPTY))
            else:
                rows.append(sniff_media(
                    bytes(p), int(ln), b"" if sfx is None else bytes(sfx)))
        return pd.DataFrame(rows, columns=[f.name for f in meta_t.fields])

    col = F.col(binary_col)
    # substr with negative start reads from the end; clamp so the suffix
    # never starts before byte 1 on short payloads (which would wrap)
    tail = F.substring(
        col, F.greatest(F.length(col) - suffix_bytes + 1, F.lit(1)),
        F.lit(suffix_bytes))
    return df.withColumn(
        f"{binary_col}_meta",
        F.when(col.isNull(), F.lit(None).cast(meta_t)).otherwise(
            sniff(col.substr(1, prefix_bytes),
                  F.length(col).cast("long"), tail)))
