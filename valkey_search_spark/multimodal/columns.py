"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference indexes only text-derived fields; a 100 TB training-data
pipeline also carries media. The Spark-native pattern (BASELINE.json north
star): media payloads are ``BinaryType`` columns with a typed metadata
struct, and every transform is an Arrow-batched ``mapInPandas`` whose
schema/partitioning/batch shape is real and tested. The ``_decode_*``
seams have two modes: ``fake=True`` substitutes a deterministic synthetic
decode so the plumbing is verifiable over arbitrary binary, and
``fake=False`` REALLY decodes the formats the vendored pure-Python
codecs cover (BMP/PNG/JPEG-incl-progressive/GIF/baseline-TIFF images,
PCM-WAV and FLAC audio — ``multimodal/codecs.py``), raising
NotImplementedError only for the formats that need PIL/ffmpeg (not in
this container).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

AUDIO_META = T.StructType([
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

VIDEO_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("fps", T.DoubleType()),
    T.StructField("format", T.StringType()),
])


def attach_media_metadata(df: DataFrame, binary_col: str, meta: dict) -> DataFrame:
    """Attach a typed metadata struct next to an opaque binary column."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(*[F.lit(v).alias(k) for k, v in meta.items()]))


# ---------------------------------------------------------------------------
def sniff_format(payload: bytes) -> str:
    """Cheap container-signature sniff for the decoder-injection seam:
    the format tag handed to a caller-supplied ``decode_fn`` so it can
    dispatch without re-sniffing (full decode-free metadata lives in
    ``media_metadata``)."""
    p = payload or b""
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        return "webp"
    if p[4:8] == b"ftyp":
        return "mp4"
    if p[:4] == b"\x1aE\xdf\xa3":
        return "webm"
    if p[:4] == b"OggS":
        return "ogg"
    if p[:3] == b"ID3" or (len(p) >= 2 and p[0] == 0xFF
                           and (p[1] & 0xE0) == 0xE0):
        return "mp3"
    return "unknown"


def _decode_image(payload: bytes, fake: bool, decode_fn=None) -> np.ndarray:
    """Image decode seam. ``fake`` derives a deterministic 8x8x3 uint8
    array from the payload bytes (plumbing tests over arbitrary binary).
    The REAL path decodes BMP, 8-bit PNG (incl. Adam7), JPEG (baseline
    AND progressive, YCbCr/RGB), GIF (LZW, incl. interlaced), baseline
    TIFF (uncompressed/LZW/PackBits + JPEG-in-TIFF: new-style
    compression 7 and the interchange form of old-style 6), and
    WebP-lossless (full VP8L: transforms, color cache, meta-huffman,
    LZ77) via the vendored pure-Python codecs (`multimodal/codecs.py`,
    `multimodal/webp.py`); the remaining exotics (lossy VP8 — see
    webp.py's header for why that seam is a data-fidelity boundary,
    not effort — arithmetic JPEG, tables-split old-style TIFF) are
    where PIL/opencv would plug in and still raise."""
    if not fake:
        from .codecs import (
            PNG_SIGNATURE, decode_bmp, decode_gif, decode_jpeg, decode_png,
            decode_tiff,
        )

        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:8] == PNG_SIGNATURE:
            return decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            return decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(payload)
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            return decode_tiff(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from .webp import decode_webp, has_vp8l

            # VP8X-wrapped lossless files (cwebp emits the extended
            # container when metadata rides along) still decode; lossy
            # VP8 falls through to the decode_fn seam below
            if has_vp8l(payload):
                return decode_webp(payload)
        # decoder-injection seam: a deployment with PIL/opencv plugs in
        # here for the formats the vendored codecs don't cover — the
        # vendored path above stays the default and is never bypassed
        if decode_fn is not None:
            arr = decode_fn(sniff_format(payload), payload)
            if arr is not None:
                return np.asarray(arr, dtype=np.uint8)
        raise NotImplementedError(
            "only BMP/PNG/JPEG/GIF/baseline-TIFF/WebP-lossless decode "
            "without PIL/opencv (not in this container); pass fake=True "
            "for the deterministic test decode of other payloads, or "
            "supply decode_fn(format, bytes) -> HxWx3 uint8 array to "
            "plug an external decoder in")
    seed = np.frombuffer((payload or b"\0")[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _error_schema(df: DataFrame, on_error: str,
                  extra: list) -> tuple["T.StructType", bool]:
    """Shared on_error plumbing: validate the mode, and append the ONE
    decode_error column unless an upstream operator already carries it
    (chained null-mode operators share the column, first error wins —
    a duplicate field would break the Arrow schema of the very mode
    built to survive corrupt rows). Returns (out_schema, has_prev_err).
    """
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be raise|null, got {on_error!r}")
    fields = list(extra)
    has_prev_err = "decode_error" in df.columns
    if on_error == "null" and not has_prev_err:
        fields.append(T.StructField("decode_error", T.StringType()))
    return T.StructType(df.schema.fields + fields), has_prev_err


def _merge_errors(out, pdf, errs, on_error: str,
                  has_prev_err: bool) -> None:
    """First-error-wins merge into the shared decode_error column."""
    if on_error != "null":
        return
    if has_prev_err:
        out["decode_error"] = [
            old_e if old_e is not None else new_e
            for old_e, new_e in zip(pdf["decode_error"], errs)]
    else:
        out["decode_error"] = errs


def image_features(df: DataFrame, binary_col: str = "image",
                   fake: bool = True, batch_size: int = 256,
                   on_error: str = "raise", decode_fn=None) -> DataFrame:
    """Per-image feature extraction via mapInPandas: mean/std per channel +
    a 64-bit content hash. Output schema is stable regardless of decoder.

    ``on_error="null"`` turns undecodable payloads into null feature
    columns plus a ``decode_error`` message column instead of failing
    the task — at corpus scale a handful of corrupt blobs must not
    kill a 100 TB job; filter (or inspect) ``decode_error`` afterwards.
    The default ``"raise"`` keeps strict semantics for pipelines that
    treat corruption as a bug."""
    extra = [T.StructField("img_mean", T.ArrayType(T.DoubleType())),
             T.StructField("img_std", T.ArrayType(T.DoubleType())),
             T.StructField("img_phash", T.LongType())]
    out_schema, has_prev_err = _error_schema(df, on_error, extra)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, stds, hashes, errs = [], [], [], []
            for payload in pdf[binary_col]:
                if payload is None:
                    means.append(None); stds.append(None); hashes.append(None)
                    errs.append(None)
                    continue
                try:
                    arr = _decode_image(bytes(payload), fake, decode_fn)
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise
                    means.append(None); stds.append(None); hashes.append(None)
                    errs.append(str(e))
                    continue
                errs.append(None)
                means.append([float(x) for x in arr.mean(axis=(0, 1))])
                stds.append([float(x) for x in arr.std(axis=(0, 1))])
                # average-hash over an 8x8 grayscale thumbnail (identity
                # for the fake decoder's native 8x8, a nearest-neighbor
                # downsample for real images of any size)
                gray = arr.mean(axis=2)
                ridx = np.linspace(0, gray.shape[0] - 1, 8).astype(int)
                cidx = np.linspace(0, gray.shape[1] - 1, 8).astype(int)
                thumb = gray[ridx][:, cidx]
                bits = (thumb > thumb.mean()).flatten()
                hashes.append(int(np.int64(
                    np.packbits(bits).view(">u8")[0].astype(np.int64))))
            out = pdf.copy()
            out["img_mean"], out["img_std"], out["img_phash"] = means, stds, hashes
            _merge_errors(out, pdf, errs, on_error, has_prev_err)
            yield out

    return df.mapInPandas(run, schema=out_schema)


def image_resize(df: DataFrame, binary_col: str = "image", size: int = 224,
                 fake: bool = True, on_error: str = "raise",
                 out_format: str = "bmp", quality: int = 85,
                 decode_fn=None) -> DataFrame:
    """Resize-and-reencode plumbing: binary in -> binary out + new meta.
    ``on_error="null"`` nulls undecodable payloads and adds a
    ``decode_error`` message column (same contract as image_features).
    ``out_format`` picks the re-encode codec on the real path: "bmp"
    (uncompressed), "png" (lossless deflate), or "jpeg" (lossy at
    ``quality`` — the vendored encoder with optimal Huffman tables);
    a thumbnail corpus at 100 TB wants jpeg's ~10-20x byte cut."""
    if out_format not in ("bmp", "png", "jpeg"):
        raise ValueError(
            f"out_format must be bmp|png|jpeg, got {out_format!r}")
    extra = [T.StructField("image_resized", T.BinaryType()),
             T.StructField("image_resized_meta", IMAGE_META)]
    out_schema, has_prev_err = _error_schema(df, on_error, extra)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas, errs = [], [], []
            for payload in pdf[binary_col]:
                if payload is None:
                    blobs.append(None); metas.append(None)
                    errs.append(None)
                    continue
                try:
                    arr = _decode_image(bytes(payload), fake, decode_fn)
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise
                    blobs.append(None); metas.append(None)
                    errs.append(str(e))
                    continue
                errs.append(None)
                # nearest-neighbor resample; rows and columns index their
                # own axis so non-square inputs resize correctly
                ridx = np.linspace(0, arr.shape[0] - 1, size).astype(int)
                cidx = np.linspace(0, arr.shape[1] - 1, size).astype(int)
                resized = arr[ridx][:, cidx]
                if fake:
                    blobs.append(resized.tobytes())
                    metas.append({"width": size, "height": size,
                                  "channels": 3, "format": "raw"})
                else:
                    from .codecs import encode_bmp, encode_jpeg, encode_png

                    enc = {"bmp": encode_bmp, "png": encode_png,
                           "jpeg": lambda a: encode_jpeg(a, quality=quality)
                           }[out_format]
                    blobs.append(enc(np.ascontiguousarray(resized)))
                    metas.append({"width": size, "height": size,
                                  "channels": 3, "format": out_format})
            out = pdf.copy()
            out["image_resized"], out["image_resized_meta"] = blobs, metas
            _merge_errors(out, pdf, errs, on_error, has_prev_err)
            yield out

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
def _decode_audio(payload: bytes, fake: bool,
                  decode_fn=None) -> tuple[np.ndarray, int]:
    """Audio decode seam returning (mono float32 wave, sample_rate). The
    REAL path decodes PCM RIFF/WAVE (manual parser, independent of the
    stdlib `wave` the tests use as second implementation), native FLAC
    (full lossless path: FIXED/LPC prediction, Rice partitions, stereo
    decorrelation), AIFF/AIFF-C (big-endian + 'sowt' PCM), and Sun AU
    (G.711 + linear + float encodings); lossy codecs (MP3/AAC/Vorbis)
    are where ffmpeg/soundfile would plug in and still raise here."""
    if not fake:
        from .codecs import decode_aiff, decode_au, decode_flac, decode_wav

        dec = None
        if payload[:4] == b"RIFF":
            dec = decode_wav
        elif payload[:4] == b"fLaC":
            dec = decode_flac
        elif payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
            dec = decode_aiff
        elif payload[:4] == b".snd":
            dec = decode_au
        if dec is not None:
            frames, rate, _ = dec(payload)
            return frames.mean(axis=1).astype(np.float32), rate
        # decoder-injection seam (see _decode_image): ffmpeg/soundfile
        # users close the MP3/AAC/Vorbis gap without forking
        if decode_fn is not None:
            res = decode_fn(sniff_format(payload), payload)
            if res is not None:
                wave, rate = res
                wave = np.asarray(wave, dtype=np.float32)
                if wave.ndim == 2:  # (frames, channels) -> mono, like
                    wave = wave.mean(axis=1)  # the vendored decoders
                elif wave.ndim != 1:
                    raise ValueError(
                        f"decode_fn returned a {wave.ndim}-D wave; "
                        "expected 1-D mono or 2-D (frames, channels)")
                return wave, int(rate)
        raise NotImplementedError(
            "only PCM WAV, FLAC, AIFF, and Sun AU decode without "
            "ffmpeg/soundfile (not in this container); pass fake=True "
            "for the deterministic test decode of other payloads, or "
            "supply decode_fn(format, bytes) -> (wave, sample_rate) to "
            "plug an external decoder in")
    seed = np.frombuffer((payload or b"\0")[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(seed)
    return rng.standard_normal(1600).astype(np.float32), 16000


def audio_features(df: DataFrame, binary_col: str = "audio",
                   fake: bool = True, on_error: str = "raise",
                   decode_fn=None) -> DataFrame:
    """RMS energy + zero-crossing rate + duration via mapInPandas.
    ``on_error="null"`` nulls undecodable payloads (+ ``decode_error``
    column) instead of failing the task — see image_features."""
    extra = [T.StructField("audio_rms", T.DoubleType()),
             T.StructField("audio_zcr", T.DoubleType()),
             T.StructField("audio_seconds", T.DoubleType())]
    out_schema, has_prev_err = _error_schema(df, on_error, extra)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms, zcr, secs, errs = [], [], [], []
            for payload in pdf[binary_col]:
                if payload is None:
                    rms.append(None); zcr.append(None); secs.append(None)
                    errs.append(None)
                    continue
                try:
                    wave, sr = _decode_audio(bytes(payload), fake,
                                             decode_fn)
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise
                    rms.append(None); zcr.append(None); secs.append(None)
                    errs.append(str(e))
                    continue
                errs.append(None)
                rms.append(float(np.sqrt((wave ** 2).mean())))
                zcr.append(float((np.diff(np.sign(wave)) != 0).mean()))
                secs.append(len(wave) / sr)
            out = pdf.copy()
            out["audio_rms"], out["audio_zcr"], out["audio_seconds"] = rms, zcr, secs
            _merge_errors(out, pdf, errs, on_error, has_prev_err)
            yield out

    return df.mapInPandas(run, schema=out_schema)


AUDIO_RESAMPLE_META = T.StructType([
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("seconds", T.DoubleType()),
])


def audio_resample(df: DataFrame, binary_col: str = "audio",
                   target_rate: int = 16_000, fake: bool = True,
                   on_error: str = "raise", decode_fn=None) -> DataFrame:
    """Normalize audio to ``target_rate`` mono float32 PCM — the
    16 kHz-mono conditioning step every speech-training pipeline runs
    before feature extraction. Binary in -> binary out
    (``audio_resampled``: little-endian float32 samples) + an
    ``audio_resample_meta`` struct (sample_rate, n_samples, seconds).

    Resampling is linear interpolation on the decoded mono wave
    (sample i of the output reads source position i*src/target): exact
    for constant signals, transparent for upsampling and mild ratios;
    it applies NO anti-aliasing low-pass, so high-ratio DOWNSAMPLING of
    content near the new Nyquist aliases — plug a DSP decoder through
    ``decode_fn`` when that matters. ``target_rate == source rate``
    passes samples through untouched. ``on_error="null"`` nulls
    undecodable payloads and carries the shared ``decode_error``
    column (same contract as image_features/audio_features)."""
    if target_rate < 1:
        raise ValueError(f"target_rate must be >= 1, got {target_rate}")
    extra = [T.StructField("audio_resampled", T.BinaryType()),
             T.StructField("audio_resample_meta", AUDIO_RESAMPLE_META)]
    out_schema, has_prev_err = _error_schema(df, on_error, extra)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas, errs = [], [], []
            for payload in pdf[binary_col]:
                if payload is None:
                    blobs.append(None); metas.append(None)
                    errs.append(None)
                    continue
                try:
                    wave, sr = _decode_audio(bytes(payload), fake,
                                             decode_fn)
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise
                    blobs.append(None); metas.append(None)
                    errs.append(str(e))
                    continue
                errs.append(None)
                if sr != target_rate and wave.size:
                    n_out = max(1, round(wave.size * target_rate / sr))
                    pos = np.arange(n_out, dtype=np.float64) * (sr / target_rate)
                    wave = np.interp(pos, np.arange(wave.size,
                                                    dtype=np.float64),
                                     wave.astype(np.float64)) \
                        .astype(np.float32)
                blobs.append(wave.astype("<f4").tobytes())
                metas.append({"sample_rate": int(target_rate),
                              "n_samples": int(wave.size),
                              "seconds": wave.size / float(target_rate)})
            out = pdf.copy()
            out["audio_resampled"], out["audio_resample_meta"] = blobs, metas
            _merge_errors(out, pdf, errs, on_error, has_prev_err)
            yield out

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
def video_frame_sample(df: DataFrame, binary_col: str = "video",
                       every_n: int = 30, fake: bool = True,
                       max_frames: int = 256, decode_fn=None) -> DataFrame:
    """Frame sampling: one output row per sampled frame (explode-shaped
    mapInPandas — output cardinality > input is part of the tested
    contract). The REAL path (``fake=False``) decodes ANIMATED GIFs via
    the vendored composited-frame decoder and AVI files (motion-JPEG
    and uncompressed-DIB streams) via the vendored RIFF container
    codec — every_n-th full-canvas frame re-encoded as BMP binary,
    ``max_frames`` bounding the decode of pathological files; codec
    video containers (MP4/WebM) still raise — that remains the ffmpeg
    seam (their dimensions/duration are available decode-free via
    ``media_metadata``)."""
    key_fields = [f for f in df.schema.fields if f.name != binary_col]
    out_schema = T.StructType(
        key_fields
        + [T.StructField("frame_no", T.IntegerType()),
           T.StructField("frame", T.BinaryType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[binary_col]
                if payload is None:
                    continue
                if not fake:
                    from .codecs import (
                        decode_avi_frames, decode_gif_frames, encode_bmp,
                    )

                    payload = bytes(payload)
                    if payload[:6] in (b"GIF87a", b"GIF89a"):
                        frames, _ = decode_gif_frames(
                            payload, max_frames=max_frames)
                    elif (payload[:4] == b"RIFF"
                          and payload[8:12] == b"AVI "):
                        frames, _ = decode_avi_frames(
                            payload, max_frames=max_frames)
                    elif decode_fn is not None and (res := decode_fn(
                            sniff_format(payload), payload)) is not None:
                        # decoder-injection seam: ffmpeg users return a
                        # frame list for MP4/WebM; max_frames still caps
                        frames = [np.asarray(f, dtype=np.uint8)
                                  for f in res][:max_frames]
                    else:
                        raise NotImplementedError(
                            "only animated-GIF and AVI (MJPG / DIB) "
                            "frames decode without ffmpeg (not in this "
                            "container); pass fake=True for the "
                            "deterministic test decode of other payloads")
                    for fno in range(0, len(frames), every_n):
                        rec = {f.name: r[f.name] for f in key_fields}
                        rec["frame_no"] = fno
                        rec["frame"] = encode_bmp(frames[fno])
                        rows.append(rec)
                    continue
                seed = np.frombuffer(bytes(payload)[:8].ljust(8, b"\0"),
                                     dtype=np.uint64)[0]
                n_frames = int(seed % 120) + 1
                for fno in range(0, n_frames, every_n):
                    rec = {f.name: r[f.name] for f in key_fields}
                    rec["frame_no"] = fno
                    rec["frame"] = _decode_image(
                        bytes(payload) + fno.to_bytes(4, "little"), True).tobytes()
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)
