"""WARC source reader — the Common Crawl front door.

Web-corpus pipelines (C4, RefinedWeb, Gopher, FineWeb) all start from
WARC archives: concatenated ``WARC/1.x`` records, usually stored as
per-record gzip members so a reader can skip without decompressing the
whole file. This reader turns a directory of ``.warc`` / ``.warc.gz``
files into a DataFrame of records ready for the rest of the pipeline
(``operators.html.extract_documents`` → ``operators.urlops`` →
dedup/quality gates).

Shape: ONE ``binaryFile`` scan (one task per file — exactly how
production crawl processing parallelizes, since WARC is not
block-splittable) → an Arrow-batched ``mapInPandas`` generator that
yields record batches as it parses, so peak memory per task is the
compressed file plus one decompressed record, never the decompressed
file. Multi-member gzip is handled by stdlib ``gzip`` (it reads
concatenated members natively).

Per record we emit the WARC envelope fields plus, for ``response``
records, the parsed HTTP layer (status, Content-Type, body). Payloads
are capped at ``max_payload_bytes`` (truncation flagged, never an
error) — a corpus pass wants bounded rows, not 2 GB favicon bombs.

Malformed input contract: a file that does not start with a WARC
version line raises ``ValueError`` naming the file; a structurally
broken record mid-file stops that file's parse and, under the default
``on_error="truncate"``, keeps the records already parsed (the
standard posture for crawl data, where truncated tails are routine);
``on_error="raise"`` escalates instead.

Reference analogue: none (beyond-reference source per SURVEY.md §2.10;
the reference ingests from a live keyspace, not archives).
"""
from __future__ import annotations

import gzip
import io
import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, types as T

WARC_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("record_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("payload_truncated", T.BooleanType()),
])


def _header_block(stream) -> dict[str, str] | None:
    """Read one CRLF-terminated header block; None at clean EOF."""
    line = stream.readline()
    while line in (b"\r\n", b"\n"):          # inter-record blank lines
        line = stream.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {line[:40]!r}")
    headers: dict[str, str] = {}
    while True:
        line = stream.readline()
        if line in (b"\r\n", b"\n", b""):
            return headers
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("utf-8", "replace")


def _parse_http(payload: bytes):
    """Split an HTTP response into (status, content_type, body).
    Non-HTTP payloads come back as (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    # whichever header/body separator occurs FIRST wins — an LF-header
    # response whose body merely contains CRLFCRLF must not split there
    crlf = payload.find(b"\r\n\r\n")
    lf = payload.find(b"\n\n")
    if crlf < 0 and lf < 0:
        return None, None, payload
    if crlf >= 0 and (lf < 0 or crlf <= lf):
        sep, nl = crlf, b"\r\n"
    else:
        sep, nl = lf, b"\n"
    head, body = payload[:sep], payload[sep + 2 * len(nl):]
    lines = head.split(nl)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        if ln.lower().startswith(b"content-type:"):
            ctype = ln.split(b":", 1)[1].strip() \
                .decode("utf-8", "replace")
            break
    return status, ctype, body


def _list_warc_files(path: str) -> list[str]:
    """Shared archive discovery: a directory lists ``*.warc*`` inside
    it, anything else is treated as a glob."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        files = sorted(_glob.glob(_os.path.join(path, "*.warc*")))
    else:
        files = sorted(_glob.glob(path))
    if not files:
        raise FileNotFoundError(f"no .warc files under {path}")
    return files


def _iter_records(raw: bytes, fname: str, record_types, cap: int,
                  on_error: str):
    stream: io.BufferedIOBase
    if raw[:2] == b"\x1f\x8b":
        # stdlib gzip reads concatenated members (the per-record-gzip
        # WARC layout) as one stream
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))  # type: ignore
    else:
        stream = io.BytesIO(raw)
    yield from _iter_stream_records(stream, fname, record_types, cap,
                                    on_error)


def _iter_stream_records(stream, fname: str, record_types, cap: int,
                         on_error: str):
    first = True
    while True:
        try:
            headers = _header_block(stream)
            if headers is None:
                return
            length = int(headers.get("content-length", "0"))
            payload = stream.read(length)
            if len(payload) != length:
                raise ValueError("truncated record payload")
        except (ValueError, EOFError, OSError) as e:
            if first or on_error == "raise":
                raise ValueError(f"{fname}: {e}") from e
            return                            # keep what parsed so far
        first = False
        rtype = headers.get("warc-type", "")
        if record_types is not None and rtype not in record_types:
            continue
        status, ctype, body = (None, None, payload)
        if rtype in ("response", "revisit"):
            status, ctype, body = _parse_http(payload)
        elif rtype == "conversion":
            ctype = headers.get("content-type")
        truncated = len(body) > cap
        yield {
            "warc_file": fname,
            "record_id": headers.get("warc-record-id"),
            "record_type": rtype,
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": status,
            "content_type": ctype,
            "payload": body[:cap],
            "payload_truncated": truncated,
        }


def read_warc(spark: SparkSession, path: str, *,
              record_types=("response",),
              max_payload_bytes: int = 1 << 20,
              on_error: str = "truncate",
              batch_rows: int = 200) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` files under ``path`` into a record
    DataFrame (schema: ``WARC_SCHEMA``). ``record_types=None`` keeps
    every record type (warcinfo/request/metadata included). Records
    stream out in ``batch_rows`` batches, so task memory is bounded by
    the compressed file + one record, not the decompressed archive."""
    if on_error not in ("truncate", "raise"):
        raise ValueError("on_error must be 'truncate' or 'raise'")
    rtypes = tuple(record_types) if record_types is not None else None
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path)
             .select("path", "content"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            for fname, raw in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in _iter_records(bytes(raw), fname, rtypes,
                                         max_payload_bytes, on_error):
                    rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, WARC_SCHEMA)


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: TRUE record streaming from disk.
#
# The binaryFile path above materializes each compressed archive in
# task memory and inherits binaryFile's 2 GB-per-file cap. This
# DataSource streams records straight from a file handle (memory = one
# record, any archive size) — the idiomatic Spark 4 shape for a
# non-splittable record format. Partitioning is identical: one input
# partition per archive. Local/shared-filesystem paths only (workers
# `open()` the path); object stores stay on the binaryFile path, which
# reads through Hadoop.

def _warc_datasource_classes():
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition)

    class _WarcReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("warc datasource requires a path")
            rt = options.get("record_types", "response")
            self.record_types = (None if rt in ("*", "all")
                                 else tuple(rt.split(",")))
            self.cap = int(options.get("max_payload_bytes", 1 << 20))
            self.on_error = options.get("on_error", "truncate")

        def partitions(self):
            return [InputPartition(f)
                    for f in _list_warc_files(self.path)]

        def read(self, partition):
            fname = partition.value
            with open(fname, "rb") as fh:
                head = fh.read(2)
                fh.seek(0)
                stream = (gzip.GzipFile(fileobj=fh)
                          if head == b"\x1f\x8b" else fh)
                for rec in _iter_stream_records(
                        stream, fname, self.record_types, self.cap,
                        self.on_error):
                    yield tuple(rec[f.name] for f in WARC_SCHEMA.fields)

    class WarcDataSource(DataSource):
        """``spark.read.format("warc").load(path)`` after
        ``register_warc_datasource(spark)``."""

        @classmethod
        def name(cls):
            return "warc"

        def schema(self):
            return WARC_SCHEMA

        def reader(self, schema):
            return _WarcReader(self.options)

    return WarcDataSource


def register_warc_datasource(spark: SparkSession) -> None:
    """Register the streaming ``warc`` format on this session."""
    spark.dataSource.register(_warc_datasource_classes())


def read_warc_stream(spark: SparkSession, path: str, *,
                     record_types=("response",),
                     max_payload_bytes: int = 1 << 20,
                     on_error: str = "truncate") -> DataFrame:
    """`read_warc`, but through the streaming DataSource (see note
    above): records stream from worker-local file handles, so archives
    of any size parse in bounded memory."""
    if on_error not in ("truncate", "raise"):
        raise ValueError("on_error must be 'truncate' or 'raise'")
    register_warc_datasource(spark)
    rt = ",".join(record_types) if record_types is not None else "*"
    return (spark.read.format("warc")
            .option("record_types", rt)
            .option("max_payload_bytes", str(max_payload_bytes))
            .option("on_error", on_error)
            .load(path))


def warc_html_documents(spark: SparkSession, path: str,
                        **read_kwargs) -> DataFrame:
    """The composed crawl front door: WARC response records with an
    HTML Content-Type, decoded as UTF-8 (LOSSY — replacement chars,
    never an error) into an ``html`` column keyed by ``target_uri`` —
    feed straight into ``operators.html.extract_documents`` +
    ``operators.urlops``.

    The decode is an Arrow map, not ``F.decode``: under ANSI mode the
    JVM decode raises MALFORMED_CHARACTER_CODING on the first
    legacy-encoded or truncation-cut page, and real crawls always
    contain some."""
    from pyspark.sql import functions as F

    @F.pandas_udf(T.StringType())
    def _lossy_utf8(payloads: pd.Series) -> pd.Series:
        return payloads.map(
            lambda b: bytes(b).decode("utf-8", errors="replace")
            if b is not None else None)

    recs = read_warc(spark, path, **read_kwargs)
    return (recs
            .where(F.col("record_type") == "response")
            .where(F.col("http_status") == 200)
            .where(F.coalesce(F.col("content_type"), F.lit(""))
                   .contains("html"))
            .select(F.col("target_uri").alias("url"),
                    F.col("warc_date"),
                    _lossy_utf8(F.col("payload")).alias("html"),
                    "payload_truncated"))


# ---------------------------------------------------------------------------
# CDX(J) capture index + ranged record fetch — the Common Crawl
# selective-fetch workflow: query the index for interesting captures
# (URL/status/MIME filters pushed to a cheap columnar scan), then fetch
# ONLY those records by (archive, offset, length) instead of parsing
# whole archives. Each per-record gzip member decompresses
# independently, which is exactly why the CC layout is per-record gzip.

CDX_SCHEMA = T.StructType([
    T.StructField("surt_key", T.StringType()),
    T.StructField("timestamp", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.LongType()),
    T.StructField("offset", T.LongType()),
    T.StructField("filename", T.StringType()),
])


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ capture-index lines (``surt timestamp {json}`` — the
    Common Crawl cdx-00000.gz layout; gzip handled natively by the
    text reader) into ``CDX_SCHEMA``. Filters on url/status/mime stay
    a cheap text scan — no archive bytes move until
    ``fetch_warc_records``."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ", 3)
    j = F.from_json(
        F.element_at(parts, 3),
        "url STRING, mime STRING, status STRING, digest STRING, "
        "length STRING, offset STRING, filename STRING")
    return lines.select(
        F.nullif(F.element_at(parts, 1), F.lit("-")).alias("surt_key"),
        F.nullif(F.element_at(parts, 2), F.lit("-")).alias("timestamp"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("long").alias("length"),
        j["offset"].cast("long").alias("offset"),
        j["filename"].alias("filename"))


def _iter_gzip_members(fh, chunk: int = 1 << 16):
    """Yield ``(offset, compressed_length, decompressed_bytes)`` per
    gzip member of a concatenated-member file, reading in bounded
    chunks — peak memory is one decompressed member."""
    import zlib

    offset = 0
    tail = b""
    while True:
        if not tail:
            tail = fh.read(chunk)
            if not tail:
                return
        d = zlib.decompressobj(31)
        out = bytearray()
        fed = 0
        while not d.eof:
            if not tail:
                tail = fh.read(chunk)
                if not tail:
                    raise ValueError("truncated gzip member")
            fed += len(tail)
            out += d.decompress(tail)
            tail = b""
        tail = d.unused_data
        member_len = fed - len(tail)
        yield offset, member_len, bytes(out)
        offset += member_len


def _surt_key(uri: str | None) -> str | None:
    """SURT: reversed host labels (userinfo dropped, port kept after
    the labels, per the convention) + the path/query tail."""
    if not uri or "://" not in uri:
        return None
    rest = uri.split("://", 1)[1]
    auth = rest.split("/", 1)[0].split("?")[0]
    host = auth.rsplit("@", 1)[-1]
    port = ""
    if not host.startswith("[") and ":" in host:
        host, _, port = host.partition(":")
        port = ":" + port
    return (",".join(reversed(host.lower().split("."))) + port + ")" +
            rest[len(auth):])


def _index_one_file(fname: str, on_error: str):
    """CDX rows for one archive: true byte (offset, length) per WARC
    record, both layouts. Gzip-member archives index member
    boundaries; plain archives index stream positions. A truncated
    tail keeps the rows already indexed under ``on_error="truncate"``
    (the same contract as the readers)."""
    rows = []

    def add(headers: dict, http, off: int, ln: int):
        status, ctype = http
        uri = headers.get("warc-target-uri")
        date = headers.get("warc-date", "")
        digits = "".join(c for c in date if c.isdigit())
        rows.append({
            "surt_key": _surt_key(uri),
            "timestamp": digits[:14],      # the 14-digit CC form;
            # fractional seconds / tz offsets truncate away
            "url": uri, "mime": ctype, "status": status,
            "digest": headers.get("warc-payload-digest"),
            "length": ln, "offset": off, "filename": fname,
        })

    def headers_and_http(stream):
        headers = _header_block(stream)
        if headers is None:
            return None, (None, None)
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated record payload")
        if headers.get("warc-type") in ("response", "revisit"):
            status, ctype, _ = _parse_http(payload)
        else:
            status, ctype = None, headers.get("content-type")
        return headers, (status, ctype)

    try:
        with open(fname, "rb") as fh:
            if fh.read(2) == b"\x1f\x8b":
                fh.seek(0)
                for off, ln, blob in _iter_gzip_members(fh):
                    stream = io.BytesIO(blob)
                    while True:  # usually exactly one record per member
                        h, http = headers_and_http(stream)
                        if h is None:
                            break
                        add(h, http, off, ln)
            else:
                fh.seek(0)
                while True:
                    # skip inter-record blank lines so offset points at
                    # the WARC/ version line (fetch tolerates either)
                    pos = fh.tell()
                    line = fh.readline()
                    while line in (b"\r\n", b"\n"):
                        pos = fh.tell()
                        line = fh.readline()
                    if not line:
                        break
                    fh.seek(pos)
                    h, http = headers_and_http(fh)
                    if h is None:
                        break
                    add(h, http, pos, fh.tell() - pos)
    except (ValueError, EOFError, OSError) as e:
        if not rows or on_error == "raise":
            raise ValueError(f"{fname}: {e}") from e
        # truncated tail: keep what indexed, like the readers do
    return rows


def index_warc(spark: SparkSession, path: str,
               on_error: str = "truncate") -> DataFrame:
    """Build the CDX capture index for every archive under ``path`` —
    the pay-once pass that makes every later fetch selective. One task
    per archive (repartitioned so big archive sets parallelize),
    bounded memory (one gzip member / one record). A truncated tail
    keeps that file's indexed prefix under the default
    ``on_error="truncate"`` (one bad archive must not kill a
    100k-archive indexing job); ``"raise"`` escalates."""
    if on_error not in ("truncate", "raise"):
        raise ValueError("on_error must be 'truncate' or 'raise'")
    files = _list_warc_files(path)
    fdf = spark.createDataFrame([(f,) for f in files], "f string") \
        .repartition(len(files))

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CDX_SCHEMA.fields]
        for pdf in batches:
            for fname in pdf["f"]:
                rows = _index_one_file(fname, on_error)
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return fdf.mapInPandas(go, CDX_SCHEMA)


def write_cdx(index: DataFrame, path: str, mode: str = "error") -> None:
    """Persist an ``index_warc`` frame as CDXJ text lines (the Common
    Crawl cdx layout ``read_cdx`` parses back)."""
    from pyspark.sql import functions as F

    # '-' placeholders (the CDX convention) keep uri-less records —
    # warcinfo rows in every archive — three-field lines; concat_ws
    # would silently SKIP a null and emit an unparseable 2-field line
    out = index.select(F.concat_ws(
        " ",
        F.coalesce(F.col("surt_key"), F.lit("-")),
        F.coalesce(F.col("timestamp"), F.lit("-")),
        F.to_json(F.struct(
            F.col("url"),
            F.col("mime"),
            F.col("status").cast("string").alias("status"),
            F.col("digest"),
            F.col("length").cast("string").alias("length"),
            F.col("offset").cast("string").alias("offset"),
            F.col("filename"))),
    ).alias("value"))
    out.write.mode(mode).text(path)


def fetch_warc_records(spark: SparkSession, captures: DataFrame, *,
                       max_payload_bytes: int = 1 << 20,
                       batch_rows: int = 200) -> DataFrame:
    """Fetch exactly the records a CDX query selected: one seek +
    bounded read per capture (``filename/offset/length`` columns),
    each per-record gzip member decompressed independently. The
    captures frame repartitions by archive so one task streams one
    file's selections in offset order — sequential I/O, no whole-file
    parse. Plain (non-gzip-member) archives work too: the slice is
    raw bytes."""
    from pyspark.sql import functions as F

    has_url = "url" in captures.columns
    has_status = "status" in captures.columns
    cols_sel = (["filename", "offset", "length"]
                + (["url"] if has_url else [])
                + (["status"] if has_status else []))
    sel = (captures
           .select(*cols_sel)
           .repartition(F.col("filename"))
           # length in the sort keeps identical minimal captures
           # ADJACENT, so the slice cache + duplicate-slice dedupe see
           # them (offset alone would let two same-offset slices
           # interleave)
           .sortWithinPartitions("filename", "offset", "length"))

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        rows: list[dict] = []
        fh = None
        fh_name = None

        def norm_status(x):
            return None if x is None or pd.isna(x) else int(x)

        last_slice = None        # (fname, off, length) -> parsed recs
        last_recs: list[dict] = []
        try:
            for pdf in batches:
                urls = pdf["url"] if has_url else [None] * len(pdf)
                stats = pdf["status"] if has_status else [None] * len(pdf)
                for fname, off, length, url, status in zip(
                        pdf["filename"], pdf["offset"], pdf["length"],
                        urls, stats):
                    status = norm_status(status)
                    if url is not None and pd.isna(url):
                        url = None
                    key = (fname, int(off), int(length))
                    if key != last_slice:
                        if fh_name != fname:
                            if fh is not None:
                                fh.close()
                            fh = open(fname, "rb")
                            fh_name = fname
                        fh.seek(int(off))
                        blob = fh.read(int(length))
                        if blob[:2] == b"\x1f\x8b":
                            blob = gzip.decompress(blob)
                        last_recs = list(_iter_stream_records(
                            io.BytesIO(blob), str(fname), None,
                            max_payload_bytes, "raise"))
                        last_slice = key     # N captures of one
                        # whole-file-gzip member parse it ONCE
                    elif not has_url and not has_status:
                        # minimal captures (no url/status columns) sort
                        # adjacent per slice; a repeat capture of the
                        # same slice has nothing to disambiguate WHICH
                        # record it means, so emitting again would
                        # duplicate every record in a whole-file-gzip
                        # member — dedupe the slice instead
                        continue
                    for rec in last_recs:
                        # a slice usually holds exactly one record; a
                        # whole-file-gzip member holds several — the
                        # capture's url + status pick the right one
                        # (a request shares its response's url but has
                        # no HTTP status; a null-url capture matches
                        # only uri-less records like warcinfo)
                        if has_url and rec["target_uri"] != url:
                            continue
                        if has_status and \
                                rec["http_status"] != status:
                            continue
                        rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
            if rows:
                yield pd.DataFrame(rows, columns=cols)
        finally:
            if fh is not None:
                fh.close()

    return sel.mapInPandas(fetch, WARC_SCHEMA)


# ---------------------------------------------------------------------------
# WARC writer (Spark 4 Python DataSourceWriter): export a curated
# corpus back to the archive format the rest of the ecosystem reads —
# the symmetric close of the source. One .warc.gz per task, per-record
# gzip members (the Common Crawl layout, so the output is immediately
# index_warc-able), task files named uniquely and removed on abort.


def _build_warc_record(row: dict) -> bytes:
    """One WARC record from a WARC_SCHEMA-shaped row. Response rows
    (http_status set) are re-wrapped in a minimal HTTP envelope so a
    later read_warc parses status/content-type back out; others write
    their payload verbatim."""
    payload = bytes(row.get("payload") or b"")
    rtype = row.get("record_type") or "resource"
    status = row.get("http_status")
    ctype = row.get("content_type")
    warc_ctype = None
    if rtype in ("response", "revisit") and status is not None:
        head = f"HTTP/1.1 {int(status)} \r\n"
        if ctype:
            head += f"Content-Type: {ctype}\r\n"
        head += f"Content-Length: {len(payload)}\r\n\r\n"
        payload = head.encode() + payload
        # the WARC-level media type ecosystem tools (warcio/pywb) key
        # HTTP parsing off — without it the payload is opaque bytes
        warc_ctype = "application/http; msgtype=response"
    elif rtype == "request":
        warc_ctype = "application/http; msgtype=request"
    elif ctype:
        warc_ctype = ctype
    h = ["WARC/1.0", f"WARC-Type: {rtype}"]
    rid = row.get("record_id")
    if not rid:
        import uuid

        rid = f"<urn:uuid:{uuid.uuid4()}>"
    h.append(f"WARC-Record-ID: {rid}")
    date = row.get("warc_date") or "1970-01-01T00:00:00Z"
    h.append(f"WARC-Date: {date}")
    uri = row.get("target_uri")
    if uri:
        h.append(f"WARC-Target-URI: {uri}")
    if warc_ctype:
        h.append(f"Content-Type: {warc_ctype}")
    h.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(h) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _warc_write_datasource_classes():
    from dataclasses import dataclass

    from pyspark.sql.datasource import (DataSource, DataSourceWriter,
                                        WriterCommitMessage)

    @dataclass
    class _Done(WriterCommitMessage):
        file: str
        records: int

    class _WarcWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("warc writer requires a path")
            if overwrite and os.path.isdir(self.path):
                import glob as _glob

                # match the READER's discovery glob, or stale plain
                # .warc archives would survive and re-appear in reads;
                # clear orphaned in-progress files too
                for f in (_glob.glob(os.path.join(self.path, "*.warc*"))
                          + _glob.glob(os.path.join(self.path,
                                                    ".*.inprogress"))):
                    os.remove(f)

        def write(self, it):
            import uuid

            os.makedirs(self.path, exist_ok=True)
            # write under an in-progress name the reader glob
            # ("*.warc*") can never match, rename on task success: a
            # killed/retried task leaves only an orphaned .inprogress
            # file that reads ignore and commit() sweeps
            base = f"part-{uuid.uuid4().hex}.warc.gz"
            tmp = os.path.join(self.path, f".{base}.inprogress")
            n = 0
            with open(tmp, "wb") as fh:
                for row in it:
                    fh.write(gzip.compress(
                        _build_warc_record(row.asDict())))
                    n += 1
            if n == 0:
                os.remove(tmp)
                return _Done("", 0)
            final = os.path.join(self.path, base)
            os.rename(tmp, final)
            return _Done(final, n)

        def commit(self, messages):
            # task files are final; sweep orphans from failed attempts
            import glob as _glob

            for f in _glob.glob(os.path.join(self.path,
                                             ".*.inprogress")):
                try:
                    os.remove(f)
                except OSError:
                    pass
            return None

        def abort(self, messages):
            for m in messages:
                if m is not None and m.file:
                    try:
                        os.remove(m.file)
                    except OSError:
                        pass

    class WarcWriteDataSource(DataSource):
        @classmethod
        def name(cls):
            return "warc_out"

        def writer(self, schema, overwrite: bool):
            return _WarcWriter(self.options, overwrite)

    return WarcWriteDataSource



def write_warc(df: DataFrame, path: str,
               mode: str = "append") -> None:
    """Write a WARC_SCHEMA-shaped frame (``read_warc``'s output, or
    anything with target_uri/payload [+ record_type/http_status/
    content_type/record_id/warc_date]) as per-record-gzip ``.warc.gz``
    archives under ``path`` — one archive per task, immediately
    readable by ``read_warc``/``read_warc_stream`` and indexable by
    ``index_warc``. Modes: ``append`` (default — task files are
    uniquely named) or ``overwrite`` (clears existing ``.warc.gz``
    first)."""
    spark = df.sparkSession
    spark.dataSource.register(_warc_write_datasource_classes())
    df.write.format("warc_out").mode(mode).save(path)
