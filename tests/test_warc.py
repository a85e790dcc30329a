"""WARC reader: independent forward writer pin (stdlib-built archives),
gzip member layout, HTTP parsing, truncation/malformed contracts, and
the composed WARC -> html -> url pipeline."""
from __future__ import annotations

import gzip

import pytest

from pyspark.sql import functions as F

from valkey_search_spark.sources.warc import read_warc, warc_html_documents


# ---------------------------------------------------------------------------
# independent forward WARC writer (stdlib only — the reader never sees it)

def _record(rtype: str, rid: str, payload: bytes, uri: str | None = None,
            extra: dict | None = None) -> bytes:
    h = ["WARC/1.0",
         f"WARC-Type: {rtype}",
         f"WARC-Record-ID: <urn:uuid:{rid}>",
         "WARC-Date: 2026-01-02T03:04:05Z"]
    if uri:
        h.append(f"WARC-Target-URI: {uri}")
    for k, v in (extra or {}).items():
        h.append(f"{k}: {v}")
    h.append(f"Content-Length: {len(payload)}")
    head = "\r\n".join(h).encode() + b"\r\n\r\n"
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200,
          ctype: str = "text/html; charset=utf-8") -> bytes:
    return (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def _archive(pages: list[tuple[str, bytes, int, str]],
             gzipped: bool, per_member: bool = True) -> bytes:
    recs = [_record("warcinfo", "info-0", b"software: test\r\n")]
    for i, (uri, body, status, ctype) in enumerate(pages):
        recs.append(_record("request", f"req-{i}",
                            b"GET / HTTP/1.1\r\n\r\n", uri))
        recs.append(_record("response", f"resp-{i}",
                            _http(body, status, ctype), uri))
    if not gzipped:
        return b"".join(recs)
    if per_member:                      # the real Common Crawl layout
        return b"".join(gzip.compress(r) for r in recs)
    return gzip.compress(b"".join(recs))


_PAGES = [
    ("https://example.com/a", b"<html><title>A</title><p>alpha beta</p>"
     b"</html>", 200, "text/html; charset=utf-8"),
    ("https://example.com/b?utm_source=x&q=1",
     "<html><p>gamma &amp; delta é</p></html>".encode(), 200,
     "text/html"),
    ("https://example.com/c", b"{\"k\": 1}", 200, "application/json"),
    ("https://example.com/d", b"gone", 404, "text/html"),
]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "plain.warc").write_bytes(_archive(_PAGES[:2], gzipped=False))
    (d / "members.warc.gz").write_bytes(
        _archive(_PAGES[2:], gzipped=True, per_member=True))
    (d / "whole.warc.gz").write_bytes(
        _archive([_PAGES[0]], gzipped=True, per_member=False))
    (d / "ignored.txt").write_bytes(b"not a warc")
    return str(d)


# ---------------------------------------------------------------------------
def test_reads_all_layouts_and_filters_responses(spark, warc_dir):
    rows = read_warc(spark, warc_dir).collect()
    # 2 + 2 + 1 response records; requests/warcinfo filtered by default
    assert len(rows) == 5
    assert {r.record_type for r in rows} == {"response"}
    by_uri = {}
    for r in rows:
        by_uri.setdefault(r.target_uri, []).append(r)
    a = by_uri["https://example.com/a"]
    assert len(a) == 2                       # plain + whole-gzip copies
    assert all(r.http_status == 200 for r in a)
    assert all(r.payload == _PAGES[0][1] for r in a)
    assert all("text/html" in r.content_type for r in a)
    d = by_uri["https://example.com/d"][0]
    assert d.http_status == 404 and d.payload == b"gone"
    j = by_uri["https://example.com/c"][0]
    assert j.content_type == "application/json"
    assert all(r.warc_date == "2026-01-02T03:04:05Z" for r in rows)
    assert all(r.record_id.startswith("<urn:uuid:resp-") for r in rows)
    assert all(not r.payload_truncated for r in rows)


def test_record_type_selection(spark, warc_dir):
    all_rows = read_warc(spark, warc_dir, record_types=None).collect()
    types = sorted({r.record_type for r in all_rows})
    assert types == ["request", "response", "warcinfo"]
    reqs = read_warc(spark, warc_dir, record_types=("request",)).collect()
    assert len(reqs) == 5 and all(r.http_status is None for r in reqs)


def test_payload_cap_flags_truncation(spark, warc_dir):
    rows = read_warc(spark, warc_dir, max_payload_bytes=10).collect()
    big = [r for r in rows if r.target_uri == "https://example.com/a"][0]
    assert big.payload_truncated and len(big.payload) == 10
    small = [r for r in rows if r.target_uri == "https://example.com/d"][0]
    assert not small.payload_truncated and small.payload == b"gone"


def test_malformed_contracts(spark, tmp_path):
    good = _archive(_PAGES[:1], gzipped=False)
    (tmp_path / "cut.warc").write_bytes(good + b"WARC/1.0\r\n"
                                        b"WARC-Type: response\r\n"
                                        b"Content-Length: 999\r\n\r\nstub")
    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 1                    # parsed prefix kept
    with pytest.raises(Exception, match="truncated record payload"):
        read_warc(spark, str(tmp_path), on_error="raise").collect()
    (tmp_path / "cut.warc").write_bytes(b"GARBAGE not warc")
    with pytest.raises(Exception, match="not a WARC record header"):
        read_warc(spark, str(tmp_path)).collect()
    with pytest.raises(ValueError):
        read_warc(spark, str(tmp_path), on_error="nope")


def test_streamed_batches_bound_memory(spark, tmp_path):
    # 500 records through batch_rows=50 -> the generator yields many
    # small batches; row count and order-insensitive content survive
    pages = [(f"https://s.com/{i}", f"<p>doc {i}</p>".encode(), 200,
              "text/html") for i in range(500)]
    (tmp_path / "big.warc.gz").write_bytes(
        _archive(pages, gzipped=True, per_member=True))
    out = read_warc(spark, str(tmp_path), batch_rows=50)
    assert out.count() == 500
    uris = {r.target_uri for r in out.select("target_uri").collect()}
    assert uris == {p[0] for p in pages}


# ---------------------------------------------------------------------------
def test_composed_crawl_front_door(spark, warc_dir):
    from valkey_search_spark.operators.html import extract_documents
    from valkey_search_spark.operators.urlops import normalize_url

    docs = warc_html_documents(spark, warc_dir)
    rows = docs.collect()
    # json + 404 filtered; html responses survive (a twice: two layouts)
    assert sorted(r.url for r in rows) == [
        "https://example.com/a", "https://example.com/a",
        "https://example.com/b?utm_source=x&q=1"]
    out = extract_documents(docs, html_col="html") \
        .withColumn("norm_url", normalize_url(F.col("url"))) \
        .collect()
    by_url = {r.norm_url: r for r in out}
    assert by_url["https://example.com/a"].text == "alpha beta"
    assert by_url["https://example.com/a"].title == "A"
    b = by_url["https://example.com/b?q=1"]   # tracking param stripped
    assert b.text == "gamma & delta é"   # entity + utf-8 survived


def test_non_utf8_html_decodes_lossily(spark, tmp_path):
    # latin-1 page + a UTF-8 page cut mid-multibyte by the payload cap:
    # both must decode with replacement chars, never raise (ANSI mode
    # makes F.decode fatal on these — review finding)
    latin = "<html><p>caf\xe9 latin</p></html>".encode("latin-1")
    cut = ("<html><p>" + "x" * 5 + "é</p></html>").encode("utf-8")
    arc = (_record("response", "l1", _http(latin), "https://l.com/1")
           + _record("response", "l2", _http(cut), "https://l.com/2"))
    (tmp_path / "enc.warc").write_bytes(arc)
    # cap = 15 body bytes: cuts the second page exactly mid-é (C3|A9)
    rows = warc_html_documents(spark, str(tmp_path),
                               max_payload_bytes=15) \
        .orderBy("url").collect()
    assert len(rows) == 2
    assert rows[0].html == "<html><p>caf� l"       # latin-1 é -> U+FFFD
    assert rows[1].payload_truncated
    assert rows[1].html == "<html><p>xxxxx�"       # dangling lead byte


def test_lf_headers_with_crlf_in_body(spark, tmp_path):
    # bare-LF HTTP headers whose BODY contains CRLFCRLF: the split must
    # take the FIRST separator (the LF one), not the body's CRLF pair
    body = b"before\r\n\r\nafter"
    http = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\n" + body
    (tmp_path / "lf.warc").write_bytes(
        _record("response", "r1", http, "https://lf.com/x"))
    r = read_warc(spark, str(tmp_path)).first()
    assert r.http_status == 200
    assert r.content_type == "text/plain"
    assert r.payload == body


# ---------------------------------------------------------------------------
def test_streaming_datasource_parity(spark, warc_dir):
    from valkey_search_spark.sources.warc import read_warc_stream

    def canon(rows):
        return sorted((r.warc_file.rsplit("/", 1)[-1], r.record_id,
                       r.record_type, r.target_uri, r.http_status,
                       r.content_type, bytes(r.payload or b""),
                       r.payload_truncated) for r in rows)

    a = canon(read_warc(spark, warc_dir).collect())
    b = canon(read_warc_stream(spark, warc_dir).collect())
    assert a == b and len(a) == 5
    # all record types + caps flow through options too
    c = read_warc_stream(spark, warc_dir, record_types=None,
                         max_payload_bytes=10).collect()
    assert sorted({r.record_type for r in c}) == [
        "request", "response", "warcinfo"]
    assert any(r.payload_truncated for r in c)


def test_streaming_datasource_contracts(spark, tmp_path):
    from valkey_search_spark.sources.warc import read_warc_stream

    with pytest.raises(Exception, match="no .warc files"):
        read_warc_stream(spark, str(tmp_path)).collect()
    (tmp_path / "bad.warc").write_bytes(b"GARBAGE")
    with pytest.raises(Exception, match="not a WARC record header"):
        read_warc_stream(spark, str(tmp_path)).collect()
    with pytest.raises(ValueError):
        read_warc_stream(spark, str(tmp_path), on_error="nope")


# ---------------------------------------------------------------------------
def test_cdx_index_and_ranged_fetch(spark, warc_dir):
    from valkey_search_spark.sources.warc import (fetch_warc_records,
                                                  index_warc)

    idx = index_warc(spark, warc_dir)
    rows = idx.collect()
    # every record of every layout indexed: 5 + 5 + 3 across the
    # plain / member-gzip / whole-gzip fixtures
    assert len(rows) == 13
    resp = idx.where("status IS NOT NULL")
    assert resp.count() == 5
    # the CC workflow: filter the INDEX (html + 200 only), fetch those
    sel = idx.where("status = 200 AND mime LIKE '%html%'")
    fetched = fetch_warc_records(spark, sel).collect()
    want = [r for r in read_warc(spark, warc_dir).collect()
            if r.http_status == 200 and "html" in r.content_type]
    canon = lambda rs: sorted(  # noqa: E731
        (r.record_id, r.target_uri, bytes(r.payload)) for r in rs)
    assert canon(fetched) == canon(want) and len(fetched) == 3
    # surt keys reverse the host
    surt = {r.surt_key for r in rows if r.surt_key}
    assert any(s.startswith("com,example)") for s in surt)
    # timestamps are the 14-digit CC form
    assert all(len(r.timestamp) == 14 for r in rows if r.timestamp)


def test_cdx_roundtrip_through_text(spark, warc_dir, tmp_path):
    from valkey_search_spark.sources.warc import (index_warc, read_cdx,
                                                  write_cdx)

    idx = index_warc(spark, warc_dir).where("url IS NOT NULL")
    write_cdx(idx, str(tmp_path / "cdx"))
    back = read_cdx(spark, str(tmp_path / "cdx"))
    cols = ["surt_key", "timestamp", "url", "mime", "status",
            "length", "offset", "filename"]
    a = sorted(tuple(r[c] if r[c] is not None else "" for c in cols)
               for r in idx.collect())
    b = sorted(tuple(r[c] if r[c] is not None else "" for c in cols)
               for r in back.collect())
    assert a == b and len(a) == 10


def test_fetch_offsets_are_true_byte_ranges(spark, warc_dir):
    # fetch must work from RAW (offset, length) slices alone: read the
    # bytes by hand and confirm each slice decodes to its own record
    from valkey_search_spark.sources.warc import index_warc

    for r in index_warc(spark, warc_dir).where("status = 200").collect():
        blob = open(r.filename, "rb").read()[r.offset:r.offset + r.length]
        if blob[:2] == b"\x1f\x8b":
            blob = gzip.decompress(blob)
        assert blob.lstrip(b"\r\n").startswith(b"WARC/1.0")
        assert r.url.encode() in blob


def test_cdx_null_url_rows_roundtrip_and_fetch(spark, warc_dir, tmp_path):
    # warcinfo rows (no url) must survive the CDXJ text round-trip
    # ('-' placeholders, review finding) and fetch back ONLY
    # themselves from multi-record whole-gzip members
    from valkey_search_spark.sources.warc import (fetch_warc_records,
                                                  index_warc, read_cdx,
                                                  write_cdx)

    idx = index_warc(spark, warc_dir)
    write_cdx(idx, str(tmp_path / "cdx"))
    back = read_cdx(spark, str(tmp_path / "cdx"))
    assert back.count() == 13
    assert back.where("surt_key IS NULL AND url IS NULL").count() == 3
    info = back.where("url IS NULL")
    fetched = fetch_warc_records(spark, info).collect()
    assert len(fetched) == 3
    assert all(r.record_type == "warcinfo" for r in fetched)


def test_minimal_captures_dedupe_duplicate_slices(spark, warc_dir):
    # review finding: with only the minimum documented columns
    # (filename/offset/length), repeat captures of ONE whole-file-gzip
    # member slice re-emitted every record in it. Identical slices must
    # fetch once.
    from valkey_search_spark.sources.warc import (fetch_warc_records,
                                                  index_warc)

    idx = index_warc(spark, warc_dir) \
        .where(F.col("filename").endswith("whole.warc.gz"))
    caps = idx.select("filename", "offset", "length")
    assert caps.count() == 3             # 3 records share one member
    fetched = fetch_warc_records(spark, caps).collect()
    ids = sorted(r.record_id for r in fetched)
    assert len(ids) == len(set(ids)) == 3


def test_index_truncated_tail_keeps_prefix(spark, tmp_path):
    from valkey_search_spark.sources.warc import index_warc

    good = _archive(_PAGES[:1], gzipped=False)
    (tmp_path / "cut.warc").write_bytes(
        good + b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: 999\r\n\r\nstub")
    rows = index_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 3                    # the intact prefix
    with pytest.raises(Exception, match="truncated record payload"):
        index_warc(spark, str(tmp_path), on_error="raise").collect()
    with pytest.raises(ValueError):
        index_warc(spark, str(tmp_path), on_error="nope")


def test_cdx_timestamp_and_surt_edge_forms(spark, tmp_path):
    from valkey_search_spark.sources.warc import index_warc

    recs = []
    for rid, uri, date in [
        ("f1", "http://example.com:8080/x", "2026-01-02T03:04:05.123Z"),
        ("f2", "http://user@sub.Example.com/y?q=1",
         "2026-01-02T03:04:05+02:00"),
    ]:
        http = _http(b"ok", 200, "text/plain")
        head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
                f"WARC-Date: {date}\r\nWARC-Target-URI: {uri}\r\n"
                f"Content-Length: {len(http)}\r\n\r\n").encode()
        recs.append(head + http + b"\r\n\r\n")
    (tmp_path / "e.warc").write_bytes(b"".join(recs))
    rows = {r.url: r for r in index_warc(spark, str(tmp_path)).collect()}
    r1 = rows["http://example.com:8080/x"]
    assert r1.timestamp == "20260102030405"          # 14, not 17
    assert r1.surt_key == "com,example:8080)/x"      # port after labels
    r2 = rows["http://user@sub.Example.com/y?q=1"]
    assert r2.timestamp == "20260102030405"          # tz digits dropped
    assert r2.surt_key == "com,example,sub)/y?q=1"   # userinfo dropped


# ---------------------------------------------------------------------------
def test_write_warc_roundtrip(spark, warc_dir, tmp_path):
    from valkey_search_spark.sources.warc import index_warc, write_warc

    orig = read_warc(spark, warc_dir, record_types=None)
    out = str(tmp_path / "export")
    write_warc(orig, out)
    back = read_warc(spark, out, record_types=None)

    def canon(df):
        return sorted((r.record_id, r.record_type, r.target_uri,
                       r.warc_date, r.http_status, r.content_type,
                       bytes(r.payload or b"")) for r in df.collect())

    assert canon(back) == canon(orig)
    # the export is immediately CDX-indexable (per-record gzip members)
    idx = index_warc(spark, out)
    assert idx.where("status = 200").count() == \
        orig.where("http_status = 200").count()


def test_write_warc_minimal_columns_and_overwrite(spark, tmp_path):
    from valkey_search_spark.sources.warc import write_warc

    df = spark.createDataFrame(
        [("https://a.com/1", b"payload one"),
         ("https://a.com/2", b"payload two")],
        "target_uri string, payload binary")
    out = str(tmp_path / "min")
    write_warc(df, out)
    back = read_warc(spark, out, record_types=None).orderBy("target_uri")
    rows = back.collect()
    assert [r.target_uri for r in rows] == \
        ["https://a.com/1", "https://a.com/2"]
    assert all(r.record_type == "resource" for r in rows)
    assert all(r.record_id.startswith("<urn:uuid:") for r in rows)
    assert rows[0].payload == b"payload one"
    # append grows, overwrite resets
    write_warc(df, out)
    assert read_warc(spark, out, record_types=None).count() == 4
    write_warc(df, out, mode="overwrite")
    assert read_warc(spark, out, record_types=None).count() == 2


def test_write_warc_ecosystem_headers_and_crash_window(spark, tmp_path):
    from valkey_search_spark.sources.warc import write_warc

    df = spark.createDataFrame(
        [("response", "https://a.com/1", 200, "text/html", b"<p>x</p>")],
        "record_type string, target_uri string, http_status int, "
        "content_type string, payload binary")
    out = str(tmp_path / "eco")
    write_warc(df, out)
    raw = gzip.decompress(
        open(next(iter(__import__("glob").glob(f"{out}/*.warc.gz"))),
             "rb").read())
    # the WARC-level media type warcio/pywb key HTTP parsing off
    assert b"Content-Type: application/http; msgtype=response" in raw
    assert b"HTTP/1.1 200" in raw
    # an orphaned in-progress file from a killed task: reads ignore it,
    # the next write's commit sweeps it, overwrite clears stale .warc
    open(f"{out}/.part-dead.warc.gz.inprogress", "wb").write(b"junk")
    (pathlib := __import__("pathlib")).Path(
        f"{out}/stale.warc").write_bytes(b"GARBAGE")
    import os as _os
    _os.remove(f"{out}/stale.warc")       # (reader would reject garbage)
    assert read_warc(spark, out).count() == 1
    write_warc(df, out)                   # append + sweep
    assert not __import__("glob").glob(f"{out}/.*.inprogress")
    assert read_warc(spark, out).count() == 2
    write_warc(df, out, mode="overwrite")
    assert read_warc(spark, out).count() == 1
