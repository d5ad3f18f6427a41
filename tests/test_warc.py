"""WARC serialize/parse framing (sources/warc.py).

Pins the Content-Length framing contract: payloads are opaque bytes —
a payload that CONTAINS 'WARC/1.0' header-lookalikes must not confuse
the parser (the reason the walk is length-prefixed, never regex)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from zen3geo_spark.sources.warc import (
    _parse_blob,
    warc_roundtrip,
    warc_serialize,
)


def test_parse_blob_hostile_payload():
    payload = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake inner record\r\n\r\n"
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: https://x.test/a\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           + f"Content-Length: {len(payload)}\r\n".encode()
           + b"\r\n" + payload + b"\r\n\r\n")
    out = _parse_blob(rec * 3)
    assert len(out) == 3
    assert all(r == ("https://x.test/a", "2024-01-01T00:00:00Z",
                     len(payload), hashlib.md5(payload).hexdigest())
               for r in out)


def test_parse_blob_empty_payload_and_terminator_check():
    rec = (b"WARC/1.0\r\n"
           b"WARC-Target-URI: u\r\n"
           b"WARC-Date: d\r\n"
           b"Content-Length: 0\r\n\r\n\r\n\r\n")
    assert _parse_blob(rec) == [("u", "d", 0, hashlib.md5(b"").hexdigest())]
    with pytest.raises(ValueError, match="terminator"):
        _parse_blob(rec[:-1] + b"X")
    with pytest.raises(ValueError, match="version"):
        _parse_blob(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")


def test_roundtrip_binary_exact(spark):
    from zen3geo_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 37)
    got = {r.url: (r.warc_date, r.content_length, r.payload_md5)
           for r in warc_roundtrip(pages, records_per_file=10).collect()}
    want = {
        r.url: (
            r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            len(bytes(r.html)),
            hashlib.md5(bytes(r.html)).hexdigest(),
        )
        for r in pages.collect()
    }
    assert got == want


def test_serialize_is_jvm_only(spark):
    from zen3geo_spark.sources.pages import synth_pages

    plan = warc_serialize(synth_pages(spark, 5))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_cdx_offsets_slice_real_blobs(spark):
    """A CDX row must range-request its record out of the REAL
    assembled WARC blob: blob[offset : offset+rec_len] is a complete
    record naming the right URL."""
    from zen3geo_spark.sources.pages import synth_pages
    from zen3geo_spark.sources.warc import cdx_index, warc_blobs, warc_serialize

    pages = synth_pages(spark, 120)
    blobs = {r.file_id: bytes(r.blob) for r in
             warc_blobs(warc_serialize(pages), records_per_file=50).collect()}
    rows = cdx_index(pages, records_per_file=50).collect()
    assert len(rows) == 120
    for r in rows:
        blob = blobs[r.file_id]
        rec = blob[r.offset:r.offset + r.rec_len]
        assert rec.startswith(b"WARC/1.0\r\n")
        assert rec.endswith(b"\r\n\r\n")
        # SURT key test,example-<h>)/page/<p> names the record's URI
        host_rev, _, path = r.urlkey.partition(")")
        host = ".".join(reversed(host_rev.split(",")))
        assert f"WARC-Target-URI: https://{host}{path}\r\n".encode() in rec
