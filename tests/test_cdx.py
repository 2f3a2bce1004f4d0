"""CDX index: member spans must tile the shard exactly and fetches
must touch only the indexed bytes (the gate pins end-to-end content
parity; these pin the byte-span arithmetic)."""

from __future__ import annotations

import os

import pytest

from fineweb_modal_spark.sources import cdx as C
from fineweb_modal_spark.sources import warc as W

from .conftest import SF_ORACLE

DOCS = os.path.join(SF_ORACLE, "documents.parquet")


def test_gzip_spans_tile_the_shard(tmp_path):
    [path] = W.write_warc_shards(DOCS, str(tmp_path), n_shards=1, compress=True)
    spans = list(C.iter_member_spans(path))
    assert spans[0][0] == 0
    for (o1, l1, _), (o2, _, _) in zip(spans, spans[1:]):
        assert o1 + l1 == o2  # contiguous, no gaps or overlap
    assert spans[-1][0] + spans[-1][1] == os.path.getsize(path)
    # first member is the warcinfo record
    assert b"WARC-Type: warcinfo" in spans[0][2]


def test_plain_spans_ascending_and_parseable(tmp_path):
    [path] = W.write_warc_shards(DOCS, str(tmp_path), n_shards=1, compress=False)
    spans = list(C.iter_member_spans(path))
    assert all(
        o1 + l1 <= o2 for (o1, l1, _), (o2, _, _) in zip(spans, spans[1:])
    )
    # every span re-parses standalone to one record
    for _, _, rec in spans[:5]:
        headers, body = C._parse_record(rec)
        assert "warc-type" in headers


def test_fetch_one_matches_sequential_scan(tmp_path):
    paths = W.write_warc_shards(DOCS, str(tmp_path), n_shards=2, compress=True)
    for path in paths:
        seen = 0
        for off, length, rec in C.iter_member_spans(path):
            headers, body = C._parse_record(rec)
            if headers.get("warc-type") != "response":
                continue
            h2, b2 = C.fetch_one(path, off, length)
            assert (h2, b2) == (headers, body)
            seen += 1
            if seen >= 10:
                break
        assert seen > 0


def test_fetch_records_detects_corrupt_index(spark, tmp_path):
    """A poisoned offset (pointing at the WRONG member) must fail
    loudly via the url cross-check, never return the wrong page."""
    from pyspark.sql import functions as F

    W.write_warc_shards(DOCS, str(tmp_path), n_shards=1, compress=True)
    idx = C.build_cdx(spark, str(tmp_path)).limit(2).collect()
    a, b = idx[0], idx[1]
    bad = spark.createDataFrame(
        [(a.url, a.warc_ts, a.shard, b.offset, b.length)], C.CDX_SCHEMA
    )
    with pytest.raises(Exception, match="index/record mismatch"):
        C.fetch_records(bad).collect()


def test_index_covers_every_response(spark, tmp_path):
    W.write_warc_shards(DOCS, str(tmp_path), n_shards=3, compress=True)
    n_pages = W.read_warc(spark, str(tmp_path)).count()
    assert C.build_cdx(spark, str(tmp_path)).count() == n_pages


def test_empty_dir_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        C.build_cdx(spark, str(tmp_path))


def test_surt_key_shape_and_publish_order(spark, tmp_path):
    """SURT reverses host labels (domain-adjacent sort) and write_cdx
    publishes in SURT order within every file."""
    from pyspark.sql import functions as F

    row = spark.createDataFrame(
        [("https://h3.example.com/p/42",)], "url string"
    )
    assert C.with_surt(row).first().surt == "com,example,h3)/p/42"

    W.write_warc_shards(DOCS, str(tmp_path / "w"), n_shards=2, compress=True)
    idx = C.build_cdx(spark, str(tmp_path / "w"))
    out = str(tmp_path / "cdx")
    C.write_cdx(idx, out)
    back = spark.read.parquet(out).select("surt", F.input_file_name().alias("f"))
    import pandas as pd  # noqa: F401

    pdf = back.toPandas()
    for _, grp in pdf.groupby("f"):
        vals = list(grp["surt"])
        assert vals == sorted(vals)
