"""Composed hygiene pipeline: stage positives must be observable in
the final output."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from fineweb_modal_spark.operators import blocklist, hygiene


def _feed(spark):
    t0 = datetime.datetime(2024, 1, 1)
    d1 = datetime.timedelta(days=1)
    body = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        # two captures of the same URL: the newer, extended one must win
        (2, "https://a.example/x", t0, body),
        (6, "https://www.a.example/x/", t0 + d1, body + " updated edition"),
        # a second host so banner df crosses the threshold (df>=3)
        (4, "https://b.example/y", t0, body + " second page words"),
        (8, "https://b.example/z", t0, body + " third page words"),
        (3, "https://b.example/w", t0, body + " fourth page words"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts timestamp, text string"
    )


def test_recency_winner_and_line_dedup_visible_in_output(spark):
    out = {r.doc_id: r for r in hygiene.run_hygiene(_feed(spark)).collect()}
    # loser capture of a.example/x is gone, winner present
    assert 2 not in out
    # any blocked host would drop whole docs; whichever survive must
    # have their banner/footer lines removed (banner df: docs 2,6,4,8
    # all even -> >=3; footers: per-host df 2 and 3)
    for r in out.values():
        assert r.n_removed >= 1
    if 6 in out:  # a.example not in the synthetic blocklist draw
        assert out[6].keep
        assert out[6].scrubbed_text is not None
        assert "updated edition" in out[6].scrubbed_text


def test_blocked_hosts_absent(spark):
    feed = _feed(spark)
    hosted = blocklist.with_host(feed)
    blocked = {
        r.host for r in blocklist.synthetic_blocklist(hosted).collect()
    }
    out_ids = {
        r.doc_id for r in hygiene.run_hygiene(feed).collect()
    }
    host_of = {r.doc_id: r.host for r in hosted.collect()}
    for did, h in host_of.items():
        if h in blocked:
            assert did not in out_ids
