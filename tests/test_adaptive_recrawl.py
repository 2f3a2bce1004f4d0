"""Recency URL keeper (max_by partial agg) and adaptive per-group
histogram cutoff (integer crossing rule)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from fineweb_modal_spark.operators import histsketch, urldedup


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_url_dedup_latest_newest_wins_ties_by_doc_id(spark):
    rows = [
        (1, "https://a.example/x", _ts("2024-01-01 00:00:00")),
        (2, "http://www.a.example/x/", _ts("2024-01-02 00:00:00")),
        (3, "https://a.example/x?utm=1", _ts("2024-01-02 00:00:00")),
        (4, "https://b.example/y", _ts("2024-01-01 00:00:00")),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts timestamp"
    )
    out = {r.norm_url: r for r in urldedup.url_dedup_latest(df).collect()}
    # docs 1-3 normalize to one key; 2 and 3 share the newest ts -> 3 wins
    assert out["a.example/x"].keeper_doc_id == 3
    assert out["a.example/x"].n_copies == 3
    assert out["a.example/x"].last_ts == _ts("2024-01-02 00:00:00")
    assert out["b.example/y"].keeper_doc_id == 4


def test_url_dedup_latest_is_partial_agg_no_sort(spark):
    df = spark.createDataFrame(
        [(1, "https://a.example/x", _ts("2024-01-01 00:00:00"))],
        "doc_id long, url string, warc_ts timestamp",
    )
    plan = _plan(urldedup.url_dedup_latest(df))
    # two-phase agg with a map-side partial (one row per key crosses
    # the shuffle), and no per-group window materialization
    assert "partial_max" in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]


def test_crossing_bin_integer_rule_exact(spark):
    # group g: 10 values in bin 0, 6 in bin 2 -> n=16, q=1/4 -> 4*cum>=n
    # first crossed at bin 0 (cum=10). group h: 1 in bin 0, 7 in bin 5
    # -> n=8, threshold 4*cum>=8 needs cum>=2 -> bin 5.
    vals = [("g", v) for v in [0] * 10 + [40] * 6] + [
        ("h", v) for v in [0] + [80] * 7
    ]
    df = spark.createDataFrame(vals, "grp string, v long")
    bins = histsketch.build_bins(df, "v", ["grp"])
    thr = {r.grp: r.thr_bin for r in histsketch.crossing_bin(bins).collect()}
    assert thr == {"g": 0, "h": 5}
    kept = histsketch.adaptive_cutoff_filter(df, "v", ["grp"]).collect()
    per = {}
    for r in kept:
        per[r.grp] = per.get(r.grp, 0) + 1
    # g keeps everything (threshold bin 0); h keeps only the bin-5 rows
    assert per == {"g": 16, "h": 7}


def test_adaptive_cutoff_threshold_join_is_broadcast(spark):
    df = spark.createDataFrame(
        [("g", 10), ("g", 50), ("h", 7)], "grp string, v long"
    )
    plan = _plan(histsketch.adaptive_cutoff_filter(df, "v", ["grp"]))
    assert "BroadcastHashJoin" in plan, plan[:2000]
