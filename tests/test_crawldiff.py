"""Crawl snapshot diff + incremental re-score semantics."""

from __future__ import annotations

from fineweb_modal_spark.operators import crawldiff


def _snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "https://a.example/keep", "same body"),
            (2, "https://a.example/edit", "old body"),
            (3, "https://a.example/gone", "vanishing body"),
        ],
        "doc_id long, url string, text string",
    )
    new = spark.createDataFrame(
        [
            (11, "http://www.a.example/keep/", "same body"),
            (12, "https://a.example/edit", "new body"),
            (14, "https://a.example/fresh", "brand new body with words"),
        ],
        "doc_id long, url string, text string",
    )
    return old, new


def test_crawl_diff_statuses(spark):
    old, new = _snaps(spark)
    out = {r.norm_url: r.status for r in crawldiff.crawl_diff(old, new).collect()}
    assert out == {
        "a.example/keep": "unchanged",  # URL respelled, content identical
        "a.example/edit": "changed",
        "a.example/gone": "removed",
        "a.example/fresh": "added",
    }


def test_incremental_rescore_touches_only_delta(spark):
    old, new = _snaps(spark)
    rows = crawldiff.incremental_rescore(old, new).collect()
    got = {(r.norm_url, r.status) for r in rows}
    assert got == {
        ("a.example/edit", "changed"),
        ("a.example/fresh", "added"),
    }
    # every delta row carries a concrete keep decision
    assert all(r.keep in (True, False) for r in rows)


def test_merge_rescored_equals_full_recompute(spark):
    from fineweb_modal_spark.operators import quality, urldedup

    old, new = _snaps(spark)
    merged = {
        (r.norm_url, r.doc_id, r.keep)
        for r in crawldiff.merge_rescored(old, new).collect()
    }
    full = {
        (r.norm_url, r.doc_id, r.keep)
        for r in quality.with_keep(
            quality.with_signals(urldedup.with_norm_url(new))
        )
        .select("norm_url", "doc_id", "keep")
        .collect()
    }
    assert merged == full
    # removed URL is retired
    assert all(u != "a.example/gone" for u, _, _ in merged)


def test_token_drift_detects_planted_shift(spark):
    # old corpus: common words only; new corpus: half the docs are a
    # planted spam wave -> the spam token must rank at the very top of
    # the chi2 ordering, and terms must be nonnegative with TV <= 0.5.
    old = spark.createDataFrame(
        [(i, f"https://h.example/{i}", "alpha beta gamma delta") for i in range(40)],
        "doc_id long, url string, text string",
    )
    new_rows = [
        (i, f"https://h.example/{i}",
         "zzzspam zzzspam zzzspam" if i % 2 == 0 else "alpha beta gamma delta")
        for i in range(40)
    ]
    new = spark.createDataFrame(
        new_rows, "doc_id long, url string, text string"
    )
    out = crawldiff.token_drift(old, new, top_n=10).collect()
    assert out[0].token == "zzzspam"
    assert out[0].old_cnt == 0 and out[0].new_cnt == 60
    for r in out:
        assert r.chi2_e12 >= 0
        assert 0 <= r.tv_e12 <= 500_000_000_000  # TV term <= 0.5
    # chi2 ordering is non-increasing with token tie-break
    keys = [(-r.chi2_e12, r.token) for r in out]
    assert keys == sorted(keys)


def test_token_drift_identity_is_zero(spark):
    # identical snapshots -> every chi2/TV term is exactly 0 and the
    # per-token counts agree (Laplace smoothing cancels)
    snap = spark.createDataFrame(
        [(i, f"https://h.example/{i}", f"alpha beta gamma token{i % 5}")
         for i in range(30)],
        "doc_id long, url string, text string",
    )
    out = crawldiff.token_drift(snap, snap, top_n=100).collect()
    assert out  # vocab is non-empty
    for r in out:
        assert r.old_cnt == r.new_cnt
        assert r.chi2_e12 == 0
        assert r.tv_e12 == 0


def test_quality_transition_detects_flips(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "far away to the old house by the sea where all of them rest"
    )
    bad = "00 11 22 33 44 55 66 77 88 99"
    old = spark.createDataFrame(
        [(1, "https://a.example/1", good), (2, "https://a.example/2", bad)],
        "doc_id long, url string, text string",
    )
    new = spark.createDataFrame(
        [(1, "https://a.example/1", bad), (2, "https://a.example/2", good)],
        "doc_id long, url string, text string",
    )
    out = {r.transition: r.n_urls for r in crawldiff.quality_transition(old, new).collect()}
    assert out == {"kept->dropped": 1, "dropped->kept": 1}


def test_script_report_flags_mislabel(spark):
    from fineweb_modal_spark.operators import textstats

    pages = spark.createDataFrame(
        [
            (1, "zh", "的 是 在 了 我 有 " * 3),       # genuine zh
            (2, "zh", "pure latin text only here"),   # mislabeled -> flag
            (3, "en", "pure latin text only here"),   # fine
            (4, "en", "的的的的的的的的的的"),          # CJK under en -> flag
        ],
        "doc_id long, lang string, text string",
    )
    out = {r.doc_id: r for r in textstats.script_report(pages).collect()}
    assert not out[1].script_mismatch
    assert out[2].script_mismatch
    assert not out[3].script_mismatch
    assert out[4].script_mismatch
    assert out[4].cjk_ratio == 1.0


def test_scd2_history_hand_fixture(spark):
    """Every SCD2 transition on a 4-URL, 3-snapshot fixture whose
    version intervals are computable by hand."""
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, url string, text string"
    )
    s0 = mk(
        [
            (1, "https://a.example/stable", "A"),
            (2, "https://a.example/edited", "B"),
            (3, "https://a.example/deleted-mid", "C"),
            (4, "https://a.example/gap", "D"),
        ]
    )
    s1 = mk(
        [
            (1, "https://a.example/stable", "A"),
            (2, "https://a.example/edited", "B2"),
            (5, "https://a.example/born", "E"),
        ]
    )
    s2 = mk(
        [
            (1, "https://a.example/stable", "A"),
            (2, "https://a.example/edited", "B3"),
            (4, "https://a.example/gap", "D"),  # reappears, same bytes
            (5, "https://a.example/born", "E"),
        ]
    )
    out = crawldiff.scd2_history([s0, s1, s2])
    got = {
        (r.norm_url, r.version_n): (r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == {
        ("a.example/stable", 1): (0, 3, True),
        ("a.example/edited", 1): (0, 1, False),
        ("a.example/edited", 2): (1, 2, False),
        ("a.example/edited", 3): (2, 3, True),
        ("a.example/deleted-mid", 1): (0, 1, False),
        # the gap CLOSES the first version even though bytes match;
        # the reappearance is a new version
        ("a.example/gap", 1): (0, 1, False),
        ("a.example/gap", 2): (2, 3, True),
        ("a.example/born", 1): (1, 3, True),
    }
    # interval algebra: versions of one URL never overlap and are
    # ordered by version_n
    by_url: dict = {}
    for (u, v), (f, t, _) in got.items():
        by_url.setdefault(u, []).append((v, f, t))
    for spans in by_url.values():
        spans.sort()
        for (_, f1, t1), (_, f2, _) in zip(spans, spans[1:]):
            assert f1 < t1 <= f2


def test_scd2_asof_reconstruction(spark):
    """The point of SCD2: filtering valid_from <= s < valid_to must
    reconstruct snapshot s exactly."""
    from pyspark.sql import functions as F

    from fineweb_modal_spark.functions import sqldialect as sd
    from fineweb_modal_spark.sources import pages as pages_mod

    p = pages_mod.load_pages(spark, "/root/testdata/sf0.001", with_html=False)
    p.createOrReplaceTempView("pages_scd2_test")
    snaps = [
        p.select("doc_id", "url", "text"),
        spark.sql(crawldiff.new_snapshot_sql(sd.SPARK, "pages_scd2_test")),
        spark.sql(crawldiff.third_snapshot_sql(sd.SPARK, "pages_scd2_test")),
    ]
    hist = crawldiff.scd2_history(snaps).cache()
    try:
        from fineweb_modal_spark.operators import urldedup

        for s, snap in enumerate(snaps):
            want = sorted(
                (r.norm_url, r.md5)
                for r in urldedup.with_norm_url(snap)
                .select(
                    "norm_url",
                    F.md5(F.coalesce("text", F.lit(""))).alias("md5"),
                )
                .collect()
            )
            got = sorted(
                (r.norm_url, r.md5)
                for r in hist.where(
                    (F.col("valid_from") <= s) & (F.lit(s) < F.col("valid_to"))
                ).collect()
            )
            assert got == want, f"snapshot {s} not reconstructed"
    finally:
        hist.unpersist()
