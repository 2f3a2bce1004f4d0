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
