"""Line-level dedup (C4/CCNet) and domain-blocklist semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from fineweb_modal_spark.operators import blocklist, linededup

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _toy_corpus(spark):
    banner = "Please accept cookies"
    rows = [
        (1, f"{banner}\nunique one body\n  \nFooter A"),
        (2, f"{banner}\nunique two body\nFooter A\nrare pair"),
        (3, f"{banner}\nunique three body\nFooter A\nrare pair"),
        (4, "unique four body"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_removes_df3_keeps_df2_and_uniques(spark):
    out = {
        r.doc_id: r
        for r in linededup.line_dedup(_toy_corpus(spark), min_df=3).collect()
    }
    assert len(out) == 4
    # banner (df=3) and Footer A (df=3) removed everywhere
    assert out[1].clean_text == "unique one body"
    assert out[1].n_removed == 2
    # blank line counted in neither bucket
    assert out[1].n_kept == 1
    # "rare pair" (df=2) survives under min_df=3
    assert out[2].clean_text == "unique two body\nrare pair"
    assert out[3].clean_text == "unique three body\nrare pair"
    # untouched doc: zero removed, text byte-identical
    assert out[4].clean_text == "unique four body"
    assert out[4].n_removed == 0


def test_line_dedup_whitespace_normalized_key(spark):
    # same line with different edge whitespace / case is ONE key
    rows = [
        (1, "Shared Line\nbody a"),
        (2, "  shared line \nbody b"),
        (3, "SHARED LINE\t\nbody c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in linededup.line_dedup(df, min_df=3).collect()}
    assert [out[i].clean_text for i in (1, 2, 3)] == [
        "body a",
        "body b",
        "body c",
    ]


def test_line_dedup_all_lines_removed_yields_empty(spark):
    rows = [(i, "only boilerplate here") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = linededup.line_dedup(df, min_df=3).collect()
    assert all(r.clean_text == "" and r.n_kept == 0 for r in out)


def test_blocklist_exact_host_anti_join(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://www.bad.example/x?u=1"),
            (2, "http://good.example/page"),
            (3, "https://BAD.example/other"),
            (4, "https://good.example/"),
        ],
        "doc_id long, url string",
    )
    blk = spark.createDataFrame([("bad.example",)], "host string")
    kept = blocklist.blocklist_filter(pages, blk).select("doc_id", "host")
    rows = {r.doc_id: r.host for r in kept.collect()}
    assert rows == {2: "good.example", 4: "good.example"}


def test_blocklist_join_is_broadcast_no_shuffle(spark):
    pages = spark.createDataFrame(
        [(1, "https://a.example/x")], "doc_id long, url string"
    )
    blk = spark.createDataFrame([("z.example",)], "host string")
    plan = _plan(blocklist.blocklist_filter(pages, blk))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_synthetic_blocklist_deterministic(spark):
    pages = spark.createDataFrame(
        [(i, f"https://h{i % 13}.example.com/p/{i}") for i in range(100)],
        "doc_id long, url string",
    )
    hosted = blocklist.with_host(pages)
    a = sorted(r.host for r in blocklist.synthetic_blocklist(hosted).collect())
    b = sorted(r.host for r in blocklist.synthetic_blocklist(hosted).collect())
    assert a == b and len(a) >= 1


def test_propose_blocklist_integer_rule(spark):
    # host 'bad.example': 10 docs, 2 keeps -> 10*2 < 3*10 -> proposed.
    # host 'ok.example': 10 docs, 3 keeps -> 10*3 < 30 is FALSE (exact
    # boundary) -> NOT proposed. host 'tiny.example': volume below 10.
    good = "the quick brown fox jumps over the lazy dog and runs far away home"
    bad = "00 11 22 33 44 55 66 77 88 99"
    rows = []
    rid = 0
    for host, n_keep, n in (("bad", 2, 10), ("ok", 3, 10), ("tiny", 0, 5)):
        for i in range(n):
            rid += 1
            rows.append(
                (rid, f"https://{host}.example/p/{i}",
                 good if i < n_keep else bad)
            )
    feed = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r.host: r for r in blocklist.propose_blocklist(feed).collect()}
    assert set(out) == {"bad.example"}
    assert out["bad.example"].n_docs == 10
    assert out["bad.example"].n_keep == 2


def test_host_reputation_shrinkage(spark):
    # tiny host with 0 keeps gets pulled UP toward the global rate;
    # big host's reputation stays close to its raw rate; everyone's
    # reputation lies strictly between raw rate and the global rate
    # (Beta posterior mean property), modulo exact equality.
    good = "the quick brown fox jumps over the lazy dog and runs far away home"
    bad = "00 11 22 33 44 55 66 77 88 99"
    rows, rid = [], 0
    for host, n_keep, n in (("big", 60, 100), ("tiny", 0, 3)):
        for i in range(n):
            rid += 1
            rows.append(
                (rid, f"https://{host}.example/p/{i}",
                 good if i < n_keep else bad)
            )
    feed = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r.host: r for r in blocklist.host_reputation(feed).collect()}
    g = (out["big.example"].n_keep + out["tiny.example"].n_keep) / 103.0
    tiny = out["tiny.example"]
    big = out["big.example"]
    assert tiny.raw_rate == 0.0
    # shrunk strictly toward the prior mean
    assert tiny.raw_rate < tiny.reputation < g
    assert abs(big.reputation - big.raw_rate) < abs(
        tiny.reputation - tiny.raw_rate
    )


def test_robots_filter_prefix_semantics(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://h1.example.com/p/1"),
            (2, "https://h1.example.com/p/19"),   # /p/1 prefix -> blocked
            (3, "https://h1.example.com/p/2"),    # survives
            (4, "https://h2.example.com/p/7"),    # blocked entirely
            (5, "https://h9.example.com/p/1"),    # no rule -> survives
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("h1.example.com", "/p/1"), ("h2.example.com", "/")],
        "r_host string, r_prefix string",
    )
    out = {r.doc_id for r in blocklist.robots_filter(pages, rules).collect()}
    assert out == {3, 5}


def test_crawl_budget_caps_flooding_host(spark):
    import datetime

    rows = [
        (i, f"https://flood.example.com/p/{i}",
         datetime.datetime(2024, 1, 1, 0, 0, i % 60))
        for i in range(50)
    ] + [
        (100 + i, f"https://calm.example.com/p/{i}",
         datetime.datetime(2024, 1, 1, 0, 0, i))
        for i in range(5)
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts timestamp"
    )
    out = blocklist.crawl_budget_enforce(pages, budget=20).collect()
    admitted = [r for r in out if r.admitted]
    by_host = {}
    for r in admitted:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host["flood.example.com"]) == 20  # capped
    assert len(by_host["calm.example.com"]) == 5    # under budget
    # earliest captures win
    flood_rks = sorted(r.rk for r in by_host["flood.example.com"])
    assert flood_rks == list(range(1, 21))
