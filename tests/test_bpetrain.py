"""In-engine BPE merge training: relational loop vs the classic
Python reference loop, overlap semantics, determinism, early stop."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from fineweb_modal_spark.operators import bpetrain as B

TEXTS = [
    "low low low lower lowest newest newest widest aaaa aaaa",
    "new newer newest wide wider low lower aaaa",
    "Mixed-CASE Tokens! are filtered: 123 http://x.y zzzz zzzz",
]


def _py_word_freqs(texts):
    words = {}
    for t in texts:
        for w in t.lower().split():
            if re.fullmatch("[a-z]{1,20}", w):
                words[w] = words.get(w, 0) + 1
    return words


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )


def test_merges_match_python_reference(spark, docs):
    """The relational merge loop reproduces the classic
    dict-of-symbol-tuples BPE algorithm exactly — including the
    left-to-right non-overlapping run semantics exercised by the
    'aaaa'/'zzzz' words (a naive single-space padded replace misses
    every second pair of a run)."""
    got = [
        (r["pair"], r["cnt"])
        for r in B.merges_report(spark, docs, k=10)
        .orderBy("rank")
        .collect()
    ]
    want = B.py_bpe(_py_word_freqs(TEXTS), 10)
    assert got == want
    # the overlap case actually fired: a run word's pair merged with
    # the full run count (aaaa x3 occurrences -> 'a a' counted 3/word)
    assert ("a a", 9) in got or ("z z", 6) in got


def test_merge_application_overlap_semantics(spark):
    """[a,a,a,a] merges to [aa,aa] and [a,a,a] to [aa,a] — the
    doubled-space replace reproduces Python's left-to-right
    non-overlapping scan in one pass."""
    df = spark.createDataFrame(
        [("a a a a </w>",), ("a a a </w>",)], "seq string"
    )
    out = [
        r["m"]
        for r in df.select(
            B._apply_merge_expr(F.col("seq"), "a a").alias("m")
        ).collect()
    ]
    assert out == ["aa aa </w>", "aa a </w>"]


def test_early_stop_when_fully_merged(spark):
    """K larger than the learnable merge count: the loop stops when
    every word is a single symbol instead of looping on nothing."""
    tiny = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    merges, final = B.learn_merges(tiny, k=50)
    # 'ab</w>' needs exactly 2 merges: (a b) then (ab </w>)
    assert [p for p, _ in merges] == ["a b", "ab </w>"]
    assert [r["seq"] for r in final.collect()] == ["ab</w>"]


def test_vocab_report_conserves_word_mass(spark, docs):
    """Every word ends with exactly one EOW-bearing symbol, so the
    frequency-weighted occurrences of EOW-suffixed symbols equals the
    total filtered word count."""
    v = B.vocab_report(docs, k=10)
    eow_mass = (
        v.where(F.col("symbol").endswith(B.EOW))
        .agg(F.sum("occurrences").alias("s"))
        .collect()[0]["s"]
    )
    assert eow_mass == sum(_py_word_freqs(TEXTS).values())


def test_gate_parity_toy(spark, docs):
    """Spark gate vs DuckDB oracle on the toy corpus (the sf0.01
    parity is covered by the registry sweep)."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(TEXTS)), "text": TEXTS}
        ),
    )
    got = (
        B.merges_report(spark, docs, k=6)
        .orderBy("rank")
        .toPandas()
    )
    want = con.execute(
        B.merges_oracle_sql("duckdb", k=6)
    ).fetchdf().sort_values("rank").reset_index(drop=True)
    assert got["pair"].tolist() == want["pair"].tolist()
    assert got["cnt"].tolist() == [int(c) for c in want["cnt"]]


def test_tokenize_stats_compression(spark):
    """Applying the learned merges must never EXPAND a word (each
    merge strictly reduces symbol count), and repeated words compress
    hardest: the report's bpe symbol total is <= the char total, and
    the per-word dim agrees with a hand segmentation."""
    docs = spark.createDataFrame(
        [(0, "s0", "banana banana banana apple"),
         (1, "s1", "banana apple apple")],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r for r in B.tokenize_stats(docs, k=6).collect()}
    for r in rows.values():
        assert r["n_symbols_bpe"] <= r["n_symbols_char"]
        assert 0 < r["compression_ppm"] <= 1000000
    # 7 words in s0-corpus: banana=4, apple=3 across both sources
    assert rows["s0"]["n_words"] == 4 and rows["s1"]["n_words"] == 3
