"""Benchmark decontamination + boilerplate n-gram screens.

Two corpus-hygiene passes every LLM training pipeline runs before a
corpus ships, both absent from the reference (which stops at chunking/
embedding — this extends the training-data toolbox like dedup.py):

* **Decontamination**: drop/flag training documents that share a long
  word n-gram with an evaluation benchmark (the GPT-3/PaLM n-gram
  overlap rule; 13-grams there, N_DECONTAM=8 here because the fixture
  docs are ~100 words). At 100 TB the benchmark gram set is tiny
  (~10^6 rows) against a ~10^12-gram corpus, so the plan must be:
  one corpus scan → per-row distinct gram hashes (zero shuffle) →
  explode → BROADCAST semi-probe of the benchmark set → per-doc
  partial-agg count of the (rare) hits. The corpus never shuffles;
  only matched (doc_id, gram) rows — contamination is the exception,
  not the rule — reach the final agg.

* **Boilerplate screen**: shingles occurring in ≥ BOILER_DF distinct
  documents are template/boilerplate (nav bars, cookie banners, SEO
  spam); a document whose distinct-shingle set is mostly boilerplate
  carries no novel text. Plan: per-row DISTINCT shingle hashes (so
  count(*) per hash IS document frequency — no count(DISTINCT)
  anywhere), one map-side-combinable df agg, the small high-df set
  broadcast back over a second explode, one per-doc agg. Two shuffles
  total, both partial-agg combinable, text never shuffles.

Every hash/shingle fragment comes from spec/hashing.py and renders
identically in Spark SQL and the DuckDB oracle dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..spec import hashing as H

S = H.SPARK

N_DECONTAM = 8  # words per contamination gram (13 in GPT-3; docs here ~100 words)
BOILER_N = 3  # boilerplate shingle width (same as MinHash shingles)
BOILER_DF = 3  # a shingle in >= this many docs is boilerplate
BOILER_KEEP_NUM, BOILER_KEEP_DEN = 1, 2  # keep iff ratio <= 1/2 (exact int cmp)


def _gram_sets_expr(n: int, d: str) -> str:
    """SQL fragment: distinct sorted n-gram hash array of `text`."""
    toks = H.tokens_lower("text", d)
    sh = H.shingles("__toks", d, n=n)
    shh = H.shingle_hashes("__sh", d)
    inner = f"(SELECT doc_id, {sh} AS __sh FROM (SELECT doc_id, {toks} AS __toks FROM __T__))"
    arr = f"array_sort({sd.arr_distinct(shh, d)})" if d == S else f"list_sort({sd.arr_distinct(shh, d)})"
    return f"SELECT doc_id, {arr} AS grams FROM {inner}"


def _gram_sets(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, grams): distinct n-gram hashes per doc — one scan, no
    shuffle, the same row-local fold as dedup.with_minhash."""
    toks = H.tokens_lower("text", S)
    sh = H.shingles("__toks", S, n=n)
    shh = H.shingle_hashes("__sh", S)
    return (
        docs.selectExpr("doc_id", f"{toks} AS __toks")
        .selectExpr("doc_id", f"{sh} AS __sh")
        .selectExpr("doc_id", f"array_sort(array_distinct({shh})) AS grams")
    )


def benchmark_grams(eval_docs: DataFrame, n: int = N_DECONTAM) -> DataFrame:
    """(g): the distinct benchmark gram-hash set. Driver-small at any
    real benchmark size (MMLU+HellaSwag+… ≈ 10^5 docs ≈ 10^7 grams);
    always the broadcast side."""
    return (
        _gram_sets(eval_docs, n)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )


def decontaminate(
    corpus: DataFrame, bench: DataFrame, n: int = N_DECONTAM
) -> DataFrame:
    """(doc_id, n_grams, n_hits) for every CONTAMINATED corpus doc
    (>=1 benchmark n-gram). Inner broadcast probe: clean docs (the
    overwhelming majority) produce zero post-join rows, so the final
    doc_id agg touches only contamination."""
    grams = _gram_sets(corpus, n).select(
        "doc_id", F.size("grams").alias("n_grams"), F.explode("grams").alias("g")
    )
    return (
        grams.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.count("*").alias("n_hits"),
        )
    )


def boilerplate_signals(docs: DataFrame, df_thresh: int = BOILER_DF) -> DataFrame:
    """(doc_id, n_sh, n_boiler, boiler_ratio, keep) for every doc.

    keep is the exact integer comparison
    n_boiler * KEEP_DEN <= n_sh * KEEP_NUM — no float threshold, so
    the gate hash can't wobble on rounding."""
    # feeds df agg + hit probe + per_doc; localCheckpoint (not
    # .persist()) so blocks auto-release when the relation is dropped
    sets = _gram_sets(docs, BOILER_N).localCheckpoint(eager=False)
    tok = sets.select(
        "doc_id", F.size("grams").alias("n_sh"), F.explode("grams").alias("g")
    )
    # distinct-per-doc grams => count(*) == document frequency
    boiler = (
        tok.groupBy("g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= df_thresh)
        .select("g")
    )
    hit = tok.join(F.broadcast(boiler), "g", "left_semi").groupBy("doc_id").agg(
        F.count("*").alias("n_boiler")
    )
    per_doc = (
        sets.select("doc_id", F.size("grams").alias("n_sh"))  # no distinct shuffle
        .join(hit, "doc_id", "left")
        .na.fill({"n_boiler": 0})
    )
    ratio = F.col("n_boiler").cast("double") / F.col("n_sh").cast("double")
    return per_doc.select(
        "doc_id",
        "n_sh",
        "n_boiler",
        F.round(ratio, 6).alias("boiler_ratio"),
        (
            F.col("n_boiler") * F.lit(BOILER_KEEP_DEN)
            <= F.col("n_sh") * F.lit(BOILER_KEEP_NUM)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle renderings (same spec fragments, other dialect)
# ---------------------------------------------------------------------------


def contaminated_corpus_sql(d: str, table: str = "documents") -> str:
    """Training corpus with planted leakage: the eval docs
    (doc_id % 97 = 0) are held OUT of the corpus (a benchmark is
    external data), and each one leaks back in as a near-copy at
    doc_id + 2000000 — deterministic positives, like
    dedup.corpus_with_near_dups_sql."""
    return (
        f"SELECT doc_id, text FROM {table} WHERE doc_id % 97 <> 0 "
        f"UNION ALL "
        f"SELECT doc_id + 2000000 AS doc_id, text || ' leaked into train set' AS text "
        f"FROM {table} WHERE doc_id % 97 = 0"
    )


def eval_docs_sql(d: str, table: str = "documents") -> str:
    return f"SELECT doc_id, text FROM {table} WHERE doc_id % 97 = 0"


def decontaminate_oracle_sql(d: str, n: int = N_DECONTAM) -> str:
    corpus_sets = _gram_sets_expr(n, d).replace(
        "__T__", f"({contaminated_corpus_sql(d)})"
    )
    bench_sets = _gram_sets_expr(n, d).replace(
        "__T__", f"({eval_docs_sql(d)})"
    )
    unn = "unnest" if d != S else "explode"
    return f"""
WITH corpus_sets AS ({corpus_sets}),
bench_sets AS ({bench_sets}),
bench AS (SELECT DISTINCT {unn}(grams) AS g FROM bench_sets),
corpus_grams AS (
  SELECT doc_id, {sd.arr_len('grams', d)} AS n_grams, {unn}(grams) AS g
  FROM corpus_sets
)
SELECT c.doc_id, CAST(min(c.n_grams) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_hits
FROM corpus_grams c JOIN bench b ON b.g = c.g
GROUP BY c.doc_id
""".strip()


def boilerplate_oracle_sql(d: str, table: str = "documents") -> str:
    sets = _gram_sets_expr(BOILER_N, d).replace("__T__", table)
    unn = "unnest" if d != S else "explode"
    return f"""
WITH sets AS ({sets}),
tok AS (
  SELECT doc_id, {sd.arr_len('grams', d)} AS n_sh, {unn}(grams) AS g
  FROM sets
),
boiler AS (SELECT g FROM (SELECT g, count(*) AS df FROM tok GROUP BY g)
           WHERE df >= {BOILER_DF}),
hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
        FROM tok WHERE g IN (SELECT g FROM boiler) GROUP BY doc_id),
per_doc AS (SELECT DISTINCT doc_id, n_sh FROM tok)
SELECT p.doc_id, CAST(p.n_sh AS BIGINT) AS n_sh,
       coalesce(h.n_boiler, 0) AS n_boiler,
       round(coalesce(h.n_boiler, 0) * 1.0 / p.n_sh, 6) AS boiler_ratio,
       coalesce(h.n_boiler, 0) * {BOILER_KEEP_DEN} <= p.n_sh * {BOILER_KEEP_NUM} AS keep
FROM per_doc p LEFT JOIN hit h ON h.doc_id = p.doc_id
""".strip()


# ---------------------------------------------------------------------------
# SEMANTIC decontamination: max benchmark cosine per corpus embedding
# ---------------------------------------------------------------------------

SEM_DECON_TAU = 0.98
SEM_DECON_BENCH_CAP = 1024  # literal-fold path bound; see raise below
BENCH_MOD = 41  # planted benchmark: every 41st base vector


def semantic_decontaminate(
    corpus: DataFrame, bench: DataFrame, tau: float = SEM_DECON_TAU
) -> DataFrame:
    """(vec_id, max_bench_cos r6, contaminated) — n-gram overlap
    misses paraphrases; the embedding-level rule catches them: a
    corpus vector whose max cosine against ANY benchmark vector
    exceeds tau is flagged.

    Scale shape: the benchmark set is tiny by definition (eval suites
    are ~10^4-10^6 rows vs a ~10^12-row corpus), so it collects to the
    driver and bakes into the plan as literal arrays — ZERO shuffle,
    zero joins, one codegen pass over the corpus computing m staged
    dot-product columns + greatest(). Both the per-bench dot and the
    bench norms are Catalyst-constant-folded from the SAME _dot/_norm
    fragments the DuckDB oracle evaluates, so every cosine is
    bit-identical before the final round. Above SEM_DECON_BENCH_CAP
    the right plan is a broadcast join + groupBy-max instead; this
    operator refuses rather than silently building a megabyte plan.
    """
    from .similarity import _dot, _norm

    rows = bench.select("vec_id", "embedding").collect()
    if not rows:
        raise ValueError("semantic_decontaminate: empty benchmark set")
    if len(rows) > SEM_DECON_BENCH_CAP:
        raise ValueError(
            f"benchmark set {len(rows)} exceeds literal-fold cap "
            f"{SEM_DECON_BENCH_CAP}; use a broadcast join + groupBy-max"
        )
    bench_ids = [int(r.vec_id) for r in rows]
    c = corpus.where(~F.col("vec_id").isin(bench_ids)).withColumn(
        "__vnorm", F.expr(_norm("embedding", S))
    )
    cos_cols = []
    for r in rows:
        lit = "array(" + ", ".join(
            f"CAST({v!r} AS DOUBLE)" for v in r.embedding
        ) + ")"
        cos_cols.append(
            F.expr(_dot("embedding", lit, S))
            / (F.col("__vnorm") * F.expr(_norm(lit, S)))
        )
    mx = cos_cols[0] if len(cos_cols) == 1 else F.greatest(*cos_cols)
    return c.select(
        "vec_id",
        F.round(mx, 6).alias("max_bench_cos"),
        (mx > F.lit(tau)).alias("contaminated"),
    )


def semantic_decontaminate_oracle_sql(
    d: str, tau: float = SEM_DECON_TAU, table: str = "embeddings"
) -> str:
    """Relational re-derivation: cross join corpus x bench, same
    _dot/_norm fragments, max per vec_id — the O(n*m) shape the
    engine's literal fold compiles away."""
    from .similarity import _dot, _norm, corpus_with_dup_vectors_sql

    dot = _dot("c.embedding", "b.embedding", d)
    bnorm = _norm("b.embedding", d)
    cnorm = _norm("embedding", d)
    return f"""
WITH corpus AS ({corpus_with_dup_vectors_sql(d, table)}),
bench AS (
  SELECT vec_id, embedding FROM {table} WHERE vec_id % {BENCH_MOD} = 0
),
c AS (
  SELECT vec_id, embedding, ({cnorm}) AS vnorm FROM corpus
  WHERE vec_id NOT IN (SELECT vec_id FROM bench)
),
pairs AS (
  SELECT c.vec_id, ({dot}) / (c.vnorm * ({bnorm})) AS cos
  FROM c CROSS JOIN bench b
)
SELECT vec_id, round(max(cos), 6) AS max_bench_cos,
       max(cos) > {tau} AS contaminated
FROM pairs GROUP BY vec_id
""".strip()
