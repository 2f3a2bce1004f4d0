"""Similarity search over embedding columns (array<float>).

Two paths, per the training-data-toolbox contract:

* `cosine_topk` — brute-force cosine top-k: the correctness baseline.
  Self-join (broadcast when one side fits) + window row_number. At
  query-batch scale (few query vectors vs a big corpus) the query
  side is broadcast and the corpus is scanned once — the right
  physical plan for "find neighbors of these N docs in 100 TB".
* `neardup_cosine_lsh` — random-hyperplane sign-LSH: P deterministic
  ±1 hyperplanes (md5-derived, shared with the DuckDB oracle) bucket
  vectors by sign pattern; only in-bucket pairs get exact cosine.
  The bucket shuffle replaces the O(n²) cross join — the scale path
  for embedding near-dup removal.

The reference's nearest analog is the LanceDB IVF-PQ index build
(lancer.py:203-216, SURVEY.md S11) — an external index; here both
paths are plain Catalyst plans over the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..spec import hashing as H

S = H.SPARK

N_PLANES = 8
COS_THRESHOLD = 0.99


def _dot(a: str, b: str, d: str) -> str:
    if d == S:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
        )
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def _norm(a: str, d: str) -> str:
    if d == S:
        return (
            f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (s, x) -> s + x))"
        )
    return (
        f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def cosine_topk(emb: DataFrame, k: int = 3) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): top-k neighbors per vector.

    Brute force; the corpus side of the join is broadcast by AQE when
    small enough, else sort-merge. rank ties broken by neighbor_id.
    """
    # norms are per-ROW columns (computed once per vector, not per pair
    # — at n vectors that is n evaluations instead of n²)
    a = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("va"),
        F.expr(_norm("embedding", S)).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vb"),
        F.expr(_norm("embedding", S)).alias("nb"),
    )
    cos = F.expr(_dot("va", "vb", S)) / (F.col("na") * F.col("nb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


def cosine_topk_oracle_sql(d: str, k: int = 3, table: str = "embeddings") -> str:
    dot = _dot("a.embedding", "b.embedding", d)
    nrm = _norm("embedding", d)
    return f"""
WITH n AS (SELECT vec_id, embedding, ({nrm}) AS vnorm FROM {table}),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ({dot}) / (a.vnorm * b.vnorm) AS cosine
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
""".strip()


# ---------------------------------------------------------------------------
# Sign-LSH near-duplicate path
# ---------------------------------------------------------------------------


def corpus_with_dup_vectors_sql(d: str, table: str = "embeddings") -> str:
    """embeddings ∪ scaled copies (every 10th vector ×1.01 → cosine 1
    with its source) — deterministic positives for the LSH path."""
    scale = (
        "transform(embedding, x -> CAST(x * CAST(1.01 AS FLOAT) AS FLOAT))"
        if d == S
        else "list_transform(embedding, x -> CAST(x * CAST(1.01 AS FLOAT) AS FLOAT))"
    )
    return (
        f"SELECT vec_id, embedding FROM {table} "
        f"UNION ALL "
        f"SELECT vec_id + 100000 AS vec_id, {scale} AS embedding "
        f"FROM {table} WHERE vec_id % 10 = 0"
    )


def plane_sign_sql(d: str) -> str:
    """(p, dim, s∈{-1,1}) hyperplane table — md5-derived, dialect-shared."""
    h = H.md5_i64("CAST(p AS STRING) || '_' || CAST(dim AS STRING)", d) if d == S else H.md5_i64(
        "CAST(p AS VARCHAR) || '_' || CAST(dim AS VARCHAR)", d
    )
    bit = f"(({h}) & 1)" if d != S else f"({h} & 1)"
    if d == S:
        return (
            f"SELECT p, dim, CASE WHEN {bit} = 1 THEN 1 ELSE -1 END AS s "
            f"FROM (SELECT explode(sequence(0, {N_PLANES - 1})) AS p) "
            f"LATERAL VIEW explode(sequence(1, 64)) t AS dim"
        )
    return (
        f"SELECT p, dim, CASE WHEN {bit} = 1 THEN 1 ELSE -1 END AS s "
        f"FROM generate_series(0, {N_PLANES - 1}) t1(p), generate_series(1, 64) t2(dim)"
    )


def neardup_pairs_lsh(spark, emb_corpus: DataFrame) -> DataFrame:
    """(vec_a, vec_b, cosine) for in-bucket pairs with cosine ≥ threshold.

    posexplode(embedding) → broadcast-join the 512-row plane table →
    per (vec,plane) signed dot → sign-bit bucket → in-bucket self-join
    → exact cosine verify. Shuffles: one groupBy(vec,p), one bucket
    join — no O(n²) stage anywhere.
    """
    planes = spark.sql(plane_sign_sql(S))
    comp = emb_corpus.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("dim", F.col("pos") + 1)
    dots = (
        comp.join(F.broadcast(planes), "dim")
        .groupBy("vec_id", "p")
        .agg(
            F.sum(F.col("val").cast("double") * F.col("s")).alias("dot")
        )
    )
    buckets = dots.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.expr("CAST(pow(2, p) AS BIGINT)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("bucket")
    )
    with_vec = buckets.join(emb_corpus, "vec_id").withColumn(
        "vnorm", F.expr(_norm("embedding", S))
    )
    a = with_vec.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        F.col("vnorm").alias("na"),
    )
    b = with_vec.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        F.col("vnorm").alias("nb"),
    )
    cos = F.expr(_dot("va", "vb", S)) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= COS_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


def neardup_oracle_sql(d: str) -> str:
    corpus = corpus_with_dup_vectors_sql(d)
    planes = plane_sign_sql(d)
    dot = _dot("a.embedding", "b.embedding", d)
    nrm = _norm("embedding", d)
    return f"""
WITH corpus AS ({corpus}),
planes AS ({planes}),
comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS val
  FROM corpus
),
dots AS (
  SELECT c.vec_id, pl.p, sum(CAST(c.val AS DOUBLE) * pl.s) AS dot
  FROM comp c JOIN planes pl ON c.dim = pl.dim
  GROUP BY c.vec_id, pl.p
),
buckets AS (
  SELECT vec_id,
         sum(CASE WHEN dot > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id
),
wv AS (SELECT b.bucket, c.vec_id, c.embedding, ({nrm}) AS vnorm
       FROM buckets b JOIN corpus c ON b.vec_id = c.vec_id),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ({dot}) / (a.vnorm * b.vnorm) AS cosine
  FROM wv a JOIN wv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cosine, 6) AS cosine
FROM pairs WHERE cosine >= {COS_THRESHOLD}
""".strip()


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse-quantize to centroids, probe nearest
# cells only — the index-backed scale path (reference S11, the LanceDB
# IVF-PQ build at lancer.py:203-216, re-expressed as pure Catalyst).
# ---------------------------------------------------------------------------

N_CENTROIDS = 16
N_PROBE = 4


def _centroids(emb: DataFrame, n: int = N_CENTROIDS) -> DataFrame:
    """Deterministic coarse centroids: the n lowest-id vectors.
    (Production would k-means; determinism matters more here and the
    assignment/probe/search plumbing is identical.)"""
    w = Window.orderBy(F.asc("vec_id"))
    return (
        emb.orderBy("vec_id")
        .limit(n)
        .withColumn("centroid_id", F.row_number().over(w) - 1)
        .select("centroid_id", F.col("embedding").alias("cvec"))
    )


def ivf_topk(emb: DataFrame, k: int = 3, n_probe: int = N_PROBE) -> DataFrame:
    """Top-k cosine neighbors via IVF: assign every vector to its
    max-cosine centroid (broadcast join — centroid table is tiny),
    then for each query probe only the n_probe nearest cells.

    vs brute force: the candidate join keys on cell id, so the
    pairwise stage scans ~n_probe/N_CENTROIDS of the corpus per query
    instead of all of it — the shuffle is (query × probed-cell), never
    O(n²). Recall < 1 by design; tests measure it against cosine_topk.
    """
    cents = _centroids(emb).withColumn("cnorm", F.expr(_norm("cvec", S)))
    with_n = emb.withColumn("vnorm", F.expr(_norm("embedding", S)))
    cos_c = F.expr(_dot("embedding", "cvec", S)) / (
        F.col("vnorm") * F.col("cnorm")
    )
    scored = with_n.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", "vnorm", "centroid_id", cos_c.alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("centroid_id"))
    ranked = scored.withColumn("crank", F.row_number().over(w))
    assign = ranked.where(F.col("crank") == 1).select(
        "vec_id", "embedding", "vnorm", F.col("centroid_id").alias("cell")
    )
    probes = ranked.where(F.col("crank") <= n_probe).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
        F.col("centroid_id").alias("cell"),
    )
    # Per-cell BLAS scoring: cogroup (queries, candidates) by cell and
    # matmul inside applyInPandas — C-speed dot products with ONE
    # shuffle on cell id, instead of per-pair interpreted array folds.
    # Each function call sees one cell (~n/N_CENTROIDS vectors); at
    # 10^12 scale cells are bounded by the centroid count chosen at
    # index build, exactly like IVF posting lists.
    import numpy as np
    import pandas as pd

    def per_cell(pq: pd.DataFrame, pa: pd.DataFrame) -> pd.DataFrame:
        if len(pq) == 0 or len(pa) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "cosine": "float64"})
        Q = np.stack(pq["qvec"].to_numpy()).astype(np.float64)
        A = np.stack(pa["embedding"].to_numpy()).astype(np.float64)
        cos = (Q @ A.T) / np.outer(
            pq["qnorm"].to_numpy(), pa["vnorm"].to_numpy()
        )
        qids = pq["query_id"].to_numpy()
        nids = pa["vec_id"].to_numpy()
        out_q, out_n, out_c = [], [], []
        kk = min(k, cos.shape[1])
        for i in range(cos.shape[0]):
            row = cos[i]
            # mask self-pairs, take top-k within the cell (global rank
            # happens afterwards in the window)
            order = np.lexsort((nids, -row))
            taken = 0
            for j in order:
                if nids[j] == qids[i]:
                    continue
                out_q.append(int(qids[i]))
                out_n.append(int(nids[j]))
                out_c.append(float(row[j]))
                taken += 1
                if taken >= kk:
                    break
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
        )

    pairs = (
        probes.groupBy("cell")
        .cogroup(assign.groupBy("cell"))
        .applyInPandas(
            per_cell, "query_id bigint, neighbor_id bigint, cosine double"
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
        )
    )


def ivf_topk_oracle_sql(
    d: str, k: int = 3, n_probe: int = N_PROBE, table: str = "embeddings"
) -> str:
    dotc = _dot("e.embedding", "c.cvec", d)
    nrm_e = _norm("embedding", d)
    nrm_c = _norm("cvec", d)
    dotq = _dot("p.qvec", "a.embedding", d)
    return f"""
WITH cents0 AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS centroid_id,
         embedding AS cvec
  FROM (SELECT * FROM {table} ORDER BY vec_id ASC LIMIT {N_CENTROIDS})
),
cents AS (SELECT centroid_id, cvec, ({nrm_c}) AS cnorm FROM cents0),
en AS (SELECT vec_id, embedding, ({nrm_e}) AS vnorm FROM {table}),
scored AS (
  SELECT e.vec_id, e.embedding, e.vnorm, c.centroid_id,
         ({dotc}) / (e.vnorm * c.cnorm) AS ccos
  FROM en e CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id ASC) AS crank
  FROM scored
),
assign AS (SELECT vec_id, embedding, vnorm, centroid_id AS cell FROM ranked WHERE crank = 1),
probes AS (SELECT vec_id AS query_id, embedding AS qvec, vnorm AS qnorm, centroid_id AS cell
           FROM ranked WHERE crank <= {n_probe}),
pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ({dotq}) / (p.qnorm * a.vnorm) AS cosine
  FROM probes p JOIN assign a ON p.cell = a.cell AND p.query_id <> a.vec_id
),
rankedq AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM rankedq WHERE rank <= {k}
""".strip()
