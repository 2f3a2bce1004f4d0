"""Distributed Bloom filter — incremental-crawl membership at scale.

The FineWeb-style first pass of an INCREMENTAL crawl is "which of
these 10^9 new URLs have we already seen in the 10^12-URL corpus?".
A join against the seen set shuffles the full corpus; the scale
answer is a Bloom filter: build once over the seen keys (ONE shuffle
whose reducer count is the bitmap's WORD count, not the key count),
then membership is a broadcast join of the (tiny) word relation —
no corpus shuffle ever again. False positives only (tunable via
m/k), never false negatives: a "no" is definitive, exactly the
guarantee an incremental dedup pass needs (a false positive merely
re-checks a URL exactly).

Everything is exact integer arithmetic over the repo's portable
60-bit md5 hash (spec/hashing.md5_i64), so the whole structure —
bit positions, word OR-folds, membership verdicts — re-derives
bit-identically in DuckDB; the gate hash-checks the verdict per key.

Sizing: m bits as m/WORD BIGINT words; k independent positions per key
via salted md5. Defaults (m=2^20, k=3) suit the fixture corpus; a
10^12-key production filter sizes m ~ 10·n (a few TB of words,
sharded by key range into per-shard filters — the BUILD plan below
is already that shape: groupBy(word_idx) is a partial agg and the
word relation partitions trivially).

Reference analog: none (the reference recrawls from scratch) — this
is part of the training-data-toolbox extension (briefing:
deduplication at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..spec import hashing as H

M_BITS = 1 << 20  # filter size in bits (power of two)
K_HASHES = 3  # positions per key
WORD = 32  # bits per word — masks live in BIGINT with headroom
           # (bit 63 overflows DuckDB's signed << and wraps in
           # Java shiftleft; 32-bit words sidestep both)


def _pos_sql(key_expr: str, i: int, d: str) -> str:
    """i-th bit position of a key: salted portable hash mod m."""
    cast = "STRING" if d == sd.SPARK else "VARCHAR"
    h = H.md5_i64(f"'{i}:' || CAST({key_expr} AS {cast})", d)
    return f"(({h}) % {M_BITS})"


def positions_sql(key_expr: str, d: str, k: int = K_HASHES) -> list[str]:
    return [_pos_sql(key_expr, i, d) for i in range(k)]


def build_bloom(df: DataFrame, key_col: str) -> DataFrame:
    """(word_idx, bits): the filter's nonzero words.

    Plan: row-local position expansion (k rows per key, no join) →
    groupBy(word_idx) with bit_or — a two-phase partial agg, so the
    single shuffle moves at most m/WORD rows per map task regardless of
    key count or skew."""
    pos_exprs = ", ".join(positions_sql(key_col, sd.SPARK))
    pos = df.select(
        F.explode(F.expr(f"array({pos_exprs})")).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / WORD).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def maybe_member(candidates: DataFrame, bloom: DataFrame, key_col: str) -> DataFrame:
    """candidates + maybe_seen: true iff ALL k bits are set.

    The bloom relation (≤ m/WORD rows) broadcasts; each candidate
    expands to its k (word_idx, mask) probes row-locally, left-joins
    the words, and a count-of-hits agg per key gives the verdict —
    the only shuffle is the per-key agg, which AQE coalesces."""
    pos_exprs = ", ".join(positions_sql(key_col, sd.SPARK))
    probes = candidates.select(
        key_col,
        F.explode(F.expr(f"array({pos_exprs})")).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / WORD).cast("long").alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD} AS INT))"
        ).alias("mask"),
    )
    hit = probes.join(F.broadcast(bloom), "word_idx", "left").select(
        key_col,
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
            != 0
        ).cast("int").alias("hit"),
    )
    return hit.groupBy(key_col).agg(
        (F.sum("hit") == K_HASHES).alias("maybe_seen")
    )


def membership_oracle_sql(
    seen_sql: str, cand_sql: str, key_col: str = "url", d: str = sd.DUCKDB
) -> str:
    """DuckDB re-derivation: same salted-hash positions, same word
    OR-fold, same all-k-bits verdict."""
    pos_rows = " UNION ALL ".join(
        f"SELECT {key_col}, {p} AS pos FROM seen"
        for p in positions_sql(key_col, d)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {key_col}, {p} AS pos FROM cand"
        for p in positions_sql(key_col, d)
    )
    return f"""
WITH seen AS ({seen_sql}),
cand AS ({cand_sql}),
spos AS ({pos_rows}),
bloom AS (
  SELECT CAST(pos // {WORD} AS BIGINT) AS word_idx,
         CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % {WORD} AS INT)) AS BIGINT) AS bits
  FROM spos GROUP BY 1
),
cpos AS ({probe_rows}),
probes AS (
  SELECT {key_col}, CAST(pos // {WORD} AS BIGINT) AS word_idx,
         CAST(CAST(1 AS BIGINT) << CAST(pos % {WORD} AS INT) AS BIGINT) AS mask
  FROM cpos
),
hits AS (
  SELECT p.{key_col},
         CASE WHEN (coalesce(b.bits, 0) & p.mask) <> 0 THEN 1 ELSE 0 END AS hit
  FROM probes p LEFT JOIN bloom b ON b.word_idx = p.word_idx
)
SELECT {key_col}, CAST(sum(hit) AS BIGINT) = {K_HASHES} AS maybe_seen
FROM hits GROUP BY {key_col}
""".strip()
