"""Encoding-anomaly detection + repair (mojibake, U+FFFD, C1 strays).

Real web crawls arrive with a long tail of encoding damage: UTF-8
bytes decoded as Latin-1 ("mojibake": e.g. U+00E9 surfacing as the
pair U+00C3 U+00A9), replacement characters (U+FFFD) where a decoder
gave up, and C1 control codepoints from mis-mapped windows-1252. A
curation pipeline needs (a) per-document damage SIGNALS cheap enough
to run on every page, (b) a deterministic REPAIR pass for the common
patterns, and (c) a corpus-level report so a crawl batch with an
encoding regression is caught before it trains.

Everything here is built-in string functions (replace / length
arithmetic — whole-stage codegen, zero Python in the hot path, zero
shuffle until the final per-source aggregate), so the stage costs
one scan at 10^12 docs, like the scrub pass it composes with
(operators/scrub.py; north-rule DAG position: after scrub, before
the keep/drop decision).

The gate corrupts the fixture deterministically IN-QUERY (doc_id
modulus -> the same ``replace`` in both dialects) so the detector is
exercised on a known non-trivial distribution rather than on an
accidentally-clean fixture; production callers run the same
``anomaly_signals`` on the raw text column.

All pattern constants are built with chr() so no source-file
encoding ambiguity can desync the two dialect renderings (the same
reason sqldialect pins its whitespace set as chr() concats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Latin-1 renderings of common UTF-8 sequences (the mojibake
# vocabulary): each maps back to the intended codepoint.
MOJIBAKE_PAIRS: list[tuple[str, str]] = [
    (chr(0xC3) + chr(0xA9), chr(0xE9)),  # A-tilde + copyright -> e-acute
    (chr(0xC3) + chr(0xA8), chr(0xE8)),  # -> e-grave
    (chr(0xC3) + chr(0xBC), chr(0xFC)),  # -> u-umlaut
    (chr(0xC3) + chr(0xB6), chr(0xF6)),  # -> o-umlaut
    # the 3-char CP1252 render of RIGHT SINGLE QUOTATION MARK
    (chr(0xE2) + chr(0x20AC) + chr(0x2122), chr(0x2019)),
]

REPLACEMENT_CHAR = chr(0xFFFD)

# C1 stray marker: U+0085 (NEL) — the mis-mapped windows-1252
# codepoint that most often survives into "clean" text.
NEL_CHAR = chr(0x85)

# Flag threshold: any mojibake pair, any C1 stray, or >=2 U+FFFD.
FLAG_MIN_REPLACEMENT = 2


def _occurrences(col: Column, needle: str) -> Column:
    """Occurrence count via replace-arithmetic (codegen, no regex)."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def corrupt_fixture(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic gate-grain damage: every 7th doc gets mojibake
    ('e' -> U+00C3 U+00A9), every 11th gets replacement chars
    ('a' -> 'a' + U+FFFD). Mirrored verbatim by ``_corrupt_sql``."""
    t = F.col(text_col)
    moj = F.replace(t, F.lit("e"), F.lit(MOJIBAKE_PAIRS[0][0]))
    rep = F.replace(t, F.lit("a"), F.lit("a" + REPLACEMENT_CHAR))
    return docs.withColumn(
        "ctext",
        F.when(F.col("doc_id") % 7 == 0, moj)
        .when(F.col("doc_id") % 11 == 0, rep)
        .otherwise(t),
    )


def anomaly_signals(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Adds n_mojibake, n_replacement, n_c1, enc_flagged columns."""
    t = F.col(text_col)
    moj = None
    for pair, _fixed in MOJIBAKE_PAIRS:
        c = _occurrences(t, pair).cast("long")
        moj = c if moj is None else moj + c
    n_rep = _occurrences(t, REPLACEMENT_CHAR).cast("long")
    n_c1 = _occurrences(t, NEL_CHAR).cast("long")
    return (
        docs.withColumn("n_mojibake", moj)
        .withColumn("n_replacement", n_rep)
        .withColumn("n_c1", n_c1)
        .withColumn(
            "enc_flagged",
            (F.col("n_mojibake") > 0)
            | (F.col("n_replacement") >= FLAG_MIN_REPLACEMENT)
            | (F.col("n_c1") > 0),
        )
    )


def repair(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic repair: fold each mojibake pair back to its
    intended codepoint, drop replacement chars. Idempotent (the
    repaired text contains none of the patterns it rewrites)."""
    t = F.col(text_col)
    for pair, fixed in MOJIBAKE_PAIRS:
        t = F.replace(t, F.lit(pair), F.lit(fixed))
    t = F.replace(t, F.lit(REPLACEMENT_CHAR), F.lit(""))
    return docs.withColumn("rtext", t)


def anomaly_report(docs: DataFrame) -> DataFrame:
    """Per-source damage report over the deterministically-corrupted
    fixture: doc counts, flag counts, signal totals, and the net
    char delta the repair pass would apply."""
    d = repair(
        anomaly_signals(corrupt_fixture(docs), text_col="ctext"),
        text_col="ctext",
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("enc_flagged").cast("long")).alias("n_flagged"),
            F.sum("n_mojibake").alias("total_mojibake"),
            F.sum("n_replacement").alias("total_replacement"),
            F.sum("n_c1").alias("total_c1"),
            F.sum(
                F.length(F.col("ctext")) - F.length(F.col("rtext"))
            ).alias("repair_char_delta"),
        )
        .orderBy("source")
    )


def _sql_quote(s: str) -> str:
    """Render a constant as a chr()-concat SQL expression so neither
    dialect's string-literal escape rules (or file encodings) matter."""
    return " || ".join(f"chr({ord(ch)})" for ch in s)


def _occurrences_sql(col: str, needle: str) -> str:
    from ..functions import sqldialect as sd

    return sd.occ_count(col, _sql_quote(needle), len(needle), sd.DUCKDB)


def _corrupt_sql(text: str = "text") -> str:
    moj = f"replace({text}, 'e', {_sql_quote(MOJIBAKE_PAIRS[0][0])})"
    rep = (
        f"replace({text}, 'a', {_sql_quote('a' + REPLACEMENT_CHAR)})"
    )
    return (
        f"CASE WHEN doc_id % 7 = 0 THEN {moj} "
        f"WHEN doc_id % 11 = 0 THEN {rep} ELSE {text} END"
    )


def report_oracle_sql(table: str = "documents") -> str:
    """DuckDB mirror of ``anomaly_report`` (length/replace arithmetic
    is character-based in both engines; `//` keeps counts BIGINT)."""
    moj_terms = " + ".join(
        _occurrences_sql("ctext", pair) for pair, _ in MOJIBAKE_PAIRS
    )
    rep_cnt = _occurrences_sql("ctext", REPLACEMENT_CHAR)
    c1_cnt = _occurrences_sql("ctext", NEL_CHAR)
    rtext = "ctext"
    for pair, fixed in MOJIBAKE_PAIRS:
        rtext = (
            f"replace({rtext}, {_sql_quote(pair)}, {_sql_quote(fixed)})"
        )
    rtext = f"replace({rtext}, {_sql_quote(REPLACEMENT_CHAR)}, '')"
    return f"""
WITH corrupted AS (
  SELECT doc_id, source, {_corrupt_sql()} AS ctext
  FROM {table}
), sig AS (
  SELECT source,
         {moj_terms} AS n_mojibake,
         {rep_cnt} AS n_replacement,
         {c1_cnt} AS n_c1,
         length(ctext) - length({rtext}) AS repair_delta
  FROM corrupted
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_mojibake > 0
                 OR n_replacement >= {FLAG_MIN_REPLACEMENT}
                 OR n_c1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(n_mojibake) AS BIGINT) AS total_mojibake,
       CAST(SUM(n_replacement) AS BIGINT) AS total_replacement,
       CAST(SUM(n_c1) AS BIGINT) AS total_c1,
       CAST(SUM(repair_delta) AS BIGINT) AS repair_char_delta
FROM sig
GROUP BY source
ORDER BY source
"""
