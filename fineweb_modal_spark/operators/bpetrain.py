"""In-engine BPE tokenizer-merge TRAINING (Sennrich et al. 2016).

The training-data toolbox scores, filters, dedups and reweights the
corpus; this module closes the remaining loop a data team runs on the
same tables: LEARNING the subword vocabulary itself. (The reference
consumes a pre-trained HF tokenizer — chunker.py:76; training one is
the upstream step its pipeline presumes.)

Execution shape — the same one production BPE trainers
(HuggingFace `tokenizers`, SentencePiece BPE) use, re-expressed
relationally:

  1. ONE corpus-scale pass: lowercased whitespace words →
     (word, n) frequency relation. explode + groupBy = one shuffle
     with map-side partial aggregation; this is the only step whose
     cost grows with corpus size. At 10^12 docs the result is still
     vocabulary-sized (natural-language word inventories are sublinear
     in corpus size).
  2. K merge rounds over the VOCAB relation only: count adjacent
     symbol pairs (weighted by word frequency), pick the most
     frequent (count DESC, pair ASC — deterministic tie-break),
     apply the merge to every word's symbol sequence. Each round is
     one tiny aggregate + a 1-row collect, exactly the GD-loop shape
     of clftrain.py — corpus-size-independent.

Merge application uses literal string `replace` on the
space-separated symbol sequence with a SPACE-DOUBLING trick:

    ' ' + seq.replace(' ', '  ') + ' '   then replace
    ' l  r ' -> ' lr '                   then collapse '  ' -> ' '

Doubling gives every symbol boundary its own delimiter, so plain
left-to-right non-overlapping replace-all merges runs like
[a,a,a,a] -> [aa,aa] exactly like the reference Python BPE loop
(single-space padding would consume the shared space and miss the
second pair). Both engines' `replace` scan left-to-right over the
original string and never re-match replacement text, so the two
renderings cannot drift.

The DuckDB oracle replays the full trajectory as a CTE chain
(w0 -> p1 -> m1 -> w1 -> ...), `AS MATERIALIZED` like the clftrain
oracle: every w_k is referenced twice (pair counter + next merge
application), and an inlining planner would otherwise duplicate the
subtree exponentially.

End-of-word marker: '</w>' (classic BPE), appended as a symbol so
merges can learn word-final subwords; it can never collide with the
[a-z] symbol alphabet enforced by the word filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sqldialect as sd
from ..functions.sqldialect import DUCKDB, SPARK
from ..spec import hashing as H

# Merge rounds for the gate queries. Word filter: pure-ASCII
# lowercase words, bounded length — keeps the symbol alphabet closed
# under lower() in every engine (see sqldialect case-mapping
# envelope) and bounds per-word sequence length.
K_MERGES = 24
WORD_RE = "^[a-z]{1,20}$"
EOW = "</w>"


# ---------------------------------------------------------------------------
# Step 1 — corpus-scale word-frequency relation (the only shuffle)
# ---------------------------------------------------------------------------


def _seq0_sql(word: str, d: str) -> str:
    """word -> 'c h a r s </w>' (space-separated symbol sequence)."""
    if d == SPARK:
        chars = f"regexp_replace({word}, '(.)', '$1 ')"
    else:
        chars = f"regexp_replace({word}, '(.)', '\\1 ', 'g')"
    return f"{chars} || '{EOW}'"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, seq, n): initial symbol sequence per distinct word +
    corpus frequency. One explode + one groupBy(word) shuffle
    (map-side partial agg); everything downstream is vocab-sized.
    `word` rides along untouched so the final segmentation can be
    joined back to the corpus as a broadcast dimension."""
    toks = H.tokens_lower(text_col, SPARK)
    return (
        docs.select(F.explode(F.expr(toks)).alias("word"))
        .where(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .select(
            "word", F.expr(_seq0_sql("word", SPARK)).alias("seq"), "n"
        )
    )


def _word_freqs_sql(d: str, table: str, text_col: str) -> str:
    toks = H.tokens_lower(text_col, d)
    if d == SPARK:
        match = f"word RLIKE '{WORD_RE}'"
        ex = f"SELECT explode({toks}) AS word FROM {table}"
    else:
        match = f"regexp_matches(word, '{WORD_RE}')"
        ex = f"SELECT unnest({toks}) AS word FROM {table}"
    return (
        f"SELECT word, {_seq0_sql('word', d)} AS seq, n FROM ("
        f"SELECT word, count(*) AS n FROM ({ex}) WHERE {match} "
        f"GROUP BY word)"
    )


# ---------------------------------------------------------------------------
# Step 2 — the merge loop (vocab relation only)
# ---------------------------------------------------------------------------


def _pair_expr() -> F.Column:
    """Adjacent symbol pairs of `seq`, frequency-weighted by caller.
    Empty for single-symbol sequences (fully merged words)."""
    arr = F.split(F.col("seq"), " ")
    return F.when(
        F.size(arr) >= 2,
        F.expr(
            "transform(sequence(0, size(split(seq, ' ')) - 2), "
            "i -> split(seq, ' ')[i] || ' ' || split(seq, ' ')[i + 1])"
        ),
    ).otherwise(F.array().cast("array<string>"))


def _apply_merge_expr(seq: F.Column, pair: str) -> F.Column:
    """Left-to-right non-overlapping merge of `pair` ('l r') via the
    space-doubling replace (see module docstring)."""
    doubled = F.concat(
        F.lit(" "), F.replace(seq, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    pat = " " + pair.replace(" ", "  ") + " "
    rep = " " + pair.replace(" ", "") + " "
    merged = F.replace(doubled, F.lit(pat), F.lit(rep))
    return F.btrim(F.replace(merged, F.lit("  "), F.lit(" ")))


def learn_merges(
    docs: DataFrame, k: int = K_MERGES, text_col: str = "text"
) -> tuple[list[tuple[str, int]], DataFrame]:
    """K BPE merge rounds. Returns ([(pair, count), ...] in learned
    order, final vocab-relation DataFrame (seq, n)).

    Each round: one aggregate over the vocab relation + a 1-row
    collect; the merge folds into the next round's projection as a
    literal replace (K-deep codegen chain on a vocab-sized frame).
    Stops early if no adjacent pair remains."""
    w = word_freqs(docs, text_col=text_col).persist()
    merges: list[tuple[str, int]] = []
    try:
        cur = w
        for _ in range(k):
            top = (
                cur.select(
                    F.explode(_pair_expr()).alias("pair"), F.col("n")
                )
                .groupBy("pair")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, cnt = top[0]["pair"], int(top[0]["cnt"])
            merges.append((pair, cnt))
            cur = cur.select(
                "word",
                _apply_merge_expr(F.col("seq"), pair).alias("seq"),
                "n",
            )
        return merges, cur
    finally:
        w.unpersist(blocking=False)


def merges_report(
    spark, docs: DataFrame, k: int = K_MERGES, text_col: str = "text"
) -> DataFrame:
    """Gate frame: (rank, pair, merged, cnt) — the learned merge
    table in order, the artifact a tokenizer ships."""
    merges, _ = learn_merges(docs, k=k, text_col=text_col)
    rows = [
        (i + 1, p, p.replace(" ", ""), c) for i, (p, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, pair string, merged string, cnt bigint"
    )


def vocab_report(
    docs: DataFrame, k: int = K_MERGES, text_col: str = "text"
) -> DataFrame:
    """Gate frame: (symbol, n_words, occurrences) — the symbol
    inventory AFTER k merges, frequency-weighted. Vocab-sized."""
    _, final = learn_merges(docs, k=k, text_col=text_col)
    return (
        final.select(
            F.explode(F.split(F.col("seq"), " ")).alias("symbol"), "n"
        )
        .groupBy("symbol")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n").alias("occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle — replay the merge trajectory as a CTE chain
# ---------------------------------------------------------------------------


def _pairs_sql(wcte: str) -> str:
    """Adjacent-pair counts from a (seq, n) CTE (DuckDB dialect:
    1-indexed lists; range(1, len) is empty for single-symbol
    sequences)."""
    arr = "string_split(seq, ' ')"
    pairs = (
        f"list_transform(range(1, len({arr})), "
        f"i -> {arr}[i] || ' ' || {arr}[i + 1])"
    )
    return (
        f"SELECT p.pair AS pair, sum(n) AS cnt "
        f"FROM {wcte}, unnest({pairs}) AS p(pair) GROUP BY p.pair"
    )


def _apply_merge_sql(mcte: str) -> str:
    """seq under the round's winning merge (scalar subqueries against
    the 1-row merge CTE; same space-doubling replace as Spark)."""
    pat = f"(SELECT ' ' || replace(pair, ' ', '  ') || ' ' FROM {mcte})"
    rep = f"(SELECT ' ' || replace(pair, ' ', '') || ' ' FROM {mcte})"
    doubled = "' ' || replace(seq, ' ', '  ') || ' '"
    return f"trim(replace(replace({doubled}, {pat}, {rep}), '  ', ' '))"


def _merge_ctes(
    d: str, k: int, table: str, text_col: str
) -> tuple[list[str], str]:
    """w0 -> (p1, m1, w1) -> ... -> (pk, mk, wk). MATERIALIZED: every
    w_i is referenced twice; inlining would go exponential (same
    planner hazard as the clftrain weight chain)."""
    assert d == DUCKDB, "the merge-replay chain is oracle-only"
    ctes = [
        f"w0 AS MATERIALIZED ({_word_freqs_sql(d, table, text_col)})"
    ]
    for i in range(1, k + 1):
        ctes.append(f"p{i} AS MATERIALIZED ({_pairs_sql(f'w{i-1}')})")
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT pair, cnt FROM p{i} "
            f"ORDER BY cnt DESC, pair ASC LIMIT 1)"
        )
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT word, "
            f"{_apply_merge_sql(f'm{i}')} AS seq, n FROM w{i-1})"
        )
    return ctes, f"w{k}"


def merges_oracle_sql(
    d: str,
    k: int = K_MERGES,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    ctes, _ = _merge_ctes(d, k, table, text_col)
    rows = " UNION ALL ".join(
        f"SELECT {i} AS rank, pair, replace(pair, ' ', '') AS merged, "
        f"CAST(cnt AS BIGINT) AS cnt FROM m{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({rows})"


def vocab_oracle_sql(
    d: str,
    k: int = K_MERGES,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    ctes, wk = _merge_ctes(d, k, table, text_col)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT s.symbol AS symbol, count(*) AS n_words,
       CAST(sum(n) AS BIGINT) AS occurrences
FROM {wk}, unnest(string_split(seq, ' ')) AS s(symbol)
GROUP BY s.symbol"""
    )


# ---------------------------------------------------------------------------
# Apply: tokenize the corpus under the learned merges
# ---------------------------------------------------------------------------


def tokenize_stats(
    docs: DataFrame, k: int = K_MERGES, text_col: str = "text"
) -> DataFrame:
    """Per-source subword compression report under the learned
    merges: (source, n_words, n_symbols_char, n_symbols_bpe,
    compression_ppm).

    Scale shape — the reason BPE APPLICATION is cheap at 10^12 docs:
    segmentation is computed once per DISTINCT word (the vocab-sized
    relation the trainer already holds), then the corpus pays one
    broadcast join from its exploded words to that dimension. The
    before/after symbol counts are integers, so the ppm division is
    the only float op (identical exact-int operands in both
    engines)."""
    _, final = learn_merges(docs, k=k, text_col=text_col)
    dim = final.select(
        "word",
        (F.length("word") + F.lit(1)).alias("n_char"),
        F.size(F.split(F.col("seq"), " ")).alias("n_bpe"),
    )
    toks = H.tokens_lower(text_col, SPARK)
    words = docs.select(
        "source", F.explode(F.expr(toks)).alias("word")
    ).where(F.col("word").rlike(WORD_RE))
    return (
        words.join(F.broadcast(dim), "word")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_char").alias("n_symbols_char"),
            F.sum("n_bpe").alias("n_symbols_bpe"),
        )
        .select(
            "source",
            "n_words",
            "n_symbols_char",
            "n_symbols_bpe",
            F.round(
                F.lit(1000000.0)
                * F.col("n_symbols_bpe")
                / F.col("n_symbols_char")
            )
            .cast("bigint")
            .alias("compression_ppm"),
        )
    )


def tokenize_stats_oracle_sql(
    d: str,
    k: int = K_MERGES,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    ctes, wk = _merge_ctes(d, k, table, text_col)
    toks = H.tokens_lower(text_col, d)
    ctes.append(
        f"""dim AS MATERIALIZED (
  SELECT word, length(word) + 1 AS n_char,
         len(string_split(seq, ' ')) AS n_bpe FROM {wk})"""
    )
    ctes.append(
        f"""corpus_words AS (
  SELECT source, word FROM (
    SELECT source, unnest({toks}) AS word FROM {table})
  WHERE regexp_matches(word, '{WORD_RE}'))"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT w.source AS source, count(*) AS n_words,
       CAST(sum(d.n_char) AS BIGINT) AS n_symbols_char,
       CAST(sum(d.n_bpe) AS BIGINT) AS n_symbols_bpe,
       CAST(round(1000000.0 * sum(d.n_bpe) / sum(d.n_char)) AS BIGINT)
         AS compression_ppm
FROM corpus_words w JOIN dim d ON w.word = d.word
GROUP BY w.source"""
    )


# ---------------------------------------------------------------------------
# Pure-Python mirror (test oracle for the merge semantics)
# ---------------------------------------------------------------------------


def py_bpe(words: dict[str, int], k: int) -> list[tuple[str, int]]:
    """Reference BPE: the classic dict-of-symbol-tuples loop
    (Sennrich et al., Algorithm 1) with the same deterministic
    tie-break. Used by tests to pin the relational implementation."""
    vocab = {tuple(w) + (EOW,): n for w, n in words.items()}
    out: list[tuple[str, int]] = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out.append((f"{a} {b}", cnt))
        merged = {}
        for syms, n in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            merged[tuple(res)] = merged.get(tuple(res), 0) + n
        vocab = merged
    return out
