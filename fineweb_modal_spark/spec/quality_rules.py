"""Quality-signal + keep/drop rule spec (gopher/FineWeb-style).

Single source of truth for the heuristic quality stage. Three
consumers, kept in lockstep by construction:
  * operators/quality.py — Spark built-in column expressions
  * __spark_entry__.oracle_sql — equivalent DuckDB SQL
  * signals_py / keep_py here — the pure-Python oracle for pytest

Every signal is chosen to be expressible per-row in BOTH Spark SQL
and DuckDB without UDFs (north rule: zero per-row Python), and the
two SQL renderings are tested hash-equal by the driver gate.

Reference analog: the threshold predicates of
/root/reference/filter.py:50 and summary.py:53-55, generalized to
gopher-style rules per the BASELINE.json north_star.
"""

from __future__ import annotations

import math
import re

# English stopword subset used for the stopword-ratio signal.
# Kept SMALL and fixed: it is inlined into SQL on both engines.
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "that", "it", "for"]

# keep/drop thresholds (inclusive bounds where noted)
MIN_WORDS = 10
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 1.5
MAX_MEAN_WORD_LEN = 12.0
MIN_STOPWORD_RATIO = 0.01
MAX_DIGIT_RATIO = 0.3
MIN_DISTINCT_RATIO = 0.05

# ordered drop reasons — first failing rule wins
DROP_REASONS = [
    "too_few_words",
    "too_many_words",
    "mean_word_len_out_of_range",
    "low_stopword_ratio",
    "high_digit_ratio",
    "low_distinct_ratio",
]

# ASCII-pinned whitespace — one definition across Python spec, Spark
# and DuckDB renderings (see gopher_rules.WS_EDGE_CHARS rationale)
WS_EDGE_CHARS = " \t\n\x0b\f\r"
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def signals_py(text: str) -> dict:
    """Pure-Python oracle of the per-document quality signals."""
    t = (text or "").strip(WS_EDGE_CHARS)
    tokens = _WS.split(t) if t else []
    n_words = len(tokens)
    n_chars = len(text or "")
    no_ws_len = sum(len(w) for w in tokens)
    digits = sum(1 for c in (text or "") if c.isdigit())
    lower = [w.lower() for w in tokens]
    stop_hits = sum(1 for w in lower if w in STOPWORDS)
    distinct = len(set(tokens))
    return {
        "n_words": n_words,
        "n_chars": n_chars,
        "mean_word_len": (no_ws_len / n_words) if n_words else 0.0,
        "stopword_ratio": (stop_hits / n_words) if n_words else 0.0,
        "digit_ratio": (digits / n_chars) if n_chars else 0.0,
        "distinct_ratio": (distinct / n_words) if n_words else 0.0,
    }


def keep_py(text: str, lang_pred: str | None = None) -> tuple[bool, str | None]:
    """Pure-Python oracle of the keep/drop decision.

    The stopword rule only applies to (predicted-)English documents
    when lang_pred is provided; the standalone SQL-gated variant
    passes lang_pred=None and applies it unconditionally.
    """
    s = signals_py(text)
    if s["n_words"] < MIN_WORDS:
        return False, "too_few_words"
    if s["n_words"] > MAX_WORDS:
        return False, "too_many_words"
    if not (MIN_MEAN_WORD_LEN <= s["mean_word_len"] <= MAX_MEAN_WORD_LEN):
        return False, "mean_word_len_out_of_range"
    if (lang_pred is None or lang_pred == "en") and s["stopword_ratio"] < MIN_STOPWORD_RATIO:
        return False, "low_stopword_ratio"
    if s["digit_ratio"] > MAX_DIGIT_RATIO:
        return False, "high_digit_ratio"
    if s["distinct_ratio"] < MIN_DISTINCT_RATIO:
        return False, "low_distinct_ratio"
    return True, None


# ---------------------------------------------------------------------------
# Character-bigram perplexity model (KenLM-style stand-in, hermetic).
# ---------------------------------------------------------------------------

# Seed corpus: the lexicon text of spec.langid_model — a pure function
# of the repo, no external data.
_ALPHABET = "abcdefghijklmnopqrstuvwxyz "
_A = len(_ALPHABET)
_CHAR_IDX = {c: i for i, c in enumerate(_ALPHABET)}


def _seed_corpus() -> str:
    from . import langid_model

    words: list[str] = []
    for lang in ("en", "fr", "de", "es"):
        words.extend(langid_model.LEXICONS[lang])
    return " ".join(words)


# Log-prob quantum: table values are rounded to multiples of 2^-18.
# |logp| < 8 needs 3 integer bits, so quantized values hold exactly in
# float32 (21 < 24 mantissa bits) AND any sum of < 2^35 of them is
# EXACT in float64 — summation order stops mattering, which is what
# lets a SQL oracle reproduce the engine's perplexity bit-for-bit
# (numpy pairwise sum vs SQL sequential sum would otherwise differ in
# the last ulps).
PPL_QUANT = 1 << 18


def build_bigram_logprobs():
    """(A, A) float32 log P(c2|c1), Laplace-smoothed, from the seed
    corpus; values quantized to multiples of 1/PPL_QUANT (see above)."""
    import numpy as np

    counts = np.ones((_A, _A), dtype=np.float64)  # Laplace
    corpus = _seed_corpus()
    norm = [_CHAR_IDX.get(c, _CHAR_IDX[" "]) for c in corpus.lower()]
    for a, b in zip(norm, norm[1:]):
        counts[a, b] += 1.0
    logp = np.log(counts / counts.sum(axis=1, keepdims=True))
    logp = np.round(logp * PPL_QUANT) / PPL_QUANT
    return logp.astype(np.float32)


_LOGP = None


def _logp_table():
    global _LOGP
    if _LOGP is None:
        _LOGP = build_bigram_logprobs()
    return _LOGP


def perplexity_py(text: str) -> float:
    """Oracle perplexity: exp(-mean bigram logprob) over normalized chars.

    Unknown chars map to space; texts with < 2 usable chars → ppl of
    the uniform model (A)."""
    logp = _logp_table()
    idx = [_CHAR_IDX.get(c, _CHAR_IDX[" "]) for c in (text or "").lower()]
    if len(idx) < 2:
        return float(_A)
    total = 0.0
    for a, b in zip(idx, idx[1:]):
        total += float(logp[a, b])
    return float(math.exp(-total / (len(idx) - 1)))


def perplexity_batch(texts, logp=None):
    """Vectorized batch perplexity (numpy) — used inside the Spark UDF.

    Identical math to perplexity_py; float32 accumulation is avoided
    (sums in float64) so both paths agree to ~1e-6 relative.
    """
    import numpy as np

    if logp is None:
        logp = _logp_table()
    out = np.empty(len(texts), dtype=np.float64)
    space = _CHAR_IDX[" "]
    lut = np.full(1 << 16, space, dtype=np.int32)
    for c, i in _CHAR_IDX.items():
        lut[ord(c)] = i
    for i, text in enumerate(texts):
        t = (text or "").lower()
        if len(t) < 2:
            out[i] = float(_A)
            continue
        if t.isascii():
            codes = np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(np.int64)
            idx = lut[codes]
        else:
            # non-BMP chars would split into utf-16 surrogates; take the
            # oracle-identical per-char path for the rare non-ascii text
            idx = np.array([_CHAR_IDX.get(c, space) for c in t], dtype=np.int64)
        lp = logp[idx[:-1], idx[1:]].astype(np.float64)
        out[i] = math.exp(-lp.sum() / (len(idx) - 1))
    return out


def ppl_select_sql(
    table: str = "documents",
    text_col: str = "text",
    key_cols: str = "doc_id",
) -> str:
    """DuckDB rendering of the perplexity walk (oracle side only — the
    engine side is the fused scoring UDF, which is what the gate
    tests).

    The quantized table (see PPL_QUANT) is inlined as a VALUES
    relation with exact decimal literals; per-bigram lookups join
    against it and SUM exactly (order-free by construction), so
    exp(-S/(n-1)) sees bit-identical operands in both engines."""
    import numpy as np

    logp = _logp_table()
    rows = ", ".join(
        f"({a + 1}, {b + 1}, {float(np.float64(logp[a, b]))!r})"
        for a in range(_A)
        for b in range(_A)
    )
    alpha = _ALPHABET.replace("'", "''")

    def idx(e: str) -> str:
        return (
            f"CASE WHEN strpos('{alpha}', {e}) = 0 THEN {_A} "
            f"ELSE strpos('{alpha}', {e}) END"
        )

    return f"""
WITH __ppl_tbl(a, b, v) AS (SELECT * FROM (VALUES {rows})),
__ppl_base AS (
  SELECT {key_cols}, lower(coalesce({text_col}, '')) AS s,
         length(lower(coalesce({text_col}, ''))) AS n
  FROM {table}
),
__ppl_pairs AS (
  SELECT {key_cols}, n,
         {idx("substr(s, CAST(i AS INT), 1)")} AS a,
         {idx("substr(s, CAST(i AS INT) + 1, 1)")} AS b
  FROM (SELECT {key_cols}, n, s, unnest(generate_series(1, n - 1)) AS i
        FROM __ppl_base WHERE n >= 2)
),
__ppl_sums AS (
  SELECT {key_cols}, any_value(n) AS n, sum(t.v) AS sv
  FROM __ppl_pairs p JOIN __ppl_tbl t ON t.a = p.a AND t.b = p.b
  GROUP BY {key_cols}
)
SELECT {key_cols}, exp(-sv / (n - 1)) AS ppl FROM __ppl_sums
UNION ALL
SELECT {key_cols}, CAST({_A} AS DOUBLE) AS ppl FROM __ppl_base WHERE n < 2
""".strip()


# ---------------------------------------------------------------------------
# Model-based quality classifier (FineWeb-Edu / DCLM-style stand-in).
#
# Real pipelines run a trained classifier (fastText / linear head on
# embeddings) after the heuristic rules; offline this spec fixes a
# deterministic logistic regression over the five heuristic signals
# with interpretable hand-set weights. The SAME arithmetic string is
# parsed by Spark and DuckDB (and mirrored in clf_py), so the logit is
# IEEE-identical across engines: the keep decision thresholds the
# rational logit at 0 (no transcendental on the decision path); only
# the reported sigmoid score touches exp(), and it is rounded to 6 dp.
# ---------------------------------------------------------------------------

CLF_BIAS = -2.0
CLF_W_STOPWORD = 3.0  # stopword-rich prose reads as natural language
CLF_W_DISTINCT = 1.5  # vocabulary diversity
CLF_W_DIGIT = -6.0    # digit-heavy pages are tables/serials/boilerplate
CLF_W_NWSAT = 2.0     # saturating length bonus: n/(n+100)
CLF_W_MWL = 0.5       # mild bonus for longer mean word length
CLF_MWL_CENTER = 4.5
CLF_NW_SCALE = 100.0


def clf_logit_sql() -> str:
    """Dialect-neutral logit over the raw signal column names — one
    string, parsed by both engines, so evaluation order matches."""
    return (
        f"({CLF_BIAS} + {CLF_W_STOPWORD} * stopword_ratio "
        f"+ {CLF_W_DISTINCT} * distinct_ratio "
        f"+ {CLF_W_DIGIT} * digit_ratio "
        f"+ {CLF_W_NWSAT} * (CAST(n_words AS DOUBLE) / (n_words + {CLF_NW_SCALE})) "
        f"+ {CLF_W_MWL} * (mean_word_len - {CLF_MWL_CENTER}))"
    )


def clf_py(sig: dict) -> tuple[float, bool]:
    """(sigmoid score, keep) — pure-Python mirror of clf_logit_sql,
    same operand order so the floats match bit-for-bit."""
    logit = (
        CLF_BIAS
        + CLF_W_STOPWORD * sig["stopword_ratio"]
        + CLF_W_DISTINCT * sig["distinct_ratio"]
        + CLF_W_DIGIT * sig["digit_ratio"]
        + CLF_W_NWSAT * (float(sig["n_words"]) / (sig["n_words"] + CLF_NW_SCALE))
        + CLF_W_MWL * (sig["mean_word_len"] - CLF_MWL_CENTER)
    )
    return 1.0 / (1.0 + math.exp(-logit)), logit >= 0.0
