"""Dialect-portable hashing / shingling SQL fragments.

All dedup + fingerprint operators (MinHash, SimHash, rolling-hash
fingerprints) need ONE hash function that produces bit-identical
values in Spark SQL and in the DuckDB oracle. md5 is the only
cryptographic hash both engines share, so the portable 60-bit integer
hash is: first 15 hex chars of md5 → BIGINT (60 bits < 2^63, no sign
games).

Every fragment below renders for both dialects from the same spec
constants, the repo's standard anti-drift pattern
(functions/sqldialect.py). The Spark operators consume the "spark"
rendering via F.expr — still Catalyst column expressions, fully
codegen'd, zero Python in the hot path.

Reference analog: the reference has no dedup at all — this is the
training-data-toolbox extension the target engine adds (minhash/
simhash/fingerprint over the documents table).
"""

from __future__ import annotations

from . import quality_rules  # noqa: F401  (re-export convenience)
from ..functions import sqldialect as sd

SPARK = sd.SPARK
DUCKDB = sd.DUCKDB

# MinHash configuration
N_SHINGLE = 3  # words per shingle
N_HASHES = 8  # signature length
N_BANDS = 4  # LSH bands (2 rows per band)
ROWS_PER_BAND = N_HASHES // N_BANDS

# SimHash configuration
SIMHASH_BITS = 32

# Rolling-hash fingerprint
FP_MOD = 1_000_000_007
FP_MULT = 31


def md5_i64(e: str, d: str) -> str:
    """Portable 60-bit integer hash of a string expression."""
    if d == SPARK:
        return f"CAST(conv(substr(md5({e}), 1, 15), 16, 10) AS BIGINT)"
    return f"('0x' || substr(md5({e}), 1, 15))::BIGINT"


def tokens_lower(col: str, d: str) -> str:
    """Lowercased whitespace tokens of trimmed text."""
    return sd.ws_tokens(f"lower({col})", d)


def _arr_transform(e: str, lam: str, d: str) -> str:
    fn = "transform" if d == SPARK else "list_transform"
    return f"{fn}({e}, {lam})"


def _arr_min(e: str, d: str) -> str:
    return f"array_min({e})" if d == SPARK else f"list_min({e})"


def _seq(lo: str, hi: str, d: str) -> str:
    return f"sequence({lo}, {hi})" if d == SPARK else f"generate_series({lo}, {hi})"


def _get(arr: str, i: str, d: str) -> str:
    """1-based array access returning NULL out of bounds (both sides)."""
    if d == SPARK:
        return f"get({arr}, {i} - 1)"  # get() is 0-based, NULL OOB
    return f"{arr}[{i}]"  # duckdb 1-based, NULL OOB


def shingles(toks: str, d: str, n: int = N_SHINGLE) -> str:
    """Array of n-word shingles; a doc shorter than n words yields one
    shingle of all its words (the slice clamps at the array end in
    both dialects).

    Rendered as ONE native slice + join per window, not n per-element
    gets: interpreted-HOF lambda bodies cost ~µs per sub-expression
    eval, so the get-based form was O(n) interpreted evals per window
    — 6× slower at n=30 (measured; the spandedup window stage).
    Output strings are bit-identical to the get-based rendering,
    including the short-doc tail."""
    hi = f"greatest({sd.arr_len(toks, d)} - {n - 1}, 1)"
    if d == SPARK:
        lam = f"i -> concat_ws(' ', slice({toks}, i, {n}))"
    else:
        lam = f"i -> array_to_string({toks}[i:i + {n - 1}], ' ')"
    return _arr_transform(_seq("1", hi, d), lam, d)


# Universal-hash permutation constants (fixed, public): sig_k over a
# 30-bit reduced md5 so (h*A + B) stays far inside BIGINT range.
MINHASH_A = [1299721, 2750161, 4256249, 5800079, 7368787, 8960453, 10570841, 15485863]
MINHASH_B = [104729, 224737, 350377, 479909, 611953, 746773, 882377, 1020379]
MINHASH_P = 2147483647  # 2^31 - 1
_H30 = 1 << 30


def shingle_hashes(sh: str, d: str) -> str:
    """ONE md5 per shingle, reduced to 30 bits — the permutations are
    then pure arithmetic (8× fewer md5 evaluations than hashing each
    (k | shingle) pair)."""
    h = md5_i64("s", d)
    return _arr_transform(sh, f"s -> ({h}) % {_H30}", d)


def minhash_sig(hashed: str, k: int, d: str) -> str:
    """k-th MinHash permutation: min over (A_k·h + B_k) mod P."""
    a, b = MINHASH_A[k], MINHASH_B[k]
    return _arr_min(
        _arr_transform(hashed, f"h -> (h * {a} + {b}) % {MINHASH_P}", d), d
    )


def minhash_signatures_select(d: str, table: str = "documents") -> str:
    """doc_id + sig_0..sig_{K-1} in one scan, no shuffle, no explode:
    each signature is an array fold over the row's own hashed shingles."""
    toks = tokens_lower("text", d)
    sh = shingles("__toks", d)
    shh = shingle_hashes("__sh", d)
    sig_cols = ", ".join(
        f"{minhash_sig('__shh', k, d)} AS sig_{k}" for k in range(N_HASHES)
    )
    return (
        f"SELECT doc_id, {sig_cols} FROM "
        f"(SELECT doc_id, {shh} AS __shh FROM "
        f"(SELECT doc_id, {sh} AS __sh FROM "
        f"(SELECT doc_id, {toks} AS __toks FROM {table})))"
    )


def band_hash(b: int, d: str) -> str:
    """Bucket key of band b: hash of its signature rows."""
    cols = " || '_' || ".join(
        f"CAST(sig_{b * ROWS_PER_BAND + r} AS STRING)"
        if d == SPARK
        else f"CAST(sig_{b * ROWS_PER_BAND + r} AS VARCHAR)"
        for r in range(ROWS_PER_BAND)
    )
    return f"md5({cols})"


def simhash_select(d: str, table: str = "documents", bits: int = SIMHASH_BITS) -> str:
    """doc_id + simhash (bits-wide) via explode + bit-majority vote.

    Token multiplicity weights the vote (standard SimHash). The
    explode/groupBy shuffles on doc_id — at corpus scale that is a
    map-side-combinable partial agg, the same two-phase shape as the
    reference's top10map/top10reduce pair.
    """
    toks = tokens_lower("text", d)
    h = md5_i64("'w:' || __tok", d)
    if d == SPARK:
        exploded = (
            f"SELECT doc_id, {h} AS __h FROM "
            f"(SELECT doc_id, explode({toks}) AS __tok FROM {table})"
        )
    else:
        exploded = (
            f"SELECT doc_id, {h} AS __h FROM "
            f"(SELECT doc_id, unnest({toks}) AS __tok FROM {table})"
        )
    votes = ", ".join(
        (
            f"sum(CASE WHEN (shiftright(__h, {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
            if d == SPARK
            else f"sum(CASE WHEN ((__h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
        )
        for j in range(bits)
    )
    recon = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return (
        f"SELECT doc_id, {recon} AS simhash FROM "
        f"(SELECT doc_id, {votes} FROM ({exploded}) GROUP BY doc_id)"
    )


def fingerprint_expr(toks: str, d: str) -> str:
    """Rolling polynomial hash over token hashes (document fingerprint):
    fold h = (h*MULT + md5_i64(tok) % MOD) % MOD. Values stay < 2^63."""
    tok_h = md5_i64("t", d)
    hashed = _arr_transform(toks, f"t -> {tok_h} % {FP_MOD}", d)
    if d == SPARK:
        return (
            f"aggregate({hashed}, CAST(0 AS BIGINT), "
            f"(acc, x) -> (acc * {FP_MULT} + x) % {FP_MOD})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashed}), "
        f"(acc, x) -> (acc * {FP_MULT} + x) % {FP_MOD})"
    )


# BPE-ish token pattern: letter runs, single digits, single punctuation
# marks — deliberately regex-dialect-portable (no lookarounds).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(col: str, d: str) -> str:
    if d == SPARK:
        return f"size(regexp_extract_all({col}, '{sd.esc(BPE_TOKEN_RE, d)}', 0))"
    return f"len(regexp_extract_all({col}, '{sd.esc(BPE_TOKEN_RE, d)}'))"
