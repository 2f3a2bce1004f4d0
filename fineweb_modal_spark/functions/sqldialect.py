"""Render spec expressions as Spark SQL or DuckDB SQL.

The driver's correctness gate runs every `queries()` entry on Spark
and the matching `oracle_sql()` string on DuckDB, hash-comparing the
results. These helpers isolate the handful of dialect differences
(regex escaping, list-function names, global-replace flags) so the
two renderings of one spec expression cannot drift apart.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"


def esc(pattern: str, d: str) -> str:
    """Regex pattern → SQL string literal body. Spark SQL literals
    treat backslash as an escape character; DuckDB's do not."""
    return pattern.replace("\\", "\\\\") if d == SPARK else pattern


def ws_tokens(col: str, d: str) -> str:
    """Whitespace token array of trimmed text ('' → ['']) — callers
    guard the empty case explicitly (see n_words_sql)."""
    if d == SPARK:
        return f"split(trim({col}), '\\\\s+')"
    return f"regexp_split_to_array(trim({col}), '\\s+')"


def arr_len(e: str, d: str) -> str:
    return f"size({e})" if d == SPARK else f"len({e})"


def arr_distinct(e: str, d: str) -> str:
    return f"array_distinct({e})" if d == SPARK else f"list_distinct({e})"


def arr_filter(e: str, lam: str, d: str) -> str:
    fn = "filter" if d == SPARK else "list_filter"
    return f"{fn}({e}, {lam})"


def regexp_replace_all(col: str, pattern: str, repl: str, d: str) -> str:
    if d == SPARK:
        return f"regexp_replace({col}, '{esc(pattern, d)}', '{repl}')"
    return f"regexp_replace({col}, '{esc(pattern, d)}', '{repl}', 'g')"


def strip_ws_len(col: str, d: str) -> str:
    """Total non-whitespace character count."""
    return f"length({regexp_replace_all(col, chr(92) + 's+', '', d)})"


def token_len_sum(toks: str, d: str) -> str:
    """Sum of token lengths (== non-ws chars) from an existing token
    array — avoids a second regex pass over the text."""
    if d == SPARK:
        return f"aggregate(transform({toks}, t -> length(t)), 0, (acc, x) -> acc + x)"
    return f"list_sum(list_transform({toks}, t -> length(t)))"


def n_words_sql(col: str, d: str) -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE {arr_len(ws_tokens(col, d), d)} END"
    )


def dbl(e: str, d: str) -> str:
    """Portable cast to double."""
    return f"CAST({e} AS DOUBLE)"


def round6(e: str) -> str:
    """Round doubles before hash comparison (float-order tolerance)."""
    return f"round({e}, 6)"
