"""Gopher/FineWeb repetition & structure quality rules — spec.

The first quality.py family covers token-statistics rules (length,
stopwords, digits). This module adds the OTHER half of the standard
web-text filtering battery (Gopher §A.2.1 / FineWeb quality filters):
line-structure signals (bullet/ellipsis/duplicate lines) and
repetition signals (top-bigram fraction), plus an alphabetic-word
ratio and a symbol ratio.

Same anti-drift contract as quality_rules.py: every signal is
expressible per-row in BOTH Spark SQL and DuckDB without UDFs
(operators/gopher.py renders both dialects from shared fragments);
this file is the pure-Python oracle for pytest.

Spec choices (documented divergences from the papers' exact forms):
* top_bigram_frac is the fraction of word-bigrams equal to the most
  frequent bigram (run-length over the sorted bigram array) — the
  papers weight by characters; the fraction form is
  dialect-portable with identical filtering behavior.
* lines are NON-BLANK trimmed lines; blank-only docs have 0 lines
  and all line ratios 0.
"""

from __future__ import annotations

import re

# thresholds (first failing rule wins, in DROP_REASONS order)
MIN_ALPHA_WORD_RATIO = 0.60
MAX_BULLET_LINE_RATIO = 0.90
MAX_ELLIPSIS_LINE_RATIO = 0.30
MAX_DUP_LINE_RATIO = 0.30
MAX_TOP_BIGRAM_FRAC = 0.20
MAX_SYMBOL_WORD_RATIO = 0.10
MAX_BOILERPLATE_LINE_RATIO = 0.50

BULLET_PREFIXES = ("-", "*", "•")
ELLIPSIS_SUFFIXES = ("...", "…")
# terminal punctuation (C4 line rule): exposed as a SIGNAL
# (punct_line_ratio) for downstream thresholds, not a drop rule —
# corpus-appropriate cutoffs vary too much to hardcode
PUNCT_SUFFIXES = (".", "!", "?", '"')
# nav/legal boilerplate markers; a line is boilerplate if it contains
# one (case-insensitive) or has <= BOILERPLATE_MAX_WORDS words
BOILERPLATE_MARKERS = (
    "all rights reserved",
    "cookie",
    "subscribe",
    "terms of service",
    "privacy policy",
)
BOILERPLATE_MAX_WORDS = 3

DROP_REASONS = [
    "low_alpha_word_ratio",
    "high_bullet_line_ratio",
    "high_ellipsis_line_ratio",
    "high_dup_line_ratio",
    "high_top_bigram_frac",
    "high_symbol_word_ratio",
    "high_boilerplate_line_ratio",
]

# Whitespace pinned to an EXPLICIT ASCII class — NOT \s / str.strip(),
# whose Unicode awareness (U+00A0, U+2028, ...) would make this Python
# spec diverge from both SQL renderings, which are pinned to the same
# ASCII set. One definition of "whitespace" across all three engines.
WS_EDGE_CHARS = " \t\n\x0b\f\r"
_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_ALPHA = re.compile(r"[A-Za-z]")

# Line-edge whitespace class (no \n: lines are the split product), same
# ASCII pin so the Python spec, Spark (java regex) and DuckDB (RE2)
# renderings strip identically — the CRLF '\r' edge is the case real
# crawls hit.
LINE_STRIP_CHARS = " \t\f\r\x0b"


def _tokens(text: str) -> list[str]:
    t = (text or "").strip(WS_EDGE_CHARS)
    return _WS.split(t) if t else []


def _lines(text: str) -> list[str]:
    return [
        ln.strip(LINE_STRIP_CHARS)
        for ln in (text or "").split("\n")
        if ln.strip(LINE_STRIP_CHARS)
    ]


def _top_bigram_frac(tokens: list[str]) -> float:
    if len(tokens) < 2:
        return 0.0
    bigrams = sorted(
        f"{a} {b}" for a, b in zip(tokens, tokens[1:])
    )
    best = run = 1
    for i in range(1, len(bigrams)):
        run = run + 1 if bigrams[i] == bigrams[i - 1] else 1
        best = max(best, run)
    return best / len(bigrams)


def gopher_signals_py(text: str) -> dict:
    """Pure-Python oracle of the repetition/structure signals."""
    text = text or ""
    toks = _tokens(text)
    lines = _lines(text)
    n_words, n_lines = len(toks), len(lines)
    alpha = sum(1 for t in toks if _ALPHA.search(t))
    bullets = sum(1 for ln in lines if ln.startswith(BULLET_PREFIXES))
    ellipses = sum(1 for ln in lines if ln.endswith(ELLIPSIS_SUFFIXES))
    n_symbols = (
        text.count("#") + text.count("…") + text.count("...")
    )
    puncts = sum(1 for ln in lines if ln.endswith(PUNCT_SUFFIXES))
    boiler = sum(
        1
        for ln in lines
        if len(_tokens(ln)) <= BOILERPLATE_MAX_WORDS
        or any(m in ln.lower() for m in BOILERPLATE_MARKERS)
    )
    return {
        "n_lines": n_lines,
        "alpha_word_ratio": alpha / n_words if n_words else 0.0,
        "bullet_line_ratio": bullets / n_lines if n_lines else 0.0,
        "ellipsis_line_ratio": ellipses / n_lines if n_lines else 0.0,
        "dup_line_ratio": (
            1.0 - len(set(lines)) / n_lines if n_lines else 0.0
        ),
        "top_bigram_frac": _top_bigram_frac(toks),
        "symbol_word_ratio": n_symbols / n_words if n_words else 0.0,
        "punct_line_ratio": puncts / n_lines if n_lines else 0.0,
        "boilerplate_line_ratio": boiler / n_lines if n_lines else 0.0,
    }


def gopher_keep_py(text: str) -> tuple[bool, str | None]:
    s = gopher_signals_py(text)
    if s["alpha_word_ratio"] < MIN_ALPHA_WORD_RATIO:
        return False, "low_alpha_word_ratio"
    if s["bullet_line_ratio"] > MAX_BULLET_LINE_RATIO:
        return False, "high_bullet_line_ratio"
    if s["ellipsis_line_ratio"] > MAX_ELLIPSIS_LINE_RATIO:
        return False, "high_ellipsis_line_ratio"
    if s["dup_line_ratio"] > MAX_DUP_LINE_RATIO:
        return False, "high_dup_line_ratio"
    if s["top_bigram_frac"] > MAX_TOP_BIGRAM_FRAC:
        return False, "high_top_bigram_frac"
    if s["symbol_word_ratio"] > MAX_SYMBOL_WORD_RATIO:
        return False, "high_symbol_word_ratio"
    if s["boilerplate_line_ratio"] > MAX_BOILERPLATE_LINE_RATIO:
        return False, "high_boilerplate_line_ratio"
    return True, None
