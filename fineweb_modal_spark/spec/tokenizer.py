"""Deterministic hermetic tokenizer + chunker windowing spec.

The reference tokenizes with HF bert-base-uncased (chunker.py:76) —
not available offline, so the engine's hermetic tokenizer is plain
whitespace splitting (FIXTURES.md §3). Window semantics reproduce
/root/reference/chunker.py:69-105 exactly, including the documented
tail-chunk bug (README.md:21; validate.ipynb cell 14): a trailing
window shorter than OVERLAP tokens is dropped, one >= OVERLAP but
<= OVERLAP-long pure-overlap tail IS emitted.
"""

from __future__ import annotations

import re

MAX_TOKENS = 500
OVERLAP_FRAC = 0.1
OVERLAP = int(MAX_TOKENS * OVERLAP_FRAC)  # 50
STRIDE = MAX_TOKENS - OVERLAP  # 450
MIN_CHUNK_TOKENS = 50  # the namesake filter, reference filter.py:50

# ASCII-pinned whitespace — one definition across Python spec, Spark
# and DuckDB renderings (see gopher_rules.WS_EDGE_CHARS rationale)
WS_EDGE_CHARS = " \t\n\x0b\f\r"
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def tokenize(text: str) -> list[str]:
    """Whitespace tokens; empty/blank text → []."""
    if not text:
        return []
    t = text.strip(WS_EDGE_CHARS)
    if not t:
        return []
    return _WS.split(t)


def detokenize(tokens: list[str]) -> str:
    return " ".join(tokens)


# Hermetic int-ID mode: the reference emits chunk_tokens as HF
# input_ids (array<long>, chunker.py:90, bert-base-uncased). Offline
# stand-in: 60-bit md5 of the token modulo the bert vocab size —
# deterministic, collision-shaped like a real vocab, and re-derivable
# in SQL via spec/hashing.md5_i64 so oracles can cross-check.
VOCAB_SIZE = 30522  # bert-base-uncased vocab size


def token_id(token: str) -> int:
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % VOCAB_SIZE


def token_ids(tokens: list[str]) -> list[int]:
    return [token_id(t) for t in tokens]


def chunk_tokens(n_tokens: int) -> list[tuple[int, int]]:
    """Return [(start, end)) windows per the reference semantics.

    Mirrors chunker.py:77-95: if n <= MAX_TOKENS → one [0, n) window
    (the reference passes the *original text* through in that case);
    else stride-450 windows of <=500 tokens, dropping a tail shorter
    than OVERLAP (chunker.py:85-86 `if len(chunk) < overlap: break`).
    """
    if n_tokens <= MAX_TOKENS:
        return [(0, n_tokens)]
    spans: list[tuple[int, int]] = []
    start = 0
    while start < n_tokens:
        end = min(start + MAX_TOKENS, n_tokens)
        if end - start < OVERLAP:
            break
        spans.append((start, end))
        start += STRIDE
    return spans


def chunk_text(text: str) -> list[dict]:
    """Pure-Python chunker oracle: list of chunk dicts per document.

    chunk_text of a short doc is the ORIGINAL text (not re-joined
    tokens), matching chunker.py:97-103 passing `text` through.
    """
    tokens = tokenize(text)
    n = len(tokens)
    out = []
    if n <= MAX_TOKENS:
        out.append(
            {
                "chunk_index": 0,
                "chunk_text": text,
                "chunk_tokens": tokens,
                "chunk_token_count": n,
            }
        )
        return out
    for ci, (s, e) in enumerate(chunk_tokens(n)):
        window = tokens[s:e]
        out.append(
            {
                "chunk_index": ci,
                "chunk_text": detokenize(window),
                "chunk_tokens": window,
                "chunk_token_count": e - s,
            }
        )
    return out
