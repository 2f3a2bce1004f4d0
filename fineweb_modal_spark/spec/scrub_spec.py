"""PII + toxicity scrub spec: one ordered regex chain, three engines.

Patterns are written in the common subset of Python `re`, Java
`java.util.regex` (Spark regexp_replace) and RE2 (DuckDB
regexp_replace): no lookaround, no backreferences, inline (?i) only.
Order is load-bearing (emails before phones so phone digits inside
an email aren't re-matched; IPs before phones so dotted quads aren't
eaten as phone numbers) — the chain is applied strictly in sequence
on all three engines.

Per SURVEY.md §7.4 risk 1, this module is the single spec: the Spark
operator folds RULES into nested regexp_replace calls, the DuckDB
oracle renders the same RULES, and scrub_py is the pytest oracle.
Byte-identical output per url is the contract (BASELINE.json
input_hint).
"""

from __future__ import annotations

import re

TOXIC_TERMS = ["frak", "gorram", "smeg", "dreck"]

# (name, pattern, replacement) — applied in order.
RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+?\d[\d()\- ]{6,}\d",
        "<PHONE>",
    ),
    (
        "toxicity",
        r"(?i)\b(" + "|".join(TOXIC_TERMS) + r")\b",
        "<TOX>",
    ),
]

_COMPILED = [(re.compile(p), r) for _, p, r in RULES]


def scrub_py(text: str) -> str:
    """Pure-Python oracle: apply the chain in order."""
    out = text or ""
    for pat, repl in _COMPILED:
        out = pat.sub(repl, out)
    return out
