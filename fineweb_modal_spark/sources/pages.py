"""Deterministic Common-Crawl-style `pages` corpus (FIXTURES.md §1).

Derives the canonical input table (url, warc_ts, html, text, lang)
from the driver-generated `documents` table as a PURE FUNCTION of
doc_id — no randomness, no external data — with every property the
pipeline must exercise:

  * language signal: a claimed-lang marker-word prefix so langid has
    real evidence (documents text alone is language-neutral salad);
  * PII spans: deterministic email / IPv4 / phone injections keyed on
    doc_id residues → every scrub rule has positive + negative rows;
  * toxicity terms on doc_id % 13;
  * host skew: doc_id % 3 == 0 all map to host h0 (~1/3 of the corpus
    on one host) to exercise salting (north rule);
  * html: the text wrapped in a fixed tag template, so the extraction
    invariant `extract_text(html) == text` (byte-identical per url,
    BASELINE.json input_hint) is testable.

The derivation is written once as dialect-portable SQL fragments and
rendered for Spark SQL and DuckDB; a pure-Python mirror
(`derive_page_py`) backs the pytest oracles. Reference analog: the
small_sample.ipynb synthetic-sample workflow (validate the idea on
10k rows before scale, README.md:42-43).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

EPOCH = "2024-01-01 00:00:00"

LANG_PREFIX = {
    "fr": "le la des est dans une pour que ",
    "de": "der die das und ist nicht ein eine ",
    "es": "el los las es una por con para ",
    "zh": "的 是 在 了 我 有 ",
    "en": "",
}

_LANG_PREFIX_SQL = (
    "CASE lang"
    + "".join(
        f" WHEN '{k}' THEN '{v}'" for k, v in LANG_PREFIX.items() if k != "en"
    )
    + " ELSE '' END"
)

# language-marker density stays constant as docs grow: repeat the
# prefix once per 150 chars so langid has stable evidence at any length
_PREFIX_REPS_SQL = "(1 + CAST(floor(n_chars / 150.0) AS INT))"

# text with language marker + PII/toxicity injections (dialect-portable)
TEXT_SQL = (
    f"repeat({_LANG_PREFIX_SQL}, {_PREFIX_REPS_SQL}) || text"
    " || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' server 10.' || CAST(doc_id % 256 AS STRING) || '.0.1 up' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' that is frak right' ELSE '' END"
)

URL_SQL = (
    "'https://h' || CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE doc_id % 13 END AS STRING)"
    " || '.example.com/p/' || CAST(doc_id AS STRING)"
)

# warc_ts needs per-dialect interval arithmetic
_TS_SPARK = f"timestampadd(SECOND, doc_id, timestamp'{EPOCH}')"
_TS_DUCKDB = f"TIMESTAMP '{EPOCH}' + INTERVAL (doc_id) SECOND"

HTML_PREFIX = "<html><body><p>"
HTML_SUFFIX = "</p></body></html>"


def pages_select_sql(dialect: str, with_html: bool = True) -> str:
    """SELECT statement deriving pages from `documents` (view must exist)."""
    ts = _TS_SPARK if dialect == "spark" else _TS_DUCKDB
    html_expr = f"encode('{HTML_PREFIX}' || {TEXT_SQL} || '{HTML_SUFFIX}', 'utf-8')" if dialect == "spark" else f"encode('{HTML_PREFIX}' || {TEXT_SQL} || '{HTML_SUFFIX}')"
    cols = [
        f"{URL_SQL} AS url",
        f"{ts} AS warc_ts",
        f"{TEXT_SQL} AS text",
        "lang",
        "doc_id",
    ]
    if with_html:
        cols.insert(2, f"{html_expr} AS html")
    return "SELECT " + ", ".join(cols) + " FROM documents"


def load_pages(spark: SparkSession, sf_dir: str, with_html: bool = True) -> DataFrame:
    """The pages DataFrame at a scale factor (keeps doc_id as join key)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(pages_select_sql("spark", with_html=with_html))


# ---------------------------------------------------------------------------
# Pure-Python mirror for oracles
# ---------------------------------------------------------------------------


def derive_page_py(doc_id: int, text: str, lang: str, n_chars: int | None = None) -> dict:
    if n_chars is None:
        n_chars = len(text)
    reps = 1 + n_chars // 150
    body = LANG_PREFIX.get(lang, "") * reps + text
    if doc_id % 5 == 0:
        body += f" contact user{doc_id}@example.com now"
    if doc_id % 7 == 0:
        body += f" server 10.{doc_id % 256}.0.1 up"
    if doc_id % 11 == 0:
        body += f" call +1 (555) 010-{doc_id % 10000:04d}"
    if doc_id % 13 == 0:
        body += " that is frak right"
    host = 0 if doc_id % 3 == 0 else doc_id % 13
    return {
        "url": f"https://h{host}.example.com/p/{doc_id}",
        "warc_ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=doc_id),
        "html": (HTML_PREFIX + body + HTML_SUFFIX).encode("utf-8"),
        "text": body,
        "lang": lang,
        "doc_id": doc_id,
    }


EXTRACT_TAG_RE = r"<[^>]*>"


def extract_text_py(html: bytes) -> str:
    """Oracle text extraction: strip tags (shared regex with Spark side)."""
    import re

    return re.sub(EXTRACT_TAG_RE, "", html.decode("utf-8"))
