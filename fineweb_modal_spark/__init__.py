"""fineweb_modal_spark — a PySpark-native web-corpus quality-filter engine.

A from-scratch reimplementation of the *capabilities* of
enjalot/fineweb-modal (surveyed in SURVEY.md) as an idiomatic Spark
DataFrame pipeline: langid → quality-score → PII/toxicity-scrub over
partitioned tables of Common-Crawl-style pages, plus the reference's
operator surface (chunker UDTF, per-feature top-k, summary aggs,
equi-join-backs) and the large-scale training-data toolbox (dedup
family, ANN similarity, text stats, multimodal plumbing).

Layout:
  spec/       — pure-Python single-source-of-truth specs (tokenizer,
                langid model, quality rules, scrub regexes). Imported
                by BOTH the Spark operators and the test oracles, so
                Spark-vs-oracle agreement is by construction.
  sources/    — table IO: parquet-dir tables, synthesized `pages`
                corpus, partitioned/salted writer with manifest resume.
  operators/  — one module per operator family (SURVEY.md §2).
  plans/      — end-to-end DAGs (the langid→quality→scrub pipeline).
  streaming/  — incremental Structured Streaming variants.
"""

__version__ = "0.1.0"
