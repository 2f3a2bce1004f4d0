"""Table IO: parquet-dir tables, synthesized pages corpus, writers."""
