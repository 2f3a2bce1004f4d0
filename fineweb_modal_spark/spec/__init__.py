"""Single-source-of-truth specs shared by Spark operators and oracles.

Nothing in this package imports pyspark. The Spark side (operators/)
and the pure-Python oracle side (tests/) both import these modules, so
any behavioral divergence is impossible by construction — the pattern
the reference validated by hand in notebooks/validate.ipynb (cells
54-59, reimplementing mean-pooling as an independent oracle).
"""
