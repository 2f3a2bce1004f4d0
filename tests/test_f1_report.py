"""Confusion→metrics algebra + the two-predictor F1 report gate
(oracle parity itself is covered by test_gate_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fineweb_modal_spark.operators import quality


def test_metrics_from_confusion_algebra(spark):
    # 6 docs: pred keeps {1,2,3}, judge keeps {2,3,4} → tp=2 fp=1 fn=1 tn=2
    df = spark.createDataFrame(
        [(1, True, False), (2, True, True), (3, True, True),
         (4, False, True), (5, False, False), (6, False, False)],
        "doc_id bigint, pred boolean, lab boolean",
    )
    agg = quality.confusion_counts(df, F.col("pred"), F.col("lab"))
    row = quality.metrics_from_confusion(
        agg.withColumn("predictor", F.lit("x")), ["predictor"]
    ).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (2, 1, 1, 2)
    assert row["accuracy"] == 4 / 6 or abs(row["accuracy"] - 0.666667) < 1e-9
    assert row["precision"] == 2 / 3 or abs(row["precision"] - 0.666667) < 1e-9
    assert abs(row["recall"] - 0.666667) < 1e-9
    # F1 = 2*2 / (2*2 + 1 + 1) = 2/3
    assert abs(row["f1"] - 0.666667) < 1e-9


def test_f1_report_has_one_frozen_row(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = quality.f1_report(docs).collect()
    assert len(rows) == 1 and rows[0]["predictor"] == "frozen_logistic"
    r = rows[0]
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_docs"] == 500


def test_holdout_f1_splits_and_hygiene(spark):
    from fineweb_modal_spark.operators import clftrain

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r["split"]: r for r in clftrain.holdout_f1(docs).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == 500
    # split proportions: train ~90% of the corpus
    assert rows["train"]["n_docs"] > 400
    for r in rows.values():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_docs"]
        assert 0.0 <= r["f1"] <= 1.0
