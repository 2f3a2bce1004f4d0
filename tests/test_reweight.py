"""Properties of the reweighting operators (DSIR, DoReMi) and the
NFC scrub beyond the oracle hash gate (tests/test_gate_parity.py
covers value equality; these pin the semantic invariants)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from fineweb_modal_spark.operators import reweight, scrub
from fineweb_modal_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def test_dsir_covers_every_document(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = reweight.with_dsir_weights(docs)
    assert out.count() == docs.count()
    # zero-token docs surface with the identity weight, not NULLs
    assert out.where(F.col("lw_micro").isNull()).count() == 0


def test_dsir_target_mean_weight_dominates(spark):
    """The in-domain proxy subset must score a strictly higher MEAN
    importance weight than the rest of the corpus — the defining
    property of the likelihood-ratio estimator (on any corpus where
    the target's token distribution differs at all)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    w = reweight.with_dsir_weights(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    rates = (
        w.withColumn(
            "is_t",
            (F.col("source") == reweight.DSIR_TARGET_SOURCE).cast("int"),
        )
        .groupBy("is_t")
        .agg((F.sum("lw_micro") / F.sum("tok_count")).alias("per_tok"))
        .collect()
    )
    by = {r["is_t"]: r["per_tok"] for r in rates}
    assert by[1] > by[0]


def test_doremi_weights_form_a_distribution(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    rows = reweight.domain_reweight(docs).collect()
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    total = sum(r["mix_weight"] for r in rows)
    assert abs(total - 1.0) < 1e-4  # rounded-6dp weights
    assert all(r["mix_weight"] > 0 for r in rows)
    # the best (lowest-loss) domain carries the SMALLEST weight:
    # DoReMi upweights domains with excess loss
    best = min(rows, key=lambda r: r["excess_loss"])
    assert best["excess_loss"] == 0.0
    assert best["mix_weight"] == min(r["mix_weight"] for r in rows)


def test_nfc_probe_composes_and_nfkc_forms_survive(spark):
    probe = scrub.NFC_PROBE
    composed = unicodedata.normalize("NFC", probe)
    assert len(probe) - len(composed) == 1  # e + U+0301 -> é
    assert "①" in composed and "ﬁ" in composed  # NFC, not NFKC
    df = spark.createDataFrame(
        [(1, "plain ascii" + probe), (2, None)], "id long, t string"
    )
    out = {
        r["id"]: r["n"]
        for r in scrub.with_nfc(df, "t", "n").collect()
    }
    assert out[1] == "plain ascii" + composed
    assert out[2] is None
