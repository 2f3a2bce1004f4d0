"""FineWeb-Edu-style centroid scorer: bucket map + centroid training
semantics (the oracle parity itself is covered by test_gate_parity)."""

from __future__ import annotations

from fineweb_modal_spark.operators import similarity

_DIMS = 64


def _vec(first: float, last: float = 0.0) -> list[float]:
    v = [0.0] * _DIMS
    v[0] = first
    v[-1] = last
    return v


def test_edu_bucket_endpoints(spark):
    cent = _vec(1.0)
    emb = spark.createDataFrame(
        [
            (1, _vec(1.0), 1),     # cosine +1 → score 5
            (2, _vec(-1.0), 1),    # cosine -1 → score 0
            (3, _vec(0.0, 1.0), 1),  # orthogonal, cosine 0 → score 3
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = {r["doc_id"]: r for r in similarity.edu_scores(emb, cent).collect()}
    assert out[1]["edu_score"] == 5 and out[1]["keep"]
    assert out[2]["edu_score"] == 0 and not out[2]["keep"]
    # affine map: (0 + 1) * 2.5 + 0.5 = 3.0, floor → 3 (kept at margin)
    assert out[3]["edu_score"] == 3 and out[3]["keep"]


def test_train_centroid_uses_only_seed_label(spark):
    emb = spark.createDataFrame(
        [
            (1, _vec(1.0), 0),
            (2, _vec(0.0, 1.0), 0),
            (3, _vec(-100.0), 7),  # non-seed must not move the centroid
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    cent = similarity.train_edu_centroid(emb, seed_label=0)
    assert len(cent) == _DIMS
    assert cent[0] == 0.5 and cent[-1] == 0.5
    assert all(c == 0.0 for c in cent[1:-1])


def test_train_centroid_raises_without_seeds(spark):
    emb = spark.createDataFrame(
        [(1, _vec(1.0), 3)],
        "vec_id bigint, embedding array<float>, label int",
    )
    try:
        similarity.train_edu_centroid(emb, seed_label=0)
    except ValueError as e:
        assert "seed" in str(e)
    else:
        raise AssertionError("expected ValueError for empty seed set")


def test_ncm_assign_separable_and_tiebreak(spark):
    # two separable classes on orthogonal axes + one ambiguous vector
    # exactly between them (tie → smallest label wins)
    rows = [
        (1, _vec(1.0), 0), (2, _vec(0.9), 0),
        (3, _vec(0.0, 1.0), 1), (4, _vec(0.0, 0.9), 1),
        (5, [0.5] + [0.0] * 62 + [0.5], 9),  # equidistant from 0 and 1
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    cents = similarity.train_class_centroids(emb)
    assert set(cents) == {0, 1, 9} and len(cents[0]) == _DIMS
    out = {r["vec_id"]: r for r in similarity.ncm_assign(emb, cents).collect()}
    assert out[1]["pred_label"] == 0 and out[1]["correct"]
    assert out[3]["pred_label"] == 1 and out[3]["correct"]
    # vec 5 IS class 9's centroid, so it matches itself perfectly
    assert out[5]["pred_label"] == 9 and out[5]["pred_cos"] == 1.0


def test_dims_guard_raises_loudly(spark):
    emb = spark.createDataFrame(
        [(1, [1.0] * 32, 0)], "vec_id bigint, embedding array<float>, label int"
    )
    for fn in (
        lambda: similarity.edu_scores(emb, [0.1] * _DIMS).collect(),
        lambda: similarity.ncm_assign(emb, {0: [0.1] * _DIMS}).collect(),
    ):
        try:
            fn()
        except Exception as e:
            assert "64-dim" in str(e)
        else:
            raise AssertionError("expected dims-guard raise")


def test_edu_bucket_monotone_and_bounded(spark):
    from pyspark.sql import functions as F

    cosines = [round(-1.0 + i * 0.05, 2) for i in range(41)]
    df = spark.createDataFrame([(c,) for c in cosines], "edu_cosine double")
    rows = (
        df.withColumn(
            "s", F.expr(similarity._edu_bucket_sql("edu_cosine"))
        )
        .orderBy("edu_cosine")
        .collect()
    )
    scores = [r["s"] for r in rows]
    assert all(0 <= s <= 5 for s in scores)
    assert scores == sorted(scores)  # monotone in cosine
    assert scores[0] == 0 and scores[-1] == 5


def test_curation_funnel_monotone(spark):
    import fineweb_modal_spark.plans.queries as q

    row = q.queries()["curation_funnel"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    seq = [
        row["n_total"], row["after_holdout"], row["after_quality"],
        row["after_edu"], row["after_dedup"], row["admitted"],
    ]
    assert seq[0] == 500
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    assert row["admitted"] > 0
