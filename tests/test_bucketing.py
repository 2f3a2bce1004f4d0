"""Bucketed tables: co-located joins without a shuffle.

The 100 TB story for repeated joins on the same key (e.g. doc_id ↔
embedding vec_id every pipeline run) is bucketing both tables on the
join key at write time: the join then runs with ZERO exchanges. This
test writes both sides bucketed via saveAsTable and asserts the
Exchange-free plan and correct results. Also exercises the pure-SQL
entry surface (spark.sql over registered views).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from fineweb_modal_spark.sources.tables import load_table, register_views

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_emb")
    (
        docs.write.bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .option("path", str(tmp_path / "b_docs"))  # external: keep the
        .mode("overwrite")                          # repo warehouse clean
        .saveAsTable("b_docs")
    )
    (
        emb.withColumnRenamed("vec_id", "doc_id")
        .write.bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .option("path", str(tmp_path / "b_emb"))
        .mode("overwrite")
        .saveAsTable("b_emb")
    )
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_docs").join(spark.table("b_emb"), "doc_id").select(
            "doc_id", "source", "label"
        )
        plan = _plan(j)
        assert "Exchange" not in plan, plan[:2000]
        want = docs.join(
            emb.withColumnRenamed("vec_id", "doc_id"), "doc_id"
        ).count()
        assert j.count() == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_sql_string_interface(spark):
    """The engine's tables answer plain spark.sql — the SQL surface a
    reference user would reach for first."""
    register_views(spark, SF)
    got = spark.sql(
        """
        SELECT d.source, count(*) AS n, round(avg(e.label), 6) AS avg_label
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.n_chars > 100
        GROUP BY d.source ORDER BY n DESC, d.source LIMIT 5
        """
    ).collect()
    assert got
    docs = load_table(spark, SF, "documents").where("n_chars > 100")
    emb = load_table(spark, SF, "embeddings")
    want = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.round(F.avg("label"), 6).alias("avg_label"))
        .orderBy(F.desc("n"), "source")
        .limit(5)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
