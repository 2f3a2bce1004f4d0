"""scrub_stats totals vs the closed-form injection schedule of the
synthetic pages corpus (sources/pages.py TEXT_SQL plants one email per
doc_id%5==0, one IPv4 per %7==0, one phone per %11==0, one toxicity
term per %13==0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fineweb_modal_spark.operators import scrub
from fineweb_modal_spark.sources import pages as pages_mod

SF = "/root/testdata/sf0.001"


def _planted(n: int, mod: int) -> int:
    return sum(1 for i in range(n) if i % mod == 0)


def test_scrub_stats_match_injection_schedule(spark):
    p = pages_mod.load_pages(spark, SF, with_html=False).withColumn(
        "host", F.regexp_extract("url", r"https://([^./]+)", 1)
    )
    tot = (
        scrub.scrub_stats(p, by="host")
        .agg(
            F.sum("n_docs").alias("docs"),
            F.sum("n_email").alias("email"),
            F.sum("n_ipv4").alias("ip"),
            F.sum("n_phone").alias("phone"),
            F.sum("n_toxicity").alias("tox"),
            F.sum("n_modified").alias("mod"),
        )
        .collect()[0]
    )
    n = tot["docs"]
    assert n == 500
    assert tot["email"] == _planted(n, 5)
    assert tot["ip"] == _planted(n, 7)
    assert tot["phone"] == _planted(n, 11)
    assert tot["tox"] == _planted(n, 13)
    # modified docs = union of the four residue classes
    assert tot["mod"] == sum(
        1
        for i in range(n)
        if i % 5 == 0 or i % 7 == 0 or i % 11 == 0 or i % 13 == 0
    )
