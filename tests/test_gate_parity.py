"""Every __spark_entry__ gate query vs its DuckDB oracle (the same
comparison the driver runs for CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.compare_oracle import frame_fingerprint

from .conftest import SF_ORACLE

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_gate_query(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) > 0, f"{name}: empty result"
    if name not in _ORACLES:
        pytest.skip(f"{name}: rows-only (no SQL oracle)")
    res = duck.execute(_ORACLES[name])
    orows = res.fetchall()
    ocols = [c[0] for c in res.description]
    assert frame_fingerprint(sdf.columns, srows) == frame_fingerprint(ocols, orows)


def test_registry_counts_match_docs():
    """README/COVERAGE/BASELINE registry counts must track the live
    registry — the count-drift failure mode the round-2 review
    flagged, now machine-checked."""
    n_q, n_o = len(_QUERIES), len(_ORACLES)
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(root, "README.md")).read()
    coverage = open(os.path.join(root, "COVERAGE.md")).read()
    baseline = open(os.path.join(root, "BASELINE.md")).read()
    assert f"{n_o} of {n_q} gate queries" in readme
    assert f"**{n_q} queries, {n_o} oracled — {n_o}/{n_o} hash-green" in coverage
    assert f"**{n_q} queries — {n_o} oracle-checked" in baseline


def test_rotation_self_advances_on_driver_artifacts(tmp_path):
    """The driver validates the FIRST 50 registry entries each round.
    When a new per-round driver artifact (CORRECTNESS_r*.json) lands
    at the repo root, the next import must retire its gate names to
    the registry's tail so the following round's 50-gate budget
    reaches never-validated gates — with no manual bookkeeping."""
    import json

    from fineweb_modal_spark.plans import queries as Q

    before = list(Q.queries().keys())
    front = before[:50]
    # every front gate must carry an oracle (errorless driver artifact)
    oracles = Q.oracles()
    assert all(n in oracles for n in front)
    # simulate the driver writing this round's artifact
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps({"queries": {n: {"hash_match": True} for n in front}})
    )
    seen = Q._driver_seen(root=str(tmp_path))
    assert set(front) <= seen
    # _local full sweeps must NOT retire gates
    (tmp_path / "CORRECTNESS_local_r98.json").write_text(
        json.dumps({"queries": {"only_local_gate": {"hash_match": True}}})
    )
    assert "only_local_gate" not in Q._driver_seen(root=str(tmp_path))
    # a gate the driver ran but FAILED must stay unseen (re-queued at
    # the rotation front until the driver shows it green) — the r4
    # hll_distinct_stream case; rows-only gates retire on a clean
    # rows record
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps({"queries": {
            "failed_gate": {
                "rows_match": True, "schema_match": True,
                "hash_match": False, "spark_rows": 5, "oracle_rows": 5,
                "err": None,
            },
            "errored_gate": {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": None,
                "oracle_rows": None, "err": "spark: boom",
            },
            "rows_only_gate": {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": 500,
                "oracle_rows": None, "err": "no_oracle",
            },
        }})
    )
    seen99 = Q._driver_seen(root=str(tmp_path))
    assert "failed_gate" not in seen99
    assert "errored_gate" not in seen99
    assert "rows_only_gate" in seen99
    # the real repo root: r4's hash-FAIL re-queues at the very front
    assert list(Q.queries().keys())[0] == "hll_distinct_stream"
    # and the live registry (no new artifact in the real root) is stable
    assert list(Q.queries().keys()) == before
