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
