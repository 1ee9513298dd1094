"""Every registered query vs its DuckDB oracle at sf0.001 — the same
comparison the driver's correctness gate performs (columns sorted by name,
order-insensitive rows, exact value match)."""

from __future__ import annotations

import math

import duckdb
import pytest

from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY, TABLES

from tests.conftest import SF_DIR


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


@pytest.mark.parametrize("name", sorted(QUERY_REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = QUERY_REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only contract: it runs
        return
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), "column names must match oracle"
    assert _rowset(sdf.columns, srows) == _rowset(dcols, drows)
