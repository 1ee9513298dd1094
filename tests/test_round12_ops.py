"""Round-12 operators: ALS rank-2 implicit factorization.

Cross-engine value equality is proven by the oracle gate
(tools/check_oracles.py); these tests pin the MATH against an independent
numpy implementation of the closed-form ALS half-step, plus the
regularization guarantee the factors must satisfy.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def als_inputs():
    """(user, item, rating, k1, k2) rows straight from the parquet via
    DuckDB — an independent data path from the Spark query under test."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH r AS (
            SELECT o.o_custkey AS u, l.l_partkey AS i,
                   CAST(COUNT(*) AS BIGINT) AS r
            FROM read_parquet('{SF}/lineitem.parquet') l
            JOIN read_parquet('{SF}/orders.parquet') o
              ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        )
        SELECT u, i, r,
               CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 2))
                    AS BIGINT) - 128 AS k1,
               CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 3, 2))
                    AS BIGINT) - 128 AS k2
        FROM r
        """
    ).fetchall()
    return rows


def _numpy_factors(rows):
    """Closed-form regularized 2x2 solve per user, mirroring the operator's
    integer normal equations but through numpy's solver."""
    by_u: dict[int, list] = {}
    for u, i, r, k1, k2 in rows:
        by_u.setdefault(u, []).append((r, k1, k2))
    out = {}
    for u, items in by_u.items():
        a = np.zeros((2, 2))
        b = np.zeros(2)
        for r, k1, k2 in items:
            vk = np.array([k1 / 128.0, k2 / 128.0])
            a += np.outer(vk, vk)
            b += r * vk
        a += 0.25 * np.eye(2)
        out[u] = np.linalg.solve(a, b)
    return out


def test_als_spark_factors_match_numpy_solve(spark, als_inputs):
    """The Spark-side u1n/u2n must equal the numpy closed-form solution
    to within one 1e-6 quantum (the operator floor-quantizes; numpy's
    solve orders its flops differently, so allow the single-ulp seam)."""
    from autonomus_datapipeline_spark.workloads import model_ops

    # Rebuild the operator's internal uf stage on the real tables.
    import pyspark.sql.functions as F

    from autonomus_datapipeline_spark.workloads.registry import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    ratings = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    k = lambda pos: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.col("i").cast("string")), pos, 2), 16, 10
        ).cast("bigint")
        - 128
    )
    v = ratings.select("u", "r", k(1).alias("k1"), k(3).alias("k2"))
    nrm = v.groupBy("u").agg(
        (F.sum(F.col("k1") * F.col("k1")) + F.lit(model_ops._ALS_LAM_NUM))
        .cast("bigint").alias("a11"),
        F.sum(F.col("k1") * F.col("k2")).cast("bigint").alias("a12"),
        (F.sum(F.col("k2") * F.col("k2")) + F.lit(model_ops._ALS_LAM_NUM))
        .cast("bigint").alias("a22"),
        F.sum(F.col("r") * F.col("k1")).cast("bigint").alias("b1"),
        F.sum(F.col("r") * F.col("k2")).cast("bigint").alias("b2"),
    )
    a11d, a12d, a22d = (
        F.col("a11").cast("double"),
        F.col("a12").cast("double"),
        F.col("a22").cast("double"),
    )
    b1d, b2d = F.col("b1").cast("double"), F.col("b2").cast("double")
    det = a11d * a22d - a12d * a12d
    uf = {
        row.u: (row.u1n, row.u2n)
        for row in nrm.select(
            "u",
            F.floor(F.lit(128.0) * (b1d * a22d - b2d * a12d) / det * 1e6)
            .cast("bigint").alias("u1n"),
            F.floor(F.lit(128.0) * (b2d * a11d - b1d * a12d) / det * 1e6)
            .cast("bigint").alias("u2n"),
        ).collect()
    }

    expect = _numpy_factors(als_inputs)
    assert set(uf) == set(expect)
    for u, (u1n, u2n) in uf.items():
        e1, e2 = expect[u]
        assert abs(u1n - math.floor(e1 * 1e6)) <= 1, (u, u1n, e1)
        assert abs(u2n - math.floor(e2 * 1e6)) <= 1, (u, u2n, e2)


def test_als_mse_beats_zero_factor_baseline(spark, als_inputs):
    """Regularized LS guarantee: the solved factors' objective is <= the
    zero-vector's, so sum(err^2) <= sum(r^2) per user and hence per
    segment: mse < mean(r^2). This pins that the solve actually fits."""
    from autonomus_datapipeline_spark.workloads.model_ops import (
        als_rank2_implicit,
    )

    res = {r.segment: r for r in als_rank2_implicit(spark, SF).collect()}
    assert len(res) == 5
    con = duckdb.connect()
    base = dict(
        con.execute(
            f"""
            WITH r AS (
                SELECT o.o_custkey AS u, l.l_partkey AS i,
                       CAST(COUNT(*) AS BIGINT) AS r
                FROM read_parquet('{SF}/lineitem.parquet') l
                JOIN read_parquet('{SF}/orders.parquet') o
                  ON o.o_orderkey = l.l_orderkey
                GROUP BY 1, 2
            )
            SELECT c.c_mktsegment, AVG(CAST(r.r * r.r AS DOUBLE))
            FROM r JOIN read_parquet('{SF}/customer.parquet') c
              ON c.c_custkey = r.u
            GROUP BY 1
            """
        ).fetchall()
    )
    for seg, row in res.items():
        assert 0 < row.mse < base[seg], (seg, row.mse, base[seg])
        assert row.n_ratings > 0 and row.n_users > 0
