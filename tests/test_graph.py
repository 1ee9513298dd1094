"""Connected-components operator: correctness vs a driver-side union-find
oracle on random graphs, and the O(log n) round bound on adversarial chain
graphs (the shape plain label propagation needs O(n) rounds for)."""

from __future__ import annotations

import math
import random

from autonomus_datapipeline_spark.operators import graph


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min id in component
    return {x: find(x) for x in range(n_nodes)}


def _run_cc(spark, edges, rounds_out=None):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = graph.connected_components(df, rounds_out=rounds_out).collect()
    return {r.node: r.component_id for r in got}


def test_cc_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 200
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(120 + 60 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expected = _union_find_components(n, edges)
        got = _run_cc(spark, edges)
        touched = {a for e in edges for a in e}
        assert got == {x: expected[x] for x in touched}


def test_cc_chain_converges_in_log_rounds(spark):
    # A single chain 0-1-2-...-(n-1): min-label propagation needs ~n rounds;
    # alternating star contraction must stay logarithmic (verdict-r4 item 4).
    n = 1024
    edges = [(i, i + 1) for i in range(n - 1)]
    rounds = []
    got = _run_cc(spark, edges, rounds_out=rounds)
    assert set(got.values()) == {0}
    assert len(got) == n
    assert rounds[0] <= int(math.log2(n)) + 4, rounds


def test_cc_reverse_chain_and_star_shapes(spark):
    # Descending chain (worst case for naive "follow the smaller id" links)
    n = 257
    edges = [(i + 1, i) for i in range(n - 1)]
    rounds = []
    got = _run_cc(spark, edges, rounds_out=rounds)
    assert set(got.values()) == {0}
    assert rounds[0] <= int(math.log2(n)) + 4
    # Pre-formed star centered at the MAX id — must re-center on the min.
    star_edges = [(999, i) for i in range(5)]
    got = _run_cc(spark, star_edges)
    assert set(got.values()) == {0}


def test_cc_multiple_components_and_self_contained(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    got = _run_cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_truncate_lineage_requires_checkpoint_dir(spark):
    import pytest

    from autonomus_datapipeline_spark import tuning

    already = not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()
    if already:
        pytest.skip("session already has a checkpoint dir")
    df = spark.range(4)
    spark.conf.set(tuning.RELIABLE_CHECKPOINT_CONF, "true")
    try:
        with pytest.raises(RuntimeError, match="setCheckpointDir"):
            tuning.truncate_lineage(df)
    finally:
        spark.conf.unset(tuning.RELIABLE_CHECKPOINT_CONF)


def test_cc_reliable_checkpoint_identical(spark, tmp_path):
    """spark.graft.reliableCheckpoint=true switches every lineage cut in the
    star loop from localCheckpoint to a reliable (dir-backed) checkpoint —
    the executor-loss-safe production mode (r10 verdict item 2). Components
    must be identical to the default run, and the checkpoint dir must
    actually receive RDD checkpoint data."""
    import os

    from autonomus_datapipeline_spark import tuning

    rng = random.Random(23)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    baseline = _run_cc(spark, edges)

    ckpt_dir = str(tmp_path / "reliable_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    spark.conf.set(tuning.RELIABLE_CHECKPOINT_CONF, "true")
    try:
        reliable = _run_cc(spark, edges)
    finally:
        spark.conf.unset(tuning.RELIABLE_CHECKPOINT_CONF)
    assert reliable == baseline
    # the reliable run must have materialized checkpoint data on disk
    written = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(ckpt_dir)
        for f in fn
    ]
    assert written, "no reliable checkpoint files were written"
