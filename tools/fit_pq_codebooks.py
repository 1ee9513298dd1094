"""Fit the product-quantization codebooks once and freeze them to literals.

Product quantization (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011) compresses each D-dim vector into M small
codes by splitting it into M subvectors and vector-quantizing each
subspace independently against its own K-centroid codebook — a 32×
memory reduction at D=64/M=8/K=16 that lets a 100 TB embedding corpus
keep its searchable representation in a fraction of the space, with
distances computed code-domain via per-query lookup tables (ADC).

Like the IVF coarse quantizer (tools/fit_ivf_centroids.py), the
codebooks are trained OFFLINE on a sample, frozen, and shipped as
literals in ``workloads/_pq_codebooks.py`` — training inside the query
path would be both a scale-killer and unverifiable. Freezing makes the
PQ query fully deterministic and DuckDB-oracle-checkable: both engines
assign subvectors to the same literal centroids with exact-decimal
distances.

Usage:  python tools/fit_pq_codebooks.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

M_SUBSPACES = 8
K_CENTROIDS = 16
DIM = 64
DSUB = DIM // M_SUBSPACES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fit_pq_codebooks")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books: list[list[list[float]]] = []
    for m in range(M_SUBSPACES):
        sub = emb.select(
            array_to_vector(
                F.slice(F.col("embedding"), m * DSUB + 1, DSUB)
            ).alias("features")
        )
        model = KMeans(
            k=K_CENTROIDS,
            seed=42 + m,
            maxIter=5,
            initMode="random",
            featuresCol="features",
        ).fit(sub)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])

    out = REPO / "autonomus_datapipeline_spark" / "workloads" / "_pq_codebooks.py"
    lines = [
        '"""Frozen product-quantization codebooks (GENERATED — do not edit',
        "by hand).",
        "",
        f"Produced by tools/fit_pq_codebooks.py from {sf_dir}/embeddings.parquet:",
        f"per-subspace KMeans (M={M_SUBSPACES} subspaces of {DSUB} dims,",
        f"K={K_CENTROIDS} centroids each, seed=42+m, maxIter=5, random init).",
        "Frozen so PQ encoding and ADC search are deterministic and",
        "oracle-checkable; at 100 TB this is the standard design (train on a",
        'sample, freeze, encode the full corpus)."""',
        "",
        f"PQ_M = {M_SUBSPACES}",
        f"PQ_K = {K_CENTROIDS}",
        f"PQ_DSUB = {DSUB}",
        "",
        "# PQ_CODEBOOKS[m][cell][p]: component p of centroid `cell` of",
        "# subspace m (subspace m covers dims m*PQ_DSUB .. (m+1)*PQ_DSUB-1).",
        "PQ_CODEBOOKS: list[list[list[float]]] = [",
    ]
    for m, book in enumerate(books):
        lines.append(f"    [  # subspace {m}")
        for c in book:
            body = ", ".join(repr(x) for x in c)
            lines.append(f"        [{body}],")
        lines.append("    ],")
    lines.append("]")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({M_SUBSPACES} books x {K_CENTROIDS} centroids)")
    spark.stop()


if __name__ == "__main__":
    main()
