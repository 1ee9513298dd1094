"""Fit the IVF codebook once and freeze it to literals.

The production IVF design trains the coarse quantizer (KMeans centroids) on a
sample ONCE, freezes it, and assigns the full corpus against the frozen
codebook — retraining per query would be both slow and nondeterministic.
This script is that offline training step: it runs the exact KMeans
configuration `operators/similarity.ivf_topk` used (k=16, seed=42, maxIter=5,
random init) over the sf0.01 embeddings and writes the centroids to
``workloads/_ivf_centroids.py`` as plain double literals.

Freezing makes the trained-IVF query (`ann_ivf_topk`) fully deterministic and
therefore DuckDB-oracle-checkable: both engines assign vectors to the same
literal centroids with exact-decimal distances.

Usage:  python tools/fit_ivf_centroids.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fit_ivf_centroids")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(
        k=16, seed=42, maxIter=5, initMode="random", featuresCol="features"
    ).fit(emb)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    out = REPO / "autonomus_datapipeline_spark" / "workloads" / "_ivf_centroids.py"
    lines = [
        '"""Frozen IVF codebook (GENERATED — do not edit by hand).',
        "",
        f"Produced by tools/fit_ivf_centroids.py from {sf_dir}/embeddings.parquet",
        "with KMeans(k=16, seed=42, maxIter=5, initMode='random') — the same",
        "configuration operators/similarity.ivf_topk trains online. Frozen so the",
        "trained-IVF query is deterministic and oracle-checkable; at 100 TB this",
        "is the standard design (train coarse quantizer on a sample, freeze,",
        "assign the full corpus).",
        '"""',
        "",
        "IVF_CENTROIDS: list[list[float]] = [",
    ]
    for c in centroids:
        lines.append("    [")
        for i in range(0, len(c), 4):
            lines.append("        " + ", ".join(repr(x) for x in c[i : i + 4]) + ",")
        lines.append("    ],")
    lines.append("]")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(centroids)} centroids × {len(centroids[0])} dims)")
    spark.stop()


if __name__ == "__main__":
    main()
