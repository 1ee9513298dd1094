"""Reusable column functions for the case-study transform shapes
(reference: benchmarks/results/auto_pipeline_benchmark_paper.tex, C2-C4).

Pure Column-in/Column-out builders — they compose into any transform chain
step and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_delay_seconds(actual: Column, scheduled: Column) -> Column:
    """delay = actual − scheduled in seconds (reference tex:128-133:
    F.unix_timestamp arithmetic)."""
    return F.unix_timestamp(actual) - F.unix_timestamp(scheduled)


def category_bucket(value: Column, edges: list[float], labels: list[str]) -> Column:
    """Chained-when bucketing (reference tex:128: On Time/Minor/Moderate/
    Severe). len(labels) == len(edges) + 1; edges are upper bounds."""
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    expr = F.when(value <= edges[0], labels[0])
    for i in range(1, len(edges)):
        expr = expr.when(value <= edges[i], labels[i])
    return expr.otherwise(labels[-1])


def fahrenheit_to_celsius(value: Column) -> Column:
    """(F − 32) × 5/9 (reference tex:156-158)."""
    return (value - 32) * 5.0 / 9.0
