"""Data-quality rule engine.

The reference declared this capability without code: a
``data_quality_results`` table (rule_name / rule_config / passed /
failure_samples — reference: db/init.sql:256-270; SURVEY.md §1.4). This is
the Spark-first implementation:

- rule kinds: not_null, unique, in_range, matches_regex, accepted_values,
  freshness (max age of a timestamp column)
- ALL rules are evaluated in ONE aggregation pass over the data (each rule
  compiles to a conditional-count expression) — at 100 TB you cannot afford
  a job per rule; uniqueness is the one exception (it needs its own groupBy)
- per-rule failure counts + up to N sample failing rows
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class DQRule:
    name: str
    kind: str
    column: str
    config: dict[str, Any] = field(default_factory=dict)


@dataclass
class DQResult:
    rule: DQRule
    passed: bool
    failure_count: int
    total_count: int
    failure_samples: list[dict] = field(default_factory=list)


def _violation_predicate(rule: DQRule, now: _dt.datetime | None) -> Column:
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.config.get("min"), rule.config.get("max")
        pred = F.lit(False)
        if lo is not None:
            pred = pred | (c < lo)
        if hi is not None:
            pred = pred | (c > hi)
        return pred | c.isNull()
    if rule.kind == "matches_regex":
        return ~c.rlike(rule.config["pattern"]) | c.isNull()
    if rule.kind == "accepted_values":
        return ~c.isin(*rule.config["values"]) | c.isNull()
    if rule.kind == "freshness":
        max_age_s = rule.config["max_age_seconds"]
        ref = F.lit((now or _dt.datetime.now(tz=_dt.timezone.utc)).replace(tzinfo=None))
        return (F.unix_timestamp(ref) - F.unix_timestamp(c) > max_age_s) | c.isNull()
    raise ValueError(f"unknown rule kind {rule.kind!r}")


def evaluate_rules(
    df: DataFrame,
    rules: list[DQRule],
    sample_failures: int = 5,
    now: _dt.datetime | None = None,
) -> list[DQResult]:
    """Evaluate all rules; single aggregation job for row-level rules plus
    one groupBy per uniqueness rule and one bounded sample collect per
    failing rule."""
    row_rules = [r for r in rules if r.kind != "unique"]
    uniq_rules = [r for r in rules if r.kind == "unique"]

    aggs = [F.count(F.lit(1)).alias("__total")]
    preds: dict[str, Column] = {}
    for i, r in enumerate(row_rules):
        pred = _violation_predicate(r, now)
        preds[r.name] = pred
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"__viol_{i}"))
    counts = df.agg(*aggs).collect()[0] if row_rules else None
    total = int(counts["__total"]) if counts is not None else df.count()

    results: list[DQResult] = []
    for i, r in enumerate(row_rules):
        n_fail = int(counts[f"__viol_{i}"])
        samples = []
        if n_fail and sample_failures:
            samples = [
                row.asDict(recursive=True)
                for row in df.filter(preds[r.name]).limit(sample_failures).collect()
            ]
        results.append(DQResult(r, n_fail == 0, n_fail, total, samples))

    for r in uniq_rules:
        dupes = (
            df.groupBy(r.column)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
        sample_rows = dupes.limit(sample_failures).collect()
        n_dupe_keys = dupes.count()
        results.append(
            DQResult(
                r,
                n_dupe_keys == 0,
                n_dupe_keys,
                total,
                [row.asDict() for row in sample_rows],
            )
        )
    return results
