"""Sandboxed execution of ``def transform(df, spark) -> DataFrame`` steps.

Replicates the reference's exec sandbox semantics (reference:
backend/app/services/sandbox.py:23-71): restricted builtins (no
eval/exec/open/getattr/compile/…), an import whitelist admitting
pyspark.sql[.functions/.types/.window] plus safe stdlib modules, and a
dry-run that exercises the transform on a small real sample before it is
confirmed. Like the reference, this is a guard-rail against accidents, not a
security boundary against a determined adversary (SURVEY.md §7.4) — the
whitelist is the documented contract.

Improvement over the reference: dry-runs use ``df.limit(n)`` of the real
Bronze data instead of rows synthesized from stored sample values
(reference sandbox.py:78-117) — same cost, no fabrication skew.
"""

from __future__ import annotations

import builtins as _builtins
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from autonomus_datapipeline_spark.engine.validation import (
    TransformValidationError,
    validate_transform_code,
)

# Import whitelist (reference sandbox.py:48-56). The engine's own operator
# library is sanctioned transform surface (the reference likewise admits its
# own helpers into generated transforms): read-only DataFrame→DataFrame
# combinators — sinks stay engine-owned and validation still rejects
# write/OS constructs inside the step code.
ALLOWED_IMPORT_PREFIXES = (
    "autonomus_datapipeline_spark.operators",
    "autonomus_datapipeline_spark.functions",
    "autonomus_datapipeline_spark.workloads.curation_pipeline",
    "pyspark.sql",
    "math",
    "datetime",
    "decimal",
    "json",
    "re",
    "collections",
    "functools",
    "itertools",
    "operator",
    "typing",
    "string",
    "hashlib",
    "uuid",
)

_SAFE_BUILTIN_NAMES = [
    "abs", "all", "any", "bool", "dict", "divmod", "enumerate", "filter",
    "float", "format", "frozenset", "int", "isinstance", "issubclass", "len",
    "list", "map", "max", "min", "next", "print", "range", "repr", "reversed",
    "round", "set", "sorted", "str", "sum", "tuple", "type", "zip",
]


def _safe_import(name: str, *args: Any, **kwargs: Any):
    # Match whole dotted-module segments, not raw string prefixes: a bare
    # startswith would let "requests" ride in on the "re" prefix (and
    # "resource", "jsonpickle", "stringprep", ... likewise).
    if not any(name == p or name.startswith(p + ".") for p in ALLOWED_IMPORT_PREFIXES):
        raise ImportError(f"import of {name!r} is not allowed in transforms")
    return _builtins.__import__(name, *args, **kwargs)


def _safe_builtins() -> dict:
    safe = {n: getattr(_builtins, n) for n in _SAFE_BUILTIN_NAMES}
    safe["__import__"] = _safe_import
    return safe


def compile_transform(code: str) -> Callable[[DataFrame, SparkSession], DataFrame]:
    """Validate then exec the code in the sandbox; return the transform fn."""
    validate_transform_code(code)
    env: dict[str, Any] = {"__builtins__": _safe_builtins()}
    exec(compile(code, "<transform>", "exec"), env)  # noqa: S102 — sandboxed by contract
    fn = env.get("transform")
    if not callable(fn):
        raise TransformValidationError("code did not define a callable `transform`")
    return fn


@dataclass
class DryRunResult:
    ok: bool
    rows: list[dict] = field(default_factory=list)
    output_schema: list[dict] = field(default_factory=list)
    error: str | None = None
    elapsed_s: float = 0.0


def dry_run(
    code: str,
    sample_df: DataFrame,
    spark: SparkSession,
    n_rows: int = 10,
) -> DryRunResult:
    """Execute a transform on a small real sample; capture rows + schema.

    Mirrors the reference's dry-run executor (sandbox.py:124-220) but over
    ``sample_df.limit(n_rows)`` instead of synthesized rows.
    """
    t0 = time.time()
    try:
        fn = compile_transform(code)
        out = fn(sample_df.limit(n_rows), spark)
        if not isinstance(out, DataFrame):
            raise TransformValidationError(
                f"transform must return a DataFrame, got {type(out).__name__}"
            )
        rows = [r.asDict(recursive=True) for r in out.limit(n_rows).collect()]
        schema = [
            {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
            for f in out.schema.fields
        ]
        return DryRunResult(True, rows, schema, None, round(time.time() - t0, 3))
    except Exception as exc:  # noqa: BLE001 — dry-run reports, never raises
        return DryRunResult(False, [], [], f"{type(exc).__name__}: {exc}",
                            round(time.time() - t0, 3))
