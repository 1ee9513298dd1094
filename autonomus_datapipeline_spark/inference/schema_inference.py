"""Heuristic schema inference with confidence scoring.

Re-implements the reference's sample-based type-voting semantics as pure
functions (reference: backend/app/services/schema_detection.py):

- threshold voting on string samples: boolean tokens ≥95%, int (with comma
  separators) ≥95%, float ≥95%, datetime regexes ≥80%, date regexes ≥80%,
  else string (reference schema_detection.py:199-260)
- per-field stats: null_count, unique_count, min/max, ≤5 sample values
  (reference schema_detection.py:263-322)
- multi-file compatibility via sorted-column-name signatures with
  missing/extra reporting (reference schema_detection.py:527-579)
- overall confidence = mean field confidence × 0.7 + compatible-file ratio
  × 0.3 (reference schema_detection.py:584-587)
- user overrides at confirm time: rename / retype / nullable flip / exclude
  (reference backend/app/schemas/schema.py:57-73, routers/schemas.py:299-318)

The inference core runs on a driver-side sample (like the reference's
pandas sample of ≤1000 rows) — sampling 1000 rows is O(1) regardless of
table size, so this holds at 100 TB; the *applied* schema then drives a
fully distributed read.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace
from typing import Any, Sequence

from pyspark.sql import types as T

# Reference thresholds (schema_detection.py:199-260)
NUMERIC_THRESHOLD = 0.95
DATETIME_THRESHOLD = 0.80

BOOLEAN_TOKENS = {"true", "false", "yes", "no", "1", "0", "t", "f", "y", "n"}

DATE_PATTERNS = [
    re.compile(r"^\d{4}-\d{2}-\d{2}$"),          # ISO
    re.compile(r"^\d{2}/\d{2}/\d{4}$"),          # US
    re.compile(r"^\d{2}-\d{2}-\d{4}$"),          # EU
]
DATETIME_PATTERNS = [
    re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?$"),
    re.compile(r"^\d{2}/\d{2}/\d{4} \d{2}:\d{2}(:\d{2})?$"),
]

SPARK_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}


@dataclass
class FieldSchema:
    """Per-field inference output (reference backend/app/schemas/schema.py:14-25)."""

    name: str
    detected_type: str
    nullable: bool = True
    confidence: float = 1.0
    sample_values: list[Any] = field(default_factory=list)
    unique_count: int = 0
    null_count: int = 0
    total_count: int = 0
    min_value: Any = None
    max_value: Any = None


@dataclass
class SchemaOverride:
    """User override applied at confirm time."""

    name: str
    new_name: str | None = None
    new_type: str | None = None
    nullable: bool | None = None
    exclude: bool = False


@dataclass
class InferenceResult:
    fields: list[FieldSchema]
    confidence: float
    compatible_files: list[str]
    incompatible_files: list[dict]
    sample_row_count: int


def _is_int(s: str) -> bool:
    # Comma thousands separators parse as int (reference schema_detection.py:221)
    s = s.strip().replace(",", "")
    if not s:
        return False
    try:
        int(s)
        return True
    except ValueError:
        return False


def _is_float(s: str) -> bool:
    s = s.strip().replace(",", "")
    if not s:
        return False
    try:
        float(s)
        return not (s.lower() in {"nan", "inf", "-inf", "infinity", "-infinity"})
    except ValueError:
        return False


def _matches_any(s: str, patterns: list[re.Pattern]) -> bool:
    return any(p.match(s.strip()) for p in patterns)


def infer_string_type(values: Sequence[str]) -> tuple[str, float]:
    """Threshold voting over non-null string samples → (type, confidence).

    Vote order mirrors the reference (schema_detection.py:199-260):
    boolean → integer → float → datetime → date → string.
    """
    vals = [v for v in values if v is not None and str(v).strip() != ""]
    if not vals:
        return "string", 0.5  # all-null column (reference :204-206)
    n = len(vals)
    checks: list[tuple[str, float, float]] = []
    bool_ratio = sum(str(v).strip().lower() in BOOLEAN_TOKENS for v in vals) / n
    checks.append(("boolean", bool_ratio, NUMERIC_THRESHOLD))
    int_ratio = sum(_is_int(str(v)) for v in vals) / n
    checks.append(("integer", int_ratio, NUMERIC_THRESHOLD))
    float_ratio = sum(_is_float(str(v)) for v in vals) / n
    checks.append(("float", float_ratio, NUMERIC_THRESHOLD))
    dt_ratio = sum(_matches_any(str(v), DATETIME_PATTERNS) for v in vals) / n
    checks.append(("timestamp", dt_ratio, DATETIME_THRESHOLD))
    date_ratio = sum(_matches_any(str(v), DATE_PATTERNS) for v in vals) / n
    checks.append(("date", date_ratio, DATETIME_THRESHOLD))
    for typ, ratio, threshold in checks:
        # boolean voting must not swallow pure 0/1 integer columns unless the
        # column also contains non-numeric boolean tokens — the reference
        # orders boolean first; we keep that quirk for parity.
        if ratio >= threshold:
            return typ, ratio
    return "string", 1.0 - max(c[1] for c in checks) * 0.2


def infer_field(name: str, values: Sequence[Any]) -> FieldSchema:
    """Infer one field from raw sample values + compute field statistics."""
    total = len(values)
    non_null = [v for v in values if v is not None]
    null_count = total - len(non_null)

    if non_null and all(isinstance(v, bool) for v in non_null):
        typ, conf = "boolean", 1.0
    elif non_null and all(isinstance(v, int) and not isinstance(v, bool) for v in non_null):
        typ = "long" if any(abs(v) > 2**31 - 1 for v in non_null) else "integer"
        conf = 1.0
    elif non_null and all(
        isinstance(v, (int, float)) and not isinstance(v, bool) for v in non_null
    ):
        typ, conf = "double", 1.0
    elif non_null and any(isinstance(v, (list, dict)) for v in non_null):
        # complex values downgrade to string, confidence 0.8
        # (reference schema_detection.py:281-285)
        typ, conf = "string", 0.8
    else:
        typ, conf = infer_string_type([None if v is None else str(v) for v in values])

    uniq = len({str(v) for v in non_null})
    numeric = [v for v in non_null if isinstance(v, (int, float)) and not isinstance(v, bool)]
    return FieldSchema(
        name=name,
        detected_type=typ,
        nullable=null_count > 0,
        confidence=round(conf, 4),
        sample_values=non_null[:5],
        unique_count=uniq,
        null_count=null_count,
        total_count=total,
        min_value=min(numeric) if numeric else None,
        max_value=max(numeric) if numeric else None,
    )


def infer_dataframe_schema(rows: list[dict], columns: list[str]) -> list[FieldSchema]:
    """Infer all fields from a sample of row dicts (≤1000 rows by contract)."""
    return [infer_field(c, [r.get(c) for r in rows]) for c in columns]


def validate_multi_file(
    file_columns: dict[str, list[str]], reference_file: str
) -> tuple[list[str], list[dict]]:
    """Sorted-column-signature compatibility check across files
    (reference schema_detection.py:527-579)."""
    ref_sig = sorted(file_columns[reference_file])
    compatible, incompatible = [], []
    for f, cols in file_columns.items():
        if sorted(cols) == ref_sig:
            compatible.append(f)
        else:
            incompatible.append(
                {
                    "file": f,
                    "missing_columns": sorted(set(ref_sig) - set(cols)),
                    "extra_columns": sorted(set(cols) - set(ref_sig)),
                }
            )
    return compatible, incompatible


def overall_confidence(fields: list[FieldSchema], n_compatible: int, n_files: int) -> float:
    """mean field confidence × 0.7 + compatible ratio × 0.3
    (reference schema_detection.py:584-587)."""
    if not fields:
        return 0.0
    mean_conf = sum(f.confidence for f in fields) / len(fields)
    ratio = n_compatible / n_files if n_files else 1.0
    return round(mean_conf * 0.7 + ratio * 0.3, 4)


def apply_overrides(
    fields: list[FieldSchema], overrides: list[SchemaOverride]
) -> list[FieldSchema]:
    """Rename / retype / nullable-flip / exclude (reference
    routers/schemas.py:299-318)."""
    by_name = {o.name: o for o in overrides}
    out = []
    for f in fields:
        o = by_name.get(f.name)
        if o is None:
            out.append(f)
            continue
        if o.exclude:
            continue
        out.append(
            replace(
                f,
                name=o.new_name or f.name,
                detected_type=o.new_type or f.detected_type,
                nullable=f.nullable if o.nullable is None else o.nullable,
            )
        )
    return out


def to_struct_type(fields: list[FieldSchema]) -> T.StructType:
    """FieldSchema list → Spark StructType (persisted as JSON in the catalog)."""
    return T.StructType(
        [
            T.StructField(f.name, SPARK_TYPES[f.detected_type], f.nullable)
            for f in fields
        ]
    )
