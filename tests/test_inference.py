"""Schema-inference heuristics — pins the reference's edge cases
(FIXTURES.md F6; reference schema_detection.py:199-260)."""

from __future__ import annotations

from pyspark.sql import types as T

from autonomus_datapipeline_spark.inference import (
    FieldSchema,
    SchemaOverride,
    apply_overrides,
    infer_field,
    to_struct_type,
    validate_multi_file,
)
from autonomus_datapipeline_spark.inference.schema_inference import (
    infer_string_type,
    overall_confidence,
)


def test_int_with_thousands_separators():
    typ, conf = infer_string_type(["1,234", "22", "5,000,000", "17"])
    assert typ == "integer" and conf == 1.0


def test_boolean_token_set():
    typ, _ = infer_string_type(["yes", "no", "Y", "n", "TRUE", "f"])
    assert typ == "boolean"


def test_float_votes():
    typ, _ = infer_string_type(["1.5", "2.25", "3.0", "-0.1"])
    assert typ == "float"


def test_dates_iso_us_eu():
    assert infer_string_type(["2024-01-15", "2024-02-20", "2024-03-01"])[0] == "date"
    assert infer_string_type(["01/15/2024", "02/20/2024"])[0] == "date"
    assert infer_string_type(["15-01-2024", "20-02-2024"])[0] == "date"


def test_datetimes():
    assert (
        infer_string_type(["2024-01-15T10:30:00", "2024-01-16 11:00:00"])[0]
        == "timestamp"
    )


def test_mixed_under_threshold_is_string():
    # 3/5 ints = 60% < 95% → string
    assert infer_string_type(["1", "2", "3", "abc", "def"])[0] == "string"


def test_all_null_column():
    typ, conf = infer_string_type([None, None])
    assert typ == "string" and conf == 0.5


def test_complex_values_downgrade():
    f = infer_field("c", [[1, 2], {"a": 1}, None])
    assert f.detected_type == "string" and f.confidence == 0.8


def test_native_long_detection():
    f = infer_field("big", [2**40, 5])
    assert f.detected_type == "long"


def test_field_stats():
    f = infer_field("x", [1, 2, 2, None])
    assert f.null_count == 1
    assert f.unique_count == 2
    assert f.min_value == 1 and f.max_value == 2
    assert f.nullable is True
    assert f.total_count == 4


def test_multi_file_compat():
    compat, incompat = validate_multi_file(
        {"a.csv": ["x", "y"], "b.csv": ["y", "x"], "c.csv": ["x", "z"]}, "a.csv"
    )
    assert compat == ["a.csv", "b.csv"]
    assert incompat[0]["file"] == "c.csv"
    assert incompat[0]["missing_columns"] == ["y"]
    assert incompat[0]["extra_columns"] == ["z"]


def test_confidence_formula():
    fields = [FieldSchema("a", "integer", confidence=1.0),
              FieldSchema("b", "string", confidence=0.8)]
    # mean 0.9 × 0.7 + (1/2) × 0.3 = 0.78
    assert overall_confidence(fields, 1, 2) == 0.78


def test_overrides_and_struct():
    fields = [
        FieldSchema("keep", "integer"),
        FieldSchema("rename_me", "string"),
        FieldSchema("drop_me", "float"),
    ]
    out = apply_overrides(
        fields,
        [
            SchemaOverride("rename_me", new_name="renamed", new_type="timestamp"),
            SchemaOverride("drop_me", exclude=True),
            SchemaOverride("keep", nullable=False),
        ],
    )
    st = to_struct_type(out)
    assert st == T.StructType(
        [
            T.StructField("keep", T.IntegerType(), False),
            T.StructField("renamed", T.TimestampType(), True),
        ]
    )
