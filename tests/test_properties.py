"""Property-based tests (hypothesis) for the pure-function cores — the test
strategy the reference lacked entirely (SURVEY.md §5: no property tests, no
golden corpus)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from autonomus_datapipeline_spark.inference.schema_inference import (
    FieldSchema,
    SchemaOverride,
    apply_overrides,
    infer_field,
    infer_string_type,
    overall_confidence,
)
from autonomus_datapipeline_spark.sources.rest import extract_data_key

# -- inference: threshold-voting invariants -----------------------------------


@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=50))
def test_all_int_strings_vote_integer(xs):
    typ, conf = infer_string_type([str(x) for x in xs])
    if all(x in (0, 1) for x in xs):
        # reference quirk: boolean voting runs first and 0/1 are boolean
        # tokens (schema_detection.py:183), so all-0/1 columns vote boolean
        assert typ == "boolean"
    else:
        assert typ == "integer"
        assert conf == 1.0


@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=50,
    )
)
def test_all_float_strings_vote_numeric(xs):
    # floats that happen to print integral (e.g. '1.0') still parse as float
    typ, _ = infer_string_type([repr(float(x)) for x in xs])
    assert typ in {"float", "integer", "boolean"}  # 0.0/1.0-only lists may vote earlier


@given(st.lists(st.sampled_from(["yes", "no", "t", "f", "TRUE", "False"]),
                min_size=1, max_size=50))
def test_boolean_tokens_vote_boolean(xs):
    assert infer_string_type(xs)[0] == "boolean"


@given(st.lists(st.text(
    alphabet=st.characters(whitelist_categories=["Lu", "Ll"]), min_size=1, max_size=8
), min_size=1, max_size=30))
def test_alpha_strings_stay_strings(xs):
    typ, _ = infer_string_type(xs)
    # pure alphabetic tokens can only vote boolean (t/f/y/n…) or string
    assert typ in {"string", "boolean"}


@given(st.lists(st.one_of(st.integers(-100, 100), st.none()),
                min_size=1, max_size=50))
def test_infer_field_stats_invariants(vals):
    f = infer_field("c", vals)
    assert f.total_count == len(vals)
    assert f.null_count == sum(v is None for v in vals)
    assert f.null_count + len([v for v in vals if v is not None]) == f.total_count
    assert (f.null_count > 0) == f.nullable
    non_null = [v for v in vals if v is not None]
    if non_null:
        assert f.min_value == min(non_null)
        assert f.max_value == max(non_null)
        assert 1 <= f.unique_count <= len(non_null)
    assert len(f.sample_values) <= 5


@given(st.lists(st.floats(0, 1), min_size=1, max_size=20),
       st.integers(0, 10), st.integers(1, 10))
def test_confidence_bounded(confs, n_compat, n_files):
    fields = [FieldSchema(f"c{i}", "string", confidence=c) for i, c in enumerate(confs)]
    conf = overall_confidence(fields, min(n_compat, n_files), n_files)
    assert 0.0 <= conf <= 1.0


@given(st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=4,
                unique=True),
       st.sets(st.sampled_from(["a", "b", "c", "d"])))
def test_override_exclusions(names, excluded):
    fields = [FieldSchema(n, "string") for n in names]
    overrides = [SchemaOverride(n, exclude=True) for n in excluded]
    out = apply_overrides(fields, overrides)
    assert [f.name for f in out] == [n for n in names if n not in excluded]


# -- rest: data_key path walking ----------------------------------------------


@given(st.lists(st.dictionaries(st.text(max_size=3), st.integers(), max_size=3),
                max_size=5))
@settings(max_examples=25)
def test_extract_data_key_roundtrip(records):
    payload = {"a": {"b": records}}
    assert extract_data_key(payload, "a.b") == records


# -- column function: bucket totality ------------------------------------------


def test_category_bucket_covers_all_inputs(spark):
    from pyspark.sql import functions as F

    from autonomus_datapipeline_spark.functions import category_bucket

    df = spark.range(-1000, 1000).select(F.col("id").cast("double").alias("v"))
    out = df.select(
        category_bucket(F.col("v"), [-500.0, 0.0, 500.0],
                        ["low", "mid", "high", "top"]).alias("b")
    )
    assert out.filter(F.col("b").isNull()).count() == 0
    assert set(r["b"] for r in out.distinct().collect()) == {"low", "mid", "high", "top"}


# ---------------------------------------------------------------------------
# Integer half-up quantization (the engine-portable ROUND replacement)
# ---------------------------------------------------------------------------

from fractions import Fraction


@given(st.integers(0, 10**6), st.integers(1, 10**6))
def test_e4_half_up_matches_exact_rational_rounding(num, den):
    # floor((2*10^4*num + den) / (2*den)) must equal round-half-up of
    # 10^4 * num/den computed on the EXACT rational — the property that
    # makes the quantized ratio identical on every engine.
    got = (num * 20000 + den) // (den * 2)
    exact = Fraction(num * 10000, den)
    expected = int(exact) + (1 if exact - int(exact) >= Fraction(1, 2) else 0)
    assert got == expected


def test_e4_half_up_column_matches_python(spark):
    from autonomus_datapipeline_spark.operators.text import _e4_half_up
    from pyspark.sql import functions as F

    rows = [(3763, 10000), (1, 3), (2, 3), (5, 8), (12345, 99999), (0, 7)]
    df = spark.createDataFrame(rows, "num long, den long").select(
        "num", "den", _e4_half_up(F.col("num"), F.col("den")).alias("e4")
    )
    for r in df.collect():
        assert r["e4"] == (r["num"] * 20000 + r["den"]) // (r["den"] * 2)
