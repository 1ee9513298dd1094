"""Conversational codegen seam: clarification | code | error protocol,
state machine, validation gate, dry-run loop, chain confirm — the
reference's chat → clarify/code → dry-run → confirm lifecycle
(ai_service.py:141-265, routers/silver.py:293-367) driven end-to-end with
the deterministic FakeProvider."""

from __future__ import annotations

import pytest

from autonomus_datapipeline_spark.engine.chain import TransformChain
from autonomus_datapipeline_spark.engine.codegen import (
    FakeProvider,
    ProviderResult,
    TransformConversation,
    parse_provider_text,
    schema_context,
)

GOOD_CODE = """\
def transform(df, spark):
    from pyspark.sql import functions as F
    return df.withColumn("doubled", F.col("v") * 2)
"""

FENCED_GOOD = f"Here is the transform:\n```python\n{GOOD_CODE}```\nIt doubles v."

BROKEN_RUNTIME = (
    "```python\n"
    "def transform(df, spark):\n"
    "    from pyspark.sql import functions as F\n"
    "    return df.select(F.col('no_such_column'))\n"
    "```"
)

FORBIDDEN = (
    "```python\n"
    "def transform(df, spark):\n"
    "    df.write.parquet('/tmp/x')\n"
    "    return df\n"
    "```"
)


# ---------------------------------------------------------------------------
# Response parsing (the reference's [CLARIFICATION] / ```python protocol)
# ---------------------------------------------------------------------------


def test_parse_clarification_strips_tag():
    r = parse_provider_text("[CLARIFICATION]\nWhich column holds the price?")
    assert r.kind == "clarification"
    assert r.content == "Which column holds the price?"
    assert r.code is None


def test_parse_code_fence_extracts_code():
    r = parse_provider_text(FENCED_GOOD)
    assert r.kind == "code"
    assert r.code.startswith("def transform(df, spark):")
    assert "doubles v" in r.content


def test_parse_plain_text_is_conversational():
    r = parse_provider_text("I think you want a filter — shall I?")
    assert r.kind == "clarification"


def test_parse_empty_is_error():
    assert parse_provider_text("  ").kind == "error"


# ---------------------------------------------------------------------------
# Conversation state machine
# ---------------------------------------------------------------------------


def _conv(responses):
    return TransformConversation("step1", FakeProvider(responses))


def test_clarification_keeps_chatting():
    c = _conv(["[CLARIFICATION]\nWhich unit?"])
    r = c.send("convert the values")
    assert r.kind == "clarification"
    assert c.status == "chatting"
    assert c.generated_code is None
    assert [m["role"] for m in c.messages] == ["user", "assistant"]
    assert c.conversation_count == 2


def test_code_response_sets_code_generated():
    c = _conv([FENCED_GOOD])
    r = c.send("double the v column")
    assert r.kind == "code"
    assert c.status == "code_generated"
    assert "doubled" in c.generated_code


def test_history_accumulates_and_reaches_provider():
    fp = FakeProvider(["[CLARIFICATION]\nWhich?", FENCED_GOOD])
    c = TransformConversation("s", fp)
    c.send("transform it")
    c.send("the v column, double it")
    # Second call saw the first exchange as history; the new prompt rides
    # the prompt argument, not the history (the reference passes
    # conversation_history exclusive of the message being sent).
    hist_roles = [m["role"] for m in fp.calls[1]["history"]]
    assert hist_roles == ["user", "assistant"]
    assert [m["order"] for m in c.messages] == [1, 2, 3, 4]


def test_provider_exception_becomes_error_status_chatting():
    class Boom:
        def __call__(self, *a, **k):
            raise TimeoutError("upstream timeout")

    c = TransformConversation("s", Boom())
    r = c.send("hi")
    assert r.kind == "error"
    assert "upstream timeout" in r.content
    assert c.status == "chatting"


def test_forbidden_code_bounces_to_chatting():
    c = _conv([FORBIDDEN])
    r = c.send("do something os-y")
    assert r.kind == "error"
    assert "rejected" in r.content
    assert c.status == "chatting"
    assert c.generated_code is None


# ---------------------------------------------------------------------------
# Dry-run loop + confirm into the chain
# ---------------------------------------------------------------------------


def test_dry_run_ok_then_confirm_adds_chain_step(spark):
    df = spark.createDataFrame([(1,), (2,)], ["v"])
    c = _conv([FENCED_GOOD])
    c.schema_ctx = schema_context(df, 2)
    c.send("double v")
    res = c.run_dry_run(spark, df)
    assert res.ok and c.status == "dry_run_ok"
    assert res.rows[0]["doubled"] == 2
    chain = TransformChain("silver")
    c.confirm(chain)
    assert c.status == "confirmed"
    assert "step1" in chain.steps
    out, metrics = chain.execute(df, spark)
    assert out.columns == ["v", "doubled"]
    assert metrics[0].ok


def test_dry_run_failure_appends_error_and_reverts_to_chatting(spark):
    df = spark.createDataFrame([(1,), (2,)], ["v"])
    c = _conv([BROKEN_RUNTIME, FENCED_GOOD])
    c.send("select a column that is not there")
    res = c.run_dry_run(spark, df)
    assert not res.ok and c.status == "chatting"
    assert c.messages[-1]["role"] == "system"
    assert "dry-run failed" in c.messages[-1]["content"]
    # The debug turn sees the failure in history and can fix the code —
    # the reference's rule-10 loop.
    c.send(f"the dry-run failed: {res.error} — please fix")
    assert c.status == "code_generated"
    assert c.run_dry_run(spark, df).ok


def test_confirm_requires_dry_run():
    c = _conv([FENCED_GOOD])
    c.send("double v")
    with pytest.raises(ValueError, match="dry-run first"):
        c.confirm(TransformChain("silver"))


def test_schema_context_shape(spark):
    df = spark.createDataFrame([(1, "a")], ["v", "s"])
    ctx = schema_context(df, 1)
    assert ctx["schema"] == [
        {"name": "v", "type": "bigint", "nullable": True},
        {"name": "s", "type": "string", "nullable": True},
    ]
    assert ctx["sample_rows"] == [{"v": 1, "s": "a"}]


def test_provider_result_dataclass_defaults():
    r = ProviderResult("code", "x", code="def transform(df, spark): ...")
    assert r.error is None
