"""User-function registry with test-case-gated registration.

The reference declared this capability but never built it: a
``user_functions`` table storing function_code, input_fields, output_type and
test_cases ({input, expected_output}) with no consuming code (reference:
db/init.sql:209-220; SURVEY.md §1.4). This module implements it Spark-first:

- functions are registered from source code, validated in the same sandbox
  as transforms
- every registration runs the declared test cases FIRST; a failing case
  rejects the function (the dry-run discipline applied to UDFs)
- registered functions can be materialized as a pandas UDF (vectorized,
  Arrow-batched — the only sane Python-UDF path at scale) or used as plain
  Python for driver-side logic
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf

from autonomus_datapipeline_spark.engine.sandbox import _safe_builtins

ALLOWED_OUTPUT_TYPES = {
    "string", "integer", "long", "float", "double", "boolean",
}


@dataclass
class UserFunction:
    name: str
    code: str
    output_type: str
    fn: Callable[..., Any]
    test_cases: list[dict] = field(default_factory=list)


class UdfTestFailure(ValueError):
    pass


def _compile_and_gate(name, code, tag, test_cases, canon):
    """Sandbox-compile ``def {name}(...)`` and run its declared test cases;
    the single gate both the scalar-UDF and UDTF registration paths go
    through (``canon`` normalizes actual/expected outputs for comparison —
    identity for scalars, list-of-tuples for table functions)."""
    env: dict[str, Any] = {"__builtins__": _safe_builtins()}
    exec(compile(code, f"<{tag}:{name}>", "exec"), env)  # noqa: S102 — sandboxed
    fn = env.get(name)
    if not callable(fn):
        raise ValueError(f"code must define `def {name}(...)`")
    for i, case in enumerate(test_cases or []):
        got = canon(fn(*case["input"]))
        want = canon(case["expected_output"])
        if got != want:
            raise UdfTestFailure(
                f"test case {i} failed: {name}(*{case['input']!r}) = "
                f"{got!r}, expected {want!r}"
            )
    return fn


class UdfRegistry:
    def __init__(self) -> None:
        self._functions: dict[str, UserFunction] = {}

    def register(
        self,
        name: str,
        code: str,
        output_type: str,
        test_cases: list[dict] | None = None,
    ) -> UserFunction:
        """Compile ``def {name}(...)`` in the sandbox, run its test cases,
        register on success.

        Each test case is {"input": [args...], "expected_output": value}
        (the reference's declared test_cases JSONB shape, db/init.sql:216).
        """
        if output_type not in ALLOWED_OUTPUT_TYPES:
            raise ValueError(f"output_type must be one of {sorted(ALLOWED_OUTPUT_TYPES)}")
        fn = _compile_and_gate(name, code, "udf", test_cases, lambda got: got)
        uf = UserFunction(name, code, output_type, fn, list(test_cases or []))
        self._functions[name] = uf
        return uf

    def get(self, name: str) -> UserFunction:
        return self._functions[name]

    def names(self) -> list[str]:
        return sorted(self._functions)

    def as_pandas_udf(self, name: str):
        """Materialize as an Arrow-batched pandas UDF (elementwise map over
        each Series batch). Row-at-a-time Python UDFs are deliberately not
        offered — at 100 TB the serialization tax is prohibitive."""
        uf = self.get(name)
        fn = uf.fn

        @pandas_udf(uf.output_type)
        def _udf(*cols: pd.Series) -> pd.Series:
            return pd.Series([fn(*vals) for vals in zip(*cols)])

        return _udf

    def register_with_spark(self, spark: SparkSession, name: str) -> None:
        """Expose to spark.sql as a named function."""
        spark.udf.register(name, self.as_pandas_udf(name))

    def as_grouped_agg_udf(self, name: str):
        """Materialize as a grouped-aggregate pandas UDF (UDAF): the
        registered function receives whole pandas Series per group and
        returns one scalar. Arrow ships each group's columns as a batch, so
        the Python tax is paid once per GROUP, not per row — the only UDAF
        shape that survives 100 TB. The function must be insensitive to
        within-group row order (Spark does not guarantee one) to stay
        deterministic; order-free formulations (sort inside, or symmetric
        reductions) satisfy this.

        The reference's user_functions table declared UDAF registration but
        nothing consumed it (db/init.sql:209-220); this is the working form.
        """
        uf = self.get(name)
        fn = uf.fn

        # Type-hint form (Series... -> scalar == grouped agg): the
        # PandasUDFType enum is deprecated and warns on every call.
        @pandas_udf(uf.output_type)
        def _agg(*cols: pd.Series) -> float:
            return fn(*cols)

        return _agg

    def register_table_function(
        self, name: str, code: str, return_schema: str,
        test_cases: list[dict] | None = None,
    ):
        """Register + materialize a UDTF (table function): ``code`` defines a
        generator ``def {name}(*args)`` yielding output tuples; it is
        sandbox-compiled, test-case-gated (expected_output is the full list
        of yielded tuples), wrapped in a UDTF class and registered with
        ``spark.udtf`` by :meth:`register_udtf_with_spark`. UDTFs evaluate
        per input row in Python — a slow path by construction; they exist
        for 1→N expansions the relational operators can't express, never for
        bulk transforms.
        """
        fn = _compile_and_gate(
            name, code, "udtf", test_cases, lambda got: [tuple(r) for r in got]
        )
        uf = UserFunction(name, code, return_schema, fn, list(test_cases or []))
        self._functions[name] = uf
        return uf

    def as_udtf(self, name: str):
        """Materialize a registered table function as a Spark UDTF class."""
        uf = self.get(name)
        fn = uf.fn

        class _TableFn:
            def eval(self, *args):
                yield from fn(*args)

        return udtf(_TableFn, returnType=uf.output_type)

    def register_udtf_with_spark(self, spark: SparkSession, name: str) -> None:
        """Expose a registered table function to SQL: ``name(...)`` becomes
        callable in a FROM/LATERAL position."""
        spark.udtf.register(name, self.as_udtf(name))
