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
from pyspark.sql.functions import pandas_udf

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
        env: dict[str, Any] = {"__builtins__": _safe_builtins()}
        exec(compile(code, f"<udf:{name}>", "exec"), env)  # noqa: S102 — sandboxed
        fn = env.get(name)
        if not callable(fn):
            raise ValueError(f"code must define `def {name}(...)`")
        for i, case in enumerate(test_cases or []):
            got = fn(*case["input"])
            if got != case["expected_output"]:
                raise UdfTestFailure(
                    f"test case {i} failed: {name}(*{case['input']!r}) = "
                    f"{got!r}, expected {case['expected_output']!r}"
                )
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
