"""Static validation of user/AI transform code.

Port of the reference's pre-execution gate (reference:
backend/app/services/ai_service.py:268-296): a transform must define
``def transform(df, spark)``, must not write, must not touch the OS, and may
only read explicitly whitelisted lookup paths. Syntax is checked with
``compile()``. This is a semantic guard, not a security boundary — the
sandbox (engine/sandbox.py) enforces the import/builtin whitelist at exec
time.
"""

from __future__ import annotations

FORBIDDEN_SNIPPETS = [
    # sinks are engine-owned (reference ai_service.py:278-281)
    "df.write",
    ".write.",
    "saveAsTable",
    "writeTo(",
    # OS / process escape hatches
    "os.system",
    "subprocess",
    "eval(",
    "exec(",
    "__import__",
    "open(",
]

ALLOWED_READ_PREFIXES = ("spark.read.csv(", "spark.read.parquet(")


class TransformValidationError(ValueError):
    pass


def validate_transform_code(code: str) -> None:
    """Raise TransformValidationError on any contract violation."""
    if "def transform(" not in code:
        raise TransformValidationError(
            "transform code must define `def transform(df, spark):`"
        )
    for snippet in FORBIDDEN_SNIPPETS:
        if snippet in code:
            raise TransformValidationError(f"forbidden construct: {snippet!r}")
    # Only whitelisted lookup-table reads are allowed (reference
    # ai_service.py:283-288 permitted spark.read.csv for reference tables).
    for line in code.splitlines():
        stripped = line.strip()
        if "spark.read" in stripped:
            after = stripped[stripped.index("spark.read"):]
            if not after.startswith(ALLOWED_READ_PREFIXES):
                raise TransformValidationError(
                    "only spark.read.csv(...) / spark.read.parquet(...) lookup "
                    f"reads are allowed, got: {stripped!r}"
                )
    try:
        compile(code, "<transform>", "exec")
    except SyntaxError as exc:
        raise TransformValidationError(f"syntax error: {exc}") from exc
