#!/usr/bin/env python
"""Static audit of integer/double accumulators for the overflow class that
bit the Neyman planner in r11: an exact-integer pathway (sum of products,
squares, or quantized units) accumulated in a 64-bit integer wraps
SILENTLY past 2^63 on Spark, while DuckDB's SUM(BIGINT) widens to HUGEINT
— a scale-dependent cross-engine divergence invisible at the driver's
sf0.01 gate.

Scans every F.sum(...) call in the package, classifies each accumulator:

- DECIMAL    argument (or the immediate sum result) is decimal-cast —
             wrap-proof; Spark's decimal sum and DuckDB's hugeint/decimal
             sum are both exact and round to double identically (probed).
- COUNT      argument is a count/0-1 flag — bounded by row count, which
             cannot approach 2^63 (9.2e18 rows).
- PRODUCT!   argument contains a product/square with no decimal cast —
             the at-risk class; every such site must appear in
             AUDIT_ACCUMULATORS.md with either a fix or a proven bound.
- PLAIN      plain column sum, no product — at risk only if per-row
             units are large; bounded sites are documented.

Exit code 1 if a PRODUCT! site is not covered by AUDIT_ACCUMULATORS.md.
Coverage is matched PER SITE — file basename + whitespace-normalized
argument snippet against the doc's "Scanner coverage list" appendix — so
a NEW unbounded product sum added to an already-documented file fails the
gate until the doc names that exact site (r14, from ADVICE: the old
per-file `basename in doc` check marked every site in a file covered once
the filename appeared anywhere in the doc). Line numbers are deliberately
not part of the key: they drift with every edit; the snippet is stable.

Usage: python tools/accumulator_audit.py [--all]  (--all prints every
site; default prints only the flagged classes)
"""

from __future__ import annotations

import os
import re
import sys

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "autonomus_datapipeline_spark",
)
AUDIT_DOC = os.path.join(
    os.path.dirname(PKG), "AUDIT_ACCUMULATORS.md"
)


def _sum_calls(text: str):
    """Yield (line_no, argument_string) for every F.sum( call, with
    balanced-paren argument extraction."""
    for m in re.finditer(r"F\.sum\(", text):
        start = m.end()
        depth, i = 1, start
        while depth and i < len(text):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        arg = text[start : i - 1]
        line = text.count("\n", 0, m.start()) + 1
        # What the sum RESULT is immediately cast to, if anything.
        after = text[i : i + 40]
        res_cast = re.match(r"\s*\.cast\(\s*['\"]([^'\"]+)", after)
        yield line, " ".join(arg.split()), (
            res_cast.group(1) if res_cast else ""
        )


def classify(arg: str, res_cast: str) -> str:
    if "decimal" in arg or "dec" in arg.split("(")[0] or "decimal" in res_cast:
        return "DECIMAL"
    # local aliases used across the workloads for decimal type strings
    if re.search(r"\.cast\((dec0|dec12|dec|out_dec)\)", arg):
        return "DECIMAL"
    if re.search(r"F\.count|F\.lit\(1\)|\"n\"|'n'", arg) and "*" not in arg:
        return "COUNT"
    if "*" in arg:
        return "PRODUCT!"
    return "PLAIN"


def site_key(rel: str, arg: str) -> str:
    """Stable per-site coverage key: basename + normalized snippet."""
    return f"{os.path.basename(rel)} F.sum({' '.join(arg.split())[:120]}"


def main() -> int:
    show_all = "--all" in sys.argv
    emit_keys = "--emit-keys" in sys.argv
    doc = open(AUDIT_DOC).read() if os.path.exists(AUDIT_DOC) else ""
    doc_norm = " ".join(doc.split())
    flagged_uncovered = []
    keys = []
    for root, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, os.path.dirname(PKG))
            text = open(path).read()
            for line, arg, res_cast in _sum_calls(text):
                cls = classify(arg, res_cast)
                if cls == "PRODUCT!":
                    key = site_key(rel, arg)
                    keys.append(key)
                    if key not in doc_norm:
                        flagged_uncovered.append((rel, line, arg))
                if not emit_keys and (show_all or cls in ("PRODUCT!", "PLAIN")):
                    print(f"{cls:9s} {rel}:{line}  F.sum({arg[:90]})"
                          f"{' -> ' + res_cast if res_cast else ''}")
    if emit_keys:
        for key in keys:
            print(key + ")")
        return 0
    if flagged_uncovered:
        print(
            f"\n{len(flagged_uncovered)} PRODUCT! sites not covered by "
            f"AUDIT_ACCUMULATORS.md (per-site file+snippet match):"
        )
        for rel, line, arg in flagged_uncovered:
            print(f"  {rel}:{line}  {arg[:90]}")
        return 1
    print("\nall PRODUCT! sites covered by AUDIT_ACCUMULATORS.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
