"""Round-14 (optimization round) focused tests.

Covers the r14 ADVICE fixes: the accumulator-audit scanner's per-site
coverage gate, and the durbin-watson numerator descale (pinned implicitly
by the registry-wide oracle gate plus the existing below-2^53 descale
equality test — the focused check here is that BOTH dw sums now go
through the descale form).
"""

from __future__ import annotations

import importlib.util
import re

REPO = "/root/repo"


def _load_scanner():
    spec = importlib.util.spec_from_file_location(
        "accumulator_audit", f"{REPO}/tools/accumulator_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_accumulator_audit_gate_is_per_site():
    """A product snippet NOT in the doc must read as uncovered even when
    its file is mentioned throughout the doc (the r13 per-file gate let
    any new product sum in an already-mentioned file pass silently)."""
    m = _load_scanner()
    doc_norm = " ".join(open(f"{REPO}/AUDIT_ACCUMULATORS.md").read().split())
    # stats_ops.py appears many times in the doc…
    assert "stats_ops.py" in doc_norm
    # …but an arbitrary new product snippet in it must NOT be covered.
    fake = m.site_key("workloads/stats_ops.py", 'F.col("zz9") * F.col("qq9")')
    assert fake not in doc_norm
    # A genuinely documented site IS covered.
    real = m.site_key("workloads/sketch_ops.py", 'F.col("s") * F.col("c")')
    assert real in doc_norm


def test_accumulator_audit_keys_are_whitespace_normalized():
    m = _load_scanner()
    a = m.site_key("x/f.py", 'F.col("a")  *   F.col("b")')
    b = m.site_key("x/f.py", 'F.col("a") * F.col("b")')
    assert a == b


def test_durbin_watson_numerator_uses_descale():
    """Both dw_stat sums (numerator AND denominator) must ride the exact
    descale form — the ADVICE r14 find: the numerator had been left on
    the direct DECIMAL→DOUBLE cast, a latent 1-ulp cross-engine break
    past 2^53 units."""
    src = open(
        f"{REPO}/autonomus_datapipeline_spark/workloads/stats_ops.py"
    ).read()
    m = re.search(
        r"def durbin_watson_trend_residuals.*?return lagged\.agg\((.*?)\n    \)",
        src,
        re.S,
    )
    assert m, "durbin_watson_trend_residuals agg not found"
    agg_src = m.group(1)
    # Two quadratic sums, both descaled; no bare .cast("double") on a sum.
    assert agg_src.count("descale6") == 2
    assert '.cast("double")\n' not in agg_src.replace(
        'cast("bigint")', ""
    ).replace("F.count", "")
