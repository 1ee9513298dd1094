"""Provenance: code audit trail + JSON-safe previews.

- ``CodeAudit``: every transform/UDF version persisted with timestamped
  filenames under ``<audit_dir>/<pipeline>/<layer>/`` (reference:
  backend/app/services/code_saver.py — every AI/confirmed/dry-run/upload/DAG
  code file saved under generated_queries/<slug>/…).
- ``preview``: limit+collect with JSON-safe value conversion (reference:
  spark_utils.py:245-274) for UIs/logs — bounded rows, never a full collect.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import json
import os

from pyspark.sql import DataFrame


class CodeAudit:
    def __init__(self, audit_dir: str):
        self.root = audit_dir.rstrip("/")

    def save(self, pipeline: str, layer: str, name: str, kind: str, code: str) -> str:
        """kind ∈ {draft, dry_run, confirmed, rollback} — mirrors the
        reference's per-event file drops."""
        ts = _dt.datetime.now().strftime("%Y%m%d_%H%M%S_%f")
        d = f"{self.root}/{pipeline}/{layer}"
        os.makedirs(d, exist_ok=True)
        path = f"{d}/{ts}_{kind}_{name}.py"
        with open(path, "w") as fh:
            fh.write(code)
        return path

    def history(self, pipeline: str, layer: str) -> list[str]:
        d = f"{self.root}/{pipeline}/{layer}"
        if not os.path.isdir(d):
            return []
        return sorted(os.listdir(d))


def _json_safe(v):
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    return str(v)


def preview(df: DataFrame, n: int = 20) -> dict:
    """Bounded JSON-safe preview: rows + schema, one Spark job."""
    rows = [
        {k: _json_safe(v) for k, v in r.asDict(recursive=True).items()}
        for r in df.limit(n).collect()
    ]
    schema = [
        {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for f in df.schema.fields
    ]
    out = {"rows": rows, "schema": schema, "truncated_at": n}
    json.dumps(out)  # guarantee serializability
    return out
