#!/usr/bin/env python
"""Merge parallel sf1_sweep shard artifacts (and optionally a partial
serial-run LOG) into one SF1_SWEEP.json.

Shard JSONs are authoritative; log entries (from a serial run that was
killed to make way for the shards) fill in queries no shard covered —
parsed from the per-query lines sf1_sweep prints, tolerating the \r
progress-bar junk Spark interleaves.

Usage: python tools/merge_sf1_sweep.py out.json shard1.json [shard2.json
       ...] [--log sweep.log]
"""

from __future__ import annotations

import json
import re
import sys

LINE = re.compile(
    r"(?:^|\r)(ok~?|ok\*|FAIL)\s+(\S+): (.*?)\s*(?:\((\d+\.\d+)s\))?\s*(?:$|\r)",
    re.M,
)


def parse_log(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    text = open(path).read()
    for status, name, body, sec in LINE.findall(text):
        row: dict = {"sec": float(sec) if sec else None}
        if status == "FAIL":
            row.update(status="FAIL", detail=body)
        elif status == "ok*":
            m = re.search(r"rows-only \((\d+) rows", body)
            row.update(status="ok*", rows=int(m.group(1)) if m else None)
        else:
            m = re.search(r"(\d+) rows match", body)
            row.update(status="ok", rows=int(m.group(1)) if m else None)
            if "bit-exact" in body:
                row["strict"] = "bit-exact"
            else:
                d = re.search(r"max rel (\S+)", body)
                row["strict"] = f"drift {d.group(1)}" if d else "unknown"
        out[name] = row
    return out


def main() -> int:
    args = sys.argv[1:]
    if "--log" in args:
        i = args.index("--log")
        log_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    else:
        log_path = None
    out_path, shard_paths = args[0], args[1:]

    merged: dict[str, dict] = {}
    if log_path:
        merged.update(parse_log(log_path))
    for p in shard_paths:
        with open(p) as fh:
            merged.update(json.load(fh)["queries"])

    failures = sorted(n for n, r in merged.items() if r["status"] == "FAIL")
    drifted = sorted(
        n for n, r in merged.items()
        if r.get("strict", "").startswith("drift")
    )
    summary = {
        "n_queries": len(merged),
        "n_ok": sum(1 for r in merged.values() if r["status"] == "ok"),
        "n_rows_only": sum(
            1 for r in merged.values() if r["status"] == "ok*"
        ),
        "n_fail": len(failures),
        "failures": failures,
        "n_float_drift": len(drifted),
        "float_drift": drifted,
        "sources": shard_paths + ([log_path] if log_path else []),
    }
    with open(out_path, "w") as fh:
        json.dump({"summary": summary, "queries": merged}, fh, indent=1,
                  sort_keys=True)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
