"""REST API source: paginated fetch → DataFrame.

Reference semantics (reference: backend/app/services/dag_generator.py:203-287
DAG template; schema-side extraction schema_detection.py:611-652):

- GET/POST with basic or bearer auth
- page / offset pagination with a max-pages guard
- ``data_key`` dot/bracket path to extract the list of records from a nested
  response (the reference's only nested-JSON handling)

The fetch loop is driver-side by design — an API is a serial, rate-limited
endpoint; parallelizing the fetch belongs to the API contract (offset
sharding), not the engine. The records land in ``spark.createDataFrame``
and everything downstream is distributed. ``fetch_fn`` is injectable so the
source is testable without network (and `requests` may be absent here).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


def extract_data_key(payload: Any, data_key: str | None) -> list[dict]:
    """Walk a dot/bracket path ('query.recentchanges', 'a.b[0].c') to the
    record list (reference schema_detection.py:611-652)."""
    if not data_key:
        return payload if isinstance(payload, list) else [payload]
    cur = payload
    for part in data_key.replace("]", "").replace("[", ".").split("."):
        if part == "":
            continue
        if isinstance(cur, list):
            cur = cur[int(part)]
        elif isinstance(cur, dict):
            cur = cur[part]
        else:
            raise KeyError(f"cannot descend into {type(cur).__name__} at {part!r}")
    if not isinstance(cur, list):
        raise ValueError(f"data_key {data_key!r} did not resolve to a list")
    return cur


def _default_fetch(url: str, method: str, params: dict, headers: dict,
                   auth: tuple[str, str] | None, body: dict | None) -> Any:
    try:
        import requests  # noqa: PLC0415 — optional dependency
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "the `requests` package is unavailable; inject fetch_fn instead"
        ) from exc
    resp = requests.request(
        method, url, params=params, headers=headers, auth=auth, json=body, timeout=30
    )
    resp.raise_for_status()
    return resp.json()


@dataclass
class RestSource:
    url: str
    method: str = "GET"
    params: dict = field(default_factory=dict)
    headers: dict = field(default_factory=dict)
    body: dict | None = None
    auth_type: str | None = None            # basic | bearer
    auth_user: str | None = None
    auth_password_or_token: str | None = None
    data_key: str | None = None
    page_param: str | None = None            # e.g. "page" or "offset"
    page_mode: str = "page"                  # page | offset
    page_size: int = 500
    max_pages: int = 100
    fetch_fn: Callable[..., Any] | None = None
    # TTL response cache — the reference's declared-but-unbuilt api_cache
    # table (db/init.sql:275-289). Keyed on url+method+params+body plus an
    # auth *fingerprint* (never the credential itself), so two POSTs with
    # different bodies — or the same request under different credentials —
    # can never serve each other's cached payloads. Plaintext auth never
    # enters the key or the cache file.
    cache_dir: str | None = None
    cache_ttl_s: float = 300.0

    def _auth_fingerprint(self) -> str:
        import hashlib

        material = "|".join(
            str(x) for x in (self.auth_type, self.auth_user, self.auth_password_or_token)
        )
        return hashlib.sha256(material.encode()).hexdigest()[:16]

    def _cached_fetch(self, fetch, url, method, params, headers, auth, body):
        import hashlib
        import json as _json
        import os
        import time

        if self.cache_dir is None:
            return fetch(url, method, params, headers, auth, body)
        key = hashlib.md5(
            _json.dumps(
                [url, method, sorted(params.items()), body, self._auth_fingerprint()],
                default=str,
            ).encode()
        ).hexdigest()
        path = os.path.join(self.cache_dir, f"{key}.json")
        if os.path.exists(path) and time.time() - os.path.getmtime(path) < self.cache_ttl_s:
            with open(path) as fh:
                return _json.load(fh)
        payload = fetch(url, method, params, headers, auth, body)
        os.makedirs(self.cache_dir, exist_ok=True)
        with open(path, "w") as fh:
            _json.dump(payload, fh)
        return payload

    def _headers_and_auth(self) -> tuple[dict, tuple[str, str] | None]:
        headers = dict(self.headers)
        auth = None
        if self.auth_type == "bearer":
            headers["Authorization"] = f"Bearer {self.auth_password_or_token}"
        elif self.auth_type == "basic":
            auth = (self.auth_user or "", self.auth_password_or_token or "")
        return headers, auth

    def fetch_records(self) -> list[dict]:
        fetch = self.fetch_fn or _default_fetch
        headers, auth = self._headers_and_auth()
        records: list[dict] = []
        for page in range(self.max_pages):
            params = dict(self.params)
            if self.page_param:
                params[self.page_param] = (
                    page + 1 if self.page_mode == "page" else page * self.page_size
                )
            payload = self._cached_fetch(
                fetch, self.url, self.method, params, headers, auth, self.body
            )
            batch = extract_data_key(payload, self.data_key)
            records.extend(batch)
            if not self.page_param or len(batch) < self.page_size:
                break
        return records

    def read(self, spark: SparkSession, schema=None) -> DataFrame:
        records = self.fetch_records()
        if schema is not None:
            return spark.createDataFrame(records, schema=schema)
        return spark.createDataFrame(records)
