"""HTTP/JSON API source (S1) — driver-side paged fetch feeding the engine.

Parity target: fetch_top_cryptocurrencies (extract_crypto_data.py:79-107):
sequential paged GET, bounded timeout, shape validation, raise on bad
payload. The transport is injectable so tests (and air-gapped environments)
supply a fake; the default uses stdlib urllib — no extra dependency.

Scale note: this module keeps the reference's driver-side sequential shape
for small control-plane polls (a 250-row snapshot does not need a
cluster). For BULK paged ingestion — backfilling many thousands of pages —
use sources/api_datasource.py instead: the same feed expressed as a
Spark 4 Python DataSource whose InputPartitions are page spans, so the
fetch fans out across executors (and a streaming reader whose offsets are
page numbers). For continuous low-rate feeds, a foreachBatch poll loop
(streaming/sink.py) over this module also works.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable

Fetch = Callable[[str], bytes]


def _default_fetch(timeout_s: float) -> Fetch:
    def fetch(url: str) -> bytes:  # pragma: no cover - network
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:
            return resp.read()

    return fetch


def fetch_paged_json(
    url_template: str,
    pages: int,
    fetch: Fetch | None = None,
    timeout_s: float = 15.0,
    required_keys: tuple[str, ...] = (),
) -> list[dict]:
    """Sequential paged GET; each page must decode to a JSON list of dicts
    (required_keys present), else ValueError — fail fast like the
    reference's shape check (extract_crypto_data.py:96-104)."""
    fetch = fetch or _default_fetch(timeout_s)
    rows: list[dict] = []
    for page in range(1, pages + 1):
        payload = json.loads(fetch(url_template.format(page=page)))
        if not isinstance(payload, list):
            raise ValueError(
                f"page {page}: expected JSON list, got {type(payload).__name__}"
            )
        for item in payload:
            if not isinstance(item, dict):
                raise ValueError(f"page {page}: non-object item in payload")
            missing = [k for k in required_keys if k not in item]
            if missing:
                raise ValueError(f"page {page}: item missing keys {missing}")
            rows.append(item)
    return rows
