"""Paged-feed ingestion as a Spark 4 Python DataSource (S1, scale path).

The reference ingests its market feed with a sequential driver-side loop
(`extract_crypto_data.py:79-107`: page 1, page 2, … on one thread). That
is fine for a 250-row control-plane poll and `sources/http_source.py`
keeps that shape for parity — but it cannot backfill a large paged API:
one driver pulling 100k pages serially is the definition of a
non-distributed source.

Spark 4's Python DataSource API is the idiomatic fix: the reader reports
one InputPartition per page RANGE, and every executor fetches its own
pages in parallel (`spark.read.format("paged_feed")`). The same class
exposes a streaming reader (`readStream`) whose offsets are page numbers
— micro-batches advance through the feed with replayable
``readBetweenOffsets`` semantics, so a crashed batch re-reads exactly its
page span.

Transport: with a ``url_template`` option each task GETs
``url_template.format(page=p)`` executor-side (stdlib urllib, bounded
timeout). Without it, a deterministic synthetic feed (md5-derived
symbols/prices — same determinism discipline as sources/generator.py,
no RNG, no wall clock) stands in for the network, which is what tests
and air-gapped runs use.
"""

from __future__ import annotations

import hashlib
import json
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEED_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("symbol", StringType(), False),
        StructField("name", StringType(), False),
        StructField("current_price", DoubleType(), True),
        StructField("market_cap", LongType(), True),
        StructField("total_volume", LongType(), True),
        StructField("last_updated", StringType(), True),
        StructField("page", LongType(), False),
    ]
)


def _h(s: str) -> int:
    """Stable 64-bit int from md5 — executor-side determinism without RNG
    (Python's hash() is salted per process; hashlib is not)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def synthetic_page(page: int, page_size: int, seed: int = 42) -> list[tuple]:
    """Deterministic fake of one feed page: same (page, size, seed) →
    identical rows on any executor, any run."""
    rows = []
    for i in range(page_size):
        k = (page - 1) * page_size + i
        h = _h(f"{seed}|{k}")
        sym = "c" + format(h % 0xFFFFFF, "06x")
        price = (h % 10_000_000) / 1000.0
        rows.append(
            (
                f"coin-{k}",
                sym,
                f"Coin {sym.upper()}",
                price,
                (h // 7) % 10**12,
                (h // 11) % 10**9,
                "2024-01-01T00:00:00Z",
                page,
            )
        )
    return rows


def _fetch_page(url_template: str, page: int, timeout_s: float) -> list[tuple]:
    """Executor-side GET of one page; shape-validated like the reference's
    driver loop (extract_crypto_data.py:96-104)."""  # pragma: no cover
    with urllib.request.urlopen(
        url_template.format(page=page), timeout=timeout_s
    ) as resp:
        payload = json.loads(resp.read())
    if not isinstance(payload, list):
        raise ValueError(f"page {page}: expected JSON list")
    out = []
    for item in payload:
        out.append(
            (
                str(item.get("id")),
                str(item.get("symbol")),
                str(item.get("name")),
                item.get("current_price"),
                item.get("market_cap"),
                item.get("total_volume"),
                item.get("last_updated"),
                page,
            )
        )
    return out


class PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start  # inclusive, 1-based
        self.end = end  # inclusive


class _Options:
    def __init__(self, options: dict):
        self.pages = int(options.get("pages", 10))
        self.page_size = int(options.get("page_size", 100))
        self.seed = int(options.get("seed", 42))
        self.pages_per_task = int(options.get("pages_per_task", 1))
        self.url_template = options.get("url_template")
        self.timeout_s = float(options.get("timeout_s", 15.0))

    def read_pages(self, start: int, end: int) -> Iterator[tuple]:
        for p in range(start, end + 1):
            if self.url_template:
                rows: Sequence[tuple] = _fetch_page(
                    self.url_template, p, self.timeout_s
                )
            else:
                rows = synthetic_page(p, self.page_size, self.seed)
            yield from rows


class PagedFeedReader(DataSourceReader):
    """Batch reader: one InputPartition per ``pages_per_task`` page span —
    the fetch fans out across the executor fleet instead of serializing on
    the driver."""

    def __init__(self, options: dict):
        self.opts = _Options(options)

    def partitions(self):
        o = self.opts
        return [
            PageRange(s, min(s + o.pages_per_task - 1, o.pages))
            for s in range(1, o.pages + 1, o.pages_per_task)
        ]

    def read(self, partition: PageRange):
        yield from self.opts.read_pages(partition.start, partition.end)


class PagedFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: the offset is the last page already committed.
    Each micro-batch reads the next ``pages_per_batch`` pages;
    ``readBetweenOffsets`` replays an exact page span on recovery, so the
    source is replayable (exactly-once with an idempotent sink)."""

    def __init__(self, options: dict):
        self.opts = _Options(options)
        self.pages_per_batch = int(options.get("pages_per_batch", 1))

    def initialOffset(self):
        return {"page": 0}

    def read(self, start):
        # The prefetch wrapper caches, copies, and pickles what this
        # returns: it must be an ITERATOR (next() is called on it) over a
        # concrete sequence (generators can't pickle; a list_iterator can).
        done = int(start["page"])
        if done >= self.opts.pages:
            return iter(()), start
        end = min(done + self.pages_per_batch, self.opts.pages)
        return iter(list(self.opts.read_pages(done + 1, end))), {"page": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            list(self.opts.read_pages(int(start["page"]) + 1, int(end["page"])))
        )


class PagedFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "paged_feed"

    def schema(self):
        return FEED_SCHEMA

    def reader(self, schema):
        return PagedFeedReader(self.options)

    def simpleStreamReader(self, schema):
        return PagedFeedStreamReader(self.options)


def register_paged_feed(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("paged_feed")`` and
    ``spark.readStream.format("paged_feed")`` work session-wide.

    Registered for BY-VALUE pickling first: Spark unpickles the
    DataSource class and runs its plan-time methods in a fresh python
    runner process that inherits the driver's cwd — a by-reference
    pickle would need this repo package importable there (the NOTES
    cwd-portability rule). Everything in this module is stdlib-only, so
    shipping it by value is sufficient and complete."""
    from pyspark import cloudpickle

    import high_volume_market_data_pipeline_spark.sources.api_datasource as m

    cloudpickle.register_pickle_by_value(m)
    spark.dataSource.register(PagedFeedDataSource)
