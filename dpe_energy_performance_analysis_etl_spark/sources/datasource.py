"""Spark 4 Python Data Source V2: the paged-REST scan as a REAL
``spark.read.format(...)`` source.

``rest.py`` implements the fetch layer as mapInPandas stages over a
key DataFrame — the right shape for keyed 1→N lookups (S5/S6). For
the PAGED endpoint scan (S4, ``extract.py:353-365``: limit/offset
pages fetched in a driver loop) Spark 4's Python Data Source API is
the more idiomatic fit: each page becomes an ``InputPartition``, so

  - pages download in parallel ACROSS EXECUTORS (the reference's
    single-threaded 100-page loop, and rest.py's page-id DataFrame,
    both become simply ``spark.read.format("paged_rest")``);
  - the source composes with the rest of the read API — declared
    schema, ``.filter``/``.select`` on top, streaming reuse — with
    zero driver-side collection;
  - per-task rate limiting bounds aggregate request pressure
    (limit / num concurrent tasks ≈ the reference's RateLimiter
    contract, ``extract.py:44-71``).

Offline by design: the page URL template accepts any scheme
``urllib`` can open (http(s) in production, ``file://`` in tests —
the test suite serves JSON pages from local files; no live HTTP).

Payload contract matches the reference's Enedis endpoint
(``extract.py:146-155``): a JSON object with a ``results`` list of
records; each record maps field name → value.
"""

from __future__ import annotations

import json
import math
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T


class PagedRestDataSource(DataSource):
    """``spark.read.format("paged_rest")`` — options:

    - ``url``: template with ``{offset}`` and ``{limit}``
      placeholders, e.g. ``https://api/records?limit={limit}&offset={offset}``
    - ``total``: total row count to page through (the reference
      hard-codes 10 000, ``extract.py:83-87``)
    - ``page_size``: rows per page (default 100)
    - ``rate_limit_per_sec``: per-task request ceiling (default 30)

    Schema must be declared by the caller (``.schema(...)``) — a
    remote API can't be cheaply sampled for inference, and declared
    schemas are the contract everywhere else in this engine.
    """

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self):
        raise ValueError(
            "paged_rest requires an explicit .schema(...) — declare the "
            "fields the endpoint returns"
        )

    def reader(self, schema: T.StructType) -> "PagedRestReader":
        return PagedRestReader(schema, self.options)


class _Page(InputPartition):
    def __init__(self, offset: int, limit: int):
        self.offset = offset
        self.limit = limit


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        if "url" not in options or "total" not in options:
            raise ValueError("paged_rest needs 'url' and 'total' options")
        self.schema_fields = [f.name for f in schema.fields]
        self.url_template = options["url"]
        self.total = int(options["total"])
        self.page_size = int(options.get("page_size", 100))
        self.rate_limit = float(options.get("rate_limit_per_sec", 30.0))

    def partitions(self) -> Sequence[InputPartition]:
        n_pages = max(1, math.ceil(self.total / self.page_size))
        return [
            _Page(i * self.page_size, min(self.page_size, self.total - i * self.page_size))
            for i in range(n_pages)
        ]

    def read(self, partition: _Page) -> Iterator[tuple]:
        # Per-task limiter: executors never exceed rate_limit each;
        # aggregate pressure = rate_limit × concurrent tasks, which
        # the caller bounds by sizing page_size/parallelism.
        from dpe_energy_performance_analysis_etl_spark.sources.rest import RateLimiter

        limiter = RateLimiter(self.rate_limit)
        limiter.acquire()
        url = self.url_template.format(offset=partition.offset, limit=partition.limit)
        with urllib.request.urlopen(url) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        for record in payload.get("results", []):
            yield tuple(record.get(f) for f in self.schema_fields)


def register_datasources(spark) -> None:
    """Idempotently register the engine's Python data sources on a
    session: ``spark.read.format("paged_rest")`` becomes available."""
    spark.dataSource.register(PagedRestDataSource)
