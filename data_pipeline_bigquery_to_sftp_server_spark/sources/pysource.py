"""Python Data Source plugin (SURVEY §2.1 breadth): the reference's
paginated API scan (main.py:124-177 — ``limit&page``, stop on
``totalPage``) expressed as a FIRST-CLASS Spark source, so users write
``spark.read.format("rest_pages")`` instead of driver-side loops.

This is the Spark 4 Python Data Source API (`pyspark.sql.datasource`):
``partitions()`` maps one API PAGE to one input partition, so the page
fetches run IN PARALLEL on executors — the idiomatic replacement for
the reference's sequential driver paging + ThreadPoolExecutor detail
pool (main.py:437-444), and unlike sources/rest.py's two-phase
scan+mapInPandas, the planner sees a real scan node (column pruning
and count(*) short-circuit work like any other source).

Hermetic by design (the repo ships no network client): the "endpoint"
is a deterministic record generator parameterized by options
(``n_rows``, ``page_size``, ``seed_salt``) — the same
injected-transport discipline as SftpTransport and rest.py's fetcher
callables. A production deployment replaces ``_record`` with a
requests-backed page GET; partition shape, schema, and option plumbing
stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class PagePartition(InputPartition):  # pragma: no cover - trivial holder
    def __init__(self, page: int, start: int, end: int) -> None:
        self.page = page
        self.start = start
        self.end = end


def _record(i: int, salt: int) -> tuple:
    """Deterministic fake of one API record — pure function of the row
    id (and salt), so the DuckDB oracle regenerates it exactly."""
    status = ("open", "pending", "closed")[(i + salt) % 3]
    priority = (i * 7 + salt) % 5 + 1
    return (i, f"ticket-{i}", status, priority)


class RestPagesDataSource(DataSource):
    """``spark.read.format("rest_pages").option("n_rows", ...)`` —
    one partition per page."""

    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self) -> str:
        return "id bigint, title string, status string, priority bigint"

    def reader(self, schema: StructType) -> DataSourceReader:
        return RestPagesReader(self.options)


class RestPagesReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.page_size = int(options.get("page_size", 100))
        self.salt = int(options.get("seed_salt", 0))

    def partitions(self):
        pages = []
        page, start = 1, 0
        while start < self.n_rows:
            end = min(start + self.page_size, self.n_rows)
            pages.append(PagePartition(page, start, end))
            page += 1
            start = end
        # an empty endpoint must still yield ONE (empty) partition:
        # returning [] makes Spark fall back to a single None partition
        # and read(None) would crash instead of producing zero rows
        return pages or [PagePartition(1, 0, 0)]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        # one "HTTP page GET" per partition — executor-side, parallel
        for i in range(partition.start, partition.end):
            yield _record(i, self.salt)
