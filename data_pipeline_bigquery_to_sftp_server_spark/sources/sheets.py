"""Spreadsheet-tab source (SURVEY §2.1 S7) — the reference README's
Sheets→SFTP export flow (reference README.md:11, 112: "export latest
sheet tab as CSV"), re-expressed as a generic row-iterator source.

No Sheets API client ships in this engine (the reference's own
`config.py`/workflow code is absent from its snapshot, README.md:100-106);
instead the adapter accepts any object with the two-method surface a
sheet client has:

    client.list_tabs(sheet_id)      -> list[str]   (tab names)
    client.get_rows(sheet_id, tab)  -> list[dict]  (tab rows)

and turns the *latest* tab (max tab name — tabs are date-named in the
described flow) into a DataFrame. The driver-side row list is bounded by
sheet size (spreadsheets are small by nature — the API itself caps cells),
so this is a driver-side source like the paginated REST scan; everything
downstream is distributed. Production wiring passes a googleapis-backed
client with the same two methods; tests use an in-memory fake.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SheetClient(Protocol):
    def list_tabs(self, sheet_id: str) -> list[str]: ...

    def get_rows(self, sheet_id: str, tab: str) -> list[dict]: ...


def latest_tab(client: SheetClient, sheet_id: str) -> str:
    """README.md:112 'latest sheet tab' selection: tabs are date-named
    snapshots; max() of the names is the newest."""
    tabs = client.list_tabs(sheet_id)
    if not tabs:
        raise ValueError(f"sheet {sheet_id!r} has no tabs")
    return max(tabs)


def read_sheet(
    spark: SparkSession,
    client: SheetClient,
    sheet_id: str,
    schema: T.StructType | str,
    tab: str | None = None,
) -> DataFrame:
    """S7: read one tab (default: the latest) as a DataFrame.

    Explicit schema is required — sheet rows are stringly-typed dicts
    and silent inference is how type drift sneaks into a pipeline.
    Missing keys become NULLs (same leniency as the REST detail fetch).
    """
    tab = tab if tab is not None else latest_tab(client, sheet_id)
    rows = client.get_rows(sheet_id, tab)
    return spark.createDataFrame(rows, schema=schema)


class FakeSheetClient:
    """In-memory stand-in for a Sheets API client (tests / local runs):
    ``tabs`` is ``{tab_name: list[dict]}``."""

    def __init__(self, tabs: dict[str, list[dict]]) -> None:
        self._tabs = tabs

    def list_tabs(self, sheet_id: str) -> list[str]:
        return list(self._tabs)

    def get_rows(self, sheet_id: str, tab: str) -> list[dict]:
        return list(self._tabs[tab])
