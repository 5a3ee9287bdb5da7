"""SFTP transport adapter (SURVEY §2.1 S5/S6; README.md:100-112 flows —
code absent from the reference snapshot, semantics reconstructed).

Spark has no built-in SFTP source, and this container has no paramiko
and no SFTP server, so the transport is an interface with a local-dir
fake. The *engine-side* contract is what matters: fetch remote CSVs
matching a glob to a staging dir -> ``spark.read.csv`` them; write a
single CSV artifact -> put it to the remote incoming dir.

At scale the staging dir is shared storage (S3/HDFS/NFS) so executors,
not the driver, read the bytes; the SFTP hop only moves files between
the remote host and staging.
"""

from __future__ import annotations

import fnmatch
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_bigquery_to_sftp_server_spark.sources.files import read_csv, write_csv_single


class SftpTransport:
    """Transport interface. Production implementation wraps paramiko
    (connect with host/user/key, ``sftp.get``/``sftp.put``); tests use
    :class:`LocalDirTransport`."""

    def list_files(self, remote_dir: str, glob: str) -> list[str]:  # pragma: no cover
        raise NotImplementedError("wire a paramiko-backed transport in production")

    def get(self, remote_path: str, local_path: str) -> None:  # pragma: no cover
        raise NotImplementedError

    def put(self, local_path: str, remote_path: str) -> None:  # pragma: no cover
        raise NotImplementedError


class LocalDirTransport(SftpTransport):
    """Deterministic fake: a local directory plays the remote host."""

    def __init__(self, root: str) -> None:
        self.root = Path(root)

    def list_files(self, remote_dir: str, glob: str) -> list[str]:
        base = self.root / remote_dir
        if not base.exists():
            return []
        return sorted(
            str(p.relative_to(self.root))
            for p in base.iterdir()
            if fnmatch.fnmatch(p.name, glob)
        )

    def get(self, remote_path: str, local_path: str) -> None:
        Path(local_path).parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(self.root / remote_path, local_path)

    def put(self, local_path: str, remote_path: str) -> None:
        dest = self.root / remote_path
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(local_path, dest)


def ingest_csv_from_sftp(
    spark: SparkSession,
    transport: SftpTransport,
    remote_dir: str,
    glob: str,
    staging_dir: str,
    **csv_kwargs,
) -> DataFrame:
    """S5: SFTP outgoing dir -> staging -> DataFrame
    (the ``Overall_stats_*.csv`` -> BigQuery flow, README.md:110-111)."""
    staged = []
    for rel in transport.list_files(remote_dir, glob):
        local = str(Path(staging_dir) / Path(rel).name)
        transport.get(rel, local)
        staged.append(local)
    if not staged:
        raise FileNotFoundError(f"no files matching {glob!r} under {remote_dir!r}")
    return read_csv(spark, staged if len(staged) > 1 else staged[0], **csv_kwargs)


def export_csv_to_sftp(
    df: DataFrame,
    transport: SftpTransport,
    local_dir: str,
    remote_path: str,
    header: bool = True,
) -> None:
    """S6: table -> single CSV -> SFTP incoming dir (README.md:112)."""
    write_csv_single(df, local_dir, header=header)
    part = next(Path(local_dir).glob("part-*.csv"))
    transport.put(str(part), remote_path)
