"""Spark 4 Python Data Source for WebDataset tar shards:

    spark.dataSource.register(WebDatasetDataSource)
    df = (spark.read.format("webdataset")
          .option("path", "/data/shards")       # dir, file, or glob
          .option("exts", "jpg,json")           # optional member filter
          .load())

Schema: ``shard string, sample_key string, member_ext string,
n_bytes long, payload binary`` — one row per member file, with the
WebDataset sample key (basename stem) split out so
``groupBy(shard, sample_key)`` reassembles training samples.

Partitioning is the point: **one input partition per shard file**,
planned on the driver from a cheap directory listing; each executor
task opens only its own tar and streams members out — the exact split
granularity WebDataset was designed around (shards are sized for one
task: 100 MB–1 GB). At 100 TB the scan parallelizes across ~10⁵
shards with zero coordination, payloads never route through the
driver, and a ``where(member_ext = 'json')`` prunes rows before any
wide stage downstream.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WebDatasetReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path", "")
        exts = options.get("exts", "")
        self.exts = {
            e.strip().lstrip(".") for e in exts.split(",") if e.strip()
        }

    def partitions(self) -> list[InputPartition]:
        p = self.path
        if os.path.isdir(p):
            paths = sorted(
                _glob.glob(os.path.join(p, "*.tar"))
                + _glob.glob(os.path.join(p, "*.tar.gz"))
                + _glob.glob(os.path.join(p, "*.tgz"))
            )
        elif any(ch in p for ch in "*?["):
            paths = sorted(_glob.glob(p))
        else:
            paths = [p] if p else []
        if not paths:
            raise FileNotFoundError(f"no shards under {self.path!r}")
        return [_ShardPartition(x) for x in paths]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        from ..operators.multimodal import iter_tar_members

        shard = os.path.basename(partition.path)
        with open(partition.path, "rb") as f:
            payload = f.read()
        for name, data in iter_tar_members(payload):
            base = name.rsplit("/", 1)[-1]
            stem, dot, ext = base.partition(".")
            ext = ext if dot else ""
            if self.exts and ext not in self.exts:
                continue
            yield shard, stem, ext, len(data), data


class WebDatasetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self):
        return (
            "shard string, sample_key string, member_ext string,"
            " n_bytes long, payload binary"
        )

    def reader(self, schema) -> DataSourceReader:
        return WebDatasetReader(self.options)


def register_webdataset(spark) -> None:
    spark.dataSource.register(WebDatasetDataSource)
