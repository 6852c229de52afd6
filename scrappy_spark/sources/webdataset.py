"""WebDataset-style tar-shard sink and source.

Large-scale training loaders (the public webdataset convention:
github.com/webdataset/webdataset) stream POSIX tar files whose members
are grouped by a shared basename — ``{key}.txt`` holds the sample
payload, ``{key}.json`` its metadata. This module writes and reads
that layout with nothing beyond the stdlib ``tarfile``:

- ``write_webdataset``: one tar per Spark partition via
  ``mapInPandas`` — the function receives the WHOLE partition as a
  batch iterator, so a single tar handle spans all its batches; the
  write is embarrassingly parallel (no driver-side file, no shuffle
  beyond the caller's chosen partitioning) and returns a manifest
  DataFrame (shard, n_samples, n_bytes) instead of bytes to the
  driver. Tar bytes are deterministic: fixed zero mtime/uid/gid,
  USTAR format, members ordered by key within the shard.
- ``read_webdataset``: ``binaryFile`` scan of ``*.tar`` →
  ``mapInPandas`` parse back to (key, text, meta) rows. Each task
  parses whole shards independently — the natural 100 TB read shape,
  one shard per task, no cross-shard coordination.

Pair with sharding.assign_shards / ranking.curriculum_shards +
``repartition(shard_col)`` to control shard sizes and global order.

Reference parity: the reference's only sink is one CSV file written
from the driver (scrappy.py:350); tar shards are the engine extension
for training-data export.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

SAMPLE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("text", StringType()),
        StructField("meta", StringType()),
    ]
)


def _tar_add(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    text_col: str,
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """Write one ``shard-{pid:05d}.tar`` per partition of ``df``.

    Each row becomes ``{key}.txt`` (utf-8 text) plus ``{key}.json``
    (the ``meta_cols`` values). Keys must be unique per shard — tar has
    no member dedup. Returns the manifest; the action that runs the
    write is the caller's (the manifest is lazy like any DataFrame).
    """
    meta_cols = list(meta_cols or [])
    cols = [key_col, text_col, *meta_cols]
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tar = None
        path = shard = None
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            if tar is None:
                pid = int(pdf["__pid"].iloc[0])
                shard = f"shard-{pid:05d}.tar"
                path = os.path.join(out_dir, shard)
                tar = tarfile.open(path, "w", format=tarfile.USTAR_FORMAT)
            for row in pdf.sort_values(key_col).itertuples(index=False):
                key = str(getattr(row, key_col))
                _tar_add(tar, f"{key}.txt", str(getattr(row, text_col)).encode())
                meta = {c: _jsonable(getattr(row, c)) for c in meta_cols}
                _tar_add(
                    tar, f"{key}.json", json.dumps(meta, sort_keys=True).encode()
                )
                n += 1
        if tar is None:
            return
        tar.close()
        yield pd.DataFrame(
            {"shard": [shard], "n_samples": [n], "n_bytes": [os.path.getsize(path)]}
        )

    staged = df.select(*cols).withColumn("__pid", F.spark_partition_id())
    return staged.mapInPandas(_write, MANIFEST_SCHEMA)


def _jsonable(v: object) -> object:
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


def read_webdataset(spark: SparkSession, in_dir: str) -> DataFrame:
    """Parse every ``*.tar`` under ``in_dir`` back to (key, text, meta).

    ``binaryFile`` hands each task whole-file bytes; parsing is local
    to the task — shards are the unit of parallelism, as written.
    (``pathGlobFilter`` rather than a glob in the path: a glob path
    makes the reader probe ``<glob>/_spark_metadata`` and log a spurious
    FileNotFound stack trace.)
    """
    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(in_dir)
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                keys, texts, metas = [], [], []
                texts_by_key: dict[str, str] = {}
                metas_by_key: dict[str, str] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar.getmembers():
                        stem, ext = os.path.splitext(m.name)
                        payload = tar.extractfile(m).read().decode()
                        if ext == ".txt":
                            texts_by_key[stem] = payload
                        elif ext == ".json":
                            metas_by_key[stem] = payload
                for k in sorted(texts_by_key):
                    keys.append(k)
                    texts.append(texts_by_key[k])
                    metas.append(metas_by_key.get(k, "{}"))
                yield pd.DataFrame({"key": keys, "text": texts, "meta": metas})

    return bins.select("content").mapInPandas(_parse, SAMPLE_SCHEMA)
