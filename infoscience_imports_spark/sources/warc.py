"""Distributed WARC reader — the Common-Crawl-shaped ingest source.

Reference parity: the S1-S8 "harvest scans" pull records from remote APIs
page by page (``data_pipeline/harvester.py``); the web-scale analogue of a
harvest is reading WARC archives (ISO 28500, the public Common Crawl
format) into the pipeline's ``(url, warc_ts, html, text, lang)`` input
shape.

Scale design (10^12 docs = ~10^5-10^6 WARC files of ~1 GB):
  * the unit of parallelism is the FILE — WARC is a concatenation of
    independent (often individually-gzipped) records, so one task streams
    one file start to finish; with ~4 files per core across the cluster the
    scan needs no shuffle at all;
  * records are parsed inside an Arrow ``mapInPandas`` kernel that opens
    the file itself (streaming, bounded memory) — payload bytes flow
    straight from the archive into Arrow batches, never through a
    JVM-side whole-file ``binaryFile`` row (which caps at 2 GB and copies
    the archive twice);
  * batches are bounded by BYTES, not record count: a batch is flushed
    once it holds ~``batch_bytes`` of payload, so a file of 50 MB pages
    and a file of 2 KB pages both produce right-sized Arrow batches;
  * ``.warc.gz`` (Common Crawl member-per-record gzip) and plain ``.warc``
    both stream through ``gzip.open``'s multi-member decoding / plain
    ``open`` respectively.

Local paths here; on a cluster the same kernel opens object-store URLs via
the installed filesystem (``fsspec``/``boto``-style) — the file list, not
the file bytes, is what Spark distributes.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("warc_type", StringType(), True),
        StructField("record_offset", LongType(), True),
        StructField("source_file", StringType(), True),
    ]
)


def _read_headers(fh: io.BufferedIOBase) -> dict[str, str] | None:
    """Read a WARC header block (terminated by an empty line). None at EOF."""
    line = fh.readline()
    # skip record separators between blocks
    while line in (b"\r\n", b"\n"):
        line = fh.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
    headers: dict[str, str] = {"__version__": line.strip().decode("ascii")}
    while True:
        line = fh.readline()
        if line in (b"\r\n", b"\n", b""):
            return headers
        k, _, v = line.decode("utf-8", "replace").partition(":")
        headers[k.strip().lower()] = v.strip()


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a 'response' record payload."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def iter_warc_records(
    fh: io.BufferedIOBase, source_file: str = ""
) -> Iterator[dict]:
    """Stream (url, warc_ts, html, warc_type, record_offset) dicts.

    Pure-Python single-file parser — the unit the Spark kernel maps over,
    and independently unit-testable without Spark.
    """
    offset = 0
    while True:
        headers = _read_headers(fh)
        if headers is None:
            return
        length = int(headers.get("content-length", "0"))
        payload = fh.read(length)
        if len(payload) < length:
            raise ValueError(f"truncated WARC record in {source_file!r}")
        rtype = headers.get("warc-type", "")
        ts = headers.get("warc-date")
        t = pd.Timestamp(ts) if ts else None
        if t is not None and t.tzinfo is not None:
            t = t.tz_convert("UTC").tz_localize(None)
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": t,
            "html": _http_body(payload) if rtype == "response" else payload,
            "warc_type": rtype,
            "record_offset": offset,
            "source_file": source_file,
        }
        offset += 1


def _open_warc(path: str) -> io.BufferedIOBase:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # multi-member streams decode seamlessly
    return open(path, "rb")


def read_warc(
    spark: SparkSession,
    path_glob: str,
    record_types: tuple[str, ...] = ("response",),
    batch_bytes: int = 32 << 20,
) -> DataFrame:
    """WARC archive glob -> DataFrame in the pipeline input family.

    ``record_types`` keeps only the listed WARC-Type values ('response' by
    default — the crawl payloads); pass ``()`` to keep every record.
    """
    paths = sorted(_glob.glob(path_glob))
    if not paths:
        raise FileNotFoundError(f"no WARC files match {path_glob!r}")
    return read_warc_paths(spark, paths, record_types, batch_bytes)


def read_warc_paths(
    spark: SparkSession,
    paths: list[str],
    record_types: tuple[str, ...] = ("response",),
    batch_bytes: int = 32 << 20,
) -> DataFrame:
    """Same as :func:`read_warc` over an explicit path list (e.g. the paths
    of one streaming micro-batch). ``file:`` URIs are accepted."""
    paths = [p[len("file:"):] if p.startswith("file:") else p for p in paths]
    sc = spark.sparkContext
    path_df = spark.createDataFrame(
        [(p,) for p in paths], StructType([StructField("path", StringType(), False)])
    ).repartition(min(len(paths), sc.defaultParallelism))
    keep = set(record_types)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            held = 0
            for path in pdf["path"]:
                with _open_warc(path) as fh:
                    for rec in iter_warc_records(fh, source_file=path):
                        if keep and rec["warc_type"] not in keep:
                            continue
                        rows.append(rec)
                        held += len(rec["html"] or b"")
                        if held >= batch_bytes:
                            yield pd.DataFrame(rows)
                            rows, held = [], 0
            if rows:
                yield pd.DataFrame(rows)

    return path_df.mapInPandas(kernel, schema=WARC_SCHEMA)


def warc_pipeline_input(warc_df: DataFrame) -> DataFrame:
    """Project WARC records to the pipeline's (url, warc_ts, html, text,
    lang) input view (text/lang unknown at ingest — the extract stage fills
    text; lang stays null unless a classifier runs)."""
    return warc_df.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def write_warc(records: Iterator[dict], fh: io.BufferedIOBase) -> int:
    """Minimal WARC writer (tests + fixture tooling): each dict needs
    url/warc_ts/html; returns the record count. Emits 'response' records
    with a canned HTTP envelope, matching what :func:`read_warc` strips."""
    n = 0
    for rec in records:
        body = rec["html"] if isinstance(rec["html"], (bytes, bytearray)) else str(rec["html"]).encode()
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        ts = pd.Timestamp(rec["warc_ts"]).strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode("ascii")
        fh.write(head)
        fh.write(http)
        fh.write(b"\r\n\r\n")
        n += 1
    return n
