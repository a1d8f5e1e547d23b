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
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
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
        StructField("record_index", LongType(), True),
        StructField("byte_offset", LongType(), True),
        StructField("source_file", StringType(), True),
        StructField("defect", StringType(), True),
    ]
)


class _CountingReader:
    """Wrap a byte stream and count consumed bytes — gives each record its
    start offset in the *uncompressed* stream. For a plain ``.warc`` that is
    the file byte offset (range-fetch usable, the Common-Crawl-index
    convention); for ``.warc.gz`` it is the post-inflate position (member
    byte offsets in the compressed file would need member boundaries, which
    a streaming multi-member inflate does not expose — documented limit)."""

    def __init__(self, fh: io.BufferedIOBase) -> None:
        self._fh = fh
        self.pos = 0

    def readline(self) -> bytes:
        b = self._fh.readline()
        self.pos += len(b)
        return b

    def read(self, n: int = -1) -> bytes:
        b = self._fh.read(n)
        self.pos += len(b)
        return b


def _read_headers(fh: _CountingReader) -> tuple[dict[str, str], int] | None:
    """Read a WARC header block (terminated by an empty line), returning
    (headers, byte offset of the ``WARC/`` line). None at EOF."""
    start = fh.pos
    line = fh.readline()
    # skip record separators between blocks
    while line in (b"\r\n", b"\n"):
        start = fh.pos
        line = fh.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
    headers: dict[str, str] = {"__version__": line.strip().decode("ascii")}
    while True:
        line = fh.readline()
        if line in (b"\r\n", b"\n", b""):
            return headers, start
        k, _, v = line.decode("utf-8", "replace").partition(":")
        headers[k.strip().lower()] = v.strip()


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 ``Transfer-Encoding: chunked`` body (trailers and
    chunk extensions ignored per RFC 9112 §7.1)."""
    out: list[bytes] = []
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("chunked body: missing chunk-size line")
        size = int(body[pos:nl].split(b";", 1)[0].strip() or b"0", 16)
        pos = nl + 2
        if size == 0:
            return b"".join(out)
        if len(body) < pos + size:
            raise ValueError("chunked body: truncated chunk data")
        out.append(body[pos : pos + size])
        pos += size + 2  # chunk data + trailing CRLF


def _http_body(payload: bytes) -> bytes:
    """Decode the HTTP response envelope of a 'response' record payload.

    Real Common Crawl response records are raw wire captures: bodies are
    frequently ``Transfer-Encoding: chunked`` and/or ``Content-Encoding:
    gzip``/``deflate`` — returning those bytes as 'html' silently feeds
    garbage to the extract stage. This parses the response headers,
    de-chunks, then decompresses gzip/x-gzip/deflate (both zlib-wrapped and
    the raw-deflate server bug). Unsupported codings (``br``, ``zstd`` — no
    codec in this container) and malformed encodings fall back to the raw
    body bytes rather than failing the record: a defect in one page's
    envelope must not kill an archive-sized task.
    """
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return payload
    body = payload[sep + 4 :]
    headers: dict[str, str] = {}
    for line in payload[:sep].decode("latin-1", "replace").split("\r\n")[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip().lower()
    try:
        if "chunked" in headers.get("transfer-encoding", ""):
            body = _dechunk(body)
        ce = headers.get("content-encoding", "")
        if ce in ("gzip", "x-gzip"):
            body = gzip.decompress(body)
        elif ce == "deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
        return body
    except (ValueError, zlib.error, OSError):
        return payload[sep + 4 :]


def iter_warc_records(
    fh: io.BufferedIOBase, source_file: str = ""
) -> Iterator[dict]:
    """Stream (url, warc_ts, html, warc_type, record_index, byte_offset)
    dicts.

    Pure-Python single-file parser — the unit the Spark kernel maps over,
    and independently unit-testable without Spark. ``byte_offset`` is the
    uncompressed-stream offset of each record's ``WARC/`` line (see
    :class:`_CountingReader`); ``record_index`` is the 0-based ordinal
    within the file. Raises ``ValueError`` on a malformed boundary or a
    truncated record — callers wanting parse-until-defect semantics wrap
    this (see ``read_warc_paths(strict=False)``).
    """
    cr = _CountingReader(fh)
    index = 0
    while True:
        rec = _next_record(cr, source_file)
        if rec is None:
            return
        rec["record_index"] = index
        yield rec
        index += 1


def _next_record(cr: _CountingReader, source_file: str = "") -> dict | None:
    """Parse ONE record at the reader's current position (must be a record
    boundary or inter-record separators). None at EOF; ``record_index`` is
    left at -1 — only a full scan knows the ordinal."""
    parsed = _read_headers(cr)
    if parsed is None:
        return None
    headers, start = parsed
    length = int(headers.get("content-length", "0"))
    payload = cr.read(length)
    if len(payload) < length:
        raise ValueError(f"truncated WARC record in {source_file!r}")
    rtype = headers.get("warc-type", "")
    ts = headers.get("warc-date")
    t = pd.Timestamp(ts) if ts else None
    if t is not None and t.tzinfo is not None:
        t = t.tz_convert("UTC").tz_localize(None)
    return {
        "url": headers.get("warc-target-uri"),
        "warc_ts": t,
        "html": _http_body(payload) if rtype == "response" else payload,
        "warc_type": rtype,
        "record_index": -1,
        "byte_offset": start,
        "source_file": source_file,
        "defect": None,
    }


def read_warc_record_at(path: str, byte_offset: int) -> dict:
    """Seek-to-offset single-record read — Common-Crawl-index semantics.

    ``byte_offset`` is the record's start in the UNCOMPRESSED stream, i.e.
    exactly what :func:`iter_warc_records` reported for it (round-4: the
    offsets became true wire offsets; this is the range-fetch consumer —
    dead-letter reprocessing re-reads one record without re-parsing the
    archive). Plain ``.warc``: an O(1) file seek. ``.warc.gz``:
    ``GzipFile.seek`` decompresses forward to the offset — no random
    access without member boundaries (the documented _CountingReader
    limit), but still skips all WARC/HTTP parsing before the target. On an
    object store the plain-warc form maps to an HTTP Range request.
    Raises ``ValueError`` when the offset is not a record boundary.
    """
    with _open_warc(path) as fh:
        fh.seek(byte_offset)
        cr = _CountingReader(fh)
        rec = _next_record(cr, source_file=path)
        if rec is None:
            raise ValueError(f"no record at offset {byte_offset} in {path!r}")
        rec["byte_offset"] = byte_offset + rec["byte_offset"]
        return rec


def read_warc_offsets(
    spark: SparkSession,
    locations: list[tuple[str, int]],
    batch_bytes: int = 32 << 20,
) -> DataFrame:
    """Distributed seek-to-offset re-read of specific records.

    ``locations`` is a list of (path, byte_offset) pairs — e.g. the
    (source_file, byte_offset) columns of rows adjacent to a dead-letter
    defect, or a slice of a Common-Crawl-style index. Offsets are grouped
    per file and visited in ASCENDING order inside one task, so a ``.gz``
    archive pays one forward decompression per file instead of one per
    record; distinct files fan out across tasks like
    :func:`read_warc_paths`. Returns the same WARC_SCHEMA frame
    (``record_index`` is -1: ordinals need a full scan).
    """
    by_file: dict[str, list[int]] = {}
    for p, off in locations:
        p = p[len("file:"):] if p.startswith("file:") else p
        by_file.setdefault(p, []).append(int(off))
    sc = spark.sparkContext
    path_df = spark.createDataFrame(
        [(p, sorted(offs)) for p, offs in by_file.items()],
        StructType(
            [
                StructField("path", StringType(), False),
                StructField("offsets", ArrayType(LongType()), False),
            ]
        ),
    ).repartition(min(len(by_file) or 1, sc.defaultParallelism))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            held = 0
            for path, offs in zip(pdf["path"], pdf["offsets"]):
                with _open_warc(path) as fh:
                    for off in offs:
                        fh.seek(int(off))
                        rec = _next_record(_CountingReader(fh), source_file=path)
                        if rec is None:
                            raise ValueError(
                                f"no record at offset {off} in {path!r}"
                            )
                        rec["byte_offset"] = int(off)
                        rows.append(rec)
                        held += len(rec["html"] or b"")
                        if held >= batch_bytes:
                            yield pd.DataFrame(rows)
                            rows, held = [], 0
            if rows:
                yield pd.DataFrame(rows)

    return path_df.mapInPandas(kernel, schema=WARC_SCHEMA)


def _open_warc(path: str) -> io.BufferedIOBase:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # multi-member streams decode seamlessly
    return open(path, "rb")


def read_warc(
    spark: SparkSession,
    path_glob: str,
    record_types: tuple[str, ...] = ("response",),
    batch_bytes: int = 32 << 20,
    strict: bool = True,
) -> DataFrame:
    """WARC archive glob -> DataFrame in the pipeline input family.

    ``record_types`` keeps only the listed WARC-Type values ('response' by
    default — the crawl payloads); pass ``()`` to keep every record.
    ``strict=False`` turns parse failures into dead-letter rows (see
    :func:`read_warc_paths`).
    """
    paths = sorted(_glob.glob(path_glob))
    if not paths:
        raise FileNotFoundError(f"no WARC files match {path_glob!r}")
    return read_warc_paths(spark, paths, record_types, batch_bytes, strict)


def read_warc_paths(
    spark: SparkSession,
    paths: list[str],
    record_types: tuple[str, ...] = ("response",),
    batch_bytes: int = 32 << 20,
    strict: bool = True,
) -> DataFrame:
    """Same as :func:`read_warc` over an explicit path list (e.g. the paths
    of one streaming micro-batch). ``file:`` URIs are accepted.

    ``strict=True`` (default) re-raises parse errors, failing the task —
    right for fixtures you control. ``strict=False`` is the real-crawl mode:
    corrupt members are routine in archive corpora, and one bad file must
    not kill the job after exhausting task retries. A failing file yields
    its good records up to the defect, then ONE dead-letter row
    (``warc_type='__defect__'``, error text in ``defect``, good rows keep
    ``defect`` null) — the same report-as-data discipline as the REST sink's
    dead-letter rows (rest_sink.py), so defect counts are a ``filter`` away:
    ``df.filter("warc_type = '__defect__'")``.
    """
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
                try:
                    with _open_warc(path) as fh:
                        for rec in iter_warc_records(fh, source_file=path):
                            if keep and rec["warc_type"] not in keep:
                                continue
                            rows.append(rec)
                            held += len(rec["html"] or b"")
                            if held >= batch_bytes:
                                yield pd.DataFrame(rows)
                                rows, held = [], 0
                except (ValueError, OSError, EOFError) as exc:
                    # ValueError: bad boundary/truncation/bad Content-Length;
                    # OSError covers BadGzipFile/IO; EOFError: gzip mid-member
                    if strict:
                        raise
                    rows.append(
                        {
                            "url": None,
                            "warc_ts": None,
                            "html": None,
                            "warc_type": "__defect__",
                            "record_index": -1,
                            "byte_offset": -1,
                            "source_file": path,
                            "defect": f"{type(exc).__name__}: {exc}",
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return path_df.mapInPandas(kernel, schema=WARC_SCHEMA)


def warc_pipeline_input(warc_df: DataFrame) -> DataFrame:
    """Project WARC records to the pipeline's (url, warc_ts, html, text,
    lang) input view (text/lang unknown at ingest — the extract stage fills
    text; lang stays null unless a classifier runs). Dead-letter rows from
    tolerant reads are dropped — they are defect reports, not pages."""
    if "defect" in warc_df.columns:
        warc_df = warc_df.filter(F.col("defect").isNull())
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
