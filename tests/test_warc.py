"""WARC source: parser unit tests + Spark read + pipeline-input handoff."""

import gzip
import io
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from infoscience_imports_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_pipeline_input,
    write_warc,
)

RECORDS = [
    {
        "url": f"https://example.org/page/{i}",
        "warc_ts": pd.Timestamp("2026-03-01T08:00:00Z") + pd.Timedelta(minutes=i),
        "html": (
            f'<html><body><main id="content"><p>document {i} body text</p>'
            "</main></body></html>"
        ).encode(),
    }
    for i in range(7)
]


def _warc_bytes(records) -> bytes:
    buf = io.BytesIO()
    write_warc(records, buf)
    return buf.getvalue()


def test_roundtrip_single_file_parser():
    out = list(iter_warc_records(io.BytesIO(_warc_bytes(RECORDS)), "mem"))
    assert len(out) == len(RECORDS)
    for rec, src in zip(out, RECORDS):
        assert rec["url"] == src["url"]
        assert rec["warc_type"] == "response"
        assert rec["html"] == src["html"]  # HTTP envelope stripped
        assert rec["warc_ts"] == src["warc_ts"].tz_convert("UTC").tz_localize(None)
    assert [r["record_index"] for r in out] == list(range(len(RECORDS)))
    # byte_offset = actual position of each record's "WARC/" line
    blob = _warc_bytes(RECORDS)
    expect, pos = [], blob.find(b"WARC/")
    while pos >= 0:
        expect.append(pos)
        pos = blob.find(b"WARC/", pos + 1)
    assert [r["byte_offset"] for r in out] == expect


def test_parser_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="boundary"):
        list(iter_warc_records(io.BytesIO(b"NOT A WARC\r\n\r\n")))
    good = _warc_bytes(RECORDS[:1])
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(io.BytesIO(good[:-20])))


def _response_record(url: str, http: bytes) -> bytes:
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "WARC-Date: 2026-03-01T00:00:00Z\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode("ascii")
    return head + http + b"\r\n\r\n"


def test_http_envelope_chunked_and_compressed():
    """Real crawl captures are wire-format: chunked and/or gzip/deflate
    bodies must decode to the same html the server rendered."""
    import zlib

    body = b"<html><p>wire format body</p></html>"
    gz = gzip.compress(body)
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        + b"a\r\n" + body[:10] + b"\r\n"
        + hex(len(body) - 10)[2:].encode() + b"\r\n" + body[10:] + b"\r\n"
        + b"0\r\n\r\n"
    )
    gzipped = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz
    # chunked THEN gzipped (transfer coding wraps content coding)
    both = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        + hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    )
    raw_deflate = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
        + zlib.compress(body)[2:-4]  # the raw-deflate server bug
    )
    unsupported = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nBRBYTES"
    blob = b"".join(
        _response_record(f"https://x.example/{i}", http)
        for i, http in enumerate([chunked, gzipped, both, raw_deflate, unsupported])
    )
    out = list(iter_warc_records(io.BytesIO(blob)))
    assert [r["html"] for r in out[:4]] == [body] * 4
    assert out[4]["html"] == b"BRBYTES"  # no br codec: raw body, not a crash


def test_tolerant_read_dead_letters_corrupt_archives(spark, tmp_path):
    """VERDICT r3 #6: one corrupt archive must not kill the job — tolerant
    mode keeps the good records parsed before the defect and reports the
    failure as a dead-letter row."""
    from infoscience_imports_spark.sources.warc import read_warc_paths

    good = tmp_path / "good.warc"
    good.write_bytes(_warc_bytes(RECORDS[:3]))
    # 2 good records, then a truncated third
    partial = tmp_path / "partial.warc"
    partial.write_bytes(_warc_bytes(RECORDS[3:6])[:-40])
    # not WARC at all
    junk = tmp_path / "junk.warc"
    junk.write_bytes(b"certainly not a warc file")
    paths = [str(good), str(partial), str(junk)]

    with pytest.raises(Exception):  # strict default still fails the job
        read_warc_paths(spark, paths).count()

    df = read_warc_paths(spark, paths, strict=False).cache()
    defects = {r["source_file"]: r["defect"] for r in df.filter("warc_type = '__defect__'").collect()}
    assert set(defects) == {str(partial), str(junk)}
    assert "truncated" in defects[str(partial)]
    ok = df.filter("defect IS NULL")
    assert ok.count() == 5  # 3 from good + 2 parsed before the truncation
    assert ok.filter(F.col("source_file") == str(partial)).count() == 2
    df.unpersist()


def test_non_response_records_keep_raw_payload():
    blob = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Date: 2026-03-01T00:00:00Z\r\n"
        b"Content-Length: 9\r\n"
        b"\r\n"
        b"info body"
        b"\r\n\r\n"
    ) + _warc_bytes(RECORDS[:2])
    out = list(iter_warc_records(io.BytesIO(blob)))
    assert [r["warc_type"] for r in out] == ["warcinfo", "response", "response"]
    assert out[0]["html"] == b"info body"  # no HTTP envelope to strip
    assert out[0]["url"] is None


def test_spark_read_plain_and_gzip(spark, tmp_path):
    # file 1: plain .warc; file 2: member-per-record .warc.gz (Common Crawl
    # convention: each record its own gzip member, concatenated)
    (tmp_path / "a.warc").write_bytes(_warc_bytes(RECORDS[:4]))
    with open(tmp_path / "b.warc.gz", "wb") as f:
        for rec in RECORDS[4:]:
            f.write(gzip.compress(_warc_bytes([rec])))

    df = read_warc(spark, os.path.join(str(tmp_path), "*.warc*"))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == len(RECORDS)
    for src in RECORDS:
        got = rows[src["url"]]
        assert bytes(got["html"]) == src["html"]
        assert got["warc_ts"] == src["warc_ts"].tz_convert("UTC").tz_localize(None)
        assert got["warc_type"] == "response"
    # both files contributed, and offsets restart per file
    assert {os.path.basename(r["source_file"]) for r in rows.values()} == {
        "a.warc",
        "b.warc.gz",
    }

    # record-type filter: () keeps everything (here: all responses anyway)
    assert read_warc(spark, os.path.join(str(tmp_path), "*.warc*"), record_types=()).count() == 7


def test_warc_feeds_the_pipeline_input_contract(spark, tmp_path):
    (tmp_path / "c.warc").write_bytes(_warc_bytes(RECORDS))
    inp = warc_pipeline_input(read_warc(spark, str(tmp_path / "c.warc")))
    assert inp.columns == ["url", "warc_ts", "html", "text", "lang"]
    # the extract stage's exact transformation applies cleanly
    from infoscience_imports_spark.functions.text import (
        extract_text_col,
        normalize_text_col,
    )

    texts = inp.select(
        normalize_text_col(extract_text_col(F.col("html"))).alias("t")
    ).collect()
    assert sorted(r["t"] for r in texts) == sorted(
        f"document {i} body text" for i in range(len(RECORDS))
    )


def test_missing_glob_raises(spark):
    with pytest.raises(FileNotFoundError):
        read_warc(spark, "/nonexistent/dir/*.warc")


def test_warc_streaming_incremental_dedup(spark, tmp_path):
    """WARC archives landing in a dir stream through the incremental dedup:
    paths-only binaryFile stream, Arrow-kernel parse, digest state across
    batches."""
    import shutil
    import tempfile

    from infoscience_imports_spark.config import DedupConfig
    from infoscience_imports_spark.streaming.incremental import IncrementalDedup

    def page(i, tag=""):
        body = " ".join(f"w{i}x{j}" for j in range(30))
        return {
            "url": f"https://stream.example/{i}{tag}",
            "warc_ts": pd.Timestamp("2026-03-02T00:00:00Z"),
            "html": f'<main id="content"><p>{body}</p></main>'.encode(),
        }

    in_dir = tempfile.mkdtemp(prefix="warc-stream-")
    state = tempfile.mkdtemp(prefix="warc-state-")
    with open(os.path.join(in_dir, "w0.warc"), "wb") as f:
        write_warc(iter([page(i) for i in range(12)]), f)

    inc = IncrementalDedup(spark, state, DedupConfig(shuffle_partitions=8), n_state_buckets=8)
    q = inc.start_warc(in_dir)
    q.awaitTermination(300)
    assert inc.unique_docs().count() == 12

    # second wave: 4 new pages + 6 exact re-crawls -> only the 4 admitted
    with open(os.path.join(in_dir, "w1.warc"), "wb") as f:
        write_warc(iter([page(i) for i in range(12, 16)] + [page(i, "-re") for i in range(6)]), f)
    inc.checkpoint_dir = inc.checkpoint_dir  # same checkpoint: only new files picked up
    q2 = inc.start_warc(in_dir)
    q2.awaitTermination(300)
    assert inc.unique_docs().count() == 16  # re-crawled bodies (new urls, same text) rejected

    shutil.rmtree(in_dir)
    shutil.rmtree(state)


def test_seek_to_offset_rereads_exactly_one_record(tmp_path):
    """Round-5 verdict #5: the true byte_offset supports seek-to-offset
    single-record re-reads (Common-Crawl-index semantics) — plain and gzip."""
    from infoscience_imports_spark.sources.warc import read_warc_record_at

    blob = _warc_bytes(RECORDS)
    plain = tmp_path / "a.warc"
    plain.write_bytes(blob)
    gz = tmp_path / "a.warc.gz"
    with gzip.open(gz, "wb") as f:
        f.write(blob)

    scanned = list(iter_warc_records(io.BytesIO(blob), "mem"))
    target = scanned[3]
    for path in (str(plain), str(gz)):
        rec = read_warc_record_at(path, target["byte_offset"])
        assert rec["url"] == RECORDS[3]["url"]
        assert rec["html"] == RECORDS[3]["html"]
        assert rec["byte_offset"] == target["byte_offset"]
        assert rec["record_index"] == -1  # ordinal needs a full scan

    # a non-boundary offset must fail loudly, not return garbage
    with pytest.raises(ValueError, match="boundary"):
        read_warc_record_at(str(plain), target["byte_offset"] + 1)


def test_read_warc_offsets_distributed_reread(spark, tmp_path):
    """Distributed (path, offset) re-read: one forward pass per gz file,
    rows match the full-scan records they point at."""
    from infoscience_imports_spark.sources.warc import read_warc_offsets

    blob = _warc_bytes(RECORDS)
    p1 = tmp_path / "one.warc"
    p1.write_bytes(blob)
    p2 = tmp_path / "two.warc.gz"
    with gzip.open(p2, "wb") as f:
        f.write(blob)
    scanned = list(iter_warc_records(io.BytesIO(blob), "mem"))
    # unsorted on purpose — the kernel must sort per file for one gz pass
    locs = [
        (str(p1), scanned[5]["byte_offset"]),
        (str(p2), scanned[4]["byte_offset"]),
        (str(p1), scanned[1]["byte_offset"]),
        (str(p2), scanned[0]["byte_offset"]),
    ]
    got = read_warc_offsets(spark, locs).collect()
    by_key = {(r["source_file"], r["byte_offset"]): r for r in got}
    assert len(got) == 4
    for path, off in locs:
        idx = next(i for i, s in enumerate(scanned) if s["byte_offset"] == off)
        r = by_key[(path, off)]
        assert r["url"] == RECORDS[idx]["url"]
        assert bytes(r["html"]) == RECORDS[idx]["html"]
