"""WARC (Web ARChive, ISO 28500) source — Common Crawl's container format.

The north_star's input is a Common-Crawl-style table of web pages; this
module is the ingest edge that produces that table from the crawl's native
format. Pure-Python codec from the public spec (no external WARC library):

    record   = "WARC/1.0" CRLF *( header CRLF ) CRLF block CRLF CRLF
    header   = field-name ":" SP field-value
    block    = Content-Length octets

Common Crawl convention: each record is its own gzip MEMBER, so a plain
``zlib`` stream-decoder can iterate members without decompressing the whole
file, and a reader can start at any member boundary. ``response`` records
carry an HTTP/1.1 message (status line + headers + CRLF CRLF + body) as
their block.

Distribution model (the 100 TB shape): WARC files are the unit of
parallelism — a crawl ships ~60k files of ~1 GB; the path list distributes
(``spark.createDataFrame``), and each task streams ONE file member-by-member
through ``mapInPandas``, yielding bounded Arrow batches (never the whole
file as one row). No driver-side reading; adding executors splits the file
list, which is exactly the two-cluster-size scaling axis.

Reference parity: the reference's analogue is its per-file CSV/raster ingest
loop (load_pm25_data.R:9-14); WARC is the graft's webtext-axis equivalent.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CRLF = b"\r\n"

WARC_SCHEMA = T.StructType([
    T.StructField("src_file", T.StringType(), False),
    T.StructField("record_idx", T.LongType(), False),
    T.StructField("warc_type", T.StringType(), False),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("http_content_type", T.StringType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), False),
])


# --------------------------------------------------------------------------
# writer (fixtures + S-sink surface)
# --------------------------------------------------------------------------

def write_warc_record(warc_type: str, url: str | None, date_iso: str,
                      record_id: str, block: bytes,
                      content_type: str = "application/http; msgtype=response"
                      ) -> bytes:
    """Serialize one WARC/1.0 record (uncompressed)."""
    head = [b"WARC/1.0",
            b"WARC-Type: " + warc_type.encode()]
    if url is not None:
        head.append(b"WARC-Target-URI: " + url.encode())
    head += [b"WARC-Date: " + date_iso.encode(),
             b"WARC-Record-ID: <urn:uuid:" + record_id.encode() + b">",
             b"Content-Type: " + content_type.encode(),
             b"Content-Length: " + str(len(block)).encode()]
    return CRLF.join(head) + CRLF + CRLF + block + CRLF + CRLF


def http_response_block(body: bytes, status: int = 200,
                        content_type: str = "text/html; charset=utf-8"
                        ) -> bytes:
    """Wrap a payload in an HTTP/1.1 response message (the block of a WARC
    ``response`` record, per the spec's msgtype=response convention)."""
    return (b"HTTP/1.1 " + str(status).encode() + b" OK" + CRLF
            + b"Content-Type: " + content_type.encode() + CRLF
            + b"Content-Length: " + str(len(body)).encode() + CRLF
            + CRLF + body)


def write_warc_file(path: str, records: Iterable[bytes],
                    member_gzip: bool = True) -> int:
    """Write records to ``path``. ``member_gzip=True`` follows the Common
    Crawl convention (one gzip member per record, mtime pinned to 0 so the
    output bytes are deterministic). Returns the record count."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            if member_gzip:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(rec)
                f.write(buf.getvalue())
            else:
                f.write(rec)
            n += 1
    return n


def ensure_pages_warc(dirpath: str, n_pages: int, n_files: int) -> list[str]:
    """Deterministic WARC fixture: the synthetic pages serialized as
    ``n_files`` member-gzip'd WARC files (each with a leading ``warcinfo``
    record and a ``metadata`` record every 64 responses, like a real crawl
    segment). Idempotent — files are only written if absent; bytes are a
    pure function of the page ids (gzip mtime pinned)."""
    import os

    import numpy as np

    from .pages import _gen_pages
    # cache keyed by the generation parameters: a changed page/file count
    # lands in a fresh subdirectory instead of silently reusing stale
    # fixture bytes
    dirpath = os.path.join(dirpath, f"n{n_pages}_f{n_files}")
    os.makedirs(dirpath, exist_ok=True)
    paths = [os.path.join(dirpath, f"part-{i:03d}.warc.gz")
             for i in range(n_files)]
    if all(os.path.exists(p) for p in paths):
        return paths
    per = n_pages // n_files
    for fi, path in enumerate(paths):
        ids = np.arange(fi * per, (fi + 1) * per, dtype=np.int64)
        pdf = next(_gen_pages([pd.DataFrame({"id": ids})]))
        recs = [write_warc_record(
            "warcinfo", None, "2021-01-01T00:00:00Z", f"info-{fi}",
            b"software: air-health-gis-tools-spark fixture\r\n",
            content_type="application/warc-fields")]
        for k in range(len(pdf)):
            row = pdf.iloc[k]
            date_iso = pd.Timestamp(row["warc_ts"]).strftime(
                "%Y-%m-%dT%H:%M:%SZ")
            recs.append(write_warc_record(
                "response", row["url"], date_iso,
                f"resp-{int(ids[k])}",
                http_response_block(bytes(row["html"]))))
            if k % 64 == 63:
                recs.append(write_warc_record(
                    "metadata", row["url"], date_iso,
                    f"meta-{int(ids[k])}",
                    b"fetchTimeMs: 7\r\n",
                    content_type="application/warc-fields"))
        write_warc_file(path, recs)
    return paths


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------

def _iter_gzip_members(raw: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member-by-member."""
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(raw[pos:])
        yield out
        rest = d.unused_data
        if not rest:
            break
        pos = len(raw) - len(rest)


def _parse_records(data: bytes) -> Iterator[dict]:
    """Iterate WARC records in an uncompressed byte stream."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].split(CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"not a WARC record at offset {pos}: {lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        length = int(headers["content-length"])
        block_start = hdr_end + 4
        block = data[block_start:block_start + length]
        yield {"headers": headers, "block": block}
        pos = block_start + length


def parse_warc_bytes(raw: bytes) -> Iterator[dict]:
    """Parse a WARC file's bytes: member-gzip, whole-file gzip, or plain."""
    if raw[:2] == b"\x1f\x8b":
        for member in _iter_gzip_members(raw):
            yield from _parse_records(member)
    else:
        yield from _parse_records(raw)


def split_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP/1.1 response message."""
    sep = block.find(CRLF + CRLF)
    if sep < 0:
        return None, None, block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(CRLF)
    status = None
    if lines and lines[0].startswith(b"HTTP/"):
        parts = lines[0].split(b" ")
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode()
    return status, ctype, body


def _iter_gzip_members_file(f, chunk_size: int = 1 << 20) -> Iterator[bytes]:
    """Stream gzip members from an OPEN file handle: at most one compressed
    chunk + one decompressed member in memory at a time — the whole file is
    never read at once (ADVICE r3). Common Crawl's member-per-record layout
    makes the peak = one record."""
    d = zlib.decompressobj(wbits=31)
    parts: list[bytes] = []
    while True:
        chunk = f.read(chunk_size)
        if not chunk:
            break
        data = chunk
        while data:
            parts.append(d.decompress(data))
            if d.eof:                      # member boundary
                yield b"".join(parts)
                parts = []
                data = d.unused_data
                d = zlib.decompressobj(wbits=31)
            else:
                data = b""
    tail = b"".join(parts)
    if tail:
        yield tail


def _iter_records_chunks(chunks: Iterator[bytes]) -> Iterator[dict]:
    """Incremental record parser over decompressed byte chunks: complete
    records are yielded as soon as their bytes arrive; only the unfinished
    suffix is buffered across chunk boundaries.

    Linear-cost buffering (r4 review): chunks accumulate in a LIST and are
    joined only when enough bytes for the pending record have arrived
    (``need`` tracks the incomplete record's total size once its header is
    parsed) — a record spanning K chunks costs one join, not K re-joins of
    a growing buffer (which made a 1 GB record O(n²) memcpy)."""
    parts: list[bytes] = []
    size = 0
    need = 1               # bytes (from buffer start) before re-parsing
    for chunk in chunks:
        parts.append(chunk)
        size += len(chunk)
        if size < need:
            continue
        buf = b"".join(parts)
        pos = 0
        n = len(buf)
        need = 1
        while True:
            while buf[pos:pos + 2] == CRLF:
                pos += 2
            hdr_end = buf.find(CRLF + CRLF, pos)
            if hdr_end < 0:            # header incomplete: wait for more
                need = (n - pos) + 1
                break
            lines = buf[pos:hdr_end].split(CRLF)
            if not lines or not lines[0].startswith(b"WARC/"):
                raise ValueError(
                    f"not a WARC record at offset {pos}: {lines[0][:40]!r}")
            headers: dict[str, str] = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(b":")
                headers[k.strip().decode().lower()] = v.strip().decode()
            block_start = hdr_end + 4
            block_end = block_start + int(headers["content-length"])
            if block_end > n:          # record incomplete: wait for it
                need = (block_end - pos)
                break
            yield {"headers": headers,
                   "block": buf[block_start:block_end]}
            pos = block_end
        parts = [buf[pos:]] if pos < n else []
        size = n - pos
    # EOF with leftover bytes: replay the whole-buffer parser so a
    # truncated final record behaves EXACTLY like _parse_records on the
    # same bytes (complete header + short body → clamped block; header
    # incomplete → dropped) — parity with the pre-streaming reader
    if size:
        yield from _parse_records(b"".join(parts))


def _stream_records(path: str) -> Iterator[dict]:
    """Stream records from one WARC file (gzip or plain), bounded memory."""
    with open(path, "rb") as f:
        magic = f.read(2)
        f.seek(0)
        if magic == b"\x1f\x8b":
            chunks = _iter_gzip_members_file(f)
        else:
            chunks = iter(lambda: f.read(1 << 20), b"")
        yield from _iter_records_chunks(chunks)


def _record_row(path: str, i: int, rec: dict) -> dict:
    h = rec["headers"]
    status = http_ctype = None
    body = None
    if h.get("warc-type") == "response":
        status, http_ctype, body = split_http_response(rec["block"])
    ts = h.get("warc-date")
    return {
        "src_file": path,
        "record_idx": i,
        "warc_type": h.get("warc-type", ""),
        "record_id": h.get("warc-record-id"),
        "url": h.get("warc-target-uri"),
        "warc_ts": pd.Timestamp(ts).tz_localize(None) if ts else None,
        "content_type": h.get("content-type"),
        "http_status": status,
        "http_content_type": http_ctype,
        "html": body,
        "n_bytes": len(rec["block"]),
    }


_COLUMNS = [f.name for f in WARC_SCHEMA.fields]


def _records_pdf_chunks(path: str,
                        chunk_rows: int = 256) -> Iterator[pd.DataFrame]:
    """Bounded Arrow batches from one file: records stream off disk and
    flush every ``chunk_rows`` rows — a 1 GB crawl file never materializes
    as one DataFrame (ADVICE r3)."""
    rows: list[dict] = []
    for i, rec in enumerate(_stream_records(path)):
        rows.append(_record_row(path, i, rec))
        if len(rows) >= chunk_rows:
            yield pd.DataFrame(rows, columns=_COLUMNS)
            rows = []
    if rows:
        yield pd.DataFrame(rows, columns=_COLUMNS)


def read_warc(spark: SparkSession, paths: list[str],
              responses_only: bool = False) -> DataFrame:
    """Distributed WARC scan: one task per file (executor-side streaming;
    the driver never touches record bytes)."""
    files = spark.createDataFrame([(p,) for p in sorted(paths)],
                                  "path string").repartition(len(paths))

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                yield from _records_pdf_chunks(p)

    df = files.mapInPandas(_scan, WARC_SCHEMA)
    if responses_only:
        df = df.filter(df.warc_type == "response")
    return df
