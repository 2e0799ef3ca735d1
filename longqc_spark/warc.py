"""WARC (Web ARChive, ISO 28500) container source — Common Crawl's native
on-disk format.

A ``.warc`` file is a concatenation of records::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: https://host/path\r\n
    WARC-Date: 2026-08-19T00:00:00Z\r\n
    Content-Type: application/http; msgtype=response\r\n
    Content-Length: <n>\r\n
    \r\n
    <n bytes of block>\r\n
    \r\n

For ``response`` records the block is an HTTP/1.1 response (status line +
headers + body). A ``.warc.gz`` is a concatenation of per-record gzip
members, so any member boundary is a valid split point — that is what makes
the format scan-parallel at crawl scale.

Reference analog: LongQC's whole-container scans (fast5 directory reads,
``lq_nanopore.py``; bam via pysam in ``lq_coverage``) — a binary container
whose records are split and decoded executor-side. Here the container is
the web-native one.

Scale posture: the distributed scan is ``spark.read.format("binaryFile")``
(one task per WARC file — Common Crawl ships ~1 GiB gzip files, the same
granularity CC's own example jobs use) feeding a ``mapInPandas`` splitter,
so record parsing is pure-Python-per-*file* but streams rows out through
Arrow batches; nothing is collected and no shuffle is introduced. Memory
per task is bounded by one decompressed file. For larger-than-memory
members, the per-record gzip framing means a real cluster can pre-split on
member boundaries; that framing is what ``gzip_members=True`` writes.

Everything below is stdlib-only (``zlib``/``gzip``): no external WARC
library exists in this image, and none is needed — the framing is ~40
lines each way.
"""

from __future__ import annotations

import gzip
import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _warc_date(ts_epoch: int) -> str:
    return datetime.fromtimestamp(int(ts_epoch), tz=timezone.utc).strftime(_DATE_FMT)


def encode_record(
    url: str,
    ts_epoch: int,
    payload: bytes,
    warc_type: str = "response",
    content_type: str = "text/html; charset=utf-8",
    http_status: int = 200,
) -> bytes:
    """One WARC record as bytes. ``response`` records wrap the payload in an
    HTTP/1.1 response block; other types carry the payload verbatim."""
    if warc_type == "response":
        status_line = f"HTTP/1.1 {http_status} " + (
            "OK" if http_status == 200 else "X"
        )
        block = (
            status_line.encode("ascii")
            + _CRLF
            + f"Content-Type: {content_type}".encode("ascii")
            + _CRLF
            + f"Content-Length: {len(payload)}".encode("ascii")
            + _CRLF
            + _CRLF
            + payload
        )
        block_ct = "application/http; msgtype=response"
    else:
        block = payload
        block_ct = content_type
    headers = [
        _WARC_VERSION,
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Target-URI: " + url.encode("ascii"),
        b"WARC-Date: " + _warc_date(ts_epoch).encode("ascii"),
        b"Content-Type: " + block_ct.encode("ascii"),
        b"Content-Length: " + str(len(block)).encode("ascii"),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + block + _CRLF + _CRLF


def encode_warc(
    records: Iterable[tuple[str, int, bytes]],
    gzip_members: bool = True,
    warcinfo: bool = True,
) -> bytes:
    """Encode ``(url, ts_epoch, payload)`` triples into one WARC file's
    bytes. ``gzip_members=True`` emits the Common-Crawl ``.warc.gz`` framing
    (one gzip member per record — splittable); ``False`` emits plain WARC.
    ``warcinfo`` prepends the customary non-response header record, which
    readers must skip."""
    chunks: list[bytes] = []
    if warcinfo:
        info = encode_record(
            "urn:warcinfo",
            0,
            b"software: longqc-spark\r\n",
            warc_type="warcinfo",
            content_type="application/warc-fields",
        )
        chunks.append(info)
    for url, ts_epoch, payload in records:
        chunks.append(encode_record(url, ts_epoch, payload))
    if gzip_members:
        # mtime=0 keeps the bytes deterministic (gzip stamps mtime otherwise)
        return b"".join(
            gzip.compress(c, compresslevel=6, mtime=0) for c in chunks
        )
    return b"".join(chunks)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz framing)."""
    out: list[bytes] = []
    while data:
        d = zlib.decompressobj(wbits=47)  # 47 = auto gzip/zlib header
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("truncated gzip member in WARC file")
        data = d.unused_data
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record:
    ``{warc_type, url, ts_epoch, http_status, content_type, body, offset}``.
    ``body`` is the HTTP payload bytes for response records, the raw block
    otherwise (then ``http_status`` is None). Strict: malformed framing
    raises ``ValueError`` rather than silently resyncing."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC record start at offset {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header at offset {pos}")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("ascii").strip().lower()] = v.decode(
                "utf-8", "replace"
            ).strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"missing Content-Length at offset {pos}") from e
        block_start = hdr_end + 4
        block = data[block_start : block_start + clen]
        if len(block) != clen:
            raise ValueError(f"truncated WARC block at offset {pos}")
        warc_type = headers.get("warc-type", "")
        rec: dict = {
            "warc_type": warc_type,
            "url": headers.get("warc-target-uri"),
            "ts_epoch": None,
            "http_status": None,
            "content_type": headers.get("content-type"),
            "body": block,
            "offset": pos,
        }
        wd = headers.get("warc-date")
        if wd:
            rec["ts_epoch"] = int(
                datetime.strptime(wd, _DATE_FMT)
                .replace(tzinfo=timezone.utc)
                .timestamp()
            )
        if warc_type == "response" and block[:5] == b"HTTP/":
            http_end = block.find(_CRLF + _CRLF)
            if http_end < 0:
                raise ValueError(f"unterminated HTTP header at offset {pos}")
            http_lines = block[:http_end].split(_CRLF)
            rec["http_status"] = int(http_lines[0].split(b" ")[1])
            for line in http_lines[1:]:
                k, _, v = line.partition(b":")
                if k.decode("ascii").strip().lower() == "content-type":
                    rec["content_type"] = v.decode("ascii", "replace").strip()
            rec["body"] = block[http_end + 4 :]
        yield rec
        pos = block_start + clen + 4  # skip trailing \r\n\r\n


# ---------------------------------------------------------------------------
# distributed scan
# ---------------------------------------------------------------------------

SCAN_SCHEMA = (
    "warc_file string, rec_index int, url string, warc_ts timestamp, "
    "http_status int, content_type string, html binary"
)


def scan_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    glob: str = "*.warc*",
) -> DataFrame:
    """Distributed WARC scan → the input_hint page shape
    ``(url, warc_ts, html, ...)``. One binaryFile task per WARC file;
    splitting + HTTP unwrap run executor-side in a mapInPandas splitter
    and stream out as Arrow batches."""
    import pandas as pd

    types = tuple(record_types)

    def split(batches):
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                rows: dict[str, list] = {
                    "warc_file": [],
                    "rec_index": [],
                    "url": [],
                    "warc_ts": [],
                    "http_status": [],
                    "content_type": [],
                    "html": [],
                }
                for i, rec in enumerate(iter_warc_records(bytes(content))):
                    if rec["warc_type"] not in types:
                        continue
                    rows["warc_file"].append(fname)
                    rows["rec_index"].append(i)
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(
                        pd.Timestamp(rec["ts_epoch"], unit="s")
                        if rec["ts_epoch"] is not None
                        else pd.NaT
                    )
                    rows["http_status"].append(rec["http_status"])
                    rows["content_type"].append(rec["content_type"])
                    rows["html"].append(rec["body"])
                if rows["url"]:
                    yield pd.DataFrame(rows)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(split, schema=SCAN_SCHEMA)


def write_warc_files(
    records: list[tuple[str, int, bytes]],
    out_dir: str,
    n_files: int = 3,
    gzip_members: bool = True,
) -> list[str]:
    """Test-fixture writer: shard records round-robin into ``n_files`` WARC
    files under ``out_dir``. Driver-side by design — production writes go
    through the lineage-committed parquet sink; WARC is an *input* format."""
    import os

    paths = []
    ext = ".warc.gz" if gzip_members else ".warc"
    for f in range(n_files):
        shard = [r for i, r in enumerate(records) if i % n_files == f]
        p = os.path.join(out_dir, f"part-{f:05d}{ext}")
        with open(p, "wb") as fh:
            fh.write(encode_warc(shard, gzip_members=gzip_members))
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# oracled round-trip (encode → split → decode, all executor-side)
# ---------------------------------------------------------------------------

_RT_SCHEMA = (
    "url string, ts_epoch bigint, http_status int, n_bytes bigint, payload binary"
)


def warc_roundtrip(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts_epoch",
    payload_col: str = "payload",
    gzip_members: bool = True,
) -> DataFrame:
    """Encode each Arrow batch into one in-memory ``.warc.gz`` blob, then
    split + decode it back to rows — the full codec path, distributed,
    narrow (no shuffle), verifiable against a plain-SQL oracle because
    decode(encode(x)) must reproduce x byte-for-byte."""
    import pandas as pd

    def codec(batches):
        for pdf in batches:
            recs = [
                (u, int(t), bytes(p))
                for u, t, p in zip(pdf[url_col], pdf[ts_col], pdf[payload_col])
            ]
            if not recs:
                continue
            blob = encode_warc(recs, gzip_members=gzip_members)
            out: dict[str, list] = {
                "url": [],
                "ts_epoch": [],
                "http_status": [],
                "n_bytes": [],
                "payload": [],
            }
            for rec in iter_warc_records(blob):
                if rec["warc_type"] != "response":
                    continue
                out["url"].append(rec["url"])
                out["ts_epoch"].append(rec["ts_epoch"])
                out["http_status"].append(rec["http_status"])
                out["n_bytes"].append(len(rec["body"]))
                out["payload"].append(rec["body"])
            yield pd.DataFrame(out)

    cols = [F.col(url_col), F.col(ts_col), F.col(payload_col)]
    return df.select(*cols).mapInPandas(codec, schema=_RT_SCHEMA)
