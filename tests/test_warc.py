"""WARC container source (SURVEY.md §2.1 S3/S4 analog — the web-native
multi-record binary container, as fast5/bam are the reference's:
``lq_nanopore.py`` whole-container reads). Pure-stdlib codec, binaryFile
scan, strict framing errors, and the distributed round-trip."""

import gzip

import pytest

from longqc_spark.warc import (
    encode_record,
    encode_warc,
    iter_warc_records,
    scan_warc,
    warc_roundtrip,
    write_warc_files,
)

RECS = [
    ("https://a.example/x", 1700000000, "hello <b>world</b>".encode()),
    ("https://b.example/y?q=1", 1700000007, bytes(range(256))),  # binary-safe
    ("https://a.example/z", 1700009999, b""),  # empty body
]


def _responses(data):
    return [r for r in iter_warc_records(data) if r["warc_type"] == "response"]


@pytest.mark.parametrize("gz", [False, True])
def test_codec_roundtrip(gz):
    data = encode_warc(RECS, gzip_members=gz)
    recs = list(iter_warc_records(data))
    # warcinfo header record present and typed
    assert recs[0]["warc_type"] == "warcinfo"
    got = _responses(data)
    assert [(r["url"], r["ts_epoch"], r["body"]) for r in got] == RECS
    assert all(r["http_status"] == 200 for r in got)
    assert got[0]["content_type"] == "text/html; charset=utf-8"


def test_gzip_members_are_concatenated_and_deterministic():
    data = encode_warc(RECS, gzip_members=True)
    # starts with gzip magic; more than one member (member 2 starts with
    # magic too somewhere past the first)
    assert data[:2] == b"\x1f\x8b"
    assert data.index(b"\x1f\x8b", 2) > 0
    # deterministic bytes (mtime pinned) — required for lineage resume
    assert data == encode_warc(RECS, gzip_members=True)
    # a plain gzip.decompress only yields the FIRST member's records via
    # stdlib semantics is not relied on: our reader walks all members
    assert len(_responses(data)) == 3


def test_strict_framing_errors():
    data = encode_warc(RECS, gzip_members=False)
    with pytest.raises(ValueError, match="truncated WARC block"):
        list(iter_warc_records(data[:-10]))
    with pytest.raises(ValueError, match="bad WARC record start"):
        list(iter_warc_records(b"JUNK" + data))
    gz = encode_warc(RECS, gzip_members=True)
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(iter_warc_records(gz[:-4]))
    bad = encode_record("u", 0, b"x").replace(b"Content-Length", b"X-Nope")
    with pytest.raises(ValueError, match="missing Content-Length"):
        list(iter_warc_records(bad))


def test_non_response_records_kept_raw():
    req = encode_record(
        "https://a.example/x",
        1700000000,
        b"GET /x HTTP/1.1\r\n\r\n",
        warc_type="request",
        content_type="application/http; msgtype=request",
    )
    (rec,) = list(iter_warc_records(req))
    assert rec["warc_type"] == "request"
    assert rec["http_status"] is None
    assert rec["body"].startswith(b"GET /x")


@pytest.mark.parametrize("gz", [False, True])
def test_scan_warc_binaryfile(spark, tmp_path, gz):
    """Distributed scan over a sharded WARC directory: every response
    record surfaces exactly once with url/ts/status/body intact, request +
    warcinfo records are filtered, and Spark agrees with a direct driver
    decode of the same files."""
    recs = [
        (f"https://h{i % 4}.example/p{i}", 1700000000 + i, f"body {i} é".encode())
        for i in range(23)
    ]
    paths = write_warc_files(recs, str(tmp_path), n_files=3, gzip_members=gz)
    assert len(paths) == 3
    df = scan_warc(spark, str(tmp_path))
    rows = df.orderBy("url").collect()
    assert [(r["url"], bytes(r["html"])) for r in rows] == sorted(
        [(u, b) for u, _, b in recs]
    )
    assert all(r["http_status"] == 200 for r in rows)
    # timestamps decode to the exact instants (UTC session tz)
    got_ts = {r["url"]: int(r["warc_ts"].timestamp()) for r in rows}
    assert got_ts == {u: t for u, t, _ in recs}
    # direct decode equality (Spark-vs-driver, the multimodal convention)
    direct = []
    for p in paths:
        with open(p, "rb") as fh:
            direct += [
                (r["url"], r["body"])
                for r in iter_warc_records(fh.read())
                if r["warc_type"] == "response"
            ]
    assert sorted(direct) == [(r["url"], bytes(r["html"])) for r in rows]


def test_scan_warc_record_index_and_types(spark, tmp_path):
    """rec_index counts ALL records in the file (so offsets are auditable);
    record_types opt-in surfaces non-response records too."""
    p = tmp_path / "one.warc"
    body = encode_warc(RECS[:2], gzip_members=False, warcinfo=True)
    p.write_bytes(body)
    df = scan_warc(spark, str(tmp_path), record_types=("response", "warcinfo"))
    rows = df.orderBy("rec_index").collect()
    assert [r["warc_type"] if False else r["rec_index"] for r in rows] == [0, 1, 2]
    assert rows[0]["url"] == "urn:warcinfo"


def test_warc_roundtrip_distributed(spark):
    """The oracled-query building block: encode→decode inside one
    mapInPandas stage reproduces every byte at any partitioning."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "url": [f"https://h.example/{i}" for i in range(50)],
            "ts_epoch": [1700000000 + 97 * i for i in range(50)],
            "payload": [f"p{i}\n".encode() * (i % 5) for i in range(50)],
        }
    )
    df = spark.createDataFrame(pdf).repartition(7)
    out = warc_roundtrip(df).orderBy("url").collect()
    exp = pdf.sort_values("url").reset_index(drop=True)
    assert [r["url"] for r in out] == list(exp["url"])
    assert [r["ts_epoch"] for r in out] == list(exp["ts_epoch"])
    assert [bytes(r["payload"]) for r in out] == list(exp["payload"])
    assert [r["n_bytes"] for r in out] == [len(b) for b in exp["payload"]]


def test_warc_gz_interops_with_stdlib_gzip(tmp_path):
    """Our members are plain gzip: stdlib GzipFile reads the whole stream
    (it transparently walks concatenated members on read())."""
    data = encode_warc(RECS, gzip_members=True)
    p = tmp_path / "x.warc.gz"
    p.write_bytes(data)
    with gzip.open(p, "rb") as fh:
        plain = fh.read()
    assert plain == encode_warc(RECS, gzip_members=False)
