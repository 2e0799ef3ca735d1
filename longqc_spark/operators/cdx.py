"""CDX(J) crawl-index support: SURT url keys and index-line parsing.

Common Crawl publishes a CDXJ index next to each crawl's WARC files: one
text line per capture, ``<urlkey> <14-digit timestamp> <JSON payload>``,
where ``urlkey`` is the SURT (Sort-friendly URI Reordering Transform) of
the capture URL — ``https://www.Example.com/A?b=2&a=1`` →
``com,example)/a?a=1&b=2`` — so captures of one page sort together across
hosts' subdomains and query-param orderings.

SURT subset implemented (documented deviations from pywb's full
canonicalizer: no session-param stripping, no IDN/percent-decoding —
those are corpus-policy choices layered on top):
  lowercase everything → drop scheme + userinfo → drop a leading
  ``www<digits>.`` label → drop default ports (:80/:443; others kept) →
  host labels reversed and comma-joined → ``)`` → path (``/`` when
  empty) → query params sorted, ``?``-joined when present (fragment
  dropped).

Everything is Spark built-ins (one JVM map, no Python): the key is
usable as a partition/sort key for crawl-scale bucketing, which is its
point — CDX consumers range-scan by urlkey prefix.

Reference analog: the per-read index/stat tables the reference emits
alongside containers (``lq_utils.py`` TSV sidecars) — a sorted sidecar
index over a binary container, here the web-native one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CDX_JSON_SCHEMA = (
    "url string, mime string, status int, digest string, length bigint, "
    "offset bigint, filename string"
)


def surt_key_expr(url_col: str = "url") -> Column:
    """SURT url key as a pure-JVM column expression; NULL for NULL or
    unparseable (hostless) input."""
    u = F.lower(F.col(url_col))
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    hostport = F.regexp_replace(
        F.regexp_extract(rest, r"^([^/?#]*)", 1), r"^[^@]*@", ""
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\d*\.", "")
    revhost = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.when(port.isin("", "80", "443"), "").otherwise(
            F.concat(F.lit(":"), port)
        ),
    )
    pathq = F.regexp_extract(rest, r"^[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    key = F.concat(
        revhost,
        F.lit(")"),
        F.when(path == "", "/").otherwise(path),
        F.when(query == "", "").otherwise(F.concat(F.lit("?"), qsorted)),
    )
    bad_host = (host == "") | ~host.rlike(r"^[a-z0-9.\-]+$")
    return F.when(F.col(url_col).isNull() | bad_host, None).otherwise(key)


def format_cdx_line(
    url_col: str = "url",
    ts_epoch_col: str = "ts_epoch",
    json_cols: tuple[str, ...] = ("url", "mime", "status", "digest", "length"),
) -> Column:
    """One CDXJ line: ``surt(url) <yyyyMMddHHmmss> {json}`` — the writer
    half of the index round-trip."""
    ts = F.from_unixtime(F.col(ts_epoch_col), "yyyyMMddHHmmss")
    payload = F.to_json(F.struct(*[F.col(c) for c in json_cols]))
    return F.concat_ws(" ", surt_key_expr(url_col), ts, payload)


def parse_cdx_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """CDXJ lines → typed columns ``(urlkey, ts, url, mime, status,
    digest, length, offset, filename)``; ``ts`` is a timestamp parsed from
    the 14-digit capture time (UTC). Malformed lines (no JSON object)
    yield NULL payload fields rather than failing the scan — crawl
    indexes are append-logs and a reader must tolerate a torn tail."""
    l = F.col(line_col)
    urlkey = F.regexp_extract(l, r"^(\S+)", 1)
    ts_raw = F.regexp_extract(l, r"^\S+ (\d{14})", 1)
    js = F.regexp_extract(l, r"(\{.*\})\s*$", 1)
    parsed = F.from_json(js, CDX_JSON_SCHEMA)
    return lines.select(
        urlkey.alias("urlkey"),
        F.to_timestamp(ts_raw, "yyyyMMddHHmmss").alias("ts"),
        parsed.alias("_j"),
    ).select("urlkey", "ts", "_j.*")


def scan_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Distributed CDX index scan: line-splittable text (gzip handled by
    Spark's codec inference for ``.gz``), so unlike the WARC scan this one
    parallelizes WITHIN a file via maxPartitionBytes."""
    return parse_cdx_lines(spark.read.text(path))
