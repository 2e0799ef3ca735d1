"""Charset sniffing (web.charset_sniff): WHATWG-style BOM + <meta> prescan.

Pins the four rules that make the sniffer trustworthy: BOM detection over
raw bytes, meta-declaration extraction in both markup shapes, Encoding-
Standard label normalization (incl. the meta UTF-16 → utf-8 remap), and
the BOM > meta > windows-1252 precedence/conflict contract. Reference
analog: input sanitation before any stat runs (lq_utils.py:141-196) — on
the web the first sanitation decision is the byte decoding itself.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from longqc_spark.operators.web import charset_sniff

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _sniff(spark, payloads: list[bytes | None]) -> list[dict]:
    pdf = pd.DataFrame(
        {"doc_id": range(len(payloads)), "html": payloads}
    )
    df = spark.createDataFrame(pdf, schema=SCHEMA)
    return [
        r.asDict()
        for r in charset_sniff(df).orderBy("doc_id").collect()
    ]


def test_bom_detection(spark):
    rows = _sniff(
        spark,
        [
            b"\xef\xbb\xbf<html>x</html>",
            b"\xfe\xff<html>x</html>",
            b"\xff\xfe<html>x</html>",
            b"<html>x</html>",
        ],
    )
    assert [r["bom_charset"] for r in rows] == [
        "utf-8",
        "utf-16be",
        "utf-16le",
        None,
    ]
    # BOM alone decides the charset
    assert rows[0]["charset"] == "utf-8"
    assert rows[2]["charset"] == "utf-16le"


@pytest.mark.parametrize(
    "markup,expected",
    [
        (b'<meta charset="utf-8">', "utf-8"),
        (b"<meta charset=UTF-8>", "utf-8"),
        (b"<meta charset='utf8'>", "utf-8"),  # label alias
        (b"<meta charset=latin1>", "windows-1252"),
        (b"<meta charset=ISO-8859-1>", "windows-1252"),
        (b"<meta charset=x-user-defined>", "windows-1252"),
        (b"<meta charset=Shift_JIS>", "shift_jis"),
        # http-equiv form: charset rides inside the content value
        (
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=koi8-r">',
            "koi8-r",
        ),
        # WHATWG prescan remap: a meta-declared UTF-16 label means the
        # markup was readable as ASCII, so the real encoding is UTF-8
        (b'<meta charset="utf-16">', "utf-8"),
        (b'<meta charset="utf-16le">', "utf-8"),
    ],
)
def test_meta_declarations(spark, markup, expected):
    rows = _sniff(spark, [b"<html><head>" + markup + b"</head></html>"])
    assert rows[0]["meta_charset"] == expected
    assert rows[0]["charset"] == expected
    assert rows[0]["bom_charset"] is None


def test_precedence_conflict_and_default(spark):
    rows = _sniff(
        spark,
        [
            # BOM and meta agree: no conflict
            b'\xef\xbb\xbf<meta charset="utf-8"><p>x',
            # BOM contradicts meta: BOM wins, conflict flagged
            b'\xff\xfe<meta charset="utf-8"><p>x',
            # no signal at all: the windows-1252 web default
            b"<html><body>plain</body></html>",
            None,
        ],
    )
    assert (rows[0]["charset"], rows[0]["charset_conflict"]) == ("utf-8", False)
    assert (rows[1]["charset"], rows[1]["charset_conflict"]) == (
        "utf-16le",
        True,
    )
    assert rows[1]["meta_charset"] == "utf-8"
    assert (rows[2]["charset"], rows[2]["meta_charset"]) == (
        "windows-1252",
        None,
    )
    assert rows[2]["charset_conflict"] is False
    # NULL html → every output NULL
    assert all(
        rows[3][c] is None
        for c in ("bom_charset", "meta_charset", "charset", "charset_conflict")
    )


def test_prescan_window(spark):
    # a declaration past the 1024-byte prescan window is NOT seen — the
    # same bound the WHATWG algorithm uses, and what keeps the regexp cost
    # per page O(1) at corpus scale
    late = b"<html>" + b" " * 1100 + b'<meta charset="utf-8"></html>'
    rows = _sniff(spark, [late])
    assert rows[0]["meta_charset"] is None
    assert rows[0]["charset"] == "windows-1252"


def test_string_column_passthrough(spark):
    # string-typed html columns work too (no BOM possible, meta only)
    df = spark.createDataFrame(
        [(0, '<meta charset="utf-8">x')], "doc_id long, html string"
    )
    row = charset_sniff(df).first()
    assert row.charset == "utf-8" and row.bom_charset is None


def test_scan_fused_no_shuffle(spark):
    pdf = pd.DataFrame({"doc_id": [0], "html": [b"<p>x</p>"]})
    df = spark.createDataFrame(pdf, schema=SCHEMA)
    plan = charset_sniff(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
