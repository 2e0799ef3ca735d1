"""Encoding repair (ftfy-style cp1252-mojibake fixing, operators.text).

The repair table is DERIVED from the codec (what each codepoint's UTF-8
bytes look like under a sloppy-cp1252 mis-decode), so these tests pin the
two properties that make the operator trustworthy rather than golden
strings: (1) one chain pass undoes exactly one mis-decode level, at any
nesting depth, for ANY text over the repairable alphabet; (2) clean text is
a fixed point. Reference analog: input sanitation before stats
(lq_utils.py:141-196), with the web's encoding damage as the artifact.
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from longqc_spark.operators.text import (
    _sloppy_cp1252,
    fix_mojibake_expr,
    mojibake_chain_sql_chunks,
    mojibake_lead_class,
    mojibake_marker_count,
    mojibake_pairs,
)


def _py_fix(s: str, passes: int = 1) -> str:
    for _ in range(passes):
        for bad, good in mojibake_pairs():
            s = s.replace(bad, good)
    return s


# The repair is exact only on text that contains no mojibake-LOOKING
# bigram of its own (a genuine "Ã©" is indistinguishable from damage — the
# standard ftfy ambiguity). The unambiguous alphabet: ASCII + every
# repairable codepoint that appears in NO damaged sequence (so damage at
# any depth round-trips exactly and clean text is a strict fixed point).
_IN_BAD = {c for bad, _ in mojibake_pairs() for c in bad}
_ALPHABET = st.sampled_from(
    [chr(c) for c in range(0x20, 0x7F)]
    + [g for _, g in mojibake_pairs() if g not in _IN_BAD]
    + ["\n", "\t"]
)


@given(st.text(alphabet=_ALPHABET, max_size=80), st.integers(1, 3))
@settings(max_examples=200, deadline=None)
def test_chain_pass_undoes_one_misdecode_level(s, depth):
    damaged = s
    for _ in range(depth):
        damaged = _sloppy_cp1252(damaged.encode("utf-8"))
    assert _py_fix(damaged, passes=depth) == s


@given(st.text(alphabet=_ALPHABET, max_size=80))
@settings(max_examples=200, deadline=None)
def test_clean_text_is_fixed_point(s):
    # no damaged sequence can occur in unambiguous clean text, so a pass
    # must be byte-identical
    assert _py_fix(s) == s


def test_table_shape():
    t = mojibake_pairs()
    bads = [b for b, _ in t]
    assert len(set(bads)) == len(bads)
    # 3-char sequences strictly precede 2-char ones (never half-rewritten)
    lens = [len(b) for b in bads]
    assert lens == sorted(lens, reverse=True)
    assert set(lens) == {2, 3}
    # every damaged sequence's lead char is in the gate class
    cls = mojibake_lead_class()
    assert all(b[0] in cls for b in bads)


def test_spark_expr_matches_python_chain(spark):
    orig = [
        "It’s a “test” — café, naïve, €5, ±3°C… Ÿ",
        "plain ascii stays byte-identical",
        None,
        "château legit lead chars â Ã",
        "",
    ]
    dam = [None if s is None else _sloppy_cp1252(s.encode("utf-8")) for s in orig]
    dbl = [None if s is None else _sloppy_cp1252(s.encode("utf-8")) for s in dam]
    pdf = pd.DataFrame({"i": range(len(orig)), "t1": dam, "t2": dbl})
    out = (
        spark.createDataFrame(pdf)
        .select(
            "i",
            fix_mojibake_expr("t1").alias("f1"),
            fix_mojibake_expr("t2", passes=2).alias("f2"),
            mojibake_marker_count("t1").alias("m1"),
        )
        .orderBy("i")
        .toPandas()
    )
    for got1, got2, m, o, d in zip(out.f1, out.f2, out.m1, orig, dam):
        if o is None:
            assert got1 is None and got2 is None and pd.isna(m)
            continue
        assert got1 == o  # single-level damage repaired
        assert got2 == o  # double-level damage repaired with passes=2
        assert int(m) == sum(d.count(c) for c in "ÂÃÅÆËâ")
    # clean ASCII row: gate must short-circuit to the original column
    assert out.f1[1] == orig[1]


def test_duckdb_chunks_mirror_spark(spark):
    duckdb = pytest.importorskip("duckdb")
    orig = ["He said “don’t” — okay… €9", "ascii only", "mixé Ã©"]
    dam = [_sloppy_cp1252(s.encode("utf-8")) for s in orig]
    pdf = pd.DataFrame({"i": range(3), "t": dam})
    got = (
        spark.createDataFrame(pdf)
        .select("i", fix_mojibake_expr("t").alias("f"))
        .orderBy("i")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("d", pdf)
    ctes, prev, x = [], "d", "t"
    for j, chain in enumerate(mojibake_chain_sql_chunks()):
        ctes.append(f"s{j} AS (SELECT *, {chain.format(x=x)} AS f{j} FROM {prev})")
        prev, x = f"s{j}", f"f{j}"
    cls = mojibake_lead_class()
    sql = (
        "WITH " + ", ".join(ctes) + f" SELECT i, CASE WHEN regexp_matches(t, "
        f"'{cls}') THEN {x} ELSE t END AS f FROM {prev} ORDER BY i"
    )
    exp = con.execute(sql).df()
    assert got.f.tolist() == exp.f.tolist() == orig[:2] + [got.f[2]]


def test_passes_validation():
    with pytest.raises(ValueError):
        fix_mojibake_expr("text", passes=0)


def test_web_hygiene_fix_encoding_stage(spark):
    from longqc_spark.curation import web_hygiene

    orig = "He said “no” — café…"
    dam = _sloppy_cp1252(orig.encode("utf-8"))
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["http://a/x", "http://b/y"], "text": [dam, "clean"]})
    )
    out = web_hygiene(df, fix_encoding_passes=1).orderBy("url").toPandas()
    assert out.text.tolist() == [orig, "clean"]
    # extraction-deferred html input has no text to repair yet
    hdf = spark.createDataFrame(
        pd.DataFrame({"url": ["http://a/x"], "html": ["<p>hi</p>"]})
    )
    with pytest.raises(ValueError, match="fix_encoding_passes"):
        web_hygiene(hdf, html_col="html", fix_encoding_passes=1)
