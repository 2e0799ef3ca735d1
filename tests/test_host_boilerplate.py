"""Host-scoped boilerplate stripping (web.host_boilerplate_strip):
fraction threshold, min-pages guard, host locality, order/NULL
policy, and equivalence of the shared rewrite with the global rule."""

from pyspark.sql import functions as F

from longqc_spark.operators.web import corpus_line_dedup, host_boilerplate_strip


def _corpus(spark):
    rows = []
    # h1: 4 pages, "NAV" on all 4 (frac 1.0), "PROMO" on 2 of 4 (0.5),
    # "RARE" on 1 (0.25)
    bodies = [
        "NAV\nPROMO\nunique a\nRARE",
        "NAV\nPROMO\nunique b",
        "NAV\nunique c",
        "NAV\nunique d",
    ]
    for i, b in enumerate(bodies):
        rows.append((i, "h1", b))
    # h2: only 2 pages sharing "NAV" -> below min_pages, untouched
    rows += [(10, "h2", "NAV\nh2 a"), (11, "h2", "NAV\nh2 b")]
    rows.append((20, None, "NAV\nno host"))
    rows.append((21, "h1", None))
    return spark.createDataFrame(rows, "doc_id bigint, host string, text string")


def test_strip_fraction_and_guard(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in host_boilerplate_strip(_corpus(spark), min_frac=0.5).collect()
    }
    # NAV (4/4) and PROMO (2/4 = min_frac) stripped; RARE kept; order kept
    assert out[0] == "unique a\nRARE"
    assert out[1] == "unique b"
    assert out[2] == "unique c"
    # h2 below min_pages: untouched
    assert out[10] == "NAV\nh2 a"
    # NULL host / NULL text pass through
    assert out[20] == "NAV\nno host"
    assert out[21] is None


def test_strictness_of_fraction(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in host_boilerplate_strip(_corpus(spark), min_frac=0.75).collect()
    }
    assert out[0] == "PROMO\nunique a\nRARE"  # 0.5-frac PROMO survives


def test_host_locality_vs_global(spark):
    # the same line on 3 docs of DIFFERENT hosts: global rule kills it,
    # host rule (1 page per host) does not
    df = spark.createDataFrame(
        [(i, f"h{i}", f"SHARED\nbody {i}") for i in range(3)],
        "doc_id bigint, host string, text string",
    )
    host_out = host_boilerplate_strip(df, min_pages=2).collect()
    assert all(r["text"].startswith("SHARED\n") for r in host_out)
    glob_out = corpus_line_dedup(df, min_docs=3).collect()
    assert sorted(r["text"] for r in glob_out) == ["body 0", "body 1", "body 2"]


def test_all_boilerplate_page_becomes_empty(spark):
    df = spark.createDataFrame(
        [(i, "h", "ONLY") for i in range(4)],
        "doc_id bigint, host string, text string",
    )
    out = host_boilerplate_strip(df, min_frac=0.5).collect()
    assert all(r["text"] == "" for r in out)


def test_web_hygiene_wiring(spark):
    from longqc_spark.curation import web_hygiene

    rows = [
        (f"https://site.com/p{i}", f"CHROME\nbody {i}") for i in range(4)
    ] + [("https://other.com/x", "CHROME\nelse")]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {
        r["url"]: r["text"]
        for r in web_hygiene(df, host_boilerplate_frac=0.6).collect()
    }
    assert out["https://site.com/p0"] == "body 0"
    # other.com has 1 page: untouched
    assert out["https://other.com/x"] == "CHROME\nelse"
    assert set(df.columns) == {"url", "text"}


def test_bad_min_frac(spark):
    import pytest

    with pytest.raises(ValueError):
        host_boilerplate_strip(_corpus(spark), min_frac=0.0)
