"""Web-hygiene operators: URL canonicalization, URL-level dedup, per-domain
caps, within-doc line dedup (operators/web.py) — hand fixtures + invariants."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.web import (
    canonical_url_expr,
    dedup_lines_expr,
    domain_cap,
    domain_expr,
    url_dedup,
)


CASES = [
    # fragment stripped
    ("https://a.com/page#frag", "https://a.com/page"),
    # tracking-first query: param removed, seam repaired
    ("https://a.com/p?utm_source=x&id=3", "https://a.com/p?id=3"),
    # tracking-last query
    ("https://a.com/p?id=3&utm_source=x", "https://a.com/p?id=3"),
    # query emptied entirely → no dangling '?'
    ("https://a.com/p?utm_campaign=only", "https://a.com/p"),
    # scheme+host lowercased, path case preserved
    ("HTTPS://WWW.Example.COM/CaseSensitive/Path", "https://www.example.com/CaseSensitive/Path"),
    # trailing slash dropped
    ("https://a.com/dir/", "https://a.com/dir"),
    # gclid + fbclid both stripped, real params kept in order
    ("https://a.com/p?a=1&gclid=g&b=2&fbclid=f", "https://a.com/p?a=1&b=2"),
    # no scheme/host → untouched apart from generic steps
    ("not a url", "not a url"),
]


def test_canonical_url_hand_cases(spark):
    df = spark.createDataFrame(pd.DataFrame({"url": [c[0] for c in CASES]}))
    got = [r["c"] for r in df.select(canonical_url_expr("url").alias("c")).collect()]
    assert got == [c[1] for c in CASES]


def test_domain_expr(spark):
    urls = [
        ("https://www.example.com/x", "example.com"),
        ("HTTP://News.Site.ORG:8080/a", "news.site.org"),
        ("https://sub.dom.co/p?q=1", "sub.dom.co"),
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": [u for u, _ in urls]}))
    got = [r["d"] for r in df.select(domain_expr("url").alias("d")).collect()]
    assert got == [d for _, d in urls]


def test_url_dedup_collapses_aliases(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "url": [
                    "https://a.com/p?utm_source=x",
                    "HTTPS://A.COM/p",
                    "https://a.com/p#frag",
                    "https://a.com/other",
                ],
            }
        )
    )
    kept = url_dedup(df, url_col="url", key_col="doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 4]  # min-key winner per canonical
    assert all(r["canonical_url"].startswith("https://a.com/") for r in kept)


def test_domain_cap_enforces_quota_deterministically(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(100),
            "url": [f"https://site{i % 3}.com/p{i}" for i in range(100)],
        }
    )
    df = spark.createDataFrame(pdf)
    kept = domain_cap(df, cap=5, url_col="url", key_col="doc_id").toPandas()
    counts = kept.groupby("domain").size()
    assert set(counts.index) == {"site0.com", "site1.com", "site2.com"}
    assert (counts == 5).all()
    # deterministic under different parallelism
    again = domain_cap(df.repartition(7), cap=5).toPandas()
    assert sorted(again.doc_id) == sorted(kept.doc_id)
    with pytest.raises(ValueError, match="cap"):
        domain_cap(df, cap=0)


def test_dedup_lines_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["b\na\nb\nc\na", "x", ""]})
    )
    got = [r["t"] for r in df.select(dedup_lines_expr("text").alias("t")).collect()]
    assert got == ["b\na\nc", "x", ""]


def _crawl_df(spark):
    rows = [
        # same canonical page fetched 3 times (alias variants), newest = id 3
        (1, "https://a.com/p/", "2025-01-01 00:00:00", "line A\nBOILER\nline B"),
        (2, "https://a.com/p#frag", "2025-02-01 00:00:00", "BOILER\nline C"),
        (3, "https://a.com/p?utm_source=x", "2025-03-01 00:00:00", "BOILER\nline D"),
        # distinct page, single fetch
        (4, "https://b.com/q", "2025-01-15 00:00:00", "line E\nBOILER"),
        # all-boilerplate doc
        (5, "https://c.com/r", "2025-01-20 00:00:00", "BOILER"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "warc_ts", "text"])
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def test_latest_crawl_keeps_newest_per_canonical_url(spark):
    from longqc_spark.operators.web import latest_crawl

    kept = latest_crawl(_crawl_df(spark)).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [3, 4, 5]
    assert kept[0]["canonical_url"] == "https://a.com/p"


def test_snapshot_novelty_first_capture_flags(spark):
    from longqc_spark.operators.web import snapshot_novelty

    out = {
        r["crawl_day"]: (r["n_fetches"], r["n_novel"])
        for r in snapshot_novelty(_crawl_df(spark)).collect()
    }
    # Jan 1: first capture of a.com/p → novel; Feb/Mar recaptures → not novel
    assert out["2025-01-01"] == (1, 1)
    assert out["2025-02-01"] == (1, 0)
    assert out["2025-03-01"] == (1, 0)
    assert out["2025-01-15"] == (1, 1) and out["2025-01-20"] == (1, 1)


def test_corpus_line_dedup_drops_global_boilerplate_keeps_order(spark):
    from longqc_spark.operators.web import corpus_line_dedup

    out = {
        r["doc_id"]: r["text"]
        for r in corpus_line_dedup(_crawl_df(spark), min_docs=3).collect()
    }
    # BOILER occurs in 5 distinct docs → dropped everywhere, order preserved
    assert out[1] == "line A\nline B"
    assert out[2] == "line C"
    # all-boilerplate doc survives as an empty-text row
    assert out[5] == ""
    # a line occurring in only 2 docs is NOT dropped at min_docs=3
    assert "line C" in out[2]
    assert len(out) == 5


def test_corpus_line_dedup_within_doc_repeats_count_once(spark):
    from longqc_spark.operators.web import corpus_line_dedup

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["dup\ndup\ndup\nkeep", "other"],
            }
        )
    )
    out = {
        r["doc_id"]: r["text"] for r in corpus_line_dedup(df, min_docs=2).collect()
    }
    # 'dup' appears 3x but in ONE distinct doc → distinct-doc count is 1,
    # below min_docs=2 → kept (all three occurrences)
    assert out[1] == "dup\ndup\ndup\nkeep"
    assert out[2] == "other"


def test_null_keys_pass_through_not_collapsed(spark):
    """NULL url/text rows have no identity: every web op must pass them
    through rather than lumping them into one window group and silently
    keeping a single winner (the incremental_dedup NULL-digest lesson)."""
    from longqc_spark.operators.web import (
        corpus_line_dedup,
        domain_cap,
        latest_crawl,
        snapshot_novelty,
        url_dedup,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "url": ["https://a.com/p", None, None, "not a url"],
                "warc_ts": ["2025-01-01"] * 4,
                "text": ["x", None, None, "y"],
            }
        )
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    # url_dedup / latest_crawl: both NULL-url rows survive
    assert sorted(r["doc_id"] for r in url_dedup(df).collect()) == [1, 2, 3, 4]
    assert sorted(r["doc_id"] for r in latest_crawl(df).collect()) == [1, 2, 3, 4]
    # domain_cap at cap=1: the two NULL-url rows AND the unparseable-url row
    # pass through uncapped (no domain identity)
    assert sorted(r["doc_id"] for r in domain_cap(df, cap=1).collect()) == [1, 2, 3, 4]
    # corpus_line_dedup: NULL text stays NULL (not coerced to "")
    out = {r["doc_id"]: r["text"] for r in corpus_line_dedup(df, min_docs=2).collect()}
    assert out[2] is None and out[3] is None
    assert out[1] == "x" and out[4] == "y"


def test_snapshot_novelty_null_urls_each_count_novel(spark):
    """A NULL-url fetch has no page identity, so it can never be a
    're-crawl of a known page': every NULL-url fetch counts as novel on
    its own day, rather than all NULL fetches collapsing into one window
    partition where only the first would count."""
    from longqc_spark.operators.web import snapshot_novelty

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "url": [None, None, None, "https://a.com/p", "https://a.com/p"],
                "warc_ts": [
                    "2025-01-01", "2025-01-02", "2025-01-03",
                    "2025-01-01", "2025-01-02",
                ],
            }
        )
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = {r["crawl_day"]: r for r in snapshot_novelty(df).collect()}
    # day 1: NULL fetch novel + first real fetch novel
    assert out["2025-01-01"]["n_novel"] == 2
    # day 2: NULL fetch is STILL novel (no identity); the re-crawl of
    # a.com/p is not
    assert out["2025-01-02"]["n_novel"] == 1
    assert out["2025-01-02"]["n_fetches"] == 2
    # day 3: third NULL fetch again novel
    assert out["2025-01-03"]["n_novel"] == 1
    assert out["2025-01-03"]["novelty_frac"] == 1.0


def test_corpus_paragraph_dedup_sep(spark):
    """sep='\\n\\n' lifts the grain to whole paragraphs: a paragraph must
    repeat verbatim across min_docs docs to drop; its constituent lines
    repeating inside OTHER paragraphs is not enough."""
    from longqc_spark.operators.web import corpus_line_dedup

    boiler = "subscribe now\nfollow us"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    f"intro one\n\n{boiler}\n\nbody one",
                    f"{boiler}\n\nbody two",
                    # same lines but as DIFFERENT paragraphs → not heavy
                    "subscribe now\n\nfollow us\n\nbody three",
                ],
            }
        )
    )
    out = {
        r["doc_id"]: r["text"]
        for r in corpus_line_dedup(df, min_docs=2, sep="\n\n").collect()
    }
    assert out[1] == "intro one\n\nbody one"
    assert out[2] == "body two"
    assert out[3] == "subscribe now\n\nfollow us\n\nbody three"
    with pytest.raises(ValueError, match="sep"):
        corpus_line_dedup(df, sep="")


def test_incremental_line_dedup_cross_run(spark):
    """Cross-run line rule: committed history pushes a batch line over the
    min_docs threshold (boilerplate learned in run 1 is cut from run 2 even
    though run 2 alone is below threshold); batch-only heavy lines still
    cut; sub-threshold lines survive; NULL text passes through."""
    from longqc_spark.operators.web import (
        corpus_line_dedup,
        incremental_line_dedup,
        line_doc_counts,
    )

    committed = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["NAV BAR\nrun one body a", "NAV BAR\nrun one body b"],
            }
        )
    )
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12, 13],
                "text": [
                    "NAV BAR\nbatch body ten",      # heavy only WITH history
                    "BATCH DUP\nbatch body eleven",  # heavy within batch alone
                    "BATCH DUP\nbatch body twelve",
                    None,
                ],
            }
        )
    )
    counts = line_doc_counts(committed, key_col="doc_id")
    out = {
        r["doc_id"]: r["text"]
        for r in incremental_line_dedup(
            batch, counts, key_col="doc_id", min_docs=3
        ).collect()
    }
    # committed 2 + batch 1 = 3 → NAV BAR cut from the batch doc
    assert out[10] == "batch body ten"
    # BATCH DUP: 0 committed + 2 batch = 2 < 3 → kept
    assert out[11].startswith("BATCH DUP")
    assert out[12].startswith("BATCH DUP")
    assert out[13] is None
    # with EMPTY history the op degrades to exactly corpus_line_dedup
    empty = counts.filter(F.lit(False))
    inc = incremental_line_dedup(batch, empty, key_col="doc_id", min_docs=2)
    full = corpus_line_dedup(batch, key_col="doc_id", min_docs=2)
    a = {r["doc_id"]: r["text"] for r in inc.collect()}
    b = {r["doc_id"]: r["text"] for r in full.collect()}
    assert a == b
    with pytest.raises(ValueError, match="min_docs"):
        incremental_line_dedup(batch, counts, min_docs=0)


def test_scrub_dup_spans_semantics(spark):
    """First occurrence keeps its text; later occurrences (cross-doc AND
    within-doc) lose the span's token range; short docs pass through with
    whitespace normalized; a full-duplicate doc empties out."""
    from longqc_spark.operators.dedup import scrub_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h x"),                      # owner of span a..h
            (2, "z a b c d e f g h y"),                    # cross-doc dup at pos 2
            (3, "  hello   world  "),                      # <8 tokens, messy ws
            (4, "a b c d e f g h x"),                      # full duplicate of doc 1
            (5, "p q r s t u v w p q r s t u v w"),        # within-doc repeat
            (6, None),                                     # NULL text: excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in scrub_dup_spans(docs, key_col="doc_id", text_col="text", window=8).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert (out[1]["text_scrubbed"], out[1]["n_removed"]) == ("a b c d e f g h x", 0)
    assert (out[2]["text_scrubbed"], out[2]["n_removed"]) == ("z y", 8)
    assert (out[3]["text_scrubbed"], out[3]["n_tokens"]) == ("hello world", 2)
    # doc 4 duplicates doc 1's both spans (pos 1 and pos 2) -> ranges 1-8 and
    # 2-9 union to all 9 positions
    assert (out[4]["text_scrubbed"], out[4]["n_removed"]) == ("", 9)
    # doc 5: span at pos 9 repeats span at pos 1 -> second half deleted
    assert (out[5]["text_scrubbed"], out[5]["n_removed"]) == ("p q r s t u v w", 8)


def test_scrub_dup_spans_is_parallelism_invariant(spark):
    """Winner selection is a total order on (key, pos): repartitioning the
    input must not change a byte of the rebuilt text."""
    from longqc_spark.operators.dedup import scrub_dup_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    a = scrub_dup_spans(docs).orderBy("doc_id").collect()
    b = scrub_dup_spans(docs.repartition(13)).orderBy("doc_id").collect()
    assert a == b
    assert sum(r["n_removed"] for r in a) > 0  # fixture actually has dup spans


def test_scrub_dup_spans_hashed_equals_unhashed(spark):
    """The production 8-byte span key (xxhash64) must reproduce the
    string-keyed output exactly on the fixture corpus (collisions are the
    only divergence mode, birthday-bounded way below these sizes)."""
    from longqc_spark.operators.dedup import scrub_dup_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    hashed = scrub_dup_spans(docs, hash_spans=True).orderBy("doc_id").collect()
    plain = scrub_dup_spans(docs, hash_spans=False).orderBy("doc_id").collect()
    assert hashed == plain


def test_clean_lines_rules(spark):
    """C4 line rules: terminal punctuation required, min-words floor,
    javascript lines cut, order preserved, all-fail page becomes ''."""
    from longqc_spark.operators.web import clean_lines_expr

    docs = [
        # keeps the two well-formed lines, drops the rest, order preserved
        'First good line stays here.\nno punct line here\nshort.\n'
        'Enable javascript to view this site.\nSecond good line stays too!',
        # every line fails -> ""
        'tiny.\nno terminal punct',
        None,  # NULL text stays NULL
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "id int, text string")
    out = {
        r["id"]: r["c"]
        for r in df.select(
            "id", clean_lines_expr("text", min_words=4).alias("c")
        ).collect()
    }
    assert out[0] == "First good line stays here.\nSecond good line stays too!"
    assert out[1] == ""
    assert out[2] is None


def test_c4_clean_page_gates(spark):
    """Page drops: lorem ipsum, curly brace, and the post-clean minimum
    sentence gate; NULL-text rows pass every gate untouched."""
    from longqc_spark.operators.web import c4_clean

    good = "One proper sentence right here.\nAnother proper sentence right here!\nA third proper sentence is present."
    docs = [
        (0, good),                                          # survives
        (1, good + "\nsome Lorem Ipsum filler text."),      # lorem -> dropped
        (2, good + "\nvar x = {a: 1};"),                    # brace -> dropped
        (3, "Only one proper sentence right here."),        # < 3 sentences -> dropped
        (4, None),                                          # NULL passes through
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    out = {r["id"]: r["text"] for r in c4_clean(df, min_words=4).collect()}
    assert sorted(out) == [0, 4]
    assert out[0] == good
    assert out[4] is None


def test_c4_clean_in_hygiene_funnel(spark):
    """web_hygiene wires the stage: line cleaning runs before global line
    dedup and the page gate actually removes pages."""
    from longqc_spark.curation import web_hygiene

    good = "A proper sentence number one.\nA proper sentence number two.\nA proper sentence number three."
    df = spark.createDataFrame(
        [("u1", good), ("u2", good + "\ncode { bad }"), ("u3", "stub")],
        "url string, text string",
    )
    out = web_hygiene(df, clean_lines_min_words=4).collect()
    kept = {r["url"]: r["text"] for r in out}
    assert sorted(kept) == ["u1"]
    assert kept["u1"] == good


def test_block_extract_drops_link_dense_blocks(spark):
    """jusText-lite: nav/footer (all-anchor) blocks dropped, content blocks
    kept in page order with inline anchors flattened; script/style/comment
    payloads never leak; entities unescape (&amp;lt; -> &lt;); NULL html
    stays NULL."""
    from longqc_spark.operators.web import block_extract

    html = (
        b'<html><head><script>var x="<p>not text</p>";</script>'
        b"<style>p{margin:0}</style><!-- gen --></head><body>"
        b'<div id="nav"><a href="/">Home</a> <a href="/a">About us</a>'
        b' <a href="/c">Contact</a></div>'
        b"<p>First real paragraph with plain   words &amp; more.</p>"
        b'<p>Second one has a <a href="x">small link</a> inside longer prose.</p>'
        b'<div class="footer"><a>Privacy</a> <a>Terms</a></div></body></html>'
    )
    df = spark.createDataFrame([(1, html), (2, None)], "id int, html binary")
    out = {r["id"]: r["text"] for r in block_extract(df, max_link_density=0.4).collect()}
    assert out[1] == (
        "First real paragraph with plain words & more.\n"
        "Second one has a small link inside longer prose."
    )
    assert out[2] is None


def test_block_extract_link_density_boundary(spark):
    """The density ratio is measured on tag-stripped single-spaced text on
    BOTH sides: a block exactly at the threshold is kept (<=)."""
    from longqc_spark.operators.web import block_extract

    # anchor text "aaaa bbbb" = 9 chars, block text "aaaa bbbb x equals y z" =
    # 22 chars -> density 9/22 ~ 0.409
    html = b'<p><a href="u">aaaa bbbb</a> x equals y z</p>'
    df = spark.createDataFrame([(1, html)], "id int, html binary")
    kept = block_extract(df, max_link_density=9 / 22).collect()[0]["text"]
    dropped = block_extract(df, max_link_density=0.40).collect()[0]["text"]
    assert kept == "aaaa bbbb x equals y z"
    assert dropped == ""


def test_block_extract_abbr_is_not_an_anchor(spark):
    """Tags that merely START with 'a' (<abbr>, <address>, <audio>) must not
    open a pseudo-anchor running to the next </a> — that would count the
    whole block as link text and drop real prose."""
    from longqc_spark.operators.web import block_extract

    html = (
        b'<p><abbr title="x">HTML</abbr> is a standard and widely used markup '
        b'language <a href="/">x</a></p>'
    )
    df = spark.createDataFrame([(1, html)], "id int, html binary")
    out = block_extract(df, max_link_density=0.3).collect()[0]["text"]
    assert out == "HTML is a standard and widely used markup language x"


def test_robots_optout_filter(spark):
    """Opt-out metas in either attribute order / quoting are honored;
    content="none" on a NON-robots meta does not trigger; NULL html passes."""
    from longqc_spark.operators.web import optout_expr, robots_optout_filter

    rows = [
        (1, b'<meta name="robots" content="noindex, nofollow">'),
        (2, b"<META CONTENT='noai' NAME=robots>"),
        (3, b'<meta name="robots" content="index,follow">'),
        (4, b'<meta name="viewport" content="none">'),
        (5, None),
        (6, b'<meta name="robots" content="NOIMAGEAI">'),
    ]
    df = spark.createDataFrame(rows, "id int, html binary")
    flags = {r["id"]: r["f"] for r in df.select("id", optout_expr(df).alias("f")).collect()}
    assert flags == {1: True, 2: True, 3: False, 4: False, 5: None, 6: True}
    assert sorted(r["id"] for r in robots_optout_filter(df).collect()) == [3, 4, 5]
    assert sorted(
        r["id"] for r in robots_optout_filter(df, keep_opted_out=True).collect()
    ) == [1, 2, 6]


def test_per_lang_thresholds(spark):
    """Per-language cutoffs: zh's lower min-chars admits a short dense page
    the en default would drop; symbol fraction counts UNICODE letters as
    letters; unknown/NULL lang falls back to default; NULL text passes;
    keep_col annotates instead of filtering."""
    from longqc_spark.operators.web import per_lang_thresholds

    docs = [
        (1, "en", "a" * 250),              # default keep
        (2, "zh", "好" * 60),          # zh min 50 -> keep (CJK != symbol)
        (3, "zh", "好" * 20),          # below zh min -> drop
        (4, "en", "a" * 100),              # below default min -> drop
        (5, None, "b" * 250),              # NULL lang -> default -> keep
        (6, "en", None),                   # NULL text -> keep
        (7, "de", "!" * 50 + "a" * 200),   # de symbol cap 0.1 -> drop
    ]
    df = spark.createDataFrame(docs, "doc_id int, lang string, text string")
    thr = {"zh": (50, 100_000, 0.30), "de": (100, 100_000, 0.10)}
    kept = sorted(
        r["doc_id"]
        for r in per_lang_thresholds(df, thr, default=(200, 100_000, 0.30)).collect()
    )
    assert kept == [1, 2, 5, 6]
    ann = per_lang_thresholds(df, thr, default=(200, 100_000, 0.30), keep_col="keep")
    got = {r["doc_id"]: r["keep"] for r in ann.collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True, 6: True, 7: False}
    assert "_thr_lang" not in ann.columns


def test_extract_anchors(spark):
    """Anchor corpus: one row per <a> in page order, nested tags flattened,
    entities unescaped, script-embedded anchors never leak, no-href ->
    NULL, empty-text (icon) anchors dropped, NULL html -> no rows."""
    from longqc_spark.operators.web import extract_anchors

    html = (
        b'<html><head><script>var a="<a href=x>no</a>";</script></head><body>'
        b'<div><a href="/">Home</a> <a href="/a" class="x">About &amp; more</a></div>'
        b"<p>text <a href='/b'>inner <b>bold</b> link</a> tail</p>"
        b'<a>no href anchor</a><a href="/i"><img src="x"></a></body></html>'
    )
    df = spark.createDataFrame([("u1", html), ("u2", None)], "url string, html binary")
    rows = extract_anchors(df).orderBy("url", "anchor_pos").collect()
    got = [(r["url"], r["anchor_pos"], r["href"], r["anchor_text"]) for r in rows]
    assert got == [
        ("u1", 0, "/", "Home"),
        ("u1", 1, "/a", "About & more"),
        ("u1", 2, "/b", "inner bold link"),
        ("u1", 3, None, "no href anchor"),
    ]
    # min_text_chars=0 keeps the icon anchor too
    all_rows = extract_anchors(df, min_text_chars=0).collect()
    assert len(all_rows) == 5


def test_declared_canonical_and_collapse(spark):
    """rel-canonical: extracted in either attribute order/quoting,
    stylesheet links never match, aliases sharing a declared canonical
    collapse to the min-key winner even when their fetch URLs share no
    syntactic form, and pages without a declaration fall back to the
    syntactic canonical; no-identity rows pass through."""
    from longqc_spark.operators.web import canonical_collapse, declared_canonical_expr

    rows = [
        # two aliases declaring the same canonical, attrs in both orders
        (1, "https://a.com/article?utm_source=x", b'<html><head><link rel="canonical" href="https://a.com/article"></head></html>'),
        (2, "https://mirror.net/arti-2", b"<html><head><LINK HREF='https://a.com/article' REL=canonical></head></html>"),
        # stylesheet link must NOT count as a declaration
        (3, "https://b.com/p", b'<html><head><link rel="stylesheet" href="/s.css"></head></html>'),
        # same syntactic canonical as 3 (tracking param) -> collapses with it
        (4, "https://b.com/p?gclid=g", b"<html><head></head></html>"),
        # no url, no declaration -> passes through
        (5, None, b"<html></html>"),
        (6, None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string, html binary")
    decl = {r["doc_id"]: r["d"] for r in df.select("doc_id", declared_canonical_expr(df).alias("d")).collect()}
    assert decl[1] == "https://a.com/article"
    assert decl[2] == "https://a.com/article"
    assert decl[3] is None and decl[5] is None and decl[6] is None

    out = canonical_collapse(df)
    kept = {r["doc_id"]: r["canonical_url"] for r in out.collect()}
    assert sorted(kept) == [1, 3, 5, 6]
    assert kept[1] == "https://a.com/article"
    assert kept[3] == "https://b.com/p"
    assert kept[5] is None and kept[6] is None


def test_declared_canonical_resolution_and_normalization(spark):
    """The declared href only becomes an identity after RESOLUTION against
    the fetch URL and the shared normalization chain: a bare href="/" is
    per-site (never a global bucket), non-root relative hrefs are ignored,
    protocol-relative hrefs take the fetch scheme, a declared URL with
    case/slash/tracking noise collapses with its undeclared syntactic
    twin, rel token lists count, data-rel never does."""
    from longqc_spark.operators.web import canonical_collapse

    def page(link):
        return f"<html><head>{link}</head></html>".encode()

    rows = [
        # two sites both declaring href="/" -> two DISTINCT identities
        (1, "https://a.com/home?utm_source=x", page('<link rel="canonical" href="/">')),
        (2, "https://b.com/start", page('<link rel="canonical" href="/">')),
        # non-root relative declaration ignored -> syntactic fallback
        (3, "https://c.com/p?gclid=g", page('<link rel="canonical" href="foo.html">')),
        # protocol-relative resolves with the fetch scheme; token list rel
        (4, "https://d.com/alias", page('<link rel="alternate canonical" href="//d.com/real">')),
        # declared with uppercase host + trailing slash + tracking param
        # collapses with the undeclared syntactic twin below
        (5, "https://e.com/art?ref=r", page('<link rel="canonical" href="https://E.com/art/?utm_campaign=c">')),
        (6, "https://e.com/art", page("<html></html>")),
        # data-rel is NOT a declaration
        (7, "https://f.com/x", page('<link data-rel="canonical" href="https://evil.example/">')),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string, html binary")
    out = {r["doc_id"]: r["canonical_url"] for r in canonical_collapse(df).collect()}
    assert out[1] == "https://a.com" and out[2] == "https://b.com"  # per-site roots
    assert out[3] == "https://c.com/p"            # fallback, tracking stripped
    assert out[4] == "https://d.com/real"         # scheme borrowed from fetch
    assert 5 in out and 6 not in out              # declared+syntactic twins collapse
    assert out[5] == "https://e.com/art"
    assert out[7] == "https://f.com/x"            # evil identity never adopted


def test_page_meta_extraction(spark):
    """title and meta-description: nested tags flattened + entities
    unescaped in titles; description found in either attribute order and
    any quoting; a NON-description meta never matches; absent element and
    NULL html -> NULL."""
    from longqc_spark.operators.web import with_page_meta

    rows = [
        (1, b"<html><head><title>Big &amp; <b>bold</b>  news</title>"
            b'<meta name="description" content="A short summary."></head></html>'),
        (2, b"<html><head><META CONTENT='reversed order' NAME=description>"
            b"</head><body></body></html>"),
        (3, b'<html><head><meta name="keywords" content="not this">'
            b"<title></title></head></html>"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, html binary")
    got = {
        r["id"]: (r["title"], r["meta_description"])
        for r in with_page_meta(df).collect()
    }
    assert got[1] == ("Big & bold news", "A short summary.")
    assert got[2] == (None, "reversed order")
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_anchor_targets_rollup(spark):
    from longqc_spark.operators.web import anchor_targets

    rows = [
        ("p1", "https://t/a", "Target A"),
        ("p1", "https://t/a", "Target A"),   # same page, twice
        ("p2", "https://t/a", "Target A"),
        ("p2", "https://t/a", "click here"),
        ("p3", "https://t/b", "B"),
        ("p3", None, "no href"),             # dropped
    ]
    anchors = spark.createDataFrame(
        rows, "url string, href string, anchor_text string"
    )
    got = {r["href"]: r for r in anchor_targets(anchors).collect()}
    a = got["https://t/a"]
    assert (a["n_anchors"], a["n_sources"]) == (4, 2)  # distinct linking pages
    assert (a["top_text"], a["top_text_n"]) == ("Target A", 3)
    b = got["https://t/b"]
    assert (b["n_anchors"], b["top_text"]) == (1, "B")
    assert None not in got
    # min_sources filters singletons
    assert set(
        r["href"] for r in anchor_targets(anchors, min_sources=2).collect()
    ) == {"https://t/a"}


def test_anchor_targets_tie_break(spark):
    from longqc_spark.operators.web import anchor_targets

    anchors = spark.createDataFrame(
        [("p1", "https://t/x", "alpha"), ("p2", "https://t/x", "beta")],
        "url string, href string, anchor_text string",
    )
    (row,) = anchor_targets(anchors).collect()
    assert row["top_text"] == "beta"  # equal counts: binary-largest text


def test_snapshot_churn(spark):
    from longqc_spark.operators.web import snapshot_churn

    old = spark.createDataFrame(
        [
            ("https://a.com/1", "d1"),
            ("https://a.com/2", "d2"),
            ("https://a.com/3", "d3"),   # gone in new
            ("https://b.com/x", "bx"),
            (None, "zz"),                # no identity -> dropped
        ],
        "url string, digest string",
    )
    new = spark.createDataFrame(
        [
            ("https://a.com/1", "d1"),       # unchanged
            ("https://a.com/2", "d2-new"),   # changed
            ("https://a.com/4", "d4"),       # added
            ("https://b.com/x", "bx"),
        ],
        "url string, digest string",
    )
    rows = {r["host"]: r for r in snapshot_churn(old, new).collect()}
    a = rows["a.com"]
    assert (a["n_old"], a["n_new"], a["n_refetched"]) == (3, 3, 2)
    assert (a["n_changed"], a["n_added"], a["n_gone"]) == (1, 1, 1)
    assert a["churn"] == 0.5
    b = rows["b.com"]
    assert b["churn"] == 0.0 and b["n_refetched"] == 1


def test_snapshot_churn_no_refetch(spark):
    from longqc_spark.operators.web import snapshot_churn

    old = spark.createDataFrame([("https://a.com/1", "d1")], "url string, digest string")
    new = spark.createDataFrame([("https://a.com/2", "d2")], "url string, digest string")
    (row,) = snapshot_churn(old, new).collect()
    assert row["churn"] is None and row["n_added"] == 1 and row["n_gone"] == 1
