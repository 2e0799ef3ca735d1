"""Script-consistency check (text.script_consistency): per-script
counting, the letters-only denominator, mismatch threshold, and the
NULL cases (unknown lang / no letters / NULL text)."""

from longqc_spark.operators.text import script_char_count, script_consistency


def _run(spark, rows, min_frac=0.5):
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = script_consistency(df, min_frac=min_frac).orderBy("doc_id").collect()
    return [(r["script_frac"], r["script_mismatch"]) for r in out]


def test_script_fracs_and_mismatch(spark):
    got = _run(
        spark,
        [
            (0, "en", "Plain English text."),            # 1.0, ok
            (1, "ru", "Чисто русский текст!"),           # 1.0, ok
            (2, "ru", "mostly latin здесь"),             # 5/16 cyr -> mismatch
            (3, "en", "12345 !!!"),                      # no letters -> NULL
            (4, "xx", "whatever words"),                 # unknown lang -> NULL
            (5, "ja", "日本語のテキスト"),                  # cjk 1.0, ok
            (6, "en", None),                             # NULL text -> NULL
        ],
    )
    assert got[0] == (1.0, False)
    assert got[1] == (1.0, False)
    frac2, mm2 = got[2]
    assert abs(frac2 - 5 / 16) < 1e-6 and mm2 is True
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    assert got[5] == (1.0, False)
    assert got[6] == (None, None)


def test_digits_dont_vote(spark):
    # letters-only denominator: digits and punctuation are neutral
    got = _run(spark, [(0, "en", "abc 123456789 !!!")])
    assert got[0] == (1.0, False)


def test_threshold_boundary(spark):
    # exactly at min_frac is NOT a mismatch (frac < min_frac strictly)
    rows = [(0, "ru", "ab гд")]  # 2 cyr of 4 letters = 0.5
    assert _run(spark, rows, min_frac=0.5)[0] == (0.5, False)


def test_script_char_count_blocks(spark):
    df = spark.createDataFrame(
        [(0, "Mix: текст 日本 abc ΩΩ")], "doc_id bigint, text string"
    )
    row = df.select(
        script_char_count("text", "latin").alias("lat"),
        script_char_count("text", "cyrillic").alias("cyr"),
        script_char_count("text", "cjk").alias("cjk"),
        script_char_count("text", "greek").alias("grk"),
    ).collect()[0]
    assert (row["lat"], row["cyr"], row["cjk"], row["grk"]) == (6, 5, 2, 2)
