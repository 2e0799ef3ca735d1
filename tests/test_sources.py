"""Source/sink coverage (SURVEY.md §2.1 S6-S10): schema'd CSV/TSV/JSON
round-trips — the stat-table scan analogs (``longQC.py:369``,
``lq_rs.py:13-15``)."""

from pyspark.sql import functions as F, types as T


def test_tsv_stat_table_roundtrip(spark, tmp_path):
    """Headerless TSV with forced schema — the sdust-table contract
    (reference README.md:139-145: 6 positional columns)."""
    p = str(tmp_path / "stats.tsv")
    rows = [("doc1", 100, 5, 0.25, 30.5, 80), ("doc2", 250, 9, 0.10, 31.2, 200)]
    with open(p, "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("length", T.LongType()),
            T.StructField("n_masked", T.LongType()),
            T.StructField("masked_frac", T.DoubleType()),
            T.StructField("mean_q", T.DoubleType()),
            T.StructField("q7_bases", T.LongType()),
        ]
    )
    df = spark.read.csv(p, sep="\t", schema=schema)
    got = df.orderBy("name").collect()
    assert [r["name"] for r in got] == ["doc1", "doc2"]
    assert got[0]["masked_frac"] == 0.25
    assert df.schema == schema  # no inference — explicit contract


def test_csv_header_roundtrip(spark, tmp_path):
    """Header CSV (sts.csv analog, lq_rs.py:13-15)."""
    src = str(tmp_path / "src.csv")
    with open(src, "w") as f:
        f.write("ReadScore,HQRegionStart\n0.85,12\n0.05,0\n0.92,44\n")
    schema = "ReadScore double, HQRegionStart long"
    df = spark.read.csv(src, header=True, schema=schema)
    kept = df.filter(F.col("ReadScore") > 0.1)  # F5 quality-score filter
    assert kept.count() == 2


def test_json_report_sink_and_scan(spark, tmp_path):
    """JSON lines sink + schema'd scan (S10)."""
    out = str(tmp_path / "j")
    docs = spark.createDataFrame(
        [("a", 1, [1.0, 2.0]), ("b", 2, [3.0])], "k string, n long, xs array<double>"
    )
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema("k string, n long, xs array<double>").json(out)
    assert back.orderBy("k").collect() == docs.orderBy("k").collect()


def test_union_of_chunked_tsvs(spark, tmp_path):
    """Chunk-file concat → unionByName (S13, lq_mask.py:81-97)."""
    a, b = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    open(a, "w").write("x\t1\n")
    open(b, "w").write("y\t2\n")
    schema = "name string, v long"
    da = spark.read.csv(a, sep="\t", schema=schema)
    db = spark.read.csv(b, sep="\t", schema=schema)
    assert da.unionByName(db).count() == 2


def test_xml_scan(spark, tmp_path):
    """S9 XML scan (reference parses RunInfo.xml driver-side,
    ``lq_rs.py``-adjacent platform metadata) — Spark 4 ships a native XML
    source; tiny platform-metadata files parse distributed like any other."""
    p = str(tmp_path / "runinfo.xml")
    with open(p, "w") as f:
        f.write(
            "<Runs>"
            '<Run id="r1"><Flowcell>FC1</Flowcell><Cycles>100</Cycles></Run>'
            '<Run id="r2"><Flowcell>FC2</Flowcell><Cycles>200</Cycles></Run>'
            "</Runs>"
        )
    df = spark.read.format("xml").option("rowTag", "Run").load(p)
    got = {r["_id"]: r["Cycles"] for r in df.collect()}
    assert got == {"r1": 100, "r2": 200}


def test_orc_roundtrip(spark, sf001, tmp_path):
    """ORC sink/scan parity with parquet (columnar-format coverage: the
    audit/labels tables are format-agnostic behind spark.read/write)."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    d = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(d)
    back = spark.read.orc(d)
    assert back.schema == docs.schema
    a = docs.orderBy("doc_id").toPandas()
    b = back.orderBy("doc_id").toPandas()
    assert a.equals(b)
    # predicate pushdown reaches the ORC reader too
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        back.filter("n_chars > 200")._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
