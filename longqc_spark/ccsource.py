"""``ccsynth`` — a Spark 4 Python Data Source that GENERATES the synthetic
Common-Crawl-style corpus partition-parallel, no staging files.

The parquet fixture path (``corpus.write_corpus``) materializes the corpus
serially on the driver before Spark ever sees it; this source instead makes
generation itself a distributed scan: each input partition derives every
document from ``default_rng([seed, doc_id])``, so the table is bit-identical
at ANY partition count (the parallel-determinism discipline of SURVEY.md
§7.5.3 applied to a source). Batches are emitted as Arrow RecordBatches —
the source stays on the vectorized path end-to-end.

Reference analog: the chunked FASTX scan (lq_utils.py:263-289) is the
reference's record source; here the "file" is a seeded generator and the
chunk is an InputPartition.

Usage::

    spark.dataSource.register(CCSynthDataSource)
    df = (spark.read.format("ccsynth")
          .option("n_docs", 10_000).option("seed", 42)
          .option("num_partitions", 32).load())
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class CCSynthPartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class CCSynthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ccsynth"

    def schema(self) -> str:
        # the BASELINE.json input_hint shape
        return "url string, warc_ts timestamp_ntz, html binary, text string, lang string"

    def reader(self, schema) -> "CCSynthReader":
        return CCSynthReader(self.options)


class CCSynthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self) -> list[CCSynthPartition]:
        step = max(1, math.ceil(self.n_docs / self.num_partitions))
        return [
            CCSynthPartition(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    # fixed Arrow-batch size: per-task memory is bounded by the batch, not
    # the partition — a 10^8-doc partition streams through in 2048-doc chunks
    BATCH_DOCS = 2048

    def read(self, part: CCSynthPartition) -> Iterator:
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from longqc_spark.corpus import (
            CLASSES,
            _CLASS_P,
            _EPOCH,
            _gen_text,
            _render_html,
        )
        from longqc_spark.kernels import extract_text_batch

        schema = pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        )
        for lo in range(part.lo, part.hi, self.BATCH_DOCS):
            hi = min(lo + self.BATCH_DOCS, part.hi)
            urls: list[str] = []
            ts: list[dt.datetime] = []
            htmls: list[bytes] = []
            langs: list[str] = []
            for i in range(lo, hi):
                # one rng per doc, keyed by (seed, doc_id): the row is a pure
                # function of its id — any partitioning yields the same table
                rng = np.random.default_rng([self.seed, i])
                cls = CLASSES[int(rng.choice(len(CLASSES), p=_CLASS_P))]
                host = int(min(rng.zipf(1.5), 500))
                prose, lang = _gen_text(rng, cls)
                urls.append(f"https://host{host}.example/{cls}/p{i}")
                ts.append(_EPOCH + dt.timedelta(seconds=i))
                htmls.append(_render_html(prose))
                langs.append(lang)
            texts = extract_text_batch(pd.Series(htmls, dtype=object)).tolist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(ts, pa.timestamp("us")),
                    pa.array(htmls, pa.binary()),
                    pa.array(texts, pa.string()),
                    pa.array(langs, pa.string()),
                ],
                schema=schema,
            )
