"""longqc_spark — PySpark-native web-text QC engine.

From-scratch transplant of LongQC's computational design (reference at
/root/reference: chunked scan → per-record stat vectors → threshold
keep/drop → record rewriting → summary reports; see SURVEY.md) onto
Common-Crawl-style document tables, expressed Spark-first. COVERAGE.md maps
every reference operator to its implementation here.
"""

__version__ = "0.1.0"
