"""The repo-wide cross-engine determinism contract, in one place.

Every operator that must agree bit-exactly with a DuckDB oracle (and with
serial reference implementations) uses the same two primitives:

* ``micro_quantize(col)`` — ``floor(x·1e6 + 0.5)`` as int64. Applied to
  every log-prob / ratio / share BEFORE it is summed or ranked, so all
  downstream arithmetic is exact integer math, immune to float summation
  order across partitions and to libm rounding differences across
  engines. The SQL twin is ``CAST(floor(x*1000000 + 0.5) AS BIGINT)``;
  the Python twin is ``math.floor(x*1e6 + 0.5)``.
* ``ws_tokens(col)`` — lowercased whitespace tokens with empties
  filtered: the tokenization contract shared by the LM estimators, the
  NB classifier, the tokenizer trainers, and every vocab pass. The SQL
  twin is ``list_filter(regexp_split_to_array(lower(text), '\\s+'),
  t -> t <> '')``.

Keeping both here means a future change to rounding or tokenization
cannot silently desynchronize one operator (and its oracle) from the
rest.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MICRO = 1_000_000


def micro_quantize(col: Column) -> Column:
    """floor(x·1e6 + 0.5) as int64 — see module docstring."""
    return F.floor(col * MICRO + F.lit(0.5)).cast("long")


def ws_tokens(text_col: str | Column) -> Column:
    """Lowercased whitespace tokens, empties filtered (array<string>)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(col), r"\s+"), lambda s: s != F.lit(""))
