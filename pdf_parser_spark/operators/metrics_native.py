"""Native (codegen'd) twins of small core validator/metrics predicates.

These cover the SURVEY §2 rows that previously had only the Python
core + pytest: A2 table counting with export-record fallbacks, F8 the
noisy-chunk heuristic, F9 the alpha-title ToC filter. Each is a single
boolean/int column expression — zero shuffles, ANSI-replayable, so the
driver contract can value-check them against DuckDB (q53/q57).

Reference anchors:
  count_tables_in_export  /root/reference/orchestrate.py:148-154
  is_noisy_chunk          /root/reference/src/validate.py:282-295
  alpha-title filter      /root/reference/src/validate.py:170-184
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# orchestrate.py:28 table-mention grammar (the export fallback counter)
TABLE_MENTION_RX = r"(?i)\bTable\s+\d+(?:\.\d+)?"
# validate.py:295 word-density tokens: 3+ letter words
WORD_3PLUS_RX = r"\b[A-Za-z]{3,}\b"


def count_tables_in_export_native(
    tables: Column, tables_count: Column, content: Column
) -> Column:
    """A2 with export fallbacks: len(tables) if the list exists, else
    the recorded count, else table-mentions found in the content."""
    return (
        F.when(tables.isNotNull(), F.size(tables))
        .when(tables_count.isNotNull(), tables_count)
        .otherwise(F.regexp_count(F.coalesce(content, F.lit("")), F.lit(TABLE_MENTION_RX)))
        .cast("int")
    )


def is_noisy_chunk_native(content: Column, max_len: int = 10_000) -> Column:
    """F8 oversized / word-dense chunk predicate (validate.py:282-295):
    empty → clean; longer than max_len chars → noisy; more than 2000
    3+-letter words → noisy."""
    c = F.coalesce(content, F.lit(""))
    return F.when(c == "", F.lit(False)).otherwise(
        (F.length(c) > max_len) | (F.regexp_count(c, F.lit(WORD_3PLUS_RX)) > 2000)
    )


def has_alpha_title_native(title: Column) -> Column:
    """F9: a loaded ToC row survives only if its cleaned title contains
    at least one ASCII letter (validate.py:180-183)."""
    return F.coalesce(title, F.lit("")).rlike("[A-Za-z]")
