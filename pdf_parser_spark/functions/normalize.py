"""Native-expression equivalents of the core normalizers (N1-N2, E1).

These compile to JVM exprs (translate / replace / regexp_replace) and
are proven byte-equal to core.text.normalize_text / strip_dot_leaders
by tests/test_native_toc.py on adversarial strings. Used by the
Catalyst-visible ToC pipeline (operators/toc_native.py); the pandas-UDF
byte-parity path keeps using core.text directly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# single-char folds: NBSP variants → space, unicode dashes → '-',
# middot/bullet → '.' (utils.py:86-87, 74-77)
_TRANSLATE_SRC = "\u00A0\u202F\u2010\u2011\u2012\u2013\u2014\u2212\u00B7\u2022"
_TRANSLATE_DST = "  ------.."

# multi-char ligatures (utils.py:68-73)
_LIGATURES = (("ﬁ", "fi"), ("ﬂ", "fl"), ("ﬀ", "ff"), ("ﬃ", "ffi"), ("ﬄ", "ffl"))


def normalize_text_native(col: Column) -> Column:
    """Byte-equal to core.text.normalize_text (utils.py:104-113)."""
    out = F.translate(col, _TRANSLATE_SRC, _TRANSLATE_DST)
    for src, dst in _LIGATURES:
        out = F.replace(out, F.lit(src), F.lit(dst))
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r"^\s+|\s+$", "")
    return F.when(col.isNull() | (col == ""), F.lit("")).otherwise(out)


def strip_dot_leaders_native(col: Column) -> Column:
    """Byte-equal to core.text.strip_dot_leaders (utils.py:115-117)."""
    return F.regexp_replace(F.coalesce(col, F.lit("")), r"\.{3,}", " ")
