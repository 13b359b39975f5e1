"""Native column expressions for text analysis (no Python UDFs).

Everything here compiles to JVM exprs inside WholeStageCodegen — the
hot path for 100 TB text scans. Token counting, quality ratios,
fingerprints, and a marker-word language heuristic, all expressible in
ANSI SQL for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# small, fixed marker-word sets for the n-gram language heuristic;
# chosen to be expressible as plain substring counts in any SQL engine
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "und", "die"),
}

_WS = r"\s+"


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, _WS)))


def word_array(col: Column) -> Column:
    """Whitespace-tokenized words of a trimmed string."""
    return F.split(F.trim(col), _WS)


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: alnum runs + punctuation marks each
    count as one token (a cheap, deterministic BPE stand-in)."""
    runs = F.size(F.filter(F.split(col, r"[^A-Za-z0-9]+"), lambda x: x != ""))
    puncts = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return runs + puncts


def substring_occurrences(col: Column, needle: str) -> Column:
    """Occurrence count of a literal substring (length-delta trick —
    identical semantics in Spark and ANSI SQL)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def marker_hits(col: Column, lang: str) -> Column:
    """Total occurrences of a language's marker words (padded text)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    total = F.lit(0)
    for w in LANG_MARKERS[lang]:
        total = total + substring_occurrences(padded, f" {w} ")
    return total


def language_guess(col: Column) -> Column:
    """Argmax of marker-word hits; 'und' when nothing matches."""
    hits = {lang: marker_hits(col, lang) for lang in LANG_MARKERS}
    best_count = F.greatest(*hits.values())
    expr = F.lit("und")
    # reverse order so earlier languages win ties, mirroring a
    # first-match CASE WHEN in the SQL oracle
    for lang in reversed(list(hits)):
        expr = F.when((best_count > 0) & (hits[lang] == best_count), F.lit(lang)).otherwise(expr)
    return expr


def punct_ratio(col: Column) -> Column:
    """Non-alnum, non-space chars / total chars (0 for empty)."""
    total = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def mean_word_length(col: Column) -> Column:
    words = word_array(col)
    letters = F.length(F.regexp_replace(col, _WS, ""))
    return F.when(F.trim(col) == "", F.lit(0.0)).otherwise(letters / F.size(words))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = ("the", "and", "of", "a", "to")) -> Column:
    padded = F.concat(F.lit(" "), F.lower(F.trim(col)), F.lit(" "))
    hits = F.lit(0)
    for w in stopwords:
        hits = hits + substring_occurrences(padded, f" {w} ")
    return F.when(token_count(col) == 0, F.lit(0.0)).otherwise(hits / token_count(col))


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """64-bit-ish hash replayable in ANSI SQL: first 15 hex chars of
    md5(s || '#' || seed) as a base-16 number (60 bits, non-negative).
    DuckDB equivalent: ('0x' || substr(md5(s || '#' || seed), 1, 15))::BIGINT.
    Slower than xxhash64 (JVM md5 + string conv) — used where the
    DuckDB oracle must replay the hash; the hot path keeps xxhash64."""
    seeded = F.concat(col, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of casefolded,
    whitespace-collapsed text (portable to any engine with md5)."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), _WS, " ")
    return F.md5(normalized)


def quality_points(col: Column) -> Column:
    """Integer quality points 0..3: length ok, punctuation ok, stopword
    density ok. Exact int — aggregate this (order-insensitive), then
    divide once, instead of averaging the per-row double score."""
    toks = token_count(col)
    length_ok = F.when((toks >= 5) & (toks <= 100000), F.lit(1)).otherwise(F.lit(0))
    punct_ok = F.when(punct_ratio(col) < 0.3, F.lit(1)).otherwise(F.lit(0))
    stop_ok = F.when(stopword_ratio(col) > 0.01, F.lit(1)).otherwise(F.lit(0))
    return length_ok + punct_ok + stop_ok


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize extreme length,
    high punctuation, low stopword density (webtext filtering)."""
    return quality_points(col) / F.lit(3.0)


# characteristic character trigrams per language (char-n-gram LID — the
# complementary heuristic to the marker-word counts above; both are
# plain substring counts, so both replay in ANSI SQL)
CHAR_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and"),
    "es": ("ión", "ado", "que"),
    "de": ("der", "sch", "ein"),
}


def trigram_hits(col: Column, lang: str) -> Column:
    """Total occurrences of a language's characteristic char-trigrams
    (no word-boundary padding — substring semantics)."""
    low = F.lower(col)
    total = F.lit(0)
    for g in CHAR_TRIGRAMS[lang]:
        total = total + substring_occurrences(low, g)
    return total


def language_guess_ngram(col: Column) -> Column:
    """Argmax of char-trigram hits; 'und' when nothing matches.
    Tie-break prefers earlier languages (en > es > de), mirroring
    language_guess."""
    hits = {lang: trigram_hits(col, lang) for lang in CHAR_TRIGRAMS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(hits)):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr
