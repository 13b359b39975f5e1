"""Edge cases for the webtext-hygiene and sample-shaping operators
(corpus-level value checks live in the q58-q63 oracles)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pdf_parser_spark.operators import packing as pk
from pdf_parser_spark.operators import webtext_filters as wf


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id: long, text: string")


def test_canonicalize_url_rules(spark):
    cases = {
        "HTTPS://Ex.COM/Path?utm_source=a&id=3&gclid=z#frag": "https://ex.com/Path?id=3",
        "http://host.com/": "http://host.com",
        "http://host.com/a/": "http://host.com/a/",  # only bare-host slash drops
        "host.com/no-scheme?utm_medium=x": "host.com/no-scheme",
        "https://UPPER.com/KeepCase?ref=t": "https://upper.com/KeepCase",
        # 'ref=' must NOT match inside a longer param name (href=)
        "https://ex.com/page?href=X&id=1": "https://ex.com/page?href=X&id=1",
        "https://ex.com/p?id=1&ref=x&b=2": "https://ex.com/p?id=1&b=2",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u: string")
    got = {r["u"]: r["c"] for r in df.select("u", wf.canonicalize_url(F.col("u")).alias("c")).collect()}
    assert got == cases


def test_line_dup_stats_edges(spark):
    empty = wf.line_dup_stats(_one(spark, "")).first()
    assert (empty["dup_line_frac"], empty["dup_line_char_frac"]) == (0.0, 0.0)
    uniq = wf.line_dup_stats(_one(spark, "aa\nbb\ncc")).first()
    assert (uniq["dup_line_frac"], uniq["dup_line_char_frac"]) == (0.0, 0.0)
    same = wf.line_dup_stats(_one(spark, "xy\nxy\nxy")).first()
    assert round(same["dup_line_frac"], 6) == round(2 / 3, 6)
    assert round(same["dup_line_char_frac"], 6) == round(4 / 6, 6)
    # exactly ONE non-empty line: the descending-sequence footgun
    # (F.sequence(1, 0) == [1, 0]) used to abort under ANSI mode
    one = wf.line_dup_stats(_one(spark, "only line")).first()
    assert (one["dup_line_frac"], one["dup_line_char_frac"]) == (0.0, 0.0)
    one_pad = wf.line_dup_stats(_one(spark, "\n  \nonly line\n")).first()
    assert (one_pad["dup_line_frac"], one_pad["dup_line_char_frac"]) == (0.0, 0.0)


def test_gopher_empty_and_short_docs(spark):
    r = wf.gopher_quality_flags(_one(spark, "")).first()
    assert r["g_n_words"] == 0 and r["gopher_keep"] is False
    r2 = wf.gopher_quality_flags(_one(spark, "tiny doc")).first()
    assert r2["g_n_words"] == 2 and r2["gopher_keep"] is False  # < min_words


def test_pii_redact_clean_text_untouched(spark):
    r = wf.pii_redact(_one(spark, "no personal data here")).first()
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (0, 0, 0)
    assert r["text_redacted"] == "no personal data here"
    r2 = wf.pii_redact(_one(spark, "mail a@b.co and c@d.org")).first()
    assert r2["n_emails"] == 2 and r2["text_redacted"] == "mail <EMAIL> and <EMAIL>"


def test_token_chunks_shapes(spark):
    # 100 words, size 64 / stride 48 -> chunks at 0 (64w) and 48 (52w)
    text = " ".join(f"w{i}" for i in range(100))
    rows = {r["chunk_no"]: r for r in pk.token_chunks(_one(spark, text), size=64, overlap=16).collect()}
    assert set(rows) == {0, 1, 2}  # ceil(100/48) = 3
    assert rows[0]["n_words"] == 64 and rows[0]["first_word"] == "w0" and rows[0]["last_word"] == "w63"
    assert rows[1]["n_words"] == 52 and rows[1]["first_word"] == "w48" and rows[1]["last_word"] == "w99"
    assert rows[2]["n_words"] == 4 and rows[2]["first_word"] == "w96"
    # empty doc: zero chunks
    assert pk.token_chunks(_one(spark, "  ")).count() == 0


def test_pack_sequences_boundaries(spark):
    docs = [(i, "x", " ".join(["t"] * n)) for i, n in enumerate([1000, 1000, 100, 2048])]
    df = spark.createDataFrame(docs, "doc_id: long, lang: string, text: string")
    got = {r["doc_id"]: r["seq_id"] for r in pk.pack_sequences(df, budget=2048).collect()}
    # before-mass: 0, 1000, 2000, 2100 -> seqs 0, 0, 0, 1
    assert got == {0: 0, 1: 0, 2: 0, 3: 1}


def test_pack_sequences_sharded_equals_single_window(spark):
    docs = [(i, ["en", "de", "es"][i % 3], " ".join(["t"] * (37 + (i * 13) % 300))) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id: long, lang: string, text: string")
    single = {(r["lang"], r["doc_id"]): r["seq_id"] for r in pk.pack_sequences(df, budget=500).collect()}
    sharded = {
        (r["lang"], r["doc_id"]): r["seq_id"]
        for r in pk.pack_sequences(df, budget=500, shards=7).collect()
    }
    assert sharded == single and len(single) == 200


def test_pack_sequences_sharded_int_group_key(spark):
    """The broadcast offsets frame must mirror the group key's real
    dtype — an int language id must survive the sharded path."""
    docs = [(i, i % 3, " ".join(["t"] * (20 + (i * 7) % 100))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id: long, lang: int, text: string")
    single = {(r["lang"], r["doc_id"]): r["seq_id"] for r in pk.pack_sequences(df, budget=300, shards=None).collect()}
    sharded = {
        (r["lang"], r["doc_id"]): r["seq_id"]
        for r in pk.pack_sequences(df, budget=300, shards=5).collect()
    }
    assert sharded == single and len(single) == 60


def test_pack_sequences_null_group_key_kept(spark):
    """A null group key (e.g. lang unknown) is a real group: the
    sharded default must keep those rows and agree with the
    single-window path (r3 advice: the equi-join silently dropped
    them)."""
    docs = [
        (i, None if i % 4 == 0 else ["en", "de"][i % 2], " ".join(["t"] * (20 + (i * 7) % 90)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id: long, lang: string, text: string")
    single = {
        (r["lang"], r["doc_id"]): r["seq_id"]
        for r in pk.pack_sequences(df, budget=200, shards=None).collect()
    }
    sharded = {
        (r["lang"], r["doc_id"]): r["seq_id"]
        for r in pk.pack_sequences(df, budget=200, shards=5).collect()
    }
    assert len(single) == 60  # window path keeps null-lang rows
    assert sharded == single  # ...and so does the sharded default now


def test_pack_sequences_default_is_sharded(spark):
    """The DEFAULT call must take the distributed prefix-sum path:
    no whole-group Window (which would put an entire language in one
    task at corpus scale) may appear in the default plan."""
    docs = [(i, ["en", "de"][i % 2], " ".join(["t"] * 50)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id: long, lang: string, text: string")
    default = pk.pack_sequences(df, budget=500)
    plan = default._jdf.queryExecution().optimizedPlan().toString()
    # the sharded path windows over (lang, _shard) and joins broadcast
    # offsets; the unscalable form windows over lang alone
    assert "_shard" in plan
    got = {(r["lang"], r["doc_id"]): r["seq_id"] for r in default.collect()}
    want = {
        (r["lang"], r["doc_id"]): r["seq_id"]
        for r in pk.pack_sequences(df, budget=500, shards=None).collect()
    }
    assert got == want


def test_embedding_lsh_finds_near_identical_clusters(spark):
    """Recall property of the banded hyperplane LSH: members of a
    near-identical cluster (cosine ~1) must surface as pairs, and
    cross-cluster orthogonal-ish pairs must be filtered by the cosine
    verify."""
    import math

    from pdf_parser_spark.operators.dedup import embedding_near_dups_lsh

    dim = 16

    def vec(center, jitter):
        return [float(center[i] + jitter * math.sin(i + 1)) for i in range(dim)]

    c1 = [1.0 if i < 8 else 0.0 for i in range(dim)]
    c2 = [0.0 if i < 8 else 1.0 for i in range(dim)]
    rows = [(f"a{j}", vec(c1, 0.01 * j)) for j in range(4)] + [
        (f"b{j}", vec(c2, 0.01 * j)) for j in range(4)
    ]
    df = spark.createDataFrame(rows, "vec_id: string, embedding: array<float>")
    pairs = embedding_near_dups_lsh(
        df, key_col="vec_id", vec_col="embedding", threshold=0.95, bands=4, bits_per_band=4
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # all within-cluster pairs found (OR-amplified recall), none across
    within = {(f"{p}{i}", f"{p}{j}") for p in "ab" for i in range(4) for j in range(i + 1, 4)}
    assert within <= got
    assert all(a[0] == b[0] for a, b in got)


def test_canonicalize_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over URL-ish fuzz (a canonical form
    must be a fixed point, or dedup keys disagree between passes)."""
    import random

    rng = random.Random(7)
    parts = ["HTTP://", "https://", "", "Host", "host", "x.Y.com", "/p/q", "/", ""]
    params = ["utm_source=1", "id=2", "fbclid=zz", "a=b", "ref=x", ""]
    urls = []
    for _ in range(60):
        u = rng.choice(parts[:3]) + rng.choice(parts[3:6]) + rng.choice(parts[6:])
        q = "&".join(rng.sample(params, rng.randint(0, 4)))
        urls.append(u + ("?" + q if q else "") + rng.choice(["", "#frag"]))
    df = spark.createDataFrame([(u,) for u in urls], "u: string")
    once = df.select(wf.canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(F.col("c").alias("u")).select(
        wf.canonicalize_url(F.col("u")).alias("c2"), F.col("u").alias("c")
    )
    diffs = twice.where("c2 != c").collect()
    assert not diffs, diffs[:5]


def test_winnowing_shared_substring_guarantee(spark):
    """The Schleimer/Wilkerson/Aiken guarantee, checked INDEPENDENTLY
    of the SQL oracle (which replays the same pipeline and would
    replicate a shared algorithmic bug): any two documents sharing a
    substring of length >= k + window - 1 share at least one selected
    fingerprint."""
    import random

    from pdf_parser_spark.operators.dedup import winnowed_fingerprints

    rng = random.Random(11)
    alphabet = "abcdefghij"
    k, window = 8, 4  # guarantee threshold: 11 shared chars
    shared = ["".join(rng.choice(alphabet) for _ in range(k + window - 1)) for _ in range(6)]
    rows = []
    for i, s in enumerate(shared):
        left = "".join(rng.choice(alphabet) for _ in range(rng.randint(30, 200)))
        right = "".join(rng.choice(alphabet) for _ in range(rng.randint(30, 200)))
        rows.append((2 * i, left + s + right))
        rows.append((2 * i + 1, s.join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(20, 90))) for _ in range(2)
        )))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    fps = winnowed_fingerprints(df, k=k, window=window, portable=False)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    for i in range(len(shared)):
        assert by_doc[2 * i] & by_doc[2 * i + 1], f"pair {i} shares no fingerprint"


def test_winnowing_max_chars_prefix_identical(spark):
    """max_chars=N must select EXACTLY the fingerprints of the
    manually-truncated document — the capped curation-funnel variant
    keeps every selection guarantee within the prefix — and bound the
    mega-doc cost tail."""
    import random

    from pdf_parser_spark.operators.dedup import winnowed_fingerprints

    rng = random.Random(23)
    alpha = "abcdefgh "
    docs = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.choice([40, 200, 1500]))))
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    cap = 300
    capped = {
        (r["doc_id"], r["fp"])
        for r in winnowed_fingerprints(df, key_col="doc_id", max_chars=cap).collect()
    }
    trunc = df.selectExpr("doc_id", f"substring(text, 1, {cap}) AS text")
    manual = {
        (r["doc_id"], r["fp"])
        for r in winnowed_fingerprints(trunc, key_col="doc_id").collect()
    }
    assert capped == manual
    # short docs are untouched by the cap
    short_ids = {i for i, t in docs if len(t) <= cap}
    full = {
        (r["doc_id"], r["fp"])
        for r in winnowed_fingerprints(df, key_col="doc_id").collect()
    }
    assert {x for x in capped if x[0] in short_ids} == {
        x for x in full if x[0] in short_ids
    }
    # the 1500-char docs contribute at most ~cap fingerprints each
    long_ids = {i for i, t in docs if len(t) > cap}
    per_long = {}
    for d, _ in capped:
        if d in long_ids:
            per_long[d] = per_long.get(d, 0) + 1
    assert per_long and all(v <= cap for v in per_long.values())


def test_simhash_near_identical_small_hamming(spark):
    """SimHash property (independent of the portable oracle): a doc
    and a lightly-perturbed copy land within a small Hamming distance;
    unrelated word-sets land far apart."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.operators.dedup import simhash

    base = " ".join(f"tok{i}" for i in range(200))
    near = " ".join(f"tok{i}" for i in range(198)) + " novel1 novel2"
    far = " ".join(f"other{i}" for i in range(200))
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id: long, text: string"
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df, bits=32).collect()}
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFF).count("1")
    assert ham(sh[0], sh[1]) <= 6
    assert ham(sh[0], sh[2]) >= 8


def test_metrics_native_twins_match_core(spark):
    """The codegen'd predicates must agree with the byte-parity core
    on boundary inputs (2000-word and 10000-char edges, empties)."""
    from pdf_parser_spark.core.doc_metrics import count_tables_in_export
    from pdf_parser_spark.core.matching import is_noisy_chunk
    from pdf_parser_spark.operators.metrics_native import (
        count_tables_in_export_native,
        is_noisy_chunk_native,
    )

    contents = [
        "",
        "short text",
        "abc " * 2000,          # exactly 2000 words -> clean
        "abc " * 2001,          # 2001 -> noisy
        "x" * 10000,            # exactly max_len -> clean
        "x" * 10001,            # over -> noisy
        "ab " * 3000,           # 2-letter words don't count
        None,
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(contents)], "i: long, c: string")
    got = {
        r["i"]: r["noisy"]
        for r in df.select("i", is_noisy_chunk_native(F.col("c")).alias("noisy")).collect()
    }
    for i, c in enumerate(contents):
        assert got[i] == is_noisy_chunk({"content": c}), f"case {i}"

    recs = [
        {"tables": ["a", "b"], "content": "Table 9 ignored"},
        {"tables": [], "content": "Table 9"},
        {"tables_count": 7},
        {"content": "Table 1.1 x Table 2 y"},
        {"content": ""},
        {},
    ]
    rows = [
        (i, r.get("tables"), r.get("tables_count"), r.get("content")) for i, r in enumerate(recs)
    ]
    df2 = spark.createDataFrame(
        rows, "i: long, tables: array<string>, tables_count: int, content: string"
    )
    got2 = {
        r["i"]: r["n"]
        for r in df2.select(
            "i",
            count_tables_in_export_native(
                F.col("tables"), F.col("tables_count"), F.col("content")
            ).alias("n"),
        ).collect()
    }
    for i, r in enumerate(recs):
        assert got2[i] == count_tables_in_export(r), f"rec {i}"


def test_minhash_signature_estimates_jaccard(spark):
    """Statistical property (independent of the SQL replay): the
    fraction of agreeing signature components estimates the true
    shingle-set Jaccard. A banding/off-by-one bug that shifted hash
    inputs on BOTH sides would pass the oracle but fail this."""
    from pdf_parser_spark.operators.dedup import minhash_signatures, shingle_sets

    # 300 shared words + 100/100 distinct -> shingle overlap known
    shared = " ".join(f"s{i}" for i in range(300))
    a = shared + " " + " ".join(f"a{i}" for i in range(100))
    b = shared + " " + " ".join(f"b{i}" for i in range(100))
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id: long, text: string")
    sets_df = shingle_sets(df, "text", "doc_id", n=3)
    rows = {r["doc_id"]: set(r["sh"]) for r in sets_df.collect()}
    true_j = len(rows[0] & rows[1]) / len(rows[0] | rows[1])

    exploded = sets_df.select("doc_id", F.explode("sh").alias("shingle"))
    sigs = {
        r["doc_id"]: r["signature"]
        for r in minhash_signatures(exploded, num_hashes=64).collect()
    }
    agree = sum(1 for x, y in zip(sigs[0], sigs[1]) if x == y)
    est = agree / 64.0
    # sd = sqrt(j(1-j)/64) ~ 0.06; allow 4 sigma
    assert abs(est - true_j) < 0.25, (est, true_j)
    assert 0.4 < true_j < 0.8  # fixture sanity: mid-range Jaccard


def test_c4_line_clean_rewrite_and_page_flag(spark):
    good = "This sentence has enough words and punctuation."
    df = spark.createDataFrame(
        [
            # every C4 line rule in one doc: short line, no-terminal
            # line, javascript word, quote-terminated keeper
            (1, "\n".join([
                good,
                "Too short.",                       # <3 words
                "no terminal punctuation here",     # no [.!?"”] ending
                "Please enable JavaScript to vote.",# word-bounded match
                "The latest javascripture review was glowing!",  # NOT a match
                'He said "keep this line."',
            ])),
            (2, None),                               # null text
            (3, "Lorem ipsum dolor sit amet. " + good + " " + good
                + " More. Pad! End? Extra."),        # page smell
            (4, "if (x) { return; }\n" + good),      # curly brace smell
            (5, " ".join([good] * 5)),               # single line, 5 sentences
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in wf.c4_line_clean(df).collect()}
    assert out[1]["text_clean"] == "\n".join([
        good,
        "The latest javascripture review was glowing!",
        'He said "keep this line."',
    ])
    assert out[1]["c4_n_lines"] == 6 and out[1]["c4_n_lines_kept"] == 3
    assert not out[1]["c4_page_keep"]  # only 3 terminal marks survive
    assert out[2]["text_clean"] == "" and not out[2]["c4_page_keep"]
    assert out[2]["c4_n_lines"] == 1 and out[2]["c4_n_lines_kept"] == 0
    assert not out[3]["c4_page_keep"]  # lorem ipsum
    assert not out[4]["c4_page_keep"]  # curly brace
    assert out[5]["c4_page_keep"] and out[5]["text_clean"] == " ".join([good] * 5)


def test_robots_noindex_flag_cases(spark):
    """Columnar meta-robots gate: attribute order, quoting style and
    case all match; the `none` shorthand counts as noindex; nofollow
    alone, non-robots metas, word-prefix lookalikes and NULL html do
    not."""
    from pdf_parser_spark.operators.webtext_filters import robots_noindex_flag

    rows = [
        ("a", b'<meta name="robots" content="noindex, nofollow">', True),
        ("b", b"<META CONTENT='nofollow,NOINDEX' NAME=ROBOTS>", True),
        ("c", b'<meta name="robots" content="nofollow">', False),
        ("d", b'<meta name="robots" content="none">', True),
        ("e", b'<meta name="description" content="noindex is a word">', False),
        ("f", None, False),
        ("g", b'<meta name="robots" content="nonenclature">', False),
        ("h", b"<body>plain page</body>", False),
    ]
    df = spark.createDataFrame(
        [(u, h) for u, h, _ in rows], "url string, html binary"
    )
    got = {r["url"]: r["robots_noindex"] for r in robots_noindex_flag(df).collect()}
    assert got == {u: want for u, _, want in rows}


def test_compression_ratio_bands(spark):
    """Redundancy signal sanity: template spam compresses far below
    prose, prose below high-entropy noise; NULL/empty text is NULL;
    the ratio is deterministic across runs."""
    import random

    from pdf_parser_spark.operators.text_analysis import compression_ratio

    rng = random.Random(7)
    noise = "".join(chr(rng.randrange(0x21, 0x2FA0)) for _ in range(4000))
    vocab = [f"word{i}" for i in range(300)] + ["the", "a", "of", "and", "to"]
    prose = " ".join(rng.choice(vocab) for _ in range(700))
    spam = "buy cheap deals now! " * 200
    rows = [("spam", spam), ("prose", prose), ("noise", noise), ("empty", ""), ("null", None)]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r.url: r.compression_ratio for r in compression_ratio(df).collect()}
    assert got["empty"] is None and got["null"] is None
    assert got["spam"] < 0.1 < got["prose"] < got["noise"]
    again = {r.url: r.compression_ratio for r in compression_ratio(df).collect()}
    assert again == got
