"""Driver-contract self-check: queries() vs oracle_sql() via DuckDB.

Runs the same comparison the round driver performs (row count, sorted
column names, order-insensitive value multiset) for a representative
subset at sf0.001 — full 66-query sweep lives in tools/check_oracle.py
(kept out of the default pytest run for time).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import compare_one, connect_oracle  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q09_event_gaps",
    "q14_toc_parse",
    "q15_toc_parent_repair",
    "q17_chunk_bounds",
    "q18_chunk_page_gather",
    "q19_heading_extract",
    "q20_caption_lists",
    "q21_validation_counts",
    "q26_blocked_jaccard_pairs",
    "q27_text_features",
    "q30_cosine_topk",
    "q50_content_line_filter",
    "q52_caption_reconcile",
    "q53_export_table_counts",
    "q55_greedy_fuzzy_validate",
    "q56_jsonl_lenient_parse",
    "q57_noisy_chunk_alpha_title",
    "q89_html_main_extract",
    "q90_html_content_spans",
    "q91_boilerplate_stats",
    "q92_dsir_importance",
    "q93_html_metadata",
    "q94_robots_noindex",
    "q95_html_outlinks",
    "q96_host_cap",
]


@pytest.fixture(scope="module")
def contract():
    from __spark_entry__ import oracle_sql, queries

    return queries(), oracle_sql()


@pytest.fixture(scope="module")
def con():
    return connect_oracle(SF)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, con, contract, name):
    qs, os_ = contract
    status, detail = compare_one(spark, con, name, qs[name], os_.get(name), SF)
    assert status == "ok", f"{name}: {detail}"


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "url", "section_id", "title", "page", "level", "parent_id", "full_path",
    ]


def test_every_query_has_docstringed_callable(contract):
    qs, os_ = contract
    assert len(qs) >= 35
    # every oracle key must have a matching query
    assert set(os_) <= set(qs)
    # ZERO rows-only entries in the driver contract: the xxhash64 twins
    # (q33/q34/q35) are bench-only since round 2 — an entry in
    # queries() without an oracle is a red `no_oracle` row
    assert set(qs) == set(os_)
    from pdf_parser_spark.queries.suite import BENCH_QUERIES

    assert set(BENCH_QUERIES) == {
        "q33_minhash_lsh_pairs",
        "q34_simhash_near_dups",
        "q35_ann_topk",
        "q48x_winnowing_xxhash",
        "q92x_dsir_xxhash",
    }
    assert not (set(BENCH_QUERIES) & set(qs))


def test_gate_is_type_strict_on_hugeint(spark, con, contract):
    """VERDICT r1 done-criterion: the local gate must REPRODUCE the
    driver's type-sensitive verdict — an uncast integer SUM (DuckDB
    HUGEINT → arrow decimal128) against Spark BIGINT must be red even
    though every value is numerically equal."""
    qs, _ = contract
    oracle = __import__("__spark_entry__").oracle_sql()["q11_event_sessions"]
    assert "CAST(SUM(new_session) AS BIGINT)" in oracle  # guard: fix targets the real SQL
    tampered = oracle.replace("CAST(SUM(new_session) AS BIGINT)", "SUM(new_session)")
    assert tampered != oracle
    status, detail = compare_one(
        spark, con, "q11_hugeint_canary", qs["q11_event_sessions"], tampered, SF
    )
    assert status == "fail" and "types differ" in detail and "decimal(38,0)" in detail


def test_gate_is_bitwise_on_doubles(spark, con, contract):
    """-0.0 vs 0.0 and last-ulp drift must be red: doubles compare by
    bit pattern, not by %.10g canonicalization."""
    qs, _ = contract
    oracle = __import__("__spark_entry__").oracle_sql()["q59_line_dup_stats"]
    tampered = oracle.replace(
        "ROUND(CASE WHEN doc_id % 2 = 0 THEN 0.5 ELSE 1.0 / 3.0 END, 6) + 0.0",
        "ROUND(CASE WHEN doc_id % 2 = 0 THEN 0.5 ELSE 1.0 / 3.0 END, 6) + 1e-13",
    )
    assert tampered != oracle
    status, detail = compare_one(
        spark, con, "q59_ulp_canary", qs["q59_line_dup_stats"], tampered, SF
    )
    assert status == "fail" and "values differ" in detail
