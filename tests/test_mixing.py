"""Deterministic stratified mixing: down/up-sampling by group."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import mixing as mx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string")


RATES = {"src0": 0.25, "src1": 1.0, "src2": 1.5, "src3": 0.0}


def test_rates_shape_the_mixture(spark, docs):
    out = mx.stratified_sample(docs, RATES, seed=7)
    per = {r["source"]: r for r in mx.mixture_report(docs, out).collect()}
    # src3 dropped entirely, src1 exact passthrough
    assert per["src3"]["out_rows"] == 0
    assert per["src1"]["out_rows"] == 100 and per["src1"]["achieved_rate"] == 1.0
    # src0 ~25 of 100 (hash-binomial: wide tolerance), src2 in [100, 200]
    assert 10 <= per["src0"]["out_rows"] <= 45
    assert 120 <= per["src2"]["out_rows"] <= 180
    # upsampled docs carry copy_idx 0..n-1
    copies = (
        out.where(F.col("source") == "src2")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_list("copy_idx").alias("idx"))
        .collect()
    )
    assert all(sorted(r["idx"]) == list(range(r["n"])) for r in copies)
    assert {r["n"] for r in copies} == {1, 2}


def test_deterministic_and_seed_sensitive(spark, docs):
    a = {(r["doc_id"], r["copy_idx"]) for r in mx.stratified_sample(docs, RATES, seed=7).collect()}
    b = {(r["doc_id"], r["copy_idx"]) for r in mx.stratified_sample(docs, RATES, seed=7).collect()}
    c = {(r["doc_id"], r["copy_idx"]) for r in mx.stratified_sample(docs, RATES, seed=8).collect()}
    assert a == b
    assert a != c  # a new seed reshuffles the fractional picks


def test_portable_twin_same_shape(spark, docs):
    """md5 path selects a different subset but obeys the same rates."""
    out = mx.stratified_sample(docs, RATES, seed=7, portable=True)
    per = {r["source"]: r["out_rows"] for r in mx.mixture_report(docs, out).collect()}
    assert per["src3"] == 0 and per["src1"] == 100
    assert 10 <= per["src0"] <= 45 and 120 <= per["src2"] <= 180


def test_rate_validation_and_default(spark, docs):
    with pytest.raises(ValueError, match="negative"):
        mx.stratified_sample(docs, {"src0": -0.1})
    out = mx.stratified_sample(docs, {"src3": 0.0}, default_rate=1.0)
    assert out.count() == 300  # unlisted groups keep everything


def test_plan_is_scan_shaped(spark, docs):
    plan = (
        mx.stratified_sample(docs, RATES, seed=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # zero shuffles: filter + explode only
