"""Invariants for pipeline/lm.py beyond the oracle-parity sweep (which
already covers exact equivalence): distribution sanity and the 100 TB plan
shape (top-K must be TakeOrdered, not a global sort)."""

from __future__ import annotations

from hive_apache_ci_spark.pipeline.lm import (
    quality_lm_perplexity,
    split_train_valid_test,
    vocab_coverage_topk,
)

from .conftest import SF_DIR


def test_split_partitions_the_corpus(spark):
    rows = {r["split"]: r for r in split_train_valid_test(spark, SF_DIR).collect()}
    assert set(rows) == {"train", "valid", "test"}
    assert abs(sum(r["doc_share"] for r in rows.values()) - 1.0) < 1e-6
    # md5 buckets are near-uniform: train must dominate at 80/10/10
    assert rows["train"]["n_docs"] > rows["valid"]["n_docs"]
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]


def test_split_is_deterministic(spark):
    a = sorted(map(tuple, split_train_valid_test(spark, SF_DIR).collect()))
    b = sorted(map(tuple, split_train_valid_test(spark, SF_DIR).collect()))
    assert a == b


def test_perplexity_bounds(spark):
    rows = quality_lm_perplexity(spark, SF_DIR).collect()
    assert len(rows) == 500
    # ppl of any distribution is >= 1; add-1 smoothing keeps it finite and
    # bounded by the smoothed inverse-probability of the rarest token
    assert all(r["ppl"] >= 1.0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)


def test_vocab_cum_share_monotone(spark):
    rows = vocab_coverage_topk(spark, SF_DIR).orderBy("rk").collect()
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert shares[-1] <= 1.0 + 1e-9
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_vocab_topk_plan_is_take_ordered(spark):
    """The top-K over the vocab must compile to TakeOrdered(AndProject) —
    a global Sort of the full vocabulary would be the 100 TB scale-killer."""
    plan = vocab_coverage_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
