"""Corpus-pipeline operator tests (pipeline/corpus.py).

The oracled ops are covered by the differential harness; these tests pin
the properties the oracle can't express: packing invariants (rows-only op),
determinism of hash sampling, and the no-shuffle / broadcast plan shapes
the 100 TB design relies on.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from hive_apache_ci_spark.pipeline.corpus import (
    _PACK_BUDGET,
    contamination_ngram,
    pack_sequences_greedy,
    sample_stratified_hash,
)
from hive_apache_ci_spark.helpers import T

from .conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_packing_invariants(spark):
    docs = T(spark, SF_DIR, "documents")
    n_docs = docs.count()
    packed = pack_sequences_greedy(spark, SF_DIR).cache()
    try:
        rows = packed.collect()
        # every document lands in exactly one pack
        assert len(rows) == n_docs
        assert len({r.doc_id for r in rows}) == n_docs
        # no pack exceeds the token budget
        over = (
            packed.groupBy("bucket", "pack_id")
            .agg(F.sum("n_tokens").alias("tot"))
            .filter(F.col("tot") > _PACK_BUDGET)
            .count()
        )
        assert over == 0
        # token counts are preserved (not mangled by the pandas round-trip)
        tok_sum = packed.agg(F.sum("n_tokens")).first()[0]
        expected = docs.select(
            F.sum(F.size(F.split(F.lower(F.col("text")), r"\s+")))
        ).first()[0]
        assert tok_sum == expected
    finally:
        packed.unpersist()


def test_packing_deterministic(spark):
    a = sorted(map(tuple, pack_sequences_greedy(spark, SF_DIR).collect()))
    b = sorted(map(tuple, pack_sequences_greedy(spark, SF_DIR).collect()))
    assert a == b


def test_packing_is_first_fit_dense(spark):
    """Greedy first-fit on descending sizes must beat one-doc-per-pack by a
    wide margin — guards against a regression where every doc opens its own
    pack (which would trivially satisfy the budget invariant)."""
    packed = pack_sequences_greedy(spark, SF_DIR)
    n_docs = packed.count()
    n_packs = packed.select("bucket", "pack_id").distinct().count()
    assert n_packs < n_docs * 0.8, (n_packs, n_docs)


def test_stratified_sample_deterministic_and_bounded(spark):
    kept = sample_stratified_hash(spark, SF_DIR)
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in kept.collect())
    assert a == b
    # md5 buckets are uniform: the en keep-rate (500/1000) must land near
    # 50%, the others near 25% — wide tolerance, just catching inverted
    # or unconditioned rates
    docs = T(spark, SF_DIR, "documents")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept_by = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    en_rate = kept_by.get("en", 0) / totals["en"]
    assert 0.3 < en_rate < 0.7, en_rate
    for lang, tot in totals.items():
        if lang == "en":
            continue
        assert kept_by.get(lang, 0) / tot < 0.5, lang


def test_contamination_broadcasts_benchmark_side(spark):
    p = _plan(contamination_ngram(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
