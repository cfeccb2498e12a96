"""near_dup_method_audit (cross-method pair-set agreement matrix) vs an
inline DuckDB oracle composed from the four registered pair chains,
plus set-algebra invariants (staged for round-9 registration per the
window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    NEAR_DUP_METHODS,
    near_dup_method_audit,
)

from .oracle import assert_matches_oracle


def _audit_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["near_dup_method_audit"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        near_dup_method_audit(spark, sf_correct), _audit_sql(), sf_correct
    )


def test_set_algebra_invariants(spark, sf_correct):
    """Diagonal rows are full self-overlap (jaccard 1.0 when non-empty);
    off-diagonal intersections are bounded by both set sizes; the fixture
    must show real agreement between minhash and ngram (both verify true
    Jaccard, minhash at the stricter threshold, so minhash pairs are a
    subset of ngram pairs)."""
    rows = {
        (r["method_a"], r["method_b"]): r
        for r in near_dup_method_audit(spark, sf_correct).collect()
    }
    assert len(rows) == 10
    for m in NEAR_DUP_METHODS:
        r = rows[(m, m)]
        assert r["n_a"] == r["n_b"] == r["n_both"]
        if r["n_a"]:
            assert r["pair_jaccard_ppm"] == 1_000_000
    for (a, b), r in rows.items():
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
    mn = rows[("minhash", "ngram")]
    assert mn["n_both"] == mn["n_a"], "0.8-Jaccard pairs must be 0.5-ngram pairs"
    assert mn["n_a"] > 0, "fixture must contain near-duplicate signal"
