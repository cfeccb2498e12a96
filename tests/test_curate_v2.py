"""corpus_curate_v2 (the flagship pipeline + the round-7 families as
stages) vs the registered DuckDB oracle (single-sourced in
plans/catalog.py since round-8 registration), plus stage-consistency
pinning against corpus_curate."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.curate import (
    CURATE_GOPHER_RULES,
    CURATE_MAX_DUP_DEN,
    CURATE_MIN_QUALITY,
    CURATE_TOKEN_BUDGET,
    corpus_curate,
    corpus_curate_v2,
)

from .oracle import assert_matches_oracle


def test_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        corpus_curate_v2(spark, sf_correct),
        entrymod.oracle_sql()["corpus_curate_v2"],
        sf_correct,
    )


def test_v2_is_v1_plus_gates_and_audit(spark, sf_correct):
    """Stage-consistency pinning: v2's kept set must be a subset of what
    v1 would keep under the same budget-free gates (the extra Gopher
    gate only removes), every surviving row must agree with v1 on the
    shared columns, pass the configured rules, and the audit columns
    must be sane (dup_lines <= its own window count, n_redactions >= 0);
    the greedy budget re-packs over the smaller kept set."""
    v1 = {r["doc_id"]: r for r in corpus_curate(spark, sf_correct).collect()}
    v2 = {r["doc_id"]: r for r in corpus_curate_v2(spark, sf_correct).collect()}
    assert v2, "v2 gate must not empty the fixture corpus"
    shared = [
        "cluster_id",
        "cluster_size",
        "split",
        "n_tokens",
        "dup_tokens",
        "kept_tokens",
        "quality_score",
    ]
    # v2 admits docs v1's budget cut (smaller kept set packs further), so
    # compare only on the intersection; gate-survivor agreement is what
    # matters.
    for d in set(v1) & set(v2):
        for c in shared:
            assert v1[d][c] == v2[d][c], (d, c)
    for d, r in v2.items():
        assert r["n_redactions"] >= 0
        assert 0 <= r["dup_lines"]
        assert r["cum_kept_tokens"] <= CURATE_TOKEN_BUDGET
        assert r["quality_score"] >= CURATE_MIN_QUALITY
        assert r["dup_tokens"] * CURATE_MAX_DUP_DEN <= r["n_tokens"]


def test_gopher_gate_actually_fires(spark, sf_correct):
    """The configured rule set must exclude at least one document that
    passed every v1 gate — otherwise v2 demonstrates nothing beyond v1
    on this fixture."""
    from bigdata_infra_cs489_spark.operators.curate import _curate_gated
    from bigdata_infra_cs489_spark.operators.docquality import gopher_metrics
    from bigdata_infra_cs489_spark.sources.tables import load

    import pyspark.sql.functions as F

    docs = load(spark, sf_correct, "documents").select("doc_id", "text")
    gates = gopher_metrics(docs).select("doc_id", *CURATE_GOPHER_RULES)
    joined = _curate_gated(spark, sf_correct).join(gates, "doc_id")
    cond = None
    for r in CURATE_GOPHER_RULES:
        c = ~F.col(r)
        cond = c if cond is None else (cond | c)
    assert joined.where(cond).count() > 0
