"""CCNet perplexity terciles vs an inline DuckDB oracle (composed from
the registered bigram-LM fragment) AND a pure-Python replay of the
bucket arithmetic (single-sourced in plans/catalog.py since round-9 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.ccnet import (
    CCNET_BUCKET_NAMES,
    CCNET_N_BUCKETS,
    ccnet_bucket_stats,
    ccnet_perplexity_buckets,
)

from .oracle import assert_matches_oracle


def _buckets_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["ccnet_perplexity_buckets"]


def _stats_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["ccnet_bucket_stats"]


def test_buckets_match_oracle(spark, sf_correct):
    assert_matches_oracle(
        ccnet_perplexity_buckets(spark, sf_correct), _buckets_sql(), sf_correct
    )


def test_stats_match_oracle(spark, sf_correct):
    assert_matches_oracle(
        ccnet_bucket_stats(spark, sf_correct), _stats_sql(), sf_correct
    )


def test_bucket_arithmetic_replay(spark, sf_smoke):
    """Python replay: sort (lang, avg_nll, doc_id); tercile index is
    ((rank_in_lang - 1) * 3) // n_lang; head <= middle <= tail boundary
    monotonicity holds per language; every scoreable doc is bucketed."""
    rows = ccnet_perplexity_buckets(spark, sf_smoke).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r["avg_nll"], r["doc_id"]))
        n = len(rs)
        for i, r in enumerate(rs):
            want = CCNET_BUCKET_NAMES[(i * CCNET_N_BUCKETS) // n]
            assert r["bucket"] == want, (lang, r["doc_id"], i, n)
        # boundary monotonicity: max(head) <= min(middle) etc. on the
        # rounded scores
        for a, b in zip(CCNET_BUCKET_NAMES, CCNET_BUCKET_NAMES[1:]):
            xa = [r["avg_nll"] for r in rs if r["bucket"] == a]
            xb = [r["avg_nll"] for r in rs if r["bucket"] == b]
            if xa and xb:
                assert max(xa) <= min(xb), (lang, a, b)


def test_stats_consistent_with_buckets(spark, sf_smoke):
    b = {
        (r["lang"], r["bucket"]): r
        for r in ccnet_perplexity_buckets(spark, sf_smoke).collect()
    }
    stats = ccnet_bucket_stats(spark, sf_smoke).collect()
    assert sum(r["n_docs"] for r in stats) == len(
        ccnet_perplexity_buckets(spark, sf_smoke).collect()
    )
    for r in stats:
        assert r["min_nll"] <= r["max_nll"]
        assert r["n_docs"] >= 1
    _ = b


def test_standing_lm_scores_match_inline(spark, sf_correct):
    """The standing LM score table must equal the inline train+score
    lineage exactly (avg_nll is rounded 6dp before persisting; parquet
    round-trips the double bit-exactly), so a missed LM_SCORES_VERSION
    bump after a model-affecting change fails here before any oracle
    row does."""
    from bigdata_infra_cs489_spark.operators.text_analytics import (
        bigram_lm_perplexity,
        standing_lm_scores,
    )

    cols = ["doc_id", "n_bigrams", "avg_nll"]
    inline = sorted(
        tuple(r[c] for c in cols)
        for r in bigram_lm_perplexity(spark, sf_correct).collect()
    )
    asset = sorted(
        tuple(r[c] for c in cols)
        for r in standing_lm_scores(spark, sf_correct).collect()
    )
    assert len(inline) > 0
    assert asset == inline


def test_ccnet_buckets_ride_standing_lm_scores(spark, sf_smoke):
    """Once the score asset exists, the bucket card must PROBE it (a
    lmscores_v* parquet scan) rather than re-training the LM per query.
    The bucket card's own lineage is truncated by the distsort
    checkpoint (the corpus_curate probe-pin caveat), so the pin
    inspects the pre-ranking frame _scored_docs."""
    import os

    from bigdata_infra_cs489_spark.operators.ccnet import _scored_docs
    from bigdata_infra_cs489_spark.operators.text_analytics import (
        lm_scores_path,
        standing_lm_scores,
    )

    standing_lm_scores(spark, sf_smoke).count()  # ensure built
    sub = os.path.join(lm_scores_path(sf_smoke), "scores")
    assert os.path.exists(os.path.join(sub, "_SUCCESS"))
    files = _scored_docs(spark, sf_smoke).inputFiles()
    assert any("lmscores_v" in f for f in files), (
        f"ccnet buckets do not probe the score table: {files}"
    )
