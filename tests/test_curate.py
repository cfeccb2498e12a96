"""corpus_curate: the composed end-to-end curation pipeline — oracle
match plus stage-invariant checks against the standalone operators it
composes (each of which has its own oracle), so a regression in the
composition is attributable to a stage."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.curate import (
    CURATE_MAX_DUP_DEN,
    CURATE_MIN_QUALITY,
    CURATE_TOKEN_BUDGET,
)

from .oracle import assert_matches_oracle


def _rows(spark, sf_dir):
    import __spark_entry__ as entrymod

    return entrymod.queries()["corpus_curate"](spark, sf_dir).collect()


def test_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["corpus_curate"]
    sql = entrymod.oracle_sql()["corpus_curate"]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_gate_and_budget_invariants(spark, sf_correct):
    rows = _rows(spark, sf_correct)
    assert len(rows) > 0
    # one surviving representative per near-dup cluster, never more
    assert len({r.cluster_id for r in rows}) == len(rows)
    for r in rows:
        assert r.quality_score >= CURATE_MIN_QUALITY
        assert r.dup_tokens * CURATE_MAX_DUP_DEN <= r.n_tokens
        assert r.kept_tokens == r.n_tokens - r.dup_tokens
        assert r.split in ("train", "val", "test")
        assert 0 < r.cum_kept_tokens <= CURATE_TOKEN_BUDGET
    # greedy pack: cumulative totals are exactly the running sum of
    # kept_tokens in (quality desc, doc_id asc) order
    ordered = sorted(rows, key=lambda r: (-r.quality_score, r.doc_id))
    cum = 0
    for r in ordered:
        cum += r.kept_tokens
        assert r.cum_kept_tokens == cum


def test_stages_agree_with_standalone_operators(spark, sf_correct):
    """Survivors must be consistent with the standalone stage operators:
    keep-best reps, leakage-safe split assignment, span stats."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    rows = _rows(spark, sf_correct)
    reps = {
        r.doc_id: r for r in qs["dedup_keep_best"](spark, sf_correct).collect()
    }
    split = {
        r.doc_id: r.split
        for r in qs["leakage_safe_split"](spark, sf_correct).collect()
    }
    spans = {
        r.doc_id: r for r in qs["dup_span_stats"](spark, sf_correct).collect()
    }
    for r in rows:
        assert r.doc_id in reps  # every survivor is its cluster's keep-best
        assert reps[r.doc_id].cluster_id == r.cluster_id
        assert split[r.doc_id] == r.split
        assert spans[r.doc_id].dup_tokens == r.dup_tokens
        assert spans[r.doc_id].n_tokens == r.n_tokens


def test_incremental_curate_verdicts(spark, sf_correct):
    """Verdict precedence and stage agreement with the standalone
    operators; split inheritance: matched docs hash their OLD cluster's
    id, singletons their own."""
    import hashlib

    import __spark_entry__ as entrymod
    from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD
    from bigdata_infra_cs489_spark.operators.sampling import (
        CLUSTER_SPLIT_SALT,
        TRAIN_PCT,
        VAL_PCT,
    )

    qs = entrymod.queries()
    rows = qs["incremental_curate"](spark, sf_correct).collect()
    assert rows and all(
        r.doc_id % NEW_BATCH_MOD == NEW_BATCH_MOD - 1 for r in rows
    )
    assign = {
        r.doc_id: r for r in qs["incremental_dedup_assign"](spark, sf_correct).collect()
    }
    spans = {
        r.doc_id: r for r in qs["incremental_span_stats"](spark, sf_correct).collect()
    }
    assert set(spans) == {r.doc_id for r in rows}
    seen = set()
    for r in rows:
        a = assign[r.doc_id]
        assert (r.matched, r.cluster_id) == (a.matched, a.cluster_id)
        assert r.dup_old_tokens == spans[r.doc_id].dup_old_tokens
        if r.matched == 0:
            assert r.cluster_id == r.doc_id
        if r.verdict == "drop_neardup":
            assert r.matched == 1
        if r.verdict == "kept":
            assert r.matched == 0
            assert r.quality_score >= CURATE_MIN_QUALITY
            assert r.dup_old_tokens * CURATE_MAX_DUP_DEN <= r.n_tokens
        b = (
            int(
                hashlib.md5(
                    f"{r.cluster_id}{CLUSTER_SPLIT_SALT}".encode()
                ).hexdigest()[:8],
                16,
            )
            % 100
        )
        want = (
            "train" if b < TRAIN_PCT else "val" if b < TRAIN_PCT + VAL_PCT else "test"
        )
        assert r.split == want
        seen.add(r.verdict)
    assert "kept" in seen  # the increment isn't all rejects


def test_flagship_rides_standing_cluster_asset(spark, sf_smoke):
    """Once the data generation's cluster asset exists, the curate
    chain's plan must PROBE it (a clusters_full parquet scan) — pinning
    the round-9 warm path so a refactor can't silently regress to
    re-running the iterative CC per query. dedup_keep_best and
    leakage_safe_split ride the same probe."""
    import os

    from bigdata_infra_cs489_spark.operators.dedup import (
        dedup_index_path,
        standing_full_clusters,
    )

    standing_full_clusters(spark, sf_smoke).count()  # ensure built
    sub = os.path.join(dedup_index_path(sf_smoke), "clusters_full")
    assert os.path.exists(os.path.join(sub, "_SUCCESS"))
    import __spark_entry__ as entrymod

    from bigdata_infra_cs489_spark.operators.curate import _curate_gated

    qs = entrymod.queries()
    # corpus_curate's own lineage is truncated by the pack stage's eager
    # distsort checkpoint (the PLAN_AUDIT caveat), so the probe is
    # pinned on its pre-pack chain. inputFiles() (the scans' actual file
    # set) is used instead of the plan string, which elides file
    # locations on wide plans.
    frames = {
        "corpus_curate[_curate_gated]": _curate_gated(spark, sf_smoke),
        "dedup_keep_best": qs["dedup_keep_best"](spark, sf_smoke),
        "leakage_safe_split": qs["leakage_safe_split"](spark, sf_smoke),
    }
    for name, df in frames.items():
        files = df.inputFiles()
        assert any("clusters_full" in f for f in files), (
            f"{name} does not probe the asset: {files}"
        )


def test_standing_manifest_matches_inline(spark, sf_correct):
    """The standing packed manifest must be BIT-identical to the inline
    corpus_curate lineage — exact equality on every column including the
    double quality_score (parquet round-trips IEEE doubles exactly), so
    a missed CURATE_MANIFEST_VERSION bump after a plan-affecting change
    fails here even before any oracle row does."""
    from bigdata_infra_cs489_spark.operators.curate import (
        corpus_curate,
        standing_packed_corpus,
    )

    cols = [
        "doc_id",
        "cluster_id",
        "cluster_size",
        "split",
        "n_tokens",
        "dup_tokens",
        "kept_tokens",
        "quality_score",
        "cum_kept_tokens",
    ]
    inline = sorted(
        tuple(r[c] for c in cols)
        for r in corpus_curate(spark, sf_correct).collect()
    )
    asset = sorted(
        tuple(r[c] for c in cols)
        for r in standing_packed_corpus(spark, sf_correct).collect()
    )
    assert len(inline) > 0
    assert asset == inline


def test_export_consumers_ride_standing_manifest(spark, sf_smoke):
    """Once the manifest asset exists, the export-family consumers must
    PROBE it (a curate_v* parquet scan), pinning the warm path so a
    refactor can't silently regress to re-curating the corpus per
    export query. export_shards carries no lineage-truncating
    checkpoint, so its inputFiles() sees the actual scan set."""
    import os

    from bigdata_infra_cs489_spark.operators.curate import (
        curate_manifest_path,
        export_shards,
        standing_packed_corpus,
    )

    standing_packed_corpus(spark, sf_smoke).count()  # ensure built
    sub = os.path.join(curate_manifest_path(sf_smoke), "packed")
    assert os.path.exists(os.path.join(sub, "_SUCCESS"))
    files = export_shards(spark, sf_smoke).inputFiles()
    assert any("curate_v" in f for f in files), (
        f"export_shards does not probe the manifest: {files}"
    )
    # and the corpus documents table is NOT among its scans any more
    assert not any("documents.parquet" in f for f in files)


def test_concurrent_manifest_build_and_probe_race(spark, sf_smoke):
    """The vector-index round-10 regression scenario applied to the new
    standing assets: with the curate manifest, span gram index, LM score
    table and BPE vocab all ABSENT, several threads ensure+probe each
    simultaneously. The temp-build + atomic per-subdir publish must give
    every thread the correct probe result and leave one complete asset
    behind."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    from bigdata_infra_cs489_spark.operators.bpe import (
        bpe_vocab_path,
        standing_bpe_vocab,
    )
    from bigdata_infra_cs489_spark.operators.curate import (
        curate_manifest_path,
        standing_packed_corpus,
    )
    from bigdata_infra_cs489_spark.operators.spans import (
        span_index_path,
        standing_old_grams,
    )
    from bigdata_infra_cs489_spark.operators.text_analytics import (
        lm_scores_path,
        standing_lm_scores,
    )

    assets = [
        (curate_manifest_path(sf_smoke), "packed", standing_packed_corpus),
        (span_index_path(sf_smoke), "grams_old", standing_old_grams),
        (lm_scores_path(sf_smoke), "scores", standing_lm_scores),
        (bpe_vocab_path(sf_smoke), "vocab", standing_bpe_vocab),
    ]
    import os

    for path, _sub, fn in assets:
        shutil.rmtree(path, ignore_errors=True)
        expected = fn(spark, sf_smoke).count()
        shutil.rmtree(path, ignore_errors=True)

        def probe(_i, fn=fn):
            return fn(spark, sf_smoke).count()

        with ThreadPoolExecutor(max_workers=4) as ex:
            results = list(ex.map(probe, range(4)))
        assert all(r == expected for r in results), (path, results, expected)
    for path, sub, _fn in assets:
        assert os.path.exists(os.path.join(path, sub, "_SUCCESS"))
