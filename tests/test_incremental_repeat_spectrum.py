"""incremental_repeat_spectrum (new-batch all-scale repetition against
the standing corpus's per-width context-id asset) vs its REGISTERED
DuckDB oracle (catalog.py replays the md5 doubling chain inline — the
round-15 rotation lifted the single source there), plus a pure-Python
TRUE token-tuple replay and the asset==inline equality pin.
"""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.spans import (
    REPEAT_LEVELS,
    incremental_repeat_spectrum,
    standing_old_contexts,
)

from .oracle import assert_matches_oracle


def incremental_repeat_spectrum_oracle_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["incremental_repeat_spectrum"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        incremental_repeat_spectrum(spark, sf_correct),
        incremental_repeat_spectrum_oracle_sql(),
        sf_correct,
    )


def _true_increment_spectrum(
    old_token_lists: list[list[str]], new_token_lists: list[list[str]]
) -> dict[int, tuple[int, int]]:
    """width -> (new_positions, dup_old_positions) by REAL tuple
    counting — independent of the md5 doubling chain and of the standing
    asset entirely."""
    out = {}
    width = 1
    for _ in range(REPEAT_LEVELS):
        old_set = set()
        for toks in old_token_lists:
            for i in range(len(toks) - width + 1):
                old_set.add(tuple(toks[i : i + width]))
        total = 0
        hits = 0
        for toks in new_token_lists:
            for i in range(len(toks) - width + 1):
                total += 1
                if tuple(toks[i : i + width]) in old_set:
                    hits += 1
        out[width] = (total, hits)
        width *= 2
    return out


def test_matches_true_tuple_counting(spark, sf_correct):
    """The chained-id probe must equal true token-tuple membership on
    the fixture — pins the windowing arithmetic, the old/new batch
    split, AND certifies zero hash collisions at fixture scale."""
    from bigdata_infra_cs489_spark.functions.text import tokenize
    from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD
    from bigdata_infra_cs489_spark.sources.tables import load

    docs = (
        load(spark, sf_correct, "documents")
        .select("doc_id", tokenize("text").alias("toks"))
        .collect()
    )
    old = [list(r.toks) for r in docs if r.doc_id % NEW_BATCH_MOD != NEW_BATCH_MOD - 1]
    new = [list(r.toks) for r in docs if r.doc_id % NEW_BATCH_MOD == NEW_BATCH_MOD - 1]
    truth = _true_increment_spectrum(old, new)
    got = {
        r.width: (r.new_positions, r.dup_old_positions)
        for r in incremental_repeat_spectrum(spark, sf_correct).collect()
    }
    assert got == truth
    # the increment must be non-trivial at small widths on the fixture
    assert truth[1][0] > 0 and truth[1][1] > 0


def test_standing_contexts_match_inline(spark, sf_correct):
    """The standing per-width context-id asset must equal the inline
    per-level distinct over the old corpus exactly, so a missed
    SPECTRUM_INDEX_VERSION bump after a chain-shaping change fails here
    before any oracle row does."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD
    from bigdata_infra_cs489_spark.operators.spans import (
        _doubling_levels,
        _token_contexts,
    )
    from bigdata_infra_cs489_spark.functions.text import tokenize
    from bigdata_infra_cs489_spark.sources.tables import load

    is_new = (F.col("doc_id") % NEW_BATCH_MOD) == (NEW_BATCH_MOD - 1)
    docs = (
        load(spark, sf_correct, "documents")
        .where(~is_new)
        .select("doc_id", tokenize("text").alias("toks"))
    )
    inline = set()
    for width, frame in _doubling_levels(_token_contexts(docs)):
        for r in frame.select("id").distinct().collect():
            inline.add((width, r.id))
    asset = {
        (r.width, r.id)
        for r in standing_old_contexts(spark, sf_correct).collect()
    }
    assert len(inline) > 0
    assert asset == inline


def test_concurrent_cold_build_race(spark, sf_smoke):
    """The standing-asset race bar (test_vector_index's round-10
    regression pattern): with the spectrum index ABSENT, several threads
    run the full increment query simultaneously — every thread must see
    the correct 9-row spectrum and exactly one complete published asset
    must remain."""
    import os
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    from bigdata_infra_cs489_spark.operators.spans import spectrum_index_path

    path = spectrum_index_path(sf_smoke)
    shutil.rmtree(path, ignore_errors=True)

    def run(_):
        return sorted(
            tuple(r) for r in incremental_repeat_spectrum(spark, sf_smoke).collect()
        )

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, range(4)))
    assert all(r == results[0] for r in results)
    assert len(results[0]) == REPEAT_LEVELS
    assert os.path.exists(os.path.join(path, "contexts_old", "_SUCCESS"))
    torn = [d for d in os.listdir(path) if ".build-" in d or ".torn-" in d]
    assert torn == [], f"unpublished build debris: {torn}"


def test_crafted_corpus_exact_values(spark, tmp_path):
    """Hand-checkable frame: doc 9 is the new batch (doc_id % 10 == 9);
    shared vocabulary at width 1, one shared 4-gram, nothing at 8+."""
    import os

    df = spark.createDataFrame(
        [
            (0, "a b c d a b c d", "en", "s"),
            (9, "a b c d x y z w", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/documents.parquet")
    rows = {r.width: r for r in incremental_repeat_spectrum(spark, d).collect()}
    # width 1: new has 8 positions; a,b,c,d occur in old; x,y,z,w do not
    assert rows[1].new_positions == 8
    assert rows[1].dup_old_positions == 4
    assert rows[1].dup_old_ppm == 500000
    # width 2: new windows ab,bc,cd,dx,xy,yz,zw; old distinct {ab,bc,cd,da}
    assert rows[2].new_positions == 7
    assert rows[2].dup_old_positions == 3
    # width 4: new windows abcd,bcdx,cdxy,dxyz,xyzw; only abcd occurs old
    assert rows[4].new_positions == 5
    assert rows[4].dup_old_positions == 1
    # width 8: one window each side, different content
    assert rows[8].new_positions == 1
    assert rows[8].dup_old_positions == 0
    # widths beyond doc length: empty level, ppm guard holds
    assert rows[16].new_positions == 0
    assert rows[16].dup_old_ppm == 0


def test_all_new_batch_corpus_empty_standing_asset(spark, tmp_path):
    """Round-14 advisory: a corpus whose docs are ALL in the new batch
    builds a ZERO-ROW standing asset, and the partitionBy('width') write
    then leaves no data file for schema inference — the schema'd read in
    standing_old_contexts must return the well-typed empty frame, and
    the increment must report zero old-overlap at every width."""
    import os

    df = spark.createDataFrame(
        [(9, "a b c d a b c d", "en", "s"), (19, "a b x y a b x y", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/documents.parquet")

    asset = standing_old_contexts(spark, d)
    assert asset.columns == ["id", "width"]
    assert asset.count() == 0

    rows = {r.width: r for r in incremental_repeat_spectrum(spark, d).collect()}
    assert len(rows) == REPEAT_LEVELS
    assert rows[1].new_positions == 16
    assert all(r.dup_old_positions == 0 for r in rows.values())
    assert all(r.dup_old_ppm == 0 for r in rows.values())
