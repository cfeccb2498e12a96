"""BPE trainer: oracle parity plus a pure-Python replay of the merge
loop (independent of both engines)."""

from __future__ import annotations

from collections import Counter

import duckdb

from .oracle import assert_matches_oracle


def py_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple]:
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for k in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, a, b, a + b, n))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def _word_counts(sf_dir: str) -> dict[str, int]:
    import re

    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    counts: Counter = Counter()
    for (text,) in texts:
        for t in re.split(r"\s+", text.lower()):
            t = re.sub(r"(^[^a-z]+|[^a-z]+$)", "", t)
            if t:
                counts[t] += 1
    return dict(counts)


def test_bpe_matches_python_replay(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.bpe import N_MERGES, train_bpe

    merges, _ = train_bpe(spark, sf_smoke)
    want = py_bpe(_word_counts(sf_smoke), N_MERGES)
    assert merges == want


def test_bpe_queries_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("bpe_merges", "bpe_token_counts"):
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_bpe_token_counts_conserve_mass(spark, sf_smoke):
    """Total subword-token mass never changes: merges only concatenate."""
    from bigdata_infra_cs489_spark.operators.bpe import (
        bpe_token_counts,
        word_vocab,
    )
    from pyspark.sql import functions as F

    chars = (
        word_vocab(spark, sf_smoke)
        .select((F.size("syms") * F.col("cnt")).alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    rows = bpe_token_counts(spark, sf_smoke).collect()
    merged_chars = sum(len(r.token) * r.n for r in rows)
    assert merged_chars == chars


def test_merge_loop_cap_enforced(spark, sf_smoke):
    """The sequential driver-loop trainer must refuse production-size
    merge counts (one Spark job per merge does not extrapolate to 32k
    merges — see operators/bpe.py MAX_DRIVER_MERGES)."""
    import pytest as _pytest

    from bigdata_infra_cs489_spark.operators.bpe import (
        MAX_DRIVER_MERGES,
        train_bpe,
    )

    with _pytest.raises(ValueError, match="MAX_DRIVER_MERGES"):
        train_bpe(spark, sf_smoke, n_merges=MAX_DRIVER_MERGES + 1)


def test_standing_bpe_vocab_matches_inline(spark, sf_correct):
    """The standing segmented vocabulary must equal the inline train_bpe
    output exactly (words, counts, symbol arrays), so a missed
    BPE_VOCAB_VERSION bump after a trainer-affecting change fails here
    before any oracle row does."""
    from bigdata_infra_cs489_spark.operators.bpe import (
        standing_bpe_vocab,
        train_bpe,
    )

    _, vocab = train_bpe(spark, sf_correct)
    inline = sorted(
        (r["word"], int(r["cnt"]), tuple(r["syms"]))
        for r in vocab.collect()
    )
    asset = sorted(
        (r["word"], int(r["cnt"]), tuple(r["syms"]))
        for r in standing_bpe_vocab(spark, sf_correct).collect()
    )
    assert len(inline) > 0
    assert asset == inline


def test_encode_cards_ride_standing_vocab(spark, sf_smoke):
    """Once the vocab asset exists, the encode/coverage cards must PROBE
    it (a bpevocab_v* parquet scan) rather than re-running the 8-merge
    training loop per query."""
    import os

    import __spark_entry__ as entrymod

    from bigdata_infra_cs489_spark.operators.bpe import (
        bpe_vocab_path,
        standing_bpe_vocab,
    )

    standing_bpe_vocab(spark, sf_smoke).count()  # ensure built
    sub = os.path.join(bpe_vocab_path(sf_smoke), "vocab")
    assert os.path.exists(os.path.join(sub, "_SUCCESS"))
    df = entrymod.queries()["bpe_encode_stats"](spark, sf_smoke)
    files = df.inputFiles()
    assert any("bpevocab_v" in f for f in files), (
        f"bpe_encode_stats does not probe the vocab asset: {files}"
    )
