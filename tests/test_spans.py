"""Exact-substring (repeated-span) dedup vs DuckDB oracle AND an
independent pure-Python reimplementation (tokenize -> k-gram counts ->
interval merge), so the semantics are pinned by two disjoint engines."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq
import pytest

from bigdata_infra_cs489_spark.operators import spans as SP
from bigdata_infra_cs489_spark.operators.spans import SPAN_K, SPAN_MIN_COUNT

from .oracle import assert_matches_oracle

NAMES = [
    # the twin pairs are registered as tagged union cards since the
    # round-12 consolidation (one driver slot pins both plan variants);
    # the individual operators remain exported and are exercised below
    # against the pure-Python reimplementations
    "repeated_spans_variants",
    "dup_span_stats",
    "corpus_novelty",
    "incremental_spans_variants",
    "strip_spans_variants",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def _py_tokenize(text: str) -> list[str]:
    toks = re.split("[ \t\n\x0b\f\r]+", text.lower())
    toks = [re.sub("(^[^a-z]+|[^a-z]+$)", "", t) for t in toks]
    return [t for t in toks if t]


def _py_spans(texts: dict[int, str]) -> dict[int, list[tuple[int, int]]]:
    """doc_id -> merged (span_start, span_end) list, 1-based inclusive."""
    grams: dict[int, list[str]] = {
        d: [
            " ".join(ts[i : i + SPAN_K])
            for i in range(len(ts) - SPAN_K + 1)
        ]
        for d, ts in ((d, _py_tokenize(t)) for d, t in texts.items())
    }
    counts = Counter(g for gs in grams.values() for g in gs)
    spans: dict[int, list[tuple[int, int]]] = {}
    for d, gs in grams.items():
        hits = [i + 1 for i, g in enumerate(gs) if counts[g] >= SPAN_MIN_COUNT]
        merged: list[list[int]] = []
        for p in hits:
            if merged and p <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], p + SPAN_K - 1)
            else:
                merged.append([p, p + SPAN_K - 1])
        if merged:
            spans[d] = [tuple(m) for m in merged]
    return spans


def test_against_python_reimplementation(spark, sf_smoke):
    import __spark_entry__ as entrymod

    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    expected = {
        (d, s, e, e - s + 1) for d, sp in _py_spans(texts).items() for s, e in sp
    }
    got = {
        tuple(r)
        for r in SP.repeated_spans(spark, sf_smoke).collect()
    }
    assert got == expected
    # sanity: the fixture corpus actually contains duplicated spans
    assert len(expected) > 0


def test_fp_variant_equals_string_variant(spark, sf_correct):
    """The narrow-key (xxhash64 gram fingerprint) exchange must produce
    the identical span set: a divergence requires a 64-bit collision
    between two distinct grams actually present in the corpus. Checked
    through the registered union cards, whose whole point is that the
    two variants ride one driver hash row."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for card in ("repeated_spans_variants", "incremental_spans_variants"):
        by_var = {}
        for r in qs[card](spark, sf_correct).collect():
            by_var.setdefault(r.variant, set()).add(tuple(r)[1:])
        assert set(by_var) == {"string", "fp"}
        assert by_var["fp"] == by_var["string"]
    assert len(by_var["string"]) > 0


def test_stats_invariants(spark, sf_smoke):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["dup_span_stats"](spark, sf_smoke).collect()
    n_docs = pq.read_metadata(f"{sf_smoke}/documents.parquet").num_rows
    assert len(rows) == n_docs  # every doc scored, including span-free ones
    for r in rows:
        assert 0 <= r.dup_tokens <= r.n_tokens
        assert abs(r.dup_fraction - round(r.dup_tokens / max(r.n_tokens, 1), 6)) < 1e-9


def test_incremental_spans_python_reimpl_and_containment(spark, sf_smoke):
    """incremental_spans (new batch vs standing old-corpus gram index)
    against a pure-Python reimplementation, plus the containment
    invariant: a new-vs-old duplicated window is a fortiori corpus-
    duplicated, so every incremental span lies inside some repeated_span
    of the same document."""
    import __spark_entry__ as entrymod
    from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD

    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    new_ids = {d for d in texts if d % NEW_BATCH_MOD == NEW_BATCH_MOD - 1}
    grams = {
        d: [" ".join(ts[i : i + SPAN_K]) for i in range(len(ts) - SPAN_K + 1)]
        for d, ts in ((d, _py_tokenize(t)) for d, t in texts.items())
    }
    old_index = {g for d, gs in grams.items() if d not in new_ids for g in gs}
    expected = set()
    for d in new_ids:
        hits = [i + 1 for i, g in enumerate(grams[d]) if g in old_index]
        merged: list[list[int]] = []
        for p in hits:
            if merged and p <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], p + SPAN_K - 1)
            else:
                merged.append([p, p + SPAN_K - 1])
        expected |= {(d, s, e, e - s + 1) for s, e in merged}
    got = {tuple(r) for r in SP.incremental_spans(spark, sf_smoke).collect()}
    assert got == expected
    assert len(got) > 0  # fixture corpus has cross-batch duplication
    corpus_spans: dict[int, list[tuple[int, int]]] = {}
    for r in SP.repeated_spans(spark, sf_smoke).collect():
        corpus_spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for d, s, e, _ in got:
        assert any(cs <= s and e <= ce for cs, ce in corpus_spans.get(d, []))


def test_strip_matches_span_stats(spark, sf_smoke):
    """Merged spans never overlap, so the stripped token count must equal
    dup_span_stats' coverage exactly: kept = n_tokens - dup_tokens; and
    clean_text must re-tokenize to exactly kept_tokens tokens."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    stats = {r.doc_id: r for r in qs["dup_span_stats"](spark, sf_smoke).collect()}
    stripped = SP.strip_spans(spark, sf_smoke).collect()
    assert len(stripped) == len(stats)
    for r in stripped:
        s = stats[r.doc_id]
        assert r.n_tokens == s.n_tokens
        assert r.kept_tokens == s.n_tokens - s.dup_tokens
        assert len(r.clean_text.split()) == r.kept_tokens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_intervals_property(spark, seed):
    """Adversarial positions for the interval-merge core: random hit sets
    dense around the exact adjacency boundary (gap == SPAN_K merges,
    gap == SPAN_K + 1 must NOT), all docs checked in ONE Spark job
    against the obvious sequential merge."""
    import random

    rng = random.Random(seed)
    docs: dict[int, list[int]] = {}
    for d in range(40):
        base, positions = 1, []
        while base <= 60 and len(positions) < 20:
            positions.append(base)
            # steps cluster on K-1, K, K+1 — the merge boundary — plus
            # occasional long jumps and dense overlaps
            base += rng.choice([1, 2, SPAN_K - 1, SPAN_K, SPAN_K + 1, 17])
        docs[d] = sorted(set(positions))

    def py_merge(ps: list[int]) -> set[tuple[int, int, int]]:
        out, cur = set(), None
        for p in ps:
            if cur and p <= cur[1] + 1:
                cur[1] = max(cur[1], p + SPAN_K - 1)
            else:
                if cur:
                    out.add((cur[0], cur[1], cur[1] - cur[0] + 1))
                cur = [p, p + SPAN_K - 1]
        if cur:
            out.add((cur[0], cur[1], cur[1] - cur[0] + 1))
        return out

    from bigdata_infra_cs489_spark.operators.spans import _merge_intervals

    rows = [(d, 100, p) for d, ps in docs.items() for p in ps]
    hits = spark.createDataFrame(rows, "doc_id long, n_tokens long, pos long")
    got: dict[int, set] = {}
    for r in _merge_intervals(hits).collect():
        got.setdefault(r.doc_id, set()).add((r.span_start, r.span_end, r.span_len))
    for d, ps in docs.items():
        assert got.get(d, set()) == py_merge(ps), f"doc {d} positions {ps}"


def test_novelty_first_bucket_is_all_novel(spark, sf_smoke):
    import __spark_entry__ as entrymod

    rows = {
        r.bucket: r
        for r in entrymod.queries()["corpus_novelty"](spark, sf_smoke).collect()
    }
    assert rows[0].novelty_rate == 1.0  # nothing precedes bucket 0
    for r in rows.values():
        assert 0 < r.novel_grams <= r.distinct_grams or r.novel_grams == 0


def test_keep_first_policy_invariants_and_python_reimpl(spark, sf_smoke):
    """strip_spans_keep_first (Lee-et-al keep-one policy) against a pure
    Python reimplementation of the full arbitration -> merge -> strip
    chain, plus the two policy invariants: per-doc kept_tokens is >= the
    strip-all policy's (the removal set is a strict subset), and every
    duplicated gram exempts exactly one occurrence (its global first)."""
    import __spark_entry__ as entrymod

    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    toks = {d: _py_tokenize(t) for d, t in texts.items()}
    grams = {
        d: [" ".join(ts[i : i + SPAN_K]) for i in range(len(ts) - SPAN_K + 1)]
        for d, ts in toks.items()
    }
    counts = Counter(g for gs in grams.values() for g in gs)
    first: dict[str, tuple[int, int]] = {}
    for d in sorted(grams):
        for i, g in enumerate(grams[d]):
            if counts[g] >= SPAN_MIN_COUNT and g not in first:
                first[g] = (d, i + 1)
    expected = {}
    for d, gs in grams.items():
        hits = [
            i + 1
            for i, g in enumerate(gs)
            if counts[g] >= SPAN_MIN_COUNT and first[g] != (d, i + 1)
        ]
        merged: list[list[int]] = []
        for p in hits:
            if merged and p <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], p + SPAN_K - 1)
            else:
                merged.append([p, p + SPAN_K - 1])
        kept = [
            t
            for i, t in enumerate(toks[d], start=1)
            if not any(s <= i <= e for s, e in merged)
        ]
        expected[d] = (len(toks[d]), len(kept), " ".join(kept))

    got = {
        r.doc_id: (r.n_tokens, r.kept_tokens, r.clean_text)
        for r in SP.strip_spans_keep_first(spark, sf_smoke).collect()
    }
    assert got == expected

    strip_all = {
        r.doc_id: r.kept_tokens
        for r in SP.strip_spans(spark, sf_smoke).collect()
    }
    assert all(got[d][1] >= strip_all[d] for d in got)
    # the policies genuinely differ on the fixture (some span survives)
    assert any(got[d][1] > strip_all[d] for d in got)


def test_standing_gram_index_matches_inline(spark, sf_correct):
    """The standing old-corpus gram index must equal the inline
    explode+distinct exactly, so a missed SPAN_INDEX_VERSION bump after
    a gram-shaping change (tokenizer, SPAN_K, batch convention) fails
    here before any oracle row does."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD
    from bigdata_infra_cs489_spark.operators.spans import (
        _grams,
        standing_old_grams,
    )

    is_new = (F.col("doc_id") % NEW_BATCH_MOD) == (NEW_BATCH_MOD - 1)
    inline = sorted(
        r.gram
        for r in _grams(spark, sf_correct)
        .where(~is_new)
        .select("gram")
        .distinct()
        .collect()
    )
    asset = sorted(
        r.gram for r in standing_old_grams(spark, sf_correct).collect()
    )
    assert len(inline) > 0
    assert asset == inline


def test_incremental_spans_ride_standing_gram_index(spark, sf_smoke):
    """Once the gram asset exists, the increment queries must PROBE it
    (a spanidx_v* parquet scan) and must NOT re-explode the old corpus:
    the only documents scan left in the plan is the new batch's."""
    import os

    import __spark_entry__ as entrymod

    from bigdata_infra_cs489_spark.operators.spans import (
        span_index_path,
        standing_old_grams,
    )

    standing_old_grams(spark, sf_smoke).count()  # ensure built
    sub = os.path.join(span_index_path(sf_smoke), "grams_old")
    assert os.path.exists(os.path.join(sub, "_SUCCESS"))
    df = entrymod.queries()["incremental_span_stats"](spark, sf_smoke)
    files = df.inputFiles()
    assert any("spanidx_v" in f for f in files), (
        f"incremental_span_stats does not probe the gram index: {files}"
    )
