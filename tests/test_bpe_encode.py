"""bpe_encode_stats (tokenizer apply + fertility card) vs an inline
DuckDB oracle composed from the registered _bpe_with merge replay, plus
a pure-Python BPE replay (staged for round-9 registration per the
window contract; ITERATIVE plan — the trainer loop — so it follows the
bpe_merges exclusion rationale in plan hygiene)."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from bigdata_infra_cs489_spark.operators.bpe import (
    N_MERGES,
    bpe_encode_stats,
    train_bpe,
)

from .oracle import assert_matches_oracle


def _encode_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["bpe_encode_stats"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        bpe_encode_stats(spark, sf_correct), _encode_sql(), sf_correct
    )


def _py_tokenize(text: str) -> list[str]:
    toks = re.split("[ \t\n\x0b\f\r]+", text.lower())
    toks = [re.sub("(^[^a-z]+|[^a-z]+$)", "", t) for t in toks]
    return [t for t in toks if t]


def _py_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def test_encode_matches_python_replay(spark, sf_smoke):
    """Per-doc subword counts equal a pure-Python left-to-right
    non-overlapping merge replay of the learned table; fertility is in
    [1e6 per-char-splits downward bound, word-length upper]."""
    merges_df, _ = train_bpe(spark, sf_smoke)
    merges = [(a, b) for _, a, b, _, _ in merges_df]
    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    expected = {}
    for d, t in texts.items():
        words = _py_tokenize(t)
        subs = [len(_py_apply(w, merges)) for w in words]
        expected[d] = (len(words), sum(subs), sum(len(w) for w in words))
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"], r["n_chars"])
        for r in bpe_encode_stats(spark, sf_smoke).collect()
    }
    assert got == expected
    for r in bpe_encode_stats(spark, sf_smoke).collect():
        if r["n_words"]:
            assert 1_000_000 <= r["fertility_micro"]
            assert r["n_subwords"] <= r["n_chars"]


def test_shuffle_join_path_is_row_identical(spark, sf_smoke):
    """The at-scale shuffle-join variant (broadcast_vocab=False) returns
    exactly the broadcast plan's rows — the scale knob changes the
    exchange, never the values."""
    a = sorted(
        map(tuple, bpe_encode_stats(spark, sf_smoke).collect())
    )
    b = sorted(
        map(tuple, bpe_encode_stats(spark, sf_smoke, broadcast_vocab=False).collect())
    )
    assert a == b
