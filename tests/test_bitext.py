"""Margin-based bitext mining (operators/similarity.py::
bitext_margin_pairs): the Artetxe & Schwenk ratio-margin candidate
miner over the deterministic hash embedding. Staged for the round-13
registration — the oracle SQL below is the catalog-ready twin."""

from __future__ import annotations

import hashlib
import math

import pytest

from .oracle import assert_matches_oracle


def bitext_oracle_sql() -> str:
    """Registered in the round-13 rotation — single-sourced from the
    catalog so this test and the driver check the identical twin."""
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["bitext_margin_pairs"]


def test_bitext_matches_oracle(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.similarity import (
        bitext_margin_pairs,
    )

    assert_matches_oracle(
        bitext_margin_pairs(spark, sf_correct), bitext_oracle_sql(), sf_correct
    )


def test_bitext_nonempty_and_mutual_bounds(spark, sf_correct):
    """The card produces work on the driver fixture: pairs exist for
    more than one target language, every pair's cosine is a legal
    [-1, 1] micro value, and per (anchor, lang) at most BITEXT_K pairs
    survive (the mutual filter can only shrink a top-k list)."""
    from collections import Counter

    from bigdata_infra_cs489_spark.operators.similarity import (
        BITEXT_K,
        bitext_margin_pairs,
    )

    rows = bitext_margin_pairs(spark, sf_correct).collect()
    assert len(rows) > 0
    assert len({r.lang for r in rows}) > 1
    per_anchor = Counter((r.en_id, r.lang) for r in rows)
    assert max(per_anchor.values()) <= BITEXT_K
    for r in rows:
        assert -1.000001 <= r.cosine <= 1.000001


# --- crafted-frame replay -----------------------------------------------------


def _py_h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_bitext(corpus, n_anchors, k, src_lang, dim, salt, anchor_salt):
    """Pure-Python replay of bitext_margin_pairs_core."""
    iv = {
        i: [(_py_h8(f"{text}{salt}{j}") % 1000) - 500 for j in range(dim)]
        for i, _, text in corpus
    }
    lang = {i: lg for i, lg, _ in corpus}
    norm = {i: sum(x * x for x in v) for i, v in iv.items()}
    ids = [i for i, _, _ in corpus if norm[i] > 0]
    anchors = sorted(
        (i for i in ids if lang[i] == src_lang),
        key=lambda i: (_py_h8(f"{i}{anchor_salt}"), i),
    )[:n_anchors]
    tgts = [i for i in ids if lang[i] != src_lang]
    c_u = {}
    for a in anchors:
        for t in tgts:
            dot = sum(x * y for x, y in zip(iv[a], iv[t]))
            cos = dot / math.sqrt(float(norm[a] * norm[t]))
            c_u[(a, t)] = int(math.floor(cos * 1e6 + 0.5))
    topx = {}
    for a in anchors:
        for lg in {lang[t] for t in tgts}:
            cands = sorted(
                (t for t in tgts if lang[t] == lg),
                key=lambda t: (-c_u[(a, t)], t),
            )[:k]
            topx[(a, lg)] = cands
    topy = {
        t: sorted(anchors, key=lambda a: (-c_u[(a, t)], a))[:k] for t in tgts
    }
    out = {}
    for (a, lg), cands in topx.items():
        for t in cands:
            if a not in topy[t]:
                continue
            sx = sum(c_u[(a, c)] for c in cands)
            kx = len(cands)
            sy = sum(c_u[(b, t)] for b in topy[t])
            ky = len(topy[t])
            den = sx * ky + sy * kx
            if den == 0:
                continue
            margin = math.floor(2 * c_u[(a, t)] * kx * ky / den * 1e6 + 0.5)
            out[(lg, a, t)] = (c_u[(a, t)] / 1e6, margin / 1e6)
    return out


def test_bitext_core_matches_python_replay(spark):
    """Planted translations (verbatim text in another lang slot) must
    come back as mutual pairs with cosine 1.0, and the whole output
    equals the pure-Python replay row-for-row."""
    from bigdata_infra_cs489_spark.operators.similarity import (
        BITEXT_ANCHOR_SALT,
        BITEXT_SRC_LANG,
        RAG_EMBED_DIM,
        RAG_EMBED_SALT,
        _int_embed,
        bitext_margin_pairs_core,
    )
    from pyspark.sql import functions as F

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "data tables grow while queries shrink",
        "seven samurai walk into a parquet file",
        "margins beat raw cosine for hub vectors",
        "a completely unrelated string about teapots",
    ]
    corpus = []
    for i, t in enumerate(texts):
        corpus.append((i, "en", t))
    # planted translations: same text, target lang slots
    corpus.append((100, "de", texts[0]))
    corpus.append((101, "fr", texts[1]))
    # noise targets
    corpus.append((102, "de", "unrelated noise text one two three"))
    corpus.append((103, "fr", "more unrelated noise text here"))

    docs = spark.createDataFrame(
        [(i, lg, tx) for i, lg, tx in corpus],
        "doc_id bigint, lang string, text string",
    ).select("doc_id", "lang", _int_embed(F.col("text")).alias("iv"))
    got = {
        (r.lang, r.en_id, r.xx_id): (r.cosine, r.margin)
        for r in bitext_margin_pairs_core(docs, 64, 4).collect()
    }
    expected = _py_bitext(
        corpus, 64, 4, BITEXT_SRC_LANG, RAG_EMBED_DIM,
        RAG_EMBED_SALT, BITEXT_ANCHOR_SALT,
    )
    assert got == expected
    # the planted verbatim translations surface as cosine-1.0 mutuals
    assert got[("de", 0, 100)][0] == 1.0
    assert got[("fr", 1, 101)][0] == 1.0
    # and their margin strictly exceeds every noise pair's margin
    noise_margins = [
        m for (lg, a, t), (_, m) in got.items() if t in (102, 103)
    ]
    assert all(got[("de", 0, 100)][1] > m for m in noise_margins)


def test_bitext_core_src_only_corpus_is_empty(spark):
    from bigdata_infra_cs489_spark.operators.similarity import (
        _int_embed,
        bitext_margin_pairs_core,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "en", "alpha beta"), (1, "en", "gamma delta")],
        "doc_id bigint, lang string, text string",
    ).select("doc_id", "lang", _int_embed(F.col("text")).alias("iv"))
    assert bitext_margin_pairs_core(docs).count() == 0
