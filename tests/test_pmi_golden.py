"""Golden-semantics PMI check on an embedded corpus with HAND-COMPUTED
expectations — pins tokenizer / per-line-distinct / threshold / tie
behavior the way the reference assignment's published answers do
(assignment1.md:23-53 pins pair cardinality and the max-PMI pair for the
Shakespeare corpus), but on a corpus small enough to verify by hand.

Corpus: 26 lines structured after Psalm 136 (KJV, public domain) — every
line carries the refrain "for his mercy endureth for ever"; the first 10
lines open with "o give thanks unto the lord", the other 16 with
"to him alone".

Hand derivation (N = 26 lines; c(w) = lines containing w):
- refrain words {for his mercy endureth ever}: c = 26 each
  ("for" appears twice per line; per-line DISTINCT counts it once)
- opener words  {o give thanks unto the lord}: c = 10 each
- filler words  {to him alone}: c = 16 each
- every word passes c >= 10; ordered pairs with pair_count >= 10:
    refrain-refrain  5*4  = 20   PMI log10(26*26/26/26) = 0
    opener-opener    6*5  = 30   PMI log10(26*10/10/10) = log10(2.6)
    opener-refrain 2*6*5  = 60   PMI log10(26*10/10/26) = 0
    filler-filler    3*2  =  6   PMI log10(26*16/16/16) = log10(1.625)
    filler-refrain 2*3*5  = 30   PMI log10(26*16/16/26) = 0
    filler-opener: never co-occur (disjoint line sets) -> excluded
  total 146 ordered pairs; max PMI 0.414973 on exactly the 30
  opener-opener pairs (both orders, like the reference mapper).
"""

from __future__ import annotations

import math

REFRAIN = "for his mercy endureth for ever"

LINES = [
    (
        f"O give thanks unto the LORD: {REFRAIN}."
        if i < 10
        else f"to him alone: {REFRAIN}."
    )
    for i in range(26)
]

OPENER_WORDS = {"o", "give", "thanks", "unto", "the", "lord"}
FILLER_WORDS = {"to", "him", "alone"}
EXPECTED_PAIR_COUNT = 146
PMI_OPENER = round(math.log10(2.6), 6)  # 0.414973
PMI_FILLER = round(math.log10(1.625), 6)  # 0.210853


def _corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(LINES)], "doc_id long, text string"
    )


def test_pmi_golden_corpus(spark):
    from bigdata_infra_cs489_spark.operators.text_analytics import pmi_pairs_from

    rows = pmi_pairs_from(_corpus(spark)).collect()

    # threshold + per-line-distinct semantics: the hand-counted pair set
    assert len(rows) == EXPECTED_PAIR_COUNT

    # exact PMI histogram: three levels, hand-derived
    by_pmi: dict[float, set] = {}
    for r in rows:
        by_pmi.setdefault(r["pmi"], set()).add((r["left_token"], r["right_token"]))
    assert sorted(by_pmi) == [0.0, PMI_FILLER, PMI_OPENER]
    assert len(by_pmi[0.0]) == 110
    assert by_pmi[PMI_FILLER] == {
        (a, b) for a in FILLER_WORDS for b in FILLER_WORDS if a != b
    }
    # the max-PMI argmax set is exactly the opener-opener pairs,
    # both orders present (the reference mapper emits both directions)
    assert by_pmi[PMI_OPENER] == {
        (a, b) for a in OPENER_WORDS for b in OPENER_WORDS if a != b
    }
    assert ("give", "thanks") in by_pmi[PMI_OPENER]
    assert ("thanks", "give") in by_pmi[PMI_OPENER]


def test_pmi_golden_tokenizer_guards(spark):
    """Reference-tokenizer behavior on the same corpus: 'LORD:' lowercases
    and strips to 'lord', 'ever.' strips to 'ever', double 'for' counts
    once per line (per-line distinct)."""
    from bigdata_infra_cs489_spark.operators.text_analytics import (
        pmi_word_line_counts_from,
    )

    wc = {
        r["word"]: r["line_count"]
        for r in pmi_word_line_counts_from(_corpus(spark)).collect()
    }
    assert wc["lord"] == 10
    assert wc["ever"] == 26
    assert wc["for"] == 26
    assert wc["him"] == 16 and wc["alone"] == 16
    assert set(wc) == OPENER_WORDS | FILLER_WORDS | {
        "for", "his", "mercy", "endureth", "ever",
    }
