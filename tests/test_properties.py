"""Property-based tests (hypothesis): the Spark column-expression
implementations agree with plain-Python reference implementations on
arbitrary inputs, not just the fixtures."""

from __future__ import annotations

import re

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


def py_tokenize(line: str) -> list[str]:
    """The reference tokenizer (util/Tokenizer.scala:8-12) in pure Python:
    whitespace split -> lowercase -> strip leading/trailing non-[a-z] ->
    drop empties."""
    toks = [
        re.sub(r"(^[^a-z]+|[^a-z]+$)", "", t)
        for t in re.split(r"\s+", line.lower())
    ]
    return [t for t in toks if t]


ascii_lines = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(lines=ascii_lines)
def test_tokenize_matches_python(spark, lines):
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.functions.text import tokenize

    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)], "i int, text string")
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokenize("text").alias("toks")).collect()
    }
    want = {i: py_tokenize(s) for i, s in enumerate(lines)}
    assert got == want


# --- boolean postfix compiler vs a Python set-algebra model -----------------

VOCAB = ["fast", "slow", "table", "data", "query", "zzznotaword"]

postfix_exprs = st.recursive(
    st.sampled_from(VOCAB),
    lambda sub: st.tuples(sub, sub, st.sampled_from(["AND", "OR"])).map(
        lambda t: f"{t[0]} {t[1]} {t[2]}"
    ),
    max_leaves=4,
)


def py_eval_postfix(query: str, doc_terms: dict[int, set[str]]) -> set[int]:
    stack: list[set[int]] = []
    for tok in query.split():
        if tok in ("AND", "OR"):
            right, left = stack.pop(), stack.pop()
            stack.append(left & right if tok == "AND" else left | right)
        else:
            stack.append({d for d, ts in doc_terms.items() if tok in ts})
    (result,) = stack
    return result


@pytest.fixture(scope="module")
def doc_terms(spark, sf_smoke):
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    return {r["doc_id"]: set(py_tokenize(r["text"])) for r in rows}


@settings(max_examples=8, deadline=None)
@given(query=postfix_exprs)
def test_boolean_retrieval_matches_set_model(spark, sf_smoke, doc_terms, query):
    from bigdata_infra_cs489_spark.operators.index import boolean_retrieval

    got = {r["doc_id"] for r in boolean_retrieval(spark, sf_smoke, query).collect()}
    assert got == py_eval_postfix(query, doc_terms)


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 19), st.integers(0, 19)),
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation equals a driver-side union-find on random
    graphs over 20 nodes (self-loops and duplicate edges included)."""
    from bigdata_infra_cs489_spark.operators.dedup import connected_components

    n = 20
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    want = {}
    comp_min = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    for i in range(n):
        want[i] = comp_min[find(i)]

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(nodes, edf).collect()
    }
    assert got == want


int_rows = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),  # sort key
        st.integers(min_value=0, max_value=100),  # summed value
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(rows=int_rows)
def test_distsort_running_totals_match_python(spark, rows):
    """The distributed range-partitioned prefix sum equals the plain
    sequential prefix sum over the total order, for arbitrary data —
    including duplicates of the sort key (tie-broken by a unique id)."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.distsort import with_running_totals

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    ).repartition(5)
    out = with_running_totals(
        df, [F.asc("k"), F.asc("id")], sums={"rs": "v"}, row_col="rn"
    )
    got = {r.id: (r.rn, r.rs) for r in out.collect()}

    expect = {}
    run = 0
    for n, (i, k, v) in enumerate(
        sorted(((i, k, v) for i, (k, v) in enumerate(rows)), key=lambda t: (t[1], t[0])),
        start=1,
    ):
        run += v
        expect[i] = (n, run)
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(rows=int_rows, n=st.integers(min_value=1, max_value=7))
def test_distsort_ntile_matches_python(spark, rows, n):
    """with_ntile reproduces SQL NTILE bucket sizes and assignment
    (first N % n buckets one row larger) on arbitrary data."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.distsort import with_ntile

    df = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(rows)], "id long, k long"
    ).repartition(3)
    out = with_ntile(df, [F.asc("k"), F.asc("id")], n, "t")
    got = {r.id: r.t for r in out.collect()}

    ordered = sorted(((i, k) for i, (k, _) in enumerate(rows)), key=lambda t: (t[1], t[0]))
    total = len(ordered)
    size, rem = divmod(total, n)
    expect = {}
    pos = 0
    for tile in range(1, n + 1):
        width = size + (1 if tile <= rem else 0)
        for _ in range(width):
            if pos < total:
                expect[ordered[pos][0]] = tile
                pos += 1
    assert got == expect


# --- round-7 family properties ---------------------------------------------

_PII_SNIPPETS = st.sampled_from(
    [
        "mail me at a.b+c@ex-ample.org today",
        "ssn 123-45-6789 ok",
        "call 555-123-4567 or 555.987.6543",
        "card 4111 1111 1111 1111 end",
        "card 4111-1111-1111-1111 end",
        "host 10.0.255.7 and 256.300.1.999",
        "sneaky 999-99-9999.123",
        "a@b.co",
        "",
    ]
)
_pii_texts = st.lists(
    st.one_of(
        _PII_SNIPPETS,
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=50,
        ),
    ),
    min_size=1,
    max_size=6,
).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_pii_texts, min_size=1, max_size=8))
def test_pii_redaction_idempotent_and_matches_python(spark, texts):
    """redact_pii is a fixpoint (placeholders never re-match any
    pattern) and its staged substitution count equals Python `re`'s
    staged replay on arbitrary PII-bearing text."""
    import re as _re

    from bigdata_infra_cs489_spark.operators.pii import PII_PATTERNS, redact_pii

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in redact_pii(docs).collect()}

    for d, t in enumerate(texts):
        clean, nred = t, 0
        for _, pat, ph in PII_PATTERNS:
            nred += len(_re.findall(pat, clean))
            clean = _re.sub(pat, ph, clean)
        if nred == 0:
            assert d not in got
            continue
        assert got[d].clean_text == clean
        assert got[d].n_redactions == nred
        # fixpoint: a second redaction pass changes nothing
        for _, pat, _ph in PII_PATTERNS:
            assert not _re.search(pat, clean), (pat, clean)


@settings(max_examples=12, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa bb", "cc dd", "ee ff", "boiler plate", "x"]),
            min_size=0,
            max_size=5,
        ).map("\n".join),
        min_size=1,
        max_size=6,
    )
)
def test_line_dedup_keep_first_matches_python(spark, docs):
    """Corpus keep-first line dedup on arbitrary newline documents
    matches a pure-Python replay exactly (kept set, counts, reassembly
    order), and the duplicate report reconciles with the per-doc rows —
    after one pass each distinct line survives exactly once corpus-wide,
    which is the idempotence invariant."""
    from bigdata_infra_cs489_spark.operators.linededup import (
        dedup_lines_keep_first,
        dup_line_report,
        newline_lines,
    )

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    out1 = {
        r.doc_id: r for r in dedup_lines_keep_first(df, newline_lines(df)).collect()
    }

    first: dict[str, tuple[int, int]] = {}
    for d, t in enumerate(docs):
        for i, line in enumerate(t.split("\n")):
            first.setdefault(line, (d, i))
    kept_total = 0
    for d, t in enumerate(docs):
        lines = t.split("\n")
        kept = [l for i, l in enumerate(lines) if first[l] == (d, i)]
        kept_total += len(kept)
        r = out1[d]
        assert (r.n_lines, r.kept_lines, r.clean_text) == (
            len(lines),
            len(kept),
            " ".join(kept),
        ), d
    # each distinct line survives exactly once corpus-wide
    assert kept_total == len(first)
    rep = dup_line_report(newline_lines(df)).collect()[0]
    assert rep["n_lines"] == sum(r.n_lines for r in out1.values())
    assert rep["removed_occurrences"] == sum(
        r.n_lines - r.kept_lines for r in out1.values()
    )


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    ch=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
def test_png_codec_roundtrip(w, h, ch, data):
    """encode_png/decode_png are exact inverses for any 8-bit pixel
    buffer at any small geometry and every supported color type."""
    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * ch,
                max_size=w * h * ch,
            )
        )
    )
    assert decode_png(encode_png(w, h, px, ch)) == (w, h, ch, px)


@settings(max_examples=30, deadline=None)
@given(
    ch=st.sampled_from([1, 2]),
    sr=st.integers(min_value=8000, max_value=48000),
    frames=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64
    ),
    n_junk=st.integers(min_value=0, max_value=2),
)
def test_wav_codec_roundtrip_with_junk_chunks(ch, sr, frames, n_junk):
    """encode_wav/decode_wav are exact inverses, and the RIFF walk
    tolerates arbitrary extra chunks (word-aligned, odd sizes padded)
    spliced before the canonical fmt/data pair."""
    import struct

    from bigdata_infra_cs489_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = frames[: len(frames) - len(frames) % ch] or frames[:ch] * ch
    samples = samples[: max(ch, len(samples) - len(samples) % ch)]
    if len(samples) % ch:
        samples = samples + [0] * (ch - len(samples) % ch)
    raw = struct.pack(f"<{len(samples)}h", *samples)
    b = encode_wav(sr, ch, raw)
    assert decode_wav(b) == (sr, ch, samples)
    spliced = b[:12]
    for i in range(n_junk):
        body = bytes([i]) * (3 if i % 2 else 4)  # odd size exercises padding
        spliced += b"JUNK" + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            spliced += b"\x00"
    spliced += b[12:]
    assert decode_wav(spliced) == (sr, ch, samples)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_jpeg_codec_roundtrip_q100(w, h, data):
    """encode_jpeg/decode_jpeg at quality 100 (all-ones quant tables)
    recover any grayscale buffer to within the DCT rounding bound (2),
    and the header geometry exactly — the codec is a real entropy
    coder, not a header shim."""
    import numpy as np

    from bigdata_infra_cs489_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    gw, gh, gc, out = decode_jpeg(encode_jpeg(w, h, px, 1, quality=100))
    assert (gw, gh, gc) == (w, h, 1)
    err = np.abs(
        np.frombuffer(px, np.uint8).astype(int)
        - np.frombuffer(out, np.uint8).astype(int)
    )
    assert err.max() <= 2


# --- PPJoin prefix-filter losslessness ---------------------------------------

_PPJ_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@st.composite
def _near_dup_corpora(draw):
    """Token-list corpora with planted derivations: random base docs
    plus copies perturbed by one insert/delete — the regime where exact
    Jaccard >= 0.5 pairs actually exist, so the losslessness claim is
    exercised on non-empty outputs (uniform random docs almost never
    collide at t = 0.5)."""
    n_base = draw(st.integers(min_value=2, max_value=4))
    docs = [
        draw(st.lists(st.sampled_from(_PPJ_WORDS), min_size=0, max_size=10))
        for _ in range(n_base)
    ]
    for _ in range(draw(st.integers(min_value=1, max_value=5))):
        src = list(docs[draw(st.integers(min_value=0, max_value=len(docs) - 1))])
        op = draw(st.integers(min_value=0, max_value=2))
        if op == 0 and src:
            src.pop(draw(st.integers(min_value=0, max_value=len(src) - 1)))
        elif op == 1:
            src.insert(
                draw(st.integers(min_value=0, max_value=len(src))),
                draw(st.sampled_from(_PPJ_WORDS)),
            )
        # op == 2: verbatim copy (jaccard exactly 1.0)
        docs.append(src)
    return docs


def _py_shingle_set(toks: list[str]) -> set[str]:
    """operators/dedup.py::_shingle_expr in pure Python: distinct word
    3-grams; docs shorter than 3 tokens contribute the whole token
    string (the empty doc's set is {''})."""
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


@settings(max_examples=12, deadline=None)
@given(corpora=_near_dup_corpora())
def test_prefix_join_matches_python_bruteforce(spark, corpora):
    """PPJoin prefix+length filtering (jaccard_prefix_pairs) is LOSSLESS
    against a pure-Python all-pairs exact-Jaccard brute force at t=0.5 —
    the pigeonhole claim itself, pinned on arbitrary corpora with
    planted near-duplicates (including empty docs, verbatim copies, and
    sub-3-token docs) — and the naive count-join twin
    (ngram_jaccard_pairs) emits the identical pair set."""
    from fractions import Fraction

    from bigdata_infra_cs489_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpora)],
        "doc_id bigint, text string",
    )
    sets = [_py_shingle_set(toks) for toks in corpora]
    expected = {}
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if Fraction(inter, union) >= Fraction(1, 2):
                expected[(a, b)] = inter / union

    got_prefix = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(docs).collect()
    }
    got_naive = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs).collect()
    }
    assert set(got_prefix) == set(expected)
    assert set(got_naive) == set(expected)
    for k, v in expected.items():
        assert abs(got_prefix[k] - v) < 1e-6
        assert abs(got_naive[k] - v) < 1e-6


# --- SimHash fingerprint replay ----------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    corpora=st.lists(
        st.lists(st.sampled_from(_PPJ_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_simhash_matches_python(spark, corpora):
    """simhash_fingerprints (tf-weighted per-bit votes over h8(token),
    sign -> 32-bit fingerprint) equals a plain-Python replay on
    arbitrary token corpora. Docs with zero tokens carry no fingerprint
    (the explode drops them) — asserted too."""
    import hashlib
    from collections import Counter

    from bigdata_infra_cs489_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_fingerprints,
    )

    def py_h8(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def py_simhash(toks: list[str]) -> int:
        tf = Counter(toks)
        fp = 0
        for j in range(SIMHASH_BITS):
            v = sum(
                c * (((py_h8(t) >> j) & 1) * 2 - 1) for t, c in tf.items()
            )
            if v > 0:
                fp |= 1 << j
        return fp

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpora)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs).collect()
    }
    expected = {
        i: py_simhash(toks) for i, toks in enumerate(corpora) if toks
    }
    assert got == expected


# --- MinHash signature replay --------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    corpora=st.lists(
        st.lists(st.sampled_from(_PPJ_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_minhash_signatures_match_python(spark, corpora):
    """minhash_signatures (K universal-hash draws over one h8 per
    shingle, min per draw) and the signature_bands ':'-joined band keys
    equal a plain-Python replay on arbitrary corpora — the determinism
    LSH banding, incremental assignment, and the estimate-error card
    all rest on."""
    import hashlib

    from bigdata_infra_cs489_spark.operators.dedup import (
        MINHASH_PRIME,
        NUM_BANDS,
        NUM_HASHES,
        minhash_params,
        minhash_signatures,
        signature_bands,
    )

    def py_h8(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    params = minhash_params(NUM_HASHES)

    def py_sig(toks: list[str]) -> list[int]:
        xs = [py_h8(s) for s in _py_shingle_set(toks)]
        return [min((a * x + b) % MINHASH_PRIME for x in xs) for a, b in params]

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpora)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs).collect()
    }
    expected = {i: py_sig(toks) for i, toks in enumerate(corpora)}
    assert got == expected

    rows = NUM_HASHES // NUM_BANDS
    got_bands = {
        (r["doc_id"], r["band"]): r["band_key"]
        for r in signature_bands(docs).collect()
    }
    expected_bands = {
        (i, b): ":".join(
            str(v) for v in sig[b * rows : (b + 1) * rows]
        )
        for i, sig in expected.items()
        for b in range(NUM_BANDS)
    }
    assert got_bands == expected_bands


# --- CDC chunking: replay + edit locality -------------------------------------


def _py_cdc(toks: list[str]) -> list[tuple[str, int]]:
    """operators/dedup.py::cdc_chunks in pure Python: boundary AFTER
    every token whose h8 is 0 mod CDC_MOD; zero-length tail segment
    (when the last token is itself a boundary) dropped."""
    import hashlib

    from bigdata_infra_cs489_spark.operators.dedup import CDC_MOD

    def h8(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    bs = [i for i, t in enumerate(toks, 1) if h8(t) % CDC_MOD == 0]
    starts = [1] + [p + 1 for p in bs]
    ends = bs + [len(toks)]
    return [
        (" ".join(toks[s - 1 : e]), e - s + 1)
        for s, e in zip(starts, ends)
        if e >= s
    ]


@settings(max_examples=12, deadline=None)
@given(data=st.data())
def test_cdc_chunks_match_python_and_cuts_are_edit_local(spark, data):
    """cdc_chunks equals the plain-Python replay on arbitrary token
    streams, and the content-defined cut rule is EDIT-LOCAL — after a
    single-token insertion, the chunking of the stream beyond the first
    surviving boundary is bit-identical (the docstring's 'inserting one
    token near the front shifts at most one chunk' claim, exercised at
    every insertion point hypothesis finds)."""
    from bigdata_infra_cs489_spark.operators.dedup import cdc_chunks

    # pure-letter words only: the shared tokenizer strips digits, which
    # would desync the raw-token python replay from the Spark text path
    words = [a + b for a in "abcdefgh" for b in "wxyz"]
    toks = data.draw(
        st.lists(st.sampled_from(words), min_size=1, max_size=40)
    )
    ins_pos = data.draw(st.integers(min_value=0, max_value=len(toks)))
    ins_tok = data.draw(st.sampled_from(words))
    edited = toks[:ins_pos] + [ins_tok] + toks[ins_pos:]

    docs = spark.createDataFrame(
        [(0, " ".join(toks)), (1, " ".join(edited))],
        "doc_id bigint, text string",
    )
    rows = cdc_chunks(docs).collect()
    got = {
        d: [
            (r["chunk"], r["chunk_len"])
            for r in sorted(
                (r for r in rows if r["doc_id"] == d),
                key=lambda r: r["chunk_no"],
            )
        ]
        for d in (0, 1)
    }
    assert got[0] == _py_cdc(toks)
    assert got[1] == _py_cdc(edited)

    # edit locality: chunking restarts at every boundary (the cut rule
    # is memoryless), so the suffix past the first boundary at/after
    # the insertion point is chunked identically in both versions
    import hashlib

    from bigdata_infra_cs489_spark.operators.dedup import CDC_MOD

    def h8(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def suffix_after_first_boundary(ts: list[str], cut: int):
        bs = [i for i, t in enumerate(ts, 1) if h8(t) % CDC_MOD == 0]
        later = [b for b in bs if b >= cut]
        if not later:
            return None
        return _py_cdc(ts[later[0] :])

    a = suffix_after_first_boundary(toks, ins_pos + 1)
    b = suffix_after_first_boundary(edited, ins_pos + 2)
    if a is not None:
        assert a == b
