"""Generate the sf1 SCALING fixture: documents + embeddings only, 10x
the sf0.1 row counts, written INSIDE the repo (.fixtures/sf1/) because
/root/testdata is read-only.

Round-9 verdict, What's missing #3: every scale claim >= 10x the bench
SF rested on plan-shape argument (the SCALING studies span only 100x,
sf0.001 -> sf0.1). This fixture extends the measured spread to 1000x
for the dedup/curate/similarity families, which read only these two
tables.

The generator is NOT the driver's (that one is private to the driver);
it is a fresh deterministic synthesizer matched to the MEASURED
statistics of the driver's sf0.1 fixture so the same plans face the
same data shape at 10x volume:
  documents (50,000 rows; sf0.1 has 5,000):
    - the same 31-word vocabulary (read from the sf0.1 parquet),
      uniform word counts calibrated to the 44-577 char length range;
    - lang mix en~40% / de/es/fr/zh ~15% each, 20 sources uniform —
      the sf0.1 proportions;
    - ~4% of docs are near-duplicates (a prefix-preserving perturbed
      copy of an earlier doc; sf0.1: 206/5000 shared-prefix groups)
      and ~0.2% exact duplicates (sf0.1: 8 groups);
  embeddings (20,000 rows; sf0.1 has 2,000):
    - 64-dim unit vectors around 10 cluster centers (labels 0-9, the
      sf0.1 label structure), plus ~1% planted high-cosine near-dup
      pairs so the scoped near-dup family has real work at sf1.

Usage: python -m tools.gen_sf1   (idempotent: skips if up to date)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

OUT_DIR = "/root/repo/.fixtures/sf1"
N_DOCS = 50_000
N_VECS = 20_000
EMB_DIM = 64
N_LABELS = 10
N_SOURCES = 20
SEED = 489


def _vocab_from_sf01() -> list[str]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet') ORDER BY w"
    ).fetchall()
    con.close()
    return [r[0] for r in rows if r[0]]


def gen_documents(rng: np.random.Generator) -> "object":
    import pyarrow as pa

    vocab = np.array(_vocab_from_sf01())
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang_p = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
    texts: list[str] = []
    doc_lang = []
    doc_source = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 100 and r < 0.002:  # exact duplicate of an earlier doc
            j = int(rng.integers(0, i))
            texts.append(texts[j])
        elif i > 100 and r < 0.042:  # near-duplicate: keep prefix, edit tail
            j = int(rng.integers(0, i))
            words = texts[j].split(" ")
            keep = max(4, len(words) - int(rng.integers(1, 4)))
            tail = list(rng.choice(vocab, size=int(rng.integers(0, 3))))
            texts.append(" ".join(words[:keep] + tail))
        else:
            n_words = int(rng.integers(8, 121))
            texts.append(" ".join(rng.choice(vocab, size=n_words)))
        doc_lang.append(str(rng.choice(langs, p=lang_p)))
        doc_source.append(f"src{int(rng.integers(0, N_SOURCES))}")
    return pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(doc_lang, pa.string()),
            "source": pa.array(doc_source, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator) -> "object":
    import pyarrow as pa

    centers = rng.normal(size=(N_LABELS, EMB_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=N_VECS)
    vecs = centers[labels] + rng.normal(scale=0.9, size=(N_VECS, EMB_DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant ~1% high-cosine near-dup pairs (the scoped family's work)
    n_dup = N_VECS // 100
    dup_idx = rng.choice(np.arange(1, N_VECS), size=n_dup, replace=False)
    for i in dup_idx:
        j = int(rng.integers(0, i))
        v = vecs[j] + rng.normal(scale=0.05, size=EMB_DIM)
        vecs[i] = v / np.linalg.norm(v)
        labels[i] = labels[j]
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def main() -> None:
    import pyarrow.parquet as pq

    os.makedirs(OUT_DIR, exist_ok=True)
    docs_path = os.path.join(OUT_DIR, "documents.parquet")
    emb_path = os.path.join(OUT_DIR, "embeddings.parquet")
    if os.path.exists(docs_path) and os.path.exists(emb_path):
        print(f"sf1 fixture already present at {OUT_DIR}; delete to regen")
        return
    rng = np.random.default_rng(SEED)
    docs = gen_documents(rng)
    emb = gen_embeddings(rng)
    pq.write_table(docs, docs_path)
    pq.write_table(emb, emb_path)
    print(
        f"wrote {docs.num_rows} documents, {emb.num_rows} embeddings "
        f"to {OUT_DIR}"
    )


if __name__ == "__main__":
    main()
