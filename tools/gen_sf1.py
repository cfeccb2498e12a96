"""Generate the sf1 SCALING fixture: documents + embeddings (round 10)
plus events + lineitem (round 12), 10x the sf0.1 row counts, written
INSIDE the repo (.fixtures/sf1/) because /root/testdata is read-only.

Round-9 verdict, What's missing #3: every scale claim >= 10x the bench
SF rested on plan-shape argument (the SCALING studies span only 100x,
sf0.001 -> sf0.1). This fixture extends the measured spread to 1000x.
Round-11 verdict #6 extends it beyond the text families: events
(streaming/temporal lineages) and lineitem (the relational q1-q7
family) so those 1000x claims are measured, not plan-shape-argued.
Round 12 (continuation) completes the relational star: orders /
customer / supplier / part at 10x sf0.1 (keys consistent with the
sf1 lineitem already generated: l_orderkey < 1.5M, l_partkey < 200k,
l_suppkey < 10k), plus nation/region copied VERBATIM from sf0.1
(fixed-size dimensions, identical at every SF by construction) — so
the join-heavy q2-q5/q7 family and the customer/supplier extensions
get measured 1000x rows instead of plan-shape argument.

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


N_EVENTS = 1_000_000  # sf0.1 has 100,000
N_EVENT_USERS = 15_000  # sf0.1 has 1,500 (fixed 30-day span, denser traffic)
N_LINEITEM = 6_000_000  # sf0.1 has 600,000


def gen_events(rng: np.random.Generator) -> "object":
    """events matched to the driver fixture's measured statistics:
    timestamps uniform over the SAME 30-day window (2024-01, so windowed
    lineages face 10x denser traffic, the way a fixed-retention stream
    scales), 5 uniform event types, value ~ Exp(mean 50) rounded 2dp
    (sf0.1: min 0.0 / avg 49.87 / max 560), props = {"k": uniform
    0..99}, users scaled 10x (sf0.1: 1,500)."""
    import pyarrow as pa

    span_start = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, size=N_EVENTS))
    types = np.array(["click", "error", "purchase", "signup", "view"])
    value = np.round(rng.exponential(scale=50.0, size=N_EVENTS), 2)
    ks = rng.integers(0, 100, size=N_EVENTS)
    return pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), pa.int64()),
            "ts": pa.array(
                span_start + ts.astype("timedelta64[us]"), pa.timestamp("us")
            ),
            "user_id": pa.array(
                rng.integers(0, N_EVENT_USERS, size=N_EVENTS), pa.int64()
            ),
            "event_type": pa.array(
                types[rng.integers(0, 5, size=N_EVENTS)], pa.string()
            ),
            "value": pa.array(value, pa.float64()),
            "props": pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
        }
    )


def gen_lineitem(rng: np.random.Generator) -> "object":
    """lineitem matched to the driver fixture's measured statistics:
    uniform A/N/R x F/O flags, quantity 1..50, extendedprice ~U(900,
    105000) 2dp, discount {0.00..0.10}, tax {0.00..0.08}, shipdate
    uniform over 1995-01-02..2001-11-04, keys scaled 10x (orderkey
    ~N/4 distinct, partkey 200k, suppkey 10k, linenumber 1..7)."""
    import pyarrow as pa

    n = N_LINEITEM
    ship_start = np.datetime64("1995-01-02")
    ship_days = int(
        (np.datetime64("2001-11-04") - ship_start) / np.timedelta64(1, "D")
    )
    rf = np.array(["A", "N", "R"])
    ls = np.array(["F", "O"])
    return pa.table(
        {
            "l_orderkey": pa.array(
                rng.integers(0, n // 4, size=n), pa.int64()
            ),
            "l_partkey": pa.array(rng.integers(0, 200_000, size=n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, 10_000, size=n), pa.int64()),
            "l_linenumber": pa.array(
                rng.integers(1, 8, size=n).astype(np.int32), pa.int32()
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, size=n).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900.0, 105_000.0, size=n), 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, size=n) / 100.0, 2), pa.float64()
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, size=n) / 100.0, 2), pa.float64()
            ),
            "l_returnflag": pa.array(rf[rng.integers(0, 3, size=n)], pa.string()),
            "l_linestatus": pa.array(ls[rng.integers(0, 2, size=n)], pa.string()),
            "l_shipdate": pa.array(
                ship_start + rng.integers(0, ship_days + 1, size=n).astype(
                    "timedelta64[D]"
                ),
                pa.timestamp("us"),
            ),
        }
    )


N_ORDERS = 1_500_000  # sf0.1 has 150,000; matches lineitem's l_orderkey range
N_CUSTOMER = 150_000  # sf0.1 has 15,000
N_SUPPLIER = 10_000  # sf0.1 has 1,000; matches l_suppkey range
N_PART = 200_000  # sf0.1 has 20,000; matches l_partkey range
N_NATIONS = 25


def gen_orders(rng: np.random.Generator) -> "object":
    """orders matched to the driver fixture's measured statistics:
    o_orderkey contiguous 0..N-1 (sf0.1: 150k rows, all distinct),
    o_custkey uniform over the customer key space, status uniform
    F/O/P, totalprice ~U(1000, 500000) 2dp (sf0.1: min 1001.91 / avg
    250156 / max 499993), orderdate uniform midnight-stamped days over
    1995-01-01..2001-08-01, priority uniform over the 5 TPC-H strings."""
    import pyarrow as pa

    n = N_ORDERS
    start = np.datetime64("1995-01-01")
    days = int((np.datetime64("2001-08-01") - start) / np.timedelta64(1, "D"))
    status = np.array(["F", "O", "P"])
    prio = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )
    return pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, N_CUSTOMER, size=n), pa.int64()
            ),
            "o_orderstatus": pa.array(
                status[rng.integers(0, 3, size=n)], pa.string()
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000.0, 500_000.0, size=n), 2),
                pa.float64(),
            ),
            "o_orderdate": pa.array(
                start + rng.integers(0, days + 1, size=n).astype(
                    "timedelta64[D]"
                ),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                prio[rng.integers(0, 5, size=n)], pa.string()
            ),
        }
    )


def gen_customer(rng: np.random.Generator) -> "object":
    """customer: c_custkey contiguous, c_name 'Customer#%09d',
    c_nationkey uniform int32 0..24, c_acctbal ~U(-1000, 10000) 2dp
    (sf0.1: min -999.85 / avg 4547 / max 9999.8), mktsegment uniform
    over the 5 TPC-H segments."""
    import pyarrow as pa

    n = N_CUSTOMER
    seg = np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )
    return pa.table(
        {
            "c_custkey": pa.array(range(n), pa.int64()),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n)], pa.string()
            ),
            "c_nationkey": pa.array(
                rng.integers(0, N_NATIONS, size=n).astype(np.int32), pa.int32()
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000.0, 10_000.0, size=n), 2),
                pa.float64(),
            ),
            "c_mktsegment": pa.array(
                seg[rng.integers(0, 5, size=n)], pa.string()
            ),
        }
    )


def gen_supplier(rng: np.random.Generator) -> "object":
    """supplier: s_suppkey contiguous, s_name 'Supplier#%09d',
    s_nationkey uniform int32 0..24, s_acctbal ~U(-1000, 10000) 2dp."""
    import pyarrow as pa

    n = N_SUPPLIER
    return pa.table(
        {
            "s_suppkey": pa.array(range(n), pa.int64()),
            "s_name": pa.array(
                [f"Supplier#{i:09d}" for i in range(n)], pa.string()
            ),
            "s_nationkey": pa.array(
                rng.integers(0, N_NATIONS, size=n).astype(np.int32), pa.int32()
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-1000.0, 10_000.0, size=n), 2),
                pa.float64(),
            ),
        }
    )


def gen_part(rng: np.random.Generator) -> "object":
    """part: p_partkey contiguous, p_name 'adj noun' uniform over the
    sf0.1 8x8 vocabulary (64 distinct names), p_brand uniform
    Brand#1..25, p_type uniform over the 6 sf0.1 types, p_size 1..50,
    p_retailprice ~U(900, 1000) 2dp."""
    import pyarrow as pa

    n = N_PART
    adjs = np.array(
        ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    )
    nouns = np.array(
        ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
    )
    types = np.array(
        ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    )
    names = [
        f"{adjs[a]} {nouns[b]}"
        for a, b in zip(
            rng.integers(0, 8, size=n), rng.integers(0, 8, size=n)
        )
    ]
    return pa.table(
        {
            "p_partkey": pa.array(range(n), pa.int64()),
            "p_name": pa.array(names, pa.string()),
            "p_brand": pa.array(
                [f"Brand#{int(i)}" for i in rng.integers(1, 26, size=n)],
                pa.string(),
            ),
            "p_type": pa.array(types[rng.integers(0, 6, size=n)], pa.string()),
            "p_size": pa.array(
                rng.integers(1, 51, size=n).astype(np.int32), pa.int32()
            ),
            "p_retailprice": pa.array(
                np.round(rng.uniform(900.0, 1000.0, size=n), 2), pa.float64()
            ),
        }
    )


def _copy_dim(table: str):
    """nation/region are fixed-size dimensions, identical at every SF
    (verified across sf0.001/0.01/0.1) — copy sf0.1 verbatim so sf1
    joins see the exact same dimension rows."""

    def gen(_rng: np.random.Generator) -> "object":
        import pyarrow.parquet as pq

        return pq.read_table(f"/root/testdata/sf0.1/{table}.parquet")

    return gen


def main() -> None:
    import pyarrow.parquet as pq

    os.makedirs(OUT_DIR, exist_ok=True)
    # per-table idempotence with per-table seeds: adding a new family
    # never perturbs (or requires regenerating) an existing one
    tables = [
        ("documents.parquet", gen_documents, SEED),
        ("embeddings.parquet", gen_embeddings, SEED + 1),
        ("events.parquet", gen_events, SEED + 2),
        ("lineitem.parquet", gen_lineitem, SEED + 3),
        ("orders.parquet", gen_orders, SEED + 4),
        ("customer.parquet", gen_customer, SEED + 5),
        ("supplier.parquet", gen_supplier, SEED + 6),
        ("part.parquet", gen_part, SEED + 7),
        ("nation.parquet", _copy_dim("nation"), SEED + 8),
        ("region.parquet", _copy_dim("region"), SEED + 9),
    ]
    wrote = []
    for fname, gen, seed in tables:
        path = os.path.join(OUT_DIR, fname)
        if os.path.exists(path):
            continue
        tbl = gen(np.random.default_rng(seed))
        pq.write_table(tbl, path)
        wrote.append(f"{tbl.num_rows} {fname}")
    if wrote:
        print(f"wrote {', '.join(wrote)} to {OUT_DIR}")
    else:
        print(f"sf1 fixture already present at {OUT_DIR}; delete to regen")


if __name__ == "__main__":
    main()
