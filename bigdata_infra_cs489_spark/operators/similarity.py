"""Similarity search over the embeddings table (north-star extension).

No reference counterpart; designed Spark-first for vector corpora that
don't fit one machine:

- brute-force cosine top-k: the exactness baseline. dot/norm are
  higher-order column expressions (zip_with + aggregate) — JVM-side,
  no Python in the hot path. Top-k is TakeOrderedAndProject
  (per-partition heaps, driver merge), never a global sort.
- IVF (inverted-file) ANN: coarse-quantize every vector to its nearest
  centroid (broadcast centroid join), probe only the query's top
  ``nprobe`` centroid partitions, exact-rank inside. At 100 TB the
  assignment is one broadcast join + narrow shuffle-free scan, and a
  probe touches ~nprobe/C of the data. Centroids here are the
  deterministic first C vectors (a k-means step would drop in without
  changing the dataflow).
- pairwise cosine near-dup: embedding-space near-duplicate detection;
  exact all-pairs via a block-pair grid of per-task BLAS matmuls — the
  LSH/IVF bucketing above is the path for corpora where even a blocked
  n^2 is too much.

Single-vector scoring paths (cosine_topk, IVF probe) stay as JVM
higher-order column expressions — one dot per row is cheap there; the
batch-matmul Pandas kernels are reserved for the all-pairs / all-planes
shapes where the interpreted-lambda cost multiplies.

All math is float64 over the float32 fixtures (identical widening in
Spark and DuckDB, so oracle hashes match at 6 decimals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numerics import floor_round

from ..sources.tables import load

QUERY_VEC_ID = 0
TOP_K = 10
N_CENTROIDS = 16
# Lloyd iterations for the spherical k-means trainer. ONE constant shared
# by the inline trainer (kmeans_centroids), the standing trained-quantizer
# asset (standing_kmeans_centroids / kmeans_model_path), and the trained
# IVF probe — a per-signature default of 3 let the trainer and the served
# model drift if either changed (round-13 advisory).
KMEANS_ITERATIONS = 3
N_PROBE = 2
PAIR_THRESHOLD = 0.9
# The cosine threshold the REGISTERED near-dup queries run at. The
# operator default stays PAIR_THRESHOLD = 0.9 (the production SemDeDup
# setting), but the driver's random-embedding fixtures contain ZERO
# pairs at 0.9 at every SF, so a hash-green driver row there proved
# only "no false positives" — the pair-finding path was never
# externally exercised on a non-empty result (round-9 verdict, What's
# wrong #1). 0.4 is the threshold where every fixture SF carries real
# pair signal (66 exact pairs at sf0.001). SEMANTIC CHANGE, round 10:
# the registered names embedding_near_duplicates and
# semantic_dedup_keep_best now emit the 0.4-threshold result (both
# re-enter the driver window this round); callers wanting the
# production setting pass threshold=PAIR_THRESHOLD explicitly.
REGISTERED_PAIR_THRESHOLD = 0.4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# --- SQL-text expression builders ---------------------------------------
#
# The model-literal expressions of this family (argmax-centroid, PQ code
# derivation, ADC tables, RP sign rows) are large: C or m*k subtrees of
# dim-element literal arrays. Built through the Column API every literal
# and every higher-order function is its own py4j round-trip (~0.4 ms),
# so CONSTRUCTING e.g. the ADC column costs seconds of driver time per
# query invocation — an order of magnitude more than executing it (the
# round-15 profile: pq_topk 9.0 s of 9.8 s in _pq_adc_dist construction,
# 13,876 py4j commands). Building the SAME expression as one SQL string
# parsed by one F.expr() call produces an identical Catalyst tree (the
# parser maps each SQL function to the same expression node the Column
# API builds) for ~3 py4j calls total. repr() doubles round-trip: both
# Python's repr and Java's Double.parseDouble are correctly rounded, so
# `repr(x) + "D"` parses to exactly the same IEEE double the old
# F.lit(x) carried (pinned by tests/test_similarity.py's NumPy replays
# and the cross-engine oracle hashes).


def _dlit(x: float) -> str:
    """SQL DOUBLE literal that parses to exactly this IEEE double.

    Non-finite guard (round-15 advisory): repr() yields 'nan'/'inf',
    which the SQL parser rejects as literals — emit the CAST spelling
    instead so a NaN/Inf in a model vector builds the same column
    F.lit() used to produce rather than a ParseException."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def _arr_dlit(vec) -> str:
    return "array(" + ",".join(_dlit(x) for x in vec) + ")"


def _dot_sql(a: str, b: str) -> str:
    """SQL-text twin of _dot — same fold, same tree."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
        " (acc, v) -> acc + v)"
    )


def _sq_dist_sql(a: str, b: str) -> str:
    """Σ(x-c)² as a LEFT-TO-RIGHT fold — the DuckDB oracle sums in the
    same element order, so distances (hence argmins) stay bit-identical
    across engines."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0.0D,"
        " (acc, v) -> acc + v)"
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
) -> DataFrame:
    """Exact top-k by cosine against the query vector (brute force).

    The query vector is a 1-row broadcast (crossJoin of a broadcast side is
    a BroadcastNestedLoopJoin with 1 row — effectively map-side)."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), F.col("q")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _model_rows(
    spark: SparkSession,
    sf_dir: str,
    n_model: int,
    query_vec_id: int | None = None,
) -> tuple[list[tuple[int, list[float]]], list[float] | None]:
    """ONE scan+collect serving every driver-side model surface of a
    probe query: (id-ascending [(vec_id, embedding)] for vec_id <
    n_model, the query row's embedding or None). The centroid list, the
    PQ sub-centroid tensor, and the query vector were always the same
    first-k rows collected up to four separate times per invocation
    (each its own Spark job); this folds them into one job."""
    cond = F.col("vec_id") < n_model
    if query_vec_id is not None:
        cond = cond | (F.col("vec_id") == query_vec_id)
    rows = {
        int(r["vec_id"]): list(r["embedding"])
        for r in _emb(spark, sf_dir).where(cond).collect()
    }
    cents = [(i, rows[i]) for i in sorted(rows) if i < n_model]
    qvec = rows.get(query_vec_id) if query_vec_id is not None else None
    return cents, qvec


def _centroid_rows(
    spark: SparkSession, sf_dir: str, n_centroids: int
) -> list[tuple[int, list[float]]]:
    """The deterministic first-C (centroid_id, vector) pairs, collected
    driver-side (model-sized: C x dim doubles, the same discipline as
    _hyperplanes), ascending id."""
    return _model_rows(spark, sf_dir, n_centroids)[0]


def _nearest_centroid_col(cents: list[tuple[int, list[float]]]) -> Column:
    """argmax-cosine centroid id as ONE narrow column expression over
    model-sized centroid literals — ties to the lowest id (the list is
    id-ascending, and array_position takes the FIRST max). The previous
    shape (crossJoin with a broadcast centroid table, then
    groupBy(vec_id) max_by) re-shuffled C x corpus rows just to argmax
    them back together; at 100 TB that is a C-fold amplified exchange
    for a computation that needs no exchange at all.

    Constant-factor care: higher-order folds are interpreted, so the row
    norm dot(a,a) is hoisted into ONE fold shared by all C cosines, and
    each centroid's norm is a Python-computed literal (same left-to-right
    fold order as the column expression, so the double is bit-identical)
    — C+1 folds per row instead of 3C. (Unrolling the dots into literal
    expression trees was tried in round 9 and is ~3x SLOWER: the
    C*dim-node tree blows the whole-stage-codegen method budget and
    falls back to interpreted expression evaluation, which loses to the
    fold's tight closure loop. The whole expression is now assembled as
    SQL text and parsed by ONE F.expr call — identical tree, none of
    the per-literal py4j construction cost; see the _dlit block.)"""

    def cnorm(vec: list[float]) -> float:
        acc = 0.0
        for x in vec:
            acc = acc + x * x
        return acc**0.5

    row_norm = f"SQRT({_dot_sql('embedding', 'embedding')})"
    darr = "array(" + ",".join(
        f"({_dot_sql('embedding', _arr_dlit(vec))})"
        f" / ({row_norm} * {_dlit(cnorm(vec))})"
        for _, vec in cents
    ) + ")"
    ids = "array(" + ",".join(str(int(cid)) for cid, _ in cents) + ")"
    return F.expr(
        f"CAST(element_at({ids}, CAST(array_position({darr},"
        f" array_max({darr})) AS INT)) AS INT)"
    )


def ivf_assignments(
    spark: SparkSession, sf_dir: str, n_centroids: int = N_CENTROIDS
) -> DataFrame:
    """(vec_id, centroid_id): nearest centroid by cosine, ties to the
    lowest centroid id. One shuffle-free narrow scan (see
    _nearest_centroid_col)."""
    emb = _emb(spark, sf_dir)
    cents = _centroid_rows(spark, sf_dir, n_centroids)
    return emb.select(
        "vec_id", _nearest_centroid_col(cents).alias("centroid_id")
    )


CB_SAMPLE_SALT = "cbsample-v1"
_CB_PPM = 1_000_000


def cluster_balanced_sample(
    spark: SparkSession, sf_dir: str, n_centroids: int = N_CENTROIDS
) -> DataFrame:
    """(vec_id, centroid_id): an embedding-cluster-BALANCED sample of the
    corpus — every vector is assigned to its nearest centroid, each
    cluster is downsampled toward the smallest cluster's mass
    (keep_ppm = min_size * 1e6 // size, pure int64), and membership is
    decided by the portable salted hash of vec_id. The topic-rebalancing
    step of an embedding-curated pipeline (the SemDeDup observation:
    over-represented semantic clusters contribute redundant gradient
    signal), with the same determinism contract as every sampler here —
    identical membership across runs, engines, and partitionings.

    Scale shape: assignment is the shuffle-free narrow scan of
    _nearest_centroid_col; cluster sizes are ONE partial-aggregated pass
    down to C rows collected driver-side (the lang_mixture_rates O(tiny)
    collect discipline — a second DataFrame branch referencing the
    global min would make Catalyst evaluate the assignment scan twice
    inside one job with no sharing); the keep decision is a map-side
    literal-map lookup + hash compare. No join, no shuffle.
    """
    from ..functions.hashing import h8

    emb = _emb(spark, sf_dir)
    cents = _centroid_rows(spark, sf_dir, n_centroids)
    if not cents:
        # empty corpus (or no seed vectors): empty result with the
        # normal schema instead of ValueError-ing on min() — the same
        # degrade-to-empty contract as the sibling samplers
        return spark.createDataFrame([], "vec_id bigint, centroid_id int")
    assign = _nearest_centroid_col(cents).alias("centroid_id")
    assigned = emb.select("vec_id", assign)
    counts = {
        int(r["centroid_id"]): int(r["n"])
        for r in assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    mn = min(counts.values())
    ppm_map = F.create_map(
        *[
            F.lit(v)
            for cid, n in sorted(counts.items())
            for v in (cid, mn * _CB_PPM // n)
        ]
    )
    bucket = h8(F.concat(F.col("vec_id").cast("string"), F.lit(CB_SAMPLE_SALT)))
    return assigned.where(
        bucket % _CB_PPM < F.element_at(ppm_map, F.col("centroid_id"))
    )


def _rank_centroids_local(
    cents: list[tuple[int, list[float]]], qvec: list[float], nprobe: int
) -> list[int]:
    """The ONE probe rule every IVF variant shares: rank centroids by
    cosine to the query (desc, centroid_id tie-break), return the
    top-nprobe ids. Scan-side, trained, PQ-combined, and bucketed-index
    probes all route through here — cross-variant identity of this rule
    is part of the oracle contract ("identical results to ivf_topk"),
    so it must not be re-implemented per variant.

    Driver-side on model-sized state (C rows) instead of the previous
    C-row Spark job: the arithmetic replicates _cosine's exact fold
    (left-to-right fp64 adds; math.sqrt is correctly rounded like JVM
    Math.sqrt; IEEE multiply is commutative), the _nearest_centroid_col
    cnorm precedent. Ordering mirrors Spark's double sort (NaN greatest
    -> first under DESC; -0.0 == 0.0 ties fall to the id)."""
    import math

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    qn = math.sqrt(dot(qvec, qvec))
    scored = []
    for cid, v in cents:
        cos = dot(v, qvec) / (math.sqrt(dot(v, v)) * qn)
        scored.append((cid, cos))
    scored.sort(
        key=lambda t: (
            0 if math.isnan(t[1]) else 1,
            0.0 if math.isnan(t[1]) else -t[1],
            t[0],
        )
    )
    return [cid for cid, _ in scored[:nprobe]]


def probe_centroid_ids(cent_df: DataFrame, q: DataFrame, nprobe: int) -> list[int]:
    """DataFrame adapter over _rank_centroids_local for callers holding
    (centroid_id, cvec) / single-row (q) frames rather than collected
    model rows. Same rule, same ordering."""
    qrows = q.limit(1).collect()
    if not qrows:
        return []
    cents = [
        (int(r["centroid_id"]), list(r["cvec"])) for r in cent_df.collect()
    ]
    return _rank_centroids_local(cents, list(qrows[0]["q"]), nprobe)


def query_embedding(emb: DataFrame, query_vec_id: int) -> list | None:
    """The query row's embedding as a driver-side list, or None when the
    id is absent — probe entry points degrade to an empty result instead
    of IndexError'ing on a missing id."""
    rows = (
        emb.where(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .limit(1)
        .collect()
    )
    return list(rows[0]["embedding"]) if rows else None


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """ANN top-k: rank only vectors assigned to the query's top-nprobe
    centroids. Deterministic; the oracle replicates the same probe rule.

    Plan shape: centroid ranking is a C-row Spark job (same fold
    arithmetic as the assignment expression) whose nprobe winners are
    collected as a scalar id list; the probe itself is then ONE narrow
    scan — inline argmax assignment + literal IN filter + rerank —
    with zero joins and zero shuffles before the final top-k."""
    emb = _emb(spark, sf_dir)
    cents, qvec = _model_rows(spark, sf_dir, n_centroids, query_vec_id)
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    probed = (
        _rank_centroids_local(cents, qvec, nprobe) if qvec is not None else []
    )
    return (
        emb.where(_nearest_centroid_col(cents).isin(probed))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), F.col("q")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def semantic_search(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
) -> DataFrame:
    """End-to-end cross-modal retrieval: exact top-k in embedding space,
    then the k-row result broadcast-joins back to the documents table for
    the payload (doc_id == vec_id row correspondence). The expensive side
    (vector scan) never carries text; only k winners touch the wide table.
    """
    top = cosine_topk(spark, sf_dir, query_vec_id, k)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        F.broadcast(top)
        .join(docs, top.vec_id == docs.doc_id)
        .select("doc_id", "cosine", "text")
    )


def kmeans_centroids(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = N_CENTROIDS,
    iterations: int = KMEANS_ITERATIONS,
) -> DataFrame:
    """Spherical k-means (Lloyd's) over unit-normalized vectors:
    (centroid_id, cvec array<double>).

    DataFrame-iterative like the PageRank loop, with the per-iteration
    pass shaped like MLlib's treeAggregate: broadcast the current C×dim
    centroid matrix, then one ``mapInPandas`` scan where each Arrow batch
    does a single BLAS matmul (U @ C.T), argmax-assigns its vectors (ties
    to the lowest centroid id = lowest row index), and emits per-centroid
    partial sums + counts. Only those model-sized partials (≤ C rows per
    batch, C×dim doubles) cross to the driver, which finishes the means
    and renormalizes — data-sized rows never leave the executors, so the
    pass is a narrow linear scan at any corpus size. Init = first C
    vectors (deterministic; the same rule the static IVF uses).
    """
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir)
    # norm once per row (a sibling column, not inside the transform lambda —
    # there it would be re-evaluated per element), then cache the unit
    # vectors: every iteration re-reads them.
    unit = (
        emb.select(
            "vec_id",
            F.col("embedding").alias("e"),
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
        .select("vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("u"))
        .cache()
    )
    cent_rows = sorted(
        unit.where(F.col("vec_id") < n_centroids).collect(),
        key=lambda r: int(r["vec_id"]),
    )
    # row index in the broadcast matrix == centroid_id (0..C-1), so
    # np.argmax's first-max rule reproduces the ties-to-lowest-id rule
    centroids = [(int(r["vec_id"]), list(r["u"])) for r in cent_rows]
    sc = spark.sparkContext

    for _ in range(iterations):
        cmat = np.array([vec for _, vec in centroids], dtype=np.float64)
        bc = sc.broadcast(cmat)

        def partial_sums(batches):
            cm = bc.value
            k, dim = cm.shape
            for pdf in batches:
                if not len(pdf):
                    continue
                u = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["u"]]
                )
                assign = (u @ cm.T).argmax(axis=1)
                sums = np.zeros((k, dim))
                np.add.at(sums, assign, u)
                cnts = np.bincount(assign, minlength=k)
                live = cnts > 0
                yield pd.DataFrame(
                    {
                        "centroid_id": np.arange(k)[live],
                        "psum": list(sums[live]),
                        "cnt": cnts[live],
                    }
                )

        # Spark-side reduce of the per-batch partials BEFORE the collect:
        # O(C x dim) driver traffic per iteration regardless of how many
        # Arrow batches the scan produced (at 100 TB the raw partials are
        # millions of model-sized frames). The reduce is posexplode ->
        # groupBy(centroid_id, pos) -> sum: the plan stays O(1) in dim
        # (one aggregate expression, not one per dimension — at embedding
        # dim 2-4k the per-dim form generates thousands of codegen'd
        # aggregates), while F.sum still gets Tungsten map-side partial
        # aggregation, unlike a collect_list-and-fold which would buffer
        # every batch partial per centroid. cnt rides along on pos 0 so
        # one pass reduces both.
        dim = cmat.shape[1]
        reduced = (
            unit.mapInPandas(
                partial_sums, "centroid_id int, psum array<double>, cnt long"
            )
            .select(
                "centroid_id", "cnt", F.posexplode("psum").alias("pos", "v")
            )
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum("v").alias("s"),
                F.sum(
                    F.when(F.col("pos") == 0, F.col("cnt")).otherwise(F.lit(0))
                ).alias("c"),
            )
            .collect()
        )
        sums: dict[int, np.ndarray] = {}
        cnts: dict[int, int] = {}
        for r in reduced:
            cid = int(r["centroid_id"])
            if cid not in sums:
                sums[cid] = np.zeros(dim, dtype=np.float64)
            sums[cid][int(r["pos"])] = r["s"]
            if int(r["pos"]) == 0:
                cnts[cid] = int(r["c"])
        new_centroids = []
        for cid, vec in centroids:
            if cnts.get(cid, 0):
                m = sums[cid] / cnts[cid]
                nrm = float(np.sqrt(m @ m))
                # zero-vector mean (or empty cluster) keeps the previous
                # centroid
                if nrm > 0:
                    vec = (m / nrm).tolist()
            new_centroids.append((cid, vec))
        centroids = new_centroids
        bc.unpersist()

    unit.unpersist()
    return spark.createDataFrame(centroids, "centroid_id int, cvec array<double>")


# Bump on ANY change to the trainer (init rule, iteration semantics, the
# normalization) — the DEDUP_INDEX_VERSION discipline;
# tests/test_similarity.py::test_standing_kmeans_matches_inline
# re-derives the inline training against the asset so a missed bump
# still fails CI on the test fixtures.
KMEANS_MODEL_VERSION = 1


def kmeans_model_path(
    sf_dir: str, n_centroids: int, iterations: int
) -> str:
    """Deterministic standing trained-quantizer location for one data
    generation, keyed on the embeddings parquet's (size, mtime_ns), the
    centroid count, the iteration count and KMEANS_MODEL_VERSION."""
    import os

    from .vector_index import INDEX_ROOT

    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    sig = f"{st.st_size}_{st.st_mtime_ns}"
    label = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        INDEX_ROOT,
        f"kmeansmodel_v{KMEANS_MODEL_VERSION}_{label}_{sig}"
        f"_c{n_centroids}i{iterations}",
    )


def standing_kmeans_centroids(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = N_CENTROIDS,
    iterations: int = KMEANS_ITERATIONS,
) -> DataFrame:
    """The trained coarse quantizer (centroid_id, cvec) served as a
    STANDING asset — the model-registry entry a production vector index
    trains once and every probe/build job reads. Built on first touch by
    the inline kmeans_centroids loop (the honest training price, paid
    once per data generation) and published with the dedup-index atomic
    protocol, then probed as a parquet scan by the trained-IVF
    consumers; the registered ivf_train_centroids card stays the inline
    trainer. Values are bit-identical (the centroid doubles are computed
    driver-side and parquet round-trips them exactly); the DuckDB
    oracles replay the unrolled-k-means chain, unchanged."""
    import os
    import shutil
    import uuid

    from .dedup import _publish_subdir

    path = kmeans_model_path(sf_dir, n_centroids, iterations)
    sub = os.path.join(path, "centroids")
    if not os.path.exists(os.path.join(sub, "_SUCCESS")):
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(
            path, f"centroids.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        )
        kmeans_centroids(
            spark, sf_dir, n_centroids, iterations
        ).write.mode("overwrite").parquet(tmp)
        _publish_subdir(tmp, sub)
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(sub)


N_HYPERPLANES = 16
LSH_BAND_BITS = 4
LSH_N_BANDS = N_HYPERPLANES // LSH_BAND_BITS


def _hyperplanes(spark: SparkSession, sf_dir: str, n_hyperplanes: int):
    """The deterministic hyperplane matrix (row order = h_id = vec_id):
    bit j of every LSH code is sign(dot(v, row j))."""
    import numpy as np

    rows = _model_rows(spark, sf_dir, n_hyperplanes)[0]
    return np.array([v for _, v in rows], dtype=np.float64)


def lsh_codes(
    spark: SparkSession, sf_dir: str, n_hyperplanes: int = N_HYPERPLANES
) -> DataFrame:
    """(vec_id, code): 16-bit random-hyperplane (sign) LSH code per vector —
    bit j set iff dot(v, h_j) > 0. Hyperplanes are the deterministic first
    ``n_hyperplanes`` vectors (the same convention the static IVF uses for
    centroids), so the whole computation is oracle-reproducible.

    Scale shape: one broadcast of the tiny hyperplane matrix (16 x dim
    doubles — model-sized), then a single narrow ``mapInPandas`` pass where
    each Arrow batch computes all 16 sign bits at once with one float64
    BLAS matmul and packs them into the code. No shuffle, no O(n^2)
    anywhere; the scan parallelizes with the input partitioning.
    """
    emb = _emb(spark, sf_dir)
    hmat = _hyperplanes(spark, sf_dir, n_hyperplanes)
    return lsh_codes_for(spark, emb, hmat)


def lsh_codes_for(spark: SparkSession, vectors: DataFrame, hmat) -> DataFrame:
    """The ONE sign-bit/pack kernel behind every LSH code computation:
    (vec_id, embedding) rows -> (vec_id, code) via a broadcast hyperplane
    matrix and a per-Arrow-batch BLAS matmul. ``lsh_codes`` (build/scan)
    and ``vector_index.append_to_vector_index`` (incremental maintenance)
    both route through here — appended vectors land in the same buckets
    as built ones because there is exactly one code path to drift."""
    import numpy as np
    import pandas as pd

    weights = (np.int64(1) << np.arange(hmat.shape[0], dtype=np.int64))
    bc = spark.sparkContext.broadcast(hmat)

    def codes(batches):
        hm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            bits = (u @ hm.T) > 0
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "code": bits.astype(np.int64) @ weights,
                }
            )

    return vectors.select("vec_id", "embedding").mapInPandas(
        codes, "vec_id bigint, code bigint"
    )


def lsh_bands(codes: DataFrame) -> DataFrame:
    """(vec_id, band, band_val): each code split into its LSH_N_BANDS
    band values — the single owner of the banding scheme (lsh_topk and the
    pruning tests both derive candidates from this)."""
    band_ids = F.array(*[F.lit(b) for b in range(LSH_N_BANDS)])
    mask = (1 << LSH_BAND_BITS) - 1
    return codes.select(
        "vec_id", "code", F.explode(band_ids).alias("band")
    ).select(
        "vec_id",
        "band",
        F.expr(f"shiftright(code, band * {LSH_BAND_BITS}) & {mask}").alias(
            "band_val"
        ),
    )


def lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
) -> DataFrame:
    """ANN top-k via banded sign-LSH: candidates are vectors sharing at
    least one of the LSH_N_BANDS band values with the query's code; exact
    cosine reranks the candidates. The third ANN family next to brute
    force (exactness baseline) and IVF (partition-probe): LSH needs no
    trained structure and its candidate generation is a pure equi-join on
    (band, band_value) — at 100 TB that's one shuffle of narrow
    (vec_id, band, value) rows against a handful of query band rows
    (broadcast), never a distance computation outside the candidate set.
    """
    import numpy as np

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    # the query's band values are computed driver-side from the same
    # hyperplane matrix and same float64 matmul as lsh_codes (a 1-row
    # model-sized computation) — referencing the distributed codes subtree
    # a second time would re-run the whole Python scan just to read one row.
    # One _model_rows collect serves both the hyperplanes and the query
    # row; the codes table reuses the same matrix via lsh_codes_for.
    hrows, qrow = _model_rows(spark, sf_dir, N_HYPERPLANES, query_vec_id)
    hmat = np.array([v for _, v in hrows], dtype=np.float64)
    codes = lsh_codes_for(spark, emb, hmat)
    qvec = np.asarray(qrow, dtype=np.float64)
    bits = (qvec @ hmat.T) > 0
    qcode = int(
        (bits.astype(np.int64) * (np.int64(1) << np.arange(hmat.shape[0]))).sum()
    )
    # "shares >= 1 band with the query" as a plain OR-of-equalities column
    # predicate over the packed code — same scheme lsh_bands materializes,
    # but with no explode, no join and no distinct: the candidate filter is
    # a narrow scan of the (vec_id, code) table
    mask = (1 << LSH_BAND_BITS) - 1
    cond = None
    for b in range(LSH_N_BANDS):
        qval = (qcode >> (b * LSH_BAND_BITS)) & mask
        c = (
            F.expr(f"shiftright(code, {b * LSH_BAND_BITS}) & {mask}")
            == F.lit(qval)
        )
        cond = c if cond is None else (cond | c)
    cand = codes.where(cond).select("vec_id")
    return (
        emb.join(cand, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), F.col("q")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def semantic_dedup_keep_best(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = PAIR_THRESHOLD,
    pair_mode: str = "scoped",
) -> DataFrame:
    """(cluster_id, vec_id, centroid_id, centroid_cos, group_size):
    SemDeDup (Abbas et al. 2023) — semantic deduplication in embedding
    space: transitive closure of the cosine >= PAIR_THRESHOLD pair graph
    into groups, then ONE kept representative per group — the member
    FARTHEST from its IVF centroid (lowest centroid cosine, rounded 6dp
    on both engines before ordering; vec_id tie-break), per the paper's
    finding that low-centroid-similarity copies are the most informative
    to keep. The embedding-space mirror of dedup_keep_best.

    pair_mode picks the pair stage — the 100 TB scale knob:
      'scoped' (DEFAULT): candidate pairs are scoped to vectors sharing
        an IVF centroid — the paper's own discipline (SemDeDup computes
        pairs WITHIN k-means clusters, never across), which turns the
        pair stage from Ω(n²) into Σ_c n_c² and is what the DuckDB
        oracle replays. Pairs straddling a centroid boundary are the
        documented, paper-accepted approximation (near-identical copies
        share a nearest centroid except exactly at a Voronoi boundary);
        tests pin kept-set identity with the exact path on a synthetic
        near-dup fixture and exhibit the divergence regime at low
        thresholds.
      'exact': the block-grid full O(n²/B²)-per-task scan — the
        oracle-checkable correctness twin the scoped path is measured
        against (same role as repeated_spans vs repeated_spans_fp).

    Scale shape: the closure is the shared iterative min-label CC
    (near-dup groups are small, O(diameter) rounds); centroid id +
    cosine are one narrow scan plus a C-row broadcast join; keep-best is
    a partial-aggregatable min_by argmin (no cluster-partitioned
    window)."""
    emb = _emb(spark, sf_dir)
    cents = _centroid_rows(spark, sf_dir, N_CENTROIDS)
    return semantic_dedup_keep_best_core(emb, cents, threshold, pair_mode)


def semantic_dedup_keep_best_core(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    threshold: float = PAIR_THRESHOLD,
    pair_mode: str = "scoped",
) -> DataFrame:
    """semantic_dedup_keep_best over an explicit (vec_id, embedding)
    frame and centroid list — the synthetic-fixture-injectable core (the
    docs-DataFrame convention of operators/dedup.py)."""
    from .dedup import connected_components

    spark = emb.sparkSession
    if pair_mode == "scoped":
        raw_pairs = scoped_near_duplicate_pairs(emb, cents, threshold)
    elif pair_mode == "exact":
        raw_pairs = _block_grid_pairs(emb, threshold)
    else:  # pragma: no cover - guarded contract
        raise ValueError(f"unknown pair_mode {pair_mode!r}")
    pairs = raw_pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    cc = connected_components(
        emb.select(F.col("vec_id").alias("id")), pairs
    ).select(F.col("id").alias("vec_id"), "cluster_id")
    cent_df = spark.createDataFrame(
        cents, "centroid_id int, cvec array<double>"
    )
    scored = (
        emb.select("vec_id", "embedding", _nearest_centroid_col(cents).alias("centroid_id"))
        .join(F.broadcast(cent_df), "centroid_id")
        .select(
            "vec_id",
            "centroid_id",
            F.round(_cosine(F.col("embedding"), F.col("cvec")), 6).alias(
                "centroid_cos"
            ),
        )
    )
    # keep-best is a partial-aggregatable min_by argmin over the
    # (centroid_cos, vec_id) ordering struct — NOT a cluster-partitioned
    # window. Identical semantic copies collide in every candidate
    # scheme, so mega-groups exist at 100 TB; min_by/count combine
    # map-side to one row per group, while a window would pin each full
    # group in a single task (AQE splits skewed joins, not windows).
    best = (
        cc.join(scored, "vec_id")
        .groupBy("cluster_id")
        .agg(
            F.min_by(
                F.struct("vec_id", "centroid_id", "centroid_cos"),
                F.struct("centroid_cos", "vec_id"),
            ).alias("_b"),
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
        )
    )
    return best.select(
        "cluster_id",
        F.col("_b.vec_id").alias("vec_id"),
        F.col("_b.centroid_id").alias("centroid_id"),
        F.col("_b.centroid_cos").alias("centroid_cos"),
        "group_size",
    )


RAG_EMBED_DIM = 16
RAG_EMBED_SALT = "emb-v1"
RAG_QUERY = "fast data table"  # the retrieval query string
RAG_TOP_K = 10


def _h8_sql(x_sql: str) -> str:
    """SQL-text twin of functions/hashing.h8 — parses to the identical
    Conv(Substring(Md5(...)))·cast tree."""
    return f"CAST(conv(substring(md5({x_sql}), 1, 8), 16, 10) AS BIGINT)"


def _hash_embed_expr(text_sql: str) -> Column:
    """_hash_embed as ONE parsed SQL expression (the _dlit discipline,
    r16): the Column form costs ~0.25 s of py4j round-trips per build
    (16 components × ~8 calls each); the SQL text parses to the
    identical tree in one call. ``text_sql`` is the column
    name/expression in SQL form."""
    if not isinstance(text_sql, str):
        raise TypeError("_hash_embed_expr takes the column as SQL text")
    comps = []
    for j in range(RAG_EMBED_DIM):
        h = _h8_sql(f"concat({text_sql}, '{RAG_EMBED_SALT}{j}')")
        comps.append(f"CAST({h} % 1000 AS DOUBLE) / 1000.0D - 0.5D")
    return F.expr("array(" + ", ".join(comps) + ")")


def _hash_embed(text_col) -> Column:
    """Deterministic text -> R^DIM embedding: component j derives from
    h8(text || salt || j), scaled to [-0.5, 0.5). A stand-in for a real
    encoder (none in this environment — same honesty contract as the
    multimodal codec fakes) with the REAL plumbing: a pure JVM column
    expression, integer-derived so the DuckDB twin reproduces every
    component bit-for-bit, making the whole chunk->embed->search
    pipeline value-oracled rather than rows-only."""
    from ..functions.hashing import h8

    return F.array(
        *[
            (
                (
                    h8(F.concat(text_col, F.lit(f"{RAG_EMBED_SALT}{j}"))) % 1000
                ).cast("double")
                / 1000.0
                - 0.5
            )
            for j in range(RAG_EMBED_DIM)
        ]
    )


def chunk_embed_topk(
    spark: SparkSession, sf_dir: str, query: str = RAG_QUERY, k: int = RAG_TOP_K
) -> DataFrame:
    """(doc_id, chunk_id, cosine): the end-to-end RAG indexing pipeline —
    overlapping token chunks (textstats.doc_chunks) -> per-chunk
    embedding -> cosine top-k against the embedded query, in ONE
    declarative plan. The query vector is a driver-side constant (a
    1-row model-sized computation, same discipline as the LSH query
    bands), so the probe is a single narrow scan + TakeOrderedAndProject
    — no join, no shuffle of the chunk corpus.

    At 100 TB the embed stage writes a persisted chunk-vector table
    (vector_index.py lifecycle) and this query becomes the IVF/LSH probe
    over it; the brute-force rerank here is the correctness baseline the
    ANN variants are measured against."""
    import hashlib

    from .textstats import doc_chunks

    chunks = doc_chunks(spark, sf_dir)
    emb = _hash_embed_expr("chunk_text")

    def py_h8(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    qvec = [
        (py_h8(f"{query}{RAG_EMBED_SALT}{j}") % 1000) / 1000.0 - 0.5
        for j in range(RAG_EMBED_DIM)
    ]
    qcol = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        chunks.select(
            "doc_id",
            "chunk_id",
            F.round(_cosine(emb, qcol), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"), F.asc("chunk_id"))
        .limit(k)
    )


N_PAIR_BLOCKS = 8


def cosine_near_duplicate_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = PAIR_THRESHOLD
) -> DataFrame:
    """(vec_a, vec_b, cosine) for ALL pairs with cosine >= threshold —
    the exact correctness baseline (see _block_grid_pairs for the
    distributed layout). The sound-pruning variants for corpora where
    even n^2/B^2 is too much are the LSH / IVF / MinHash families in
    this package; semantic_dedup_keep_best defaults to the
    centroid-scoped candidate stage (scoped_near_duplicate_pairs)."""
    return _block_grid_pairs(_emb(spark, sf_dir), threshold)


def embedding_near_duplicates_scoped(
    spark: SparkSession, sf_dir: str, threshold: float = PAIR_THRESHOLD
) -> DataFrame:
    """(vec_a, vec_b, cosine): the REGISTERED embedding near-dup query —
    centroid-scoped candidate pairs (SemDeDup's within-cluster
    discipline via scoped_near_duplicate_pairs), since round 9 the
    default plan in place of the exact all-pairs scan: pair compute is
    Σ_c n_c² instead of n², so no registered query's default plan is
    quadratic in corpus size. The exact block grid
    (cosine_near_duplicate_pairs) remains the fixture-scale recall
    oracle, and embedding_dedup_recall pins the scoped-vs-exact pair-set
    recall as a first-class audit card."""
    emb = _emb(spark, sf_dir)
    cents = _centroid_rows(spark, sf_dir, N_CENTROIDS)
    return scoped_near_duplicate_pairs(emb, cents, threshold)


# The audit runs at the same threshold the queries register at (0.4 —
# every fixture SF carries real pair signal there; see
# REGISTERED_PAIR_THRESHOLD), so since round 10 the recall card pins
# the scoped-vs-exact recall of exactly the registered plan, no longer
# a vacuous 0.9 regime.
RECALL_AUDIT_THRESHOLD = REGISTERED_PAIR_THRESHOLD


def embedding_dedup_recall(
    spark: SparkSession, sf_dir: str, threshold: float = RECALL_AUDIT_THRESHOLD
) -> DataFrame:
    """(n_exact_pairs, n_scoped_pairs, missed_pairs, recall_ppm,
    max_missed_cosine): the exact-vs-scoped audit card — how many
    above-threshold cosine pairs the centroid-scoped default plan keeps
    (scoped ⊆ exact by construction: the scope only restricts
    candidates, never adds) and the worst cosine it misses at a Voronoi
    boundary. The near_dup_method_audit discipline applied to the
    embedding family: the exact O(n²) block grid runs ONLY here, as the
    fixture-scale recall oracle for the registered scoped plan.

    Scale shape: both pair stages are block-grid applyInPandas; the
    anti-join + global agg is one exchange on (vec_a, vec_b). At 100 TB
    this card runs on a sampled slice — the exact leg prices it."""
    # pin both pair sets (r16): exact feeds the anti-join AND the counts
    # agg, scoped feeds the anti-join AND its own count — unpinned, each
    # reference re-ran its block-grid applyInPandas (4
    # FlatMapGroupsInPandas nodes in the executed plan for 2 logical
    # grids; guide §4: the Python boundary is the one cost you never pay
    # twice). The pair sets are deterministic, so the pin changes
    # nothing but the execution count.
    exact = cosine_near_duplicate_pairs(spark, sf_dir, threshold).localCheckpoint(
        eager=False
    )
    scoped = embedding_near_duplicates_scoped(
        spark, sf_dir, threshold
    ).localCheckpoint(eager=False)
    missed = exact.join(scoped, ["vec_a", "vec_b"], "left_anti")
    counts = exact.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs")
    ).crossJoin(
        F.broadcast(
            scoped.agg(F.count(F.lit(1)).cast("bigint").alias("n_scoped_pairs"))
        )
    ).crossJoin(
        F.broadcast(
            missed.agg(
                F.count(F.lit(1)).cast("bigint").alias("missed_pairs"),
                F.round(F.coalesce(F.max("cosine"), F.lit(0.0)), 6).alias(
                    "max_missed_cosine"
                ),
            )
        )
    )
    return counts.select(
        "n_exact_pairs",
        "n_scoped_pairs",
        "missed_pairs",
        F.expr(
            "CAST((n_scoped_pairs * 1000000 + n_exact_pairs div 2)"
            " div greatest(n_exact_pairs, 1) AS BIGINT)"
        ).alias("recall_ppm"),
        "max_missed_cosine",
    )


def scoped_near_duplicate_pairs(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    threshold: float = PAIR_THRESHOLD,
) -> DataFrame:
    """(vec_a, vec_b, cosine): cosine >= threshold pairs SCOPED to
    vectors sharing a nearest IVF centroid — SemDeDup's own candidate
    discipline (pairs are computed within k-means clusters, never
    across). Assignment is the shuffle-free literal-argmax narrow scan;
    the per-cluster pair work then rides the same block grid keyed by
    (centroid, block-pair), so a mega-cluster still spreads over B(B+1)/2
    tasks and total pair compute drops from n² to Σ_c n_c². Cross-
    centroid pairs are deliberately out of scope (the paper-accepted
    approximation; the exact block grid is the oracle twin)."""
    assigned = emb.select(
        "vec_id", "embedding", _nearest_centroid_col(cents).alias("scope")
    )
    return _block_grid_pairs(assigned, threshold, scope_col="scope")


def _block_grid_pairs(
    emb: DataFrame, threshold: float, scope_col: str | None = None
) -> DataFrame:
    """(vec_a, vec_b, cosine) for pairs with cosine >= threshold, within
    ``scope_col`` groups when given (else globally).

    Exact O(n^2) scan organized as a block-pair grid (the classic
    distributed all-pairs layout): vectors hash into B = N_PAIR_BLOCKS
    blocks by vec_id; each unordered block pair (i <= j) becomes one
    ``applyInPandas`` group whose task computes the (n/B) x (n/B) cosine
    matrix with a single float64 BLAS matmul and keeps only the
    above-threshold, vec_a < vec_b entries. Each row is replicated B
    times (B-b pairs as the row side, b as the column side), so shuffle
    volume is
    O(n*B) while pair work is O(n^2/B(B+1)/2) per task — B tunes task
    memory at any corpus size, and no data-sized collect or driver
    broadcast of the matrix is needed. With a scope column the grid key
    becomes (scope, pair_id): n is the scope's population, so compute is
    Σ_s n_s² and a hot scope still fans out over the grid.
    """
    import numpy as np
    import pandas as pd

    b_blocks = N_PAIR_BLOCKS
    blk = (F.col("vec_id") % b_blocks).cast("int")
    # role 0 = the row block of pair (i, j): partners j >= i
    # role 1 = the column block:             partners i <= j
    # the diagonal pair (b, b) takes the row role only (one copy per row)
    keep = ([scope_col] if scope_col else []) + ["vec_id", "embedding"]
    low = emb.select(
        *keep,
        F.lit(0).alias("role"),
        F.explode(F.sequence(blk * b_blocks + blk, blk * b_blocks + (b_blocks - 1))).alias(
            "pair_id"
        ),
    )
    all_blocks = F.sequence(F.lit(0), F.lit(b_blocks - 1))
    high = emb.select(
        *keep,
        F.lit(1).alias("role"),
        F.explode(
            F.transform(
                F.filter(all_blocks, lambda i: i < blk),
                lambda i: i * b_blocks + blk,
            )
        ).alias("pair_id"),
    )

    def block_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pair_id = int(key[-1])
        diag = (pair_id // b_blocks) == (pair_id % b_blocks)
        rows = pdf[pdf["role"] == 0]
        cols = rows if diag else pdf[pdf["role"] == 1]
        if not len(rows) or not len(cols):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        ra = np.stack([np.asarray(v, dtype=np.float64) for v in rows["embedding"]])
        cb = np.stack([np.asarray(v, dtype=np.float64) for v in cols["embedding"]])
        ia = rows["vec_id"].to_numpy()
        ib = cols["vec_id"].to_numpy()
        cos = (ra @ cb.T) / np.outer(
            np.sqrt((ra * ra).sum(axis=1)), np.sqrt((cb * cb).sum(axis=1))
        )
        cos = np.round(cos, 6)
        if diag:
            # same block on both axes: keep the upper triangle only
            ai, bi = np.nonzero((cos >= threshold) & (ia[:, None] < ib[None, :]))
            va, vb = ia[ai], ib[bi]
        else:
            # disjoint blocks: every hit is a distinct pair; block order
            # does not imply id order, so emit (min, max)
            ai, bi = np.nonzero(cos >= threshold)
            va = np.minimum(ia[ai], ib[bi])
            vb = np.maximum(ia[ai], ib[bi])
        return pd.DataFrame({"vec_a": va, "vec_b": vb, "cosine": cos[ai, bi]})

    grid_keys = ([scope_col] if scope_col else []) + ["pair_id"]
    return (
        low.unionByName(high)
        .groupBy(*grid_keys)
        .applyInPandas(block_pairs, "vec_a bigint, vec_b bigint, cosine double")
    )


PQ_M = 4  # subspaces
PQ_K = 16  # sub-centroids per subspace


def _subc_from_rows(rows: list[tuple[int, list[float]]], m: int, k: int):
    """(m, k, dim/m) sub-centroid tensor from already-collected model
    rows (the first k vectors, id-ascending).

    Filter by id, not position (round-15 advisory): the old DataFrame
    path selected ``vec_id < k``, so a gap in the id sequence must not
    let id >= k slip into the tensor via positional truncation."""
    import numpy as np

    mat = np.array([v for i, v in rows if i < k], dtype=np.float64)
    return np.stack(np.split(mat, m, axis=1))  # (m, k, dsub)


def _pq_subcentroids(spark: SparkSession, sf_dir: str, m: int, k: int):
    """(m, k, dim/m) sub-centroid tensor: subvector j of the first k
    vectors (the same deterministic convention the static IVF and the LSH
    hyperplanes use, so the whole computation is oracle-reproducible).
    Model-sized driver state: m*k*(dim/m) = k*dim doubles."""
    return _subc_from_rows(_model_rows(spark, sf_dir, k)[0], m, k)


def _pq_darr_sql(j: int, dsub: int, subc_j) -> str:
    """SQL text for subspace j's k squared distances (the argmin input
    of the PQ code): one _sq_dist_sql fold per sub-centroid over
    slice(embedding, ...). Same tree the Column API built, one parse."""
    sub = f"slice(embedding, {j * dsub + 1}, {dsub})"
    return (
        "array("
        + ",".join(_sq_dist_sql(sub, _arr_dlit(c)) for c in subc_j)
        + ")"
    )


def pq_codes(
    spark: SparkSession, sf_dir: str, m: int = PQ_M, k: int = PQ_K
) -> DataFrame:
    """(vec_id, codes): product-quantization codes — each embedding is
    split into ``m`` subvectors and each subvector stores only the id of
    its nearest sub-centroid (ties to the lowest id). The third leg of
    the quantization family next to IVF (coarse partitions) and sign-LSH
    (hash buckets): PQ is the memory-side compression — m*log2(k) bits
    per vector instead of dim floats, the layout FAISS-style engines keep
    RAM-resident at billion-vector scale.

    Plan shape: the sub-centroid tensor is model-sized driver state
    baked into literal column expressions, so coding is ONE narrow
    JVM-side scan — no join, no shuffle, no Python. codes render as a
    comma-joined string (the driver canonicalizer cannot hash arrays).
    """
    subc = _pq_subcentroids(spark, sf_dir, m, k)
    dsub = subc.shape[2]
    emb = _emb(spark, sf_dir)
    code_sqls = []
    for j in range(m):
        darr = _pq_darr_sql(j, dsub, subc[j])
        # array_position returns the FIRST index of the min -> ties to
        # the lowest centroid id, mirrored by the oracle's row_number
        code_sqls.append(
            f"CAST(CAST(array_position({darr}, array_min({darr})) - 1"
            " AS INT) AS STRING)"
        )
    return emb.select(
        "vec_id",
        F.expr(
            "array_join(array(" + ",".join(code_sqls) + "), ',')"
        ).alias("codes"),
    )


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    m: int = PQ_M,
    n_sub: int = PQ_K,
) -> DataFrame:
    """(vec_id, approx_dist): ADC (asymmetric distance computation) top-k
    — the query stays un-quantized; each database vector's distance is
    approximated as the sum over subspaces of ||q_sub - centroid[code]||²
    looked up from a per-query distance table. This is the probe-side
    payoff of PQ: scoring touches only the m small codes per vector plus
    an m×k table of precomputed distances (model-sized, baked into the
    plan as literals) — never the original embeddings.

    Ascending distance, vec_id tie-break, 6dp rounding on output (the
    ranking itself uses the bit-identical left-to-right fold)."""
    rows, qvec = _model_rows(spark, sf_dir, n_sub, query_vec_id)
    subc = _subc_from_rows(rows, m, n_sub)
    emb = _emb(spark, sf_dir)
    if qvec is None:
        return spark.createDataFrame([], "vec_id bigint, approx_dist double")
    return (
        emb.select(
            "vec_id", F.round(_pq_adc_dist(qvec, subc), 6).alias("approx_dist")
        )
        .orderBy(F.asc("approx_dist"), F.asc("vec_id"))
        .limit(k)
    )


def _pq_adc_dist(qvec, subc) -> Column:
    """The ADC approximate-distance column: re-derives each vector's PQ
    code inline (same literal expressions as pq_codes) and folds the
    per-subspace distance-table lookups left-to-right in one projection
    — a narrow scan, no join. Shared by pq_topk and ivfpq_topk. Built
    as ONE parsed SQL expression (see the _dlit block)."""
    import numpy as np

    q = np.asarray(qvec, dtype=np.float64)
    m, n_sub, dsub = subc.shape
    lookups = []
    for j in range(m):
        darr = _pq_darr_sql(j, dsub, subc[j])
        # 1-based code
        code_j = f"CAST(array_position({darr}, array_min({darr})) AS INT)"
        q_sub = q[j * dsub : (j + 1) * dsub]
        # dt[ci] = ||q_sub - c_ci||^2, left-to-right like _sq_dist_sql
        table = []
        for ci in range(n_sub):
            acc = 0.0
            for x, y in zip(q_sub, subc[j][ci]):
                acc = acc + (x - y) * (x - y)
            table.append(acc)
        lookups.append(f"element_at({_arr_dlit(table)}, {code_j})")
    return F.expr(" + ".join(lookups))


def ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    nprobe: int = N_PROBE,
    m: int = PQ_M,
    n_sub: int = PQ_K,
) -> DataFrame:
    """IVF+PQ combined probe — the billion-vector production shape
    (FAISS IVFPQ): the coarse quantizer prunes to the query's nprobe
    partitions, and scoring inside the surviving partitions uses the
    compressed ADC distance instead of the raw embeddings. Cost at
    scale: ~nprobe/C of the corpus scanned, with each scanned vector
    scored from m table lookups — no full-precision distance anywhere
    in the hot path. Here both stages are literal column expressions on
    ONE narrow scan (inline coarse assignment -> IN filter -> inline ADC
    fold), zero joins, zero shuffles before the final top-k."""
    emb = _emb(spark, sf_dir)
    rows, qvec = _model_rows(
        spark, sf_dir, max(n_centroids, n_sub), query_vec_id
    )
    if qvec is None:
        return spark.createDataFrame([], "vec_id bigint, approx_dist double")
    cents = [(i, v) for i, v in rows if i < n_centroids]
    subc = _subc_from_rows(rows, m, n_sub)
    probed = _rank_centroids_local(cents, qvec, nprobe)
    return (
        emb.where(_nearest_centroid_col(cents).isin(probed))
        .select(
            "vec_id", F.round(_pq_adc_dist(qvec, subc), 6).alias("approx_dist")
        )
        .orderBy(F.asc("approx_dist"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_topk_trained(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    n_centroids: int = N_CENTROIDS,
    nprobe: int = N_PROBE,
    iterations: int = KMEANS_ITERATIONS,
) -> DataFrame:
    """End-to-end trained ANN: spherical k-means learns the coarse
    quantizer, then the IVF probe runs against THOSE centroids — the full
    train -> index -> query lifecycle of a production vector index (the
    static ivf_topk uses the deterministic first-C centroids instead).

    The trained centroid table is model-sized (C x dim doubles), read
    from the STANDING trained-quantizer asset (standing_kmeans_centroids
    — trained once per data generation; the registered
    ivf_train_centroids card is the inline trainer), so assignment is
    the same zero-shuffle literal-argmax scan the static IVF uses
    (_nearest_centroid_col); the probe touches ~nprobe/C of the corpus
    and exact-ranks inside. The trained family hash-checks against the
    unrolled-k-means SQL oracle; recall vs brute force is additionally
    pinned in tests.
    """
    cent = standing_kmeans_centroids(spark, sf_dir, n_centroids, iterations)
    cents = sorted(
        ((int(r["centroid_id"]), list(r["cvec"])) for r in cent.collect()),
        key=lambda t: t[0],
    )
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    qvec = query_embedding(emb, query_vec_id)
    probed = (
        _rank_centroids_local(cents, qvec, nprobe) if qvec is not None else []
    )
    return (
        emb.where(_nearest_centroid_col(cents).isin(probed))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), F.col("q")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# --- label-aware neighbor analytics (contrastive-training prep) -------------

KNN_K = 5
KNN_N_ANCHORS = 32  # FIXED anchor-panel size at any corpus scale
KNN_ANCHOR_SALT = "anchor-v1"
HARD_NEG_N = 3


def _anchor_neighbor_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor_id, a_label, vec_id, label, cosine): every corpus vector
    scored against a deterministic FIXED-SIZE anchor panel — the
    KNN_N_ANCHORS corpus vectors ranking first by salted portable hash
    (vec_id tie-break), selected with TakeOrderedAndProject so the
    anchor side is N rows at ANY corpus size. The previous vec_id % 97
    rule grew the broadcast ~linearly with the corpus — unbounded at
    100 TB; a fixed salted-hash panel keeps the broadcast and the
    scoring fan-out (N x corpus) capped while staying reproducible
    across runs, engines, and partitionings. The LSH/IVF candidate
    paths above are the route when even N x corpus stops fitting.
    Cosines are rounded to 6dp BEFORE ranking so neighbor order (and
    the cross-engine hash) never depends on float fold order; ties
    break on vec_id."""
    from ..functions.hashing import h8

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    ark = h8(F.concat(F.col("vec_id").cast("string"), F.lit(KNN_ANCHOR_SALT)))
    anchors = (
        emb.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("avec"),
            F.col("label").alias("a_label"),
            ark.alias("ark"),
        )
        .orderBy(F.asc("ark"), F.asc("anchor_id"))
        .limit(KNN_N_ANCHORS)
        .drop("ark")
    )
    return (
        emb.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "a_label",
            "vec_id",
            "label",
            F.round(_cosine(F.col("embedding"), F.col("avec")), 6).alias(
                "cosine"
            ),
        )
    )


def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row (n_anchors, k, n_correct, accuracy): leave-one-out kNN
    label prediction over the anchor sample — majority vote of the top-k
    neighbors' labels (ties: most votes, then smallest label), scored
    against the anchor's own label. The standard embedding-quality smoke
    metric before a similarity index ships."""
    from pyspark.sql.window import Window

    scored = _anchor_neighbor_scores(spark, sf_dir)
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    topk = scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= KNN_K
    )
    votes = topk.groupBy("anchor_id", "a_label", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("anchor_id").orderBy(F.desc("v"), F.asc("label"))
    pred = votes.withColumn("vr", F.row_number().over(wv)).where(
        F.col("vr") == 1
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.lit(KNN_K).alias("k"),
        F.sum((F.col("label") == F.col("a_label")).cast("bigint")).alias(
            "n_correct"
        ),
        floor_round(
            F.sum((F.col("label") == F.col("a_label")).cast("bigint"))
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


def hard_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor_id, negative_id, negative_label, cosine, rank): for each
    anchor, its HARD_NEG_N most-similar vectors carrying a DIFFERENT
    label — the hard-negative mining step of contrastive embedding
    training (most confusable wrong-class examples).
    """
    from pyspark.sql.window import Window

    scored = _anchor_neighbor_scores(spark, sf_dir).where(
        F.col("label") != F.col("a_label")
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HARD_NEG_N)
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            "cosine",
            "rank",
        )
    )


def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_ref, n_cur, centroid_dist): per-label Euclidean distance
    between the centroid of the 'reference' half of the embedding corpus
    (even vec_id) and the 'current' half (odd vec_id) — the
    embedding-space drift monitor a retraining pipeline watches (a
    shifted centroid means the upstream encoder or data mix moved).

    Scale shape: posexplode -> one (label, dim) hash aggregate per half
    -> a dim-sized join and one aggregate back to per-label rows. The
    plan is O(1) in dimension (no per-dim columns), the same explode
    lesson as the k-means reduce fix in round 2."""
    emb = _emb(spark, sf_dir).join(
        load(spark, sf_dir, "embeddings").select("vec_id", "label"), "vec_id"
    )
    half = F.when(F.col("vec_id") % 2 == 0, "ref").otherwise("cur")
    dims = emb.select(
        "label",
        half.alias("half"),
        F.posexplode("embedding").alias("dim", "x"),
    )
    cent = dims.groupBy("label", "half", "dim").agg(
        F.avg("x").alias("m"), F.count(F.lit(1)).alias("n")
    )
    ref = cent.where(F.col("half") == "ref").select(
        "label", "dim", F.col("m").alias("mr"), F.col("n").alias("n_ref")
    )
    cur = cent.where(F.col("half") == "cur").select(
        "label", "dim", F.col("m").alias("mc"), F.col("n").alias("n_cur")
    )
    d2 = (F.col("mr") - F.col("mc")) * (F.col("mr") - F.col("mc"))
    return (
        ref.join(cur, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.round(F.sqrt(F.sum(d2)), 6).alias("centroid_dist"),
        )
    )


# --- Johnson-Lindenstrauss random projection (dim reduction) ----------------

# The dimensionality-reduction stage a 100 TB embedding pipeline runs
# before clustering / ANN indexing: project D-dim vectors onto a K-dim
# Rademacher (+-1) matrix — JL guarantees pairwise inner products are
# preserved within epsilon for K = O(log n / eps^2), and a sign matrix
# needs no float matrix distribution at all. The matrix derives from the
# portable h8 hash, so both engines (and any future executor) rebuild it
# bit-identically from the salt alone; it is interpolated as literals
# (computed ONCE driver-side) rather than hashed per row-element.
RP_DIM = 32
RP_IN_DIM = 64  # fixture embedding dim; a deployment passes its own
RP_SALT = "rp-v1"
RP_SHORTLIST = 100  # coarse-filter candidates re-ranked exactly


def rp_sign_matrix(
    k: int = RP_DIM, d: int = RP_IN_DIM, salt: str = RP_SALT
) -> list[list[int]]:
    """K x D Rademacher matrix from md5 (the h8 construction in pure
    Python — single-sourced: the Spark literals, the DuckDB oracle, and
    any reimplementation call this same function)."""
    import hashlib

    def h8s(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    return [
        [1 if h8s(f"{salt}:{j}:{i}") % 2 == 0 else -1 for i in range(d)]
        for j in range(k)
    ]


def rp_project_cols(vec_sql: str = "embedding") -> list[Column]:
    """The K projected coordinates of ``vec_sql`` as rounded double
    columns — each one codegen'd zip_with/aggregate against a literal
    sign row (no shuffle, no Python). Assembled as SQL text, one parse
    per coordinate (see the _dlit block); ``vec_sql`` is the column
    name/expression in SQL form — a Column from the pre-r15 calling
    convention would interpolate its repr into the SQL and misparse, so
    fail loudly on anything but a string (round-15 advisory)."""
    if not isinstance(vec_sql, str):
        raise TypeError(
            f"rp_project_cols takes the column as SQL text since r15; got "
            f"{type(vec_sql).__name__} — pass the column name/expression "
            "as a string"
        )
    signs = rp_sign_matrix()
    return [
        F.expr(
            f"round(aggregate(zip_with({vec_sql}, "
            + _arr_dlit([float(s) for s in row])
            + ", (x, s) -> x * s), 0.0D, (acc, v) -> acc + v), 6)"
        ).alias(f"y{j}")
        for j, row in enumerate(signs)
    ]


def rp_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, y0..y{K-1}): every embedding projected to K dims — the
    narrow table downstream clustering/indexing consumes (K/D of the
    original width on disk and on every exchange)."""
    emb = _emb(spark, sf_dir)
    return emb.select("vec_id", *rp_project_cols("embedding"))


def rp_recall_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = TOP_K,
    shortlist: int = RP_SHORTLIST,
) -> DataFrame:
    """One-row JL quality gate for the coarse-filter-then-rerank search:
    (k, shortlist, n_overlap, recall) — how much of the exact cosine
    top-k survives inside the projected-space SHORTLIST (the candidates
    an RP-first search would exactly re-rank). This is the measured
    answer to 'is RP_DIM enough for this corpus', run before committing
    the cheap index; both sets are deterministic (cosine desc, vec_id
    asc).

    Honesty note for the fixture: the synthetic embeddings are ~iid
    noise, whose top-k margins are O(1/sqrt(D)) — JL at K << D cannot
    fully preserve them (recall ~0.5-0.6 here, vs a shortlist/n random
    baseline of 0.2). Real embedding corpora are anisotropic and
    cluster-structured, i.e. far more compressible; the gate exists
    precisely to measure that before trusting the projection."""
    proj = rp_projected(spark, sf_dir)
    yc = [F.col(f"y{j}") for j in range(RP_DIM)]
    qp = proj.where(F.col("vec_id") == query_vec_id).select(
        *[c.alias(f"q{j}") for j, c in enumerate(yc)]
    )
    dot = sum(F.col(f"y{j}") * F.col(f"q{j}") for j in range(RP_DIM))
    na = F.sqrt(sum(F.col(f"y{j}") * F.col(f"y{j}") for j in range(RP_DIM)))
    nb = F.sqrt(sum(F.col(f"q{j}") * F.col(f"q{j}") for j in range(RP_DIM)))
    rp_short = (
        proj.crossJoin(F.broadcast(qp))
        .select("vec_id", F.round(dot / (na * nb), 6).alias("cos_rp"))
        .orderBy(F.desc("cos_rp"), F.asc("vec_id"))
        .limit(shortlist)
        .select("vec_id")
    )
    exact_top = cosine_topk(spark, sf_dir, query_vec_id, k).select("vec_id")
    return (
        rp_short.join(exact_top, "vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
        .select(
            F.lit(k).cast("int").alias("k"),
            F.lit(shortlist).cast("int").alias("shortlist"),
            "n_overlap",
            floor_round(F.col("n_overlap") / k, 6).alias("recall"),
        )
    )


def pq_distortion_stats(
    spark: SparkSession, sf_dir: str, m: int = PQ_M, k: int = PQ_K
) -> DataFrame:
    """(subspace, n_vecs, mean_sqdist_micro, max_sqdist_micro): the
    reconstruction-error card for the PQ codebook — per subspace, the
    exact-integer mean and max of each vector's squared distance to its
    ASSIGNED sub-centroid (the quantization distortion). This is the
    number an ANN operator reads before trusting PQ recall: a subspace
    whose distortion dwarfs the others needs more sub-centroids or a
    rotation (OPQ), and codebook drift shows up here before it shows up
    in recall.

    Shape: the sub-centroid tensor is model-sized driver state baked
    into literal expressions (the pq_codes plan), so per-vector
    distortion is ONE narrow JVM-side scan; the explode adds m rows per
    vector (m = 4) and the groupBy on the m-valued subspace key
    partial-aggregates map-side to m rows per partition. Micro-scaled
    int64 distortions (floor(d * 1e6 + 0.5) of bit-identical fold
    doubles) make the mean an exact rounded integer division — no
    accumulation-order float anywhere."""
    subc = _pq_subcentroids(spark, sf_dir, m, k)
    dsub = subc.shape[2]
    emb = _emb(spark, sf_dir)
    pairs = []
    for j in range(m):
        darr = _pq_darr_sql(j, dsub, subc[j])
        micro = (
            f"CAST(FLOOR(array_min({darr}) * {_dlit(1e6)} + {_dlit(0.5)})"
            " AS BIGINT)"
        )
        pairs.append(
            f"named_struct('subspace', CAST({j} AS INT), 'micro', {micro})"
        )
    exploded = emb.select(
        F.explode(F.expr("array(" + ",".join(pairs) + ")")).alias("p")
    ).select(
        F.col("p.subspace").alias("subspace"), F.col("p.micro").alias("micro")
    )
    return (
        exploded.groupBy("subspace")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("micro").cast("bigint").alias("sum_micro"),
            F.max("micro").cast("bigint").alias("max_sqdist_micro"),
        )
        .select(
            "subspace",
            "n_vecs",
            F.expr(
                "CAST((sum_micro + n_vecs DIV 2) DIV n_vecs AS BIGINT)"
            ).alias("mean_sqdist_micro"),
            "max_sqdist_micro",
        )
    )


# --- margin-based bitext mining ----------------------------------------------
#
# The parallel-corpus mining step of a multilingual LLM pipeline
# (Artetxe & Schwenk 2019's ratio-margin criterion, the shape behind
# CCMatrix/NLLB-style bitext harvesting): score source-language anchors
# against every candidate document of each other language, and keep
# MUTUAL top-k pairs ranked by how far their similarity stands above
# each side's own neighborhood average — raw cosine alone mis-ranks
# hubs, which is exactly what the margin denominator corrects.
# No reference counterpart (north-star extension family).

BITEXT_N_ANCHORS = 64  # fixed-size source-side panel (salted-hash pick)
BITEXT_K = 4  # top-k per direction; margin averages this neighborhood
BITEXT_ANCHOR_SALT = "bitext-anchor-v1"
BITEXT_SRC_LANG = "en"


def _int_embed_expr(text_sql: str) -> Column:
    """_int_embed as ONE parsed SQL expression (the _dlit discipline,
    r16 — see _hash_embed_expr); identical tree, ~0.25 s less driver
    time per build."""
    if not isinstance(text_sql, str):
        raise TypeError("_int_embed_expr takes the column as SQL text")
    comps = []
    for j in range(RAG_EMBED_DIM):
        h = _h8_sql(f"concat({text_sql}, '{RAG_EMBED_SALT}{j}')")
        comps.append(f"CAST({h} % 1000 - 500 AS BIGINT)")
    return F.expr("array(" + ", ".join(comps) + ")")


def _int_embed(text_col: Column) -> Column:
    """_hash_embed's components in exact INTEGER micro-space:
    iv[j] = h8(text || salt || j) % 1000 - 500 (bigint in [-500, 499]).
    Dots and norms over iv are exact int64 arithmetic (16 terms, each
    |term| <= 250000), so every downstream score is one identical IEEE
    op away from shared integers on BOTH engines — the cross-engine
    hash can never ride a float fold order, unlike a double-space
    cosine whose summation order is engine-private."""
    from ..functions.hashing import h8

    return F.array(
        *[
            (
                h8(F.concat(text_col, F.lit(f"{RAG_EMBED_SALT}{j}"))) % 1000
                - 500
            ).cast("bigint")
            for j in range(RAG_EMBED_DIM)
        ]
    )


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, en_id, xx_id, cosine, margin): mined translation-pair
    candidates — for a fixed salted-hash panel of BITEXT_N_ANCHORS
    source-language documents, the pairs (anchor, target-language doc)
    that are in EACH OTHER's top-BITEXT_K by cosine within their
    language pair, scored by the ratio margin
    cos(x,y) / ((knn_mean(x) + knn_mean(y)) / 2).

    Determinism discipline: the cosine is ranked and reported in
    integer micro-units c_u = floor(cos * 1e6 + 0.5) derived from exact
    integer dots/norms (see _int_embed), k-NN means stay as exact
    (sum, count) integer pairs, and the margin is one double division
    of integers finished with the same floor-micro pattern — every
    cross-engine value is a chain of identical IEEE ops over shared
    integers, so DuckDB replays it bit-for-bit (no decimal-repr
    rounding anywhere).

    Scale shape: the anchor panel is model-sized (TakeOrderedAndProject,
    same discipline as _anchor_neighbor_scores), so the pair stage is a
    broadcast nested-loop of N_anchors x corpus — capped fan-out at any
    corpus size, map-side only. Both top-k windows partition on bounded
    keys (per-anchor-per-lang candidate lists; per-target panel-sized
    lists). Full-corpus-anchor mining routes through the IVF/LSH
    candidate paths above, exactly like the kNN family."""
    docs = load(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "lang", _int_embed_expr("text").alias("iv")
    )
    return bitext_margin_pairs_core(docs)


def bitext_margin_pairs_core(
    docs: DataFrame,
    n_anchors: int = BITEXT_N_ANCHORS,
    k: int = BITEXT_K,
    src_lang: str = BITEXT_SRC_LANG,
) -> DataFrame:
    """bitext_margin_pairs over an explicit (doc_id, lang, iv) frame —
    the crafted-fixture-injectable core."""
    from pyspark.sql.window import Window

    from ..functions.hashing import h8

    with_norm = docs.withColumn("inorm", _int_dot("iv", "iv")).where(
        F.col("inorm") > 0
    )
    ark = h8(
        F.concat(F.col("doc_id").cast("string"), F.lit(BITEXT_ANCHOR_SALT))
    )
    anchors = (
        with_norm.where(F.col("lang") == src_lang)
        .select(
            F.col("doc_id").alias("en_id"),
            F.col("iv").alias("aiv"),
            F.col("inorm").alias("anorm"),
            ark.alias("ark"),
        )
        .orderBy(F.asc("ark"), F.asc("en_id"))
        .limit(n_anchors)
        .drop("ark")
    )
    tgt = with_norm.where(F.col("lang") != src_lang)
    cos = _int_dot("aiv", "iv") / F.sqrt(
        (F.col("anorm") * F.col("inorm")).cast("double")
    )
    pairs = tgt.crossJoin(F.broadcast(anchors)).select(
        "lang",
        "en_id",
        F.col("doc_id").alias("xx_id"),
        F.floor(cos * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("c_u"),
    )
    w_x = Window.partitionBy("en_id", "lang").orderBy(
        F.desc("c_u"), F.asc("xx_id")
    )
    w_y = Window.partitionBy("xx_id").orderBy(F.desc("c_u"), F.asc("en_id"))
    ranked = pairs.withColumn("rn_x", F.row_number().over(w_x)).withColumn(
        "rn_y", F.row_number().over(w_y)
    )
    mu_x = (
        ranked.where(F.col("rn_x") <= k)
        .groupBy("en_id", "lang")
        .agg(
            F.sum("c_u").alias("sx"),
            F.count(F.lit(1)).cast("bigint").alias("kx"),
        )
    )
    mu_y = (
        ranked.where(F.col("rn_y") <= k)
        .groupBy("xx_id")
        .agg(
            F.sum("c_u").alias("sy"),
            F.count(F.lit(1)).cast("bigint").alias("ky"),
        )
    )
    mutual = ranked.where((F.col("rn_x") <= k) & (F.col("rn_y") <= k)).select(
        "lang", "en_id", "xx_id", "c_u"
    )
    cand = mutual.join(F.broadcast(mu_x), ["en_id", "lang"])
    scored = mu_y.join(F.broadcast(cand), "xx_id")
    den = F.col("sx") * F.col("ky") + F.col("sy") * F.col("kx")
    num = F.lit(2) * F.col("c_u") * F.col("kx") * F.col("ky")
    margin_micro = F.floor(num / den * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    return (
        scored.where(den != 0)
        .select(
            "lang",
            "en_id",
            "xx_id",
            (F.col("c_u") / F.lit(1000000.0)).alias("cosine"),
            (margin_micro / F.lit(1000000.0)).alias("margin"),
        )
    )
