"""Spam-classifier pipeline (assignment6): sequential SGD train, apply,
ensemble apply.

Reference (scala/.../assignment6/):
- TrainSpamClassifier.scala:42-86 — parse `docid label f1 f2 ...`, optional
  pre-train shuffle (Math.random key + sortByKey), then groupByKey(1) and a
  strictly sequential fold: score = Σ w[f] over feature *occurrences*,
  p = σ(score), then w[f] += (label - p)·δ per occurrence, δ = 0.002.
- ApplySpamClassifier.scala:39-65 — broadcast weight map; spamminess =
  Σ w[f]; label spam iff score > 0.
- ApplyEnsembleSpamClassifier.scala:43-108 — 3 models; average: mean score
  > 0; vote: score = #spam-votes − #ham-votes, label by majority.

Spark-first translation:
- The order-sensitive fold is *inherently sequential* (each update depends
  on all previous rows); the reference funnels everything through one
  reducer, we funnel through one ``applyInPandas`` group with an explicit
  in-group sort (docid, or a portable hash key for the shuffled variant —
  the reference's unseeded Math.random is replaced per SURVEY §7 risk
  note; see ``shuffle_key``). This is a documented scale constraint of the *algorithm*, not the
  engine; everything around it (feature derivation, scoring) is
  distributed.
- Scoring is explode ⋈ broadcast(weights) ⋈ groupBy(docid) sum — the
  broadcast map probe of the reference, but it also survives models too
  big to broadcast (plain shuffle join then).

Training-set derivation (FIXTURES.md §3): docid = doc_id, label = 'spam'
iff doc_id % 3 == 0, features = md5-based stable hashes of the document's
tokens mod 10,007 (portable across Spark / DuckDB / NumPy replay).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numerics import floor_round

from ..functions.text import tokenize
from ..sources.tables import load

DELTA = 0.002  # TrainSpamClassifier.scala:41
FEATURE_MOD = 10_007
N_ENSEMBLE = 3
SHUFFLE_SEED = 42  # the pre-train shuffle key's salt; oracle interpolates it


def _feature_id(col):
    """Portable stable token hash: h8 (functions/hashing.py), mod 10007."""
    from ..functions.hashing import h8

    return (h8(col) % FEATURE_MOD).cast("int")


def shuffle_key(docid_col: str, seed: int):
    """Deterministic, engine-portable pre-train shuffle key: h8 of
    ``"<docid>:<seed>"``. Replaces the reference's unseeded Math.random
    (TrainSpamClassifier.scala:60-63) — same role (decorrelate the visit
    order from docid), but reproducible on Spark, DuckDB, and NumPy alike,
    which is what lets the *shuffled* trainer carry a value oracle."""
    from ..functions.hashing import h8

    return h8(F.concat_ws(":", F.col(docid_col).cast("string"), F.lit(str(seed))))


def spam_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(docid, label, features array<int>) in the reference's input shape
    (TrainSpamClassifier.scala:44-54), derived from documents."""
    docs = load(spark, sf_dir, "documents", parallelize=True).select("doc_id", "text", "source")
    return docs.select(
        F.col("doc_id").alias("docid"),
        F.when(F.col("doc_id") % 3 == 0, "spam").otherwise("ham").alias("label"),
        F.transform(tokenize("text"), _feature_id).alias("features"),
        "source",
    )


def _sgd_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential SGD over rows ordered by (sort_key, docid) — bit-for-bit
    the reference fold (TrainSpamClassifier.scala:68-85); the docid
    tiebreak makes the visit order total, so the DuckDB recursive-CTE
    oracle replays the identical sequence."""
    import math

    pdf = pdf.sort_values(["sort_key", "docid"], kind="mergesort")
    w: dict[int, float] = {}
    for label, feats in zip(pdf["is_spam"], pdf["features"]):
        score = 0.0
        for f in feats:
            score += w.get(f, 0.0)
        prob = 1.0 / (1.0 + math.exp(-score))
        upd = (label - prob) * DELTA
        for f in feats:
            w[f] = w.get(f, 0.0) + upd
    return pd.DataFrame(
        {"feature": list(w.keys()), "weight": list(w.values())}
    )


def train_spam_classifier(
    spark: SparkSession,
    sf_dir: str,
    shuffle: bool = False,
    seed: int = SHUFFLE_SEED,
    subset_source_mod: int | None = None,
    ds: DataFrame | None = None,
) -> DataFrame:
    """Train one model -> (feature, weight).

    ``subset_source_mod`` trains on the subset of documents whose numeric
    source suffix ≡ that value mod N_ENSEMBLE (the ensemble's 3 disjoint
    training groups, standing in for group_x/group_y/britney).
    ``ds`` lets ensemble callers pass an already-cached training set
    instead of re-deriving the feature hashing per model.
    """
    if ds is None:
        ds = spam_training_set(spark, sf_dir)
    if subset_source_mod is not None:
        ds = ds.where(
            F.regexp_extract("source", r"(\d+)$", 1).cast("int") % N_ENSEMBLE
            == subset_source_mod
        )
    sort_key = shuffle_key("docid", seed) if shuffle else F.col("docid").cast("double")
    prepared = ds.select(
        F.lit(0).alias("g"),
        sort_key.alias("sort_key"),
        "docid",
        F.when(F.col("label") == "spam", 1).otherwise(0).alias("is_spam"),
        "features",
    )
    return prepared.groupBy("g").applyInPandas(
        lambda pdf: _sgd_fold(pdf), schema="feature int, weight double"
    )


def _score(ds: DataFrame, weights: DataFrame, score_col: str = "score") -> DataFrame:
    """docid -> Σ weight over feature occurrences (ApplySpamClassifier
    broadcast probe as explode ⋈ weights ⋈ sum; empty/unknown features
    score 0 via explode_outer + coalesce)."""
    exploded = ds.select(
        "docid", "label", F.explode_outer("features").alias("feature")
    )
    return (
        exploded.join(F.broadcast(weights), "feature", "left")
        .groupBy("docid", "label")
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias(score_col))
    )


def apply_spam_classifier(
    spark: SparkSession, sf_dir: str, weights: DataFrame | None = None
) -> DataFrame:
    """(docid, label, score, pred): spam iff score > 0
    (ApplySpamClassifier.scala:48-62)."""
    if weights is None:
        weights = train_spam_classifier(spark, sf_dir)
    ds = spam_training_set(spark, sf_dir)
    scored = _score(ds, weights)
    return scored.select(
        "docid",
        "label",
        F.round("score", 6).alias("score"),
        F.when(F.col("score") > 0, "spam").otherwise("ham").alias("pred"),
    )


def _train_ensemble_models(ds: DataFrame) -> DataFrame:
    """(model_id, feature, weight) for the N_ENSEMBLE disjoint source
    groups, trained in ONE grouped fold: the per-model folds are
    independent, so grouping by model id runs them as parallel tasks of a
    single shuffle instead of N serial single-task jobs. Within each group
    the fold still sees exactly the rows of that source subset in docid
    order — bit-for-bit the same weights as training each model alone."""
    prepared = ds.select(
        (
            F.regexp_extract("source", r"(\d+)$", 1).cast("int") % N_ENSEMBLE
        ).alias("g"),
        F.col("docid").cast("double").alias("sort_key"),
        "docid",
        F.when(F.col("label") == "spam", 1).otherwise(0).alias("is_spam"),
        "features",
    )

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = _sgd_fold(pdf)
        out.insert(0, "model_id", int(key[0]))
        return out

    return prepared.groupBy("g").applyInPandas(
        fold, schema="model_id int, feature int, weight double"
    )


def _ensemble_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one cached feature derivation feeds the training + the scoring scan
    # (otherwise the tokenize+hash projection runs per model)
    ds = spam_training_set(spark, sf_dir).cache()
    weights = _train_ensemble_models(ds)
    # all three models scored in one pass: explode the corpus once, join
    # the (model_id, feature, weight) table, pivot per model — versus the
    # per-model explode ⋈ weights ⋈ 3-way join of the serial version
    exploded = ds.select(
        "docid", "label", F.explode_outer("features").alias("feature")
    )
    pivoted = (
        exploded.join(F.broadcast(weights), "feature", "left")
        .groupBy("docid", "label")
        .pivot("model_id", list(range(N_ENSEMBLE)))
        .agg(F.sum("weight"))
    )
    return pivoted.select(
        "docid",
        "label",
        *[
            F.coalesce(F.col(str(i)), F.lit(0.0)).alias(f"score_{i}")
            for i in range(N_ENSEMBLE)
        ],
    )


def apply_ensemble_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average ensemble: mean of the 3 scores, spam iff > 0
    (ApplyEnsembleSpamClassifier.scala:77-88)."""
    scored = _ensemble_scores(spark, sf_dir)
    avg = (F.col("score_0") + F.col("score_1") + F.col("score_2")) / N_ENSEMBLE
    return scored.select(
        "docid",
        "label",
        F.round(avg, 6).alias("score"),
        F.when(avg > 0, "spam").otherwise("ham").alias("pred"),
    )


def ranking_auc(scored: DataFrame, label_col: str = "label", score_col: str = "score") -> DataFrame:
    """One-row (n_pos, n_neg, auc, roca_pct) from (label, score) rows.

    Mann-Whitney AUC with proper tie handling (average ranks): the
    reference reports classifier quality as 1-ROCA% (assignment6.md:3-29),
    which is (1 - AUC) * 100. Fully distributed: ties collapse into one
    row per distinct score with (count, pos-count) — map-side partial
    aggregation, so the shuffle carries distinct scores, not rows — then
    the running count over the score order comes from the range-partitioned
    prefix sum (operators/distsort.py), never a single-partition window.
    avg rank of a tie group = rows-before + (group size + 1)/2.
    """
    from .distsort import with_running_totals

    is_pos = (F.col(label_col) == "spam").cast("int")
    g = scored.groupBy(score_col).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(is_pos).alias("pos")
    )
    g = with_running_totals(g, [F.asc(score_col)], {"cum": "cnt"})
    avg_rank = F.col("cum") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
    agg = g.agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
        F.sum(F.col("pos") * avg_rank).alias("pos_rank_sum"),
    )
    raw_auc = (
        F.col("pos_rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * F.col("n_neg"))
    # single-class input: AUC is undefined — surface an explicit NULL
    # rather than an accidental divide-by-zero NULL
    auc = F.when(F.col("n_pos") * F.col("n_neg") > 0, raw_auc)
    return agg.select(
        "n_pos",
        "n_neg",
        # floor_round: rank sums are exact half-integers over integer
        # denominators — the .5-at-scale tie class
        floor_round(auc, 6).alias("auc"),
        floor_round((1 - auc) * 100, 4).alias("roca_pct"),
    )


def spam_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality of the single trained model, the reference's headline
    metric shape (1-ROCA%)."""
    return ranking_auc(apply_spam_classifier(spark, sf_dir))


def apply_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vote ensemble: score = #spam-votes − #ham-votes, spam iff majority
    (ApplyEnsembleSpamClassifier.scala:90-104)."""
    scored = _ensemble_scores(spark, sf_dir)
    votes = sum(
        F.when(F.col(f"score_{i}") > 0, 1).otherwise(0) for i in range(N_ENSEMBLE)
    )
    score = (votes - (N_ENSEMBLE - votes)).cast("double")
    return scored.select(
        "docid",
        "label",
        score.alias("score"),
        F.when(votes > N_ENSEMBLE - votes, "spam").otherwise("ham").alias("pred"),
    )


CALIB_BINS = 10


def spam_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, n_docs, avg_pred_prob, spam_rate): reliability-diagram
    buckets for the trained spam classifier — predicted probability
    sigmoid(score) bucketed into CALIB_BINS equal-width bins, each
    reporting the mean predicted probability vs the observed spam rate.
    The model-evaluation complement to ranking_auc: AUC measures
    ordering, calibration measures whether the probabilities mean what
    they say (the Platt-scaling diagnostic).

    Determinism: probabilities derive from the 6dp-ROUNDED score both
    engines already agree on, so bin assignment can never straddle an
    engine-specific ulp. One classifier application + one small hash
    aggregate; output is CALIB_BINS rows."""
    scored = apply_spam_classifier(spark, sf_dir)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))
    bucket = F.least(
        F.lit(CALIB_BINS - 1),
        F.floor(prob * CALIB_BINS).cast("int"),
    )
    return (
        scored.select(
            bucket.alias("bin"),
            prob.alias("p"),
            F.when(F.col("label") == "spam", 1).otherwise(0).alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("p"), 4).alias("avg_pred_prob"),
            floor_round(F.avg("y"), 4).alias("spam_rate"),
        )
    )
