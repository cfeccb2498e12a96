"""Central registration of every (query, oracle) pair.

Kept in one file so SURVEY.md §2 coverage is auditable at a glance; the
callables live in the operator modules.
"""

from __future__ import annotations

from ..operators import relational as R
from ..operators import text_analytics as T
from .registry import register

# DuckDB twin of the reference tokenizer (functions/text.py tokenize()):
# whitespace split -> lowercase -> strip leading/trailing non-[a-z] -> drop empties.
DUCK_TOKS = (
    "list_filter(list_transform(string_split_regex(lower(text), '\\s+'), "
    "t -> regexp_replace(t, '(^[^a-z]+|[^a-z]+$)', '', 'g')), t -> len(t) > 0)"
)

# --- assignment5 relational core (SURVEY §2.2-2.7, reference Q1..Q7) -------

register(
    "q1_count_shipped",
    lambda spark, sf: R.q1(spark, sf),
    f"""
    SELECT count(*) AS count_shipped
    FROM lineitem
    WHERE strftime(l_shipdate, '%Y-%m-%d') LIKE '{R.Q1_DATE}%'
    """,
)

register(
    "q2_orders_semijoin_topk",
    lambda spark, sf: R.q2(spark, sf),
    f"""
    SELECT o_orderpriority, o_orderkey
    FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        WHERE strftime(l_shipdate, '%Y-%m-%d') LIKE '{R.Q2_DATE}%')
    ORDER BY o_orderkey
    LIMIT 20
    """,
)

register(
    "q3_lineitem_part_supplier",
    lambda spark, sf: R.q3(spark, sf),
    f"""
    SELECT l_orderkey, p_name, s_name
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE strftime(l_shipdate, '%Y-%m-%d') LIKE '{R.Q3_DATE}%'
    ORDER BY l_orderkey, p_name, s_name
    LIMIT 20
    """,
)

register(
    "q4_shipments_by_nation",
    lambda spark, sf: R.q4(spark, sf),
    f"""
    SELECT n_nationkey, n_name, count(*) AS count_shipped
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE strftime(l_shipdate, '%Y-%m-%d') LIKE '{R.Q4_DATE}%'
    GROUP BY n_nationkey, n_name
    ORDER BY n_nationkey
    """,
)

register(
    "q5_monthly_shipments_two_nations",
    lambda spark, sf: R.q5(spark, sf),
    f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, n_name,
           count(*) AS count_shipped
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_nationkey IN ({R.IN_NATIONS[0]}, {R.IN_NATIONS[1]})
    GROUP BY ship_month, n_name
    ORDER BY ship_month, n_name
    """,
)

register(
    "q6_pricing_summary",
    lambda spark, sf: R.q6(spark, sf),
    f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE strftime(l_shipdate, '%Y-%m-%d') LIKE '{R.Q6_DATE}%'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)

register(
    "q7_top_revenue_orders",
    lambda spark, sf: R.q7(spark, sf),
    f"""
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_shipdate > TIMESTAMP '{R.Q7_DATE} 00:00:00'
      AND o_orderdate < TIMESTAMP '{R.Q7_DATE} 00:00:00'
    GROUP BY c_name, o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)

# --- text analytics (SURVEY §2.4/§2.8, assignments 0-2) ---------------------

register(
    "wordcount",
    lambda spark, sf: T.word_count(spark, sf),
    f"""
    WITH toks AS (SELECT {DUCK_TOKS} AS toks FROM documents)
    SELECT word, count(*) AS "count"
    FROM (SELECT unnest(toks) AS word FROM toks)
    GROUP BY word
    """,
)

register(
    "prefix_count",
    lambda spark, sf: T.prefix_count(spark, sf),
    f"""
    WITH toks AS (SELECT {DUCK_TOKS} AS toks FROM documents)
    SELECT substr(word, 1, 2) AS prefix, count(*) AS "count"
    FROM (SELECT unnest(toks) AS word FROM toks)
    GROUP BY prefix
    """,
)

register(
    "bigram_rel_freq",
    lambda spark, sf: T.bigram_relative_frequency(spark, sf),
    f"""
    WITH toks AS (SELECT {DUCK_TOKS} AS toks FROM documents),
    bg AS (
        SELECT unnest(toks[1:len(toks)-1]) AS lt, unnest(toks[2:len(toks)]) AS rt
        FROM toks WHERE len(toks) > 1
    ),
    counts AS (SELECT lt, rt, count(*) AS cnt FROM bg GROUP BY lt, rt)
    SELECT lt AS left_token, rt AS right_token,
           round(cnt / sum(cnt) OVER (PARTITION BY lt), 6) AS rel_freq
    FROM counts
    UNION ALL
    SELECT lt, '*', round(CAST(sum(cnt) AS DOUBLE), 6)
    FROM counts GROUP BY lt
    """,
)

register(
    "pmi_word_line_counts",
    lambda spark, sf: T.pmi_word_line_counts(spark, sf),
    f"""
    WITH toks AS (
        SELECT doc_id, list_distinct(({DUCK_TOKS})[1:{T.PMI_TOKEN_CAP}]) AS toks
        FROM documents
    )
    SELECT word, count(*) AS line_count
    FROM (SELECT unnest(toks) AS word FROM toks WHERE len(toks) > 0)
    GROUP BY word
    HAVING count(*) >= {T.MIN_COUNT}
    """,
)

register(
    "pmi_pairs",
    lambda spark, sf: T.pmi_pairs(spark, sf),
    f"""
    WITH toks AS (
        SELECT doc_id, list_distinct(({DUCK_TOKS})[1:{T.PMI_TOKEN_CAP}]) AS toks
        FROM documents
    ),
    lines AS (SELECT * FROM toks WHERE len(toks) > 0),
    n AS (SELECT count(*) AS n FROM lines),
    words AS (SELECT doc_id, unnest(toks) AS word FROM lines),
    wc AS (SELECT word, count(*) AS c FROM words GROUP BY word
           HAVING count(*) >= {T.MIN_COUNT}),
    pairs AS (
        SELECT a.word AS lt, b.word AS rt, count(*) AS pc
        FROM words a JOIN words b USING (doc_id)
        WHERE a.word <> b.word
        GROUP BY lt, rt
        HAVING count(*) >= {T.MIN_COUNT}
    )
    SELECT lt AS left_token, rt AS right_token,
           round(log10(pc / (wx.c * wy.c) * (SELECT n FROM n)), 6) AS pmi
    FROM pairs
    JOIN wc wx ON wx.word = lt
    JOIN wc wy ON wy.word = rt
    """,
)

# --- inverted index + boolean retrieval (SURVEY §2.9 M10-M12, assignment3/7) -

from ..operators import index as I  # noqa: E402

register(
    "inverted_index_postings",
    lambda spark, sf: I.postings(spark, sf),
    f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents)
    SELECT term, doc_id, count(*) AS tf
    FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
    GROUP BY term, doc_id
    """,
)

register(
    "inverted_index_df",
    lambda spark, sf: I.postings_df(spark, sf),
    f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    p AS (
        SELECT term, doc_id FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
        GROUP BY term, doc_id
    )
    SELECT term, count(*) AS df FROM p GROUP BY term
    """,
)

BOOLEAN_QUERY = "fast table AND slow OR"  # postfix: (fast ∩ table) ∪ slow

register(
    "boolean_retrieval",
    lambda spark, sf: I.boolean_retrieval(spark, sf, BOOLEAN_QUERY),
    f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks),
    hits AS (
        (SELECT doc_id FROM dt WHERE term = 'fast'
         INTERSECT
         SELECT doc_id FROM dt WHERE term = 'table')
        UNION
        SELECT doc_id FROM dt WHERE term = 'slow'
    )
    SELECT h.doc_id, d.text FROM hits h JOIN documents d ON h.doc_id = d.doc_id
    """,
)

# --- personalized PageRank (SURVEY §2.9 M1-M5, assignment4) ------------------

from ..operators import graph as G  # noqa: E402

register(
    "ppr_graph_edges",
    lambda spark, sf: G.graph_edges(spark, sf),
    """
    WITH n AS (SELECT count(*) AS c FROM documents)
    SELECT DISTINCT doc_id AS src,
           (doc_id * k + 1) % (SELECT c FROM n) AS dst
    FROM documents, unnest(range(1, (doc_id % 5) + 1)) AS t(k)
    """,
)

# Iterative fixpoint: not SQL-expressible -> rows-only driver check; the
# numerics are pinned by a NumPy replay oracle in tests/test_graph.py.
register(
    "ppr_topk",
    lambda spark, sf: G.ppr_top_k(spark, sf),
)

# --- spam classifier (SURVEY §2.9 M6-M9, assignment6) ------------------------

from ..operators import ml as M  # noqa: E402

register(
    "spam_training_set",
    lambda spark, sf: M.spam_training_set(spark, sf),
    f"""
    SELECT doc_id AS docid,
           CASE WHEN doc_id % 3 = 0 THEN 'spam' ELSE 'ham' END AS label,
           list_transform({DUCK_TOKS},
               t -> CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)
                         % {M.FEATURE_MOD} AS INT)) AS features,
           source
    FROM documents
    """,
)

# Sequential SGD and everything downstream of its weights: order-sensitive
# fold, not SQL-expressible -> rows-only driver checks; numerics pinned by
# a pure-Python replay oracle in tests/test_ml.py.
register("spam_train", lambda spark, sf: M.train_spam_classifier(spark, sf))
register(
    "spam_train_shuffled",
    lambda spark, sf: M.train_spam_classifier(spark, sf, shuffle=True),
)
register("spam_apply", lambda spark, sf: M.apply_spam_classifier(spark, sf))
register(
    "spam_ensemble_average", lambda spark, sf: M.apply_ensemble_average(spark, sf)
)
register("spam_ensemble_vote", lambda spark, sf: M.apply_ensemble_vote(spark, sf))
