"""pack_manifest (the attention-mask / lineage manifest of
sequence_pack) vs an inline DuckDB oracle plus tiling invariants
(staged for round-8 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.textstats import (
    SEQ_LEN,
    pack_manifest,
    sequence_pack,
)

from .oracle import assert_matches_oracle


def _manifest_sql() -> str:
    from bigdata_infra_cs489_spark.operators.textstats import PACK_SALT
    from bigdata_infra_cs489_spark.plans.catalog import (
        _TEXT_QUALITY_SQL,
        DUCK_H8,
    )

    ok = DUCK_H8.format(x=f"(CAST(doc_id AS VARCHAR) || '{PACK_SALT}')")
    return f"""
    WITH tq AS ({_TEXT_QUALITY_SQL}),
    o AS (SELECT doc_id, n_tokens, {ok} AS ok FROM tq),
    c AS (SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY ok, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM o),
    nz AS (SELECT doc_id, n_tokens, cum, cum - n_tokens AS gstart
           FROM c WHERE n_tokens > 0),
    spans AS (
        SELECT seq_id, doc_id,
               greatest(gstart - seq_id * {SEQ_LEN}, 0) AS start,
               least(gstart + n_tokens - 1, (seq_id + 1) * {SEQ_LEN} - 1)
                   - seq_id * {SEQ_LEN} AS "end"
        FROM (SELECT *, unnest(range(CAST(gstart // {SEQ_LEN} AS BIGINT),
                                     CAST((cum - 1) // {SEQ_LEN} + 1
                                          AS BIGINT))) AS seq_id
              FROM nz))
    SELECT seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum("end" - start + 1) AS BIGINT) AS seq_tokens,
           array_to_string(
               list(CAST(doc_id AS VARCHAR) || ':' || CAST(start AS VARCHAR)
                    || ':' || CAST("end" AS VARCHAR)
                    ORDER BY start, doc_id), ';') AS doc_spans
    FROM spans GROUP BY seq_id
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        pack_manifest(spark, sf_correct), _manifest_sql(), sf_correct
    )


def test_manifest_tiles_every_sequence(spark, sf_correct):
    """Tiling invariants: within each sequence the spans start at 0, are
    contiguous and non-overlapping, sum to seq_tokens; every sequence
    except the last is exactly full; and the manifest agrees with
    sequence_pack's (seq_id, seq_offset) for every document head."""
    rows = sorted(
        pack_manifest(spark, sf_correct).collect(), key=lambda r: r["seq_id"]
    )
    assert rows
    assert [r["seq_id"] for r in rows] == list(range(len(rows)))
    heads = {}
    for r in rows:
        spans = [
            tuple(map(int, p.split(":"))) for p in r["doc_spans"].split(";")
        ]
        assert spans[0][1] == 0, r["seq_id"]
        for (d1, s1, e1), (d2, s2, e2) in zip(spans, spans[1:]):
            assert s2 == e1 + 1, (r["seq_id"], d1, d2)
        assert sum(e - s + 1 for _, s, e in spans) == r["seq_tokens"]
        assert len(spans) == r["n_docs"]
        for d, s, _e in spans:
            # rows iterate in seq order, so setdefault keeps the head
            # piece — where the doc begins
            heads.setdefault(d, (r["seq_id"], s))
    for r in rows[:-1]:
        assert r["seq_tokens"] == SEQ_LEN, r["seq_id"]

    pack = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in sequence_pack(spark, sf_correct).collect()
        if r["n_tokens"] > 0
    }
    assert heads == pack
