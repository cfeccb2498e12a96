"""Reference-native format connectors: .tbl, text corpus, adjacency lists."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_infra_cs489_spark.sources.formats import (
    TPCH_TBL_SCHEMAS,
    read_adjacency,
    read_tbl,
    read_text_corpus,
    write_adjacency,
    write_tbl,
    write_text,
)
from bigdata_infra_cs489_spark.sources.tables import load


def test_tbl_roundtrip_lineitem(spark, sf_smoke, tmp_path):
    """Fixture lineitem -> .tbl text -> typed scan reproduces every row."""
    src = load(spark, sf_smoke, "lineitem")
    path = str(tmp_path / "lineitem_tbl")
    write_tbl(src, path)
    back = read_tbl(spark, path, src.schema)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_tbl_parses_dbgen_trailing_pipe(spark, tmp_path):
    """dbgen lines end with '|'; the extra empty field must be ignored."""
    p = tmp_path / "nation.tbl"
    p.write_text(
        "0|ALGERIA|0| haggle. carefully final deposits detect slyly agai|\n"
        "1|ARGENTINA|1|al foxes promise slyly according to the regular accounts.|\n"
    )
    df = read_tbl(spark, str(p), "nation")
    rows = {r["n_nationkey"]: r for r in df.collect()}
    assert rows[0]["n_name"] == "ALGERIA"
    assert rows[1]["n_regionkey"] == 1
    assert rows[1]["n_comment"].startswith("al foxes")
    assert set(df.columns) == {c.name for c in TPCH_TBL_SCHEMAS["nation"].fields}


def test_text_corpus_roundtrip(spark, sf_smoke, tmp_path):
    """documents.text -> text lines -> corpus scan: same bag of lines,
    unique doc ids."""
    docs = load(spark, sf_smoke, "documents").select("text").where(
        ~F.col("text").contains("\n")
    )
    path = str(tmp_path / "corpus")
    write_text(docs, path)
    back = read_text_corpus(spark, path)
    n = docs.count()
    assert back.count() == n
    assert back.select("doc_id").distinct().count() == n
    assert sorted(r["text"] for r in back.collect()) == sorted(
        r["text"] for r in docs.collect()
    )


def test_adjacency_roundtrip(spark, sf_smoke, tmp_path):
    """PPR graph -> adjacency text -> scan reproduces (id, adj), including
    dangling nodes as empty arrays."""
    from bigdata_infra_cs489_spark.operators.graph import build_graph

    g = build_graph(spark, sf_smoke).select("id", "adj")
    path = str(tmp_path / "adj")
    write_adjacency(g, path)
    back = read_adjacency(spark, path)
    a = {r["id"]: list(r["adj"]) for r in g.collect()}
    b = {r["id"]: list(r["adj"]) for r in back.collect()}
    assert a == b
    assert any(len(v) == 0 for v in b.values())  # dangling nodes survive


def test_ingest_tbl_to_parquet_roundtrip(spark, sf_smoke, tmp_path):
    """text -> columnar ingest: the parquet copy carries the same rows and
    schema as the .tbl source."""
    from bigdata_infra_cs489_spark.sources.formats import ingest_tbl_to_parquet

    src = load(spark, sf_smoke, "supplier")
    tbl_dir = str(tmp_path / "supplier_tbl")
    pq_dir = str(tmp_path / "supplier_pq")
    write_tbl(src, tbl_dir)
    ingest_tbl_to_parquet(spark, tbl_dir, pq_dir, src.schema)
    back = spark.read.parquet(pq_dir)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_jsonl_roundtrip(spark, sf_smoke, tmp_path):
    """events -> JSONL -> back: schema-pinned read returns the same rows
    (timestamps carried as epoch micros to stay JSON-portable)."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.sources.formats import read_jsonl, write_jsonl
    from bigdata_infra_cs489_spark.sources.tables import load

    ev = load(spark, sf_smoke, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_jsonl")
    write_jsonl(ev, path)

    back = read_jsonl(
        spark,
        path,
        schema="event_id bigint, ts_us bigint, user_id bigint, "
        "event_type string, value double",
    )
    assert sorted(back.columns) == sorted(ev.columns)
    a = {tuple(r) for r in ev.collect()}
    b = {tuple(r[c] for c in ev.columns) for r in back.collect()}
    assert a == b and len(a) > 0


def test_jsonl_roundtrip_and_exact_percentiles_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("jsonl_roundtrip_events", "events_value_median_by_type"):
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)
