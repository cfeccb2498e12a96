"""The interactive driver entry points (python -m bigdata_infra_cs489_spark)."""

from __future__ import annotations


def test_cli_list(capsys):
    from bigdata_infra_cs489_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "boolean_retrieval\toracle" in out
    # ppr_topk gained a full unrolled-SQL oracle in round 3, and the
    # sequential SGD family gained recursive-CTE replay oracles — every
    # registered query now carries a value oracle
    assert "ppr_topk\toracle" in out
    assert "spam_train\toracle" in out
    assert "rows-only" not in out


def test_cli_boolean_and_rank(spark, sf_smoke, capsys):
    from bigdata_infra_cs489_spark.__main__ import main

    assert main(["boolean", "fast slow AND", "--sf-dir", sf_smoke]) == 0
    assert main(["rank", "fast data", "--sf-dir", sf_smoke, "-n", "5"]) == 0
    out = capsys.readouterr().out
    assert "doc_id" in out and "score" in out


def test_cli_run_and_unknown(spark, sf_smoke, capsys):
    from bigdata_infra_cs489_spark.__main__ import main

    assert main(["run", "wordcount", "--sf-dir", sf_smoke]) == 0
    assert main(["run", "no_such_query", "--sf-dir", sf_smoke]) == 2


def test_cli_rank_bm25(spark, sf_smoke, capsys):
    from bigdata_infra_cs489_spark.__main__ import main

    assert main(["rank", "fast data", "--bm25", "--sf-dir", sf_smoke, "-n", "5"]) == 0
    assert "score" in capsys.readouterr().out


def test_cli_explain(spark, sf_smoke, capsys):
    from bigdata_infra_cs489_spark.__main__ import main

    assert main(["explain", "q6_pricing_summary", "--sf-dir", sf_smoke]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "HashAggregate" in out


def test_cli_curate_writes_partitioned_corpus(spark, sf_smoke, tmp_path, capsys):
    """The export surface of the flagship pipeline: curated rows joined to
    their span-stripped text, written as split-partitioned parquet, and
    readable back with per-split partition pruning."""
    from bigdata_infra_cs489_spark.__main__ import main
    from bigdata_infra_cs489_spark.operators.curate import corpus_curate

    out = str(tmp_path / "curated")
    assert main(["curate", "--sf-dir", sf_smoke, "--out", out]) == 0
    assert "wrote" in capsys.readouterr().out
    back = spark.read.parquet(out)
    expect = corpus_curate(spark, sf_smoke).collect()
    assert back.count() == len(expect)
    assert set(back.columns) == {
        "doc_id", "cluster_id", "n_tokens", "kept_tokens",
        "quality_score", "clean_text", "split",
    }
    splits = {r.split for r in back.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # partition pruning: a split filter must not scan the other dirs
    plan = (
        back.where("split = 'train'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "split=train" not in plan or "split=val" not in plan
    # the stripped text length matches the recorded kept token count
    for r in back.collect():
        assert len(r.clean_text.split()) == r.kept_tokens


def test_cli_curate_v2_exports_redacted_audited_corpus(spark, sf_smoke, tmp_path, capsys):
    """--v2: the export carries the audit columns and the shipped text is
    actually scrubbed — no PII pattern matches anything in the output."""
    import re

    from bigdata_infra_cs489_spark.__main__ import main
    from bigdata_infra_cs489_spark.operators.curate import corpus_curate_v2
    from bigdata_infra_cs489_spark.operators.pii import PII_PATTERNS

    out = str(tmp_path / "curated_v2")
    assert main(["curate", "--v2", "--sf-dir", sf_smoke, "--out", out]) == 0
    assert "wrote" in capsys.readouterr().out
    back = spark.read.parquet(out)
    assert back.count() == corpus_curate_v2(spark, sf_smoke).count()
    assert {"n_redactions", "dup_lines"} <= set(back.columns)
    for r in back.collect():
        for _, pat, _ph in PII_PATTERNS:
            assert not re.search(pat, r.clean_text), (r.doc_id, pat)
        # n_redactions describes THIS row's clean_text: each substitution
        # inserted exactly one placeholder token, and placeholders never
        # occur in the source corpus
        n_ph = sum(r.clean_text.count(ph) for _, _, ph in PII_PATTERNS)
        assert r.n_redactions == n_ph, (r.doc_id, r.n_redactions, n_ph)
