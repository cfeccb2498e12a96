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
