"""Interactive query driver (SURVEY §3.3 lifecycle parity).

The reference ships interactive drivers (BooleanRetrievalCompressed reads
postfix queries and prints matching docs). Equivalent entry points:

    python -m bigdata_infra_cs489_spark boolean "fast slow AND" [--sf-dir D] [-n 20]
    python -m bigdata_infra_cs489_spark rank "fast data table" [--sf-dir D] [-n 10]
    python -m bigdata_infra_cs489_spark run <query-name> [--sf-dir D] [-n 20]
    python -m bigdata_infra_cs489_spark explain <query-name> [--sf-dir D]
    python -m bigdata_infra_cs489_spark list

``run`` executes any registered query from the driver contract; ``list``
prints the registry with oracle coverage.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bigdata_infra_cs489_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp):
        sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        sp.add_argument("-n", "--limit", type=int, default=20)

    b = sub.add_parser("boolean", help="postfix boolean retrieval")
    b.add_argument("query")
    add_common(b)

    r = sub.add_parser("rank", help="ranked retrieval (tf-idf, or BM25 with --bm25)")
    r.add_argument("query")
    r.add_argument("--bm25", action="store_true")
    add_common(r)

    ru = sub.add_parser("run", help="run a registered query by name")
    ru.add_argument("name")
    add_common(ru)

    ex = sub.add_parser(
        "explain", help="print a registered query's physical plan"
    )
    ex.add_argument("name")
    ex.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    cu = sub.add_parser(
        "curate",
        help="run the end-to-end curation pipeline and write the "
        "split-partitioned curated corpus (parquet)",
    )
    cu.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    cu.add_argument("--out", required=True)
    cu.add_argument(
        "--v2",
        action="store_true",
        help="use corpus_curate_v2 (Gopher gate + PII/line-dedup audit "
        "columns) and export PII-redacted text",
    )

    sub.add_parser("list", help="list registered queries")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .plans import registry

    if args.cmd == "list":
        qs, oracles = registry.queries(), registry.oracle_sql()
        for name in sorted(qs):
            kind = "oracle" if name in oracles else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    from .session import get_spark

    spark = get_spark(app_name="interactive")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "curate":
        from pyspark.sql import functions as F

        from .operators.curate import corpus_curate, corpus_curate_v2
        from .operators.spans import strip_spans

        kept = (corpus_curate_v2 if args.v2 else corpus_curate)(
            spark, args.sf_dir
        )
        # join the cleaned text onto the surviving docs; the span lineage
        # runs once per branch here (one-shot export job — sharing it
        # would need an explicit checkpoint for no steady-state benefit)
        clean = strip_spans(spark, args.sf_dir).select("doc_id", "clean_text")
        if args.v2:
            # v2 export ships the scrubbing stage: placeholders replace
            # every PII hit in the span-stripped text, and the exported
            # n_redactions counts the substitutions made on THIS text
            # (stage-wise, same order as the replacements), so the audit
            # column describes the clean_text in the same row — the
            # pipeline's own n_redactions (decorated-fixture twin) stays
            # internal to the kept-set gate
            from .operators.pii import PII_PATTERNS

            expr = F.col("clean_text")
            counts = []
            for _, pat, ph in PII_PATTERNS:
                counts.append(F.regexp_count(expr, F.lit(pat)))
                expr = F.regexp_replace(expr, pat, ph)
            n_red = sum(counts[1:], counts[0]).cast("bigint")
            clean = clean.select(
                "doc_id", expr.alias("clean_text"), n_red.alias("n_redactions")
            )
            kept = kept.drop("n_redactions")
        audit = ["n_redactions", "dup_lines"] if args.v2 else []
        out = kept.join(clean, "doc_id").select(
            "doc_id",
            "cluster_id",
            "n_tokens",
            "kept_tokens",
            "quality_score",
            *audit,
            "clean_text",
            "split",
        )
        out.write.mode("overwrite").partitionBy("split").parquet(args.out)
        back = spark.read.parquet(args.out)
        counts = {
            r["split"]: r["n"]
            for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        toks = back.agg(F.sum("kept_tokens")).collect()[0][0]
        print(f"wrote {args.out}: {counts} ({toks} kept tokens)")
        return 0

    if args.cmd == "boolean":
        from .operators.index import boolean_retrieval

        df = boolean_retrieval(spark, args.sf_dir, args.query)
    elif args.cmd == "rank":
        from .operators.index import bm25_retrieval, ranked_retrieval

        scorer = bm25_retrieval if args.bm25 else ranked_retrieval
        df = scorer(spark, args.sf_dir, args.query, k=args.limit)
    else:
        qs = registry.queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = qs[args.name](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
            return 0

    df.show(args.limit, truncate=80)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
