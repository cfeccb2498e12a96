"""Local replica of the driver's correctness sweep.

Runs EVERY ``queries()`` entry at sf0.01 and compares it against its
``oracle_sql()`` twin via DuckDB — row count, column names, and an
order-insensitive canonical value comparison (arrays are already rendered
as canonical strings by the registry, matching the driver's pandas
``sort_values``-based canonicalizer which cannot hash list cells).

Usage:
    python -m tools.verify_sweep [--sf-dir /root/testdata/sf0.01] [names...]

Prints one status line per query and a JSON summary to
``SWEEP_LOCAL.json``; exits non-zero if any query fails.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from bigdata_infra_cs489_spark.plans import registry  # noqa: E402
from bigdata_infra_cs489_spark.session import get_spark  # noqa: E402
from tests.oracle import _canon, duck_connection, fragile_duck_columns  # noqa: E402


def sweep(sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    spark = get_spark()
    qs = registry.queries()
    oracles = registry.oracle_sql()
    names = only or list(qs)
    results: dict[str, dict] = {}
    con = duck_connection(sf_dir)
    for name in names:
        t0 = time.monotonic()
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = qs[name](spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(spark_rows)
            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                fragile = fragile_duck_columns(con, oracles[name])
                if fragile:
                    # would be driver-red even if values match locally:
                    # the driver's pandas canonicalizer mangles these types
                    rec["hash_match"] = False
                    rec["err"] = f"fragile_duck_types: {fragile}"
                    rec["sec"] = round(time.monotonic() - t0, 3)
                    results[name] = rec
                    print(f"{'FAIL':>9}  {name:<32} {rec['sec']:7.2f}s", flush=True)
                    print(f"           {rec['err']}", flush=True)
                    continue
                res = con.execute(oracles[name])
                duck_cols = [d[0] for d in res.description]
                duck_rows = [tuple(r) for r in res.fetchall()]
                rec["oracle_rows"] = len(duck_rows)
                rec["rows_match"] = len(spark_rows) == len(duck_rows)
                rec["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
                s = _canon(spark_rows, spark_cols)
                d = _canon(duck_rows, duck_cols)
                rec["hash_match"] = s == d
                if not rec["hash_match"] and rec["rows_match"]:
                    mism = [(a, b) for a, b in zip(s, d) if a != b]
                    rec["err"] = f"value mismatch {len(mism)} rows: {mism[:1]}"
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        rec["sec"] = round(time.monotonic() - t0, 3)
        results[name] = rec
        ok = rec["hash_match"] or (
            rec["err"] == "no_oracle" and (rec["spark_rows"] or 0) >= 0
        )
        flag = "ok" if rec["hash_match"] else (
            "rows-only" if rec["err"] == "no_oracle" else "FAIL"
        )
        print(f"{flag:>9}  {name:<32} {rec['sec']:7.2f}s", flush=True)
        if flag == "FAIL":
            print(f"           {str(rec['err'])[:500]}", flush=True)
        _ = ok
    con.close()
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    results = sweep(args.sf_dir, args.names or None)
    # A targeted run MERGES into the standing file instead of clobbering
    # the full-registry record (a 1-query rerun once replaced the whole
    # 173-entry sweep); only a full run rewrites it.
    if args.names:
        try:
            with open("/root/repo/SWEEP_LOCAL.json") as f:
                merged = json.load(f)
        except FileNotFoundError:
            merged = {}
        except (OSError, ValueError) as e:
            # A corrupt standing record must not be silently clobbered by
            # a targeted rerun — that is exactly how the full-sweep record
            # was lost once. Fail loudly; the operator decides.
            print(
                "ERROR: existing SWEEP_LOCAL.json is unreadable "
                f"({e!r}); refusing to merge a targeted run over it. "
                "Fix or remove the file, or run a full sweep.",
                file=sys.stderr,
            )
            return 2
        merged.update(results)
    else:
        merged = results
    with open("/root/repo/SWEEP_LOCAL.json", "w") as f:
        json.dump(merged, f, indent=1)
    n_ok = sum(1 for r in results.values() if r["hash_match"])
    n_rows_only = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = len(results) - n_ok - n_rows_only
    print(
        f"\n{len(results)} queries: {n_ok} hash-green, "
        f"{n_rows_only} rows-only, {n_fail} FAIL"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
