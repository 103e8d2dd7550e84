"""Driver-protocol oracle sweep: run every registered query in Spark AND
its DuckDB oracle on the same parquet directory, compare row count, column
names, and the order-insensitive value hash — the exact compare the
driver's CORRECTNESS gate uses, over the FULL registry instead of its
50-query sample.

Usage: python scripts/oracle_sweep.py [sf_dir] [--json PATH]
(default sf_dir /root/testdata/sf0.01). Prints one line per mismatch and a
final TOTAL/FAILURES line; exit 1 on any failure. --json appends a
one-object summary line {sf_dir, total, failures} to PATH — the committed
per-round sweep artifact (round-7 ADVICE: the full-registry result must be
reproducible from the repo, not just from a session log).
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.session import get_spark  # noqa: E402
from healthcare_rcm_etl_pipeline_spark.sources.readers import TESTDATA_TABLES  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, int):
        return repr(float(v)) if abs(v) < 1e15 else repr(v)
    return str(v)


def main() -> int:
    args = list(sys.argv[1:])
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: oracle_sweep.py [SF_DIR] [--json OUT.json]", file=sys.stderr)
            return 2
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark(cpus=16, driver_memory="16g", app_name="hrcm-oracle-sweep")
    assert len(entrymod.entry(spark).collect()) > 0
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    fails = []
    for name in sorted(qs):
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name} rows-only {len(srows)}")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        scols = sdf.columns
        si = sorted(range(len(scols)), key=lambda i: scols[i])
        di = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and sorted("|".join(canon(r[i]) for i in si) for r in srows)
            == sorted("|".join(canon(r[i]) for i in di) for r in drows)
        )
        if not ok:
            fails.append(name)
            print(f"{name} MISMATCH spark={len(srows)} oracle={len(drows)}")
    print(f"TOTAL {len(qs)} FAILURES: {fails or 'none'}")
    if json_path:
        import json
        import subprocess

        from closeout import source_digest

        # Provenance stamps (r14 verdict #2): source_digest is the
        # asserted field — tests/test_closeout.py recomputes it on the
        # working tree, so a source commit after the sweep turns the
        # closeout guard red. git_head is informational (the digest also
        # covers uncommitted source, which a commit hash cannot).
        try:
            head = subprocess.run(
                ["git", "-C", "/root/repo", "rev-parse", "HEAD"],
                capture_output=True,
                text=True,
                check=True,
            ).stdout.strip()
        except Exception:
            head = None
        with open(json_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "total": len(qs),
                        "failures": fails,
                        "source_digest": source_digest(),
                        "git_head": head,
                    }
                )
                + "\n"
            )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
