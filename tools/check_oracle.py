#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf=0.01 and its DuckDB oracle, then
compares row count, column names, and an order-insensitive value
multiset (columns sorted by name). Usage:

    python tools/check_oracle.py [query ...]          # default: all
    python tools/check_oracle.py --json OUT.json ...  # also write a
        committable per-key artifact so full-catalog pass claims are
        auditable from the repo, not just session logs
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from aproximacion_1_etl_spark.session import get_spark
from aproximacion_1_etl_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_value(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def main(selected: list[str], json_out: str | None = None) -> int:
    spark = get_spark("oracle-check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = selected or list(qs)
    failures = []
    record: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            record[name] = {"pass": False, "mode": "error", "err": str(e)[:200]}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            record[name] = {
                "pass": bool(srows),
                "mode": "rows_only",
                "rows": len(srows),
            }
            if not srows:
                failures.append(name)
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            status.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not status:
            sn = normalize(srows, scols)
            dn = normalize(drows, dcols)
            if sn != dn:
                diffs = [
                    (a, b) for a, b in zip(sn, dn) if a != b
                ][:3]
                status.append(f"values differ, first diffs: {diffs}")
        if status:
            failures.append(name)
            record[name] = {
                "pass": False,
                "mode": "value_hash",
                "detail": "; ".join(status)[:200],
            }
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            record[name] = {
                "pass": True,
                "mode": "value_hash",
                "rows": len(srows),
                "secs": round(time.time() - t0, 1),
            }
            print(f"OK    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if json_out:
        import json

        payload = {
            "sf_dir": SF_DIR,
            "n_pass": len(names) - len(failures),
            "n_total": len(names),
            "keys": record,
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("-"):
            sys.exit("--json requires an output path (e.g. --json out.json)")
        out = argv[i + 1]
        if not out.endswith(".json"):
            sys.exit(
                f"--json path {out!r} must end in .json (guards against "
                "a query name being consumed as the output path)"
            )
        argv = argv[:i] + argv[i + 2 :]
    sys.exit(main(argv, out))
