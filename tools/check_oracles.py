"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB over the same sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
rounded). Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    # The driver's hasher is type-sensitive: DuckDB HUGEINT arrives as
    # decimal.Decimal and must NOT silently equal a Spark int64. Tag it so a
    # missing ::bigint cast in the oracle SQL fails locally too.
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{round(v, 6):.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(canon).encode()).hexdigest()
    return h, len(rows), sorted(cols)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from xlink_spark.session import get_spark

    spark = get_spark(app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            sh, sn, scols = table_hash(cols, rows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            status = "ROWS " if sn >= 0 else "FAIL "
            print(f"{status} {name}: rows={sn} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            oh, on, ocols_s = table_hash(ocols, orows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = (sh == oh) and (sn == on) and (scols == ocols_s)
        if ok:
            print(f"OK    {name}: rows={sn} hash={sh[:10]} [{time.time()-t0:.1f}s]")
        else:
            print(
                f"FAIL  {name}: spark(rows={sn}, cols={scols}, hash={sh[:10]}) "
                f"vs duckdb(rows={on}, cols={ocols_s}, hash={oh[:10]})"
            )
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
