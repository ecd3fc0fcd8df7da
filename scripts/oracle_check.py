#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run declared queries on
Spark and their oracle SQL on DuckDB over the same parquet, compare row
multisets exactly (values as produced — both sides round identically).

Usage: python scripts/oracle_check.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401


TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, (int,)):
        return float(v) if isinstance(v, bool) is False and False else v
    return v


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        else:
            args.append(a)

    import duckdb

    from sher_look_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("oracle-check", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 8))
    from sher_look_spark.queries import oracle_sql, queries

    qs, sqls = queries(), oracle_sql()
    names = args or [k for k in qs if k in sqls]

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            orows = [tuple(r) for r in con.execute(sqls[name]).fetchall()]

            def key(rows):
                # numerics compare by exact value across int/float (Python
                # int-vs-float comparison is exact — no precision loss for
                # 60-bit hashes); everything else by string form
                out = []
                for r in rows:
                    out.append(tuple(
                        ("n", v) if isinstance(v, (int, float)) and not isinstance(v, bool)
                        else ("o", str(v))
                        for v in r
                    ))
                return sorted(out, key=str)

            ok = len(srows) == len(orows) and key(srows) == key(orows)
            print(f"{name}: rows spark={len(srows)} oracle={len(orows)} "
                  f"{'OK' if ok else 'MISMATCH'}")
            if not ok:
                failures.append(name)
                sk, okk = key(srows), key(orows)
                for i, (a, b) in enumerate(zip(sk, okk)):
                    if a != b:
                        print(f"  first diff at {i}:\n    spark : {a}\n    oracle: {b}")
                        break
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
