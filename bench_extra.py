#!/usr/bin/env python
"""Optimization-round measurement harness (bench.py is FROZEN — guide §1).

Two jobs:
  * capture `.explain("formatted")` for named queries into plans/<tag>/ so
    plan-shape claims (Exchange count, join strategy, BatchEvalPython nodes)
    are checkable offline;
  * time each query in isolation with the noop sink (guide §1.4) so the
    computation is measured, not the count()-pruned subtree or the sink.

Usage:
  python bench_extra.py --plans r06_before [query ...]
  python bench_extra.py --time [query ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

import pandas as pd  # noqa: F401 — pandas-UDF type hints resolve here


DEFAULT_QUERIES = [
    "rel_pricing_summary",
    "rel_region_revenue",
    "i4_tokenize_positions",
    "i11_idf",
    "q4_tfidf",
    "q8_pagerank",
    "q9_blend",
    "q11_snippets",
    "dedup_minhash_lsh",
    "sim_neardup_pairs",
]


def _spark(cpus: int):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    shm = "/dev/shm/spark-local"
    os.makedirs(shm, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", shm)
    from sher_look_spark.session import get_spark

    return get_spark(
        "sher-look-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_tag = None
    for a in sys.argv[1:]:
        if a.startswith("--plans"):
            plans_tag = a.split("=", 1)[1] if "=" in a else None
    if plans_tag is None and "--plans" in sys.argv:
        # --plans TAG form
        i = sys.argv.index("--plans")
        plans_tag = sys.argv[i + 1]
        args = [a for a in args if a != plans_tag]
    names = args or DEFAULT_QUERIES

    spark = _spark(cpus)
    from sher_look_spark.queries import queries

    qs = queries()
    # same warmup as bench.py so first-query timings are comparable
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def _warm(v: pd.Series) -> pd.Series:
        return v

    spark.range(100_000).select(F.sum(_warm("id"))).collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    out_dir = None
    if plans_tag:
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", plans_tag)
        os.makedirs(out_dir, exist_ok=True)

    timings = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"extra:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        if out_dir is not None:
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
                fh.write(explain_str(df))
        if "--time" in sys.argv:
            df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "mode": "noop" if "--time" in sys.argv else "plan",
                      "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
