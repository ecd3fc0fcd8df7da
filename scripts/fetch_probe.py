"""Isolated fetch-stage scaling probe: 20k web-sized JPEG fetches through
the engine's real mapInPandas fetch mapper at local[8] vs local[32], with
the /proc-subtree CPU split by process class (JVM vs python workers).

This isolates the two Spark-side costs the round-4 forensics identified on
top of the box's inherent ~1.12x inflation (scripts/scaling_control.py):

* in-worker CPU inflation — python-worker CPU-ms/URL at 32 vs 8 threads
  (codec work + Arrow (de)serialization inside the worker);
* JVM share — java CPU-ms/URL (task scheduling, shuffle write of the
  fetched bytes, Arrow socket pumping, GC).

Run in a QUIET window: `python scripts/fetch_probe.py` prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_URLS = 20000


def _cpu_by_class() -> dict:
    """Cumulative CPU seconds of this process's /proc subtree, split by
    process class: 'java' (gateway JVM) vs 'python' (pyspark daemon +
    workers; reaped workers fold into the daemon's cutime) vs 'driver'
    (this process). Sampled while the subtree is alive."""
    me = os.getpid()
    clk = os.sysconf("SC_CLK_TCK")
    parents: dict[int, int] = {}
    ticks: dict[int, int] = {}
    comm: dict[int, str] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as fh:
                head, tail = fh.read().rsplit(")", 1)
            comm[int(d)] = head.split("(", 1)[1]
            parts = tail.split()
            parents[int(d)] = int(parts[1])
            ticks[int(d)] = (
                int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])
            )
        except OSError:
            continue
    out = {"java": 0.0, "python": 0.0, "driver": 0.0, "other": 0.0}
    for pid, t in ticks.items():
        p = pid
        for _ in range(64):
            if p == me:
                if pid == me:
                    cls = "driver"
                elif "java" in comm.get(pid, ""):
                    cls = "java"
                elif "py" in comm.get(pid, ""):
                    cls = "python"
                else:
                    cls = "other"
                out[cls] += t / clk
                break
            p = parents.get(p, 0)
            if p <= 1:
                break
    return out


def probe(cpus: int, n: int = N_URLS) -> dict:
    from pyspark.sql import functions as F

    from sher_look_spark.crawler import synth
    from sher_look_spark.crawler.engine import FETCH_SCHEMA, _make_fetch_mapper
    from sher_look_spark.session import get_spark

    shm = "/dev/shm/spark-local"
    os.makedirs(shm, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", shm)
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(
        f"fetch-probe-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    web = synth.SynthWebConfig(
        n_hosts=500, pages_per_host=400, seed=4242, min_links=10, max_links=24,
        img_min=128, img_max=224, jpeg_every=1,
    )
    rows = [(synth.page_url(web, i % 500, i % 400), 1, i) for i in range(n)]
    cand = spark.createDataFrame(rows, "url string, depth int, rank long").persist()
    cand.count()
    mapper = _make_fetch_mapper(web)
    # warm the worker pool + JIT so the measured leg is steady-state
    cand.limit(8 * cpus).repartition(cpus).mapInPandas(mapper, FETCH_SCHEMA).count()
    c0 = _cpu_by_class()
    t0 = time.time()
    fetched = (
        cand.repartition(3 * cpus, F.col("rank"))  # engine's rank-hash layout
        .mapInPandas(mapper, FETCH_SCHEMA)
        .filter("status = 'ok'")
        .count()
    )
    wall = time.time() - t0
    c1 = _cpu_by_class()
    spark.stop()
    jvm = c1["java"] - c0["java"]
    pyw = c1["python"] - c0["python"]
    return {
        "cpus": cpus,
        "fetched": fetched,
        "wall_s": round(wall, 2),
        "urls_per_s": round(fetched / wall, 1),
        "worker_cpu_s": round(pyw, 1),
        "jvm_cpu_s": round(jvm, 1),
        "worker_ms_per_url": round(1000 * pyw / max(fetched, 1), 2),
        "jvm_ms_per_url": round(1000 * jvm / max(fetched, 1), 2),
        "delivered_parallelism": round((pyw + jvm) / wall, 2),
    }


if __name__ == "__main__":
    runs: dict[str, list] = {"8": [], "32": []}
    for rep in range(2):
        for cpus in (8, 32):
            r = probe(cpus)
            runs[str(cpus)].append(r)
            print(json.dumps(r), file=sys.stderr)
    best8 = max(runs["8"], key=lambda r: r["urls_per_s"])
    best32 = max(runs["32"], key=lambda r: r["urls_per_s"])
    print(json.dumps({
        "probe": "fetch_stage_isolated",
        "best8": best8,
        "best32": best32,
        "stage_efficiency": round(best32["urls_per_s"] / best8["urls_per_s"] / 4, 3),
        "worker_cpu_inflation_32_vs_8": round(
            best32["worker_ms_per_url"] / best8["worker_ms_per_url"], 3
        ),
        "jvm_cpu_inflation_32_vs_8": round(
            best32["jvm_ms_per_url"] / max(best8["jvm_ms_per_url"], 1e-9), 3
        ),
        "all_runs": runs,
    }))
