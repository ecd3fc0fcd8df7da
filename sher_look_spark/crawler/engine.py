"""The wave-based crawl engine — SURVEY §2.1 C1-C14 as DataFrame jobs.

One BFS generation ("wave") = one Spark job over the pending frontier:

  pending(depth d, FIFO rank)                                        [C1/C2]
    -> canonicalize (Arrow UDF)            normalize ×2 + null-reject [C3]
    -> within-wave first-rank-wins + anti-join vs `seen`              [C4]
    -> robots join (per-host rules fetched once, cached in `robots`)  [C5/C6]
    -> per-host politeness budget (optional, window)                  [C7]
    -> batched synthetic fetch (mapInPandas, Arrow)                   [C8]
    -> content-hash dedup (anti-join `seen_hashes` + wave window)     [C9]
    -> max-pages budget cut at the FIFO stop rank                     [C2]
    -> link explode -> canonicalize -> (url,depth) pair dedup         [C10]
    -> per-parent top-K by (len(url), doc order) into `links`         [C11]
    -> atomic snapshot commit of images/links/seen/frontier           [C12/C13]

Crawl order is BY CONSTRUCTION the reference's single-threaded FIFO order:
`discovery_rank` is a dense total order (seeds in file order; children in
(parent_rank, document_position) order), so sorting by (wave, rank) equals
the reference's poll order — verified against the pure-Python simulator.

Scale notes (10^10-URL frontier, 1000 executors):
* the only big shuffles per wave are the `seen` anti-join and the child
  dedup — both hash-partitioned on url_hash/url; AQE skew-join splits hot
  hosts, and `fetch` is salted round-robin so one hot host cannot pin a task;
* child rank assignment uses sort + zipWithIndex (distributed two-pass),
  NOT a single-partition window;
* `seen` stays partitioned on disk by pmod(url_hash, N) so the anti-join
  can co-locate (bucketed-table MERGE under Iceberg on a real cluster).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sher_look_spark.crawler import synth
from sher_look_spark.crawler.simulator import child_limit
from sher_look_spark.crawler.storage import SnapshotStore
from sher_look_spark.functions.hashing import (
    sha256_b64url,
    sha256_b64url_col,  # HtmlSaver.java:21-30 names files sha256(url)
    url_hash64_col,
)
from sher_look_spark.functions.robots import parse_robots_txt, robots_allowed_udf
from sher_look_spark.functions.urls import canonicalize_href, normalize_url

PENDING_SCHEMA = "url string, depth int, rank long"

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("rank", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("html", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


@dataclass
class CrawlConfig:
    max_pages: int = 50_000          # application.properties:10
    max_depth: int = 3               # application.properties:12
    queue_cap: int = 50_000          # PersistentQueue.java:22
    per_host_wave_cap: int | None = None  # politeness budget; None = fidelity mode
    # Time-based politeness (reference: 1 s sleep per fetch per thread,
    # CrawlTask.java:182). A wave models a `wave_budget_s`-second quantum;
    # each host serves at most floor(wave_budget_s / crawl_delay_s) fetches
    # per wave at scheduled_slot = host_slot * crawl_delay_s (SURVEY C7).
    # Overflow candidates are DEFERRED to the next wave, never dropped.
    crawl_delay_s: float | None = None
    wave_budget_s: float = 60.0
    fetch_partitions: int | None = None   # explicit override for the fetch stage
    # Fetch tasks are sized by DATA VOLUME (rows per task), not core count —
    # the same rule file-scan splits follow (maxPartitionBytes): a payload
    # fetch's cost is per-row, so fixed-size tasks keep the stage's tail
    # short at ANY cluster size, where a cores-multiple partitioning leaves
    # the biggest tasks ~3x the smallest (128-224 px payload spread) and the
    # stage idles on the tail. Isolated-stage probes measured 505->672
    # rows/s at 32 cores going from 3x-cores to 100-row tasks; full-crawl
    # runs are VM-noise-dominated between 100 and 1000, so 400 balances
    # tail smoothing against per-task and per-file overhead on the write
    # stages downstream of the persisted fetch.
    fetch_rows_per_task: int = 400
    store_html: bool = True               # keep page HTML (enables the index tier)
    # Salted-partition bloom front for the URL-seen check (functions/bloom.py).
    # With the bloom on, the `seen` table is scanned but NEVER shuffled: the
    # bloom answers "definitely new" for most candidates; the few "maybe seen"
    # do an exact broadcast semi-join. Exactness is unconditional (bloom is a
    # pre-filter; false positives go to the exact check).
    use_bloom: bool = True
    bloom_salts: int = 32            # one bitmap per salt; scale knob (4096 at 10^10)
    bloom_bits: int = 1 << 20        # INITIAL bits/salt (~2.8M urls total at ~1% fp);
    #                                  auto-resized (state-owned) as seen grows
    # The exact check for bloom "maybe seen" rows broadcasts the suspect set
    # only while the WAVE itself is broadcast-scale (suspects <= wave size);
    # above this, most children of a deep wave being already-seen would make
    # the broadcast multi-GB, so the engine falls back to the shuffle
    # anti-join (co-located on a bucketed seen table under Iceberg).
    suspect_broadcast_max: int = 4_000_000
    # Activation threshold: below this many seen URLs a plain anti-join beats
    # the bloom's fixed per-wave cost (bitmap load + merge + extra jobs), so
    # the filter engages only once `seen` outgrows broadcast scale. Crossing
    # the threshold triggers the automatic one-time full rebuild.
    bloom_min_seen: int = 2_000_000
    # Above this many wave candidates, per-host politeness slots switch from
    # a plain Window.partitionBy(host) row_number (one reducer task pins on a
    # hot host) to the distributed two-pass assignment (_host_slots_skewfree:
    # range-partition on (host, rank) so a hot host SPANS tasks, then
    # per-host cross-partition offsets from the tiny (partition, host) count
    # table). Identical slot numbers either way; the threshold only trades
    # the extra exchange against the single-reducer risk.
    politeness_window_max: int = 1_000_000
    # Child discovery ranks: up to this many wave CANDIDATES, the per-parent
    # offset table (<= one row per committed parent) is prefix-summed with a
    # single-partition window — the whole child-rank assignment then stays
    # LAZY (zero driver actions; it materializes inside the concurrent write
    # pool). Above it, the distributed two-pass machinery
    # (_parent_offset_ranks: range partition + per-range sums + one tiny
    # collect) takes over — a 10^8-parent offset table must not hit one task.
    rank_window_max: int = 1_000_000
    web: synth.SynthWebConfig = field(default_factory=synth.SynthWebConfig)


# applicationIds whose parquet WRITE path is already initialized. The first
# parquet write of a Spark session pays one-time costs the read path does
# not share (output committer + write-path codegen + codec init): measured
# 2.5 s on this box via cProfile — charged to whatever wave (or seed) runs
# first. Engine construction triggers it once so waves measure crawl work.
_WRITE_WARMED: set[str] = set()


def _warm_write_path(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app in _WRITE_WARMED:
        return
    _WRITE_WARMED.add(app)
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="sherlook-warmwrite-")
    try:
        spark.createDataFrame([("w", 0, 0)], PENDING_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "p"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _normalize_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def norm(urls: pd.Series) -> pd.Series:
        # CrawlTask.java:71-73 normalizes twice; ours is idempotent, once is exact.
        return urls.map(normalize_url)

    return norm


def _canonicalize_href_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def canon(base: pd.Series, href: pd.Series) -> pd.Series:
        return pd.Series([canonicalize_href(b, h) for b, h in zip(base, href)])

    return canon


def _make_fetch_mapper(web: synth.SynthWebConfig):
    """mapInPandas fetcher: one Arrow batch in, fetched+decoded rows out.

    Stands in for the Jsoup GET (CrawlTask.java:104-113); on a real crawl this
    is where HTTP + image decode happens, batched per partition.
    """

    CHUNK = int(os.environ.get("SPARK_GRAFT_FETCH_CHUNK", "512"))  # output pandas frame rows

    def mapper(batches):
        for big in batches:
            for start in range(0, len(big), CHUNK):
                pdf = big.iloc[start : start + CHUNK]
                out = {k: [] for k in FETCH_SCHEMA.fieldNames()}
                for url, depth, rank in zip(pdf["url"], pdf["depth"], pdf["rank"]):
                    r = synth.fetch(web, url)
                    out["url"].append(url)
                    out["depth"].append(int(depth))
                    out["rank"].append(int(rank))
                    out["status"].append(r.status)
                    out["title"].append(r.title)
                    out["description"].append(r.description)
                    out["content_hash"].append(sha256_b64url(r.html) if r.html is not None else None)
                    out["html"].append(r.html)
                    out["links"].append(r.links)
                    out["bytes"].append(r.image)
                    out["w"].append(r.w)
                    out["h"].append(r.h)
                    out["fmt"].append(r.fmt)
                    out["caption"].append(r.caption)
                    out["phash"].append(r.phash)
                # int columns with Nones must be nullable Int64 — the pandas
                # default (float64) silently destroys the low bits of phash
                for col in ("w", "h", "phash"):
                    out[col] = pd.array(out[col], dtype="Int64")
                yield pd.DataFrame(out)

    return mapper


def _dense_rank_sorted(df: DataFrame, sort_cols: list, out_col: str, offset: int) -> DataFrame:
    """Dense offset..offset+n-1 ranks in global sort order, JVM-only and
    scale-safe: range-repartition on the sort keys (partition i < partition
    i+1), per-partition row_number, plus collected per-partition offsets.
    No single-reducer window, no Python row serialization."""
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    sdf = (
        df.repartitionByRange(nparts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r._pid: r.n for r in sdf.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = offset
    offsets = {}
    for pid in sorted(counts):
        offsets[pid] = base
        base += counts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    out = (
        sdf.join(off_df, "_pid")
        .withColumn(out_col, F.row_number().over(w) - 1 + F.col("_off"))
        .drop("_pid", "_off")
    )
    return out, sdf, base - offset  # (ranked df, persist handle, total rows)


def _parent_offset_ranks(
    accepted: DataFrame, next_rank: int
) -> tuple[DataFrame, DataFrame, int]:
    """Dense child discovery ranks in (parent_rank, link_pos) order, built
    from per-parent offsets instead of a global range-repartition: the
    per-parent row_number co-partitions with the links top-K window (same
    parent_rank key — one exchange serves both), and the offset table is the
    per-parent COUNTS (tiny vs the children), prefix-summed with the same
    two-pass trick (per-range sums + driver-combined bases). Avoids the
    RangePartitioner's sampling pass over the full child set.

    Returns (ranked_children, persist_handle, total)."""
    from pyspark.sql import Window

    spark = accepted.sparkSession
    counts = accepted.groupBy("parent_rank").agg(F.count(F.lit(1)).alias("_n"))
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    sdf = (
        counts.repartitionByRange(nparts, "parent_rank")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    psums = {
        r._pid: r.s
        for r in sdf.groupBy("_pid").agg(F.sum("_n").alias("s")).collect()
    }
    base = next_rank
    bases = {}
    for pid in sorted(psums):
        bases[pid] = base
        base += psums[pid]
    base_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(b)) for p, b in bases.items()], "_pid int, _base long"
        )
    )
    w_cnt = Window.partitionBy("_pid").orderBy("parent_rank").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        sdf.join(base_df, "_pid")
        .withColumn("_off", F.col("_base") + F.coalesce(F.sum("_n").over(w_cnt), F.lit(0)))
        .select("parent_rank", "_off")
    )
    w_child = Window.partitionBy("parent_rank").orderBy("link_pos")
    ranked = accepted.join(offsets, "parent_rank").withColumn(
        "rank", F.col("_off") + F.row_number().over(w_child) - 1
    )
    return ranked, sdf, base - next_rank


def _running_prefix_min(df: DataFrame, sort_cols: list, val_col: str) -> tuple:
    """Global running min of `val_col` in `sort_cols` order, scale-safe (the
    same two-pass shape as _dense_rank_sorted): range-repartition on the sort
    keys, per-partition window running-min, then fold in the driver-combined
    minima of all earlier partitions (one tiny collect).

    Adds two columns: `_rmin` (inclusive running min) and `_rmin_prev`
    (exclusive: min over strictly-earlier rows; null for the global first row).
    Returns (df, persist_handle)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    sdf = (
        df.repartitionByRange(nparts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    pmins = {
        r._pid: r.m
        for r in sdf.groupBy("_pid").agg(F.min(val_col).alias("m")).collect()
    }
    before: dict[int, int | None] = {}
    run = None
    for pid in sorted(pmins):
        before[pid] = run
        run = pmins[pid] if run is None else min(run, pmins[pid])
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), before[p]) for p in before], "_pid int, _before long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    w_excl = w.rowsBetween(Window.unboundedPreceding, -1)
    out = (
        sdf.join(off_df, "_pid")
        # F.least skips nulls (returns the smallest non-null argument)
        .withColumn("_rmin", F.least(F.min(val_col).over(w), F.col("_before")))
        .withColumn("_rmin_prev", F.least(F.min(val_col).over(w_excl), F.col("_before")))
        .drop("_pid", "_before")
    )
    return out, sdf


class CrawlEngine:
    def __init__(self, spark: SparkSession, state_dir: str, cfg: CrawlConfig):
        self.spark = spark
        self.cfg = cfg
        self.store = SnapshotStore(state_dir)
        self._norm = _normalize_udf()
        self._canon = _canonicalize_href_udf()
        _warm_write_path(spark)
        self._wave_handles: list[DataFrame] = []

    # ------------------------------------------------------------------ setup
    def seed(self, seeds: list[str]) -> None:
        """C1: seed the frontier iff it is initially empty (Crawler.java:87-105)."""
        if self.store.latest() is not None:
            return
        rows = [(u, 0, i) for i, u in enumerate(seeds)]
        df = self.spark.createDataFrame(rows, PENDING_SCHEMA)
        rel = self.store.stage_write(df, "pending", 0)
        self.store.commit(
            replaces={"pending": [rel]},
            state={
                "wave": 0,
                "committed": 0,
                "next_rank": len(seeds),
                "pending_depths": {"0": len(seeds)},
            },
        )

    # ---------------------------------------------------- URL-seen + bloom (C4)
    def _load_bloom_df(self, state: dict) -> tuple[DataFrame | None, int]:
        """(seen_bloom DataFrame, effective bits-per-salt) from the latest
        snapshot. The DataFrame is None when the bloom is disabled / absent /
        built with a different salt count (a None forces the plain anti-join
        this wave and a full rebuild at commit, so resume from pre-bloom
        snapshots stays exact). The bitmaps are NEVER collected to the
        driver: per-salt probing and merging happen where the data lives.

        Bits-per-salt is owned by snapshot state (``bloom.bits``), not config:
        auto-resize grows it as the crawl's seen set outgrows the sized
        capacity, and the filter must keep probing at the size it was built
        with."""
        eff_bits = self.cfg.bloom_bits
        if not self.cfg.use_bloom:
            return None, eff_bits
        meta = state.get("bloom")
        if not meta or meta.get("salts") != self.cfg.bloom_salts:
            return None, eff_bits
        eff_bits = int(meta.get("bits", eff_bits))
        return self.store.read(self.spark, "seen_bloom"), eff_bits

    def _seen_filter(
        self, winners: DataFrame, seen: DataFrame | None,
        bloom_df: DataFrame | None, n_wave: int,
    ) -> DataFrame:
        """Drop already-seen URLs without ever shuffling the seen table.

        Bloom path: candidates cogroup with the `seen_bloom` table on
        ``salt = pmod(url_hash, n_salts)`` — each task loads ONLY its salt's
        bitmap (at 10^10 URLs the aggregate filter is ~TiB; a driver
        collect+broadcast of it cannot exist). "Definitely new" rows (no
        false negatives) skip the exact check entirely. The "maybe seen"
        rows (true dups + ~fp_rate) verify exactly:

        * when the wave is broadcast-scale (suspects <= wave <=
          ``suspect_broadcast_max``): seen ⋉ broadcast(suspects) then an
          anti-join against the (small) hit set — seen is only SCANNED;
        * otherwise (deep-crawl waves where most children are already seen):
          plain shuffle anti-join — on a real cluster the seen table is
          bucketed by url_hash (Iceberg), so this co-locates without
          re-shuffling seen; the broadcast path must not be used because
          suspects can approach wave size.

        Reference analog: the in-memory cheap-check before the DB lookup
        (CrawlTask.java:82-93)."""
        if seen is None:
            return winners
        if bloom_df is None:
            return winners.join(seen.select("url_hash"), "url_hash", "left_anti")
        n_salts = self.cfg.bloom_salts
        cands = winners.withColumn(
            "salt", F.pmod("url_hash", F.lit(n_salts)).cast("int")
        )
        out_schema = T.StructType(cands.schema.fields + [T.StructField("_maybe", T.BooleanType())])

        def probe(_key, cpdf, bpdf):
            import numpy as np

            from sher_look_spark.functions import bloom as B

            if len(bpdf) == 0:
                flags = np.zeros(len(cpdf), dtype=bool)  # no bitmap -> salt has no seen rows
            else:
                bm = np.frombuffer(bytes(bpdf["bitmap"].iloc[0]), dtype=np.uint8)
                flags = B.might_contain(
                    bm, cpdf["url_hash"].to_numpy("int64").astype("uint64")
                )
            return cpdf.assign(_maybe=flags)

        # persisted for the wave: both the fresh and the suspects branch read
        # `flagged`, and without the cache the cogroup shuffle (plus its
        # upstream canonicalize UDF and first-rank-wins window) would execute
        # once per branch per downstream action. Unpersisted in run_wave's
        # cleanup via _wave_handles.
        flagged = (
            cands.groupBy("salt")
            .cogroup(bloom_df.groupBy("salt"))
            .applyInPandas(probe, out_schema)
            .persist()
        )
        self._wave_handles.append(flagged)
        suspects = flagged.filter(F.col("_maybe"))
        fresh = flagged.filter(~F.col("_maybe"))
        if n_wave <= self.cfg.suspect_broadcast_max:
            hits = seen.select("url_hash").join(
                F.broadcast(suspects.select("url_hash")), "url_hash", "left_semi"
            )
            cleared = suspects.join(F.broadcast(hits), "url_hash", "left_anti")
        else:
            cleared = suspects.join(seen.select("url_hash"), "url_hash", "left_anti")
        return fresh.unionByName(cleared).drop("_maybe", "salt")

    def _host_slots_skewfree(self, winners: DataFrame) -> DataFrame:
        """Per-host politeness slot numbers WITHOUT a per-host single-reducer
        window: at 10^8-row waves `Window.partitionBy(host)` pins a hot
        host's entire candidate set on one task. Same two-pass shape as
        `_parent_offset_ranks`, fully distributed (no driver collect):

        1. range-repartition on (host, rank) — a hot host SPANS consecutive
           partitions, each bounded by partition size;
        2. local row_number per (partition, host);
        3. per-host cross-partition offsets from the (partition, host) count
           table — one row per (partition, host), so the offset window
           touches <= nparts rows per host, never the candidates themselves.

        Slot numbers are identical to the plain window's (host_slot = 1-based
        position within host in rank order)."""
        nparts = max(self.spark.sparkContext.defaultParallelism, 2)
        # Eager lineage cut first: the two-pass machinery references its
        # input TWICE (counts + final join), and the wave plan above it —
        # canonicalize, first-rank-wins, bloom cogroup — is deep; without
        # the cut the downstream plan TREE doubles here and Spark's plan
        # stringification alone can OOM the driver on a long politeness
        # crawl. One extra pass over winners, amortized by the >1M-row
        # waves that select this path.
        sdf = (
            winners.repartitionByRange(nparts, "host", "rank")
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
        counts = sdf.groupBy("_pid", "host").agg(F.count(F.lit(1)).alias("_n"))
        w_off = (
            Window.partitionBy("host")
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.withColumn(
            "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
        ).drop("_n")
        w_local = Window.partitionBy("_pid", "host").orderBy("rank")
        return (
            sdf.join(offsets, ["_pid", "host"])
            .withColumn(
                "host_slot",
                (F.col("_off") + F.row_number().over(w_local)).cast("int"),
            )
            .drop("_pid", "_off")
        )

    def _wave_bitmaps(self, hashes_df: DataFrame, n_bits: int) -> DataFrame:
        """(salt, bitmap) bitmaps for a batch of url hashes — built where the
        hashes live via grouped applyInPandas (numpy bit-sets over Arrow
        batches); never collected."""
        n_salts = self.cfg.bloom_salts

        def build(key, pdf):
            from sher_look_spark.functions import bloom as B

            bm = B.empty_bitmap(n_bits)
            B.add_hashes(bm, pdf["url_hash"].to_numpy("int64").astype("uint64"))
            return pd.DataFrame({"salt": [int(key[0])], "bitmap": [bm.tobytes()]})

        return (
            hashes_df.select(
                "url_hash", F.pmod("url_hash", F.lit(n_salts)).cast("int").alias("salt")
            )
            .groupBy("salt")
            .applyInPandas(build, "salt int, bitmap binary")
        )

    def _stage_bloom(
        self, bloom_df: DataFrame | None, seen: DataFrame | None,
        seen_add: DataFrame, wave: int, n_bits: int,
    ) -> str:
        """Merge the wave's seen additions into the salt bitmaps and stage the
        REPLACEMENT seen_bloom table (n_salts rows — the parquet stand-in for
        an Iceberg rewrite of a small metadata table). Fully distributed:
        wave bitmaps union the previous bitmaps and OR-merge per salt in a
        grouped applyInPandas — one task per salt, each touching only its own
        bitmap; the driver never holds bitmap bytes."""
        if bloom_df is None and seen is not None:
            # resume from a pre-bloom snapshot, or a capacity resize: one-time
            # full rebuild over the entire seen table at the (new) bit width
            base_df = seen.select("url_hash").unionByName(seen_add.select("url_hash"))
        else:
            base_df = seen_add.select("url_hash")
        merged = self._wave_bitmaps(base_df, n_bits)
        if bloom_df is not None:
            def or_merge(key, pdf):
                import numpy as np

                out = None
                for b in pdf["bitmap"]:
                    a = np.frombuffer(bytes(b), dtype=np.uint8)
                    out = a.copy() if out is None else np.bitwise_or(out, a)
                return pd.DataFrame({"salt": [int(key[0])], "bitmap": [out.tobytes()]})

            merged = (
                merged.unionByName(bloom_df)
                .groupBy("salt")
                .applyInPandas(or_merge, "salt int, bitmap binary")
            )
        return self.store.stage_write(merged, "seen_bloom", wave)

    # ------------------------------------------------------------- robots (C5)
    def _resolve_robots(self, cand: DataFrame) -> DataFrame:
        """Fetch+parse robots.txt once per new host; persist to `robots`.

        Returns (wave_rules, fetched): ``wave_rules`` is scoped to the wave's
        distinct hosts — the full accumulated robots table (every host ever
        seen; 10^7-10^8 rows at web scale) is scanned but never broadcast or
        shuffled; only the wave's slice travels.
        """
        robots = self.store.read(self.spark, "robots")
        hosts = cand.select("host").distinct()
        if robots is not None:
            new_hosts = hosts.join(robots.select("host"), "host", "left_anti")
        else:
            new_hosts = hosts
        web = self.cfg.web

        def fetch_robots(batches):
            for pdf in batches:
                rows = {"host": [], "has_rules": [], "allow": [], "disallow": []}
                for host in pdf["host"]:
                    page = synth.parse_page_url(web, f"http://{host}/page/0")
                    body = synth.robots_txt(web, page[0]) if page else None
                    rules = parse_robots_txt(body) if body is not None else None
                    rows["host"].append(host)
                    rows["has_rules"].append(rules is not None)
                    rows["allow"].append(rules[0] if rules else [])
                    rows["disallow"].append(rules[1] if rules else [])
                yield pd.DataFrame(rows)

        schema = "host string, has_rules boolean, allow array<string>, disallow array<string>"
        fetched = new_hosts.mapInPandas(fetch_robots, schema)
        combined = robots.unionByName(fetched) if robots is not None else fetched
        wave_rules = combined.join(hosts, "host", "left_semi")
        return wave_rules, fetched

    # --------------------------------------------------------------- one wave
    def run_wave(self) -> dict:
        t0 = time.time()
        _tprev = [t0]
        phase_secs: dict[str, float] = {}
        # wave-scoped persist handles created inside helpers (_seen_filter's
        # flagged cache); unpersisted in the cleanup block below
        self._wave_handles: list[DataFrame] = []

        def _mark(name: str) -> None:
            now = time.time()
            phase_secs[name] = round(now - _tprev[0], 2)
            _tprev[0] = now
        snap = self.store.latest()
        assert snap is not None, "seed() first"
        state = dict(snap.state)
        wave = state["wave"]
        committed_total = state["committed"]
        budget = self.cfg.max_pages - committed_total
        pending = self.store.read(self.spark, "pending")
        if pending is None or budget <= 0:
            return {"done": True, **state}
        pending = pending.persist()
        # depth histogram: carried in snapshot state (zero jobs); recomputed
        # only when resuming from a pre-histogram snapshot
        if "pending_depths" in state:
            depth_counts = {int(k): v for k, v in state["pending_depths"].items() if v > 0}
        else:
            depth_counts = {
                r.depth: r.n
                for r in pending.groupBy("depth").agg(F.count(F.lit(1)).alias("n")).collect()
            }
        n_pending_total = sum(depth_counts.values())
        if n_pending_total == 0:
            pending.unpersist()
            return {"done": True, **state}
        min_depth = min(depth_counts)
        n_wave = depth_counts[min_depth]
        wave_cand = pending.filter(F.col("depth") == min_depth)
        rest_pending = pending.filter(F.col("depth") != min_depth)

        # Budget pre-trim: when the remaining page budget is far below the
        # wave size, fetching the whole wave is wasted work — process only the
        # first margin*budget candidates (ranks are dense within a wave, so
        # the cutoff needs no counting) and leave the contiguous suffix
        # pending. If skips eat into the margin, the next wave continues at
        # the same depth in exact FIFO order — correctness is order-based,
        # not wave-boundary-based. The margin ADAPTS to the previous wave's
        # observed commit rate (deep waves skip most candidates as already
        # seen; a fixed 2x margin would re-enter the same depth repeatedly,
        # paying the per-wave serial constant each time).
        pre_trimmed = None
        rate = state.get("commit_rate")
        # `rate is None`, not falsy: a 0.0 rate (every candidate already seen)
        # is exactly the deep-wave case that needs the MAX margin, not the min.
        # With a KNOWN healthy commit rate the floor drops to 1.15: fetching
        # 2x the remaining budget on the final wave threw away up to one
        # budget's worth of payload fetches (~20% of total crawl CPU at
        # 100k/web-sized payloads) to insure against an under-commit whose
        # actual cost is one extra wave constant (~15-20 s) — the engine
        # already continues the SAME depth in exact FIFO order when a wave
        # under-commits, so a short window is a latency tradeoff, never a
        # correctness one.
        if rate is None:
            margin = 2.0
        else:
            margin = min(max(1.15, 1.3 / max(rate, 1e-6)), 16.0)
        window_size = int(margin * budget)
        # Politeness deferral re-inserts SCATTERED ranks at the same depth, so
        # the fast split below (which assumes the wave's ranks are dense from
        # min(rank)) would mis-count; such depths are flagged in state and use
        # an exact ordered split instead (TakeOrderedAndProject, no full sort).
        scattered = set(state.get("scattered_depths", []))
        if n_wave > window_size + 1:
            if min_depth in scattered:
                head = (
                    wave_cand.orderBy("rank").limit(window_size)
                    .agg(F.max("rank").alias("mx"), F.count(F.lit(1)).alias("cnt"))
                    .collect()[0]
                )
                cutoff = head.mx + 1
                n_kept = head.cnt
            else:
                wave_min_rank = wave_cand.agg(F.min("rank")).collect()[0][0]
                cutoff = wave_min_rank + window_size
                n_kept = window_size
            pre_trimmed = wave_cand.filter(F.col("rank") >= cutoff)
            wave_cand = wave_cand.filter(F.col("rank") < cutoff)
            n_trimmed = n_wave - n_kept
            n_wave = n_kept

        # --- C3: canonicalize; invalid URLs are polled but never visited.
        # Persisted: feeds both the fetch chain and the seen-set append.
        cand = (
            wave_cand.withColumn("norm", self._norm("url"))
            .filter(F.col("norm").isNotNull())
            .withColumn("url_hash", url_hash64_col("norm"))
            .withColumn("host", F.parse_url("norm", F.lit("HOST")))
            .withColumn("path", F.coalesce(F.parse_url("norm", F.lit("PATH")), F.lit("")))
        ).persist()

        # --- C4: within-wave first-rank-wins + URL-seen check (bloom-fronted)
        w_url = Window.partitionBy("url_hash").orderBy("rank")
        winners = cand.withColumn("rn", F.row_number().over(w_url)).filter(F.col("rn") == 1).drop("rn")
        seen = self.store.read(self.spark, "seen")
        bloom_on = (
            self.cfg.use_bloom
            and state.get("seen_rows_ub", 0) >= self.cfg.bloom_min_seen
        )
        bloom_df, bloom_bits = (
            self._load_bloom_df(state) if bloom_on else (None, self.cfg.bloom_bits)
        )
        winners = self._seen_filter(winners, seen, bloom_df, n_wave)

        # --- C7: optional per-host politeness budget (deferred, not dropped).
        # A direct cap (per_host_wave_cap) or a crawl-delay time budget — the
        # time budget converts to slots/wave and stamps each fetch's
        # scheduled_slot offset within the wave quantum.
        deferred = None
        slots = None
        host_cap = self.cfg.per_host_wave_cap
        if host_cap is None and self.cfg.crawl_delay_s is not None:
            host_cap = max(1, int(self.cfg.wave_budget_s / self.cfg.crawl_delay_s))
        if host_cap is not None:
            if n_wave > self.cfg.politeness_window_max:
                winners = self._host_slots_skewfree(winners)
            else:
                w_host = Window.partitionBy("host").orderBy("rank")
                winners = winners.withColumn(
                    "host_slot", F.row_number().over(w_host)
                )
            deferred = winners.filter(F.col("host_slot") > host_cap)
            winners = winners.filter(F.col("host_slot") <= host_cap)
            if self.cfg.crawl_delay_s is not None:
                slots = winners.select(
                    "rank",
                    ((F.col("host_slot") - 1) * float(self.cfg.crawl_delay_s)).alias(
                        "scheduled_slot"
                    ),
                )
            winners = winners.drop("host_slot")

        # --- C5/C6: robots rules join + allow filter. Only the WAVE's hosts'
        # rules are broadcast — broadcasting the whole accumulated robots
        # table would ship every host ever crawled to every task, every wave.
        robots, robots_new = self._resolve_robots(winners)
        robots_cached = robots.persist()
        joined = winners.join(F.broadcast(robots_cached), "host", "left")
        joined = joined.withColumn(
            "allowed",
            F.when(F.col("has_rules").isNull() | ~F.col("has_rules"), F.lit(True)).otherwise(
                robots_allowed_udf("path", "allow", "disallow")
            ),
        )
        allowed = joined.filter(F.col("allowed")).select("norm", "depth", "rank")

        # --- C8: batched fetch, rank-hash partitioned so hot hosts spread
        # out. Hash the RAW rank (high cardinality -> uniform over all
        # partitions): hashing pmod(rank, nparts) — n salt VALUES into n
        # hash buckets — leaves ~1/e of the fetch partitions EMPTY by
        # birthday collision (measured: 4-5 busy of 8 at local[8]), i.e.
        # the fetch stage ran on ~2/3 of the cluster. Task count follows
        # DATA size (fetch_rows_per_task), floored at the cluster width.
        nparts = self.cfg.fetch_partitions or max(
            self.spark.sparkContext.defaultParallelism,
            -(-n_wave // self.cfg.fetch_rows_per_task),
        )
        fetch_in = allowed.withColumnRenamed("norm", "url").repartition(
            nparts, F.col("rank")
        )
        fetched = fetch_in.mapInPandas(_make_fetch_mapper(self.cfg.web), FETCH_SCHEMA).persist()

        # --- C9: content dedup (cross-wave anti-join + within-wave window).
        # Decisions run on a SLIM projection so payload bytes NEVER shuffle —
        # the winning ranks come back to the cached `fetched` partitions via a
        # broadcast semi-join (rank is unique within a wave).
        slim = fetched.select("rank", "content_hash", "status", F.size("links").alias("n_links"))
        ok = slim.filter(F.col("status") == "ok")
        seen_hashes = self.store.read(self.spark, "seen_hashes")
        if seen_hashes is not None:
            ok = ok.join(seen_hashes, "content_hash", "left_anti")
        w_hash = Window.partitionBy("content_hash").orderBy("rank")
        survivors = ok.withColumn("hrn", F.row_number().over(w_hash)).filter(F.col("hrn") == 1).drop("hrn")

        # --- C2: max-pages budget — cut at the FIFO stop rank. The count is
        # skipped entirely when the budget cannot bind (survivors <= wave size).
        stop_rank = None
        if n_wave > budget:
            n_survivors = survivors.count()
            if n_survivors > budget:
                stop_rank = (
                    survivors.orderBy("rank").limit(budget).agg(F.max("rank")).collect()[0][0]
                )
                survivors = survivors.filter(F.col("rank") <= stop_rank)
        committed_slim = survivors.persist()
        _mark("plan")
        # Deferred wave stats: when neither the page budget (n_wave <= budget)
        # nor the queue cap (raw links bounded by n_wave * max_links) can
        # possibly bind, the stats aggregation gates NO decision this wave —
        # so it runs concurrently with the table writes below instead of
        # standing as its own serial pipeline barrier. Cuts the per-wave
        # serial constant from 3 driver barriers to 2 (the child-rank offsets
        # and the write pool), which is what the N->4N scaling protocol
        # amortizes (Amdahl on the per-wave constant).
        _cstats_agg = lambda: committed_slim.agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_links"), F.lit(0)).alias("raw_links"),
        ).collect()[0]
        stats_deferred = (
            n_wave <= budget
            and n_pending_total + n_wave * self.cfg.web.max_links <= self.cfg.queue_cap
        )
        if stats_deferred:
            n_committed = n_raw_links = None
        else:
            cstats = _cstats_agg()
            n_committed, n_raw_links = cstats.n, cstats.raw_links
        # NOT persisted: its three consumers (children explode, images write,
        # pages write) each re-derive it as a broadcast semi-join over the
        # `fetched` cache — a second materialized copy of the payload bytes
        # would double the wave's cache churn (and the first consumer's
        # cache-write convoy) for three cheap cache scans.
        committed = fetched.join(
            F.broadcast(committed_slim.select("rank")), "rank", "left_semi"
        )
        _mark("fetch_pipeline")

        # --- C10/C11: children of committed parents
        next_rank = state["next_rank"]
        accepted = None
        links_df = None
        if min_depth < self.cfg.max_depth and (n_committed is None or n_committed > 0):
            exploded = committed.select(
                F.col("url").alias("parent_url"),
                F.col("depth").alias("parent_depth"),
                F.col("rank").alias("parent_rank"),
                F.posexplode("links").alias("link_pos", "href"),
            )
            children_all = (
                exploded.withColumn("child", self._canon("parent_url", "href"))
                .filter(F.col("child").isNotNull())
            )
            # dedup vs URLs still pending at other depths (uncrawledSet
            # semantics): an offer colliding with a QUEUED pair is a no-op
            # regardless of the cap state, so this anti-join commutes with
            # cap admission
            others = rest_pending
            if deferred is not None:
                others = others.unionByName(
                    deferred.select(F.col("norm").alias("url"), "depth", "rank")
                )
            if others is not None:
                # offer() dedups on (url, depth) PAIRS (PersistentQueue.java:17,97)
                # — only pending entries at the children's depth collide
                pend_pairs = others.filter(F.col("depth") == min_depth + 1).select(
                    F.col("url").alias("child")
                )
                children_all = children_all.join(pend_pairs, "child", "left_anti")

            # queue cap (PersistentQueue.java:22,97): accept-all fast path when
            # the cap cannot bind (raw link count bounds accepted children;
            # n_raw_links is None only when the max_links bound already
            # proved the cap unreachable); exact DISTRIBUTED admission
            # replay otherwise.
            if n_raw_links is not None and n_pending_total + n_raw_links > self.cfg.queue_cap:
                polled_wave = wave_cand
                if deferred is not None:
                    polled_wave = polled_wave.join(
                        deferred.select("rank"), "rank", "left_anti"
                    )
                accepted = self._apply_queue_cap_exact(
                    polled_wave, n_pending_total, children_all
                )
            else:
                # offer() pair-dedup: first (parent_rank, link_pos) wins
                w_child = Window.partitionBy("child").orderBy("parent_rank", "link_pos")
                accepted = (
                    children_all.withColumn("crn", F.row_number().over(w_child))
                    .filter(F.col("crn") == 1)
                    .drop("crn")
                )
            if n_wave > self.cfg.rank_window_max:
                # big-wave path only: _parent_offset_ranks below references
                # `accepted` directly (counts + ranked join). On the lazy
                # small-wave path the SINGLE consumer is `windowed` (cached
                # itself), so a second cache of the same children would only
                # double the wave's memory churn.
                accepted = accepted.persist()

            # links top-K, child discovery ranks and the per-parent counts
            # all key on parent_rank — ONE hash exchange of the children
            # serves every one of them (guide §2.4: operations keyed the same
            # way share an exchange). Both row_numbers ride the same
            # partitioning (two sorts, one shuffle).
            limit_expr = F.coalesce(
                *[
                    F.when(F.col("parent_depth") == d, F.lit(k))
                    for d, k in ((0, 300), (1, 150), (2, 75), (3, 50))
                ],
                F.lit(25),
            )
            w_parent = Window.partitionBy("parent_rank").orderBy(
                F.length("child"), "link_pos"
            )
            w_crank = Window.partitionBy("parent_rank").orderBy("link_pos")
            windowed = (
                accepted.withColumn("k", limit_expr)
                .withColumn("lrn", F.row_number().over(w_parent))
                .withColumn("_crk", F.row_number().over(w_crank))
            )
            if n_wave <= self.cfg.rank_window_max:
                # lazy small-wave path: three consumers (links write, pending
                # write, the accepted count) hit `windowed` CONCURRENTLY in
                # the write pool below — without the cache each would
                # recompute the exchange + both sorts (and on an
                # AQE-coalesced tiny wave, serially on 1 task)
                windowed = windowed.persist()
                self._wave_handles.append(windowed)
            # links write happens in the concurrent write pool below — only
            # the DataFrame is built here
            links_df = (
                windowed.filter(F.col("lrn") <= F.col("k"))
                .select(
                    F.col("parent_url"),
                    F.col("child").alias("child_url"),
                    (F.col("lrn") - 1).alias("link_rank"),
                    F.lit(wave).alias("wave"),
                )
            )
            _mark("children_links")

            if n_wave <= self.cfg.rank_window_max:
                # Lazy child ranks: the per-parent offset table (<= one row
                # per committed parent) prefix-sums in a single-partition
                # window, so NO driver action runs here — the sampling job +
                # two collects of the two-pass path disappear from the wave's
                # serial critical path and the whole child-rank plan
                # materializes inside the concurrent write pool below.
                # n_accepted is resolved there too (accepted.count from
                # cache).
                counts = windowed.groupBy("parent_rank").agg(
                    F.count(F.lit(1)).alias("_n")
                )
                w_off = Window.orderBy("parent_rank").rowsBetween(
                    Window.unboundedPreceding, -1
                )
                offsets = counts.withColumn(
                    "_off",
                    F.lit(next_rank) + F.coalesce(F.sum("_n").over(w_off), F.lit(0)),
                ).select("parent_rank", "_off")
                new_pending = (
                    windowed.join(offsets, "parent_rank")
                    .select(
                        F.col("child").alias("url"),
                        (F.col("parent_depth") + 1).alias("depth"),
                        (F.col("_off") + F.col("_crk") - 1).alias("rank"),
                    )
                )
                _rank_tmp = None
                n_accepted = None  # resolved in the write pool
            else:
                ranked_children, _rank_tmp, n_accepted = _parent_offset_ranks(
                    accepted.select(
                        F.col("child").alias("url"),
                        (F.col("parent_depth") + 1).alias("depth"),
                        F.col("parent_rank"),
                        F.col("link_pos"),
                    ),
                    next_rank,
                )
                new_pending = ranked_children.select("url", "depth", "rank")
            _mark("child_rank")
        else:
            new_pending = self.spark.createDataFrame([], PENDING_SCHEMA)
            _rank_tmp = None
            n_accepted = 0

        # --- visited set additions: everything polled before the stop.
        # Politeness-DEFERRED candidates were never polled (they stay queued),
        # so they must NOT enter the seen set — otherwise the next wave's
        # seen filter would drop them unfetched.
        polled = cand if stop_rank is None else cand.filter(F.col("rank") <= stop_rank)
        if deferred is not None:
            polled = polled.join(deferred.select("rank"), "rank", "left_anti")
        seen_add = polled.select("url_hash", F.col("norm").alias("url")).distinct()
        if seen is not None:
            seen_add = seen_add.join(seen.select("url_hash"), "url_hash", "left_anti")
        if bloom_on:
            # consumed by both the seen write and the bloom build
            seen_add = seen_add.persist()

        # --- leftover pending (unpolled due to budget stop) + politeness
        # deferrals; depth histogram maintained incrementally so the next wave
        # needs no counting job (slow-path counts only on the rare stop/defer)
        next_depths: dict[int, int] = {d: n for d, n in depth_counts.items() if d != min_depth}
        # n_accepted is None on the lazy child-rank path — its histogram and
        # next_rank contributions are applied after the write pool resolves it
        if n_accepted:
            next_depths[min_depth + 1] = next_depths.get(min_depth + 1, 0) + n_accepted
        leftovers = []
        if pre_trimmed is not None:
            leftovers.append(pre_trimmed)
            next_depths[min_depth] = next_depths.get(min_depth, 0) + n_trimmed
        if stop_rank is not None:
            leftover_df = wave_cand.filter(F.col("rank") > stop_rank)
            if deferred is not None:
                # a politeness-deferred row past the stop rank is ALSO in
                # deferred_df below — without this anti-join it would enter
                # pending twice and double-count the depth histogram
                leftover_df = leftover_df.join(
                    deferred.select("rank"), "rank", "left_anti"
                )
            leftovers.append(leftover_df)
            next_depths[min_depth] = next_depths.get(min_depth, 0) + leftover_df.count()
        if deferred is not None:
            deferred_df = deferred.select(F.col("norm").alias("url"), "depth", "rank")
            leftovers.append(deferred_df)
            next_depths[min_depth] = next_depths.get(min_depth, 0) + deferred_df.count()
        if rest_pending is not None:
            leftovers.append(rest_pending)
        pending_next = new_pending
        for extra in leftovers:
            pending_next = pending_next.unionByName(extra)

        # --- C12/C13: stage everything, then one atomic snapshot commit.
        # documents-metadata parity (reference schema.sql:4-15): crawl_time
        # stamps the wave; index_time starts NULL and is set by the index
        # tier; scheduled_slot records the politeness offset when time-budget
        # politeness is on.
        images_df = committed.select(
            sha256_b64url_col("url").alias("image_id"),
            "url", "depth", "rank", "title", "description", "content_hash",
            "bytes", "w", "h", "fmt", "caption", "phash",
            F.lit(wave).alias("wave"),
            F.current_timestamp().alias("crawl_time"),
        )
        if slots is not None:
            images_df = images_df.join(F.broadcast(slots), "rank", "left")
        else:
            images_df = images_df.withColumn(
                "scheduled_slot", F.lit(None).cast("double")
            )
        # All staged writes are independent — submit them concurrently (Spark
        # schedules concurrent jobs fine); the snapshot commit below is the
        # only serialization point. Cuts the per-wave serial constant by the
        # sum of the smaller writes' wall times.
        from concurrent.futures import ThreadPoolExecutor

        # cluster by salt BEFORE the hive-partitioned write: otherwise every
        # shuffle partition emits a file into every salt dir (tasks x salts
        # small files per wave — file-count grows with core count and the
        # seen scan collapses under listing overhead)
        seen_salted = seen_add.withColumn(
            "salt", F.pmod("url_hash", F.lit(self.cfg.bloom_salts)).cast("int")
        ).repartition(F.col("salt"))
        write_jobs: dict[str, tuple] = {
            "images": (images_df, "images", wave, None),
            # seen is hive-partitioned by salt — the parquet stand-in for
            # Iceberg bucketing, so scans prune to touched salt partitions
            "seen": (seen_salted, "seen", wave, ["salt"]),
            "seen_hashes": (committed_slim.select("content_hash"), "seen_hashes", wave, None),
            "pending": (pending_next, "pending", wave + 1, None),
            "robots": (robots_new, "robots", wave, None),
        }
        if self.cfg.store_html:
            write_jobs["pages"] = (
                committed.select("url", "depth", "rank", "html", F.lit(wave).alias("wave")),
                "pages",
                wave,
                None,
            )
        if links_df is not None:
            write_jobs["links"] = (links_df, "links", wave, None)
        # Bloom capacity auto-resize: once the seen upper bound outgrows the
        # sized capacity (~12 bits/key for ~1% fp) the fp rate decays and
        # every extra fp pays an exact check — grow the per-salt bit width
        # (2x headroom) and rebuild from the full seen table this commit.
        seen_ub_new = state.get("seen_rows_ub", 0) + int(n_wave)
        if bloom_on:
            if seen_ub_new > (self.cfg.bloom_salts * bloom_bits) // 12:
                while (self.cfg.bloom_salts * bloom_bits) // 12 < 2 * seen_ub_new:
                    bloom_bits *= 2
                bloom_df = None  # forces the full rebuild path in _stage_bloom
        with ThreadPoolExecutor(max_workers=len(write_jobs) + 3) as pool:
            futures = {
                name: pool.submit(self.store.stage_write, df, table, w, pb)
                for name, (df, table, w, pb) in write_jobs.items()
            }
            bloom_fut = (
                pool.submit(self._stage_bloom, bloom_df, seen, seen_add, wave, bloom_bits)
                if bloom_on
                else None
            )
            stats_fut = pool.submit(_cstats_agg) if stats_deferred else None
            # lazy child-rank path: the accepted-children count rides the
            # pool too (reads the `windowed` cache the links/pending write
            # jobs materialize) instead of standing as its own serial job
            acc_fut = pool.submit(windowed.count) if n_accepted is None else None
            rels = {name: fut.result() for name, fut in futures.items()}
            bloom_rel = bloom_fut.result() if bloom_fut is not None else None
            if stats_fut is not None:
                cstats = stats_fut.result()
                n_committed = cstats.n
            if acc_fut is not None:
                n_accepted = acc_fut.result()
                if n_accepted:
                    next_depths[min_depth + 1] = (
                        next_depths.get(min_depth + 1, 0) + n_accepted
                    )
        next_rank += n_accepted
        _mark("table_writes")
        appends: dict[str, list[str]] = {
            "images": [rels["images"]],
            "seen": [rels["seen"]],
            "seen_hashes": [rels["seen_hashes"]],
            "robots": [rels["robots"]],
        }
        if self.cfg.store_html:
            appends["pages"] = [rels["pages"]]
        if links_df is not None:
            appends["links"] = [rels["links"]]
        # per-wave lineage + metrics live in the snapshot manifest itself (one
        # snapshot per wave = the full history) — a table write per wave would
        # only add a serial job to every wave
        metrics_row = {
            "wave": wave,
            "depth": int(min_depth),
            "candidates": int(n_pending_total),
            "wave_committed": int(n_committed),
            "children_accepted": int(n_accepted),
            "secs": float(time.time() - t0),
            "phases": str(phase_secs),
        }

        replaces = {"pending": [rels["pending"]]}
        if bloom_rel is not None:
            replaces["seen_bloom"] = [bloom_rel]
        # depths whose pending ranks are no longer dense (deferral scatters);
        # cleared automatically once the depth drains
        live_depths = {d for d, v in next_depths.items() if v > 0}
        scattered_next = scattered | ({min_depth} if deferred is not None else set())
        new_state = {
            "wave": wave + 1,
            "committed": committed_total + n_committed,
            "next_rank": int(next_rank),
            "stopped_by_budget": stop_rank is not None,
            "pending_depths": {str(d): int(n) for d, n in next_depths.items() if n > 0},
            # upper bound on |seen| (distinct polled <= polled): drives the
            # bloom activation threshold without a counting job
            "seen_rows_ub": seen_ub_new,
            # observed commit rate of this wave -> next wave's pre-trim margin
            "commit_rate": (float(n_committed) / n_wave) if n_wave else None,
            "scattered_depths": sorted(scattered_next & live_depths),
        }
        if bloom_rel is not None:
            new_state["bloom"] = {"salts": self.cfg.bloom_salts, "bits": int(bloom_bits)}
        new_state["metrics"] = metrics_row
        self.store.commit(appends=appends, replaces=replaces, state=new_state)
        if bloom_on:
            seen_add.unpersist()
        pending.unpersist()
        cand.unpersist()
        fetched.unpersist()
        committed_slim.unpersist()
        robots_cached.unpersist()
        if accepted is not None:
            accepted.unpersist()
        if _rank_tmp is not None:
            _rank_tmp.unpersist()
        for h in self._wave_handles:
            h.unpersist()
        self._wave_handles = []
        return {"done": False, **metrics_row, **new_state}

    def _apply_queue_cap_exact(
        self, polled_wave: DataFrame, n_pending_total: int, children_all: DataFrame
    ) -> DataFrame:
        """Distributed replay of offer()'s queue-size cap (PersistentQueue.java:22,97).

        Sequential semantics being replayed: polls (in rank order) free one
        slot each BEFORE their parent's offers; an offer colliding with a
        queued pair is a no-op (handled upstream); otherwise it is accepted
        iff queue_size < cap at offer time.

        Closed-form greedy admission: order the live offers by
        (parent_rank, link_pos) with dense 1-based index i and per-offer
        budget b_i = cap - n0 + polls(i) (non-decreasing, because polls is).
        The accepted count after offer i is
            A_i = min(i, i + min_{j<=i}(max(b_j, 0) - j)),
        and offer i is accepted iff A_i > A_{i-1}. Both the dense index and
        the prefix min run on the two-pass range-partition machinery — no
        single-reducer window and no driver materialization of children (the
        previous implementation pulled every child row through toPandas,
        which OOMs the driver on a cap-binding wave at web scale).

        Re-offer fixpoint: the reference queue pair-dedups only QUEUED
        entries, so a child whose occurrence was rejected at a full queue is
        offered again at its next occurrence once polls free slots. Rejected
        occurrences are burned and admission re-runs; removing rejected
        offers never changes other decisions (they consume no slot), so each
        round only adds later occurrences of burned children, and the loop
        stops when no rejected child has a further occurrence. Equality with
        a pure sequential replay is pinned by tests/test_queue_cap.py.
        """
        cap = self.cfg.queue_cap
        polls_df, _polls_handle, _ = _dense_rank_sorted(
            polled_wave.select("rank"), ["rank"], "_polls", 1
        )
        occ = children_all.join(
            polls_df.withColumnRenamed("rank", "parent_rank"), "parent_rank"
        ).persist()
        w_child = Window.partitionBy("child").orderBy("parent_rank", "link_pos")
        burned: DataFrame | None = None
        accepted: DataFrame | None = None
        spent_handles: list[DataFrame] = []
        for _round in range(64):
            live = occ
            if burned is not None:
                live = live.join(burned, ["parent_rank", "link_pos"], "left_anti")
            cand = (
                live.withColumn("_crn", F.row_number().over(w_child))
                .filter(F.col("_crn") == 1)
                .drop("_crn")
            )
            ranked, h1, _n = _dense_rank_sorted(cand, ["parent_rank", "link_pos"], "_i", 1)
            g = ranked.withColumn(
                "_g",
                F.greatest(F.lit(cap - n_pending_total) + F.col("_polls"), F.lit(0))
                - F.col("_i"),
            )
            scanned, h2 = _running_prefix_min(g, ["parent_rank", "link_pos"], "_g")
            a_cur = F.least(F.col("_i"), F.col("_i") + F.col("_rmin"))
            a_prev = F.when(F.col("_rmin_prev").isNull(), F.lit(0)).otherwise(
                F.least(F.col("_i") - 1, F.col("_i") - 1 + F.col("_rmin_prev"))
            )
            flagged = scanned.withColumn("_acc", a_cur > a_prev).persist()
            rejected = flagged.filter(~F.col("_acc"))
            accepted = flagged.filter(F.col("_acc")).drop(
                "_i", "_g", "_rmin", "_rmin_prev", "_acc", "_polls"
            )
            burned_new = rejected.select("parent_rank", "link_pos")
            burned = (
                burned_new if burned is None else burned.unionByName(burned_new)
            )
            # materialize + cut lineage: otherwise round r re-evaluates every
            # prior round's plan through the unioned anti-join chain
            burned = burned.localCheckpoint(eager=True)
            # continue only if some rejected child re-offers at a later occurrence
            live_next = occ.join(burned, ["parent_rank", "link_pos"], "left_anti")
            n_reoffer = live_next.join(
                rejected.select("child"), "child", "left_semi"
            ).count()
            for h in spent_handles:
                h.unpersist()
            spent_handles = [h1, h2, flagged]
            if n_reoffer == 0:
                break
        else:
            raise RuntimeError("queue-cap admission did not converge in 64 rounds")
        # accepted is bounded by the cap itself — materialize it, then release
        # every intermediate cache
        accepted = accepted.localCheckpoint(eager=True)
        for h in spent_handles + [occ, _polls_handle]:
            h.unpersist()
        return accepted

    # ---------------------------------------------------------------- driving
    def run(self, seeds: list[str] | None = None, max_waves: int = 100) -> dict:
        """Run (or resume) the crawl to completion. C13: resume = read the
        latest snapshot; pending rows re-form the next wave."""
        if seeds is not None:
            self.seed(seeds)
        last: dict = {}
        for _ in range(max_waves):
            last = self.run_wave()
            if last.get("done") or last.get("stopped_by_budget"):
                break
        return last
