"""Sources, streaming, and physical-plan hygiene tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_read_seeds_preserves_file_order(spark, tmp_path):
    from sher_look_spark.sources import read_seeds

    p = tmp_path / "seeds.txt"
    p.write_text("http://b.test/x 0\nhttp://a.test/y 1\nhttp://c.test/z\n")
    rows = read_seeds(spark, str(p)).orderBy("rank").collect()
    assert [(r.url, r.depth, r.rank) for r in rows] == [
        ("http://b.test/x", 0, 0),
        ("http://a.test/y", 1, 1),
        ("http://c.test/z", 0, 2),
    ]


def test_streaming_windowed_counts(spark, tmp_path):
    import shutil

    from sher_look_spark.sources import stream_events
    from sher_look_spark.streaming import run_stream_to_memory, windowed_event_counts

    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", src + "/events.parquet")
    agg = windowed_event_counts(stream_events(spark, src), window="1 day", watermark="2 days")
    q = run_stream_to_memory(agg.select("win_start", "event_type", "n_events"), "evt_counts")
    try:
        got = spark.sql("SELECT sum(n_events) AS n FROM evt_counts").collect()[0].n
        want = spark.read.parquet(f"{SF}/events.parquet").count()
        assert got == want  # every event lands in exactly one window
    finally:
        q.stop()


def test_plan_hygiene_pushdown_and_arrow(spark):
    from sher_look_spark.plans import has_pushed_filters, plan_summary, uses_row_python
    from sher_look_spark.queries import q_c3_url_normalize, q_rel_region_revenue

    filtered = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_quantity") > 30
    ).select("l_orderkey")
    assert has_pushed_filters(filtered), "filter must reach the parquet scan"

    norm = q_c3_url_normalize(spark, SF)
    s = plan_summary(norm)
    assert s["row_python"] == 0, "row-at-a-time Python UDFs are forbidden"
    assert s["arrow_python"] >= 1
    assert not uses_row_python(norm)

    rev = q_rel_region_revenue(spark, SF)
    s = plan_summary(rev)
    assert s["broadcast_joins"] >= 2, "region/nation joins must broadcast"


def test_crawl_wave_plan_has_no_row_python(spark, tmp_path):
    """The engine's per-wave pipeline must stay on Arrow paths."""
    from sher_look_spark.crawler import synth
    from sher_look_spark.crawler.engine import CrawlConfig, CrawlEngine

    web = synth.SynthWebConfig(n_hosts=3, pages_per_host=5, seed=3)
    eng = CrawlEngine(spark, str(tmp_path / "st"), CrawlConfig(web=web))
    eng.run(synth.seed_urls(web, 3), max_waves=2)
    imgs = eng.store.read(spark, "images")
    assert imgs.count() > 0
    from sher_look_spark.plans import plan_summary

    assert plan_summary(imgs)["row_python"] == 0
