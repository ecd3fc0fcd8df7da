"""I1: incremental indexing — only not-yet-indexed pages are processed."""

from __future__ import annotations


def test_index_incremental_only_new_pages(spark, tmp_path):
    from sher_look_spark.crawler import synth
    from sher_look_spark.crawler.engine import CrawlConfig, CrawlEngine
    from sher_look_spark.crawler.storage import SnapshotStore
    from sher_look_spark.operators.webindex import index_incremental

    web = synth.SynthWebConfig(n_hosts=4, pages_per_host=6, seed=21, timeout_pct=0)
    state = str(tmp_path / "incr")
    cfg = CrawlConfig(max_pages=1000, max_depth=2, web=web)
    eng = CrawlEngine(spark, state, cfg)
    eng.seed(synth.seed_urls(web, 3))
    eng.run_wave()

    store = SnapshotStore(state)
    n_wave0 = store.read(spark, "pages").count()
    out1 = index_incremental(spark, store)
    assert out1["indexed"] == n_wave0

    # second index run with no new pages -> no-op
    assert index_incremental(spark, store)["indexed"] == 0

    # crawl one more wave -> only the delta gets indexed
    eng.run_wave()
    n_total = store.read(spark, "pages").count()
    out2 = index_incremental(spark, store)
    assert out2["indexed"] == n_total - n_wave0

    postings = store.read(spark, "postings")
    meta = store.read(spark, "documents_meta")
    assert meta.count() == n_total
    assert postings.select("doc_id").distinct().count() == n_total
