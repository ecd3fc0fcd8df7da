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


def _idf_map(df):
    return {r.word: (r.df, r.idf) for r in df.collect()}


def test_incremental_idf_equals_full_recompute(spark, tmp_path):
    """The maintained word_df table (delta-df merge) must yield the idf the
    reference's full calculateIDF recompute would — ln(N/df+1) with df over
    ALL postings and N = all indexed docs — after multiple index runs."""
    import pytest

    from sher_look_spark.crawler import synth
    from sher_look_spark.crawler.engine import CrawlConfig, CrawlEngine
    from sher_look_spark.crawler.storage import SnapshotStore
    from sher_look_spark.operators.indexer import idf_table
    from sher_look_spark.operators.webindex import index_incremental

    web = synth.SynthWebConfig(n_hosts=4, pages_per_host=6, seed=31, timeout_pct=0)
    state = str(tmp_path / "idf")
    eng = CrawlEngine(spark, state, CrawlConfig(max_pages=1000, max_depth=2, web=web))
    eng.seed(synth.seed_urls(web, 3))
    eng.run_wave()
    store = SnapshotStore(state)
    index_incremental(spark, store)
    eng.run_wave()
    index_incremental(spark, store)

    postings = store.read(spark, "postings")
    n_total = store.read(spark, "documents_meta").count()
    got = _idf_map(store.read(spark, "idf"))
    want = _idf_map(idf_table(postings, n_total))
    assert set(got) == set(want)
    for w in want:
        assert got[w][0] == want[w][0], w                      # df exact
        assert got[w][1] == pytest.approx(want[w][1], abs=1e-12), w


def test_legacy_store_resume_idf_exact(spark, tmp_path):
    """ADVICE: a snapshot written BEFORE the word_df/indexed_docs_total
    change (index_runs present, both absent) must resume with N counted from
    documents_meta and df migrated from the full old postings — not N
    spanning only the delta."""
    import pytest

    from sher_look_spark.crawler import synth
    from sher_look_spark.crawler.engine import CrawlConfig, CrawlEngine
    from sher_look_spark.crawler.storage import SnapshotStore
    from sher_look_spark.operators.indexer import idf_table
    from sher_look_spark.operators.webindex import index_incremental

    web = synth.SynthWebConfig(n_hosts=4, pages_per_host=6, seed=32, timeout_pct=0)
    state = str(tmp_path / "legacy")
    eng = CrawlEngine(spark, state, CrawlConfig(max_pages=1000, max_depth=2, web=web))
    eng.seed(synth.seed_urls(web, 3))
    eng.run_wave()
    store = SnapshotStore(state)
    index_incremental(spark, store)

    # strip the new bookkeeping -> exactly what a pre-change store holds
    snap = store.latest()
    legacy_state = {k: v for k, v in snap.state.items() if k != "indexed_docs_total"}
    store.commit(replaces={"word_df": []}, state=legacy_state)
    assert store.read(spark, "word_df") is None

    eng.run_wave()
    index_incremental(spark, store)
    postings = store.read(spark, "postings")
    n_total = store.read(spark, "documents_meta").count()
    got = _idf_map(store.read(spark, "idf"))
    want = _idf_map(idf_table(postings, n_total))
    assert set(got) == set(want)
    for w in want:
        assert got[w][0] == want[w][0], w
        assert got[w][1] == pytest.approx(want[w][1], abs=1e-12), w
