"""Dedup family + similarity search behavior tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the crawler "
        "indexes pages and ranks results for every query it receives"
    )
    near = base.replace("lazy dog", "sleepy dog")  # near-dup of base
    other = (
        "completely different content about spark shuffles partitions "
        "broadcast joins adaptive execution and columnar parquet storage"
    )
    rows = [
        (1, base),
        (2, base),          # exact dup of 1
        (3, near),          # near dup of 1
        (4, other),
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    from sher_look_spark.operators.dedup import exact_dedup

    rows = {r.canonical_id: r.dup_count for r in exact_dedup(docs).collect()}
    assert rows[1] == 2  # docs 1+2 collapse
    assert rows[3] == 1 and rows[4] == 1 and rows[5] == 1


def test_minhash_lsh_finds_near_dups(docs):
    from sher_look_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    sigs = minhash_signatures(docs, num_hashes=64)
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in minhash_lsh_pairs(sigs, bands=16).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)  # identical text -> identical signature
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_dedup_clusters(docs):
    from sher_look_spark.operators.dedup import minhash_dedup

    canon = {r.doc_id: r.canonical_id for r in minhash_dedup(docs, threshold=0.6).collect()}
    assert canon[2] == 1 and canon[3] == 1
    assert 4 not in canon and 5 not in canon


def test_simhash(docs):
    from sher_look_spark.operators.dedup import simhash_table

    sh = {r.doc_id: r.simhash for r in simhash_table(docs).collect()}
    assert sh[1] == sh[2]
    ham13 = bin((sh[1] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    ham14 = bin((sh[1] ^ sh[4]) & ((1 << 64) - 1)).count("1")
    assert ham13 < ham14, "near-dup must be closer in hamming space"


def test_ngram_jaccard(docs):
    from sher_look_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(7))
    rows = []
    for i in range(200):
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    # vec 201 = vec 0 + tiny noise (near dup)
    v0 = np.array(rows[0][1])
    rows.append((201, [float(x) for x in v0 + 0.01 * rng.standard_normal(16)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(emb):
    from sher_look_spark.operators.similarity import brute_force_topk

    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    top = brute_force_topk(emb, q, k=3).collect()
    assert top[0].vec_id == 0 and top[0].cosine == pytest.approx(1.0, abs=1e-6)
    assert top[1].vec_id == 201 and top[1].cosine > 0.99


def test_lsh_topk_agrees_with_brute_force_on_head(emb):
    from sher_look_spark.operators.similarity import brute_force_topk, lsh_topk

    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    brute = [r.vec_id for r in brute_force_topk(emb, q, k=2).collect()]
    approx = [r.vec_id for r in lsh_topk(emb, q, k=2, n_planes=10, probe_hamming=1).collect()]
    assert approx[:2] == brute[:2]  # the near-identical pair must survive LSH


def test_embedding_neardup(emb):
    from sher_look_spark.operators.similarity import embedding_neardup_pairs

    pairs = [(r.id_a, r.id_b) for r in embedding_neardup_pairs(emb, threshold=0.98).collect()]
    assert (0, 201) in pairs


def test_round2_operator_plans_are_scale_shaped(spark):
    """Plan hygiene for the round-2 operators: no row-at-a-time Python, no
    cartesian products, partial aggregation where expected."""
    from pyspark.sql import functions as F

    from sher_look_spark.operators.dedup import (
        minhash_signatures,
        simhash_neighbor_pairs,
        simhash_table,
    )
    from sher_look_spark.operators.similarity import embedding_neardup_pairs
    from sher_look_spark.plans import explain_str, plan_summary, uses_row_python

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon tok{i} zeta eta") for i in range(30)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, num_hashes=8)
    assert not uses_row_python(sigs)
    # signatures are per-document state computed in ONE Arrow stage — the
    # plan must carry no Exchange at all (r6: the explode -> 64-min
    # aggregation was replaced by an in-task hashlib min; zero shuffles)
    from sher_look_spark.plans import count_shuffles

    assert count_shuffles(sigs) == 0
    assert plan_summary(sigs)["arrow_python"] >= 1

    sim = simhash_table(docs)
    pairs = simhash_neighbor_pairs(sim, bands=6, max_hamming=5)
    plan = explain_str(pairs, "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert not uses_row_python(pairs)

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    nd = embedding_neardup_pairs(emb, threshold=0.5, n_planes=2, n_tables=3)
    plan = explain_str(nd, "simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    s = plan_summary(nd)
    assert s["row_python"] == 0 and s["arrow_python"] >= 1
