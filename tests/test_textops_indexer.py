"""Indexer + text-analysis operator tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_build_postings_sections_and_positions(spark):
    from sher_look_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(
        [(1, "Spark Engine Guide", "the engine crawls fast and ranks webpages")],
        "doc_id long, title string, text string",
    )
    rows = (
        build_postings(docs, sections=[("title", "title"), ("body", "text")])
        .orderBy("position")
        .collect()
    )
    got = [(r.section, r.word, r.position) for r in rows]
    # stop words dropped ('the','and'); positions run title-first and only
    # advance on kept tokens (Tokenizer.java:43)
    assert got == [
        ("title", "spark", 0),
        ("title", "engine", 1),
        ("title", "guide", 2),
        ("body", "engine", 3),
        ("body", "crawls", 4),
        ("body", "fast", 5),
        ("body", "ranks", 6),
        ("body", "webpages", 7),
    ]


def test_idf_formula(spark):
    from sher_look_spark.operators.indexer import build_postings, idf_table

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    postings = build_postings(docs)
    idf = {r.word: r.idf for r in idf_table(postings, n_docs=3).collect()}
    assert idf["alpha"] == pytest.approx(math.log(3 / 3 + 1))
    assert idf["beta"] == pytest.approx(math.log(3 / 2 + 1))
    assert idf["delta"] == pytest.approx(math.log(3 / 1 + 1))


def test_word_dictionary_and_sizes(spark):
    from sher_look_spark.operators.indexer import (
        build_postings,
        document_sizes,
        word_dictionary,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha")], "doc_id long, text string"
    )
    postings = build_postings(docs)
    dic = {r.word: r["count"] for r in word_dictionary(postings).collect()}
    assert dic == {"alpha": 3, "beta": 1}
    sizes = {r.doc_id: r.document_size for r in document_sizes(postings).collect()}
    assert sizes == {1: 3, 2: 1}


def test_lang_id_and_quality(spark):
    from sher_look_spark.operators.textops import lang_id, quality_features, token_count

    docs = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der hund ist nicht in das haus und die katze"),
            (3, "le chat est dans la maison et les chiens"),
            (4, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang for r in docs.select("doc_id", lang_id().alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}
    counts = {r.doc_id: r.n for r in docs.select("doc_id", token_count().alias("n")).collect()}
    assert counts[4] == 3
    q = {r.doc_id: r for r in quality_features(docs).collect()}
    assert q[1].stop_ratio > q[4].stop_ratio
    assert 0.0 <= q[1].quality_score <= 1.0


def test_fingerprint_deterministic_and_shift_sensitive(spark):
    from sher_look_spark.operators.textops import fingerprint

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "PREFIX alpha beta gamma delta epsilon zeta eta theta"),
            (4, "xy"),
        ],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp for r in docs.select("doc_id", fingerprint().alias("fp")).collect()}
    assert fp[1] == fp[2]
    assert fp[3] == fp[1]  # shared shingles keep the min fingerprint stable
    assert fp[4] and fp[4] != fp[1]
