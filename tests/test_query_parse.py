"""Q1 query parsing semantics + end-to-end search pipeline."""

from __future__ import annotations

import pytest

from sher_look_spark.operators.query_parse import AND, NOT, OR, parse_query


def test_keyword_mode():
    p = parse_query("Machine learning RANKS")
    assert not p.is_phrase
    assert p.tokens == ["machine", "learning", "ranks"]
    assert p.stems == ["machin", "learn", "rank"]


def test_keyword_mode_drops_stop_words():
    p = parse_query("the quick AND fox")
    assert not p.is_phrase  # not fully quote-wrapped
    assert "the" not in p.tokens and "and" not in p.tokens


def test_phrase_mode_single():
    p = parse_query('"Big Data"')
    assert p.is_phrase
    assert p.phrases == ["big data"]
    assert p.operators == []


def test_phrase_mode_with_operators():
    p = parse_query('"alpha beta" AND "gamma" NOT "delta"')
    assert p.is_phrase
    assert p.phrases == ["alpha beta", "gamma", "delta"]
    assert p.operators == [AND, NOT]


def test_phrase_mode_or():
    p = parse_query('"x y" OR "z"')
    assert p.operators == [OR]


def test_phrase_cap_at_three():
    p = parse_query('"a1" AND "b2" AND "c3" AND "d4"')
    assert p.phrases == ["a1", "b2", "c3"]


def test_empty_query():
    assert parse_query("") is None
    assert parse_query("   ") is None
    assert parse_query(None) is None


def test_search_pipeline_keyword_and_phrase(spark):
    from sher_look_spark.operators.indexer import (
        build_postings,
        document_sizes,
        idf_table,
    )
    from sher_look_spark.operators.query_parse import search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta words"),
            (2, "alpha gamma beta words words"),
            (3, "unrelated content entirely different"),
        ],
        "doc_id long, text string",
    )
    postings = build_postings(docs)
    sizes = document_sizes(postings)
    idf = idf_table(postings, n_docs=3)

    kw = search(spark, postings, sizes, idf, None, "alpha beta").collect()
    assert {r.doc_id for r in kw} == {1, 2}

    ph = search(spark, postings, sizes, idf, None, '"alpha beta"').collect()
    assert [r.doc_id for r in ph] == [1]  # contiguous only in doc 1

    ph_not = search(
        spark, postings, sizes, idf, None, '"alpha" NOT "delta"'
    ).collect()
    assert {r.doc_id for r in ph_not} == {2}
