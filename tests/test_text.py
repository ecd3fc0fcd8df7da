"""Tokenizer/stemmer goldens (reference: Tokenizer.java, Stemmer tests)."""

from __future__ import annotations

from sher_look_spark.functions.porter import porter_stem
from sher_look_spark.functions.text import (
    stop_words,
    tokenize_py,
    tokenize_with_positions_py,
)


def test_porter_reference_goldens():
    # DatabaseHelperTests.java:179-181
    assert porter_stem("flies") == "fli"
    assert porter_stem("swimming") == "swim"


def test_porter_classic_vocabulary():
    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "caress": "caress",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "motoring": "motor",
        "sing": "sing",
        "conflated": "conflat",
        "troubled": "troubl",
        "sized": "size",
        "hopping": "hop",
        "tanned": "tan",
        "falling": "fall",
        "hissing": "hiss",
        "fizzed": "fizz",
        "failing": "fail",
        "filing": "file",
        "happy": "happi",
        "sky": "sky",
        "relational": "relat",
        "conditional": "condit",
        "rational": "ration",
        "valenci": "valenc",
        "digitizer": "digit",
        "operator": "oper",
        "feudalism": "feudal",
        "decisiveness": "decis",
        "hopefulness": "hope",
        "callousness": "callous",
        "formaliti": "formal",
        "sensitiviti": "sensit",
        "sensibiliti": "sensibl",
        "triplicate": "triplic",
        "formative": "form",
        "formalize": "formal",
        "electriciti": "electr",
        "electrical": "electr",
        "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv",
        "allowance": "allow",
        "inference": "infer",
        "airliner": "airlin",
        "gyroscopic": "gyroscop",
        "adjustable": "adjust",
        "defensible": "defens",
        "irritant": "irrit",
        "replacement": "replac",
        "adjustment": "adjust",
        "dependent": "depend",
        "adoption": "adopt",
        "homologou": "homolog",
        "communism": "commun",
        "activate": "activ",
        "angulariti": "angular",
        "homologous": "homolog",
        "effective": "effect",
        "bowdlerize": "bowdler",
        "probate": "probat",
        "rate": "rate",
        "cease": "ceas",
        "controll": "control",
        "roll": "roll",
    }
    for word, want in cases.items():
        assert porter_stem(word) == want, f"{word}: got {porter_stem(word)}, want {want}"


def test_stop_words_loaded():
    sw = stop_words()
    # data/stop-words.txt: 1297 newline-terminated lines + final "zr" = 1298
    assert len(sw) == 1298
    assert "the" in sw and "and" in sw and "zr" in sw


def test_tokenize_drops_stopwords_and_positions_count_kept_only():
    # Tokenizer.java:43 — position counter increments only on kept tokens.
    text = "The quick brown fox, and the lazy dog!"
    toks = tokenize_with_positions_py(text)
    words = [t[0] for t in toks]
    positions = [t[2] for t in toks]
    assert words == ["quick", "brown", "fox", "lazy", "dog"]
    assert positions == [0, 1, 2, 3, 4]


def test_tokenize_splits_on_non_word():
    assert tokenize_py("spark-native engine_v2!") == ["spark", "native", "engine_v2"]


def test_explode_tokens_matches_python(spark):
    from sher_look_spark.functions.text import explode_tokens

    docs = [
        (1, "The quick brown fox, and the lazy dog!"),
        (2, "Swimming flies fly; the rain in spain."),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = explode_tokens(df, with_stems=True).orderBy("doc_id", "position").collect()
    want = []
    for doc_id, text in docs:
        for tok, stem, pos in tokenize_with_positions_py(text):
            want.append((doc_id, tok, pos, stem))
    assert [(r.doc_id, r.word, r.position, r.stem) for r in got] == want
