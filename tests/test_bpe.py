"""BPE tokenization (operators/bpe.py) — differential + invariants."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.bpe import (
    EOW,
    apply_bpe,
    encode_word,
    learn_bpe_from_corpus,
    learn_bpe_merges,
)


def test_learn_merges_deterministic_and_classic():
    """'low lower lowest newest widest': frequent pairs merge first and
    re-learning gives the identical list (lexicographic tie-break)."""
    words = ["low", "low", "lower", "lowest", "newest", "widest", "newest"]
    m1 = learn_bpe_merges(words, 10)
    m2 = learn_bpe_merges(words, 10)
    assert m1 == m2
    assert len(m1) == 10
    # (l,o) has frequency 4 — tied for max in round one — so it must be
    # learned within the first few merges (exact position depends on the
    # lexicographic tie-break, which is the determinism contract)
    assert ("l", "o") in m1[:4]


def test_encode_word_roundtrip_invariant():
    words = ["low", "lower", "lowest", "newest", "widest"] * 3
    merges = learn_bpe_merges(words, 30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in ["low", "lowest", "newish", "zzz"]:
        toks = encode_word(w, ranks)
        assert "".join(toks).replace(EOW, "") == w


def test_apply_bpe_matches_driver_encoding(spark):
    """The distributed Arrow path must agree exactly with driver-side
    encoding of the same merges."""
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "newest widest low"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    merges = learn_bpe_from_corpus(docs, n_merges=20, sample_docs=4)
    out = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for doc_id, text in [(1, "low lower lowest"), (2, "newest widest low"), (3, ""), (4, None)]:
        words = (text or "").lower().split()
        expect = sum(len(encode_word(w, ranks)) for w in words)
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["n_bpe_tokens"] == expect
    assert out[3]["fertility"] is None  # 0-word doc: no div-by-zero
    # trained merges compress: fewer bpe tokens than characters
    assert out[1]["n_bpe_tokens"] < len("lowlowerlowest") + 3


def test_fertility_definition(spark):
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    out = apply_bpe(docs, []).collect()[0]
    # no merges: every word is chars + EOW = 3 tokens
    assert out["n_bpe_tokens"] == 9
    assert out["fertility"] == 3.0
