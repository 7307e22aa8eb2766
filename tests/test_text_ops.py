from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.text import (
    with_fingerprint,
    with_lang_guess,
    with_token_stats,
)


def test_token_stats_tiny_fixture(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! 42"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in with_token_stats(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 3
    assert r1["n_alpha"] == 10  # Helloworld
    assert r1["n_digit"] == 2
    assert r1["n_punct"] == 2  # comma and bang
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["mean_token_len"] == 0.0


def test_fingerprint_order_sensitive_and_stable(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "gamma beta alpha"),
        ],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_lang_guess_stopword_evidence(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of it all that is for you"),
            (2, "der hund und die katze ist nicht mit ein ich zu"),
            (3, "le chat et la les des est une que pour dans"),
            (4, "你好 世界 你好 世界"),
            (5, "qwerty zxcvb"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_guess"] for r in with_lang_guess(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "zh", 5: "und"}


def test_sketch_aggregates_close_to_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.functions.exprs import (
        exact_percentile,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans.func_ops import (
        sketch_aggregates,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
        read_table,
    )

    row = sketch_aggregates(spark, sf_dir).collect()[0]
    l = read_table(spark, sf_dir, "lineitem")
    exact_parts = l.select(F.countDistinct("l_partkey")).collect()[0][0]
    assert abs(row["approx_parts"] - exact_parts) / exact_parts < 0.05
    for col, q in (("p50_approx", 0.5), ("p99_approx", 0.99)):
        exact = exact_percentile(l, "l_extendedprice", q)
        assert abs(row[col] - exact) / exact < 0.02


def test_repetition_stats_hand_computed(spark):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.text import (
        with_repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            # "a" 3/6 tokens; top bigram "a b" 2/5; trigrams: "a b a","b a c","a c a","c a b","a b d" — all distinct
            (1, "a b a c a b d"),
            # all same token: uni 1.0, bigram 1.0, trigrams all equal → dup frac 2/3... wait n=4 tokens "x x x x": trigrams "x x x" ×2 → dup 1/2
            (2, "x x x x"),
            (3, "one two"),  # no trigrams → dup 0.0
            (4, ""),  # no tokens at all → all 0.0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in with_repetition_stats(docs).collect()}
    r1 = got[1]  # 7 tokens: a,b,a,c,a,b,d → "a"×3/7; bigrams 6: "a b"×2/6
    assert abs(r1["top_unigram_frac"] - 3 / 7) < 1e-15
    assert abs(r1["top_bigram_frac"] - 2 / 6) < 1e-15
    # trigrams: "a b a","b a c","a c a","c a b","a b d" → 5 distinct of 5
    assert r1["dup_trigram_frac"] == 0.0
    r2 = got[2]
    assert r2["top_unigram_frac"] == 1.0
    assert r2["top_bigram_frac"] == 1.0
    assert abs(r2["dup_trigram_frac"] - 1 / 2) < 1e-15  # 2 trigrams, 1 distinct
    assert not r2["pass_repetition"]
    r3 = got[3]
    assert abs(r3["top_unigram_frac"] - 0.5) < 1e-15
    assert r3["dup_trigram_frac"] == 0.0
    r4 = got[4]
    assert (
        r4["top_unigram_frac"] == 0.0
        and r4["top_bigram_frac"] == 0.0
        and r4["dup_trigram_frac"] == 0.0
    )
    assert r4["pass_repetition"]


def test_cms_token_counts_bound_exact_counts(spark, sf_dir):
    """Count-min-sketch guarantee: est ≥ true always (one-sided), and
    est ≤ true + ε·N for the heavy hitters at ε=0.001."""
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.plans import (
        REGISTRY,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.text import (
        tokens,
    )
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.sources.readers import (
        read_table,
    )
    from pyspark.sql import functions as F

    est = {
        r["token"]: r["est_count"]
        for r in REGISTRY["token_freq_cms"].builder(spark, sf_dir).collect()
    }
    tok = read_table(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("token")
    )
    n_total = tok.count()
    exact = {
        r["token"]: r["n"]
        for r in tok.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert est, "no estimates returned"
    for t, e in est.items():
        assert e >= exact[t], (t, e, exact[t])
        assert e <= exact[t] + 0.001 * n_total + 1, (t, e, exact[t])
    # the bounded per-partition candidate heuristic must still surface
    # the true global heavy hitters (recall check — the exact pass lives
    # only here in the test, never in the query path)
    true_top10 = {
        t
        for t, _ in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    }
    assert true_top10 <= set(est), true_top10 - set(est)


def test_normalize_unicode_forms_and_nulls(spark):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.text import (
        normalize_unicode,
    )
    import pytest
    import unicodedata

    combining = "café x"  # e + U+0301
    composed = "café x"
    df = spark.createDataFrame(
        [(1, combining), (2, composed), (3, None), (4, "plain")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["normalized"] for r in normalize_unicode(df).collect()}
    assert got[1] == composed  # NFC composes the sequence
    assert got[2] == composed  # already-normal text is unchanged
    assert got[3] is None
    assert got[4] == "plain"
    # NFD decomposes back
    gotd = {
        r["doc_id"]: r["normalized"]
        for r in normalize_unicode(df, form="NFD").collect()
    }
    assert gotd[2] == unicodedata.normalize("NFD", composed)
    with pytest.raises(ValueError):
        normalize_unicode(df, form="NFX")


def test_sentences_udtf_lateral(spark):
    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.text import (
        sentences_udtf,
    )

    sentences_udtf(spark)
    df = spark.createDataFrame(
        [
            (1, "One. Two sentences! And a third? yes"),
            (2, "no terminators here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("__t_udtf")
    rows = spark.sql(
        "SELECT doc_id, s.idx, s.sentence FROM __t_udtf d, "
        "LATERAL split_sentences(d.text) s ORDER BY doc_id, idx"
    ).collect()
    got = [(r["doc_id"], r["idx"], r["sentence"]) for r in rows]
    assert got == [
        (1, 0, "One"),
        (1, 1, "Two sentences"),
        (1, 2, "And a third"),
        (1, 3, "yes"),
        (2, 0, "no terminators here"),
    ]  # doc 3 (null) contributes nothing


class TestLexicalDiversity:
    def test_hand_computed_profile(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.text import (
            lexical_diversity,
        )

        rows = [
            (1, "the cat and the dog and the bird"),  # the:3 and:2 cat/dog/bird:1
            (2, "spam spam spam spam"),
            (3, ""),  # empty -> zero counts, NULL ratios
            (4, "Unique WORDS only unique words ONLY"),  # lowercased: 3 types x2
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
        d1 = out[1]
        assert d1["n_tokens"] == 8 and d1["n_types"] == 5 and d1["hapax_frac"] == 3 / 5
        # sum_c2 = 9 + 4 + 1 + 1 + 1 = 16 -> simpson 16/64 = 0.25
        assert d1["simpson_concentration"] == 16.0 / 64.0
        assert d1["effective_vocab"] == 64.0 / 16.0
        d2 = out[2]
        assert d2["n_types"] == 1 and d2["type_token_ratio"] == 0.25
        assert d2["simpson_concentration"] == 1.0 and d2["hapax_frac"] == 0.0
        d3 = out[3]
        assert d3["n_tokens"] == 0 and d3["n_types"] == 0
        assert d3["type_token_ratio"] is None and d3["simpson_concentration"] is None
        d4 = out[4]
        assert d4["n_types"] == 3 and d4["simpson_concentration"] == 12.0 / 36.0
