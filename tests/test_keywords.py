"""operators/keywords.py (RAKE): hand-computed degree/freq fixture,
segmentation edge cases, and the quantized-sum exactness contract."""

from __future__ import annotations

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.keywords import (
    rake_keywords,
)


class TestRake:
    def test_hand_computed_scores(self, spark):
        """Classic RAKE micro-fixture:
        doc: 'deep learning of deep models' with stopword 'of' ->
        phrases ['deep learning'], ['deep models'].
          freq(deep)=2 degree(deep)=4 -> 2.0
          freq(learning)=1 degree(learning)=2 -> 2.0
          freq(models)=1 degree(models)=2 -> 2.0
        score('deep learning') = score('deep models') = 4.0."""
        df = spark.createDataFrame(
            [(1, "deep learning of deep models")], "doc_id long, text string"
        )
        got = {r["phrase"]: r for r in rake_keywords(df).collect()}
        assert set(got) == {"deep learning", "deep models"}
        for p in got.values():
            assert p["n_words"] == 2 and p["n_occurrences"] == 1
            assert p["score_q"] == 4_000_000_000 and p["score"] == 4.0

    def test_segmentation_edges_and_max_len(self, spark):
        """Leading/trailing/adjacent stopwords produce no empty
        phrases; runs longer than max_phrase_words are dropped;
        repeated phrases aggregate."""
        rows = [
            (1, "the quick brown fox jumps"),       # 4-word run: dropped
            (2, "of the quick fox and the quick fox the"),  # 2x 'quick fox'
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["phrase"]: r for r in rake_keywords(df).collect()}
        assert "quick fox" in got
        assert got["quick fox"]["n_occurrences"] == 2
        assert all(r["n_words"] <= 3 for r in got.values())
        assert "" not in got

    def test_quantized_floor_is_exact(self, spark):
        """freq=3, degree=7 -> wq = floor(7e9/3) = 2333333333 exactly
        (a float path would carry 2333333333.333...). 'x' appears in
        three 1-2-word phrases: degrees 2+2+3... build: 'x a x a x y z'
        with stopword 'a': phrases [x],[x],[x y z] ->
        freq(x)=3, degree(x)=1+1+3=5 -> floor(5e9/3)=1666666666."""
        df = spark.createDataFrame(
            [(1, "x a x a x y z")], "doc_id long, text string"
        )
        got = {r["phrase"]: r for r in rake_keywords(df).collect()}
        # phrase [x] occurs twice; [x y z] once
        assert got["x"]["n_occurrences"] == 2
        assert got["x"]["score_q"] == 1_666_666_666
        # x y z = wq(x)+wq(y)+wq(z) = 1666666666 + 3e9 + 3e9
        assert got["x y z"]["score_q"] == 1_666_666_666 + 6_000_000_000

    def test_stopword_dataframe_overload(self, spark):
        """VERDICT r14 item 6: a DataFrame stopword list (broadcast
        join membership) must (a) reproduce the tuple path exactly
        when it carries the same words, and (b) change segmentation
        when it carries MORE words — 'quick' as a stopword splits
        'the quick brown fox' into ['brown fox']."""
        rows = [
            (1, "the quick brown fox"),
            (2, "of the quick fox and the quick fox"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.keywords import (
            RAKE_STOPWORDS,
        )

        base = sorted(tuple(r) for r in rake_keywords(df).collect())
        same = spark.createDataFrame(
            [(w,) for w in RAKE_STOPWORDS], "word string"
        )
        assert sorted(
            tuple(r) for r in rake_keywords(df, stopwords=same).collect()
        ) == base

        bigger = spark.createDataFrame(
            # mixed case + a duplicate: the overload folds and dedupes
            [(w,) for w in RAKE_STOPWORDS] + [("QUICK",), ("quick",)],
            "word string",
        )
        got = {
            r["phrase"]: r
            for r in rake_keywords(df, stopwords=bigger).collect()
        }
        assert got != {r[0]: r for r in base}
        assert "brown fox" in got  # 'quick' now delimits
        assert got["fox"]["n_occurrences"] == 2
        assert not any("quick" in p for p in got)
