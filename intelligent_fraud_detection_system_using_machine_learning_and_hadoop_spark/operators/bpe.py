"""Byte-pair-encoding tokenization: sample-trained, cluster-applied.

Training-data-pipeline extension (the reference — a pandas fraud
scorer, ref scripts/run_pipeline.py — has no tokenizer surface). Token
budgeting, sequence packing and per-token pricing all depend on the
REAL tokenizer's output, not whitespace counts; this module implements
classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public algorithm) in the shape production
tokenizer pipelines use:

* **learn on a bounded sample, driver-side** — tokenizer training is
  inherently sequential (merge i+1 depends on merge i) and is done on
  a corpus sample in practice (a few MB bounds it regardless of corpus
  size). Deterministic: ties break lexicographically.
* **apply distributed** — the learned merge list (a few KB) broadcasts
  to every executor; encoding runs as an Arrow ``mapInPandas`` batch
  map (pure per-row compute, zero shuffles, linear in corpus size).
  Python is unavoidable here (greedy iterative pair merging has no
  Catalyst expression), so it takes the engine's canonical vectorized
  Arrow path, never a row-at-a-time UDF.

No SQL oracle exists for BPE; correctness is pinned by differential
pytest against an independent plain-Python reference and by invariants
(concatenating a word's subword tokens reproduces the word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word sentinel appended before learning/encoding (Sennrich
#: convention) so merges can't cross word boundaries.
EOW = "</w>"


def learn_bpe_merges(sample_words: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word list (driver-side,
    deterministic: the most frequent adjacent symbol pair wins each
    round, ties broken lexicographically)."""
    from collections import Counter

    vocab = Counter()
    for w in sample_words:
        if w:
            vocab[tuple(list(w) + [EOW])] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # max by (count, pair) with lexicographic tie-break — the pair
        # ordering must be total so learning is reproducible anywhere
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = "".join(best)
        new_vocab: Counter = Counter()
        for sym, freq in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the
    lowest-rank adjacent pair (the standard inference algorithm)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with the learned merges: returns
    (id, n_words, n_bpe_tokens, fertility) where fertility =
    bpe tokens per word — the statistic token-budget planning needs.

    The merge table broadcasts once; encoding is an Arrow
    ``mapInPandas`` linear map with zero shuffles.
    """
    from typing import Iterator

    import pandas as pd

    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(merges)
    id_type = docs.schema[id_col].dataType.simpleString()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = {tuple(p): i for i, p in enumerate(bc.value)}
        cache: dict[str, int] = {}
        for pdf in it:
            n_words, n_bpe = [], []
            for t in pdf[text_col]:
                words = (t or "").lower().split()
                total = 0
                for w in words:
                    c = cache.get(w)
                    if c is None:
                        c = len(encode_word(w, ranks))
                        cache[w] = c
                    total += c
                n_words.append(len(words))
                n_bpe.append(total)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
                }
            )

    out = docs.select(id_col, text_col).mapInPandas(
        batches,
        schema=f"{id_col} {id_type}, n_words long, n_bpe_tokens long",
    )
    return out.withColumn(
        "fertility",
        F.col("n_bpe_tokens").cast("double")
        / F.nullif(F.col("n_words").cast("double"), F.lit(0.0)),
    )


def learn_bpe_from_corpus(
    docs: DataFrame,
    n_merges: int = 200,
    sample_docs: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Deterministic sample → driver-side learning: take the
    ``sample_docs`` lowest-id documents (reproducible on any
    partitioning — NOT a random sample), split to words, learn. The
    collect is bounded by ``sample_docs``, never corpus-sized."""
    rows = (
        docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .orderBy("_id")
        .limit(sample_docs)
        .collect()
    )
    words: list[str] = []
    for r in rows:
        words.extend((r["_t"] or "").lower().split())
    return learn_bpe_merges(words, n_merges)
