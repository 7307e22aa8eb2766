"""Sparse document retrieval: distributed BM25 top-k.

Training-data-pipeline extension (the reference — a 300-line pandas
fraud scorer, ref scripts/run_pipeline.py — has no retrieval surface;
this composes the engine's existing tf/df machinery, cf.
plans/func_ops.py's TF-IDF family, with the two-phase top-k discipline
of operators/similarity.py).

Scale shape: the corpus never moves. The only shuffles are (a) the
(doc, term) partial-count aggregation over the rows that actually
contain a query term — the explode is filtered against the broadcast
query-term set BEFORE it shuffles, so corpus size only enters as a
map-side scan — and (b) the per-doc score roll-up, keyed by doc_id over
that same filtered subset. Document-frequency and corpus stats are
tiny aggregates re-joined broadcast. Top-k is orderBy+limit, which
Spark executes as TakeOrderedAndProject (per-partition heap + driver
merge of k rows), never a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: Quantization unit for per-term score contributions: contributions are
#: floored to integer 1e-9 units before the per-doc sum, so the sum is
#: an exact BIGINT (order-independent on any partitioning — float sums
#: are not) and the final score is one IEEE division.
_Q = 1e9


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    log_idf: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k retrieval for one query over a document corpus:
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).

    ``log_idf=True`` (default, the textbook scorer) uses
    idf = ln((N − df + 0.5)/(df + 0.5) + 1) — Robertson's formulation,
    as used by Lucene. ``log_idf=False`` swaps the log for the raw
    Robertson–Spärck-Jones odds (N − df + 0.5)/(df + 0.5): ln is the
    one transcendental in BM25 and engines differ in its last ulp, so
    the log-free form keeps every operation inside correctly-rounded
    IEEE +,−,×,/ and makes the score bit-reproducible against a SQL
    oracle. The log is monotone, so single-term rankings are identical;
    multi-term rankings weight rare terms more sharply (the differential
    pytest pins the log path against a plain-Python reference instead).

    Ties break by ascending id so the top-k is deterministic on any
    engine and partitioning.

    Returns (id, score, n_hit_terms) for the k best-scoring documents
    that contain at least one query term.
    """
    terms = [t.lower() for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(F.lower(F.col(text_col)))
    base = docs.select(F.col(id_col).alias("_id"), toks.alias("_toks")).select(
        "_id", "_toks", F.size("_toks").cast("long").alias("dl")
    )
    # corpus stats: one broadcast row (N, total token count)
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    # (doc, term) term frequencies — the explode is filtered against the
    # broadcast literal set BEFORE the shuffle, so only hit rows move.
    # Cached (bounded lifecycle, eng/cache.py): df-per-term derives from
    # this same frame, and lineage would otherwise re-run the corpus
    # explode once per consumer. Footprint ≤ |terms|·N_docs short rows.
    from ..cache import swap_cache

    # Cache key carries the distinguishing parameters (query terms +
    # BM25 constants) so two interleaved queries with different terms
    # don't evict each other's reusable subtree (ADVICE r7).
    _key = "bm25_topk.tf:" + ",".join(sorted(terms)) + f":{k1}:{b}"
    tf = swap_cache(
        _key,
        base.select("_id", "dl", F.explode("_toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf")),
    )
    # document frequency per term: |terms| rows, broadcast back
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    j = tf.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    odds = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    idf = F.log(odds + F.lit(1.0)) if log_idf else odds
    # Canonical association is textbook left-to-right: (idf · tf·(k1+1))
    # THEN the division. IEEE × is not associative — idf·(num/denom) can
    # differ by one ulp (e.g. tf=2, k1=0.5 gives 0.39999999999999997 vs
    # 0.4), and the 1e-9 quantization below turns that ulp into an
    # off-by-one integer. The SQL oracle and the differential pytest
    # both pin this exact grouping.
    contrib = (idf * (F.col("tf") * F.lit(k1 + 1.0))) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    )
    scored = (
        j.select("_id", F.floor(contrib * F.lit(_Q)).cast("long").alias("q"))
        .groupBy("_id")
        .agg(
            F.sum("q").alias("score_q"),
            F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        )
    )
    return (
        scored.orderBy(F.desc("score_q"), F.asc("_id"))
        .limit(k)
        .select(
            F.col("_id").alias(id_col),
            (F.col("score_q").cast("double") / F.lit(_Q)).alias("score"),
            "n_hit_terms",
        )
    )


def build_inverted_index(
    docs: DataFrame,
    n_shards: int = 16,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize a sharded inverted index: for every term, posting
    lists of ``doc:tf`` pairs — the retrieval-infrastructure artifact a
    corpus-scale search/dedup/decontamination stack builds once and
    queries forever.

    Returns (term, shard, df, shard_df, postings) where ``postings`` is
    the shard's comma-joined ``doc:tf`` list sorted by doc id, ``df``
    the term's TOTAL document frequency and ``shard_df`` the shard's.

    Scale shape — two decisions that matter at 100 TB:

    * **No per-term window.** Posting shards are assigned by a
      deterministic hash of the doc id (``md5_bucket``), NOT by
      row_number over a term partition — a stopword's partition would
      put billions of rows through one reducer. With hash shards the
      groupBy key is (term, shard), so a hot term fans out over
      ``n_shards`` reducers and no single output row exceeds
      ~|corpus|/n_shards postings.
    * **Total df without a second corpus pass**: per-shard partials
      (n_terms × n_shards rows — index-sized, not corpus-sized)
      re-aggregate to term totals and broadcast-join back.
    """
    from .packing import md5_bucket
    from .text import tokens

    tf = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("shard", md5_bucket(F.col("_id"), n_shards))
    )
    shards = tf.groupBy("term", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("shard_df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_id", "tf"))),
                lambda x: F.concat_ws(":", x["_id"], x["tf"]),
            ),
            ",",
        ).alias("postings"),
    )
    totals = shards.groupBy("term").agg(
        F.sum("shard_df").cast("long").alias("df")
    )
    if min_df > 1:
        totals = totals.where(F.col("df") >= min_df)
    return shards.join(F.broadcast(totals), "term").select(
        "term", "shard", "df", "shard_df", "postings"
    )
