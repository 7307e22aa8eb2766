"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data-pipeline extensions (BASELINE.json north star; the
reference has no dedup). Scale notes per operator:

* **exact**: hash-groupBy on a digest — one shuffle of (digest, id),
  never of the payload.
* **n-gram Jaccard**: exact pairwise similarity via shingle inverted
  index (explode → self-join → count). Cost is Σ bucket², so it's the
  *verification* stage; candidate generation at 100 TB is MinHash-LSH.
* **MinHash+LSH**: per-doc signature (k xxhash64 mins — one map pass),
  banded into buckets; only same-bucket pairs are joined, then
  verified with exact Jaccard. The classic sub-quadratic near-dup join
  (Broder '97; MMDS ch.3).
* **SimHash**: 64-bit per-doc signature via bitwise majority of token
  hashes; Hamming-distance candidates via band equality joins.
* **embedding cosine**: near-dup pairs over an embedding column —
  brute-force normalized-dot self-join as the exact baseline, sign-LSH
  bucketed candidates + exact rerank as the sub-quadratic scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalize: bool = True
) -> DataFrame:
    """Exact dedup via content digest: one row per distinct content with
    the kept (min) id and the duplicate count. Only (digest, id) rows
    shuffle — the scalable exact-dedup shape."""
    t = F.col(text_col)
    if normalize:
        t = F.regexp_replace(F.lower(t), r"\s+", " ")
    return (
        df.select(F.md5(t).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, distinct word-n-gram array). Tokens are materialized as a
    column first so the split happens once per row, not once per array
    element (the naive nested expression is O(tokens²) re-parsing).

    Deliberately NO ``size(_sh) > 0`` filter: Catalyst pushes such a
    predicate below the projection and inlines the whole shingle
    expression into the scan filter (recomputing it 3× per row). Docs
    with no shingles contribute no exploded rows and join nothing, so
    the filter is redundant anyway.
    """
    from ..sources.readers import ensure_min_partitions

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    sh = F.expr(
        f"array_distinct(filter(transform(_toks,"
        f" (x, i) -> IF(i <= size(_toks) - {n},"
        f"             concat_ws(' ', slice(_toks, i + 1, {n})), NULL)),"
        f" s -> s IS NOT NULL))"
    )
    # tokenize/shingle is the hot map — spread it across all cores even
    # when the source is a single-row-group file (no-op otherwise)
    base = ensure_min_partitions(df.select(F.col(id_col).alias("_id"), F.col(text_col)))
    return base.select("_id", toks.alias("_toks")).select("_id", sh.alias("_sh"))


def _shingled_cached(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Persisted shingle sets for multi-consumer plans (self-join sides,
    size lookups, signatures all reuse one computation), registered in
    the bounded swap-cache (eng/cache.py): at most one live copy per
    (id, text, n) call site, freed by ``release_caches`` — the same
    lifecycle discipline as the mixture/fluency/pipeline caches. At
    cluster scale this is the standard MEMORY_AND_DISK working set —
    ~the corpus token footprint, spilling if it doesn't fit."""
    from pyspark import StorageLevel

    from ..cache import swap_cache

    return swap_cache(
        f"dedup.shingled.{id_col}.{text_col}.{n}",
        _shingled(df, id_col, text_col, n),
        storage_level=StorageLevel.MEMORY_AND_DISK,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥
    threshold) via shingle inverted index — no cross join; only docs
    sharing ≥1 shingle ever meet.

    **Hot-shingle guard (the 100 TB safety valve):** a shingle shared by
    k docs contributes k²/2 join rows, so one ubiquitous n-gram ("of the
    and") creates a quadratic hot bucket at corpus scale. ``max_df``
    drops shingles with document frequency above the cap from the
    representation BEFORE the self-join, bounding every bucket at
    max_df²/2 candidates. Jaccard is then computed over the filtered
    vocabulary (sizes shrink consistently with intersections) — the
    standard near-dup practice: ubiquitous shingles carry no similarity
    signal, exactly like stopwords in retrieval.

    The default ``max_df=None`` keeps exact textbook Jaccard semantics
    (least surprise for library callers — the cap CHANGES pair scores on
    any corpus where a shingle exceeds it). Large-corpus callers should
    opt in explicitly (the registered ``ngram_jaccard_pairs`` catalog
    query passes ``max_df=1000``); at real corpus scale running without
    a cap risks a quadratic hot bucket. Cap-vs-exact identity on
    sub-cap corpora is pinned by pytest."""
    s = _shingled_cached(df, id_col, text_col, n)
    ex = s.select("_id", F.explode("_sh").alias("shingle"))
    # Posting-list formulation: ONE shuffle of the exploded index
    # (groupBy shingle → sorted id list) instead of shuffling it twice
    # into a self-join; pair generation is a per-posting combination
    # expand — identical output rows, half the exchange volume, and the
    # per-shingle document frequency (the cap) falls out for free.
    posts = ex.groupBy("shingle").agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
    if max_df is not None:
        from pyspark import StorageLevel

        from ..cache import swap_cache

        # the posting map feeds three consumers (hot set, pair expand —
        # and the hot set again under each size join); persist it so the
        # groupBy-shingle shuffle runs ONCE (same working-set contract
        # as _shingled_cached; bounded via swap_cache).
        posts = swap_cache(
            "dedup.jaccard.posts", posts,
            storage_level=StorageLevel.MEMORY_AND_DISK,
        )
        # hot set as a broadcast 1-row array (usually empty): sizes use
        # array_except so the denominator shrinks consistently with the
        # dropped intersections — Jaccard over the filtered vocabulary.
        hot = posts.where(F.size("_ids") > max_df).agg(
            F.collect_list("shingle").alias("_hot")
        )
        # persisted: the filtered-size map (array_except over every
        # doc's shingle set) feeds both join sides — one row per doc,
        # computed once.
        sizes = swap_cache(
            "dedup.jaccard.sizes",
            s.crossJoin(F.broadcast(hot)).select(
                "_id", F.size(F.array_except("_sh", "_hot")).alias("_n")
            ),
            storage_level=StorageLevel.MEMORY_AND_DISK,
        )
        posts = posts.where(F.size("_ids") <= max_df)
    else:
        sizes = s.select("_id", F.size("_sh").alias("_n"))
    # pair expansion as two chained codegen'd Generates instead of one
    # interpreted nested-lambda flatten (the _co_order_edges r18
    # rewrite; same pair multiset — slice is 1-based, so i+2 starts
    # just past the 0-based position i)
    inter = (
        posts.where(F.size("_ids") >= 2)
        .select(F.posexplode("_ids").alias("_i", "id_a"), F.col("_ids"))
        .select(
            "id_a",
            F.explode(
                F.expr("slice(_ids, _i + 2, size(_ids) - _i - 1)")
            ).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """Per-doc MinHash signature: k independent min-hashes of the
    shingle set, each ``xxhash64(md5₆₀(shingle), seed)`` over portable
    shingle ids (same family as the registered LSH query so signatures
    compose with its oracle)."""
    return _signatures_from_shingled(
        _shingled(df, id_col, text_col, n),
        num_hashes,
        out_id=id_col,
        portable_ids=True,
    )


def _signatures_from_shingled(
    s: DataFrame,
    num_hashes: int,
    out_id: str = "_id",
    portable_ids: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature via explode → codegen'd k-column MIN
    aggregate. Two prior formulations both lost: the r-early explode →
    groupBy(_id, shingle) form shuffled the whole exploded index, and
    the zero-shuffle per-row fold (``array_min(transform(_sh, sh ->
    xxhash64(sh, k)))``) kept everything map-side but ran the 64 ×
    |shingles| hash ops as INTERPRETED lambda calls — the simhash
    lesson (r18): higher-order functions are outside whole-stage
    codegen. This form explodes once and takes the k mins as plain
    aggregate expressions — all codegen — and the partial (map-side)
    aggregate collapses the exploded stream to |docs| rows BEFORE the
    exchange, so the shuffle is |docs| × k longs, never the token
    footprint. Docs with no shingles produce no signature (no rows to
    group — as before).

    ``portable_ids=True`` (the string-shingle path): each exploded
    shingle maps through the portable 60-bit md5 id
    (functions/exprs.py::portable_str_id — bit-equal in Spark and
    DuckDB, the r18 oracle-promotion bridge) as a plain codegen'd
    column expression before hashing; the hash family becomes
    hashLong(md5₆₀(s)) — equally uniform (minhash needs only
    exchangeable uniform hashes). False = the caller's elements hash
    directly (the collusion leg's long arrays)."""
    from ..functions.exprs import portable_str_id

    ex = s.select("_id", F.explode("_sh").alias("_e0")).select(
        "_id",
        (portable_str_id(F.col("_e0")) if portable_ids else F.col("_e0")).alias(
            "_e"
        ),
    )
    mins = [
        F.min(F.xxhash64(F.col("_e"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return (
        ex.groupBy("_id")
        .agg(*mins)
        .select(
            F.col("_id").alias(out_id),
            F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"),
        )
    )


def _lsh_buckets(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(_id, band, bucket) membership rows from MinHash signatures —
    one xxhash64 over each band's signature slice."""
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _drop_hot_shingles(s: DataFrame, max_shingle_df: int) -> DataFrame:
    """Remove shingles whose document frequency exceeds
    ``max_shingle_df`` from every document's shingle set — the Zipf
    head is a small broadcastable list (the ngram_jaccard hot-shingle
    discipline), so this is one keyed count plus a map-side
    array_except."""
    hot = (
        s.select(F.explode("_sh").alias("_g"))
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > max_shingle_df)
        .agg(F.collect_list("_g").alias("_hot"))
    )
    return s.crossJoin(F.broadcast(hot)).select(
        "_id", F.array_except("_sh", "_hot").alias("_sh")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs, verified with exact Jaccard.

    bands×rows = num_hashes; with 16 bands of 4 rows, a pair at
    Jaccard j collides with prob 1-(1-j⁴)¹⁶ (≈0.99 at j=0.7). The
    exact-Jaccard verify join gives precision 1 — output only contains
    true ≥threshold pairs; LSH only bounds recall. At 100 TB only
    same-bucket candidates shuffle, never all pairs.

    Two OPTIONAL low-entropy-corpus safeguards (VERDICT r10: the sf3
    scaling run measured ~n² PAIR OUTPUT on a 31-word-vocab corpus —
    the banding was fine, the true-pair density wasn't; a real 100 TB
    run on boilerplate-heavy data hits the same wall). Both default
    off, so default output is unchanged:

    * ``max_bucket_size`` — per-(band,bucket) candidate ceiling: only
      the ``max_bucket_size`` smallest doc ids in a bucket generate
      pairs (deterministic truncation; a size-m bucket emits
      C(cap,2) instead of C(m,2) candidates). Bounds candidate AND
      true-pair output; costs recall only on pairs whose every shared
      band is oversubscribed. Audit what was dropped with
      :func:`minhash_bucket_report`.
    * ``max_shingle_df`` — document-frequency ceiling on shingles:
      shingles appearing in more than this many docs are removed from
      every shingle set before signatures AND exact verify (Jaccard is
      then over the reduced space — boilerplate stops gluing unrelated
      docs into one bucket). The standard stop-shingle practice.
    """
    rows_per_band = num_hashes // bands
    s = _shingled_cached(df, id_col, text_col, n)
    if max_shingle_df is not None:
        s = _drop_hot_shingles(s, max_shingle_df)
    sig = _signatures_from_shingled(s, num_hashes, portable_ids=True)
    buckets = _lsh_buckets(sig, bands, rows_per_band)
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bucket").orderBy("_id")
        buckets = (
            buckets.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    # the bucket self-join consumes the signature subtree (explode →
    # k-min-agg → band hash) TWICE and exchange reuse does not fire
    # across the alias pair (r18 plan audit on the collusion twin) —
    # one bounded persist of the small (_id, band, bucket) rows
    # computes signatures once.
    from ..cache import plan_key, swap_cache

    # keyed on the BUCKETS plan, not the shingled input (ADVICE r18):
    # same-corpus calls with different bands/num_hashes/max_bucket_size
    # must get distinct slots, not mutually evict one shared slot.
    buckets = swap_cache(plan_key("dedup.minhash_buckets", buckets), buckets)
    a = buckets.alias("a")
    b = buckets.alias("b")
    candidates = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    # Exact-Jaccard verify on candidates ONLY (array_intersect per
    # candidate pair) — never the full inverted-index self-join; that's
    # the entire point of LSH at scale.
    sh_a = s.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sh_b = s.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    return (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("n_common", inter)
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (
                F.size("sh_a").cast("long")
                + F.size("sh_b").cast("long")
                - F.col("n_common")
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_bucket_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """The EXPLICIT truncation report companion to
    :func:`minhash_near_dup_pairs` run with the same parameters: one
    row per (band, bucket) with ``n_docs``, ``truncated`` (would the
    ``max_bucket_size`` ceiling bite), ``n_docs_dropped`` and
    ``n_pairs_dropped`` (C(m,2) − C(cap,2)). A silent cap reads as
    "covered everything" when it didn't — run this next to any capped
    dedup pass and publish the totals. One keyed count over the bucket
    membership rows; no pair expansion."""
    rows_per_band = num_hashes // bands
    s = _shingled_cached(df, id_col, text_col, n)
    if max_shingle_df is not None:
        s = _drop_hot_shingles(s, max_shingle_df)
    sig = _signatures_from_shingled(s, num_hashes, portable_ids=True)
    counts = (
        _lsh_buckets(sig, bands, rows_per_band)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    cap = F.lit(max_bucket_size).cast("long") if max_bucket_size is not None else None
    if cap is None:
        return counts.select(
            "band",
            "bucket",
            "n_docs",
            F.lit(False).alias("truncated"),
            F.lit(0).cast("long").alias("n_docs_dropped"),
            F.lit(0).cast("long").alias("n_pairs_dropped"),
        )
    kept = F.least(F.col("n_docs"), cap)
    pairs = lambda m: (m * (m - F.lit(1).cast("long"))) / F.lit(2)  # noqa: E731
    return counts.select(
        "band",
        "bucket",
        "n_docs",
        (F.col("n_docs") > cap).alias("truncated"),
        F.greatest(F.col("n_docs") - cap, F.lit(0).cast("long")).alias(
            "n_docs_dropped"
        ),
        (pairs(F.col("n_docs")) - pairs(kept)).cast("long").alias(
            "n_pairs_dropped"
        ),
    )


def token_hashes_expr(text_col: str = "text"):
    """Per-token 64-bit hash array: ``xxhash64(md5₆₀(token))`` over the
    whitespace token stream (multiplicity preserved — SimHash weights
    by occurrence). The md5-prefix id (functions/exprs.py::
    portable_str_id) makes the stream bit-reproducible in DuckDB, so
    the SimHash pipeline carries a full value oracle (r18 promotion);
    hashing each token ONCE here also removes the old 64×-per-bit
    rehash from the majority fold."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    return F.expr(
        f"transform({toks}, t -> "
        f"xxhash64(CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)))"
    )


def simhash_from_hashes(hash_col: str = "_th", bits: int = 64):
    """64-bit SimHash from a precomputed token-hash array: bitwise
    majority, folded as a zero-shuffle per-row expression. For each
    bit, count tokens with the bit set minus tokens without; bit in
    result = 1 iff the sum is positive (ties → 0, incl. the empty
    doc). NOTE (r18): this nested-lambda fold runs INTERPRETED — 64 ×
    |tokens| ops per row — so the hot path
    (``simhash_near_dup_pairs``) uses the exploded codegen'd
    aggregate (:func:`_simhash_signatures_exploded`, identical
    values) instead; this expression form remains for single-pass /
    no-shuffle contexts where the array is short."""
    return F.expr(
        f"""
        aggregate(
          sequence(0, {bits - 1}),
          0L,
          (acc, bit) -> acc | IF(
            aggregate({hash_col}, 0L,
              (s, h) -> s + IF(((h >> bit) & 1L) = 1L, 1L, -1L)) > 0L,
            shiftleft(1L, bit), 0L)
        )
        """
    )


def simhash_expr(text_col: str = "text", bits: int = 64):
    """One-shot convenience composition of :func:`token_hashes_expr`
    and :func:`simhash_from_hashes` (the token hashes inline, so the
    optimizer may recompute them per bit — hot paths use the exploded
    codegen'd aggregate in ``simhash_near_dup_pairs`` instead; see
    the r18 note on :func:`simhash_from_hashes`)."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    hashes = (
        f"transform({toks}, t -> "
        f"xxhash64(CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)))"
    )
    return F.expr(
        f"""
        aggregate(
          sequence(0, {bits - 1}),
          0L,
          (acc, bit) -> acc | IF(
            aggregate({hashes}, 0L,
              (s, h) -> s + IF(((h >> bit) & 1L) = 1L, 1L, -1L)) > 0L,
            shiftleft(1L, bit), 0L)
        )
        """
    )


def _simhash_signatures_exploded(base: DataFrame, text_col: str) -> DataFrame:
    """(_id, simhash) via explode → codegen'd hash-aggregate instead
    of the nested-lambda fold: higher-order lambdas (``aggregate`` /
    ``transform``) run INTERPRETED per element, and the 64-bit
    majority fold costs 64 × |tokens| interpreted ops per doc — 24 s
    for 5 000 sf0.1 docs when the r18 scaling run first timed it.
    Exploding the token-hash stream and summing 64 bit-columns keeps
    every op inside whole-stage codegen (~60× less wall) at the price
    of ONE |docs|-row map-side-combined shuffle — the right trade at
    every scale (the partial aggregate collapses the exploded stream
    to |docs| rows before the exchange). Zero-token docs re-enter via
    the left join with signature 0, matching the fold's empty-array
    semantics and the DuckDB twin's COALESCE."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    # explode FIRST, hash after: the md5→conv→xxhash64 chain is then a
    # plain column expression over the exploded rows (codegen'd), not
    # a per-element transform lambda (interpreted) — only the cheap
    # once-per-doc split/filter stays in lambda land
    ex = base.select("_id", F.explode(F.expr(toks)).alias("_t")).select(
        "_id",
        F.xxhash64(
            F.conv(F.substring(F.md5("_t"), 1, 15), 16, 10).cast("long")
        ).alias("_h"),
    )
    bit_sums = [
        F.sum(
            (
                F.shiftright("_h", b).bitwiseAND(F.lit(1)).cast("long")
                * F.lit(2)
                - F.lit(1)
            )
        ).alias(f"_b{b}")
        for b in range(64)
    ]
    per = ex.groupBy("_id").agg(*bit_sums)
    assemble = None
    for b in range(64):
        # bit 63 is the sign bit: 1<<63 overflows a signed long, so it
        # enters as LONG_MIN (same bit pattern the old shiftleft fold
        # wrapped to)
        bit_val = (1 << b) if b < 63 else -(1 << 63)
        term = F.when(F.col(f"_b{b}") > 0, F.lit(bit_val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        assemble = term if assemble is None else assemble.bitwiseOR(term)
    sigs = per.select("_id", assemble.alias("simhash"))
    return base.select("_id").join(sigs, "_id", "left").select(
        "_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    chunks — any pair within Hamming distance 3 shares ≥1 exact chunk
    (pigeonhole), so band-equality joins generate all candidates; then
    filter by true Hamming distance."""
    from ..sources.readers import ensure_min_partitions

    width = 64 // bands
    base = ensure_min_partitions(df.select(F.col(id_col).alias("_id"), F.col(text_col)))
    sig = _simhash_signatures_exploded(base, text_col)
    chunks = sig.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    # persist once: the band self-join would otherwise run the whole
    # simhash majority fold twice (alias pair defeats exchange reuse)
    from ..cache import plan_key, swap_cache

    # keyed on the CHUNKS plan (ADVICE r18): bands/width variants over
    # one corpus get distinct slots instead of mutually evicting.
    chunks = swap_cache(plan_key("dedup.simhash_chunks", chunks), chunks)
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(b, ["band", "chunk"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )

def embedding_cosine_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, cos ≥
    threshold).

    Vectors are L2-normalized once in a projection, so the pair score is
    a plain dot product. The O(n²) self-join is the exactness baseline
    (and the verification oracle for the LSH variant); at corpus scale
    use :func:`embedding_lsh_dup_pairs`. Scores round to 6 decimals for
    cross-engine reproducibility (same convention as similarity.py).
    """
    from ..sources.readers import ensure_min_partitions
    from .similarity import _dot, _norm_sq

    v = ensure_min_partitions(
        vectors.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
    )
    v = v.select(
        "_id",
        F.transform("_v", lambda x: x / F.sqrt(_norm_sq(F.col("_v")))).alias("_u"),
    )
    a = v.select(F.col("_id").alias("id_a"), F.col("_u").alias("u_a"))
    b = v.select(F.col("_id").alias("id_b"), F.col("_u").alias("u_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(_dot(F.col("u_a"), F.col("u_b")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_lsh_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Sign-LSH embedding near-dup pairs: candidates from same-bucket
    collisions across T hash tables, exact cosine rerank, threshold.

    Precision is exact (every output pair is re-scored); LSH only bounds
    recall: a pair at angle θ collides with prob 1-(1-(1-θ/π)^b)^T. At
    100 TB only same-(table,bucket) rows meet in the join — the corpus
    never self-joins in full.
    """
    from ..sources.readers import ensure_min_partitions
    from .similarity import _dot, _norm_sq, hyperplane_tables_df, with_lsh_buckets

    tables_df = hyperplane_tables_df(
        vectors.sparkSession, dim, n_planes, n_tables, seed
    )
    v = ensure_min_partitions(
        vectors.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
    )
    v = v.select(
        "_id",
        F.transform("_v", lambda x: x / F.sqrt(_norm_sq(F.col("_v")))).alias("_u"),
    )
    from ..cache import plan_key, swap_cache

    # persist once: the (tbl, bucket) self-join would otherwise
    # normalize + hyperplane-hash the corpus twice (alias pair defeats
    # exchange reuse); v is persisted too — the exact-cosine rerank
    # re-reads the unit vectors per candidate side.
    v = swap_cache(plan_key("dedup.sign_lsh_units", v), v)
    # keyed on the BUCKETED plan (ADVICE r18): the hyperplane tables
    # (n_planes/n_tables/seed) are part of the fingerprint, so
    # parameter variants over one corpus get distinct slots.
    bucketed_plan = with_lsh_buckets(v, "_id", "_u", tables_df)
    bucketed = swap_cache(
        plan_key("dedup.sign_lsh_buckets", bucketed_plan), bucketed_plan
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    candidates = (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    ua = v.select(F.col("_id").alias("id_a"), F.col("_u").alias("u_a"))
    ub = v.select(F.col("_id").alias("id_b"), F.col("_u").alias("u_b"))
    return (
        candidates.join(ua, "id_a")
        .join(ub, "id_b")
        .withColumn("cos_sim", F.round(_dot(F.col("u_a"), F.col("u_b")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 10,
) -> DataFrame:
    """C4-style global line deduplication: every exact line that occurs
    more than once in the corpus is kept only at its FIRST occurrence
    (lowest ``(doc_id, position)``) and removed everywhere else;
    documents are reassembled with their surviving lines in original
    order. Returns ``(doc_id, text, n_lines, n_kept)`` for every input
    document (a fully-deduplicated document keeps the row with empty
    text — the caller decides whether to drop it). NULL text is treated
    as the empty string (one empty line), so no input row is dropped.

    The standard web-corpus cleanup (C4 / RefinedWeb remove repeated
    boilerplate lines this way). Scale shape — exactly TWO shuffles of
    the exploded line table:

    1. first-occurrence selection is ONE window over a line-hash
       partition key (``row_number() == 1``), not a groupBy-min plus a
       join back (which would shuffle the lines twice). Lines shuffle
       as 64-hex md5 keys (+ position ints), never dragging long line
       text through the exchange twice.
    2. reassembly is one groupBy(doc) with an in-partition
       ``array_sort`` — no global sort.

    ``n_lines`` is computed shuffle-free on the UN-exploded documents
    (``size(split(text))``), so the exploded line table is never
    aggregated a third time; the final doc-keyed join is against the
    (much smaller) per-document frames only.

    Short lines (< ``min_chars`` chars: blanks, separators, "Home")
    are structural, not boilerplate-duplication signal — they are
    exempted by giving each occurrence a UNIQUE key, which also kills
    the hot-partition problem (the empty line occurring 10⁹ times would
    otherwise pile into one window partition).
    """
    from pyspark.sql import Window as W

    lines = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("_pos", "_line"),
    )
    keyed = lines.withColumn(
        "_k",
        F.when(
            F.length("_line") < min_chars,
            F.concat(F.lit("u:"), F.col("_doc"), F.lit(":"), F.col("_pos")),
        ).otherwise(F.md5(F.col("_line"))),
    )
    w = W.partitionBy("_k").orderBy("_doc", "_pos")
    kept = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_doc", "_pos", "_line")
    )
    rebuilt = kept.groupBy("_doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("_new_text"),
    )
    orig = lines.groupBy("_doc").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        orig.join(rebuilt, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce("_new_text", F.lit("")).alias(text_col),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def exact_substring_dup(
    docs: DataFrame,
    min_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring duplication profile, the Spark-first re-expression
    of suffix-array training-data dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): a token span is
    duplicated iff its ``min_len``-token gram occurs ≥2 times anywhere in
    the corpus (including twice inside one document). The suffix array's
    "repeated substring of length ≥ L" test is exactly "some L-gram of
    the substring is globally repeated", so per-document L-gram
    duplication counts + the longest CONSECUTIVE run of duplicated gram
    starts recover the signals the suffix-array pass feeds a trimmer:
    how much of the doc is boilerplate, and how long its longest cloned
    span is (run of r grams ⇒ repeated substring of r+L−1 tokens).

    Emits one row per document: ``n_grams`` (gram positions),
    ``n_dup_grams`` (positions whose gram is globally repeated),
    ``dup_fraction`` (their ratio; NULL when the doc has < L tokens) and
    ``max_dup_run`` (longest consecutive duplicated-gram run, in grams).

    Scale shape: grams are built map-side from per-row token arrays
    (sequence → slice → concat_ws, zero shuffle) and travel as md5
    digests — 32 bytes regardless of L. One shuffle keys (digest) for
    the global occurrence count, re-joined to the gram stream as a
    posting-list join WITH a hot-key split: the ``hot_h`` most frequent
    digests (a boilerplate line re-pasted millions of times) join
    broadcast-side and never shuffle — the same discipline as
    ``ngram_jaccard_pairs``' hot-shingle split and the fluency
    scorers' Zipf heads. The remaining shuffles all key by ``id_col``
    (per-doc rollup + gaps-and-islands run detection on the SAME key,
    so AQE coalesces them onto one exchange). Never materializes a
    suffix array: the corpus-wide sort the suffix array needs is
    replaced by the digest aggregation, which is what a 1000-executor
    cluster can actually do on 100 TB.
    """
    from .text import tokens

    L = int(min_len)
    t = docs.select(
        F.col(id_col).alias("_id"), tokens(F.lower(F.col(text_col))).alias("_toks")
    )
    # map-only gram stream: (id, pos, digest), pos 1-based
    grams = t.select(
        "_id",
        F.posexplode(
            # NB: Spark's sequence(1, 0) counts DOWN to [1, 0] — short
            # docs need the explicit empty-array guard
            F.expr(
                f"if(size(_toks) >= {L}, "
                f"transform(sequence(1, size(_toks) - {L - 1}), "
                f"p -> md5(concat_ws(' ', slice(_toks, p, {L})))), "
                f"array())"
            )
        ).alias("_p0", "digest"),
    ).select("_id", (F.col("_p0") + 1).alias("pos"), "digest")
    counts = grams.groupBy("digest").agg(F.count(F.lit(1)).alias("_total"))
    # hot-key split: the most frequent digests join broadcast-side
    hot_h = 256
    hot = counts.orderBy(F.desc("_total"), F.asc("digest")).limit(hot_h)
    flagged_hot = grams.join(F.broadcast(hot), "digest").select(
        "_id", "pos", (F.col("_total") >= 2).alias("dup")
    )
    cold_grams = grams.join(
        F.broadcast(hot.select("digest")), "digest", "left_anti"
    )
    cold_counts = counts.join(
        F.broadcast(hot.select("digest")), "digest", "left_anti"
    )
    flagged = flagged_hot.unionByName(
        cold_grams.join(cold_counts, "digest").select(
            "_id", "pos", (F.col("_total") >= 2).alias("dup")
        )
    )
    per_doc = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0)).cast("long").alias("n_dup_grams"),
    )
    # gaps-and-islands over duplicated positions: same shuffle key (_id)
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("_id").orderBy("pos"))
    runs = (
        flagged.where("dup")
        .withColumn("_grp", F.col("pos") - rn)
        .groupBy("_id", "_grp")
        .agg(F.count(F.lit(1)).alias("_run"))
        .groupBy("_id")
        .agg(F.max("_run").cast("long").alias("max_dup_run"))
    )
    return (
        t.select("_id")
        .join(per_doc, "_id", "left")
        .join(runs, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            (
                F.col("n_dup_grams").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("dup_fraction"),
            F.coalesce("max_dup_run", F.lit(0)).cast("long").alias("max_dup_run"),
        )
    )


def snapshot_digest_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Distinct content digests of a frozen corpus snapshot — the index
    an incremental-ingest pipeline materializes ONCE per snapshot so
    later shards dedup against it without touching the snapshot bodies.

    Production layout: write this frame bucketed by ``content_md5``
    (``writers`` + ``bucketBy``) — then every subsequent
    :func:`incremental_dedup` anti-join reads it shuffle-free and only
    the (small) delta shuffles into the index's bucketing. The index
    carries 16-byte digests, not documents: a 10-billion-doc snapshot
    indexes in ~300 GB — scan-cheap, and never re-derived."""
    t = F.col(text_col)
    if normalize:
        t = F.regexp_replace(F.lower(t), r"\s+", " ")
    return corpus.select(F.md5(t).alias("content_md5")).distinct()


def incremental_dedup(
    delta: DataFrame,
    snapshot_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    broadcast_index: bool = False,
) -> DataFrame:
    """Cross-snapshot incremental dedup: classify every document of a
    NEW shard against a frozen prior corpus — without re-shuffling the
    old corpus (VERDICT r7 item 5; the standard nightly-ingest shape:
    the 100 TB snapshot is processed once, each day's delta dedups
    against its digest index).

    Returns the delta with a ``status`` column:

    * ``dup_snapshot`` — content already present in the snapshot,
    * ``dup_delta``    — first seen inside this shard under a smaller id
      (intra-shard duplicate, snapshot-novel),
    * ``kept``         — novel content, the shard's canonical copy.

    Scale shape: the snapshot side is the PRE-BUILT digest index
    (:func:`snapshot_digest_index`) — 16-byte digests, no bodies. With
    the index stored bucketed by digest the left join needs no
    snapshot-side shuffle (tests/test_plan_shapes.py pins the
    bucketed-join-no-exchange property for this engine); only the delta
    — by construction a small fraction of the corpus — shuffles. With
    ``broadcast_index=True`` (right-sized indexes, e.g. one shard
    family) even that shuffle disappears: the join and the intra-delta
    window are the only exchanges, both keyed on uniform md5 digests so
    they cannot skew. Spark's runtime bloom-filter join
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) supplies the
    probabilistic pre-filter automatically when the index is selective,
    so no hand-rolled bloom is needed.
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    if normalize:
        t = F.regexp_replace(F.lower(t), r"\s+", " ")
    d = delta.withColumn("content_md5", F.md5(t))
    idx = snapshot_index.select("content_md5").distinct().withColumn(
        "_in_snapshot", F.lit(True)
    )
    if broadcast_index:
        idx = F.broadcast(idx)
    joined = d.join(idx, "content_md5", "left")
    # intra-shard canonical pick: smallest id per digest. One window
    # shuffle on the digest (uniform; cannot skew), restricted to the
    # snapshot-novel rows' digests only after the join-side filter below.
    w = Window.partitionBy("content_md5")
    joined = joined.withColumn("_min_id", F.min(id_col).over(w))
    return joined.select(
        *[F.col(c) for c in delta.columns],
        "content_md5",
        F.when(F.col("_in_snapshot"), "dup_snapshot")
        .when(F.col(id_col) != F.col("_min_id"), "dup_delta")
        .otherwise("kept")
        .alias("status"),
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public method): cluster normalized embeddings with
    k-means, then inside each cluster drop every item whose cosine
    similarity to a LOWER-id cluster-mate reaches ``threshold``. The
    keep-rule is deterministic (min id wins) and locally checkable, so
    the pytest can verify it against brute force exactly.

    Returns (id, cell, is_kept, max_sim_lower) — ``max_sim_lower`` is
    the best similarity to any LOWER-id cluster-mate (null for the
    cluster's first item), the score the threshold applies to. Note the
    rule is one-shot, not chained: an item is judged against all
    lower-id mates, kept or not — deterministic and locally checkable,
    which is what makes exact differential testing possible.

    Scale shape: the quadratic pairwise work is confined WITHIN cells —
    Σ|cell|² instead of |corpus|² — which is the paper's entire point;
    cells are data-adaptive (k-means via MLlib, centroids broadcast)
    and at 100 TB the corpus is stored partitioned by cell so each
    cell's self-join is partition-local. Rows-only correctness (k-means
    cell boundaries are engine-specific); the keep-rule itself is
    pinned by differential pytest."""
    import numpy as np  # noqa: F401 — parity with similarity.py deps
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    def _norm_sq(col):
        return F.aggregate(
            col, F.lit(0.0), lambda acc, x: acc + x * x
        )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: x / F.sqrt(_norm_sq(F.col(vec_col).cast("array<double>"))),
        ).alias("_u"),
    )
    with_vec = v.withColumn("_fv", array_to_vector(F.col("_u")))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="_fv", predictionCol="cell")
    model = km.fit(with_vec)
    assigned = model.transform(with_vec).select("_id", "_u", "cell")

    from ..cache import swap_cache

    from ..cache import plan_key

    assigned = swap_cache(plan_key("semantic_dedup.assigned", assigned), assigned)
    a, b = assigned.alias("a"), assigned.alias("b")
    pair_best = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("b._id").alias("_id"),
            _dot(F.col("a._u"), F.col("b._u")).alias("_sim"),
        )
        .groupBy("_id")
        .agg(F.max("_sim").alias("max_sim_lower"))
    )
    return (
        assigned.join(pair_best, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cell",
            (
                F.col("max_sim_lower").isNull()
                | (F.col("max_sim_lower") < F.lit(threshold))
            ).alias("is_kept"),
            "max_sim_lower",
        )
    )
