"""Text-analysis operators for large-scale training-data pipelines:
token statistics, quality scoring, language-ID heuristic, document
fingerprinting.

These extend the reference's surface (BASELINE.json north star); the
reference itself has no text ops. Everything is pure Catalyst column
expressions — no Python UDFs — so they run JVM-side inside whole-stage
codegen and scale linearly with no shuffle at all (per-row maps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword regexes (lower-cased input). A real n-gram
#: language model would be a broadcast lookup table; this keeps the
#: operator self-contained and SQL-oracle-checkable.
LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|you|that|it|for)\b",
    "de": r"\b(der|die|und|das|ist|nicht|mit|ein|ich|zu)\b",
    "fr": r"\b(le|la|les|et|des|est|une|que|pour|dans)\b",
    "es": r"\b(el|los|las|que|y|en|un|es|por|con)\b",
}
#: CJK unified ideographs (BMP block) — written with literal chars so the
#: same class compiles under Java regex (Spark) and RE2 (DuckDB).
CJK_PATTERN = "[一-鿿]"


def tokens(text_col: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text_col, r"\s+"), lambda x: x != "")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document counting stats: chars, bytes, tokens, alpha/digit/
    punct chars, mean token length."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks).cast("long")
    nonspace = F.regexp_replace(t, r"\s", "")
    # one withColumns call: each withColumn re-analyzes the plan, so a
    # 7-link chain pays 7 analyses — measurable driver latency on wide
    # expression trees
    return df.withColumns(
        {
            "n_chars_calc": F.length(t).cast("long"),
            "n_bytes": F.octet_length(t).cast("long"),
            "n_tokens": n_tokens,
            "n_alpha": F.length(F.regexp_replace(t, r"[^\p{L}]", "")).cast("long"),
            "n_digit": F.length(F.regexp_replace(t, r"[^\p{N}]", "")).cast("long"),
            "n_punct": F.length(
                F.regexp_replace(t, r"[\p{L}\p{N}\s]", "")
            ).cast("long"),
            "mean_token_len": F.when(
                n_tokens > 0,
                F.length(nonspace).cast("double") / n_tokens,
            ).otherwise(F.lit(0.0)),
        }
    )


def lexical_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical-diversity profile — the vocabulary-richness
    quality signal (templated/boilerplate/spam text repeats a tiny
    vocabulary; natural prose doesn't), computed WITHOUT a logarithm so
    every engine reproduces it bitwise (the unigram_fluency discipline:
    entropy's ln differs in the last ulp across engines; Simpson's
    index is a rational function of exact integer counts):

    * n_tokens, n_types — token and distinct-token counts (BIGINT)
    * type_token_ratio — n_types / n_tokens (one pinned IEEE division)
    * hapax_frac — fraction of types occurring exactly once (dominant
      in natural text by Zipf; near zero in templated output)
    * simpson_concentration — Σc² / n² (the Gini-Simpson repeat
      probability; numerator is an exact decimal(38,0) sum of BIGINT
      squares, so no float accumulation) — high = repetitive
    * effective_vocab — n² / Σc² (inverse Simpson, 'perplexity without
      the log': the number of equally-common types that would produce
      the same concentration)

    Empty documents emit n_tokens = 0 with NULL ratios (no 0/0).

    Scale shape: explode → ONE map-side-combined aggregation on
    (doc, token) → ONE on doc. Both keys carry the doc id, so corpus-
    wide stopword skew never concentrates — per-doc hot tokens are
    absorbed by partial aggregation inside each task."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    per_tok = toks.groupBy("_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = per_tok.groupBy("_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.sum(F.col("c").cast("decimal(18,0)") * F.col("c").cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("sum_c2"),
    )
    n2 = F.col("n_tokens").cast("decimal(38,0)") * F.col("n_tokens").cast(
        "decimal(38,0)"
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_types"), F.lit(0)).cast("long").alias("n_types"),
            (F.col("n_types").cast("double") / F.col("n_tokens").cast("double")).alias(
                "type_token_ratio"
            ),
            (F.col("n_hapax").cast("double") / F.col("n_types").cast("double")).alias(
                "hapax_frac"
            ),
            (F.col("sum_c2").cast("double") / n2.cast("double")).alias(
                "simpson_concentration"
            ),
            (n2.cast("double") / F.col("sum_c2").cast("double")).alias(
                "effective_vocab"
            ),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: token-length plausibility,
    low punctuation, stopword presence (Gopher/C4-style length+symbol
    filters, reduced to a deterministic scalar formula).

    STAGED construction: the scalar counters (n_tokens, n_punct,
    stop_hits, …) are materialized as intermediate columns first and
    the score formula references the COLUMNS. Inlining everything into
    one expression re-evaluates the tokenize/regex subtrees once per
    reference — higher-order-function expressions are excluded from
    codegen common-subexpression elimination, so the single-expression
    form re-split the text ~6× per row (measured 2.2× slower at
    sf0.1). Same values, same one-projection plan shape."""
    t = F.lower(F.col(text_col))
    toks = tokens(t)
    stage = {
        "__q_n_tokens": F.size(toks).cast("long"),
        "__q_n_chars": F.length(t).cast("long"),
        "__q_n_punct": F.length(
            F.regexp_replace(t, r"[\p{L}\p{N}\s]", "")
        ).cast("long"),
        "__q_nonspace": F.length(F.regexp_replace(t, r"\s", "")).cast("long"),
        "__q_stop_hits": F.regexp_count(t, F.lit(LANG_PATTERNS["en"])).cast("long"),
    }
    n_tokens = F.col("__q_n_tokens")
    n_chars = F.col("__q_n_chars")
    mean_len = F.when(
        n_tokens > 0, F.col("__q_nonspace").cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, F.col("__q_n_punct").cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, F.col("__q_stop_hits").cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    len_component = F.when(
        (mean_len >= 3.0) & (mean_len <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))
    stop_component = F.least(stop_ratio * 10.0, F.lit(1.0))
    return (
        df.withColumns(stage)
        .withColumn(
            "quality_score",
            len_component * 0.4 + punct_component * 0.3 + stop_component * 0.3,
        )
        .drop(*stage)
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic → ``lang_guess`` plus the
    per-language evidence counts. Deterministic CASE precedence so the
    result is oracle-checkable."""
    t = F.lower(F.col(text_col))
    counts = {
        lang: F.regexp_count(t, F.lit(pat)).cast("long")
        for lang, pat in LANG_PATTERNS.items()
    }
    zh = F.regexp_count(t, F.lit(CJK_PATTERN)).cast("long")
    en, de, fr, es = counts["en"], counts["de"], counts["fr"], counts["es"]
    cols = {f"{lang}_hits": c for lang, c in counts.items()}
    cols["zh_hits"] = zh
    cols["lang_guess"] = (
        F.when(zh >= 3, "zh")
        .when((de > en) & (de > fr) & (de > es), "de")
        .when((fr > en) & (fr > es), "fr")
        .when(es > en, "es")
        .when(en > 0, "en")
        .otherwise("und")
    )
    return df.withColumns(cols)


#: Polynomial-hash parameters. Token values come from the first 8 hex
#: chars of md5 (engine-portable); the doc hash folds token values with
#: base ``FP_BASE`` mod ``FP_MOD``. Intermediates stay < 1e14 so 64-bit
#: arithmetic never overflows (DuckDB errors on BIGINT overflow).
FP_BASE = 100_003
FP_MOD = 1_000_000_007

#: Spark side: builtin base-16 ``conv`` (JVM, ~2× faster than a
#: per-char lambda fold over the hex string — measured at sf0.1). The
#: DuckDB oracles keep the equivalent list_reduce hex fold (no conv
#: there); both produce the integer value of the first 8 md5 hex chars.
_TOKEN_HASH = "cast(conv(substring(md5({tok}), 1, 8), 16, 10) as bigint)"


def fingerprint_expr(text_col: str = "text") -> Column:
    """Order-sensitive rolling document fingerprint.

    Tokenize → per-token 32-bit value (md5-hex prefix as an integer,
    identical in any engine) → polynomial fold over the token stream.
    Two docs with the same token sequence collide; any reorder/edit
    changes the value — the cheap "same content?" precheck for dedup at
    100 TB (one map pass, no shuffle).
    """
    tok_hash = _TOKEN_HASH.format(tok="t")
    return F.expr(
        f"aggregate(transform(filter(split(lower({text_col}), '\\\\s+'), x -> x != ''), "
        f"t -> {tok_hash}), 0L, (a, h) -> (a * {FP_BASE} + h) % {FP_MOD})"
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_expr(text_col))


#: GPT-2-style pretokenizer pattern, restricted to syntax shared by
#: Java regex (Spark) and RE2 (DuckDB): contractions, space-prefixed
#: letter/digit runs, punctuation runs, whitespace runs. No lookahead
#: (RE2 has none) — the \s+ branch merges trailing spaces instead.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text_col: Column) -> Column:
    """BPE-ish token count: the number of pretokenizer chunks a GPT-2
    style byte-pair tokenizer would start from — a far better proxy for
    LLM token budgets than whitespace splitting (which undercounts
    punctuation-heavy and code-like text). Pure JVM regex pass."""
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(BPE_PATTERN), F.lit(0)))


def _max_run_sorted(arr_expr: str) -> str:
    """SQL fragment: highest multiplicity of any element in an array,
    computed as the longest equal-run of the SORTED array with one
    struct-state fold — O(n log n) per row, JVM-side, no explode/shuffle.
    (The naive transform(distinct, d -> count(=d)) is O(distinct·n),
    quadratic on long documents.)"""
    return f"""
      aggregate(
        array_sort({arr_expr}),
        struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best),
        (acc, x) -> struct(
          x,
          IF(x <=> acc.prev, acc.run + 1, 1L),
          greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1L))),
        acc -> acc.best)
    """


def _ngrams(toks_expr: str, n: int) -> str:
    """SQL fragment: ALL word n-grams (with repeats, unlike the dedup
    shingler's distinct sets — repetition measurement needs multiplicity)."""
    return f"""
      filter(
        transform({toks_expr},
          (x, i) -> IF(i + {n} <= size({toks_expr}),
                       concat_ws(' ', slice({toks_expr}, i + 1, {n})), NULL)),
        s -> s IS NOT NULL)
    """


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition signals per document (Rae et al. '21
    §A1.1 "repetitious text" filters, re-expressed for whitespace
    corpora): the mass fraction of the most frequent unigram and bigram,
    and the fraction of trigram occurrences that are repeats. Pure
    column expressions — the repetition fold runs inside codegen; the
    filter stays a zero-shuffle map at any corpus size.

    Emits ``top_unigram_frac``, ``top_bigram_frac``,
    ``dup_trigram_frac`` (all 0.0 when the doc is too short to have the
    n-gram) and ``pass_repetition`` with Gopher-like thresholds
    (≤0.2 / ≤0.18 / ≤0.3). Ratios are integer-over-integer doubles, so
    they reproduce bitwise across engines.

    STAGED construction: the token/bigram/trigram ARRAYS are
    materialized as intermediate columns and the fraction expressions
    reference the columns. Textually inlining the array fragments
    re-evaluates the split ~9× per row (lambda expressions are outside
    codegen subexpression elimination) — the staged form measured 6.7×
    faster at sf0.1 with identical values.
    """
    uni = F.expr(
        f"""IF(size(__r_toks) > 0,
               CAST({_max_run_sorted('__r_toks')} AS DOUBLE) / size(__r_toks), 0.0D)"""
    )
    bi = F.expr(
        f"""IF(size(__r_bi) > 0,
               CAST({_max_run_sorted('__r_bi')} AS DOUBLE) / size(__r_bi), 0.0D)"""
    )
    tri = F.expr(
        """IF(size(__r_tri) > 0,
               CAST(size(__r_tri) - size(array_distinct(__r_tri)) AS DOUBLE)
                 / size(__r_tri), 0.0D)"""
    )
    return (
        df.withColumn(
            "__r_toks", F.expr(f"filter(split({text_col}, '\\\\s+'), x -> x != '')")
        )
        .withColumns(
            {
                "__r_bi": F.expr(_ngrams("__r_toks", 2)),
                "__r_tri": F.expr(_ngrams("__r_toks", 3)),
            }
        )
        .withColumns(
            {"top_unigram_frac": uni, "top_bigram_frac": bi, "dup_trigram_frac": tri}
        )
        .withColumn(
            "pass_repetition",
            (F.col("top_unigram_frac") <= 0.2)
            & (F.col("top_bigram_frac") <= 0.18)
            & (F.col("dup_trigram_frac") <= 0.3),
        )
        .drop("__r_toks", "__r_bi", "__r_tri")
    )


def compression_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> DataFrame:
    """Compression-ratio quality signal (Gopher/MassiveText's
    "documents that compress too well are repetitive" filter):
    ``compression_ratio`` = deflate(text) bytes / utf-8 bytes. Low
    ratio ⇒ templated/repetitive text; ~1 ⇒ high-entropy (random or
    encrypted) content — both tails are filter candidates.

    This is the engine's canonical Arrow-batched Python scoring path:
    zlib has no Catalyst/DuckDB twin, so the op runs as ``mapInPandas``
    (vectorized Arrow transfer, one Python process per partition — the
    same plumbing a model-based quality scorer uses) and is pinned by
    differential pytest instead of a SQL oracle. Zero shuffles: a pure
    per-row map that scales linearly.
    """
    import zlib
    from typing import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = [(t or "").encode("utf-8") for t in pdf[text_col]]
            # compress ONCE per document; both outputs derive from it
            comp = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(b) for b in raw],
                    "compressed_bytes": comp,
                    "compression_ratio": [
                        (c / len(b)) if b else None for b, c in zip(raw, comp)
                    ],
                }
            )

    # id type follows the input (string / int doc ids both work —
    # ADVICE r7: the schema was hard-coded `long`).
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        batches,
        schema=(
            f"{id_col} {id_type}, n_bytes long, compressed_bytes long, "
            "compression_ratio double"
        ),
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the canonicalization
    step a multilingual corpus runs before dedup/hashing, since the
    same visible text can arrive as composed or combining-sequence
    codepoints and would otherwise hash differently. Spark has no
    built-in normalizer, so this is an Arrow ``mapInPandas`` pass over
    ``unicodedata`` (stdlib; NFC is a standard, so the result is
    byte-identical to any conforming engine — the oracle uses DuckDB's
    ``nfc_normalize``). Zero shuffles: a linear per-row map, same
    plumbing as ``compression_quality``."""
    import unicodedata
    from typing import Iterator

    import pandas as pd

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    text_col: pdf[text_col],
                    "normalized": [
                        unicodedata.normalize(form, t) if t is not None else None
                        for t in pdf[text_col]
                    ],
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        batches,
        schema=f"{id_col} {id_type}, {text_col} string, normalized string",
    )


def sentences_udtf(spark):
    """Register and return the sentence-splitting Python UDTF (Spark 4
    ``pyspark.sql.functions.udtf`` — the user-defined TABLE function
    surface: one input row → N output rows via LATERAL join, the
    API-level generalization of explode for logic that needs Python).

    The split itself is a deterministic regex (terminator run + space),
    so unlike most UDTF use cases this one is SQL-reproducible — which
    is exactly why the catalog query carrying it can hold a full value
    oracle: the UDTF *mechanism* is what's under test, with the logic
    chosen to stay engine-portable. Each output row: (idx, sentence,
    n_chars).

    Scale: UDTFs run per-partition in a Python worker over Arrow
    batches — linear map, no shuffle; the lateral join preserves the
    driving table's partitioning."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="idx: bigint, sentence: string, n_chars: bigint")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            parts = [
                s for s in re.split(r"[.!?]+\s+", text) if s.strip() != ""
            ]
            for i, s in enumerate(parts):
                yield i, s, len(s)

    spark.udtf.register("split_sentences", SplitSentences)
    return SplitSentences
