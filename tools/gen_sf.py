"""Scale-factor extrapolation generator for the SCALING.md curve.

The driver ships sf0.001/0.01/0.1 read-only; VERDICT r9 item 2 asks
for an sf1 measurement. This produces an sf1-shaped dataset that is
SELF-SIMILAR to the driver's sf0.1 (same schemas, same value
distributions, ~10x rows) so per-query time ratios measure the
ENGINE's scaling, not a distribution shift:

* ``region``/``nation`` — fixed dimensions, copied verbatim.
* relational tables (``customer supplier part orders lineitem events
  embeddings``) — K key-offset copies of the base: every key column
  is shifted by ``copy * stride`` (stride = max(key)+1 per key
  domain) so referential joins land inside the copy and the co-order
  graph scales as K disjoint sf0.1-shaped components (the TPC-H
  scaling model: more of the same, not denser).
* ``documents`` — freshly generated from the OBSERVED sf0.1
  generator parameters (31-word vocab, uniform word-count matching
  the observed n_chars range, source = doc_id %% 20, lang sampled at
  the observed proportions, ~0.16%% forced exact duplicates), because
  key-offset text copies would create cross-copy near-duplicate
  cliques that sf0.1 does not have.

Deterministic (seed 42). Usage:

    python tools/gen_sf.py /root/testdata/sf0.1 testdata_sf1 10
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.412, 0.140, 0.151, 0.148, 0.149]

#: key columns to offset, per table: {column: stride-domain column}
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
COPY_VERBATIM = ["region", "nation"]


def _stride(base_dir: str) -> dict[str, int]:
    """max(key)+1 per key DOMAIN, read from the owning table."""
    owners = {
        "c_custkey": ("customer", "c_custkey"),
        "s_suppkey": ("supplier", "s_suppkey"),
        "p_partkey": ("part", "p_partkey"),
        "o_orderkey": ("orders", "o_orderkey"),
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
        "vec_id": ("embeddings", "vec_id"),
    }
    strides = {}
    for key, (table, col) in owners.items():
        arr = pq.read_table(
            os.path.join(base_dir, f"{table}.parquet"), columns=[col]
        )[col]
        strides[key] = int(pa.compute.max(arr).as_py()) + 1
    # foreign keys share their owner's stride
    strides["o_custkey"] = strides["c_custkey"]
    strides["l_orderkey"] = strides["o_orderkey"]
    strides["l_partkey"] = strides["p_partkey"]
    strides["l_suppkey"] = strides["s_suppkey"]
    return strides


def _scale_table(base_dir: str, out_dir: str, table: str, k: int, strides) -> int:
    src = pq.read_table(os.path.join(base_dir, f"{table}.parquet"))
    copies = []
    for i in range(k):
        cols = []
        for name in src.column_names:
            col = src[name]
            if name in KEYED.get(table, []):
                shifted = pa.compute.add(
                    pa.compute.cast(col, pa.int64()), i * strides[name]
                )
                cols.append(pa.compute.cast(shifted, col.type))
            else:
                cols.append(col)
        copies.append(pa.table(dict(zip(src.column_names, cols))))
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(out_dir, f"{table}.parquet"))
    return out.num_rows


def _gen_documents(base_dir: str, out_dir: str, k: int, seed: int = 42) -> int:
    n_base = pq.read_table(
        os.path.join(base_dir, "documents.parquet"), columns=["doc_id"]
    ).num_rows
    n = n_base * k
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    n_words = rng.integers(8, 106, size=n)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    texts = []
    for i in range(n):
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words[i])]))
    # forced exact duplicates at the observed ~0.16% rate
    for i in range(624, n, 625):
        texts[i] = texts[i - 624]
    doc_id = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_id),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array([f"src{int(d) % 20}" for d in doc_id]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    return n


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "testdata_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out_dir, exist_ok=True)
    strides = _stride(base_dir)
    counts = {}
    for table in COPY_VERBATIM:
        src = pq.read_table(os.path.join(base_dir, f"{table}.parquet"))
        pq.write_table(src, os.path.join(out_dir, f"{table}.parquet"))
        counts[table] = src.num_rows
    for table in KEYED:
        counts[table] = _scale_table(base_dir, out_dir, table, k, strides)
    counts["documents"] = _gen_documents(base_dir, out_dir, k)
    print(json.dumps({"out": out_dir, "k": k, "rows": counts}))


if __name__ == "__main__":
    main()
