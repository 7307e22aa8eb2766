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
* EVENTS VALUE-DOMAIN SCALING (VERDICT r17 item 4) — each events
  copy's ``value`` is shifted by ``copy * (max_cents + 1)`` cents
  (exact integer-cents arithmetic, so no float drift into the cents
  keys), making the K copies' cents domains DISJOINT: the amount
  domain now grows with SF exactly like the key domains, so
  amount-keyed screens (cross-entity duplicates, duplicate charges)
  stay selective at scale instead of saturating every (cents,
  window) cell — the r17e data note. Each copy keeps the base
  table's exact value distribution internally (more of the same, not
  denser); only screens keyed on ABSOLUTE amounts across copies see
  the difference, which is the point. Benford-family screens see a
  shifted aggregate digit mix at sf≥1 — their scaling rows measure
  group-by cost (digit-domain size is fixed at 9/90 groups), so the
  curves stay comparable.
* PLANTED COLLUSIVE COHORT (VERDICT r13 item 7) — twelve synthetic
  customers in six pairs appended to customer/orders/lineitem, with
  engineered supplier-set Jaccards: three pairs at J = 1, two at
  J = 0.6 (share 15 of 20+5-own), one NEGATIVE control at J = 1/3
  (below the screens' ½ threshold). The uniform-degree scaled corpus
  has zero true ½-Jaccard pairs, so without the plant the LSH
  collusion leg's sf1/sf3 curve measures cost only; the plant makes
  it carry RECALL against the capped exact screen. Ground truth is
  emitted in the meta JSON (``planted_pairs``) so the scaling run
  asserts recall without recomputing. ~12 customers / 12 orders /
  ~230 lineitems — invisible in any cost curve.

Deterministic (seed 42; plant seed 43). Usage:

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

#: value columns shifted per copy in exact cents (VERDICT r17 item 4):
#: {table: column} — stride = max(round(col*100)) + 1, per table.
VALUE_SHIFT = {"events": "value"}


def _value_stride_cents(base_dir: str, table: str, col: str) -> int:
    arr = pq.read_table(
        os.path.join(base_dir, f"{table}.parquet"), columns=[col]
    )[col]
    cents = pa.compute.round(
        pa.compute.multiply(pa.compute.cast(arr, pa.float64()), 100.0)
    )
    return int(pa.compute.max(cents).as_py()) + 1


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


def _scale_table(
    base_dir: str,
    out_dir: str,
    table: str,
    k: int,
    strides,
    extra: pa.Table | None = None,
) -> int:
    src = pq.read_table(os.path.join(base_dir, f"{table}.parquet"))
    vshift_col = VALUE_SHIFT.get(table)
    vstride = (
        _value_stride_cents(base_dir, table, vshift_col) if vshift_col else 0
    )
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
            elif name == vshift_col:
                # exact integer-cents shift: round-trip through cents
                # so copy i's cents are exactly base_cents + i*stride
                # (a float add of i*stride/100 would drift the keys)
                cents = pa.compute.round(
                    pa.compute.multiply(pa.compute.cast(col, pa.float64()), 100.0)
                )
                shifted = pa.compute.add(
                    pa.compute.cast(cents, pa.int64()), i * vstride
                )
                cols.append(
                    pa.compute.cast(
                        pa.compute.divide(
                            pa.compute.cast(shifted, pa.float64()), 100.0
                        ),
                        col.type,
                    )
                )
            else:
                cols.append(col)
        copies.append(pa.table(dict(zip(src.column_names, cols))))
    if extra is not None:
        copies.append(extra.select(src.column_names).cast(src.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(out_dir, f"{table}.parquet"))
    return out.num_rows


def _replace(tmpl: pa.Table, values: dict[str, list[int]]) -> pa.Table:
    """Template rows with key columns swapped (types preserved)."""
    cols = {}
    for name in tmpl.column_names:
        if name in values:
            cols[name] = pa.compute.cast(
                pa.array(values[name], pa.int64()), tmpl[name].type
            )
        else:
            cols[name] = tmpl[name]
    return pa.table(cols)


def _seq_per_key(keys: list[int]) -> list[int]:
    """1..n running sequence within each key's run (keys arrive
    grouped by construction)."""
    out, counts = [], {}
    for k in keys:
        counts[k] = counts.get(k, 0) + 1
        out.append(counts[k])
    return out


def _collusion_extras(base_dir: str, k: int, strides, seed: int = 43):
    """The planted collusive cohort: six customer pairs with engineered
    supplier-set Jaccards (3×J=1, 2×J=0.6, 1×J=1/3 negative control),
    each customer one order whose lineitems cover its supplier set
    exactly once. Planted keys sit ABOVE every copy's range (base =
    k·stride), so they collide with nothing; suppliers/parts are
    copy-0 ids, so referential joins resolve. Returns ({table: extra
    rows}, ground-truth pair list)."""
    rng = np.random.default_rng(seed)
    sup = pq.read_table(
        os.path.join(base_dir, "supplier.parquet"), columns=["s_suppkey"]
    )["s_suppkey"].to_pylist()
    rng.shuffle(sup)
    base_c = k * strides["c_custkey"]
    base_o = k * strides["o_orderkey"]
    # (shared, own_a, own_b) full shapes and ratio-preserving minimum
    # shapes for tiny supplier populations (sf0.001 has ~10 suppliers)
    templates = (
        [((20, 0, 0), (2, 0, 0))] * 3          # J = 1
        + [((15, 5, 5), (3, 1, 1))] * 2        # J = 0.6
        + [((10, 10, 10), (2, 2, 2))]          # J = 1/3 — below threshold
    )
    # pools are pairwise DISJOINT (taken off one shuffled deck), so no
    # accidental cross-GROUP pair can reach the threshold; overlap with
    # ORGANIC customers is possible and fine — the screens' ground
    # truth here is only the planted pairs themselves
    groups, idx = [], 0
    for full, mn in templates:
        for shape in (full, mn):
            need = sum(shape)
            if idx + need <= len(sup):
                groups.append((shape, sup[idx : idx + need]))
                idx += need
                break

    cust_ids, order_rows, li_rows, truth = [], [], [], []
    next_c, next_o = base_c + 1, base_o + 1
    for (shared, own_a, own_b), pool in groups:
        s_shared = list(pool[:shared])
        s_a = s_shared + list(pool[shared : shared + own_a])
        s_b = s_shared + list(pool[shared + own_a :])
        a, b = next_c, next_c + 1
        next_c += 2
        for cust, sset in ((a, s_a), (b, s_b)):
            cust_ids.append(cust)
            okey = next_o
            next_o += 1
            order_rows.append((okey, cust))
            li_rows.extend((okey, int(s)) for s in sset)
        union = len(s_a) + len(s_b) - shared
        truth.append(
            {
                "entity_a": a,
                "entity_b": b,
                "n_shared": shared,
                "jaccard": shared / union,
            }
        )

    cust_t = pq.read_table(os.path.join(base_dir, "customer.parquet")).slice(
        0, len(cust_ids)
    )
    orders_t = pq.read_table(os.path.join(base_dir, "orders.parquet")).slice(
        0, len(order_rows)
    )
    li_t = pq.read_table(os.path.join(base_dir, "lineitem.parquet")).slice(
        0, len(li_rows)
    )
    extras = {
        "customer": _replace(cust_t, {"c_custkey": cust_ids}),
        "orders": _replace(
            orders_t,
            {
                "o_orderkey": [o for o, _ in order_rows],
                "o_custkey": [c for _, c in order_rows],
            },
        ),
        "lineitem": _replace(
            li_t,
            {
                "l_orderkey": [o for o, _ in li_rows],
                "l_suppkey": [s for _, s in li_rows],
                # templated rows inherit repeating l_linenumber values;
                # overwrite with a 1..n sequence per planted order so
                # the TPC-H (l_orderkey, l_linenumber) primary key
                # holds on the scaled corpus (ADVICE r14)
                "l_linenumber": _seq_per_key([o for o, _ in li_rows]),
            },
        ),
    }
    return extras, truth


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
    extras, truth = _collusion_extras(base_dir, k, strides)
    planted = {t: e.num_rows for t, e in extras.items()}
    for table in KEYED:
        counts[table] = _scale_table(
            base_dir, out_dir, table, k, strides, extra=extras.get(table)
        )
    counts["documents"] = _gen_documents(base_dir, out_dir, k)
    print(
        json.dumps(
            {
                "out": out_dir,
                "k": k,
                "rows": counts,
                "planted": planted,
                "planted_pairs": truth,
            }
        )
    )


if __name__ == "__main__":
    main()
