"""tools/gen_sf.py (the SCALING.md dataset generator): scaled output
must be schema-identical to the base and key-disjoint per copy —
otherwise the scale curve measures a distribution shift, not the
engine."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

BASE = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfscaled"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_sf.py"), BASE, out, "3"],
        capture_output=True,
        text=True,
        check=True,
    )
    return out, json.loads(r.stdout)


def test_schemas_identical_and_rows_scaled(scaled):
    out, meta = scaled
    assert meta["k"] == 3
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings", "documents",
    ]:
        b = pq.read_schema(os.path.join(BASE, f"{t}.parquet"))
        s = pq.read_schema(os.path.join(out, f"{t}.parquet"))
        assert b.equals(s), f"schema drift in {t}"
        n_base = pq.read_table(os.path.join(BASE, f"{t}.parquet")).num_rows
        n_out = meta["rows"][t]
        if t in ("region", "nation"):
            assert n_out == n_base  # fixed dimensions
        else:
            # + the planted collusive cohort (VERDICT r13 item 7) on
            # customer/orders/lineitem; zero elsewhere
            assert n_out == 3 * n_base + meta["planted"].get(t, 0)
    # the plant is invisible in any cost curve
    assert sum(meta["planted"].values()) < 300


def test_copies_are_key_disjoint_and_joins_intra_copy(scaled):
    out, _ = scaled
    orders = pq.read_table(
        os.path.join(out, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    cust = pq.read_table(os.path.join(out, "customer.parquet"), columns=["c_custkey"])
    okeys = orders["o_orderkey"].to_pylist()
    assert len(okeys) == len(set(okeys))  # offsets never collide
    # every foreign key resolves (joins stay inside the copy)
    ckeys = set(cust["c_custkey"].to_pylist())
    assert set(orders["o_custkey"].to_pylist()) <= ckeys


def test_planted_cohort_carries_recall_signal(scaled, spark):
    """VERDICT r13 item 7: the planted customer pairs must be exactly
    the ≥½-Jaccard pairs of the scaled corpus, found by BOTH the
    capped exact screen and the LSH leg (recall signal), with the
    J = 1/3 negative control found by NEITHER."""
    import pyspark.sql.functions as F

    from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.cooccur import (
        shared_counterparty_pairs,
        shared_counterparty_pairs_lsh,
    )

    out, meta = scaled
    truth = {
        (p["entity_a"], p["entity_b"]): p
        for p in meta["planted_pairs"]
        if p["jaccard"] >= 0.5
    }
    neg = [
        (p["entity_a"], p["entity_b"])
        for p in meta["planted_pairs"]
        if p["jaccard"] < 0.5
    ]
    # tiny sf0.001 supplier population: at least the J=1 groups fit
    # (full-size bases plant 3x J=1 + 2x J=0.6 + the negative control)
    assert len(truth) >= 3
    o = spark.read.parquet(os.path.join(out, "orders.parquet"))
    li = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("entity"),
        F.col("l_suppkey").alias("counterparty"),
    )
    exact = {
        (r["entity_a"], r["entity_b"]): r
        for r in shared_counterparty_pairs(
            edges, min_shared=2, top_k=10**9, max_counterparty_degree=2000
        ).collect()
        if 2 * r["n_shared"] >= r["n_union"]
    }
    lsh = {
        (r["entity_a"], r["entity_b"]): r
        for r in shared_counterparty_pairs_lsh(
            edges, min_shared=2, max_counterparty_degree=2000
        ).collect()
    }
    for pair, p in truth.items():
        assert pair in exact, f"exact screen missed planted {pair}"
        assert pair in lsh, f"LSH leg missed planted {pair}"
        assert abs(exact[pair]["jaccard"] - p["jaccard"]) < 1e-12
        assert exact[pair]["n_shared"] == p["n_shared"]
    for pair in neg:
        assert pair not in exact and pair not in lsh
    # the plant is part of the ≥½ signal (organic pairs can also exist
    # at tiny sf — the planted ones are the SF-invariant floor)
    assert set(truth) <= set(exact) and set(truth) <= set(lsh)


def test_planted_lineitem_rows_keep_the_primary_key(scaled):
    """ADVICE r14: planted lineitem rows are templated from base rows,
    which used to inherit repeating l_linenumber values. The PLANTED
    rows (orderkeys above every copy's range, i.e. >= k·stride) must
    carry a 1..n l_linenumber sequence per order so they never ADD
    (l_orderkey, l_linenumber) duplicates. Scope note: the driver's
    BASE corpus itself carries duplicate pairs (sf0.001: 6000 rows,
    4599 unique), so the whole-table PK is not the generator's to
    promise — only that plants don't make it worse."""
    out, _ = scaled
    k = 3
    base_max = int(
        pq.read_table(
            os.path.join(BASE, "orders.parquet"), columns=["o_orderkey"]
        )["o_orderkey"]
        .combine_chunks()
        .to_pandas()
        .max()
    )
    stride = base_max + 1
    t = pq.read_table(
        os.path.join(out, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber"],
    )
    pairs = [
        p
        for p in zip(
            t["l_orderkey"].to_pylist(), t["l_linenumber"].to_pylist()
        )
        if p[0] >= k * stride
    ]
    assert pairs, "no planted rows found — fixture broken"
    assert len(pairs) == len(set(pairs))
    # and each planted order's linenumbers are exactly 1..n
    by_order = {}
    for o, ln in pairs:
        by_order.setdefault(o, []).append(ln)
    for o, lns in by_order.items():
        assert sorted(lns) == list(range(1, len(lns) + 1)), o


def test_documents_fresh_not_copied(scaled):
    out, _ = scaled
    base_texts = set(
        pq.read_table(os.path.join(BASE, "documents.parquet"), columns=["text"])[
            "text"
        ].to_pylist()
    )
    new = pq.read_table(os.path.join(out, "documents.parquet"), columns=["text"])[
        "text"
    ].to_pylist()
    # freshly generated: essentially no text collides with the base
    # corpus (tiny vocab makes a stray collision possible, not 10%+)
    overlap = sum(1 for t in new if t in base_texts)
    assert overlap < len(new) * 0.01
    # forced exact-dup rate present (~1/625)
    assert len(new) - len(set(new)) >= len(new) // 1000


def test_events_value_domain_scales_with_copies(scaled):
    """VERDICT r17 item 4: each events copy's cents domain is shifted
    by copy * (max_cents + 1) — domains disjoint per copy, base copy
    bit-identical, and cents survive the double round-trip exactly, so
    amount-keyed screens stay selective at scale instead of saturating
    every (cents, window) cell."""
    import duckdb

    out, meta = scaled
    base_cents = duckdb.sql(
        f"SELECT DISTINCT CAST(round(value*100) AS BIGINT) c "
        f"FROM '{BASE}/events.parquet' ORDER BY c"
    ).fetchall()
    stride = base_cents[-1][0] + 1
    n_base_ev = pq.read_table(os.path.join(BASE, "events.parquet")).num_rows
    got = duckdb.sql(
        f"SELECT event_id // {n_base_ev} AS copy, "
        f"       CAST(round(value*100) AS BIGINT) AS c "
        f"FROM '{out}/events.parquet'"
    ).fetchall()
    base_set = {c for (c,) in base_cents}
    by_copy = {}
    for copy, c in got:
        by_copy.setdefault(copy, set()).add(c)
    assert set(by_copy) == {0, 1, 2}
    for copy, cs in by_copy.items():
        # exact shift: copy i's cents are base cents + i*stride
        assert cs == {c + copy * stride for c in base_set}, copy
    # and the screen stays selective: distinct cents grow 3x
    assert len(set().union(*by_copy.values())) == 3 * len(base_set)
