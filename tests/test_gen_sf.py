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
            assert n_out == 3 * n_base


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
