"""tools/gen_scaled_testdata.py — the sf1.0 scaling-probe generator.

Pure pyarrow/numpy (no Spark session): verifies the structural
invariants SCALING.md's methodology note claims — FK integrity
across shards, exact linear char volume, bijective length-preserving
text remap with cross-shard token disjointness, and norm-preserving
(orthogonal sign-flip) embedding transforms."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "gen_scaled_testdata.py",
)


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("scaled") / "sfX")
    subprocess.run(
        [sys.executable, TOOL, "--src", SRC, "--dest", dest, "--copies", "3"],
        check=True,
        capture_output=True,
    )
    return dest


def _t(d, name):
    return pq.read_table(os.path.join(d, f"{name}.parquet"))


def test_row_counts_and_key_density(scaled):
    for name in ("customer", "orders", "lineitem", "documents", "embeddings"):
        src, out = _t(SRC, name), _t(scaled, name)
        assert len(out) == 3 * len(src), name
    # dense unique keys across shards
    doc = _t(scaled, "documents")
    ids = doc["doc_id"].to_pylist()
    assert len(set(ids)) == len(ids)


def test_fk_integrity_across_shards(scaled):
    orders = set(_t(scaled, "orders")["o_orderkey"].to_pylist())
    custs = set(_t(scaled, "customer")["c_custkey"].to_pylist())
    for ok in _t(scaled, "lineitem")["l_orderkey"].to_pylist()[:5000]:
        assert ok in orders
    for ck in _t(scaled, "orders")["o_custkey"].to_pylist()[:5000]:
        assert ck in custs


def test_text_remap_is_length_preserving_and_disjoint(scaled):
    src = _t(SRC, "documents")
    out = _t(scaled, "documents")
    n = len(src)
    texts = out["text"].to_pylist()
    chars = out["n_chars"].to_pylist()
    src_texts = src["text"].to_pylist()
    # shard 0 verbatim; shards 1-2 length-preserving
    assert texts[:n] == src_texts
    for c in (1, 2):
        for i in (0, 1, n - 1):
            assert len(texts[c * n + i]) == len(src_texts[i])
            assert chars[c * n + i] == len(texts[c * n + i])
    # cross-shard token disjointness: shard 1's tokens never appear in
    # shard 0 (the letter rotation moves every word off the vocabulary)
    toks0 = set(" ".join(src_texts[:50]).split())
    toks1 = set(" ".join(texts[n : n + 50]).split())
    assert not (toks0 & toks1)
    # char volume scales exactly with rows
    assert sum(chars) == 3 * sum(src["n_chars"].to_pylist())


def test_embedding_signflip_preserves_norms_and_decorrelates(scaled):
    src = _t(SRC, "embeddings")
    out = _t(scaled, "embeddings")
    n = len(src)
    sv = np.stack([np.array(v) for v in src["embedding"].to_pylist()[:20]])
    ov1 = np.stack(
        [np.array(v) for v in out["embedding"].to_pylist()[n : n + 20]]
    )
    # norms exactly preserved (orthogonal map); sign pattern elementwise
    assert np.array_equal(np.abs(sv), np.abs(ov1))
    signs = np.sign(ov1[0]) * np.sign(sv[0])
    # ONE pattern applied to the whole shard (within-shard geometry
    # exactly preserved)
    for i in range(1, 20):
        nz = (sv[i] != 0) & (ov1[i] != 0)
        assert np.array_equal(
            (np.sign(ov1[i]) * np.sign(sv[i]))[nz], signs[nz]
        )


def test_rejects_copies_beyond_rotation_period(tmp_path):
    # shard 26's Caesar rotation is identity — verbatim duplicate text —
    # so the tool must refuse rather than silently emit quadratic
    # cross-shard near-dups
    r = subprocess.run(
        [sys.executable, TOOL, "--src", SRC,
         "--dest", str(tmp_path / "x"), "--copies", "27"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "1..26" in r.stderr


def test_sparse_keys_stay_collision_free(tmp_path):
    # offsets derive from max(key)+1, not row count: a table whose keys
    # are sparse (gaps) must still shard without key collisions
    import pyarrow as pa

    src_dir = tmp_path / "sparse_src"
    src_dir.mkdir()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if name == "documents":
            # make doc_id sparse: 0, 10, 20, ... (max >> row count)
            sparse = pa.array(
                [v * 10 for v in t["doc_id"].to_pylist()],
                type=t.schema.field("doc_id").type,
            )
            t = t.set_column(
                t.schema.get_field_index("doc_id"), "doc_id", sparse
            )
        pq.write_table(t, str(src_dir / f"{name}.parquet"))
    dest = tmp_path / "sparse_out"
    subprocess.run(
        [sys.executable, TOOL, "--src", str(src_dir),
         "--dest", str(dest), "--copies", "3"],
        check=True, capture_output=True,
    )
    ids = pq.read_table(str(dest / "documents.parquet"))[
        "doc_id"
    ].to_pylist()
    assert len(set(ids)) == len(ids)


def test_part_names_cross_shard_edit_distance(scaled):
    src_names = _t(SRC, "part")["p_name"].to_pylist()
    out_names = _t(scaled, "part")["p_name"].to_pylist()
    n = len(src_names)
    # every letter shifts, so shard1 vs shard0 names differ at every
    # alphabetic position — far outside edit-distance-1 blocking
    a, b = src_names[0], out_names[n]
    assert len(a) == len(b)
    assert all(
        (x == y) == (not x.isalpha())
        for x, y in zip(a, b)
    )
