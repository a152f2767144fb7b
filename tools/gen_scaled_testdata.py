"""Scale the driver's synthetic testdata up one decade for scaling
probes (SCALING.md sf0.1 -> sf1.0) without touching the read-only
/root/testdata tree.

    python tools/gen_scaled_testdata.py [--src /root/testdata/sf0.1] \
        [--dest .localdata/sf1.0] [--copies 10]

Method: C deterministic "shards" (C <= 26 — the text rotation's
period). Shard 0 is the source data verbatim; shard c>0 is the source
with every key column offset by c * (max(table primary key) + 1) so FK
integrity (customer->nation, orders->customer,
lineitem->orders/part/supplier, events->user) holds across the whole
output even for sparse key spaces, and with CONTENT transforms chosen
so within-shard structure
(duplicate rate, near-dup geometry, name-collision rate, session
shape) is preserved exactly while cross-shard accidental structure is
broken — the properties a real 10x corpus would have:

- documents.text: bijective LENGTH-PRESERVING per-shard letter
  rotation (Caesar shift by c on a-z/A-Z; shard 0 identity). True
  within-shard Jaccard/containment/shingle relations are exactly
  preserved (bijection on the token alphabet), across shards no
  shingle is shared, so near-dup pair counts scale LINEARLY in C
  instead of quadratically as naive replication would make them —
  and total char volume scales EXACTLY with rows, so char-bound
  text queries see a true 10x (a suffix-append remap was measured
  to inflate chars ~1.3x and skew their growth ratios to ~13x).
- part.p_name: same rotation — keeps the edit-distance-1 blocking
  (fuzzy_part_match) from matching shard c's "ring" to shard c''s
  (every letter differs between shards, so cross-shard edit distance
  >= word length), which would inflate fuzzy-join outputs ~C^2.
- embeddings.embedding: per-shard deterministic sign-flip pattern on
  dimensions (shard 0 = identity). Sign flips are orthogonal maps, so
  within-shard cosines/norms are EXACTLY preserved; cross-shard
  cosines decorrelate, keeping embedding near-dup density linear.
- c_name/s_name: regenerated from the offset key (driver format).
- events: same 30-day window with C x users and events — density
  scales, session/window structure per user unchanged.
- region/nation: fixed dimensions, copied as-is.

Everything is pure pyarrow/numpy (no Spark), deterministic, and
writes one parquet per table like the driver layout. A sf0.001
symlink is planted next to the dest so bench.py's smoke-warmup
resolution works unchanged.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key ranges are read from the SOURCE so the tool works at any base SF
# (span = max(primary key) + 1, NOT the row count — collision-free even
# when source keys are sparse or don't start at 0)
PRIMARY_KEYS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED_TABLES = ("region", "nation")
TABLES = FIXED_TABLES + tuple(KEY_COLS)

def _remap_text(text: str, c: int) -> str:
    """Bijective, length-preserving letter rotation for shard c
    (identity for c=0): a-z and A-Z each rotate by c. Digits,
    punctuation, and whitespace are untouched, so token boundaries,
    lengths, and all non-letter structure survive verbatim."""
    if c == 0:
        return text
    lo = "abcdefghijklmnopqrstuvwxyz"
    hi = lo.upper()
    tbl = str.maketrans(
        lo + hi, lo[c:] + lo[:c] + hi[c:] + hi[:c]
    )
    return text.translate(tbl)


def _shard(
    name: str, src: pa.Table, c: int, spans: dict[str, int]
) -> pa.Table:
    t = src
    for col, span_key in KEY_COLS.get(name, {}).items():
        off = c * spans[span_key]
        arr = pc.add(t[col], pa.scalar(off, type=t.schema.field(col).type))
        t = t.set_column(t.schema.get_field_index(col), col, arr)
    if c == 0:
        return t  # shard 0 keeps the driver rows verbatim
    if name in ("customer", "supplier"):
        col, fmt = (
            ("c_name", "Customer#{:09d}")
            if name == "customer"
            else ("s_name", "Supplier#{:09d}")
        )
        keys = t[name[0] + "_" + ("custkey" if name == "customer" else "suppkey")]
        names = pa.array(
            [fmt.format(k) for k in keys.to_pylist()], type=pa.string()
        )
        t = t.set_column(t.schema.get_field_index(col), col, names)
    elif name == "part":
        names = pa.array(
            [_remap_text(s, c) for s in t["p_name"].to_pylist()],
            type=pa.string(),
        )
        t = t.set_column(t.schema.get_field_index("p_name"), "p_name", names)
    elif name == "documents":
        texts = [_remap_text(s, c) for s in t["text"].to_pylist()]
        t = t.set_column(
            t.schema.get_field_index("text"),
            "text",
            pa.array(texts, type=pa.string()),
        )
        t = t.set_column(
            t.schema.get_field_index("n_chars"),
            "n_chars",
            pa.array([len(s) for s in texts], type=pa.int64()),
        )
    elif name == "embeddings":
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(t)
        rng = np.random.default_rng(42 + c)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        flipped = (flat.reshape(-1, dim) * signs).reshape(-1)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flipped, type=pa.float32()), dim
        ) if pa.types.is_fixed_size_list(emb.type) else pa.ListArray.from_arrays(
            emb.offsets, pa.array(flipped, type=emb.type.value_type)
        )
        t = t.set_column(
            t.schema.get_field_index("embedding"), "embedding", arr
        )
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=".localdata/sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    if not 1 <= args.copies <= 26:
        # the per-shard Caesar rotation is identity at c % 26 == 0, so
        # shard 26 would duplicate shard 0's text verbatim and near-dup
        # pair counts would grow quadratically across those shards
        ap.error("--copies must be in 1..26 (letter rotation period)")
    os.makedirs(args.dest, exist_ok=True)

    srcs = {
        n: pq.read_table(os.path.join(args.src, f"{n}.parquet"))
        for n in TABLES
    }
    spans = {
        n: int(pc.max(srcs[n][pk]).as_py()) + 1
        for n, pk in PRIMARY_KEYS.items()
    }
    umax = pc.max(srcs["events"]["user_id"]).as_py()
    spans["_events_user"] = int(umax) + 1

    for n in FIXED_TABLES:
        pq.write_table(srcs[n], os.path.join(args.dest, f"{n}.parquet"))
        print(f"{n}: {len(srcs[n])} rows (fixed dim)")
    for n in KEY_COLS:
        # one part file per shard, like a real growing corpus — a
        # single concatenated file cannot split below its row groups,
        # which serializes every Spark scan onto one task and skews
        # scaling ratios with a parallelism artifact instead of plan
        # behavior (engine readers and DuckDB both take directories)
        table_dir = os.path.join(args.dest, f"{n}.parquet")
        os.makedirs(table_dir, exist_ok=True)
        total = 0
        for c in range(args.copies):
            shard = _shard(n, srcs[n], c, spans)
            pq.write_table(
                shard,
                os.path.join(table_dir, f"part-{c:02d}.parquet"),
                row_group_size=1 << 20,
            )
            total += len(shard)
        print(f"{n}: {total} rows ({args.copies} shards, 1 file each)")

    # bench.py warms up on a sibling sf0.001 dir — plant a symlink
    smoke = os.path.join(os.path.dirname(args.dest.rstrip("/")), "sf0.001")
    if not os.path.exists(smoke):
        os.symlink("/root/testdata/sf0.001", smoke)
        print(f"symlinked {smoke} -> /root/testdata/sf0.001")


if __name__ == "__main__":
    main()
