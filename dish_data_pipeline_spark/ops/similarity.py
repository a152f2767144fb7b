"""Vector similarity search over an embedding column
(``embeddings(vec_id, embedding ARRAY<FLOAT>, label)``).

Two tiers (SURVEY.md §7.7):

- ``cosine_topk`` — brute-force top-k: broadcast the (small) query
  set against all candidates; dot products computed JVM-side with
  ``zip_with``/``aggregate`` higher-order functions (no Python UDF).
  At 100 TB this is the per-batch exact scorer — candidates stream
  through executors, only k rows per query survive the window.
- ``lsh_bucket_topk`` — the scale path: sign-random-projection LSH
  buckets (deterministic hyperplanes from a seed), candidates only
  within matching buckets → shuffle is bucket-bounded, never
  all-pairs.

Determinism contract for the oracle: per-element products are exact
IEEE doubles summed by a SEQUENTIAL left fold — Spark's
``aggregate`` (init 0.0, so 0.0+p1 == p1 exactly) and DuckDB's
``list_reduce`` fold in the same order, giving bit-identical sums.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic dot product: double products, sequential left fold.
DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


def dot(a: str, b: str) -> F.Column:
    return F.expr(DOT_EXPR.format(a=a, b=b))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_normalized: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Queries are filtered from the corpus and broadcast; the cross
    join is |queries| × N with only k survivors per query after the
    rank window. Self-matches are excluded.

    By default the true cosine (dot / ‖q‖‖c‖) is computed — correct
    on ANY input. Pass ``assume_normalized=True`` only when vectors
    are known unit-norm: it skips the two norm folds and returns the
    raw dot product (which then IS the cosine).
    """
    q = embeddings.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).filter(F.col("query_id").isin(query_ids))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = dot("q_vec", "c_vec")
    if not assume_normalized:
        sim = sim / (
            F.sqrt(dot("q_vec", "q_vec")) * F.sqrt(dot("c_vec", "c_vec"))
        )
    scored = pairs.withColumn("cosine", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# Per-centroid scores over a `_cents` column of
# array<struct<cid BIGINT, cv ARRAY<DOUBLE>>>: one struct per
# centroid with the deterministic fold dot product (same shape as
# DOT_EXPR — IEEE multiply is commutative, so zip order is free).
_CENTS_SCORED = (
    "transform(_cents, c -> named_struct("
    "'sim', aggregate(zip_with(c.cv, {v}, (x, y) -> "
    "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), "
    "(acc, p) -> acc + p), "
    "'cid', c.cid))"
)


def _argmax_cid(vec: str) -> F.Column:
    """Map-side nearest-centroid id: a left fold keeping the best
    (max sim, ties → lowest cid) — no window, no exchange. Same
    selection semantics as ROW_NUMBER() OVER (ORDER BY sim DESC,
    cid ASC) = 1, computed per-row inside the scan stage."""
    scored = _CENTS_SCORED.format(v=vec)
    return F.expr(
        f"aggregate({scored}, "
        "named_struct('sim', CAST('-Infinity' AS DOUBLE), "
        "'cid', CAST(9223372036854775807 AS BIGINT)), "
        "(best, cur) -> IF(cur.sim > best.sim "
        "OR (cur.sim = best.sim AND cur.cid < best.cid), cur, best)"
        ").cid"
    )


def _top_probe_structs(vec: str, n_probe: int) -> F.Column:
    """Map-side top-``n_probe`` centroids (sim DESC, cid ASC): sort
    the scored array with an explicit comparator and slice — the
    per-query probe-list window, without the window."""
    scored = _CENTS_SCORED.format(v=vec)
    return F.expr(
        f"slice(array_sort({scored}, (l, r) -> "
        "CASE WHEN l.sim > r.sim THEN -1 WHEN l.sim < r.sim THEN 1 "
        "WHEN l.cid < r.cid THEN -1 WHEN l.cid > r.cid THEN 1 "
        f"ELSE 0 END), 1, {int(n_probe)})"
    )


def _plane_component(seed: int, p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1) —
    splitmix-style integer hash, no RNG state, reproducible across
    engines, runs, and cluster sizes."""
    x = (
        seed * 0x9E3779B97F4A7C15
        + p * 0xBF58476D1CE4E5B9
        + d * 0x94D049BB133111EB
    ) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    x = (x * 0xD6E8FEB86659FD93) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 29
    return (x / 2**63) - 1.0


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 10,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Offline IVF centroid training: Lloyd's k-means as DataFrame
    ops. Per iteration: assignment is a map-side fold-argmax over the
    centroid array literal — the corpus touches NO exchange to get
    its labels (no crossJoin row explosion, no window shuffle); new
    means are one posexplode/groupBy whose map-side partial
    aggregation reduces each partition to ≤ k × dim groups before the
    (tiny) exchange. Order-independent decimal sums keep centroids
    deterministic across runs and cluster sizes.

    Centroids are MODEL STATE, not data: they ride the driver
    between iterations (n_centroids × dim doubles — the same class
    of driver-side control data as ``partitioned_merge``'s partition
    list), exactly how an offline training loop feeds a 100 TB
    assignment pass. Init = lowest-id vectors (deterministic);
    clusters that empty out keep their previous centroid.

    Returns (centroid_id BIGINT, cent_vec ARRAY<DOUBLE>) for
    ``ivf_topk(centroids=...)``."""
    spark = embeddings.sparkSession
    corpus = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    cents: list[tuple[int, list[float]]] = [
        (i, list(r._v))
        for i, r in enumerate(corpus.orderBy("_id").limit(n_centroids).collect())
    ]
    for _ in range(n_iters):
        cent_lit = F.array(
            *[
                F.struct(
                    F.lit(cid).cast("bigint").alias("cid"),
                    F.lit(vec).cast("array<double>").alias("cv"),
                )
                for cid, vec in cents
            ]
        )
        assigned = (
            corpus.withColumn("_cents", cent_lit)
            .withColumn("centroid_id", _argmax_cid("_v"))
            .select("centroid_id", "_v")
        )
        means = (
            assigned.select("centroid_id", F.posexplode("_v").alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("centroid_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
                ).alias("cent_vec")
            )
        )
        new = {int(r.centroid_id): list(r.cent_vec) for r in means.collect()}
        cents = [(cid, new.get(cid, vec)) for cid, vec in cents]
    return spark.createDataFrame(cents, "centroid_id bigint, cent_vec array<double>")


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus against a fixed
    centroid set, then score queries only against the ``n_probe``
    nearest inverted lists.

    Vectors are assumed unit-norm (the ANN contract — SRP/IVF bucket
    geometry itself presumes it); the reported ``cosine`` is the raw
    dot product. Normalize upstream if needed.

    Pass ``centroids`` from ``kmeans_centroids`` for trained lists;
    the default picks the lowest-id vectors (deterministic, zero
    training cost — fine for plumbing verification since exhaustive
    probing equals brute force under ANY corpus partition). The
    centroid set rides a one-row broadcast as a single array column;
    both the corpus→centroid assignment (fold-argmax) and the query
    probe lists (sort+slice) are computed map-side inside the scan
    stage — no assignment window, no probe window. The only
    corpus-sized shuffle is the final top-k window; the IVF
    recall/cost dial is ``n_probe``.
    """
    if centroids is None:
        # Deterministic centroid pick: lowest n_centroids vec ids.
        centroids = (
            embeddings.orderBy(F.asc(id_col))
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
            )
        )

    # Collapse the centroid relation to ONE row holding the whole
    # set as a cid-sorted array — n_centroids × dim doubles, the same
    # scale as a broadcast dim table. Downstream it rides a 1-row
    # broadcast crossJoin, so per-row centroid math is map-side.
    cent_arr = centroids.agg(
        F.expr(
            "array_sort(collect_list(named_struct("
            "'cid', CAST(centroid_id AS BIGINT), "
            "'cv', CAST(cent_vec AS ARRAY<DOUBLE>))))"
        ).alias("_cents")
    )

    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    assigned = (
        corpus.crossJoin(F.broadcast(cent_arr))
        .withColumn("list_id", _argmax_cid("c_vec"))
        .select("neighbor_id", "c_vec", "list_id")
    )

    queries = embeddings.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).filter(F.col("query_id").isin(query_ids))
    probes = (
        queries.crossJoin(F.broadcast(cent_arr))
        .withColumn("_probe", F.explode(_top_probe_structs("q_vec", n_probe)))
        .select("query_id", "q_vec", F.col("_probe.cid").alias("list_id"))
    )

    pairs = (
        F.broadcast(probes)
        .join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cosine", dot("q_vec", "c_vec"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_planes(
    n_planes: int, n_tables: int, seed: int, dim: int
) -> list[list[list[float]]]:
    """The deterministic hyperplane tensor shared by the Spark ops
    and the DuckDB oracles (``plans/oracle_ann.py``)."""
    return [
        [
            [_plane_component(seed + t, p, d) for d in range(dim)]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def _srp_sigs_arrow(n_planes: int, n_tables: int, seed: int, dim: int):
    """Arrow-batched signature kernel. The per-element accumulation
    is a MANUAL left-associative loop over dimensions (``acc = acc +
    x_d * y_d`` from 0.0), which is bit-identical to the Spark HOF
    fold and the DuckDB ``list_reduce`` oracle — numpy's own
    ``dot``/``sum`` use pairwise/SIMD summation and would NOT be.
    Only the SIGN of each plane dot matters downstream, but keeping
    the bits identical keeps borderline dots (≈0) on the same side
    in every engine."""
    import numpy as np

    planes = np.asarray(
        srp_planes(n_planes, n_tables, seed, dim), dtype=np.float64
    )  # (tables, planes, dim)

    @F.pandas_udf("array<bigint>")
    def sigs(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        # float32 → float64 widening is exact, same as CAST(y AS DOUBLE)
        v = np.array(vs.tolist(), dtype=np.float64)  # (n, dim)
        out = np.empty((len(v), n_tables), dtype=np.int64)
        for t in range(n_tables):
            p = planes[t]  # (planes, dim)
            acc = np.zeros((len(v), n_planes), dtype=np.float64)
            for d in range(dim):
                acc = acc + v[:, d : d + 1] * p[None, :, d]
            bits = (acc >= 0).astype(np.int64)
            sig = np.zeros(len(v), dtype=np.int64)
            for b in range(n_planes):
                sig = sig * 2 + bits[:, b]
            out[:, t] = sig
        return pd.Series(list(out))

    return sigs


def with_srp_buckets(
    df: DataFrame,
    vec: str,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
    impl: str = "arrow",
) -> DataFrame:
    """One (table_id, bucket) row per table per input row: signature
    = sign bits of the plane dot products, packed into a long.
    Map-side only (plane-tensor shipped with the kernel/literal, no
    shuffle); the downstream bucket equi-join is what bounds
    candidate generation.

    Two implementations producing BIT-IDENTICAL signatures (unit
    test asserts it):

    - ``impl="arrow"`` (default): vectorized pandas UDF — the
      ~n_planes × dim multiply-adds per row run as numpy array ops
      over Arrow batches instead of interpreted lambda evals.
      Measured ~10× faster on the signature stage; the sequential
      left-assoc accumulation keeps the oracle contract.
    - ``impl="hof"``: pure JVM higher-order-function fold — zero
      Python workers; the fallback where Arrow isn't available.
      It stays a HOF ON PURPOSE: expanding the ~2k-term dot products
      into scalar codegen expressions measured ~3× faster in
      isolation but blows Janino's method budget once whole-stage
      codegen fuses surrounding operators (compile failure →
      interpreted fallback → worse)."""
    if impl == "arrow":
        sig_array = _srp_sigs_arrow(n_planes, n_tables, seed, dim)(F.col(vec))
        return (
            df.withColumn("_sigs", sig_array)
            .select("*", F.posexplode("_sigs").alias("table_id", "bucket"))
            .drop("_sigs")
        )
    tables_lit = F.lit(srp_planes(n_planes, n_tables, seed, dim))
    sig_array = F.expr(
        "transform(_tables, tbl -> aggregate(transform(tbl, p -> "
        f"CASE WHEN aggregate(zip_with(p, {vec}, (x, y) -> x * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v) >= 0 THEN 1 ELSE 0 END), "
        "0L, (acc, b) -> acc * 2 + b))"
    )
    return (
        df.withColumn("_tables", tables_lit)
        .withColumn("_sigs", sig_array)
        .drop("_tables")
        .select("*", F.posexplode("_sigs").alias("table_id", "bucket"))
        .drop("_sigs")
    )


def srp_block_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_tables: int = 2,
    seed: int = 7,
    dim: int = 64,
    score=None,
    impl: str = "arrow",
) -> DataFrame:
    """Near-dup candidate pairs: vectors sharing any (table, bucket).
    The 100 TB blocking shape: bucket count (2^n_planes per table)
    scales with the corpus — near-identical vectors collide with
    certainty, unrelated ones spread uniformly — unlike blocking on
    a data column (label/category), whose cardinality is fixed and
    whose blocks grow linearly with the corpus (quadratic pairs).

    ``score`` is a ``(va_col, vb_col) -> Column`` scorer (e.g.
    ``dot``). When given, the scalar is computed INSIDE the bucket
    join output — map-side, at most ``n_tables`` times per pair —
    and the cross-table pair dedup shuffles only
    ``(id_a, id_b, score)``: the embedding arrays never ride a
    shuffle after the bucket join (at dim ≥ 1k they are kilobytes
    per candidate pair, and the duplicate rate is bounded by
    ``n_tables``, so recompute beats reshuffle). When ``score`` is
    None, returns bare distinct ``(id_a < id_b)`` pairs — join
    payloads back by id downstream, again without shuffling vectors
    through the dedup.

    The signature relation is persisted so the self-join's two
    branches compute the (interpreted-HOF, relatively expensive)
    signatures ONCE — the same move a 100 TB pipeline makes by
    checkpointing the signature table before the bucket join. The
    cache entry is MEMORY_AND_DISK and evictable (LRU) once the
    query's action completes; a long-lived session reusing many
    corpora should checkpoint the signature table itself."""
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    sig = tracked_persist(
        with_srp_buckets(
            df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
            "_v", n_planes, n_tables, seed, dim, impl=impl,
        )
    )

    def side(id_out: str, vec_out: str, tbl: str, bkt: str) -> DataFrame:
        return sig.withColumnsRenamed(
            {"_id": id_out, "_v": vec_out, "table_id": tbl, "bucket": bkt}
        )

    a = side("id_a", "va", "t_a", "b_a")
    b = side("id_b", "vb", "t_b", "b_b")
    joined = a.join(
        b,
        (F.col("t_a") == F.col("t_b"))
        & (F.col("b_a") == F.col("b_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    if score is not None:
        # Deterministic scorer ⇒ every table's copy of a pair carries
        # the identical scalar, so the arbitrary-row dedup is safe.
        return (
            joined.withColumn("score", score("va", "vb"))
            .select("id_a", "id_b", "score")
            .dropDuplicates(["id_a", "id_b"])
        )
    return joined.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Approximate top-k via multi-table sign-random-projection LSH.

    Each of ``n_tables`` hash tables assigns every vector an
    ``n_planes``-bit signature; candidates are compared only when
    they share a (table, bucket) pair — a plain equi-join, so the
    shuffle is bucket-bounded (never all-pairs): the 100 TB-safe
    shape. Multiple tables trade extra (cheap, map-side) signature
    computation for recall. See ``cosine_topk`` for the exact scorer.
    Vectors are assumed unit-norm (``cosine`` = raw dot product).
    """

    def with_buckets(df: DataFrame, vec: str) -> DataFrame:
        return with_srp_buckets(df, vec, n_planes, n_tables, seed, dim, impl=impl)

    cands = with_buckets(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_vec",
    )
    qs = with_buckets(
        embeddings.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).filter(F.col("query_id").isin(query_ids)),
        "q_vec",
    )
    # Score BEFORE the pair-dedup so only the scalar cosine rides the
    # dedup + window shuffles, never the two embedding arrays (at
    # dim >= 1k the vectors would dominate shuffle bytes). The scorer
    # is deterministic, so every table's copy of a pair carries the
    # identical scalar and the arbitrary-row dedup is safe.
    pairs = (
        F.broadcast(qs)
        .join(cands, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot("q_vec", "c_vec"))
        .select("query_id", "neighbor_id", "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def kmeans_exact_assignments(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 3,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cross-engine-EXACT Lloyd's k-means — the certification tier of
    :func:`kmeans_centroids`, built the way ``stats_corr`` rebuilt
    correlation: every quantity an integer, every comparison a
    cross-multiplied rational, so the full training trajectory is
    bit-reproducible on any engine and under any aggregation order
    (the double-arithmetic tier is order-stable via decimal sums but
    still splits by one ulp on decimal→double casts past 2^53).

    Vectors quantize up front to ``floor(v·quant)`` BIGINT. A
    centroid is the exact rational (S, N) = (member coordinate sums,
    member count) — never divided. Assignment maximizes the
    inner-product similarity dot(S_c, qv)/N_c via the exact
    comparison ``dot_a·N_b > dot_b·N_a``, evaluated as an
    Arrow-batched map pass (``mapInPandas``): centroids ride the
    closure to every batch, dots are ONE int64 matmul per batch
    (``Q @ S.T``), and the argmax folds left-to-right with the same
    cross-multiplied comparison — bit-identical to a per-row
    rational fold, measured ~8× faster end-to-end at 24k×k=60 than
    interpreted per-row higher-order-function expressions (whose
    giant per-iteration centroid literals also pay heavy plan
    analysis), and still ZERO-shuffle (the
    corpus never moves to learn its labels — the property that
    matters at 100 TB). Ties break to the lowest cid. Init = the
    ``n_centroids`` lowest-id vectors; emptied clusters keep their
    previous (S, N).

    Overflow domain: |dot·N| ≤ dim·(N·quant·|v|)·(quant·|v|)·N must
    stay under 2^63 — with dim 64, |v| ≤ 1, quant 1000 that holds to
    N ≈ 4·10^5 members per cluster; shrink ``quant`` to widen.
    (numpy int64 shares the bound exactly.)

    Returns (vec_id, centroid_id) for every input vector under the
    FINAL centroids (assignment runs once more after the last mean
    update)."""
    corpus = embeddings.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {int(quant)}) AS BIGINT))"
        ).alias("_qv"),
    )
    cents: list[tuple[int, list[int], int]] = [
        (i, [int(x) for x in r._qv], 1)
        for i, r in enumerate(
            corpus.orderBy("_id").limit(n_centroids).collect()
        )
    ]

    out_schema = "_id bigint, _qv array<bigint>, centroid_id bigint"

    def assigned():
        import numpy as np

        # snapshot THIS iteration's centroids into the closure (cents
        # is rebound each round; late binding would ship the final
        # ones into every pass)
        smat = np.array([S for _, S, _ in cents], dtype=np.int64)
        nvec = np.array([N for _, _, N in cents], dtype=np.int64)

        def assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                q = np.stack(pdf["_qv"].to_numpy()).astype(np.int64)
                d = q @ smat.T  # (B, k) exact int64 dots
                # exact rational argmax, folding cids left to right:
                # replace only on STRICT dot_c·N_best > dot_best·N_c
                # (ascending cids make the tie-to-lowest-cid rule a
                # no-replace), identical to the SQL fold this replaces
                bd = d[:, 0].copy()
                bn = np.full(len(pdf), nvec[0], dtype=np.int64)
                best = np.zeros(len(pdf), dtype=np.int64)
                for c in range(1, len(nvec)):
                    better = d[:, c] * bn > bd * nvec[c]
                    best[better] = c
                    bd[better] = d[better, c]
                    bn[better] = nvec[c]
                yield pdf.assign(centroid_id=best)

        return corpus.mapInPandas(assign, out_schema)

    for _ in range(n_iters):
        sums = (
            assigned()
            .select("centroid_id", F.posexplode("_qv").alias("pos", "q"))
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum("q").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .groupBy("centroid_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, s))),"
                    " t -> t.s)"
                ).alias("S"),
                F.max("n").alias("N"),
            )
        )
        new = {
            int(r.centroid_id): ([int(x) for x in r.S], int(r.N))
            for r in sums.collect()
        }
        cents = [
            (cid, *new[cid]) if cid in new else (cid, S, N)
            for cid, S, N in cents
        ]
    return assigned().select(
        F.col("_id").alias(id_col), "centroid_id"
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 3,
    quant: int = 1000,
    tau_num: int = 81,
    tau_den: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: cluster the corpus
    (:func:`kmeans_exact_assignments`), then DROP every vector that
    has a LOWER-id near-duplicate in its own cluster — pairwise
    squared-cosine test ``tau_den·dot² >= tau_num·|a|²·|b|²`` (with
    ``dot > 0``), i.e. cos >= sqrt(tau_num/tau_den), entirely in
    exact BIGINT arithmetic on the quantized vectors. Defaults test
    cos >= 0.9.

    Scale shape: candidate pairs are CLUSTER-scoped — O(sum c_k²)
    instead of the corpus-quadratic all-pairs join; at 100 TB the
    dial is n_centroids ~ n/target_cluster_size so each cluster's
    block self-join stays executor-sized (this is exactly why
    SemDeDup clusters first). Cluster-scoped also means a cross-
    cluster near-dup pair is NOT dropped — the documented recall
    trade, deterministic here in both engines.

    Returns (id_col, centroid_id, kept BOOLEAN) for every vector."""
    a = kmeans_exact_assignments(
        embeddings, n_centroids, n_iters, quant, id_col, vec_col
    )
    qv = embeddings.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {int(quant)}) AS BIGINT))"
        ).alias("_qv"),
    ).withColumn(
        "_n2",
        F.expr(
            "aggregate(zip_with(_qv, _qv, (x, y) -> x * y), "
            "CAST(0 AS BIGINT), (s, p) -> s + p)"
        ),
    )
    t = a.join(qv, a[id_col] == qv["_id"]).select(
        F.col(id_col), "centroid_id", "_qv", "_n2"
    )

    # Per-cluster pairwise test as ONE Arrow group pass: each cluster
    # is a (c × dim) int64 matrix, the full pair grid is a single
    # exact Gram matmul (row-blocked so memory stays O(block · c)
    # even for a skewed cluster), and "has a lower-id near-dup" is a
    # column-wise any() over the strict upper triangle in id order.
    # Bit-identical to the pairwise equi-join it replaces (same
    # integers, same comparison), one shuffle (the groupBy), no c²
    # join rows materialized. The executor-sized-cluster contract is
    # the caller's n_centroids dial (see scale shape above).
    import numpy as np

    td, tn = int(tau_den), int(tau_num)

    def prune(pdf):
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        pdf = pdf.iloc[order]
        q = np.stack(pdf["_qv"].to_numpy()).astype(np.int64)
        n2 = pdf["_n2"].to_numpy().astype(np.int64)
        c = len(pdf)
        dropped = np.zeros(c, dtype=bool)
        for lo in range(0, c, 2048):
            hi = min(lo + 2048, c)
            g = q[lo:hi] @ q.T  # (block, c) exact int64 dots
            cond = (g > 0) & (td * g * g >= tn * np.outer(n2[lo:hi], n2))
            # row i (global lo+i) kills every j > lo+i it matches
            cols = np.arange(c)
            mask = cols[None, :] > (lo + np.arange(hi - lo))[:, None]
            dropped |= (cond & mask).any(axis=0)
        return pdf.assign(kept=~dropped)[
            [id_col, "centroid_id", "kept"]
        ]

    return t.groupBy("centroid_id").applyInPandas(
        prune, f"{id_col} bigint, centroid_id bigint, kept boolean"
    )
