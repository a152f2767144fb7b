"""Round-8 property tests: clamped-seed label propagation and
sliding-window HLL merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from dish_data_pipeline_spark.ops.graph import LP_SCALE, label_propagate


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src bigint, dst bigint")


def test_path_graph_mass_and_tiebreak(spark):
    """Path 1-2-3, seeds at the ends: the middle node receives full
    mass from both sides (tie) and the tiebreak picks the smaller
    label id; seeds stay clamped one-hot."""
    e = _edges(spark, [(1, 2), (2, 3)])
    seeds = spark.createDataFrame([(1, 0), (3, 1)], "node bigint, label int")
    out = {
        r["node"]: (r["label"], r["s_q"])
        for r in label_propagate(e, seeds, n_iter=3).collect()
    }
    assert out[1] == (0, LP_SCALE)
    assert out[3] == (1, LP_SCALE)
    assert out[2] == (0, LP_SCALE)  # tie LP_SCALE/LP_SCALE -> label 0


def test_unreached_island_absent(spark):
    """A connected component with no seed gets no rows."""
    e = _edges(spark, [(1, 2), (10, 11)])
    seeds = spark.createDataFrame([(1, 7)], "node bigint, label int")
    out = {r["node"] for r in label_propagate(e, seeds, n_iter=3).collect()}
    assert out == {1, 2}


def test_degree_split_floor(spark):
    """A degree-2 spreader sends floor(S/2) each way; a seedless
    leaf two hops out gets floor(floor(S/2)/1) after round 2."""
    # star: seed 1 - hub 2 - leaves 3,4
    e = _edges(spark, [(1, 2), (2, 3), (2, 4)])
    seeds = spark.createDataFrame([(1, 5)], "node bigint, label int")
    out = {
        r["node"]: (r["label"], r["s_q"])
        for r in label_propagate(e, seeds, n_iter=2).collect()
    }
    # hub deg=3: after round 1 hub holds S; round 2 leaves get S div 3
    assert out[3] == (5, LP_SCALE // 3)
    assert out[4] == (5, LP_SCALE // 3)
    assert out[1] == (5, LP_SCALE)


def test_hll_sliding_window_equals_whole_window_sketch(spark):
    """Register-wise MAX over daily sketches must equal the sketch
    built directly from the window's rows: merge-correctness of the
    daily HLL decomposition (plus the exact yardstick)."""
    from dish_data_pipeline_spark.ops.sketch import hll_distinct, hll_sliding

    rows = []
    for day in range(1, 8):
        for u in range(day * 3):  # growing daily user sets, overlapping
            rows.append(("click", f"2024-03-{day:02d} 10:00:00", u % 11))
    df = spark.createDataFrame(rows, "event_type string, ts string, user_id int")
    out = {
        (r["event_type"], str(r["window_end"])): r
        for r in hll_sliding(
            df, "event_type", "CAST(user_id AS STRING)", "ts", window_days=3
        ).collect()
    }
    # window ending 03-05 covers days 3,4,5
    win = df.filter(F.col("ts") >= "2024-03-03").filter(
        F.col("ts") < "2024-03-06"
    )
    (direct,) = hll_distinct(
        win, "event_type", "CAST(user_id AS STRING)"
    ).collect()
    got = out[("click", "2024-03-05")]
    assert got["n_distinct"] == direct["n_distinct"]
    assert got["n_registers"] == direct["n_registers"]
    assert got["est_distinct"] == direct["est_distinct"]
    # every day 1..7 produces a window row
    assert len(out) == 7


# --- VID0 container codec -------------------------------------------
def test_video_container_selective_roundtrip():
    import numpy as np

    from dish_data_pipeline_spark.ops.multimodal import (
        decode_video_frames,
        video_frame_count,
        video_from_frames,
    )

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, size=(8, 16), dtype=np.uint8)
        for _ in range(7)
    ]
    blob = video_from_frames(frames)
    assert video_frame_count(blob) == 7
    # selective decode touches only the requested payloads and is
    # exact for every frame (all five PNG filters cycle across them)
    for i, a in zip([0, 2, 4, 6], decode_video_frames(blob, [0, 2, 4, 6])):
        assert np.array_equal(a, frames[i])
    # last-frame end bound is len(content), first is the table edge
    (last,) = decode_video_frames(blob, [6])
    assert np.array_equal(last, frames[6])
    import pytest

    with pytest.raises(IndexError):
        decode_video_frames(blob, [7])
    with pytest.raises(ValueError):
        video_frame_count(b"nope" + blob[4:])


def test_video_single_frame_container():
    import numpy as np

    from dish_data_pipeline_spark.ops.multimodal import (
        decode_video_frames,
        video_from_frames,
    )

    f = np.arange(32, dtype=np.uint8).reshape(4, 8)
    blob = video_from_frames([f])
    (back,) = decode_video_frames(blob, [0])
    assert np.array_equal(back, f)


def test_sample_video_features_counts(spark):
    import numpy as np

    from dish_data_pipeline_spark.ops.multimodal import (
        sample_video_features,
        video_from_frames,
    )

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, size=(8, 16), dtype=np.uint8)
        for _ in range(10)
    ]
    blob = video_from_frames(frames)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, content binary"
    )
    rows = {
        r["frame_index"]: r
        for r in sample_video_features(df, every_k=3).collect()
    }
    assert sorted(rows) == [0, 3, 6, 9]
    for i, r in rows.items():
        a = frames[i].astype(np.int64)
        assert (r["pix_sum"], r["pix_min"], r["pix_max"]) == (
            int(a.sum()), int(a.min()), int(a.max())
        )


# --- exact k-means + semantic dedup ---------------------------------
def test_kmeans_exact_two_obvious_clusters(spark):
    from dish_data_pipeline_spark.ops.similarity import (
        kmeans_exact_assignments,
    )

    # two tight groups on opposite axes; init = 2 lowest ids (one
    # from each group) — Lloyd must separate them perfectly
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 1.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.1, 0.0, 0.9]),
        (4, [0.8, 0.0, 0.1, 0.0]),
        (5, [0.0, 0.0, 0.1, 0.8]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in kmeans_exact_assignments(
            df, n_centroids=2, n_iters=2
        ).collect()
    }
    assert got[0] == got[2] == got[4] == 0
    assert got[1] == got[3] == got[5] == 1


def test_semantic_dedup_drops_higher_id_copies(spark):
    from dish_data_pipeline_spark.ops.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 1.0]),
        (10, [1.0, 0.0, 0.0, 0.0]),   # exact copy of 0 -> dropped
        (11, [0.0, 0.0, 0.0, 0.97]),  # parallel to 1 -> dropped
        (12, [0.0, 1.0, 0.0, 0.0]),   # orthogonal -> kept
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, n_centroids=2, n_iters=1
        ).collect()
    }
    assert got[0] and got[1]
    assert not got[10] and not got[11]
    assert got[12]
    assert len(got) == 5
