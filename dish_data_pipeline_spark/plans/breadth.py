"""Breadth query suite: operators beyond the reference's literal
surface that a complete engine must offer (SURVEY.md §2 'not
present' notes + pyspark guide OLAP patterns): as-of joins, range
bucketing, pivot/unpivot, JSON field extraction, string/date scalar
functions, classic OLAP aggregates, cube, raw-zone partition
pruning, metadata enrichment.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dish_data_pipeline_spark.operators.asof import asof_join
from dish_data_pipeline_spark.operators.enrich import add_load_metadata
from dish_data_pipeline_spark.plans.common import (
    QueryDef,
    davg,
    dsum,
    read,
    scratch_dir,
    sql_davg,
    sql_dsum,
    widen,
)


# --- As-of join: latest signup before each event ------------------
def q_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_id")
    )
    joined = asof_join(e, signups, on="ts", by=["user_id"])
    return joined.select(
        "event_id",
        "user_id",
        F.col("signup_id_right").alias("signup_id"),
        F.col("ts_right").alias("signup_ts"),
    )


SQL_ASOF_SIGNUP = """
SELECT e.event_id, e.user_id,
       s.event_id AS signup_id, s.ts AS signup_ts
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
"""


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join with a tolerance (pandas
    merge_asof direction="nearest"): each event gets the CLOSEST
    signup of the same user within a day, ties to the backward row.
    Epoch-seconds join key so the distance arithmetic is integral
    in both engines; signups deduped to unique (user, sec) so the
    choice is deterministic."""
    e = read(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    signups = (
        base.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "sec")
        .agg(F.min("event_id").alias("signup_id"))
    )
    joined = asof_join(
        base.select("event_id", "user_id", "sec"),
        signups,
        on="sec",
        by=["user_id"],
        direction="nearest",
        tolerance=86400,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("signup_id_right").alias("signup_id"),
        F.col("sec_right").alias("signup_sec"),
    )


SQL_ASOF_NEAREST = """
WITH b AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events),
s AS (
  SELECT user_id, sec, CAST(MIN(event_id) AS BIGINT) AS signup_id
  FROM b WHERE event_type = 'signup' GROUP BY user_id, sec)
SELECT b.event_id, b.user_id, x.signup_id, x.sec AS signup_sec
FROM b LEFT JOIN LATERAL (
  SELECT s.signup_id, s.sec FROM s
  WHERE s.user_id = b.user_id AND abs(s.sec - b.sec) <= 86400
  ORDER BY abs(s.sec - b.sec) ASC, (s.sec <= b.sec) DESC
  LIMIT 1) x ON TRUE
"""


# --- Range join via bucketization ---------------------------------
def q_range_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    ranges = spark.createDataFrame(
        [(i, i * 50.0, (i + 1) * 50.0) for i in range(20)],
        "bucket long, lo double, hi double",
    )
    # range predicate (value >= lo AND value < hi) turned into an
    # equi-join on the bucket id — the scale-safe shape for range
    # joins with fixed-width bands (no BroadcastNestedLoop).
    bucketed = e.withColumn("bucket", F.floor(F.col("value") / 50.0))
    joined = bucketed.join(F.broadcast(ranges), "bucket").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("sum_value"),
    )


SQL_RANGE_BUCKET_JOIN = f"""
SELECT FLOOR(value / 50.0) * 50.0 AS lo,
       (FLOOR(value / 50.0) + 1) * 50.0 AS hi,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('value')} AS sum_value
FROM events
WHERE value >= 0 AND value < 1000  -- the ranges dimension's domain
GROUP BY 1, 2
"""


# --- Pivot --------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


SQL_PIVOT_EVENTS = """
SELECT user_id,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


# --- Unpivot ------------------------------------------------------
def q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "amount",
    )


SQL_UNPIVOT_LINEITEM = """
SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure,
       l_extendedprice AS amount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


# --- JSON field extraction ----------------------------------------
def q_json_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k_val"),
        (F.get_json_object(F.col("props"), "$.k").isNotNull()).alias("has_k"),
        F.get_json_object(F.col("props"), "$.missing").alias("missing_val"),
    )


SQL_JSON_FIELDS = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.k') IS NOT NULL AS has_k,
       json_extract_string(props, '$.missing') AS missing_val
FROM events
"""


# --- String scalar functions --------------------------------------
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(name).alias("upper_name"),
        F.lower(name).alias("lower_name"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.length(name).cast("bigint").alias("name_len"),
        F.concat(name, F.lit("|"), F.col("c_mktsegment")).alias("tagged"),
        F.regexp_extract(name, "([0-9]+)", 1).alias("digits"),
        F.reverse(name).alias("rev_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(name, F.lit("Customer"), F.lit("Cust")).alias("short_name"),
    )


SQL_STRING_FUNCS = """
SELECT c_custkey,
       UPPER(c_name) AS upper_name,
       LOWER(c_name) AS lower_name,
       SUBSTRING(c_name, 1, 8) AS prefix8,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
       c_name || '|' || c_mktsegment AS tagged,
       REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
       REVERSE(c_name) AS rev_name,
       LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       REPLACE(c_name, 'Customer', 'Cust') AS short_name
FROM customer
"""


# --- Date/time scalar functions -----------------------------------
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.datediff(F.to_date(d), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch0"),
        F.date_add(F.to_date(d), 30).alias("plus30"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(F.to_date(d)).alias("month_end"),
    )


SQL_DATE_FUNCS = """
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
       CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS days_since_epoch0,
       CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus30,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
"""


# --- TPC-H Q6 shape: filtered single aggregate --------------------
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_FORECAST_REVENUE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- TPC-H Q17 shape: per-group average as join filter ------------
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    p = read(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    avg_qty = li.groupBy("l_partkey").agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


SQL_SMALL_QTY_REVENUE = f"""
WITH avg_qty AS (
  SELECT l_partkey, {sql_davg('l_quantity')} AS avg_qty
  FROM lineitem GROUP BY l_partkey)
SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty USING (l_partkey)
WHERE p_size < 10 AND l_quantity < 0.2 * avg_qty
"""


# --- CUBE grouping ------------------------------------------------
def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return e.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("sum_value"),
    )


SQL_CUBE_EVENTS = f"""
SELECT event_type, user_id % 10 AS user_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('value')} AS sum_value
FROM events GROUP BY CUBE (event_type, user_bucket)
"""


# --- Raw-zone roundtrip: partitioned write + pruned read (S2) -----
def q_raw_zone_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    out = scratch_dir(
        "raw_zone", os.path.basename(sf_dir.rstrip("/"))
    )
    (
        e.select(
            "event_id",
            "event_type",
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
            F.dayofmonth("ts").alias("day"),
        )
        .write.mode("overwrite")
        .partitionBy("year", "month", "day")
        .json(out)
    )
    back = spark.read.schema(
        "event_id long, event_type string, year int, month int, day int"
    ).json(out)
    # partition filter → directory pruning, only day=15 files read
    return (
        back.filter(F.col("day") == 15)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_RAW_ZONE_ROUNDTRIP = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE EXTRACT(day FROM ts) = 15
GROUP BY event_type
"""


# --- Avro interchange roundtrip: two-tier write + read + agg ------
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro interchange certification, end to end through the io
    entry points' two-tier routing: orders → ``write_table(fmt=
    "avro")`` → ``read_any`` → aggregate. On a session with the
    spark-avro JVM module this exercises the vectorized path; on a
    bare session (this sandbox, the driver harness) it exercises the
    pure-Python object-container tier (``sources.avro_python`` —
    executor-parallel encode to one container file per partition,
    ``binaryFiles``-fanned decode), whose spec conformance is pinned
    cross-implementation against the Apache Avro Java library in
    tests/test_avro_python.py. Values survive bit-exactly either
    way: the oracle aggregates the same columns straight from the
    parquet source. Money rides as floor-quantized BIGINT cents so
    the hash compare is float-order-free. The container directory is
    orders-sized, so it is removed as soon as the aggregate is
    materialized (the 3-row result returns as a local DataFrame)."""
    from dish_data_pipeline_spark.io import read_any, write_table

    o = read(spark, sf_dir, "orders")
    out = scratch_dir(
        "avro_rt", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(out, ignore_errors=True)
    # widen BEFORE the sink: the pure-Python encode is CPU-bound
    # per row, and orders arrives as ONE ~3 MB scan split — without
    # this the whole container encode (and the read-back decode,
    # which parallelizes per container file) runs on a single core
    # (measured 1.2 s + 0.9 s single-threaded at sf0.1). At real
    # scale the input already carries >= cluster-width partitions
    # and widen is a no-op (plans/common.py).
    write_table(
        widen(
            o.select(
                "o_orderkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
            ),
            spark,
        ),
        out,
        "avro",
    )
    back = read_any(spark, out, "avro")
    agg = back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr(
                "CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)"
            )
        ).alias("cents"),
        F.min("o_orderdate").alias("first_day"),
        F.max("o_orderdate").alias("last_day"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
    )
    rows = agg.collect()  # 3 rows (order statuses) — bounded
    shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, agg.schema)


SQL_AVRO_ROUNDTRIP = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100)
                     AS BIGINT)) AS BIGINT) AS cents,
       MIN(o_orderdate) AS first_day,
       MAX(o_orderdate) AS last_day,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders GROUP BY o_orderstatus
"""


# --- REST ingest roundtrip (S1): paginated API → raw zone → agg ----
REST_PAGE_SIZE = 100


def q_rest_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 end-to-end against an in-process fake paginated API
    (reference pipeline/data_pipeline.py:26-65). The fake serves the
    ``customer`` table sorted by key, 100 records/page, and pins all
    three reference stop/envelope semantics observably:

    - envelope alternates ``records`` (odd pages) / ``data`` (even
      pages) — both must be honored (ref :41);
    - continuation alternates ``pagination.has_next`` / ``hasMore``
      (ref :55), and every served page claims more — so the ONLY
      stop is…
    - …a mid-stream non-200: pages past ``ceil(n/100) - 2`` return
      404 (ref :36-38). A loop that ignored the status would fetch
      2 extra pages and fail the count/sum oracle.

    Records land page-per-file in a date-partitioned raw zone
    (S2 layout), are re-read from the LANDED files with an explicit
    schema, and aggregate per segment. The driver-side collect IS the
    fake API's backing store — bounded by the feed scale (the
    reference ingests ~3k rows/run), not a distributed-path collect.
    """
    import json as _json
    import shutil

    from dish_data_pipeline_spark.sources.rest import fetch_paginated_data

    c = (
        read(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy("c_custkey")
    )
    rows = [r.asDict() for r in c.collect()]
    ps = REST_PAGE_SIZE
    pages = [rows[i : i + ps] for i in range(0, len(rows), ps)]
    last_ok = max(len(pages) - 2, 1)  # pages past this 404 mid-stream

    def fake_get(url: str):
        page = int(url.rsplit("page=", 1)[1])
        if page > last_ok:
            return 404, None
        chunk = pages[page - 1]
        if page % 2 == 1:
            return 200, {"records": chunk, "pagination": {"has_next": True}}
        return 200, {"data": chunk, "hasMore": True}

    out = scratch_dir(
        "rest_raw", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(out, ignore_errors=True)
    records, landed = fetch_paginated_data(
        "http://fake", "customers", http_get=fake_get,
        raw_zone_dir=out, name="customers",
    )
    assert len(landed) == last_ok, "one landed JSON file per fetched page"
    back = spark.read.schema(
        "c_custkey long, c_mktsegment string, c_acctbal double"
    ).json(landed)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("c_acctbal")).alias("sum_acctbal"),
        F.min("c_custkey").alias("min_ck"),
        F.max("c_custkey").alias("max_ck"),
    )


SQL_REST_INGEST_ROUNDTRIP = f"""
WITH lim AS (
  SELECT GREATEST(CAST(CEIL(COUNT(*) / {REST_PAGE_SIZE}.0) AS BIGINT) - 2, 1)
         * {REST_PAGE_SIZE} AS k
  FROM customer),
fetched AS (
  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal
  FROM customer
  QUALIFY ROW_NUMBER() OVER (ORDER BY c_custkey) <= (SELECT k FROM lim))
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('c_acctbal')} AS sum_acctbal,
       MIN(c_custkey) AS min_ck, MAX(c_custkey) AS max_ck
FROM fetched GROUP BY c_mktsegment
"""


# --- Distributed REST fetch (S1 scale tier) -------------------------
REST_DIST_PAGES = 40
REST_DIST_PER_PAGE = 50


def _rest_dist_page_get(url: str):
    """Module-level fake HTTP for the DISTRIBUTED fetch tier — must be
    picklable into executor tasks, so it's a pure function of the page
    number (each record's payload derives from its global index via
    the Knuth multiplier; both engines recompute it exactly). Envelope
    alternates records/data so the executor-side extraction pins the
    same reference semantics as the driver tier."""
    page = int(url.rsplit("page=", 1)[1])
    if page > REST_DIST_PAGES:
        return 404, None
    base = (page - 1) * REST_DIST_PER_PAGE
    chunk = [
        {"k": base + i, "v": ((base + i) * 2654435761) % 1000003}
        for i in range(REST_DIST_PER_PAGE)
    ]
    if page % 2 == 1:
        return 200, {"records": chunk, "pagination": {"has_next": True}}
    return 200, {"data": chunk, "hasMore": True}


def q_rest_distributed_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1's 100 TB path: a known page range fanned out over executors
    with ``mapPartitions`` (``fetch_pages_distributed``,
    sources/rest.py:124 — each task fetches its page slice with its
    own HTTP session). The returned raw-JSON strings parse against an
    EXPLICIT schema (``from_json``; inference drift is a recorded
    reference defect class, SURVEY.md §7.4.4) and aggregate per
    bucket — any dropped/duplicated page or mangled record shifts the
    counts and index-derived checksums."""
    from dish_data_pipeline_spark.sources.rest import (
        fetch_pages_distributed,
    )

    read(spark, sf_dir, "region")  # pin session confs like every entry
    raw = fetch_pages_distributed(
        spark, "http://fake", "items", n_pages=REST_DIST_PAGES,
        partitions=8, http_get=_rest_dist_page_get,
    )
    parsed = raw.select(
        F.from_json(F.col("json"), "k long, v long").alias("r")
    ).select("r.k", "r.v")
    return (
        parsed.groupBy((F.col("k") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_REST_DISTRIBUTED_FETCH = f"""
WITH ks AS (
  SELECT UNNEST(generate_series(0,
           {REST_DIST_PAGES * REST_DIST_PER_PAGE - 1})) AS k)
SELECT k % 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((k * 2654435761) % 1000003) AS BIGINT) AS sum_v,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM ks GROUP BY bucket
"""


# --- Audit trail (S4): run_feed success + DQ-failure paths ---------
def q_audit_trail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end-to-end: two feeds through ``run_feed`` (reference
    main(), pipeline/data_pipeline.py:245-272), then the audit table
    itself is the result — certifying the ARRAY<STRING>
    ``source_files`` column (ref :219-242) and the audit-on-DQ-failure
    row (ref :259-262, minus its unbound-variable bug).

    - ``nation_feed``: every nation row served TWICE (10/page) —
      the pre-DQ keyed dedup (D1, ref :84-85) must collapse them so
      DQ passes and the audited count is the distinct-key count;
    - ``region_feed``: rows served without ``r_name`` while the
      policy requires it → fatal DQ (Q2) → FAILED audit row with
      count 0 but the landed page still in ``source_files``.

    Output projects the deterministic audit columns (the audit
    timestamp is wall-clock by contract, X2) plus the landed-file
    COUNT — the paths themselves embed tmp dir + load date.
    """
    import shutil

    from dish_data_pipeline_spark.pipeline import FeedConfig, run_feed

    serve: dict[str, list[dict]] = {}
    n_rows = [
        r.asDict()
        for r in read(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    ]
    serve["nations"] = [r for r in n_rows for _ in (0, 1)]  # each twice
    serve["regions"] = [
        {"r_regionkey": r["r_regionkey"]}  # r_name withheld → Q2 fatal
        for r in read(spark, sf_dir, "region")
        .select("r_regionkey")
        .orderBy("r_regionkey")
        .collect()
    ]

    def fake_get(url: str):
        endpoint = url.rsplit("/", 1)[1].split("?")[0]
        page = int(url.rsplit("page=", 1)[1])
        rows = serve[endpoint]
        chunk = rows[(page - 1) * 10 : page * 10]
        return 200, {
            "records": chunk,
            "pagination": {"has_next": page * 10 < len(rows)},
        }

    wh = scratch_dir(
        "audit_wh", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(wh, ignore_errors=True)
    feeds = [
        FeedConfig("nation_feed", "nations", keys=["n_nationkey"],
                   required=["n_nationkey", "n_name"]),
        FeedConfig("region_feed", "regions", keys=["r_regionkey"],
                   required=["r_regionkey", "r_name"]),
    ]
    for feed in feeds:
        run_feed(spark, feed, "http://fake", wh, http_get=fake_get,
                 load_date=dt.date(2024, 2, 1))
    audit = spark.read.parquet(os.path.join(wh, "load_audit"))
    return (
        audit.select(
            "table_name",
            "record_count",
            "status",
            F.size("source_files").alias("n_source_files"),
        ).orderBy("table_name")
    )


SQL_AUDIT_TRAIL = """
SELECT 'nation_feed' AS table_name,
       (SELECT CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) FROM nation)
         AS record_count,
       'SUCCESS' AS status,
       CAST((SELECT CEIL(COUNT(*) * 2 / 10.0) FROM nation) AS INT)
         AS n_source_files
UNION ALL
SELECT 'region_feed',
       CAST(0 AS BIGINT),
       'FAILED: Missing required columns: [''r_name'']',
       CAST((SELECT CEIL(COUNT(*) / 10.0) FROM region) AS INT)
ORDER BY table_name
"""


# --- DQ recovery (D2/X9): recoverable-duplicate dedup-and-continue
DQ_RECOVERY_PER_PAGE = 200


def q_dq_recovery_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/X9 end-to-end: the recoverable-duplicate routing of
    ``run_feed`` (reference pipeline/data_pipeline.py:253-258 — the
    "duplicate" containment branch that dedups and CONTINUES the
    load instead of skipping it).

    A ga_sessions-shaped feed serves every visitId TWICE with
    DIFFERENT payloads (hits 1 vs 2). No ``visit_date`` column, so
    the pre-DQ dedup is FULL-ROW (D1, ref :84-85) and both copies
    survive to the DQ gate; Q4 flags ``Found N duplicate records``
    (recoverable), run_feed dedups by the feed keys and continues,
    and the SUCCESS audit row carries the DEDUPED count. Had the
    recovery branch not fired, the count would be 2N (DQ silently
    green) or the status FAILED (fatal routing) — either way a
    driver hash mismatch.

    ``dedup_keyed`` keeps an arbitrary row per key, so the output
    pins only key-deterministic facts: the audit row plus target
    aggregates over columns both copies agree on.
    """
    import shutil

    from dish_data_pipeline_spark.pipeline import FeedConfig, run_feed

    custs = [
        (int(r["c_custkey"]), r["c_mktsegment"])
        for r in read(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
        .collect()
    ]
    rows = [
        {"visitId": k, "channelGrouping": seg, "hits": h}
        for k, seg in custs
        for h in (1, 2)  # key-duplicate, NOT an exact-row duplicate
    ]

    def fake_get(url: str):
        page = int(url.rsplit("page=", 1)[1])
        per = DQ_RECOVERY_PER_PAGE
        chunk = rows[(page - 1) * per : page * per]
        return 200, {
            "records": chunk,
            "pagination": {"has_next": page * per < len(rows)},
        }

    wh = scratch_dir(
        "dqrec_wh", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(wh, ignore_errors=True)
    feed = FeedConfig("ga_sessions", "ga_sessions",
                      keys=["visitId", "source_file"],
                      required=["visitId", "channelGrouping"])
    run_feed(spark, feed, "http://fake", wh, http_get=fake_get,
             load_date=dt.date(2024, 2, 1))
    audit = spark.read.parquet(os.path.join(wh, "load_audit")).select(
        "table_name",
        "record_count",
        "status",
        F.size("source_files").alias("n_source_files"),
    )
    tgt = spark.read.parquet(os.path.join(wh, "tgt_ga_sessions")).agg(
        F.count(F.lit(1)).alias("tgt_rows"),
        F.sum("visitId").alias("sum_visit_ids"),
        F.count_distinct("channelGrouping").alias("n_channels"),
    )
    return audit.crossJoin(tgt)


SQL_DQ_RECOVERY_ROUNDTRIP = f"""
SELECT 'ga_sessions' AS table_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS record_count,
       'SUCCESS' AS status,
       CAST(CEIL((SELECT COUNT(*) FROM customer) * 2
                 / {DQ_RECOVERY_PER_PAGE}.0) AS INT) AS n_source_files,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS tgt_rows,
       (SELECT CAST(SUM(c_custkey) AS BIGINT) FROM customer)
         AS sum_visit_ids,
       (SELECT CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT)
          FROM customer) AS n_channels
"""


# --- Load-metadata enrichment (P1/P2, deterministic replay form) --
def q_enrich_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    return add_load_metadata(e, load_date=dt.date(2024, 2, 1)).select(
        "event_id", "load_timestamp", "source_file"
    )


SQL_ENRICH_METADATA = """
SELECT event_id,
       TIMESTAMP '2024-02-01 00:00:00' AS load_timestamp,
       '2024-02-01' AS source_file
FROM events
"""


# --- Partition-pruned MERGE (the 100 TB upsert shape) -------------
def q_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dish_data_pipeline_spark.operators.upsert_partitioned import (
        upsert_partitioned,
        write_partitioned_target,
    )

    e = read(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", "event_type", "value", F.to_date("ts").alias("day")
    )
    path = scratch_dir(
        "part_tgt", os.path.basename(sf_dir.rstrip("/"))
    )
    write_partitioned_target(base, path, "day")

    day15 = base.filter(F.dayofmonth(F.col("day")) == 15)
    staging = day15.withColumn("value", F.col("value") * 2).unionByName(
        day15.withColumn("event_id", F.col("event_id") + 10_000_000)
    )
    upsert_partitioned(
        spark, path, staging, keys=["day", "event_id"], partition_col="day"
    )
    return (
        spark.read.parquet(path)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )


SQL_PARTITIONED_MERGE = f"""
WITH base AS (
  SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS day
  FROM events),
stg AS (
  SELECT event_id, day, value * 2 AS value FROM base
  WHERE EXTRACT(day FROM day) = 15
  UNION ALL
  SELECT event_id + 10000000 AS event_id, day, value FROM base
  WHERE EXTRACT(day FROM day) = 15),
merged AS (
  SELECT b.day, b.value FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM stg s
                    WHERE s.day = b.day AND s.event_id = b.event_id)
  UNION ALL
  SELECT day, value FROM stg)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n, {sql_dsum('value')} AS sum_value
FROM merged GROUP BY day
"""


# --- SCD2 history maintenance (CDC pattern) -----------------------
def q_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dish_data_pipeline_spark.operators.scd2 import scd2_apply

    o = read(spark, sf_dir, "orders")
    history = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    snapshot = o.select(
        F.when(F.col("o_orderkey") % 31 == 0, F.col("o_orderkey") + 20_000_000)
        .otherwise(F.col("o_orderkey"))
        .alias("o_orderkey"),
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    return scd2_apply(
        history, snapshot, ["o_orderkey"], ["price"], "2024-01-01"
    )


SQL_SCD2_ORDERS = """
WITH snap AS (
  SELECT CASE WHEN o_orderkey % 31 = 0 THEN o_orderkey + 20000000
              ELSE o_orderkey END AS o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS price
  FROM orders)
-- unchanged current rows (key present with identical price, or key
-- absent from the snapshot)
SELECT o.o_orderkey, o.o_totalprice AS price,
       DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM snap s
                  WHERE s.o_orderkey = o.o_orderkey
                    AND s.price <> o.o_totalprice)
UNION ALL
-- closed versions of changed keys
SELECT o.o_orderkey, o.o_totalprice AS price,
       DATE '2020-01-01', DATE '2024-01-01'
FROM orders o
WHERE EXISTS (SELECT 1 FROM snap s
              WHERE s.o_orderkey = o.o_orderkey
                AND s.price <> o.o_totalprice)
UNION ALL
-- new open versions: changed keys + brand-new keys
SELECT s.o_orderkey, s.price, DATE '2024-01-01', CAST(NULL AS DATE)
FROM snap s
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = s.o_orderkey
                    AND o.o_totalprice = s.price)
"""


# --- Exact quantiles (linear interpolation, both engines) ---------
def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile(F.col("value"), 0.5).alias("p50"),
        F.percentile(F.col("value"), 0.9).alias("p90"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


SQL_VALUE_QUANTILES = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       MIN(value) AS vmin,
       MAX(value) AS vmax
FROM events GROUP BY event_type
"""


# --- Snapshot diff (reconciliation / CDC extraction) --------------
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed reconciliation of two snapshot versions of ``orders``
    derived deterministically from the base table (every 97th key
    absent from old = inserts, every 101st absent from new = deletes,
    every 7th repriced = updates); emits the non-unchanged delta
    rows. One full-outer key join; change classification is map-side
    null-safe comparison with injected presence markers."""
    from dish_data_pipeline_spark.operators.diff import snapshot_diff

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 97 != 0)
    new = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * F.lit(1.1)
        ).otherwise(F.col("o_totalprice")),
    )
    d = snapshot_diff(
        old,
        new,
        ["o_orderkey"],
        ["o_totalprice", "o_orderstatus"],
        include_unchanged=False,
    )
    return d.select(
        "o_orderkey",
        "change_type",
        F.col("old_o_totalprice").alias("old_price"),
        F.col("new_o_totalprice").alias("new_price"),
    )


SQL_SNAPSHOT_DIFF = """
WITH old_s AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
  WHERE o_orderkey % 97 <> 0),
new_s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 101 <> 0),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         o.o_totalprice AS old_price, n.o_totalprice AS new_price,
         o.o_orderstatus AS old_status, n.o_orderstatus AS new_status
  FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey),
c AS (
  SELECT o_orderkey,
         CASE WHEN NOT in_old THEN 'insert'
              WHEN NOT in_new THEN 'delete'
              WHEN old_price IS DISTINCT FROM new_price
                OR old_status IS DISTINCT FROM new_status THEN 'update'
              ELSE 'unchanged' END AS change_type,
         old_price, new_price
  FROM j)
SELECT o_orderkey, change_type, old_price, new_price
FROM c WHERE change_type <> 'unchanged'
"""


def q_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation health check for the same derived snapshot
    pair: per-change_type row counts via
    :func:`operators.diff.diff_summary` — the common 100 TB path
    that needs insert/update/delete/unchanged totals WITHOUT ever
    materializing the wide full-outer output (Catalyst prunes the
    old_/new_ value columns down to the two compared ones; the
    aggregate is 4-row-bounded with map-side combine)."""
    from dish_data_pipeline_spark.operators.diff import diff_summary

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 97 != 0)
    new = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * F.lit(1.1)
        ).otherwise(F.col("o_totalprice")),
    )
    return diff_summary(old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance demonstrated end-to-end: the
    per-priority (count, revenue-sum) aggregate of the OLD ``orders``
    snapshot is rolled forward through the snapshot delta (inserts =
    every 97th key, deletes = every 101st, repriced updates = every
    7th, and every 77th key MOVES to a synthetic '9-MOVED' priority
    to exercise cross-group retraction) — never rescanning the new
    snapshot. The oracle computes the aggregate directly over the
    new snapshot, so the driver's hash compare certifies
    delta-maintenance ≡ full recompute, exactly (DECIMAL
    accumulation; see :func:`operators.diff.incremental_agg_update`).
    Cost is O(|delta| + |groups|) regardless of base-table size."""
    from dish_data_pipeline_spark.operators.diff import (
        grouped_agg,
        incremental_agg_update,
        snapshot_diff,
    )

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 97 != 0)
    new = (
        o.filter(F.col("o_orderkey") % 101 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0,
                F.col("o_totalprice") * F.lit(1.1),
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderpriority",
            F.when(
                F.col("o_orderkey") % 77 == 0, F.lit("9-MOVED")
            ).otherwise(F.col("o_orderpriority")),
        )
    )
    agg_old = grouped_agg(old, ["o_orderpriority"], ["o_totalprice"])
    delta = snapshot_diff(
        old,
        new,
        ["o_orderkey"],
        ["o_totalprice", "o_orderpriority"],
        include_unchanged=False,
    )
    rolled = incremental_agg_update(
        agg_old, delta, ["o_orderpriority"], ["o_totalprice"]
    )
    return rolled.select(
        "o_orderpriority",
        "n_rows",
        F.col("sum_o_totalprice").cast("double").alias("sum_price"),
    )


def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-view incremental maintenance
    (:func:`operators.diff.incremental_join_update`): the
    materialized ``orders ⋈ customer`` view is rolled forward from
    BOTH sides' change feeds without re-joining fact×dim. The
    planted deltas exercise every algebra term: fact inserts
    (%97 keys), fact deletes (%101), repriced fact updates (%7),
    fact rows MOVING to a different customer (%31 → custkey+1, the
    cross-key case), dim updates (%13 repriced balances, patched
    in place on surviving fan-out), dim deletes (%59, killing their
    fan-out), and dim inserts (%41 keys absent from the old dim,
    REVIVING previously-dangling orders). Oracle: the new snapshots
    joined from scratch — hash-identical or the maintenance algebra
    is wrong."""
    from dish_data_pipeline_spark.operators.diff import (
        incremental_join_update,
        snapshot_diff,
    )

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        "o_totalprice",
    )
    c = read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment", "c_acctbal"
    )
    old_fact = o.filter(F.col("o_orderkey") % 97 != 0)
    new_fact = (
        o.filter(F.col("o_orderkey") % 101 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0,
                F.col("o_totalprice") * F.lit(1.1),
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "custkey",
            F.when(
                F.col("o_orderkey") % 31 == 0, F.col("custkey") + 1
            ).otherwise(F.col("custkey")),
        )
    )
    old_dim = c.filter(F.col("custkey") % 41 != 0)
    new_dim = c.filter(F.col("custkey") % 59 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("custkey") % 13 == 0, F.col("c_acctbal") * F.lit(1.05)
        ).otherwise(F.col("c_acctbal")),
    )
    view_old = old_fact.join(old_dim, ["custkey"], "inner").select(
        "o_orderkey", "custkey", "o_totalprice", "c_mktsegment", "c_acctbal"
    )
    fact_delta = snapshot_diff(
        old_fact, new_fact, ["o_orderkey"],
        ["custkey", "o_totalprice"], include_unchanged=False,
    )
    dim_delta = snapshot_diff(
        old_dim, new_dim, ["custkey"],
        ["c_mktsegment", "c_acctbal"], include_unchanged=False,
    )
    return incremental_join_update(
        view_old, fact_delta, dim_delta, new_fact, new_dim,
        "o_orderkey", "custkey",
        ["o_totalprice"], ["c_mktsegment", "c_acctbal"],
    )


SQL_INCREMENTAL_JOIN = """
SELECT o.o_orderkey,
       CASE WHEN o.o_orderkey % 31 = 0 THEN o.o_custkey + 1
            ELSE o.o_custkey END AS custkey,
       CASE WHEN o.o_orderkey % 7 = 0 THEN o.o_totalprice * 1.1
            ELSE o.o_totalprice END AS o_totalprice,
       c.c_mktsegment,
       CASE WHEN c.c_custkey % 13 = 0 THEN c.c_acctbal * 1.05
            ELSE c.c_acctbal END AS c_acctbal
FROM orders o
JOIN customer c
  ON c.c_custkey = CASE WHEN o.o_orderkey % 31 = 0
                        THEN o.o_custkey + 1 ELSE o.o_custkey END
WHERE o.o_orderkey % 101 <> 0 AND c.c_custkey % 59 <> 0
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC round trip: the snapshot delta (same derived old/new
    ``orders`` pair as ``snapshot_diff_orders``) is applied back
    onto the OLD snapshot — untouched rows pass by anti-join,
    inserts/updates land with carried values, deletes vanish. The
    oracle builds the NEW snapshot directly, so the hash compare
    certifies ship-the-delta replication reconstructs the table
    exactly (:func:`operators.diff.apply_changes`)."""
    from dish_data_pipeline_spark.operators.diff import (
        apply_changes,
        snapshot_diff,
    )

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 97 != 0)
    new = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * F.lit(1.1)
        ).otherwise(F.col("o_totalprice")),
    )
    delta = snapshot_diff(
        old,
        new,
        ["o_orderkey"],
        ["o_totalprice", "o_orderstatus"],
        include_unchanged=False,
    )
    return apply_changes(
        old, delta, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


SQL_CDC_APPLY = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
            ELSE o_totalprice END AS o_totalprice,
       o_orderstatus
FROM orders WHERE o_orderkey % 101 <> 0
"""


SQL_INCREMENTAL_AGG = """
WITH new_s AS (
  SELECT CASE WHEN o_orderkey % 77 = 0 THEN '9-MOVED'
              ELSE o_orderpriority END AS o_orderpriority,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 101 <> 0)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM new_s GROUP BY o_orderpriority
"""


SQL_DIFF_SUMMARY = """
WITH old_s AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
  WHERE o_orderkey % 97 <> 0),
new_s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 101 <> 0),
j AS (
  SELECT o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         o.o_totalprice AS old_price, n.o_totalprice AS new_price,
         o.o_orderstatus AS old_status, n.o_orderstatus AS new_status
  FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey)
SELECT CASE WHEN NOT in_old THEN 'insert'
            WHEN NOT in_new THEN 'delete'
            WHEN old_price IS DISTINCT FROM new_price
              OR old_status IS DISTINCT FROM new_status THEN 'update'
            ELSE 'unchanged' END AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM j GROUP BY 1
"""


# --- Higher-order array function suite -----------------------------
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function breadth over per-order lineitem
    arrays: transform / filter / exists / forall / aggregate (fold) /
    zip_with / slice / array_max / array_distinct / array_sort.

    Determinism: arrays are pinned to (``l_linenumber``,
    ``l_quantity``, ``l_extendedprice``) order — the testdata reuses
    linenumbers within an order, so ``sort_array`` of the full struct
    and the SQL twin's three-key ``ORDER BY`` break ties identically; quantities are
    integral → BIGINT, prices fold as exact integer cents
    (``round(p*100)``), and array outputs serialize via
    ``array_join`` so the driver hash-compares plain strings.
    The DuckDB twin builds the same ordered lists with
    ``list(x ORDER BY l_linenumber)`` and closes the fold as plain
    integer aggregates (values, not mechanics, are the contract)."""
    li = read(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 97 == 0
    )
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct("l_linenumber", "l_quantity", "l_extendedprice")
            )
        ).alias("ls")
    )
    qty = "transform(ls, x -> CAST(x.l_quantity AS BIGINT))"
    cents = "transform(ls, x -> CAST(round(x.l_extendedprice * 100) AS BIGINT))"
    return g.select(
        "l_orderkey",
        F.size("ls").alias("n_items"),
        F.expr(f"array_join(transform({qty}, v -> CAST(v AS STRING)), ',')")
        .alias("qty_csv"),
        F.expr(f"aggregate({qty}, 0L, (a, v) -> a + v)").alias("qty_total"),
        F.expr(f"size(filter({qty}, v -> v > 25))").alias("n_big"),
        F.expr(f"exists({qty}, v -> v < 5)").alias("any_small"),
        F.expr(f"forall({cents}, v -> v > 0)").alias("all_paid"),
        F.expr(
            f"aggregate(zip_with({qty}, {cents}, (q, p) -> q * p), "
            "0L, (a, v) -> a + v)"
        ).alias("rev_cents"),
        F.expr(
            f"array_join(transform(slice({qty}, 1, 2), "
            "v -> CAST(v AS STRING)), ',')"
        ).alias("first_two"),
        F.expr(f"array_max({qty})").alias("qty_max"),
        F.expr(
            f"array_join(transform(array_sort(array_distinct({qty})), "
            "v -> CAST(v AS STRING)), ',')"
        ).alias("qty_distinct_csv"),
    )


SQL_ARRAY_FUNCS = """
WITH g AS (
  SELECT l_orderkey,
         list(CAST(l_quantity AS BIGINT)
              ORDER BY l_linenumber, l_quantity, l_extendedprice) AS qty,
         list(CAST(round(l_extendedprice * 100) AS BIGINT)
              ORDER BY l_linenumber, l_quantity, l_extendedprice) AS cents
  FROM lineitem WHERE l_orderkey % 97 = 0
  GROUP BY l_orderkey)
SELECT l_orderkey,
       CAST(len(qty) AS INTEGER) AS n_items,
       array_to_string(qty, ',') AS qty_csv,
       CAST(list_sum(qty) AS BIGINT) AS qty_total,
       CAST(len(list_filter(qty, v -> v > 25)) AS INTEGER) AS n_big,
       len(list_filter(qty, v -> v < 5)) > 0 AS any_small,
       len(list_filter(cents, v -> v <= 0)) = 0 AS all_paid,
       CAST(list_sum(list_transform(range(1, len(qty) + 1),
            i -> qty[i] * cents[i])) AS BIGINT) AS rev_cents,
       array_to_string(qty[1:2], ',') AS first_two,
       CAST(list_max(qty) AS BIGINT) AS qty_max,
       array_to_string(list_sort(list_distinct(qty)), ',')
         AS qty_distinct_csv
FROM g
"""


# --- Conditional-aggregate suite ------------------------------------
def q_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate breadth: count_if, bool_or
    (ANY), bool_and (EVERY), FILTER-style conditional sums (exact
    integer cents), and a conditional distinct count — the grouped
    one-pass profile shapes. All outputs integral or boolean."""
    li = read(spark, sf_dir, "lineitem")
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    return li.groupBy("l_returnflag").agg(
        F.expr("count_if(l_quantity > 25)").alias("n_big_qty"),
        F.expr("bool_or(l_discount > 0.09)").alias("any_deep_discount"),
        F.expr("bool_and(l_tax >= 0)").alias("all_taxed_nonneg"),
        F.sum(
            F.when(F.col("l_shipdate") >= F.lit("1996-01-01"), cents)
            .otherwise(F.lit(0))
        ).alias("cents_since_96"),
        F.countDistinct(
            F.when(F.col("l_quantity") < 5, F.col("l_partkey"))
        ).alias("n_small_parts"),
    )


SQL_CONDITIONAL_AGGS = """
SELECT l_returnflag,
       CAST(COUNT(*) FILTER (l_quantity > 25) AS BIGINT) AS n_big_qty,
       bool_or(l_discount > 0.09) AS any_deep_discount,
       bool_and(l_tax >= 0) AS all_taxed_nonneg,
       CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                     THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS cents_since_96,
       CAST(COUNT(DISTINCT CASE WHEN l_quantity < 5
                                THEN l_partkey END) AS BIGINT)
         AS n_small_parts
FROM lineitem GROUP BY l_returnflag
"""


# --- Explicit GROUPING SETS + grouping_id --------------------------
def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS beyond CUBE/ROLLUP — the four sets
    ((status), (priority), (status, priority), ()) with the standard
    ``grouping_id`` bitmask distinguishing a rolled-up NULL from a
    data NULL. Expressed through ``spark.sql`` (grouping sets have no
    DataFrame-API spelling); both engines emit the same SQL-standard
    bitmask (status bit 2, priority bit 1)."""
    o = read(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
       count(1) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         AS total_price
FROM orders_gs
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
"""
    )


SQL_GROUPING_SETS_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
"""


# --- Distribution-rank window suite ---------------------------------
def q_percentile_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile(7) / nth_value breadth (the
    distribution half of the ranking family; ``rank_suite`` covers
    the counting half). The window order (value DESC, event_id) is a
    total order, so tie semantics never diverge; percent_rank and
    cume_dist are single integer-ratio IEEE divisions on both
    engines."""
    e = read(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        e.select(
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
            F.percent_rank().over(w).alias("prank"),
            F.cume_dist().over(w).alias("cdist"),
            F.ntile(7).over(w).alias("septile"),
            F.nth_value("event_id", 3).over(w).alias("third_id"),
        )
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )


SQL_PERCENTILE_SUITE = """
SELECT event_id, event_type, prank, cdist,
       CAST(septile AS INT) AS septile, third_id
FROM (
  SELECT event_id, event_type,
         ROW_NUMBER() OVER w AS rn,
         PERCENT_RANK() OVER w AS prank,
         CUME_DIST() OVER w AS cdist,
         NTILE(7) OVER w AS septile,
         NTH_VALUE(event_id, 3) OVER w AS third_id
  FROM events
  WINDOW w AS (PARTITION BY event_type
               ORDER BY value DESC, event_id ASC)) t
WHERE rn <= 50
"""


# --- Per-group statistical mode -------------------------------------
def q_mode_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority modal order month with a deterministic (count
    DESC, month ASC) tiebreak, plus its share of the group — the
    window-over-counts spelling that stays exact where a built-in
    ``mode()`` leaves ties engine-defined."""
    o = read(spark, sf_dir, "orders")
    m = o.select(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("month"),
    )
    counts = m.groupBy("o_orderpriority", "month").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n"), F.asc("month")
    )
    wt = Window.partitionBy("o_orderpriority")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("total", F.sum("n").over(wt))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("month").alias("modal_month"),
            F.col("n").alias("modal_n"),
            (F.col("n").cast("double") / F.col("total").cast("double"))
            .alias("modal_share"),
        )
    )


SQL_MODE_STAT = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY n DESC, month ASC) AS rn,
         SUM(n) OVER (PARTITION BY o_orderpriority) AS total
  FROM c)
SELECT o_orderpriority, month AS modal_month, n AS modal_n,
       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS modal_share
FROM r WHERE rn = 1
"""


# --- Map-type function suite ----------------------------------------
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type breadth: map_from_entries / element_at / map_filter /
    transform_values / map_keys over a per-user event_type→count map
    (users sampled by key hash). Map iteration order is
    engine-defined, so every map-valued output serializes through
    the key-sorted entry list (the array analogue of the
    ``array_join`` device); the DuckDB twin computes the same values
    from the plain grouped relation — values, not map mechanics, are
    the contract."""
    e = read(spark, sf_dir, "events").filter(
        F.col("user_id") % 101 == 0
    )
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    g = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return g.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("n_click"),
        F.expr("size(map_filter(m, (k, v) -> v >= 3))").alias("n_heavy"),
        F.array_join(F.expr("map_keys(m)"), ",").alias("types_csv"),
        F.expr(
            "array_join(transform(map_entries("
            "transform_values(m, (k, v) -> v * 2)), "
            "e -> concat(e.key, ':', CAST(e.value AS STRING))), ',')"
        ).alias("doubled_csv"),
    )


SQL_MAP_FUNCS = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id % 101 = 0
  GROUP BY user_id, event_type)
SELECT user_id,
       CAST(COUNT(*) AS INTEGER) AS n_types,
       CAST(COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0)
            AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (n >= 3) AS INTEGER) AS n_heavy,
       string_agg(event_type, ',' ORDER BY event_type) AS types_csv,
       string_agg(event_type || ':' || CAST(n * 2 AS VARCHAR), ','
                  ORDER BY event_type) AS doubled_csv
FROM c GROUP BY user_id
"""


# --- Order-independent partition checksums -------------------------
def q_partition_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month content checksums of ``orders`` — the replication-
    verification primitive that pairs with `snapshot_diff` /
    `cdc_apply`: two replicas compare the (tiny) checksum relation
    and re-ship only diverging partitions instead of diffing 100 TB
    row by row.

    Each row folds to a canonical string (NULLs sentinel-coalesced —
    ``concat_ws`` silently drops NULLs; totalprice as exact integer
    cents; the timestamp as its DATE string so both engines format
    identically), hashes through the portable 60-bit md5 device
    (``ops/portable.py``), and combines order-independently two ways:
    BIT_XOR (order- and overflow-free, but blind to duplicate-pair
    insertions) and a mod-2^31-1 sum (duplicate-sensitive; exact in
    int64 up to ~4.3e9 rows per partition). Map-side combinable, one
    shuffle of |months| rows."""
    from dish_data_pipeline_spark.ops.portable import spark_phash

    o = read(spark, sf_dir, "orders")
    canon = (
        "concat_ws('|', coalesce(cast(o_orderkey as string), '∅'), "
        "coalesce(cast(o_custkey as string), '∅'), "
        "coalesce(o_orderstatus, '∅'), "
        "coalesce(cast(cast(round(o_totalprice * 100) as bigint) "
        "as string), '∅'), "
        "coalesce(cast(cast(o_orderdate as date) as string), '∅'), "
        "coalesce(o_orderpriority, '∅'))"
    )
    h = spark_phash(canon)
    return (
        o.select(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month"),
            F.expr(h).alias("_h"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_h)").alias("xor_hash"),
            F.sum(F.col("_h") % F.lit(2_147_483_647)).alias("modsum_hash"),
        )
    )


def _sql_partition_checksum() -> str:
    from dish_data_pipeline_spark.ops.portable import duck_phash

    canon = (
        "concat_ws('|', coalesce(CAST(o_orderkey AS VARCHAR), '∅'), "
        "coalesce(CAST(o_custkey AS VARCHAR), '∅'), "
        "coalesce(o_orderstatus, '∅'), "
        "coalesce(CAST(CAST(round(o_totalprice * 100) AS BIGINT) "
        "AS VARCHAR), '∅'), "
        "coalesce(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '∅'), "
        "coalesce(o_orderpriority, '∅'))"
    )
    return f"""
WITH h AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         {duck_phash(canon)} AS hv
  FROM orders)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(hv) AS BIGINT) AS xor_hash,
       CAST(SUM(hv % 2147483647) AS BIGINT) AS modsum_hash
FROM h GROUP BY month
"""


# --- JSON key profiling --------------------------------------------
def q_json_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema discovery over a semi-structured column: explode every
    JSON object key in ``events.props`` and profile it — row
    coverage, distinct-value count, numeric min/max (NULL for
    non-numeric values via the non-ANSI cast). The Spark side uses
    ``json_object_keys`` + lateral explode (invalid/non-object JSON
    yields NULL and drops out, same as DuckDB's ``json_keys``)."""
    e = read(spark, sf_dir, "events")
    total = e.count()
    keys = e.select(
        F.explode(F.expr("json_object_keys(props)")).alias("key"),
        F.col("props"),
    ).withColumn(
        "val",
        F.expr("get_json_object(props, concat('$.', key))"),
    )
    return keys.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)).cast("double") / F.lit(float(total))).alias(
            "row_coverage"
        ),
        F.countDistinct("val").alias("n_distinct"),
        F.min(F.col("val").cast("bigint")).alias("min_int"),
        F.max(F.col("val").cast("bigint")).alias("max_int"),
    )


SQL_JSON_KEY_PROFILE = """
WITH k AS (
  SELECT unnest(json_keys(props)) AS key, props FROM events),
v AS (
  SELECT key,
         json_extract_string(props, '$.' || key) AS val
  FROM k)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS DOUBLE) /
       (SELECT CAST(COUNT(*) AS DOUBLE) FROM events) AS row_coverage,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
       MIN(TRY_CAST(val AS BIGINT)) AS min_int,
       MAX(TRY_CAST(val AS BIGINT)) AS max_int
FROM v GROUP BY key
"""


# --- Manifest-backend transactional MERGE roundtrip ---------------
def q_manifest_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes the versioned-manifest lakehouse tier end-to-end
    (``io_backends.ManifestParquetBackend`` — the in-container
    answer to the reference's BigQuery MERGE atomicity,
    reference pipeline/data_pipeline.py:212): create v0 from a base
    snapshot, run two optimistic-commit keep-latest MERGEs (updates
    + inserts each), then aggregate the LATEST snapshot joined
    against a TIME-TRAVEL read of v0. Every commit is an atomic
    hard-link manifest publish; the oracle replays the same
    upsert-priority stack in plain SQL, so row counts, exact-decimal
    totals, and the v0-overlap counts all hash-match only if the
    versioned reads return precisely the committed states."""
    import shutil

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    path = scratch_dir(
        "manifest_rt", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(path, ignore_errors=True)
    be = ManifestParquetBackend()
    key = F.col("o_orderkey")
    be.create(o.filter(key % 3 == 0), path, stats_cols=["o_orderkey"])
    b1 = o.filter(key % 6 == 0).select(
        "o_orderkey",
        F.lit("U1").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
    ).unionByName(
        o.filter(key % 15 == 1).select(
            "o_orderkey",
            F.lit("N1").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
        )
    )
    be.merge_keep_latest(spark, path, b1, ["o_orderkey"], "o_orderdate")
    b2 = o.filter(key % 12 == 0).select(
        "o_orderkey",
        F.lit("U2").alias("o_orderstatus"),
        (F.col("o_totalprice") + 2000.0).alias("o_totalprice"),
        "o_orderdate",
    ).unionByName(
        o.filter(key % 15 == 2).select(
            "o_orderkey",
            F.lit("N2").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
        )
    )
    be.merge_keep_latest(spark, path, b2, ["o_orderkey"], "o_orderdate")
    latest = be.read(spark, path)
    v0 = be.read(spark, path, version=0)
    return (
        latest.join(
            v0.select("o_orderkey", F.lit(1).alias("_in0")),
            "o_orderkey",
            "left",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
            F.count("_in0").cast("bigint").alias("n_also_in_v0"),
        )
    )


SQL_MANIFEST_MERGE_ROUNDTRIP = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 3 = 0),
b1 AS (
  SELECT o_orderkey, 'U1' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 6 = 0
  UNION ALL
  SELECT o_orderkey, 'N1', o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 15 = 1),
b2 AS (
  SELECT o_orderkey, 'U2' AS o_orderstatus,
         o_totalprice + 2000.0 AS o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 12 = 0
  UNION ALL
  SELECT o_orderkey, 'N2', o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 15 = 2),
stacked AS (
  SELECT *, 3 AS pri FROM b2
  UNION ALL SELECT *, 2 AS pri FROM b1
  UNION ALL SELECT *, 1 AS pri FROM base),
latest AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY pri DESC) AS rn
    FROM stacked) t
  WHERE rn = 1)
SELECT l.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('l.o_totalprice')} AS total,
       CAST(COUNT(b.o_orderkey) AS BIGINT) AS n_also_in_v0
FROM latest l LEFT JOIN base b USING (o_orderkey)
GROUP BY l.o_orderstatus
"""


def q_manifest_maintenance_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The lakehouse MAINTENANCE lifecycle end-to-end — the OPTIMIZE
    / set-retention / VACUUM triple every long-lived 100 TB table
    needs (small-file compaction from streaming appends is what
    keeps scan task counts sane): create v0 from a quarter of
    orders, APPEND the other three quarters as separate commits
    (v1-v3, each its own small file set — the streaming-ingest
    shape), COMPACT the latest snapshot into 4 files CLUSTERED on
    the key (the single-dimension tier of the z-order layout op —
    ``OPTIMIZE ... ORDER BY``; footer min/max become disjoint key
    ranges, which keeps the pruning self-check deterministic at
    every sf, where a 2-dim Morton quadrant's min/max is at the
    mercy of range-partitioner sampling on tiny inputs), EXPIRE all
    but the compacted version and VACUUM the now-unreferenced
    pre-compaction files, then aggregate a read of the surviving
    latest snapshot plus a STATS-PRUNED scan count. The
    query self-checks the maintenance actually happened (file count
    dropped to 4, expiry removed 4 manifests, vacuum reclaimed
    bytes, pruning skipped files) and raises otherwise — so a green
    driver row certifies the lifecycle, not just the final read.
    The oracle is plain SQL over orders: maintenance must be
    content-preserving, or counts/totals hash-mismatch."""
    import shutil

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = scratch_dir(
        "manifest_mt", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(path, ignore_errors=True)
    be = ManifestParquetBackend()
    key = F.col("o_orderkey")
    be.create(
        o.filter(key % 4 == 0), path, stats_cols=["o_orderkey", "o_custkey"]
    )
    for r in (1, 2, 3):
        be.append(o.filter(key % 4 == r).repartition(4), path)
    n_files_before = len(be._manifest(path, 3)["files"])
    v4 = be.compact(
        spark, path, target_files=4, zorder_by=["o_orderkey"]
    )
    if v4 != 4:
        raise RuntimeError(f"compaction raced or failed: {v4}")
    n_files_after = len(be._manifest(path, 4)["files"])
    # keep only the compacted snapshot: v3 still references every
    # pre-compaction file, so retention must expire it before vacuum
    # can reclaim anything (exactly Delta's retention-gates-VACUUM
    # rule)
    expired = be.expire_versions(path, keep_last=1)
    reclaimed = be.vacuum(path)
    kept, total = be.prune_files(path, {"o_orderkey": (None, 1000)})
    if not (
        n_files_before > 4
        and n_files_after == 4
        and expired == [0, 1, 2, 3]
        and reclaimed
        and kept is not None
        and len(kept) < total
    ):
        raise RuntimeError(
            "maintenance lifecycle not exercised: "
            f"files {n_files_before}->{n_files_after}, expired "
            f"{expired}, reclaimed {len(reclaimed)} dirs, pruned "
            f"{len(kept)}/{total}"
        )
    latest = be.read(spark, path)
    pruned_n = (
        be.scan(spark, path, {"o_orderkey": (None, 1000)})
        .filter(F.col("o_orderkey") <= 1000)
        .count()
    )
    return latest.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice")).alias("total"),
        F.lit(pruned_n).cast("bigint").alias("n_low_keys"),
    )


SQL_MANIFEST_MAINTENANCE_ROUNDTRIP = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_orderkey <= 1000) AS n_low_keys
FROM orders
GROUP BY o_orderstatus
"""


def q_manifest_delete_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Row-level DELETE on the lakehouse tier
    (``ManifestParquetBackend.delete_where``) — the GDPR /
    retention write path: create the table CLUSTERED on the key (4
    range-partitioned files, disjoint footer min/max), delete the
    middle key band ``[max/4, max/2]`` with the matching file-level
    interval bound, and read back. The self-check certifies the
    scale property, not just the result: at least one file must be
    carried byte-UNCHANGED into the new manifest (stats proved no
    overlap — the metadata-speed path) and at least one rewritten;
    a DELETE that rewrites everything silently would pass the value
    oracle but fail here. Oracle: plain NOT BETWEEN over orders
    with the same integer-division bounds."""
    import shutil

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = scratch_dir(
        "manifest_del", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(path, ignore_errors=True)
    be = ManifestParquetBackend()
    be.create(
        o.repartitionByRange(4, F.col("o_orderkey")).sortWithinPartitions(
            "o_orderkey"
        ),
        path,
        stats_cols=["o_orderkey"],
    )
    mx = o.agg(F.max("o_orderkey").alias("m")).collect()[0]["m"]
    lo, hi = mx // 4, mx // 2
    v0_files = set(be._manifest(path, 0)["files"])
    ver, n_rewritten, n_carried = be.delete_where(
        spark,
        path,
        f"o_orderkey BETWEEN {lo} AND {hi}",
        {"o_orderkey": (lo, hi)},
    )
    man1 = be._manifest(path, 1)
    carried_ok = sum(1 for f in man1["files"] if f in v0_files)
    if not (
        ver == 1
        and n_rewritten >= 1
        and n_carried >= 1
        and carried_ok == n_carried
    ):
        raise RuntimeError(
            "pruned delete not exercised: "
            f"v{ver}, rewrote {n_rewritten}, carried {n_carried} "
            f"({carried_ok} verified from v0)"
        )
    return (
        be.read(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
    )


SQL_MANIFEST_DELETE_ROUNDTRIP = f"""
WITH bounds AS (
  SELECT MAX(o_orderkey) // 4 AS lo, MAX(o_orderkey) // 2 AS hi
  FROM orders)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM orders, bounds
WHERE NOT (o_orderkey BETWEEN lo AND hi)
GROUP BY o_orderstatus
"""


def q_bucketed_join_zero_shuffle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fact-fact join with the shuffle paid ONCE at write time
    (``io.write_bucketed`` contract): orders and lineitem are saved
    as 8-bucket parquet tables hashed on the order key (bucket
    metadata lives in the session catalog; ``repartition(8, key)``
    uses the same murmur3-pmod hash as ``bucketBy``, so each bucket
    lands in exactly one file and the within-bucket ``sortBy`` is
    trusted by the planner). The subsequent SortMergeJoin then reads
    co-located buckets with NO Exchange on either side — at 100 TB
    this converts every repeated fact-fact join against the table
    into a local merge. Self-check certifies the scale property, not
    just the values: the executed plan must contain exactly one
    shuffle Exchange (the 3-group final aggregate) and a
    SortMergeJoin (merge hint — bucketing is invisible under a
    broadcast join, which would pass the value oracle while proving
    nothing). Oracle: the plain join-aggregate."""
    import shutil

    o = read(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    tag = (
        f"{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}"
    ).replace(".", "_").replace("-", "_")
    base = scratch_dir("bucketed", tag)
    for short, df, key in (("bo", o, "o_orderkey"), ("bl", li, "l_orderkey")):
        name = f"{short}_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        path = os.path.join(base, short)
        shutil.rmtree(path, ignore_errors=True)
        (
            df.repartition(8, F.col(key))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(name)
        )
    joined = (
        spark.table(f"bo_{tag}")
        .hint("merge")
        .join(
            spark.table(f"bl_{tag}").hint("merge"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    res = joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("revenue"),
    )
    from dish_data_pipeline_spark.plans.plan_text import (
        count_shuffles,
        final_plan,
    )

    plan = final_plan(res)
    shuffles = count_shuffles(plan)
    if shuffles > 1 or "SortMergeJoin" not in plan:
        raise RuntimeError(
            f"bucketed join not shuffle-free: {shuffles} shuffles, "
            f"SMJ={'SortMergeJoin' in plan}\n{plan[:2000]}"
        )
    return res


def q_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter data skipping on the lakehouse tier: the table
    is CLUSTERED on ``o_orderkey`` (8 range files, tight orderkey
    min/max), so a point lookup on the unclustered ``o_custkey``
    overlaps every file's [min,max] — range stats prune nothing.
    The per-file bloom recorded by ``create(bloom_cols=...)``
    (md5-portable hash, k=5 universal probes, per-file power-of-two
    sizing from footer row counts) proves most files clean. Probe
    key = the customer with the FEWEST orders (tie → lowest key):
    deterministic on both engines and guaranteed to live in few
    files, so the self-check that at least one file was skipped
    can't flake. Oracle: the same probe selection + plain join."""
    import shutil

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    row = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").asc(), F.col("o_custkey").asc())
        .limit(1)
        .collect()[0]
    )
    probe, n_probe = row["o_custkey"], row["n"]
    path = scratch_dir(
        "bloom_pl", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(path, ignore_errors=True)
    be = ManifestParquetBackend()
    be.create(
        o.repartitionByRange(8, F.col("o_orderkey")).sortWithinPartitions(
            "o_orderkey"
        ),
        path,
        stats_cols=["o_orderkey"],
        bloom_cols=["o_custkey"],
    )
    kept, total = be.prune_files(path, {}, equals={"o_custkey": probe})
    # the skip assertion only binds when the probe's order count is
    # below the file count — with more orders than files the value
    # can legitimately live in every file (seen on a 10x-replicated
    # scale probe, where the rarest customer still has 10 orders)
    if len(kept) == 0 or (n_probe < total and len(kept) >= total):
        raise RuntimeError(
            f"bloom pruning not exercised: kept {len(kept)}/{total} "
            f"files for o_custkey={probe} (n_orders={n_probe})"
        )
    return (
        be.scan(spark, path, {}, equals={"o_custkey": probe})
        .filter(F.col("o_custkey") == F.lit(probe))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_BLOOM_POINT_LOOKUP = """
WITH probe AS (
  SELECT o_custkey FROM orders GROUP BY o_custkey
  ORDER BY COUNT(*) ASC, o_custkey ASC LIMIT 1)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o JOIN probe p ON o.o_custkey = p.o_custkey
"""


def q_manifest_restore_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RESTORE-to-version on the lakehouse tier (the Delta ``RESTORE
    TABLE`` analog): create the table, apply a BAD load (a DELETE
    that wrongly drops the low-key half), then roll back — a
    metadata-only commit that REUSES v0's files (self-check: file
    list identical, so the rollback moved zero bytes) while the bad
    version stays time-travelable and replayed txn batches stay
    inert. Oracle: the original table, because a correct restore is
    indistinguishable from never having loaded the bad version."""
    import shutil

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = scratch_dir(
        "restore", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(path, ignore_errors=True)
    be = ManifestParquetBackend()
    be.create(o, path, stats_cols=["o_orderkey"])
    mx = o.agg(F.max("o_orderkey").alias("m")).collect()[0]["m"]
    be.delete_where(
        spark, path, f"o_orderkey <= {mx // 2}",
        {"o_orderkey": (None, mx // 2)},
    )
    ver = be.restore(path, 0)
    man0, man2 = be._manifest(path, 0), be._manifest(path, 2)
    if not (
        ver == 2
        and man2["files"] == man0["files"]
        and be.history(path)[-1]["operation"] == "restore(v0)"
    ):
        raise RuntimeError(
            f"restore not metadata-only: v{ver}, "
            f"files_reused={man2['files'] == man0['files']}"
        )
    return (
        be.read(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
    )


SQL_MANIFEST_RESTORE_ROUNDTRIP = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY o_orderstatus
"""


def q_data_contract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract validation (``ops.contracts``, the
    dbt-tests shape): key uniqueness, required columns, enumerated
    domains, and referential integrity over ``orders``, evaluated as
    aggregates into a per-rule violations report. Violations are
    REAL, planted by construction: the accepted-values rule only
    allows 3 of the 5 order priorities, and the FK check runs
    against a restricted customer dim (every 3rd key removed), so
    the counts exercise the counting paths rather than certifying
    five zeros. Oracle: the same counts as UNION ALL scalar
    subqueries."""
    from dish_data_pipeline_spark.ops.contracts import contract_report

    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 3 != 0
    )
    return contract_report(
        o,
        unique=[["o_orderkey"]],
        not_null=["o_custkey", "o_orderdate"],
        accepted={
            "o_orderstatus": ["O", "F", "P"],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
        },
        fks=[("o_custkey", c, "c_custkey")],
    )


SQL_DATA_CONTRACT_ORDERS = """
SELECT rule, n_violations, n_violations = 0 AS passed FROM (
  SELECT 'not_null(o_custkey)' AS rule,
         CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
           AS n_violations FROM orders
  UNION ALL
  SELECT 'not_null(o_orderdate)',
         CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'accepted_values(o_orderstatus in [O, F, P])',
         CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
              AND o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'accepted_values(o_orderpriority in [1-URGENT, 2-HIGH, 3-MEDIUM])',
         CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
              AND o_orderpriority NOT IN
              ('1-URGENT', '2-HIGH', '3-MEDIUM')) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'unique(o_orderkey)',
         CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
  UNION ALL
  SELECT 'fk(o_custkey -> c_custkey)',
         CAST(COUNT(*) AS BIGINT)
  FROM orders WHERE o_custkey IS NOT NULL
    AND o_custkey NOT IN (SELECT c_custkey FROM customer
                          WHERE c_custkey % 3 <> 0)
)
"""


def q_forget_user_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten, end to end on the lakehouse tier: the
    table is clustered on ``o_orderkey`` with a BLOOM on the
    unclustered ``o_custkey``; erasing one customer
    (``delete_where(..., equals=...)``) rewrites ONLY the files
    whose bloom may contain them — at 100 TB the difference between
    a bounded compliance job and rewriting the table. Victim = the
    fewest-orders customer (deterministic both engines). Self-check:
    when the victim has fewer orders than the table has files, at
    least one file must carry byte-unchanged; afterwards a bloom
    probe for the victim must prune every live file (the erasure is
    verifiable from metadata alone). Oracle: the aggregate over
    everyone else."""
    import shutil

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    o = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    row = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").asc(), F.col("o_custkey").asc())
        .limit(1)
        .collect()[0]
    )
    victim, n_victim = row["o_custkey"], row["n"]
    path = scratch_dir(
        "forget", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(path, ignore_errors=True)
    be = ManifestParquetBackend()
    be.create(
        o.repartitionByRange(8, F.col("o_orderkey")).sortWithinPartitions(
            "o_orderkey"
        ),
        path,
        stats_cols=["o_orderkey"],
        bloom_cols=["o_custkey"],
    )
    ver, rewrote, carried = be.delete_where(
        spark,
        path,
        f"o_custkey = {victim}",
        equals={"o_custkey": victim},
    )
    kept_after, total_after = be.prune_files(
        path, {}, version=1, equals={"o_custkey": victim}
    )
    # carried files were carried BECAUSE their bloom proved the
    # victim absent, so none may survive the post-delete probe;
    # rebuilt files may rarely false-positive (~0.2%/file), so the
    # deterministic erasure check is value-level below
    v0_files = set(be._manifest(path, 0)["files"])
    leaked_carried = [f for f in kept_after if f in v0_files]
    n_left = (
        be.read(spark, path)
        .filter(F.col("o_custkey") == F.lit(victim))
        .count()
    )
    if (
        ver != 1
        or (n_victim < 8 and carried < 1)
        or leaked_carried
        or n_left != 0
    ):
        raise RuntimeError(
            f"bloom-scoped forget not exercised: v{ver}, rewrote "
            f"{rewrote}, carried {carried}, carried-file bloom leaks "
            f"{leaked_carried}, victim rows left {n_left} "
            f"(bloom keeps {len(kept_after)}/{total_after})"
        )
    return (
        be.read(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
    )


SQL_FORGET_USER_ROUNDTRIP = f"""
WITH probe AS (
  SELECT o_custkey FROM orders GROUP BY o_custkey
  ORDER BY COUNT(*) ASC, o_custkey ASC LIMIT 1)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM orders
WHERE o_custkey <> (SELECT o_custkey FROM probe)
GROUP BY o_orderstatus
"""


def q_schema_evolution_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive schema evolution on the lakehouse tier
    (``ManifestParquetBackend.append(merge_schema=True)``, the Delta
    ``mergeSchema`` analog): create the table with 2 columns, append
    a batch carrying a NEW ``priority`` column — no data rewrite,
    the manifest schema widens and pre-evolution files surface the
    column as NULL on read. Self-check pins the time-travel
    contract: v0 still reads with its original 2-column schema.
    Oracle: UNION ALL with a NULL literal for the old rows."""
    import shutil

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend

    o = read(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_totalprice",
        F.col("o_orderpriority").alias("priority"),
    )
    path = scratch_dir(
        "schema_evo", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(path, ignore_errors=True)
    be = ManifestParquetBackend()
    be.create(old, path)
    ver = be.append(new, path, merge_schema=True)
    if ver != 1 or be.read(spark, path, version=0).columns != [
        "o_orderkey",
        "o_totalprice",
    ]:
        raise RuntimeError("schema evolution broke time travel to v0")
    cur = be.read(spark, path)
    if cur.columns != ["o_orderkey", "o_totalprice", "priority"]:
        raise RuntimeError(f"evolved schema wrong: {cur.columns}")
    return cur.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice")).alias("total"),
    )


SQL_SCHEMA_EVOLUTION_ROUNDTRIP = f"""
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM (
  SELECT o_totalprice, CAST(NULL AS VARCHAR) AS priority
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_totalprice, o_orderpriority AS priority
  FROM orders WHERE o_orderkey % 3 = 1
)
GROUP BY priority
"""


SQL_BUCKETED_JOIN_ZERO_SHUFFLE = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
"""


BREADTH_QUERIES: dict[str, QueryDef] = {
    "conditional_aggs": QueryDef(
        q_conditional_aggs, SQL_CONDITIONAL_AGGS,
        "conditional/boolean aggregates (count_if/bool_or/bool_and/"
        "FILTER sums/conditional distinct) in one grouped pass",
        ("agg", "functions")),
    "grouping_sets_orders": QueryDef(
        q_grouping_sets_orders, SQL_GROUPING_SETS_ORDERS,
        "explicit GROUPING SETS with the grouping_id bitmask "
        "(rolled-up NULL vs data NULL)",
        ("agg", "olap")),
    "percentile_suite": QueryDef(
        q_percentile_suite, SQL_PERCENTILE_SUITE,
        "percent_rank/cume_dist/ntile/nth_value distribution windows",
        ("window",)),
    "mode_stat": QueryDef(
        q_mode_stat, SQL_MODE_STAT,
        "per-group statistical mode with deterministic tiebreak + share",
        ("agg", "window", "stats")),
    "map_funcs": QueryDef(
        q_map_funcs, SQL_MAP_FUNCS,
        "MAP-type functions (map_from_entries/element_at/map_filter/"
        "transform_values) with key-sorted serialization",
        ("functions", "map")),
    "partition_checksum": QueryDef(
        q_partition_checksum, _sql_partition_checksum(),
        "order-independent per-month content checksums (portable "
        "60-bit hash; BIT_XOR + mod-prime sum) for replica verification",
        ("agg", "diff", "hash")),
    "json_key_profile": QueryDef(
        q_json_key_profile, SQL_JSON_KEY_PROFILE,
        "JSON key discovery + per-key coverage/distinct/min/max profile",
        ("json", "quality", "agg")),
    "array_funcs": QueryDef(
        q_array_funcs, SQL_ARRAY_FUNCS,
        "higher-order array functions (transform/filter/exists/forall/"
        "aggregate/zip_with/slice) over linenumber-ordered arrays",
        ("functions", "array")),
    "snapshot_diff_orders": QueryDef(
        q_snapshot_diff, SQL_SNAPSHOT_DIFF,
        "keyed snapshot reconciliation: insert/delete/update delta",
        ("join", "cdc")),
    "diff_summary_orders": QueryDef(
        q_diff_summary, SQL_DIFF_SUMMARY,
        "reconciliation per-change-type counts (unchanged never materialized)",
        ("join", "cdc", "agg")),
    "incremental_join_orders": QueryDef(
        q_incremental_join, SQL_INCREMENTAL_JOIN,
        "join-view IVM: orders x customer rolled forward from both "
        "sides' deltas (rebuild/patch/kill/revive), vs from-scratch "
        "join oracle",
        ("ivm", "cdc")),
    "incremental_agg_orders": QueryDef(
        q_incremental_agg, SQL_INCREMENTAL_AGG,
        "incremental view maintenance: aggregate rolled forward from CDF delta",
        ("cdc", "agg", "incremental")),
    "cdc_apply_orders": QueryDef(
        q_cdc_apply, SQL_CDC_APPLY,
        "CDC delta applied onto the old snapshot reconstructs the new exactly",
        ("cdc", "join")),
    "asof_signup": QueryDef(
        q_asof_signup, SQL_ASOF_SIGNUP,
        "as-of join: latest signup before each event", ("join", "asof")),
    "asof_nearest": QueryDef(
        q_asof_nearest, SQL_ASOF_NEAREST,
        "nearest-direction as-of join with tolerance", ("join", "asof")),
    "range_bucket_join": QueryDef(
        q_range_bucket_join, SQL_RANGE_BUCKET_JOIN,
        "range join via fixed-width bucketization", ("join",)),
    "pivot_events": QueryDef(
        q_pivot_events, SQL_PIVOT_EVENTS,
        "pivot event counts per user", ("agg", "pivot")),
    "unpivot_lineitem": QueryDef(
        q_unpivot_lineitem, SQL_UNPIVOT_LINEITEM,
        "unpivot measures to long form", ("agg", "pivot")),
    "json_fields": QueryDef(
        q_json_fields, SQL_JSON_FIELDS,
        "JSON field extraction from string column", ("functions", "json")),
    "string_funcs": QueryDef(
        q_string_funcs, SQL_STRING_FUNCS,
        "string scalar function suite", ("functions",)),
    "date_funcs": QueryDef(
        q_date_funcs, SQL_DATE_FUNCS,
        "date/time scalar function suite", ("functions",)),
    "forecast_revenue": QueryDef(
        q_forecast_revenue, SQL_FORECAST_REVENUE,
        "TPC-H Q6-shape filtered aggregate", ("agg",)),
    "small_qty_revenue": QueryDef(
        q_small_qty_revenue, SQL_SMALL_QTY_REVENUE,
        "TPC-H Q17-shape per-group average join filter", ("agg", "join")),
    "cube_events": QueryDef(
        q_cube_events, SQL_CUBE_EVENTS,
        "CUBE grouping sets", ("agg",)),
    "raw_zone_roundtrip": QueryDef(
        q_raw_zone_roundtrip, SQL_RAW_ZONE_ROUNDTRIP,
        "S2 raw-zone partitioned write + pruned read", ("io",)),
    "avro_roundtrip": QueryDef(
        q_avro_roundtrip, SQL_AVRO_ROUNDTRIP,
        "avro interchange write+read via the two-tier io entry "
        "points (JVM spark-avro or pure-Python container tier)",
        ("io", "formats")),
    "rest_ingest_roundtrip": QueryDef(
        q_rest_ingest_roundtrip, SQL_REST_INGEST_ROUNDTRIP,
        "S1 paginated REST fetch -> raw zone -> re-read + agg",
        ("io", "pipeline")),
    "rest_distributed_fetch": QueryDef(
        q_rest_distributed_fetch, SQL_REST_DISTRIBUTED_FETCH,
        "S1 scale tier: executor-side page fetch via mapPartitions",
        ("io", "pipeline")),
    "audit_trail": QueryDef(
        q_audit_trail, SQL_AUDIT_TRAIL,
        "S4 audit rows from run_feed success + DQ-failure paths",
        ("io", "pipeline")),
    "dq_recovery_roundtrip": QueryDef(
        q_dq_recovery_roundtrip, SQL_DQ_RECOVERY_ROUNDTRIP,
        "D2/X9 recoverable-duplicate dedup-and-continue routing",
        ("io", "pipeline")),
    "bucketed_join_zero_shuffle": QueryDef(
        q_bucketed_join_zero_shuffle,
        SQL_BUCKETED_JOIN_ZERO_SHUFFLE,
        "co-bucketed fact-fact SortMergeJoin with zero join-side "
        "Exchange (plan-asserted), shuffle paid once at write time",
        ("io", "scale")),
    "bloom_point_lookup": QueryDef(
        q_bloom_point_lookup,
        SQL_BLOOM_POINT_LOOKUP,
        "lakehouse bloom data skipping: point lookup on an "
        "unclustered column prunes files min/max stats cannot",
        ("lakehouse", "io")),
    "manifest_restore_roundtrip": QueryDef(
        q_manifest_restore_roundtrip,
        SQL_MANIFEST_RESTORE_ROUNDTRIP,
        "RESTORE to version: metadata-only rollback reusing v0's "
        "files byte-for-byte, bad version stays time-travelable",
        ("lakehouse", "io")),
    "data_contract_orders": QueryDef(
        q_data_contract_orders,
        SQL_DATA_CONTRACT_ORDERS,
        "declarative data contracts: unique/not-null/accepted-values"
        "/FK rules as a per-rule violations report, planted failures",
        ("quality", "contracts")),
    "forget_user_roundtrip": QueryDef(
        q_forget_user_roundtrip,
        SQL_FORGET_USER_ROUNDTRIP,
        "right-to-be-forgotten: bloom-scoped DELETE rewrites only "
        "files that may hold the user; carried blooms prove erasure",
        ("lakehouse", "privacy", "io")),
    "schema_evolution_roundtrip": QueryDef(
        q_schema_evolution_roundtrip,
        SQL_SCHEMA_EVOLUTION_ROUNDTRIP,
        "lakehouse additive schema evolution (mergeSchema append): "
        "no rewrite, NULL-backfilled read, v0 time-travel intact",
        ("lakehouse", "io")),
    "manifest_delete_roundtrip": QueryDef(
        q_manifest_delete_roundtrip,
        SQL_MANIFEST_DELETE_ROUNDTRIP,
        "lakehouse DELETE WHERE: stats-scoped file rewrite, "
        "untouched files carried byte-identical, NOT-BETWEEN oracle",
        ("lakehouse", "io")),
    "manifest_maintenance_roundtrip": QueryDef(
        q_manifest_maintenance_roundtrip,
        SQL_MANIFEST_MAINTENANCE_ROUNDTRIP,
        "lakehouse maintenance lifecycle: multi-append -> z-ordered "
        "compaction -> retention expiry -> vacuum -> stats-pruned "
        "scan, content-preservation oracle",
        ("lakehouse", "io")),
    "manifest_merge_roundtrip": QueryDef(
        q_manifest_merge_roundtrip, SQL_MANIFEST_MERGE_ROUNDTRIP,
        "versioned-manifest lakehouse tier: create + 2 optimistic "
        "MERGE commits + time-travel read, state hash-exact",
        ("io", "merge")),
    "enrich_metadata": QueryDef(
        q_enrich_metadata, SQL_ENRICH_METADATA,
        "P1/P2 load metadata enrichment (replay form)", ("enrich",)),
    "partitioned_merge": QueryDef(
        q_partitioned_merge, SQL_PARTITIONED_MERGE,
        "partition-pruned MERGE: only touched partitions rewritten",
        ("upsert", "io")),
    "scd2_orders": QueryDef(
        q_scd2_orders, SQL_SCD2_ORDERS,
        "SCD2 history maintenance (close + open versions)", ("upsert", "cdc")),
    "value_quantiles": QueryDef(
        q_value_quantiles, SQL_VALUE_QUANTILES,
        "exact interpolated quantiles per group", ("agg",)),
}
