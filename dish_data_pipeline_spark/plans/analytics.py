"""Analytics query suite: ranking-function family, the pure
``spark.sql`` interface path, data profiling, and sessionization —
rounding out the window/SQL surface (SURVEY.md §2.6/§7.0: every
operator also expressible via spark.sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dish_data_pipeline_spark.plans.common import (
    DEC,
    ZSCORE_SCALE,
    QueryDef,
    davg,
    dsum,
    read,
    sql_davg,
    sql_dsum,
    widen,
)


# --- Ranking-function suite ---------------------------------------
def q_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return e.select(
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("event_id", 1).over(w).alias("next_id"),
        F.first("event_id").over(w).alias("top_id"),
    ).filter(F.col("rn") <= 100)


SQL_RANK_SUITE = """
SELECT event_id, event_type, rn,
       CAST(rnk AS INTEGER) AS rnk,
       CAST(drnk AS INTEGER) AS drnk,
       CAST(quartile AS INTEGER) AS quartile,
       next_id,
       top_id
FROM (
  SELECT event_id, event_type,
         CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk,
         NTILE(4) OVER w AS quartile,
         LEAD(event_id, 1) OVER w AS next_id,
         FIRST_VALUE(event_id) OVER w AS top_id
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)) t
WHERE rn <= 100
"""


# --- Pure spark.sql interface -------------------------------------
SQL_INTERFACE_TEXT = """
WITH user_day AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY user_id, CAST(ts AS DATE))
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS active_days,
       CAST(MAX(n) AS BIGINT) AS max_daily_events,
       CAST(SUM(CAST(day_value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM user_day
GROUP BY user_id
"""


def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's second API surface: the IDENTICAL SQL text runs
    on Spark (via temp views) and on DuckDB (as its own oracle) —
    dialect-portable ANSI SQL."""
    read(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(SQL_INTERFACE_TEXT)


# --- Data profiling operator --------------------------------------
def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: nulls, distincts, min/max (as strings) —
    single aggregation pass per table (unpivoted driver-side from
    one agg row, no per-column jobs)."""
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_str, max_str)"
    )


def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: the distinct pre-aggregation is per-row work that a
    # small single-row-group local scan serializes onto one task
    e = widen(read(spark, sf_dir, "events"), spark)
    return profile_columns(e, ["user_id", "event_type", "value"])


SQL_PROFILE_EVENTS = """
SELECT 'user_id' AS col_name,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct,
       CAST(MIN(user_id) AS VARCHAR) AS min_str,
       CAST(MAX(user_id) AS VARCHAR) AS max_str
FROM events
UNION ALL
SELECT 'event_type',
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT event_type) AS BIGINT),
       MIN(event_type), MAX(event_type)
FROM events
UNION ALL
SELECT 'value',
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT value) AS BIGINT),
       CAST(MIN(value) AS VARCHAR), CAST(MAX(value) AS VARCHAR)
FROM events
"""


# --- Batch sessionization (gap-based, via window + cumsum) --------
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap web sessionization via the reusable
    :func:`ops.timeseries.sessionize` operator (gap-chain windows on
    one user_id partitioning + map-side-combined session collapse).
    The oracle's ``gap > 1800`` is the operator's inclusive
    ``gap >= 1801`` — whole-second granularity makes them identical.
    ``unix_timestamp`` inside the operator floors sub-second parts,
    matching the oracle's ``floor(epoch(ts))`` (the testdata parquet
    stores ts as timestamp[us]; same convention as q_rolling_window
    below)."""
    from dish_data_pipeline_spark.ops.timeseries import sessionize

    e = read(spark, sf_dir, "events")
    sessions = sessionize(
        e, "ts", ["user_id"], 1801, tiebreakers=["event_id"],
        extra_aggs={"session_value": dsum(F.col("value"))},
    )
    return sessions.select(
        "user_id",
        F.col("session_seq").alias("session_id"),
        "n_events",
        "session_start",
        "session_end",
        "session_value",
    )


SQL_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessioned AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
  FROM flagged)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       {sql_dsum('value')} AS session_value
FROM sessioned GROUP BY user_id, session_id
"""


# --- TPC-H Q18 shape: IN subquery with HAVING ---------------------
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


SQL_LARGE_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150)
SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- Correlated scalar subquery == window max ---------------------
def q_max_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_max", F.max("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("cust_max"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


SQL_MAX_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
"""


# --- Time-range rolling window ------------------------------------
ROLL_SECONDS = 7 * 86400


def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 7-DAY rolling value sum/count over event time —
    RANGE-frame semantics (all events within the trailing interval,
    however many rows that is), the time-series frame the row-based
    `window_running` can't express. Ordering key is epoch seconds
    (bigint) so the frame bound is exact in both engines; the sum is
    decimal-accumulated (order-independent)."""
    e = read(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-ROLL_SECONDS, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("roll_sum"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


SQL_ROLLING_WINDOW = f"""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS roll_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS roll_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN {ROLL_SECONDS} PRECEDING AND CURRENT ROW)
"""
# floor before the cast: Spark's unix_timestamp TRUNCATES fractional
# seconds while DuckDB's bare CAST(epoch(..) AS BIGINT) ROUNDS —
# floor() makes the frame key identical for sub-second timestamps.


# --- TPC-H Q7 shape: volume shipping between two nations ----------
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade: revenue shipped between NATION_1 suppliers
    and NATION_2 customers (both directions) by ship year. Six-way
    join; nation dims broadcast twice under different aliases, the
    pair filter prunes before the aggregate."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    s = read(spark, sf_dir, "supplier")
    n = read(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("_sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("_ck"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


SQL_VOLUME_SHIPPING = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# --- TPC-H Q8 shape: national market share ------------------------
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of EUROPE's PROMO-part order volume per
    year: conditional decimal sum over total decimal sum, one IEEE
    division at the end (deterministic under any partitioning)."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    s = read(spark, sf_dir, "supplier")
    p = read(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_ck"), F.col("n_regionkey")
    )
    r = read(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n2 = read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("_ck"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("_sk"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            dsum(
                F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0)
            ).alias("nation_volume"),
            dsum(vol).alias("total_volume"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
    )


SQL_MARKET_SHARE = f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'EUROPE')
SELECT o_year,
       {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END")}
         AS nation_volume,
       {sql_dsum('vol')} AS total_volume,
       {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END")}
         / {sql_dsum('vol')} AS mkt_share
FROM base GROUP BY o_year
"""


# --- TPC-H Q9 shape: product-line profit by nation ----------------
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on SMALL-type parts by supplier nation and order year
    (Q9 minus the partsupp supply-cost leg — the table the testdata
    doesn't carry)."""
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders")
    s = read(spark, sf_dir, "supplier")
    p = read(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    n = read(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_profit"
            )
        )
    )


SQL_PRODUCT_PROFIT = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'SMALL'
GROUP BY 1, 2
"""


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the measurement step before
    reaching for `operators/skew.py`'s salted join/agg: the 20
    heaviest lineitem supplier keys with their ratio to the mean
    key load (ratio ≫ 1 on a top key = salt or rely on AQE skew
    split). One count groupBy (map-side combined), the two global
    scalars broadcast back as a 1-row relation, map-side ratio, then
    partial top-k — the per-key relation never moves twice. Ratio is
    one double multiply + divide of exact counts: hash-exact."""
    li = read(spark, sf_dir, "lineitem").select("l_suppkey")
    counts = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("total"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "l_suppkey",
            "n",
            (
                F.col("n").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("total").cast("double")
            ).alias("ratio_to_avg"),
            "n_keys",
        )
        .orderBy(F.desc("n"), F.asc("l_suppkey"))
        .limit(20)
    )


SQL_KEY_SKEW_PROFILE = """
WITH counts AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(n) AS BIGINT) AS total
  FROM counts)
SELECT l_suppkey, n,
       CAST(n AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(total AS DOUBLE)
         AS ratio_to_avg,
       n_keys
FROM counts, stats
ORDER BY n DESC, l_suppkey ASC
LIMIT 20
"""


# --- Event debounce -----------------------------------------------
DEBOUNCE_GAP_SEC = 600


def q_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse per-(user, type) event bursts chained by <10-min gaps
    to their first event — click/sensor debouncing via the
    gap-detection cumsum (one exchange, stacked windows)."""
    from dish_data_pipeline_spark.ops.timeseries import debounce

    e = read(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    return debounce(
        e, "ts", ["user_id", "event_type"], DEBOUNCE_GAP_SEC,
        tiebreakers=["event_id"],
    )


SQL_DEBOUNCE_EVENTS = f"""
WITH s AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events),
l AS (
  SELECT *, LAG(sec) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev
  FROM s),
c AS (
  SELECT *, SUM(CASE WHEN prev IS NULL OR sec - prev >= {DEBOUNCE_GAP_SEC}
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS chain
  FROM l),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type, chain
                               ORDER BY ts, event_id) AS rn
  FROM c)
SELECT event_id, user_id, event_type, ts FROM r WHERE rn = 1
"""


# --- Rolling z-score anomaly gate ---------------------------------
GAP_STEP_SEC = 3600  # shared with the gap-fill query below
ZSCORE_WINDOW = 24
ZSCORE_THRESHOLD = 2.0


def q_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed monitoring pipeline: hourly resample → gap fill →
    trailing-24-bucket z-score per event type (bucket itself
    excluded), anomaly flag at |z| > 2. The regularized grid makes
    the ROWS frame a true time window; the z-score arithmetic is
    decimal-exact sums + one division chain + IEEE sqrt, so values
    hash-match DuckDB bit-for-bit."""
    from dish_data_pipeline_spark.ops.timeseries import (
        gap_fill,
        resample,
        rolling_zscore,
    )

    e = read(spark, sf_dir, "events")
    r = resample(e, "ts", "event_type", "value", GAP_STEP_SEC)
    g = gap_fill(r, "event_type", GAP_STEP_SEC)
    return rolling_zscore(
        g, "event_type", window_rows=ZSCORE_WINDOW, threshold=ZSCORE_THRESHOLD
    )


SQL_ANOMALY_EVENTS = f"""
WITH b AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {GAP_STEP_SEC}) * {GAP_STEP_SEC}
           AS bucket,
         {sql_davg('value')} AS avg_value
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM b GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(mn, mx, {GAP_STEP_SEC})) AS bucket
  FROM spans),
g AS (
  SELECT j.event_type, j.bucket,
         LAST_VALUE(j.avg_value IGNORE NULLS)
           OVER (PARTITION BY j.event_type ORDER BY j.bucket
                 ROWS UNBOUNDED PRECEDING) AS value
  FROM (SELECT grid.event_type, grid.bucket, b.avg_value
        FROM grid LEFT JOIN b ON b.event_type = grid.event_type
                             AND b.bucket = grid.bucket) j),
stats AS (
  SELECT event_type, bucket, value,
         CAST(COUNT(value) OVER w AS DOUBLE) AS n,
         CAST(SUM(CAST(floor(value * {ZSCORE_SCALE}.0) AS BIGINT)) OVER w
              AS DOUBLE) / {ZSCORE_SCALE}.0 AS s1,
         CAST(SUM(CAST(floor(value * value * {ZSCORE_SCALE}.0) AS BIGINT)) OVER w
              AS DOUBLE) / {ZSCORE_SCALE}.0 AS s2
  FROM g
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT event_type, bucket, value,
         CASE WHEN n >= 2 AND (s2 / n - (s1 / n) * (s1 / n)) > 0
              THEN (value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)) END
           AS zscore
  FROM stats)
SELECT event_type, bucket, value, zscore,
       COALESCE(abs(zscore) > {ZSCORE_THRESHOLD!r}, FALSE) AS is_anomaly
FROM z
"""


EWMA_WINDOW = 16


def q_ewma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend smoothing over the hourly per-type series: truncated
    α = 1/2 exponentially weighted moving average
    (:func:`ops.timeseries.ewma`). The weighted sum is the integer
    fold Σ qv·2^i over the frame-ordered window array, so the
    distributed window and the oracle's ``list()``-window
    ``list_transform`` fold produce bit-identical doubles from one
    final division — an oracle-exact EWMA, which a float recurrence
    could never be."""
    from dish_data_pipeline_spark.ops.timeseries import ewma, resample

    e = read(spark, sf_dir, "events")
    r = resample(e, "ts", "event_type", "value", GAP_STEP_SEC)
    return ewma(
        r,
        "event_type",
        value_col="avg_value",
        window_rows=EWMA_WINDOW,
    ).select("event_type", "bucket", "avg_value", "ewma")


SQL_EWMA_EVENTS = f"""
WITH b AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {GAP_STEP_SEC}) * {GAP_STEP_SEC}
           AS bucket,
         {sql_davg('value')} AS avg_value
  FROM events GROUP BY 1, 2),
q AS (
  SELECT event_type, bucket, avg_value,
         list(CAST(floor(avg_value * 1000.0) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW)
           AS l
  FROM b WHERE avg_value IS NOT NULL)
SELECT event_type, bucket, avg_value,
       CAST(list_sum(list_transform(
              l, (x, i) -> x * (CAST(1 AS BIGINT) << (i - 1)))) AS DOUBLE)
       / CAST(((CAST(1 AS BIGINT) << len(l)) - 1) * 1000 AS DOUBLE) AS ewma
FROM q
"""


def q_robust_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly gate over the same hourly grid as
    ``anomaly_events`` — the two flags side by side show exactly
    where variance-based scoring is masked by in-window outliers and
    the robust score is not. Order statistics are pure element
    selection on sorted trailing arrays, so the oracle needs NO
    quantization device: identical doubles select identically."""
    from dish_data_pipeline_spark.ops.timeseries import (
        gap_fill,
        resample,
        rolling_robust_zscore,
    )

    e = read(spark, sf_dir, "events")
    r = resample(e, "ts", "event_type", "value", GAP_STEP_SEC)
    g = gap_fill(r, "event_type", GAP_STEP_SEC)
    return rolling_robust_zscore(
        g, "event_type", window_rows=ZSCORE_WINDOW, threshold=ZSCORE_THRESHOLD
    )


def _sql_robust_anomaly() -> str:
    med = (
        "CASE WHEN len({a}) = 0 THEN CAST(NULL AS DOUBLE) "
        "WHEN len({a}) % 2 = 1 THEN ({a})[(len({a}) + 1) // 2] "
        "ELSE (({a})[len({a}) // 2] + ({a})[len({a}) // 2 + 1]) / 2.0 END"
    )
    return f"""
WITH b AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {GAP_STEP_SEC}) * {GAP_STEP_SEC}
           AS bucket,
         {sql_davg('value')} AS avg_value
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM b GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(mn, mx, {GAP_STEP_SEC})) AS bucket
  FROM spans),
g AS (
  SELECT j.event_type, j.bucket,
         LAST_VALUE(j.avg_value IGNORE NULLS)
           OVER (PARTITION BY j.event_type ORDER BY j.bucket
                 ROWS UNBOUNDED PRECEDING) AS value
  FROM (SELECT grid.event_type, grid.bucket, b.avg_value
        FROM grid LEFT JOIN b ON b.event_type = grid.event_type
                             AND b.bucket = grid.bucket) j),
trails AS (
  SELECT event_type, bucket, value,
         list_sort(array_agg(value)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING))
           AS trail
  FROM g),
meds AS (
  SELECT event_type, bucket, value, trail,
         {med.format(a='trail')} AS med
  FROM trails),
mads AS (
  SELECT event_type, bucket, value, trail, med,
         {med.format(a="list_sort(list_transform(trail, u -> abs(u - med)))")}
           AS mad
  FROM meds),
z AS (
  SELECT event_type, bucket, value,
         CASE WHEN len(trail) >= 2 AND mad > 0
              THEN (value - med) / mad END AS robust_z
  FROM mads)
SELECT event_type, bucket, value, robust_z,
       COALESCE(abs(robust_z) > {ZSCORE_THRESHOLD!r}, FALSE) AS is_anomaly
FROM z
"""


def _replay_as_stream(
    spark: SparkSession,
    df: DataFrame,
    order_col: str,
    transform,
    sink_name: str,
    extra_batches: tuple = (),
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a STREAMING transform over a batch relation, for real:
    split ``df`` into two parquet files at the median of
    ``order_col`` (mtime-ordered so the file source replays them in
    order, one per micro-batch via maxFilesPerTrigger=1), apply the
    streaming ``transform``, drain with availableNow into a memory
    sink, and return the materialized result. The two-batch split
    forces every stateful operator's cross-batch path — state
    written by batch 1 must be read back by batch 2.

    ``extra_batches``: additional same-schema relations appended as
    LATER micro-batches — watermark-advancing sentinels for
    append-mode aggregations, whose results only flush once a
    SUBSEQUENT batch's watermark passes them (the caller filters the
    sentinels back out of the result).

    CALLER CONTRACT: ``transform`` must be insensitive to row order
    WITHIN a micro-batch — the batch files are written via a hash
    repartition (see ``_write_replay_batches``), so intra-batch
    order is not the input order. Every current caller qualifies
    (stateful ops sort within the batch; aggregations/joins are
    order-free; planted duplicates are payload-identical)."""
    import os
    import shutil
    import tempfile

    df = df.localCheckpoint()  # probed by median + the batch write
    mid = df.agg(
        F.percentile_approx(order_col, 0.5, 1_000_000).alias("m")
    ).collect()[0]["m"]
    stream_dir = tempfile.mkdtemp(prefix=f"{sink_name}_")
    try:
        batches = _write_replay_batches(
            stream_dir,
            (df.filter(F.col(order_col) <= mid),
             df.filter(F.col(order_col) > mid),
             *extra_batches),
        )
        for q in spark.streams.active:
            if q.name == sink_name:
                q.stop()
        spark.catalog.dropTempView(sink_name)
        query = _with_replay_shuffle_partitions(
            spark,
            batches,
            lambda: transform(
                spark.readStream.schema(df.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stream_dir)
            )
            .writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start(),
            explicit=state_partitions,
        )
        # Materialize JVM-side before the source files go: the memory
        # sink's rows live in the driver JVM, and localCheckpoint
        # (eager) snapshots them as block-manager partitions without
        # the former collect()→pickle→createDataFrame round-trip
        # through the Python driver (guide §4/§5 — measured ~1.4 s on
        # a 100 k-row replay result at sf0.1).
        return spark.table(sink_name).localCheckpoint()
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)


def _empty_1slice(spark: SparkSession, schema) -> DataFrame:
    """Empty DataFrame as ONE empty slice: the default
    ``createDataFrame([], schema)`` parallelizes cluster-wide, so
    creating the sinks' empty scratch tables scheduled
    defaultParallelism no-row write tasks (measured ~0.8 s vs ~0.3 s
    per create at local[32])."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize([], 1), schema
    )


def _write_replay_batches(stream_dir: str, parts) -> list[str]:
    """Write each batch relation as ONE mtime-ordered parquet file
    ``b<i>.parquet`` under ``stream_dir`` — with a SINGLE Spark job.

    The former shape (one ``coalesce(1).write.parquet`` job per
    batch) paid per-job scheduling, codegen and committer setup N
    times over the same checkpointed input — measured 5.3 s vs 1.4 s
    for 3 batches at sf0.1 (guide §1.2 "don't compute things you
    throw away" / §6 small-writes). Tagging every batch with a
    literal ``_replay_batch`` id, repartitioning BY that id and
    writing ``partitionBy("_replay_batch")`` yields exactly one file
    per batch (each id hashes to one task; the writer starts one
    file per partition value) in one pass. Batch-internal row order
    changes (hash shuffle vs. coalesce), which is semantics-free
    here: every stateful replay op sorts within the micro-batch
    (streaming/stateful.py), aggregations/joins are order-free, and
    the planted-duplicate dedup replay carries payload-identical
    rows. An EMPTY batch writes no partition directory — those fall
    back to the per-batch empty-file write (costs one no-row job).

    Returns the written file paths in batch order."""
    import os
    import shutil

    parts = list(parts)
    tagged = None
    for i, part in enumerate(parts):
        p = part.withColumn("_replay_batch", F.lit(i))
        tagged = p if tagged is None else tagged.unionByName(p)
    stage = os.path.join(stream_dir, "_stage")
    (tagged.repartition("_replay_batch")
     .write.partitionBy("_replay_batch").parquet(stage))
    out: list[str] = []
    for i, part in enumerate(parts):
        d = os.path.join(stage, f"_replay_batch={i}")
        files = (
            [f for f in os.listdir(d) if f.endswith(".parquet")]
            if os.path.isdir(d) else []
        )
        dst = os.path.join(stream_dir, f"b{i}.parquet")
        if files:
            if len(files) != 1:
                # one task per _replay_batch id ⇒ one file — unless a
                # session conf splits task output into multiple files
                raise RuntimeError(
                    f"expected exactly one parquet file per replay "
                    f"batch, found {len(files)} in {d}; a conf like "
                    "spark.sql.files.maxRecordsPerFile breaks the "
                    "one-file-per-batch layout this harness relies on"
                )
            (src,) = files
            shutil.move(os.path.join(d, src), dst)
        else:  # empty batch: partitionBy wrote nothing for this id
            tmp = os.path.join(stream_dir, f"_empty{i}")
            part.coalesce(1).write.parquet(tmp)
            (src,) = [
                f for f in os.listdir(tmp) if f.endswith(".parquet")
            ]
            shutil.move(os.path.join(tmp, src), dst)
            shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        out.append(dst)
    shutil.rmtree(stage)
    return out


def _with_replay_shuffle_partitions(
    spark: SparkSession, batch_files, start, explicit: int | None = None
):
    """Run ``start()`` (which launches a streaming query) with
    ``spark.sql.shuffle.partitions`` sized for the replayed volume,
    then await it and restore the session conf.

    Structured Streaming fixes the state-store partition count from
    the shuffle-partition conf at first batch, and AQE's coalescing
    does NOT apply to streaming shuffles — so a stateful replay over
    a few MB pays (conf × state stores × batches) state commits of
    near-empty partitions (measured 5.6 s → 1.9 s for a 3-batch
    windowed aggregation at 32 → size-derived partitions, sf0.1).
    The count is derived from the ACTUAL bytes just written for the
    replay — ceil(bytes / 4 MB), clamped to [1, defaultParallelism]
    — i.e. scale-adaptive, not tuned to this box: a 10× input grows
    the count toward cluster width. The 4 MB target is a COMPRESSED-
    parquet proxy for in-memory state (~5–8× expansion for these
    event rows, so ≈ 30–60 MB of live state per partition — the
    guide's healthy range), calibrated on the sf0.1→sf1.0 decade:
    at sf1.0 the dedup replay ran 26.7 s on 1 partition vs 13–15 s
    on 8–32 (state work is row-bound, so compressed bytes
    under-count it), while sf0.1 still derives 1 partition (2–4 MB
    replays) and keeps the measured 5.6 s → 1.9 s win.
    ``DISH_REPLAY_STATE_PARTITIONS`` overrides for production
    replays whose state outgrows the input heuristic.

    ``explicit`` (caller override) wins over the size heuristic:
    Python-stateful transforms over HIGH-cardinality keys
    (``applyInPandasWithState`` per user) are CPU-bound in per-group
    Python work, not byte-bound — collapsing them to one partition
    serializes every group through a single Python worker (the
    ``widen()`` rationale; measured 3× slower on the per-user funnel
    at sf0.1), so such callers pass cluster width.

    NOTE: ``spark.sql.shuffle.partitions`` is a SESSION conf — a
    concurrent query planned in the same session during the replay
    window would pick up the replay's count. Session-conf scoping is
    unavoidable for streaming state stores; the bench and driver
    harnesses are single-threaded, which is the assumption here."""
    import math
    import os

    env = os.environ.get("DISH_REPLAY_STATE_PARTITIONS")
    if explicit is not None:
        n = max(1, explicit)
    elif env:
        try:
            n = int(env)
        except ValueError as exc:
            raise ValueError(
                "DISH_REPLAY_STATE_PARTITIONS must be an integer, "
                f"got {env!r}"
            ) from exc
        # clamp like the heuristic: a fat-fingered huge value would
        # otherwise become the state-store count verbatim
        n = max(1, min(n, 100_000))
    else:
        total = sum(os.path.getsize(f) for f in batch_files)
        n = max(
            1,
            min(
                spark.sparkContext.defaultParallelism,
                math.ceil(total / (4 << 20)),
            ),
        )
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        query = start()
        query.awaitTermination(300)
        return query
    finally:
        spark.conf.set(key, old)


def q_stream_zscore_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING stateful tier, driver-certified: the same
    resample → gap-fill grid as ``anomaly_events`` is replayed
    through ``streaming.stateful.stream_zscore`` — a real
    ``applyInPandasWithState`` query over a file-source stream split
    into two micro-batches (trailing window crosses the batch
    boundary through the state store) — and shares
    ``SQL_ANOMALY_EVENTS`` as its oracle verbatim. That works
    because the stream operator replays the batch ROWS-frame
    statistic bit-for-bit (NULL-slot semantics + floor-quantized
    sums; tests/test_round7_properties.py), so a value hash match
    here certifies the stateful streaming path itself, not a
    look-alike. Batches arrive in bucket order (mtime-ordered files,
    maxFilesPerTrigger=1), matching the in-order contract."""
    from dish_data_pipeline_spark.ops.timeseries import gap_fill, resample
    from dish_data_pipeline_spark.streaming.stateful import stream_zscore

    e = read(spark, sf_dir, "events")
    g = gap_fill(
        resample(e, "ts", "event_type", "value", GAP_STEP_SEC),
        "event_type",
        GAP_STEP_SEC,
    ).select("event_type", "bucket", "value")
    return _replay_as_stream(
        spark,
        g,
        "bucket",
        lambda stream: stream_zscore(
            stream,
            key_cols=("event_type",),
            ts_col="bucket",
            window_rows=ZSCORE_WINDOW,
            threshold=ZSCORE_THRESHOLD,
        ),
        "stream_zscore_replay_sink",
    )


DEBOUNCE_REPLAY_GAP_SEC = 14400  # 4 h: ~half the chain suppressed
DEBOUNCE_REPLAY_FILTER = "user_id % 7 = 0"  # bounds the O(kept·n) oracle


def q_stream_debounce_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third stateful-streaming certification, third operator family
    (timer-anchored suppression): ``streaming.stateful
    .stream_debounce`` — kept-anchored alerting debounce whose
    last-kept whole-second timestamp crosses the micro-batch
    boundary through the state store. Kept-anchored semantics are
    inherently sequential (each decision depends on the previous
    KEPT event, not the previous event), which no window chain
    expresses — the DuckDB twin walks the exact recurrence with a
    recursive next-kept-event CTE: next = min-(ts, event_id) event
    whose whole-second floor is ≥ last kept floor + gap (argmin via
    NOT EXISTS — neither aggregates nor, in DuckDB 1.0, reliable
    list/string accumulation in lambda folds are available, and the
    walk costs O(kept·n) per key, so the replay runs on a
    deterministic user slice that keeps the oracle seconds-scale).
    Per-event-type chains, 4-hour gap."""
    from dish_data_pipeline_spark.streaming.stateful import stream_debounce

    e = (
        read(spark, sf_dir, "events")
        .filter(DEBOUNCE_REPLAY_FILTER)
        .select("event_type", "event_id", "ts")
    )
    return _replay_as_stream(
        spark,
        e,
        "ts",
        lambda stream: stream_debounce(
            stream, DEBOUNCE_REPLAY_GAP_SEC, key_cols=("event_type",)
        ),
        "stream_debounce_replay_sink",
    )


# Oracle device: recursive next-kept-event walk. A list_reduce fold
# would be the natural spelling, but DuckDB 1.0 silently drops
# accumulated LIST- and long-VARCHAR-typed struct fields across
# list_reduce iterations (scalar fields fold correctly — verified
# empirically), so the sequential recurrence is expressed as
# recursion with NOT-EXISTS argmin instead.
SQL_STREAM_DEBOUNCE_REPLAY = f"""
WITH RECURSIVE
ev AS MATERIALIZED (
  SELECT event_type AS k, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS tsf
  FROM events WHERE {DEBOUNCE_REPLAY_FILTER}),
kept(k, event_id, ts, tsf) AS (
  SELECT k, event_id, ts, tsf FROM ev e
  WHERE NOT EXISTS (SELECT 1 FROM ev e2 WHERE e2.k = e.k
        AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id < e.event_id)))
  UNION ALL
  SELECT e.k, e.event_id, e.ts, e.tsf
  FROM kept x JOIN ev e
    ON e.k = x.k AND e.tsf >= x.tsf + {DEBOUNCE_REPLAY_GAP_SEC}
  WHERE NOT EXISTS (
    SELECT 1 FROM ev e2
    WHERE e2.k = x.k AND e2.tsf >= x.tsf + {DEBOUNCE_REPLAY_GAP_SEC}
      AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id < e.event_id))))
SELECT k AS event_type, event_id, ts FROM kept
"""


FUNNEL_REPLAY_STEPS = ["signup", "view", "click", "purchase"]


def q_stream_funnel_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second stateful-streaming certification, different operator
    family: ``streaming.stateful.stream_funnel`` — a per-user
    multi-stage state machine (one timestamp per stage in the state
    store) — replayed over the event stream in two ts-ordered
    micro-batches, so mid-funnel users cross the batch boundary
    through state. On in-order input the stream's advance-on-arrival
    rule computes exactly the batch recurrence (stage k = first
    step-k event strictly after stage k-1), which the DuckDB twin
    expresses as chained per-stage MIN CTEs unpivoted to the
    stream's (user, stage, name, ts) advancement rows."""
    from dish_data_pipeline_spark.streaming.stateful import stream_funnel

    e = read(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return _replay_as_stream(
        spark,
        e,
        "ts",
        lambda stream: stream_funnel(
            stream, FUNNEL_REPLAY_STEPS, tiebreak_cols=("event_id",)
        ),
        "stream_funnel_replay_sink",
        # per-USER Python state machine: ~|users| groups of CPU-bound
        # pandas work — needs cluster width, not byte-sized partitions
        state_partitions=spark.sparkContext.defaultParallelism,
    )


def _sql_stream_funnel_replay() -> str:
    steps = FUNNEL_REPLAY_STEPS
    ctes = [
        f"""s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{steps[0]}' GROUP BY 1)"""
    ]
    for i in range(2, len(steps) + 1):
        ctes.append(f"""s{i} AS (
  SELECT e.user_id, MIN(e.ts) AS t{i}
  FROM events e JOIN s{i - 1} p ON e.user_id = p.user_id
  WHERE e.event_type = '{steps[i - 1]}' AND e.ts > p.t{i - 1}
  GROUP BY 1)""")
    sel = "\nUNION ALL ".join(
        f"SELECT user_id, CAST({i} AS INTEGER) AS stage, "
        f"'{steps[i - 1]}' AS stage_name, t{i} AS stage_ts FROM s{i}"
        for i in range(1, len(steps) + 1)
    )
    return f"WITH {', '.join(ctes)}\n{sel}"


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIO tier of the multimodal convention, end to end: each
    event type's value series (ordered by ts, event_id; NULLs
    dropped; floor-quantized and clamped to int16) is PACKED into a
    real mono 16-bit PCM RIFF/WAVE blob (`wav_from_samples`, one
    keyed pass — event_type stands in for a recording id, so per-key
    blob size is recording-bounded at scale), then DECODED back by
    the pure-Python WAV parser and reduced to signal features
    (`extract_audio_features`: RMS from the exact integer power sum,
    strict sign-change zero crossings). The DuckDB twin computes the
    same statistics directly on the quantized series — a hash match
    therefore certifies that pack → parse is lossless AND the
    feature arithmetic is exact, i.e. the whole binary audio path,
    not a look-alike."""
    import numpy as np
    import pandas as pd

    from dish_data_pipeline_spark.ops.multimodal import (
        extract_audio_features,
        wav_from_samples,
    )

    e = read(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=["value"]).sort_values(["ts", "event_id"])
        if not len(pdf):
            # a key whose values are ALL NULL packs nothing — mirror
            # the oracle, which has no row for it (WHERE value IS NOT
            # NULL empties the group before aggregation)
            return pd.DataFrame({"event_type": [], "content": []})
        samples = (
            np.clip(np.floor(pdf["value"].to_numpy(dtype=float)),
                    -32768, 32767)
            .astype(np.int64)
        )
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "content": [wav_from_samples(samples, sample_rate=8000)],
            }
        )

    blobs = e.groupBy("event_type").applyInPandas(
        pack, "event_type string, content binary"
    )
    return extract_audio_features(blobs, id_col="event_type").select(
        "event_type", "n_frames", "rms", "n_zero_cross"
    )


SQL_AUDIO_FEATURES = """
WITH s AS (
  SELECT event_type, ts, event_id,
         GREATEST(-32768, LEAST(32767,
           CAST(floor(value) AS BIGINT))) AS smp
  FROM events WHERE value IS NOT NULL),
lagged AS (
  SELECT event_type, smp,
         LAG(smp) OVER (PARTITION BY event_type
                        ORDER BY ts, event_id) AS prev
  FROM s)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       sqrt(CAST(SUM(smp * smp) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS rms,
       CAST(SUM(CASE WHEN prev IS NOT NULL
                      AND ((prev < 0) <> (smp < 0))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
FROM lagged GROUP BY 1
"""


# --- Image tier: real PNG pack → decode → pixel features ----------
def q_image_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IMAGE tier end to end through a REAL codec: each event
    type's value series (ordered by ts, event_id; NULLs dropped;
    floor-clamped to 0..255) becomes a 32-wide uint8 raster, PACKED
    into a real 8-bit grayscale PNG (`png_from_samples` twin
    ``png_from_array``) with the scanline filter CYCLING through all
    five PNG filter types (None/Sub/Up/Average/Paeth — so the oracle
    certifies every unfilter path, not just the trivial one), then
    DECODED back by the pure-Python `decode_png` kernel and reduced
    to exact integer pixel statistics. The DuckDB twin computes the
    same statistics directly on the quantized series — a hash match
    proves deflate-compress → filter → unfilter → decompress is
    lossless. Same device as `audio_features` (pack→parse vs direct
    SQL)."""
    import numpy as np
    import pandas as pd

    from dish_data_pipeline_spark.ops.multimodal import (
        decode_png,
        png_from_array,
    )

    W = 32
    e = read(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=["value"]).sort_values(["ts", "event_id"])
        px = (
            np.clip(np.floor(pdf["value"].to_numpy(dtype=float)), 0, 255)
            .astype(np.uint8)
        )
        h = len(px) // W
        if h == 0:  # mirror the oracle's HAVING h > 0
            return pd.DataFrame({"event_type": [], "content": []})
        arr = px[: h * W].reshape(h, W)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "content": [
                    png_from_array(
                        arr, row_filters=[y % 5 for y in range(h)]
                    )
                ],
            }
        )

    blobs = e.groupBy("event_type").applyInPandas(
        pack, "event_type string, content binary"
    )

    def stats(batches):
        for pdf in batches:
            rows = []
            for t, blob in zip(pdf["event_type"], pdf["content"]):
                a = decode_png(bytes(blob)).astype(np.int64)
                rows.append(
                    (
                        t,
                        int(a.shape[0]),
                        int(a.shape[1]),
                        int(a.sum()),
                        int(a.min()),
                        int(a.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "event_type", "height", "width",
                    "pix_sum", "pix_min", "pix_max",
                ],
            )

    out = blobs.mapInPandas(
        stats,
        "event_type string, height bigint, width bigint, "
        "pix_sum bigint, pix_min bigint, pix_max bigint",
    )
    return out.withColumn(
        "mean_pix",
        F.col("pix_sum").cast("double")
        / (F.col("height") * F.col("width")).cast("double"),
    )


SQL_IMAGE_PNG_FEATURES = """
WITH s AS (
  SELECT event_type,
         GREATEST(0, LEAST(255, CAST(floor(value) AS BIGINT))) AS px,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) // 32 AS h
  FROM events WHERE value IS NOT NULL)
SELECT event_type,
       CAST(MAX(h) AS BIGINT) AS height,
       CAST(32 AS BIGINT) AS width,
       CAST(SUM(px) AS BIGINT) AS pix_sum,
       CAST(MIN(px) AS BIGINT) AS pix_min,
       CAST(MAX(px) AS BIGINT) AS pix_max,
       CAST(SUM(px) AS DOUBLE) /
       CAST(MAX(h) * 32 AS DOUBLE) AS mean_pix
FROM s WHERE rn <= h * 32 AND h > 0
GROUP BY event_type
"""


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VIDEO tier end to end, completing the modality triple
    (image `image_png_features`, audio `audio_features`, video
    here): each event type's quantized value series becomes 8×16
    uint8 frames PACKED into a real indexed VID0 container (offset
    table + per-frame PNG payloads, frame filters cycling all five
    PNG types), then every 3rd frame is SELECTIVELY decoded —
    offset-table seek, untouched frames never inflated, the
    keyframe-sampling cost model — and reduced to exact integer
    pixel stats per sampled frame. The DuckDB twin computes the
    same stats directly on the quantized series via row-number
    frame arithmetic — a hash match certifies pack → index walk →
    selective PNG unfilter lossless AND the sampling arithmetic."""
    import numpy as np
    import pandas as pd

    from dish_data_pipeline_spark.ops.multimodal import (
        sample_video_features,
        video_from_frames,
    )

    FH, FW, K = 8, 16, 3
    e = read(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=["value"]).sort_values(["ts", "event_id"])
        px = (
            np.clip(np.floor(pdf["value"].to_numpy(dtype=float)), 0, 255)
            .astype(np.uint8)
        )
        nf = len(px) // (FH * FW)
        if nf == 0:
            return pd.DataFrame({"event_type": [], "content": []})
        frames = list(px[: nf * FH * FW].reshape(nf, FH, FW))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "content": [video_from_frames(frames)],
            }
        )

    blobs = e.groupBy("event_type").applyInPandas(
        pack, "event_type string, content binary"
    )
    return sample_video_features(
        blobs, every_k=K, id_col="event_type", content_col="content"
    )


SQL_VIDEO_FRAMES = """
WITH s AS (
  SELECT event_type,
         GREATEST(0, LEAST(255, CAST(floor(value) AS BIGINT))) AS px,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY event_type) // 128 AS nf
  FROM events WHERE value IS NOT NULL)
SELECT event_type,
       CAST(rn // 128 AS BIGINT) AS frame_index,
       CAST(8 AS BIGINT) AS height,
       CAST(16 AS BIGINT) AS width,
       CAST(SUM(px) AS BIGINT) AS pix_sum,
       CAST(MIN(px) AS BIGINT) AS pix_min,
       CAST(MAX(px) AS BIGINT) AS pix_max
FROM s
WHERE rn < nf * 128 AND (rn // 128) % 3 = 0
GROUP BY event_type, rn // 128
"""


# --- Streaming session windows, replay-certified -------------------
def q_stream_sessionize_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth stateful-streaming certification, fourth operator
    family (watermark-driven APPEND-mode aggregation):
    ``streaming.pipeline.sessionized_counts`` — native
    ``session_window`` gap sessions whose state merges across
    micro-batch boundaries. Append mode only flushes a session once
    the WATERMARK passes its end, and with availableNow the
    watermark freezes at the last batch's event time — so the replay
    appends two far-future sentinel batches: the first advances the
    watermark past every real session (they flush while the second
    is processed), the second exists so the first gets a watermark
    behind it too... which it never needs — sentinel sessions are
    deliberately left unflushed and filtered out by key. Boundary
    semantics verified empirically: a gap EXACTLY equal to the
    threshold MERGES (inclusive), session_end = last event + gap —
    the oracle's chain break is therefore ``diff > gap``, same as
    the batch `sessionize` convention."""
    import datetime as _dt

    from dish_data_pipeline_spark.streaming.pipeline import (
        sessionized_counts,
    )

    e = (
        read(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & (F.col("user_id") % 10 == 0))
        # watermarks require TIMESTAMP_LTZ; the session is pinned to
        # UTC, so this NTZ cast is a faithful reinterpretation and
        # the output wall-clock values match the oracle's naive ts
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    ts_type = e.schema["ts"].dataType
    hi = e.agg(F.max("ts").alias("m")).collect()[0]["m"]
    sent1, sent2 = (
        spark.createDataFrame(
            [(-1,)], "user_id bigint"
        ).select(
            "user_id",
            F.lit(hi + _dt.timedelta(days=10 * (i + 1)))
            .cast(ts_type)
            .alias("ts"),
        )
        for i in range(2)
    )
    # sentinel 1 rides INSIDE the second data batch (it sorts above
    # the median), so three micro-batches suffice: per-batch trigger
    # overhead dominates this replay's wall time
    out = _replay_as_stream(
        spark,
        e.unionByName(sent1),
        "ts",
        lambda s: sessionized_counts(
            s, ts_col="ts", gap="30 minutes",
            watermark="1 second", key_col="user_id",
        ),
        "stream_sessionize_replay_sink",
        extra_batches=(sent2,),
    )
    return out.filter(F.col("user_id") >= 0).select(
        "user_id", "session_start", "session_end", "n_events"
    )


SQL_STREAM_SESSIONIZE_REPLAY = """
WITH b AS (
  SELECT user_id, ts FROM events
  WHERE ts IS NOT NULL AND user_id % 10 = 0),
f AS (
  SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS flag
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT *, SUM(flag) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS seq
  FROM f)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, seq
"""


# --- Last-touch marketing attribution -------------------------------
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue attribution: each purchase credits the user's most
    recent click/view within a 7-day lookback (last-touch model),
    else 'unattributed'. Runs through the reusable
    :func:`operators.asof.asof_join` (backward + tolerance — the
    union-and-carry single-shuffle plan, not a per-purchase probe).
    Touches first dedupe to one per (user, second) keeping the max
    event_id — without it, a click and a view on the same second
    would leave the attribution engine-defined. Epoch-second keys so
    the tolerance arithmetic is integral."""
    from dish_data_pipeline_spark.operators.asof import asof_join

    e = read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        "value",
    )
    touches = (
        base.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "sec")
        .agg(F.max(F.struct("event_id", "event_type")).alias("t"))
        .select(
            "user_id", "sec", F.col("t.event_type").alias("touch_type")
        )
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "sec", "value"
    )
    j = asof_join(
        purchases,
        touches,
        on="sec",
        by=["user_id"],
        direction="backward",
        tolerance=604800,
    )
    return j.groupBy(
        F.coalesce(F.col("touch_type_right"), F.lit("unattributed")).alias(
            "touch_type"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum(F.col("value")).alias("revenue"),
    )


SQL_LAST_TOUCH_ATTRIBUTION = f"""
WITH b AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
  FROM events WHERE ts IS NOT NULL),
tmax AS (
  SELECT user_id, sec, MAX(event_id) AS tid
  FROM b WHERE event_type IN ('click', 'view')
  GROUP BY user_id, sec),
t2 AS (
  SELECT tmax.user_id, tmax.sec, b.event_type AS touch_type
  FROM tmax JOIN b ON b.event_id = tmax.tid),
p AS (
  SELECT user_id, event_id, sec, value FROM b
  WHERE event_type = 'purchase')
SELECT COALESCE(x.touch_type, 'unattributed') AS touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       {sql_dsum('p.value')} AS revenue
FROM p LEFT JOIN LATERAL (
  SELECT touch_type FROM t2
  WHERE t2.user_id = p.user_id
    AND t2.sec <= p.sec AND t2.sec >= p.sec - 604800
  ORDER BY t2.sec DESC LIMIT 1) x ON TRUE
GROUP BY 1
"""


def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear MULTI-touch attribution — the fractional sibling of
    `last_touch_attribution`: each purchase's revenue splits EVENLY
    across every click/view in the strictly-preceding 7-day window,
    in EXACT integer cents (floor share to all, remainder cents to
    the most recent touches — so per-purchase credit sums to its
    price to the cent, the invariant double division can't give).
    Touchless purchases stay whole under 'unattributed'.

    The candidate join runs through :func:`ops.interval.interval_join`
    — grid-banded point-in-interval equi-join (purchases become
    [ts-7d, ts) intervals, touches the points), the scale-safe
    spelling; a naive range join is a BroadcastNestedLoopJoin.
    Purchase values are positive in this data and both engines are
    guarded with ``value >= 0``, where integer ``DIV``/``%``
    (truncation, Spark) and ``//``/``%`` (floor, DuckDB) agree."""
    from dish_data_pipeline_spark.ops.interval import interval_join

    e = read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    touches = base.filter(
        F.col("event_type").isin("click", "view")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("t_ts"),
    )
    purchases = base.filter(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & (F.col("value") >= 0)
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_end"),
        (F.col("ts") - F.expr("INTERVAL 7 DAYS")).alias("p_start"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    pairs = interval_join(
        touches.withColumnRenamed("t_user", "by_user"),
        purchases.withColumnRenamed("p_user", "by_user"),
        point_ts="t_ts",
        start_col="p_start",
        end_col="p_end",
        by_cols=["by_user"],
    )
    w = Window.partitionBy("p_id").orderBy(
        F.desc("t_ts"), F.desc("t_id")
    )
    credited = (
        pairs.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("p_id"))
        )
        .withColumn(
            "share",
            F.expr("cents DIV n")
            + F.when(F.col("rk") <= F.col("cents") % F.col("n"), 1)
            .otherwise(0),
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("share").cast("bigint").alias("credited_cents"),
        )
    )
    unattributed = (
        purchases.join(
            pairs.select("p_id").distinct(), "p_id", "left_anti"
        )
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("cents").cast("bigint").alias("credited_cents"),
        )
        .select(
            F.lit("unattributed").alias("touch_type"),
            "n_credits",
            "credited_cents",
        )
    )
    return credited.unionByName(unattributed)


SQL_POSITION_ATTRIBUTION = """
WITH b AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
  FROM events WHERE ts IS NOT NULL),
t AS (
  SELECT user_id, event_id AS t_id, event_type AS touch_type,
         sec AS t_sec
  FROM b WHERE event_type IN ('click', 'view')),
p AS (
  SELECT user_id, event_id AS p_id, sec AS p_sec,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM b WHERE event_type = 'purchase'
    AND value IS NOT NULL AND value >= 0),
pairs AS (
  SELECT p.p_id, p.cents, t.touch_type, t.t_sec, t.t_id
  FROM p JOIN t ON t.user_id = p.user_id
   AND t.t_sec >= p.p_sec - 604800 AND t.t_sec < p.p_sec),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY p_id
                            ORDER BY t_sec DESC, t_id DESC) AS rk,
         COUNT(*) OVER (PARTITION BY p_id) AS n
  FROM pairs)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_credits,
       CAST(SUM(cents // n +
                CASE WHEN rk <= cents % n THEN 1 ELSE 0 END)
            AS BIGINT) AS credited_cents
FROM ranked GROUP BY touch_type
UNION ALL
SELECT 'unattributed',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(cents) AS BIGINT)
FROM p WHERE p_id NOT IN (SELECT p_id FROM pairs)
"""


# --- OHLC bars (financial resample) ---------------------------------
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles per event type: open/close are the first/
    last value in (ts, event_id) order — argmin/argmax spelled as
    one window pass with both row_numbers (built-in ``min_by`` /
    ``arg_min`` leave ties engine-defined; the explicit unique
    tiebreak doesn't) — high/low/count close the bar in the same
    grouped aggregation. NULL values excluded (they carry no
    price)."""
    e = read(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "day")
    fwd = w.orderBy("ts", "event_id")
    bwd = w.orderBy(F.desc("ts"), F.desc("event_id"))
    marked = d.withColumn("rn_a", F.row_number().over(fwd)).withColumn(
        "rn_d", F.row_number().over(bwd)
    )
    return marked.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


SQL_OHLC_BARS = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
SELECT event_type, day,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM d GROUP BY event_type, day
"""


# --- ABC (Pareto) classification ------------------------------------
def q_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC contribution analysis: parts ranked by revenue,
    classified A/B/C at the 80% / 95% cumulative-share thresholds.
    Revenue accumulates as exact integer cents and the class
    boundaries compare ``cum·100 ≤ total·80`` — pure BIGINT
    arithmetic, no float share ever enters a comparison (the share
    column itself is one BIGINT÷BIGINT division, output-only).
    One agg + one full-order window over the (small) per-part
    aggregate, not the fact table."""
    li = read(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
                " * CAST(l_quantity AS BIGINT)"
            )
        ).alias("rev_cents")
    )
    w = Window.orderBy(F.desc("rev_cents"), F.asc("l_partkey"))
    tot = Window.partitionBy()
    ranked = rev.withColumn(
        "cum_cents",
        F.sum("rev_cents").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("total_cents", F.sum("rev_cents").over(tot))
    classed = ranked.withColumn(
        "abc_class",
        F.when(
            F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A"
        )
        .when(
            F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B"
        )
        .otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_cents").alias("class_cents"),
        (
            F.sum("rev_cents").cast("double")
            / F.max("total_cents").cast("double")
        ).alias("share"),
    )


SQL_ABC_PARTS = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT l_partkey, rev_cents,
         SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
         SUM(rev_cents) OVER () AS total_cents
  FROM rev),
classed AS (
  SELECT *, CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                 WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                 ELSE 'C' END AS abc_class
  FROM ranked)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_cents) AS BIGINT) AS class_cents,
       CAST(SUM(rev_cents) AS DOUBLE) /
       CAST(MAX(total_cents) AS DOUBLE) AS share
FROM classed GROUP BY abc_class
"""


# --- Streaming tumbling windows, replay-certified -------------------
def q_stream_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth stateful-streaming certification: the MOST standard
    streaming op — watermarked tumbling-window aggregation
    (``streaming.pipeline.windowed_event_counts``, 1-day windows) —
    replayed across micro-batches with the same sentinel-watermark
    device as ``stream_sessionize_replay`` (append mode only flushes
    watermark-passed windows; availableNow freezes the watermark at
    end of data). Spark's ``window('1 day')`` aligns to the epoch,
    which in the pinned UTC session is exactly the oracle's
    ``date_trunc('day', ts)``."""
    import datetime as _dt

    from dish_data_pipeline_spark.streaming.pipeline import (
        windowed_event_counts,
    )

    e = (
        read(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
        )
    )
    hi = e.agg(F.max("ts").alias("m")).collect()[0]["m"]
    sent1, sent2 = (
        spark.createDataFrame(
            [("~sentinel~", 0.0)], "event_type string, value double"
        ).select(
            "event_type",
            F.lit(hi + _dt.timedelta(days=10 * (i + 1)))
            .cast("timestamp")
            .alias("ts"),
            "value",
        )
        for i in range(2)
    )
    out = _replay_as_stream(
        spark,
        e.unionByName(sent1.select(*e.columns)),
        "ts",
        lambda s: windowed_event_counts(
            s, ts_col="ts", window="1 day", watermark="1 second"
        ),
        "stream_window_replay_sink",
        extra_batches=(sent2.select(*e.columns),),
    )
    return out.filter(F.col("event_type") != "~sentinel~")


SQL_STREAM_WINDOW_REPLAY = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) AS TIMESTAMP)
         + INTERVAL 1 DAY AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2, 3
"""


# --- Streaming stream-stream interval join, replay-certified -------
def q_stream_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth stateful-streaming certification — the one stateful
    shape not yet driver-visible: a watermarked STREAM-STREAM
    interval join (click attributed to the same user's views in the
    preceding hour). Both sides are branches of one watermarked
    source stream (a self-join), so each micro-batch buffers both
    sides' state and cross-batch matches (batch-1 view ↔ batch-2
    click) must come from the state store. Inner stream-stream joins
    emit eagerly, so no watermark sentinel is needed; the 2-hour
    delay only bounds state. Late-drop-free by construction: the
    replay splits batches at the ts median, so batch 2's minimum
    event time exceeds batch 1's watermark — the stream result is
    exactly the batch interval join the oracle computes."""
    e = (
        read(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
        )
    )

    def tf(s):
        s = s.withWatermark("ts", "2 hours")
        clicks = s.filter(F.col("event_type") == "click").select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        views = s.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("value").alias("view_value"),
        )
        return clicks.join(
            views,
            F.expr(
                "user_id = v_user AND "
                "view_ts BETWEEN click_ts - INTERVAL 1 HOUR AND click_ts"
            ),
        ).select(
            "user_id", "click_ts", "view_ts", "click_value", "view_value"
        )

    return _replay_as_stream(spark, e, "ts", tf, "stream_join_replay_sink")


SQL_STREAM_JOIN_REPLAY = """
SELECT c.user_id,
       c.ts AS click_ts,
       v.ts AS view_ts,
       c.value AS click_value,
       v.value AS view_value
FROM events c
JOIN events v
  ON v.user_id = c.user_id
 AND v.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
WHERE c.event_type = 'click' AND v.event_type = 'view'
  AND c.ts IS NOT NULL AND v.ts IS NOT NULL
"""


# --- Streaming watermark-bounded dedup, replay-certified -----------
def q_stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEVENTH stateful-streaming certification, and the one
    remaining stateful primitive not yet driver-visible:
    ``dropDuplicatesWithinWatermark``
    (``streaming.pipeline.stream_dedup_exact``) — the
    bounded-state streaming dedup a 100 TB ingest needs (plain
    ``dropDuplicates`` state grows forever).

    Duplicates are PLANTED: every click event is re-sent as a retry
    3 days later with the same id and payload, then the union is
    replayed as two micro-batches split at the ts median. Retries in
    the 3-day band straddling the median land in batch 2 while their
    originals' state was written by batch 1 — the cross-batch
    state-store dedup path. Suppression is total by construction:
    the retry delay (3 d) is below the watermark delay (7 d), so a
    retry either finds its original's live state (deduped) or its
    original was already evicted — which requires the retry itself
    to sit below the watermark, where the stateful operator drops it
    as late. Either path removes the row, so the streamed result is
    exactly the distinct originals.

    Kept-row nondeterminism (original vs retry differ only in ts)
    is neutralized by projecting ts away AFTER dedup — the surviving
    payload is identical either way. A single leaked retry would
    duplicate a payload row and fail the oracle's row count."""
    from dish_data_pipeline_spark.streaming.pipeline import (
        stream_dedup_exact,
    )

    e = (
        read(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
        )
    )
    retries = e.filter(F.col("event_type") == "click").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 3 DAYS")
    )
    out = _replay_as_stream(
        spark,
        e.unionByName(retries),
        "ts",
        lambda s: stream_dedup_exact(
            s.withColumn("k", F.col("event_id").cast("string")),
            ts_col="ts",
            watermark="7 days",
            content_col="k",
        ),
        "stream_dedup_replay_sink",
    )
    return out.select("event_id", "user_id", "event_type", "value")


SQL_STREAM_DEDUP_REPLAY = """
SELECT event_id, user_id, event_type, value
FROM events WHERE ts IS NOT NULL
"""


# --- Streaming exactly-once lakehouse sink, replay-certified --------
def q_stream_sink_exactly_once(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EIGHTH streaming certification — the SINK side of the
    streaming story (the previous seven certify operators; this one
    certifies delivery): ``streaming.pipeline.stream_append_to_table``
    ingests events into a manifest lakehouse table through
    ``foreachBatch`` + per-``(app, batch)`` txn markers (the Delta
    ``txnAppId``/``txnVersion`` device). The stream runs TWICE over
    the same two-file source — the second run with a FRESH checkpoint,
    the worst-case at-least-once replay (every batch re-executes) —
    and the self-check pins exactly-once delivery structurally: the
    table's version count must not move on replay (v0 create + one
    append per batch, then nothing). Oracle: a plain aggregate over
    events — any duplicated batch would double counts and fail the
    value hash."""
    import os as _os
    import shutil as _sh
    import tempfile as _tmp

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.streaming.pipeline import (
        stream_append_to_table,
    )

    e = (
        read(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        .localCheckpoint()
    )
    mid = e.agg(
        F.percentile_approx("ts", 0.5, 1_000_000).alias("m")
    ).collect()[0]["m"]
    work = _tmp.mkdtemp(prefix="stream_sink_eo_")
    src_dir = _os.path.join(work, "src")
    _os.makedirs(src_dir)
    table = _os.path.join(work, "table")
    try:
        _write_replay_batches(
            src_dir,
            (e.filter(F.col("ts") <= mid), e.filter(F.col("ts") > mid)),
        )
        be = ManifestParquetBackend()
        be.create(_empty_1slice(spark, e.schema), table)

        def run(ck: str) -> None:
            q = stream_append_to_table(
                spark.readStream.schema(e.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir),
                table,
                _os.path.join(work, ck),
                app_id="events_ingest",
            )
            q.awaitTermination(300)

        run("ck1")
        v1 = be.latest_version(table)
        run("ck2")  # fresh checkpoint = full at-least-once replay
        v2 = be.latest_version(table)
        if not (v1 == 2 and v2 == 2):
            raise RuntimeError(
                f"exactly-once broken: versions {v1} -> {v2} "
                "(replay must commit nothing)"
            )
        out = (
            be.read(spark, table)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum(F.col("value")).alias("sum_value"),
            )
        )
        # eager JVM-side snapshot (no driver collect round-trip);
        # valid after the scratch table is torn down below
        return out.localCheckpoint()
    finally:
        _sh.rmtree(work, ignore_errors=True)


SQL_STREAM_SINK_EXACTLY_ONCE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('value')} AS sum_value
FROM events WHERE ts IS NOT NULL
GROUP BY event_type
"""


# --- Streaming exactly-once lakehouse MERGE, replay-certified ------
def q_stream_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NINTH streaming certification — the UPSERT sink
    (``streaming.pipeline.stream_upsert_to_table``): micro-batch 1
    ingests every event, micro-batch 2 re-delivers all click events
    3 days later with doubled values (the late-correction shape a
    CDC feed produces); each batch keep-latest-MERGEs into a
    manifest lakehouse table under per-batch txn markers. The whole
    stream then REPLAYS with a fresh checkpoint — self-check pins
    that the replay recomputes nothing (version count unchanged:
    create + one MERGE per batch, then nothing). Oracle: originals
    with click values doubled — a leaked stale row or double-applied
    correction fails the value hash."""
    import os as _os
    import shutil as _sh
    import tempfile as _tmp

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.streaming.pipeline import (
        stream_upsert_to_table,
    )

    e = (
        read(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id", "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"), "value",
        )
        .localCheckpoint()
    )
    corrections = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("ts"),
        (F.col("value") * 2).alias("value"),
    )
    work = _tmp.mkdtemp(prefix="stream_upsert_eo_")
    src_dir = _os.path.join(work, "src")
    _os.makedirs(src_dir)
    table = _os.path.join(work, "table")
    try:
        _write_replay_batches(src_dir, (e, corrections))
        be = ManifestParquetBackend()
        be.create(_empty_1slice(spark, e.schema), table)

        def run(ck: str) -> None:
            q = stream_upsert_to_table(
                spark.readStream.schema(e.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir),
                table,
                ["event_id"],
                "ts",
                _os.path.join(work, ck),
                app_id="events_upsert",
            )
            q.awaitTermination(300)

        run("ck1")
        v1 = be.latest_version(table)
        run("ck2")  # fresh checkpoint = full at-least-once replay
        if not (v1 == 2 and be.latest_version(table) == 2):
            raise RuntimeError(
                f"exactly-once MERGE broken: versions {v1} -> "
                f"{be.latest_version(table)}"
            )
        out = be.read(spark, table).select(
            "event_id", "user_id", "event_type", "value"
        )
        # eager JVM-side snapshot (no driver collect round-trip);
        # valid after the scratch table is torn down below
        return out.localCheckpoint()
    finally:
        _sh.rmtree(work, ignore_errors=True)


SQL_STREAM_UPSERT_REPLAY = """
SELECT event_id, user_id, event_type,
       CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
FROM events WHERE ts IS NOT NULL
"""


STREAM_MERGE_SQL = """
    MERGE `proj.dishdata.tgt_events` T
    USING (
        SELECT * EXCEPT(row_num) FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY event_id ORDER BY ts DESC
            ) AS row_num
            FROM `proj.dishdata.staging_events`
        )
        WHERE row_num = 1
    ) S
    ON T.event_id = S.event_id
    WHEN MATCHED THEN
      UPDATE SET
        T.user_id = S.user_id,
        T.event_type = S.event_type,
        T.ts = S.ts,
        T.value = S.value
    WHEN NOT MATCHED THEN
      INSERT (event_id, user_id, event_type, ts, value)
      VALUES (S.event_id, S.user_id, S.event_type, S.ts, S.value)
"""


def q_stream_merge_sql_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TENTH streaming certification — the round-12 textual MERGE
    surface unified with the round-8 exactly-once sinks (round-13
    judge ask #5): the reference's literal ga_sessions statement
    shape (reference pipeline/data_pipeline.py:177-206) drives a
    ``foreachBatch`` sink via
    ``streaming.pipeline.stream_merge_sql_to_table``, each
    micro-batch binding as the statement's USING source and
    committing through ``merge_sql.merge_into_backend`` with
    per-batch txn markers. THREE micro-batches: all events, click
    corrections (value doubled, ts +3d), view corrections (value
    tripled, ts +5d). The stream then REPLAYS with a fresh
    checkpoint — the self-check pins that the replay commits nothing
    (version history stays create + one MERGE per batch). Oracle:
    originals with click values doubled and view values tripled — a
    stale row, a double-applied correction, or a replay-added
    version fails."""
    import os as _os
    import shutil as _sh
    import tempfile as _tmp

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.streaming.pipeline import (
        stream_merge_sql_to_table,
    )

    e = (
        read(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id", "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"), "value",
        )
        .localCheckpoint()
    )

    def corrected(etype: str, factor: int, days: int) -> DataFrame:
        return e.filter(F.col("event_type") == etype).select(
            "event_id", "user_id", "event_type",
            (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            (F.col("value") * factor).alias("value"),
        )

    batches = [e, corrected("click", 2, 3), corrected("view", 3, 5)]
    work = _tmp.mkdtemp(prefix="stream_merge_sql_")
    src_dir = _os.path.join(work, "src")
    _os.makedirs(src_dir)
    table = _os.path.join(work, "table")
    try:
        _write_replay_batches(src_dir, batches)
        be = ManifestParquetBackend()
        be.create(_empty_1slice(spark, e.schema), table)

        def run(ck: str) -> None:
            q = stream_merge_sql_to_table(
                spark.readStream.schema(e.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir),
                STREAM_MERGE_SQL,
                table,
                _os.path.join(work, ck),
                app_id="events_merge_sql",
            )
            q.awaitTermination(300)

        run("ck1")
        v1 = be.latest_version(table)
        run("ck2")  # fresh checkpoint = full at-least-once replay
        if not (v1 == 3 and be.latest_version(table) == 3):
            raise RuntimeError(
                f"exactly-once textual MERGE broken: versions {v1} -> "
                f"{be.latest_version(table)}"
            )
        out = be.read(spark, table).select(
            "event_id", "user_id", "event_type", "value"
        )
        # eager JVM-side snapshot (no driver collect round-trip);
        # valid after the scratch table is torn down below
        return out.localCheckpoint()
    finally:
        _sh.rmtree(work, ignore_errors=True)


SQL_STREAM_MERGE_SQL_REPLAY = """
SELECT event_id, user_id, event_type,
       CASE WHEN event_type = 'click' THEN value * 2
            WHEN event_type = 'view' THEN value * 3
            ELSE value END AS value
FROM events WHERE ts IS NOT NULL
"""


# --- Privacy release gate: k-anonymity + l-diversity ---------------
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy release gate (``ops.privacy``): generalize customer
    quasi-identifiers (nation kept, balance bucketed to 1000-wide
    bands), k-anonymize at k=8 (cohorts smaller than 8 suppressed —
    one window-count shuffle, no join), then report each surviving
    cohort's size and l-diversity of the sensitive market segment.
    Oracle: GROUP BY + HAVING over the same generalization — the
    suppression decision must match exactly, including NULL-cohort
    and negative-balance band edges (floor rounds toward -inf on
    both engines)."""
    from dish_data_pipeline_spark.ops.privacy import k_anonymize, l_diversity

    c = read(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        "c_mktsegment",
    )
    anon = k_anonymize(c, ["c_nationkey", "bal_band"], k=8)
    return l_diversity(anon, ["c_nationkey", "bal_band"], "c_mktsegment")


SQL_K_ANONYMITY = """
SELECT c_nationkey,
       CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
FROM customer
GROUP BY 1, 2
HAVING COUNT(*) >= 8
"""


# --- Mondrian multidimensional k-anonymity --------------------------
def q_mondrian_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian k-anonymity (``ops.privacy.mondrian_anonymize``) —
    the GENERALIZATION tier above ``k_anonymity``'s suppression:
    3 round-robin median cuts over (balance cents, nation) carve the
    quasi-identifier plane into 8 axis-aligned cells, each released
    as its per-dimension ranges + population, cells under k=25
    suppressed. Oracle: the same 3 rounds unrolled as chained CTEs —
    nearest-rank medians (ceil(n/2)-th smallest, a data value,
    deterministic under ties) keep the cut points bit-identical
    across engines."""
    from dish_data_pipeline_spark.ops.privacy import mondrian_anonymize

    c = read(spark, sf_dir, "customer").select(
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias(
            "bal_cents"
        ),
        F.col("c_nationkey").cast("bigint").alias("nation"),
    )
    out = mondrian_anonymize(c, ["bal_cents", "nation"], rounds=3, k=25)
    return out.withColumn("cell", F.col("cell").cast("bigint"))


def _sql_mondrian_anonymity() -> str:
    med = (
        "SELECT cell, v AS med FROM ("
        "SELECT cell, {d} AS v, "
        "ROW_NUMBER() OVER (PARTITION BY cell ORDER BY {d}) AS rn, "
        "COUNT(*) OVER (PARTITION BY cell) AS n FROM {src}) "
        "WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)"
    )
    split = (
        "SELECT d1, d2, {src}.cell * 2 + "
        "CASE WHEN {d} > med THEN 1 ELSE 0 END AS cell "
        "FROM {src} JOIN {m} ON {m}.cell = {src}.cell"
    )
    parts = [
        "WITH b0 AS ("
        "SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS d1, "
        "CAST(c_nationkey AS BIGINT) AS d2, 0 AS cell "
        "FROM customer "
        "WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL)"
    ]
    for r, d in enumerate(["d1", "d2", "d1"]):
        parts.append(
            f"m{r + 1} AS ({med.format(d=d, src=f'b{r}')})"
        )
        parts.append(
            f"b{r + 1} AS ("
            + split.format(d=d, src=f"b{r}", m=f"m{r + 1}")
            + ")"
        )
    return (
        ",\n".join(parts)
        + """
SELECT CAST(cell AS BIGINT) AS cell,
       MIN(d1) AS bal_cents_lo, MAX(d1) AS bal_cents_hi,
       MIN(d2) AS nation_lo, MAX(d2) AS nation_hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b3 GROUP BY cell HAVING COUNT(*) >= 25
"""
    )


# --- Welch's t-test: A/B experiment readout -------------------------
def q_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Welch's unequal-variance t-test between two
    experiment arms (user parity split — deterministic on both
    engines). The statistic chain is the ``stats_corr`` device:
    values floor-quantize to integer cents, so the per-arm count /
    sum / sum-of-squares moments are exact BIGINTs under any
    aggregation order (safe domain: |value| <= ~1e6 cents with ~1e7
    rows per arm keeps sum-of-squares below int64 max); the closing
    t statistic and Welch–Satterthwaite dof are the same IEEE
    expression on both engines, so the driver's value hash matches
    bit-for-bit. One shuffle (the groupBy); conditional FILTER sums
    keep both arms in a single pass."""
    e = read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    y = F.floor(F.col("value") * 100).cast("bigint")
    arm_a = (F.col("user_id") % 2) == 0
    agg = e.groupBy("event_type").agg(
        F.count(F.when(arm_a, 1)).alias("na"),
        F.count(F.when(~arm_a, 1)).alias("nb"),
        F.sum(F.when(arm_a, y)).alias("sa"),
        F.sum(F.when(~arm_a, y)).alias("sb"),
        F.sum(F.when(arm_a, y * y)).alias("ssa"),
        F.sum(F.when(~arm_a, y * y)).alias("ssb"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ma, mb = d("sa") / d("na"), d("sb") / d("nb")
    # unbiased variance from exact integer moments:
    # (n*ss - s^2) / (n*(n-1)) — one expression shape on both engines
    va = (d("na") * d("ssa") - d("sa") * d("sa")) / (
        d("na") * (d("na") - F.lit(1.0))
    )
    vb = (d("nb") * d("ssb") - d("sb") * d("sb")) / (
        d("nb") * (d("nb") - F.lit(1.0))
    )
    se2a, se2b = va / d("na"), vb / d("nb")
    t = (ma - mb) / F.sqrt(se2a + se2b)
    dof = (se2a + se2b) * (se2a + se2b) / (
        se2a * se2a / (d("na") - F.lit(1.0))
        + se2b * se2b / (d("nb") - F.lit(1.0))
    )
    return agg.select(
        "event_type",
        "na",
        "nb",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        t.alias("t_stat"),
        dof.alias("welch_dof"),
    )


SQL_AB_TEST_WELCH = """
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS na,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 <> 0) AS BIGINT) AS nb,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
              FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS sa,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
              FILTER (WHERE user_id % 2 <> 0) AS BIGINT) AS sb,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)
                  * CAST(FLOOR(value * 100) AS BIGINT))
              FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS ssa,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)
                  * CAST(FLOOR(value * 100) AS BIGINT))
              FILTER (WHERE user_id % 2 <> 0) AS BIGINT) AS ssb
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type),
v AS (
  SELECT event_type, na, nb,
         CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_a,
         CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b,
         ((CAST(na AS DOUBLE) * CAST(ssa AS DOUBLE)
           - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
          / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)))
         / CAST(na AS DOUBLE) AS se2a,
         ((CAST(nb AS DOUBLE) * CAST(ssb AS DOUBLE)
           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
          / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)))
         / CAST(nb AS DOUBLE) AS se2b
  FROM m)
SELECT event_type, na, nb, mean_a, mean_b,
       (mean_a - mean_b) / SQRT(se2a + se2b) AS t_stat,
       (se2a + se2b) * (se2a + se2b)
       / (se2a * se2a / (CAST(na AS DOUBLE) - 1.0)
          + se2b * se2b / (CAST(nb AS DOUBLE) - 1.0)) AS welch_dof
FROM v
"""


# --- CUPED variance-reduced A/B readout -----------------------------
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013 — the
    standard industry A/B device): per-user pre-period spend (before
    Jan 16) is the covariate X, post-period spend the metric Y;
    θ = cov(X,Y)/var(X) is estimated POOLED, and each arm reports
    its adjusted mean  ȳ_arm − θ·(x̄_arm − x̄_pooled), whose variance
    shrinks by the X-Y correlation² without biasing the treatment
    contrast. Exactness: per-user sums are integer cents, the five
    pooled moments and per-arm sums are exact BIGINTs (safe domain:
    per-user cents below ~3e9 at ~1e5 users keeps Σx² under int64
    max), and θ / the adjusted means close as one fixed-shape IEEE
    expression on both engines. Two shuffles (per-user, then 2-row
    per-arm); the 1-row pooled moments broadcast."""
    e = read(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pre = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # persisted: both the pooled moments and the per-arm sums consume
    # per_user — without it the events scan+shuffle runs twice
    per_user = tracked_persist(
        e.groupBy("user_id").agg(
            F.coalesce(F.sum(F.when(pre, cents)), F.lit(0)).alias("x"),
            F.coalesce(F.sum(F.when(~pre, cents)), F.lit(0)).alias("y"),
        )
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    per_arm = per_user.groupBy(
        (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("ax"),
        F.sum("y").alias("ay"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    theta = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    return (
        per_arm.crossJoin(F.broadcast(pooled))
        .select(
            "arm",
            "n_users",
            (d("ay") / d("n_users")).alias("mean_post"),
            theta.alias("theta"),
            (
                d("ay") / d("n_users")
                - theta * (d("ax") / d("n_users") - d("sx") / d("n"))
            ).alias("mean_adjusted"),
        )
    )


SQL_AB_CUPED = """
WITH pu AS (
  SELECT user_id,
         COALESCE(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                  FILTER (WHERE ts < TIMESTAMP '2024-01-16'), 0) AS x,
         COALESCE(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                  FILTER (WHERE ts >= TIMESTAMP '2024-01-16'), 0) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id),
pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pu),
arms AS (
  SELECT user_id % 2 AS arm,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS ax,
         CAST(SUM(y) AS BIGINT) AS ay
  FROM pu GROUP BY user_id % 2)
SELECT arm, n_users,
       CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_post,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
       CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE)
       - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
         * (CAST(ax AS DOUBLE) / CAST(n_users AS DOUBLE)
            - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS mean_adjusted
FROM arms, pooled
"""


# --- Benford first-digit audit --------------------------------------
_BENFORD_CASE = (
    "CASE digit WHEN 1 THEN 0.3010299956639812 "
    "WHEN 2 THEN 0.17609125905568124 "
    "WHEN 3 THEN 0.12493873660829992 "
    "WHEN 4 THEN 0.09691001300805642 "
    "WHEN 5 THEN 0.07918124604762482 "
    "WHEN 6 THEN 0.06694678963061322 "
    "WHEN 7 THEN 0.05799194697768673 "
    "WHEN 8 THEN 0.05115252244738129 "
    "ELSE 0.04575749056067514 END"
)
# CAST to DOUBLE on BOTH engines: Spark types the bare fractional
# literals as decimal(17,17) while DuckDB picks DECIMAL(16,16) — the
# driver's value hash canonicalizes those differently even when the
# floats are identical, so the shared constant must leave the CASE
# as an IEEE double.
_BENFORD_CASE_D = f"CAST({_BENFORD_CASE} AS DOUBLE)"


def q_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classic fabricated-data / upstream-corruption screen a data
    platform runs on financial measures. First digit extracts via
    BIGINT→string (never ``log10``, whose last-ulp rounding differs
    across libm builds); per-digit observed share and deviation from
    the Benford expectation close as single IEEE divisions from
    exact BIGINT counts, and the expected shares are shared literal
    constants — so the driver hash-compares bit-for-bit. Output is
    the 9-row per-digit table (no cross-row chi-square scalar: a
    9-term double sum would be aggregation-order-dependent)."""
    o = read(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.expr(
            "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) "
            "AS STRING), 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    from dish_data_pipeline_spark.cache_registry import tracked_persist

    # persisted: the 9-row counts feed BOTH the 1-row total and the
    # final projection — without it the orders scan runs twice
    counts = tracked_persist(
        d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr(_BENFORD_CASE_D).alias("expected_share"),
            (F.col("n").cast("double") / F.col("tot").cast("double")).alias(
                "observed_share"
            ),
            (
                F.col("n").cast("double") / F.col("tot").cast("double")
                - F.expr(_BENFORD_CASE_D)
            ).alias("deviation"),
        )
    )


SQL_BENFORD_PRICES = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
SELECT digit, n,
       {_BENFORD_CASE_D} AS expected_share,
       CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS observed_share,
       CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
         - {_BENFORD_CASE_D} AS deviation
FROM c, t
"""


# --- ML preprocessing: group-mean imputation -----------------------
def q_impute_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL imputation with the per-group mean — the standard
    feature-cleanup step before training. The fill value is the
    deterministic ``davg`` (exact decimal sum ÷ count, one IEEE
    division); output is the imputed rows only (bounded by the
    missing count), with the group and fill recorded for audit.
    Groups with NO observed values impute nothing (no mean exists) —
    the IS NOT NULL gate drops them identically on both sides.
    The testdata carries no NULLs, so missingness is PLANTED with a
    deterministic mask (``event_id % 23 = 0``) — masked rows are
    treated as unobserved, the means come from the observed
    complement only (as real imputation must), and the masked rows
    come back filled."""
    e = read(spark, sf_dir, "events")
    masked = F.col("event_id") % 23 == 0
    means = (
        e.filter(~masked)
        .groupBy("event_type")
        .agg(davg(F.col("value")).alias("fill_value"))
    )
    return (
        e.filter(masked & F.col("value").isNotNull())
        .join(F.broadcast(means), "event_type", "left")
        .filter(F.col("fill_value").isNotNull())
        .select("event_id", "event_type", "fill_value")
    )


SQL_IMPUTE_VALUES = f"""
WITH m AS (
  SELECT event_type, {sql_davg('value')} AS fill_value
  FROM events WHERE event_id % 23 <> 0 GROUP BY event_type)
SELECT event_id, e.event_type, fill_value
FROM events e LEFT JOIN m ON e.event_type = m.event_type
WHERE e.event_id % 23 = 0 AND e.value IS NOT NULL
  AND fill_value IS NOT NULL
"""


# --- ML preprocessing: min-max feature scaling ----------------------
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type min-max scaling of ``value`` to [0, 1] — the
    broadcast-the-extremes normalization pass (one tiny agg + one
    map-side join, no window over the full table). min/max are exact
    order statistics; the scale expression is the same two-operand
    IEEE arithmetic on both engines, so no quantization device is
    needed. Degenerate groups (min = max) scale to NULL (0/0 →
    guarded explicitly; Spark's non-ANSI x/0 and DuckDB's disagree).
    Output sampled by event_id to keep the relation driver-sized."""
    e = read(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("event_id") % 17 == 0)
    )
    ext = (
        read(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    return e.join(F.broadcast(ext), "event_type").select(
        "event_id",
        "event_type",
        F.when(
            F.col("hi") > F.col("lo"),
            (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")),
        ).alias("scaled"),
    )


SQL_MINMAX_SCALE = """
WITH ext AS (
  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
  FROM events WHERE value IS NOT NULL GROUP BY event_type)
SELECT event_id, e.event_type,
       CASE WHEN hi > lo THEN (value - lo) / (hi - lo) END AS scaled
FROM events e JOIN ext ON e.event_type = ext.event_type
WHERE e.value IS NOT NULL AND e.event_id % 17 = 0
"""


# --- Islands: longest consecutive-day activity streak ---------------
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic gaps-and-islands problem: each user's LONGEST run
    of consecutive active days. Distinct active days → the
    ``day_number − dense-row-number`` island key (constant within a
    consecutive run, integer-exact) → per-island lengths → per-user
    max with the earliest streak start as tiebreak evidence. Two
    keyed shuffles, no self-join. Users with ≥ 2-day streaks only
    (keeps the relation informative and the result bounded)."""
    e = read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    days = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "island",
        F.datediff(F.col("day"), F.lit("1970-01-01"))
        - F.row_number().over(w),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("streak_start"),
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w2))
        .filter((F.col("rn") == 1) & (F.col("len") >= 2))
        .select(
            "user_id",
            F.col("len").alias("longest_streak"),
            "streak_start",
        )
    )


SQL_ACTIVITY_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL),
isl AS (
  SELECT user_id, day,
         DATEDIFF('day', DATE '1970-01-01', day)
         - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM days),
streaks AS (
  SELECT user_id, island,
         CAST(COUNT(*) AS BIGINT) AS len,
         MIN(day) AS streak_start
  FROM isl GROUP BY user_id, island),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY len DESC, streak_start ASC) AS rn
  FROM streaks)
SELECT user_id, len AS longest_streak, streak_start
FROM best WHERE rn = 1 AND len >= 2
"""


# --- Distributed exact median (selection without sorting) ----------
def q_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type lower median via
    :func:`ops.selection.exact_quantile` — iterative histogram
    narrowing (3-4 scan-and-aggregate rounds, |groups|×128 driver
    state, no global sort, no single-partition window). The answer
    is the exact k-th smallest DATA VALUE (k = ceil(n/2)), so the
    oracle's brute-force sorted-rank spelling must agree bit-for-bit
    no matter how the narrowing path went."""
    from dish_data_pipeline_spark.ops.selection import exact_quantile

    e = read(spark, sf_dir, "events")
    return exact_quantile(e, "value", 0.5, ["event_type"])


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per returnflag — the
    weighted tier of :func:`ops.selection.exact_quantile`: the
    narrowing histograms accumulate exact BIGINT weight sums, the
    target is the smallest value whose cumulative weight reaches
    ``ceil(W/2)``, and the answer is an exact data value. The oracle
    is the direct cumulative-weight window walk (first value whose
    running weight reaches the target — order among equal values
    cannot change which VALUE qualifies)."""
    from dish_data_pipeline_spark.ops.selection import exact_quantile

    li = read(spark, sf_dir, "lineitem")
    return exact_quantile(
        li, "l_extendedprice", 0.5, ["l_returnflag"],
        weight_col="l_quantity",
    )


SQL_WEIGHTED_MEDIAN = """
WITH v AS (
  SELECT l_returnflag, l_extendedprice AS val,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
    AND l_quantity IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0),
t AS (
  SELECT l_returnflag, val,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY val
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM v)
SELECT l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(tw) AS BIGINT) AS w,
       MIN(val) AS q
FROM t
WHERE cum >= GREATEST(1, CAST(CEIL(0.5 * tw) AS BIGINT))
GROUP BY l_returnflag
"""


SQL_EXACT_MEDIAN = """
WITH v AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL AND NOT isnan(value))
SELECT event_type, CAST(n AS BIGINT) AS n, value AS q
FROM v
WHERE rn = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))
"""


# --- Funnel conversion --------------------------------------------
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel over the event stream: users who signed
    up, then clicked AFTER the signup, then purchased AFTER that
    click — each stage anchored to the previous stage's first
    qualifying time (not mere co-occurrence). Expressed through the
    reusable N-step :func:`ops.timeseries.funnel_counts` operator —
    the chained-window single-pass plan (1 scan + 2 exchanges,
    independent of step count; the first cut of this query joined
    per-stage aggregates back onto events: 8 shuffles and 5 scans)."""
    from dish_data_pipeline_spark.ops.timeseries import funnel_counts

    e = read(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel_counts(
        e,
        "user_id",
        "ts",
        [
            ("signup", F.col("event_type") == "signup"),
            ("click_after", F.col("event_type") == "click"),
            ("purchase_after", F.col("event_type") == "purchase"),
        ],
    )


SQL_FUNNEL_CONVERSION = """
WITH s1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id) AS s_ts
  FROM events),
s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > s_ts THEN ts END)
              OVER (PARTITION BY user_id) AS c_ts
  FROM s1),
s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
              OVER (PARTITION BY user_id) AS p_ts
  FROM s2),
per_user AS (
  SELECT user_id, MAX(s_ts) AS s_ts, MAX(c_ts) AS c_ts, MAX(p_ts) AS p_ts
  FROM s3 GROUP BY user_id)
SELECT CAST(COUNT(s_ts) AS BIGINT) AS n_signup,
       CAST(COUNT(c_ts) AS BIGINT) AS n_click_after,
       CAST(COUNT(p_ts) AS BIGINT) AS n_purchase_after
FROM per_user
"""


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-stage funnel (signup → view → click → purchase) through
    the same parameterized :func:`ops.timeseries.funnel_counts`
    operator — the step list is data, not code, and the plan stays
    1 scan + 2 exchanges at any depth (the four conditional window
    minima stack on one user_id partitioning)."""
    from dish_data_pipeline_spark.ops.timeseries import funnel_counts

    e = read(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel_counts(
        e,
        "user_id",
        "ts",
        [
            ("signup", F.col("event_type") == "signup"),
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
    )


SQL_FUNNEL_STEPS = """
WITH s1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events),
s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM s1),
s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM s2),
s4 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
              OVER (PARTITION BY user_id) AS t4
  FROM s3),
per_user AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3, MAX(t4) AS t4
  FROM s4 GROUP BY user_id)
SELECT CAST(COUNT(t1) AS BIGINT) AS n_signup,
       CAST(COUNT(t2) AS BIGINT) AS n_view,
       CAST(COUNT(t3) AS BIGINT) AS n_click,
       CAST(COUNT(t4) AS BIGINT) AS n_purchase
FROM per_user
"""


# --- Cohort retention ---------------------------------------------
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen
    week, counted as active in each later week. Cohorts come from a
    per-user min aggregate joined back onto the distinct
    (user, week) activity relation; weeks are integer epoch-day
    division (floor-exact in both engines — no calendar/interval
    arithmetic to drift). Two shuffles (per-user min, distinct
    activity; the join reuses the user hash) — the matrix itself is
    weeks²-bounded."""
    e = read(spark, sf_dir, "events")
    week = F.expr("(unix_timestamp(ts) div 86400) div 7").cast("bigint")
    activity = e.select("user_id", week.alias("w")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("w").alias("w0"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.col("w0").alias("cohort_week"),
            (F.col("w") - F.col("w0")).alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH activity AS (
  SELECT DISTINCT user_id,
         (CAST(floor(epoch(ts)) AS BIGINT) // 86400) // 7 AS w
  FROM events),
cohort AS (SELECT user_id, MIN(w) AS w0 FROM activity GROUP BY user_id)
SELECT c.w0 AS cohort_week, a.w - c.w0 AS weeks_since,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


# --- Time-series resample + gap fill ------------------------------
def q_gap_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style downsample + regularize: hourly mean value
    per event type, each type's grid completed between its first and
    last hour, holes forward-filled and flagged. Resample is one
    partial-combined groupBy; the grid explode is map-side from the
    tiny per-key span relation; grid join and fill window share the
    event_type hash — the raw events are read exactly once."""
    from dish_data_pipeline_spark.ops.timeseries import gap_fill, resample

    e = read(spark, sf_dir, "events")
    r = resample(e, "ts", "event_type", "value", GAP_STEP_SEC)
    return gap_fill(r, "event_type", GAP_STEP_SEC)


SQL_GAP_FILL_EVENTS = f"""
WITH b AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {GAP_STEP_SEC}) * {GAP_STEP_SEC}
           AS bucket,
         {sql_davg('value')} AS avg_value
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM b GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(mn, mx, {GAP_STEP_SEC})) AS bucket
  FROM spans),
j AS (
  SELECT g.event_type, g.bucket, b.avg_value
  FROM grid g LEFT JOIN b ON b.event_type = g.event_type
                         AND b.bucket = g.bucket)
SELECT event_type, bucket,
       LAST_VALUE(avg_value IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY bucket
               ROWS UNBOUNDED PRECEDING) AS value,
       avg_value IS NULL AS is_filled
FROM j
"""


# --- Interval overlap: peak concurrency (sweep line) --------------
def q_concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneously-open event intervals per type.

    Each event opens a half-open interval ``[ts, ts + 60 +
    event_id % 3600 seconds)`` (a deterministic synthetic duration —
    the table carries no end timestamp). Distributed sweep line via
    :func:`ops.interval.max_concurrency`: two-phase range-partitioned
    prefix SUM, no single-partition window even though there are only
    a handful of event types."""
    from dish_data_pipeline_spark.ops.interval import max_concurrency

    e = read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    iv = e.select(
        "event_type",
        F.col("ts").alias("start_ts"),
        F.expr(
            "timestampadd(SECOND, CAST(60 + event_id % 3600 AS BIGINT), ts)"
        ).alias("end_ts"),
    )
    return max_concurrency(iv, "start_ts", "end_ts", ["event_type"])


SQL_CONCURRENT_EVENTS = """
WITH iv AS (
  SELECT event_type, ts AS s,
         ts + (60 + event_id % 3600) * INTERVAL 1 SECOND AS e
  FROM events WHERE ts IS NOT NULL),
deltas AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv),
run AS (
  SELECT event_type,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS r
  FROM deltas)
SELECT event_type,
       CAST(COUNT(*) // 2 AS BIGINT) AS n_intervals,
       CAST(MAX(r) AS BIGINT) AS max_concurrent
FROM run GROUP BY event_type
"""


# --- Point-in-interval join: instantaneous concurrency -------------
def q_open_intervals_at_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instantaneous concurrency at probe times: for each sampled
    event, how many OTHER same-type intervals (the same synthetic
    ``[ts, ts + 60 + event_id % 3600 s)`` device as
    ``concurrent_events``) are open at its timestamp. Runs through
    :func:`ops.interval.interval_join` — the grid-banded EQUI-join
    spelling of a range join (≤ 2-cell replication, one shuffle per
    side, exact predicate re-checked on candidates) where the naive
    spelling would plan a BroadcastNestedLoopJoin. Inner-join
    semantics: probes with zero open co-intervals don't appear (the
    oracle joins the same way)."""
    from dish_data_pipeline_spark.ops.interval import interval_join

    e = read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    iv = e.select(
        "event_type",
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("iv_start"),
        F.expr(
            "timestampadd(SECOND, CAST(60 + event_id % 3600 AS BIGINT), ts)"
        ).alias("iv_end"),
    )
    probes = e.filter(F.col("event_id") % 13 == 0).select(
        "event_type", "event_id", "ts"
    )
    pairs = interval_join(
        probes, iv, "ts", "iv_start", "iv_end", ["event_type"],
        grid_seconds=3660,
    )
    return (
        pairs.filter(F.col("iv_id") != F.col("event_id"))
        .groupBy("event_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_open"))
    )


SQL_OPEN_INTERVALS_AT_EVENT = """
WITH iv AS (
  SELECT event_type, event_id AS iv_id, ts AS s,
         ts + (60 + event_id % 3600) * INTERVAL 1 SECOND AS e
  FROM events WHERE ts IS NOT NULL),
p AS (
  SELECT event_type, event_id, ts FROM events
  WHERE ts IS NOT NULL AND event_id % 13 = 0)
SELECT p.event_id, p.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_open
FROM p JOIN iv
  ON p.event_type = iv.event_type
 AND iv.s <= p.ts AND p.ts < iv.e
 AND iv.iv_id <> p.event_id
GROUP BY p.event_id, p.event_type
"""


# --- Markov transition counts over per-user event sequences -------
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix of per-user event sequences:
    ``(prev_type, next_type, n, p_next)`` where ``p_next`` is the
    row-normalized transition probability. ``p_next`` is one BIGINT ÷
    BIGINT IEEE division (deterministic, no quantization device
    needed). NULL-``ts`` rows are excluded — Spark windows sort nulls
    first, DuckDB windows sort them last, so they'd sequence
    differently."""
    e = read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = t.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("prev_type")
    return counts.withColumn(
        "p_next",
        F.col("n").cast("double") / F.sum("n").over(wt).cast("double"),
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events WHERE ts IS NOT NULL),
c AS (
  SELECT prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE) /
       CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p_next
FROM c
"""


# --- Integer-exact correlation / regression per group -------------
def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Pearson correlation + OLS slope/intercept of
    FLOOR(extendedprice) on quantity. Built-in ``corr()`` /
    ``regr_slope()`` accumulate doubles and are nondeterministic
    across partitionings; and even exact DECIMAL(38,6) moment sums
    fail the oracle hash — the y² sum (~7e13 with 4 decimal digits)
    exceeds double's 53-bit mantissa, and Spark and DuckDB round the
    decimal→double cast differently (measured 1-ulp splits). So both
    sides floor-quantize y to integer dollars (floor has no rounding
    ties): all five moment sums are then exact BIGINTs, each
    int64→double cast in the closing formula is a single correctly-
    rounded conversion on both engines, and the formula itself is
    the same IEEE expression. Safe domain: |y|≤1e6 and ~1e9 rows per
    group keep Σy² below int64 max."""
    li = read(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.floor(F.col("l_extendedprice")).cast("bigint")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nd = d("n")
    cov_n = nd * d("sxy") - d("sx") * d("sy")
    varx_n = nd * d("sxx") - d("sx") * d("sx")
    vary_n = nd * d("syy") - d("sy") * d("sy")
    slope = cov_n / varx_n
    return agg.select(
        "l_returnflag",
        "n",
        (d("sx") / nd).alias("mean_qty"),
        (d("sy") / nd).alias("mean_price_floor"),
        slope.alias("slope"),
        ((d("sy") - slope * d("sx")) / nd).alias("intercept"),
        (cov_n / F.sqrt(varx_n * vary_n)).alias("pearson_r"),
    )


SQL_STATS_CORR = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(l_quantity AS BIGINT) *
                  CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT) *
                  CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
         CAST(SUM(CAST(l_quantity AS BIGINT) *
                  CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_price_floor,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (CAST(sy AS DOUBLE) -
        ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
            (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS pearson_r
FROM m
"""


# --- Top session paths (clickstream prefix mining) ----------------
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common session-opening paths: sessionize per user
    (30-min gap, same device as ``q_sessionize``), take each
    session's first three event types in (sec, event_id) order,
    join as ``a>b>c``, and count sessions per path — the prefix-path
    report that feeds funnel design. Top 20 with a (count DESC,
    path ASC) deterministic tiebreak. NULL event types are
    sentinel-coalesced — both engines' join/array_to_string silently
    skip NULL elements, which would alias distinct paths."""
    e = read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    b = e.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.coalesce("event_type", F.lit("∅")).alias("etype"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    lag_sec = F.lag("sec").over(w)
    flagged = b.withColumn(
        "flag",
        F.when(
            lag_sec.isNull() | (F.col("sec") - lag_sec > 1800), 1
        ).otherwise(0),
    )
    seq = flagged.withColumn(
        "seq",
        F.sum("flag").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sessions = seq.groupBy("user_id", "seq").agg(
        F.sort_array(
            F.collect_list(F.struct("sec", "event_id", "etype"))
        ).alias("evs")
    )
    paths = sessions.select(
        F.array_join(
            F.expr("transform(slice(evs, 1, 3), x -> x.etype)"), ">"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


SQL_SESSION_PATHS = """
WITH b AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         coalesce(event_type, '∅') AS etype
  FROM events WHERE ts IS NOT NULL),
f AS (
  SELECT *, CASE WHEN LAG(sec) OVER w IS NULL
                   OR sec - LAG(sec) OVER w > 1800
                 THEN 1 ELSE 0 END AS flag
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
s AS (
  SELECT *, SUM(flag) OVER (PARTITION BY user_id ORDER BY sec, event_id
                            ROWS UNBOUNDED PRECEDING) AS seq
  FROM f),
g AS (
  SELECT user_id, seq,
         list(etype ORDER BY sec, event_id) AS types
  FROM s GROUP BY user_id, seq)
SELECT array_to_string(types[1:3], '>') AS path,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM g GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""


ANALYTICS_QUERIES: dict[str, QueryDef] = {
    "session_paths": QueryDef(
        q_session_paths, SQL_SESSION_PATHS,
        "top session-opening event-type paths (sessionize → 3-prefix "
        "→ count, deterministic top-20)",
        ("window", "session", "topk")),
    "concurrent_events": QueryDef(
        q_concurrent_events, SQL_CONCURRENT_EVENTS,
        "peak concurrent intervals per type — distributed sweep line "
        "(two-phase range-partitioned prefix sum)",
        ("window", "timeseries", "interval")),
    "open_intervals_at_event": QueryDef(
        q_open_intervals_at_event, SQL_OPEN_INTERVALS_AT_EVENT,
        "point-in-interval join via grid banding (instantaneous "
        "concurrency at probe times, no BroadcastNestedLoop)",
        ("join", "interval", "window")),
    "event_transitions": QueryDef(
        q_event_transitions, SQL_EVENT_TRANSITIONS,
        "first-order Markov transition counts + probabilities over "
        "per-user event sequences",
        ("window", "agg")),
    "stats_corr": QueryDef(
        q_stats_corr, SQL_STATS_CORR,
        "per-group Pearson r + OLS slope/intercept from exact decimal "
        "moment sums",
        ("agg", "stats")),
    "gap_fill_events": QueryDef(
        q_gap_fill_events, SQL_GAP_FILL_EVENTS,
        "hourly resample + grid completion + forward fill per event type",
        ("window", "timeseries")),
    "debounce_events": QueryDef(
        q_debounce_events, SQL_DEBOUNCE_EVENTS,
        "per-key burst collapse (10-min chain gap, first event kept)",
        ("window", "timeseries", "dedup")),
    "ewma_events": QueryDef(
        q_ewma_events, SQL_EWMA_EVENTS,
        "oracle-exact truncated EWMA (integer 2^i fold) per event type",
        ("timeseries", "window")),
    "anomaly_events": QueryDef(
        q_anomaly_events, SQL_ANOMALY_EVENTS,
        "resample → gap fill → trailing z-score anomaly flags",
        ("window", "timeseries", "quality")),
    "stream_zscore_replay": QueryDef(
        q_stream_zscore_replay, SQL_ANOMALY_EVENTS,
        "stateful streaming z-score (applyInPandasWithState, 2 "
        "micro-batches) vs the batch oracle",
        ("streaming", "timeseries", "quality")),
    "robust_anomaly_events": QueryDef(
        q_robust_anomaly_events, _sql_robust_anomaly(),
        "median/MAD robust anomaly gate (order statistics, no "
        "quantization device needed)",
        ("window", "timeseries", "quality")),
    "stream_funnel_replay": QueryDef(
        q_stream_funnel_replay, _sql_stream_funnel_replay(),
        "stateful streaming funnel (per-user stage state machine, "
        "2 micro-batches) vs chained-MIN oracle",
        ("streaming", "timeseries")),
    "stream_debounce_replay": QueryDef(
        q_stream_debounce_replay, SQL_STREAM_DEBOUNCE_REPLAY,
        "stateful streaming debounce (kept-anchored, 2 micro-"
        "batches) vs recursive next-kept-event oracle",
        ("streaming", "timeseries")),
    "stream_window_replay": QueryDef(
        q_stream_window_replay, SQL_STREAM_WINDOW_REPLAY,
        "streaming tumbling-window counts (append mode, watermark-"
        "flushed via sentinel batches) vs batch date_trunc oracle",
        ("streaming", "window", "agg")),
    "stream_join_replay": QueryDef(
        q_stream_join_replay, SQL_STREAM_JOIN_REPLAY,
        "watermarked stream-stream interval join (cross-batch state "
        "matches) vs batch interval-join oracle",
        ("streaming", "join")),
    "stream_sessionize_replay": QueryDef(
        q_stream_sessionize_replay, SQL_STREAM_SESSIONIZE_REPLAY,
        "streaming session_window sessions (append mode, watermark-"
        "flushed via sentinel batches) vs batch gap-chain oracle",
        ("streaming", "session", "window")),
    "video_frames": QueryDef(
        q_video_frames, SQL_VIDEO_FRAMES,
        "video tier: indexed VID0 container pack + selective every-"
        "3rd-frame PNG decode vs direct frame-arithmetic oracle",
        ("multimodal", "udf")),
    "stream_dedup_replay": QueryDef(
        q_stream_dedup_replay, SQL_STREAM_DEDUP_REPLAY,
        "dropDuplicatesWithinWatermark streaming dedup (planted "
        "3-day retries, cross-batch state) vs distinct-originals "
        "oracle",
        ("streaming", "dedup")),
    "stream_sink_exactly_once": QueryDef(
        q_stream_sink_exactly_once, SQL_STREAM_SINK_EXACTLY_ONCE,
        "exactly-once foreachBatch lakehouse sink: txn-marker "
        "appends, full fresh-checkpoint replay commits nothing",
        ("streaming", "lakehouse", "io")),
    "stream_upsert_replay": QueryDef(
        q_stream_upsert_replay, SQL_STREAM_UPSERT_REPLAY,
        "exactly-once streaming MERGE into the lakehouse tier: "
        "late corrections upserted, fresh-checkpoint replay inert",
        ("streaming", "lakehouse", "io")),
    "stream_merge_sql_replay": QueryDef(
        q_stream_merge_sql_replay, SQL_STREAM_MERGE_SQL_REPLAY,
        "textual ga_sessions MERGE statement as an exactly-once "
        "foreachBatch sink: 3 micro-batches, replay commits nothing",
        ("streaming", "lakehouse", "sql")),
    "mondrian_anonymity": QueryDef(
        q_mondrian_anonymity, _sql_mondrian_anonymity(),
        "Mondrian k-anonymity: 3 round-robin nearest-rank median "
        "cuts -> 8 generalized cells, unrolled-CTE oracle",
        ("privacy",)),
    "k_anonymity": QueryDef(
        q_k_anonymity, SQL_K_ANONYMITY,
        "k-anonymity suppression (k=8) + l-diversity report over "
        "generalized customer quasi-identifiers",
        ("privacy",)),
    "ab_test_welch": QueryDef(
        q_ab_test_welch, SQL_AB_TEST_WELCH,
        "Welch's t-test per event type between user-parity arms, "
        "exact integer moments, bit-identical closing IEEE math",
        ("stats",)),
    "ab_cuped": QueryDef(
        q_ab_cuped, SQL_AB_CUPED,
        "CUPED variance-reduced A/B means: pooled theta from exact "
        "integer moments, per-arm adjusted post-period spend",
        ("stats",)),
    "benford_prices": QueryDef(
        q_benford_prices, SQL_BENFORD_PRICES,
        "Benford first-digit audit: string-extracted digits, exact "
        "counts, per-digit deviation from literal expected shares",
        ("stats", "quality")),
    "exact_median": QueryDef(
        q_exact_median, SQL_EXACT_MEDIAN,
        "distributed EXACT median (iterative histogram narrowing, no "
        "global sort) vs brute-force sorted-rank oracle",
        ("agg", "stats", "selection")),
    "position_attribution": QueryDef(
        q_position_attribution, SQL_POSITION_ATTRIBUTION,
        "linear multi-touch attribution: exact integer-cents even "
        "split over 7-day grid-banded touch windows, remainder to "
        "most recent",
        ("join", "interval", "agg")),
    "last_touch_attribution": QueryDef(
        q_last_touch_attribution, SQL_LAST_TOUCH_ATTRIBUTION,
        "last-touch revenue attribution (as-of backward join, 7-day "
        "lookback, deduped touches)",
        ("join", "asof", "agg")),
    "ohlc_bars": QueryDef(
        q_ohlc_bars, SQL_OHLC_BARS,
        "daily OHLC candles per type (tie-broken argmin/argmax open/"
        "close in one window pass)",
        ("window", "timeseries", "agg")),
    "abc_parts": QueryDef(
        q_abc_parts, SQL_ABC_PARTS,
        "Pareto/ABC classification at exact integer-cents 80/95% "
        "cumulative thresholds",
        ("window", "agg", "stats")),
    "weighted_median": QueryDef(
        q_weighted_median, SQL_WEIGHTED_MEDIAN,
        "quantity-weighted EXACT median price (weighted histogram "
        "narrowing) vs cumulative-weight window oracle",
        ("agg", "stats", "selection")),
    "impute_values": QueryDef(
        q_impute_values, SQL_IMPUTE_VALUES,
        "NULL imputation with the deterministic per-group mean "
        "(broadcast fill, imputed rows only)",
        ("quality", "ml", "join")),
    "minmax_scale": QueryDef(
        q_minmax_scale, SQL_MINMAX_SCALE,
        "per-group min-max feature scaling (broadcast extremes, "
        "degenerate groups → NULL)",
        ("ml", "join")),
    "activity_streaks": QueryDef(
        q_activity_streaks, SQL_ACTIVITY_STREAKS,
        "gaps-and-islands: longest consecutive-day streak per user "
        "(day − row_number island key)",
        ("window", "agg")),
    "image_png_features": QueryDef(
        q_image_png_features, SQL_IMAGE_PNG_FEATURES,
        "image tier end-to-end through a REAL PNG codec: pack "
        "(all 5 scanline filters) → pure-Python decode → exact pixel "
        "statistics vs direct SQL on the quantized series",
        ("multimodal", "binary")),
    "audio_features": QueryDef(
        q_audio_features, SQL_AUDIO_FEATURES,
        "audio tier end-to-end: pack PCM WAV blobs, pure-Python "
        "decode, exact signal features",
        ("multimodal", "binary")),
    "key_skew_profile": QueryDef(
        q_key_skew_profile, SQL_KEY_SKEW_PROFILE,
        "join-key skew diagnostic: heaviest keys + ratio to mean load",
        ("agg", "topk", "diagnostic")),
    "funnel_steps": QueryDef(
        q_funnel_steps, SQL_FUNNEL_STEPS,
        "parameterized 4-stage funnel (signup → view → click → purchase)",
        ("window", "agg")),
    "funnel_conversion": QueryDef(
        q_funnel_conversion, SQL_FUNNEL_CONVERSION,
        "ordered-step funnel (signup → click → purchase, time-anchored)",
        ("agg", "join", "timeseries")),
    "cohort_retention": QueryDef(
        q_cohort_retention, SQL_COHORT_RETENTION,
        "weekly cohort retention matrix (first-seen week × activity)",
        ("agg", "join", "timeseries")),
    "large_orders": QueryDef(
        q_large_orders, SQL_LARGE_ORDERS,
        "TPC-H Q18-shape IN-subquery with HAVING", ("join", "agg")),
    "max_order_per_customer": QueryDef(
        q_max_order_per_customer, SQL_MAX_ORDER_PER_CUSTOMER,
        "correlated scalar subquery via window max", ("window", "join")),
    "rank_suite": QueryDef(
        q_rank_suite, SQL_RANK_SUITE,
        "row_number/rank/dense_rank/ntile/lead/first_value", ("window",)),
    "sql_interface": QueryDef(
        q_sql_interface, SQL_INTERFACE_TEXT,
        "identical SQL text on Spark and DuckDB (dialect-portable)",
        ("sql",)),
    "profile_events": QueryDef(
        q_profile_events, SQL_PROFILE_EVENTS,
        "per-column profiling in one aggregation pass", ("quality", "agg")),
    "sessionize": QueryDef(
        q_sessionize, SQL_SESSIONIZE,
        "gap-based batch sessionization (lag + cumsum)", ("window", "session")),
    "rolling_window": QueryDef(
        q_rolling_window, SQL_ROLLING_WINDOW,
        "7-day RANGE-frame rolling sum/count per user over event time",
        ("window", "timeseries")),
    "volume_shipping": QueryDef(
        q_volume_shipping, SQL_VOLUME_SHIPPING,
        "TPC-H Q7 shape: bilateral nation trade by ship year",
        ("join", "agg")),
    "market_share": QueryDef(
        q_market_share, SQL_MARKET_SHARE,
        "TPC-H Q8 shape: national market share ratio per year",
        ("join", "agg")),
    "product_profit": QueryDef(
        q_product_profit, SQL_PRODUCT_PROFIT,
        "TPC-H Q9 shape: product-line profit by nation and year",
        ("join", "agg")),
}
