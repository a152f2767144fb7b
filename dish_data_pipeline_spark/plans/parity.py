"""Reference-parity query suite: one named query per operator family
in SURVEY.md §2, expressed over the driver testdata tables.

Mapping (FIXTURES.md §B): ``events`` stands in for ``ga_sessions``
(keep-latest window dedup), ``orders``/``lineitem`` exercise the
upsert/join/cast surface, multi-way joins + aggregations cover the
oracle-checked OLAP surface the engine must sustain at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dish_data_pipeline_spark.operators.dedup import dedup_first_wins, keep_latest
from dish_data_pipeline_spark.operators.flatten import flatten_struct_columns
from dish_data_pipeline_spark.operators.upsert import upsert, upsert_keep_latest
from dish_data_pipeline_spark.plans.common import (
    DEC,
    QueryDef,
    davg,
    dsum,
    read,
    sql_davg,
    sql_dsum,
)

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


# --- W1/D3: keep-latest window dedup (flagship; reference
# pipeline/data_pipeline.py:181-187) -------------------------------
def q_keep_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    latest = keep_latest(e, ["user_id", "event_type"], "ts", tiebreakers=["event_id"])
    return latest.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_latest"),
        davg(F.col("value")).alias("avg_value"),
    )


SQL_KEEP_LATEST_EVENTS = f"""
WITH latest AS (
  SELECT * FROM (
    SELECT e.*, ROW_NUMBER() OVER (
      PARTITION BY user_id, event_type
      ORDER BY ts DESC, event_id DESC) AS rn
    FROM events e) t
  WHERE rn = 1)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_latest,
       {sql_davg('value')} AS avg_value
FROM latest GROUP BY event_type
"""


# --- D1: deterministic first-wins dedup ---------------------------
def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    first = dedup_first_wins(e, ["user_id", "event_type"], ["ts", "event_id"])
    return first.select("user_id", "event_type", "event_id", "value")


SQL_DEDUP_FIRST_WINS = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT e.*, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type
    ORDER BY ts ASC, event_id ASC) AS rn
  FROM events e) t
WHERE rn = 1
"""


# --- A2/Q4: duplicate-key counting --------------------------------
def q_dup_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("user_id"))).alias("dup_rows"),
    )


SQL_DUP_KEY_COUNTS = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) - COUNT(DISTINCT user_id) AS BIGINT) AS dup_rows
FROM events GROUP BY event_type
"""


# --- Q1-Q5: DQ metrics as a one-row summary (SURVEY.md §2.12) -----
def q_dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user_id"),
        F.sum(F.col("event_type").isNull().cast("long")).alias("null_event_type"),
        (
            F.count(F.lit(1))
            - F.count_distinct(F.struct(F.col("user_id"), F.col("event_type")))
        ).alias("dup_rows"),
        (F.count(F.lit(1)) < F.lit(5)).alias("low_volume"),
    )


SQL_DQ_SUMMARY = """
SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
       CAST(COUNT(*) - COUNT(DISTINCT (user_id, event_type)) AS BIGINT) AS dup_rows,
       COUNT(*) < 5 AS low_volume
FROM events
"""


# --- F1: recursive struct flatten (3 levels) ----------------------
def q_flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    nested = e.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("id"),
            F.struct(
                F.col("event_type").alias("type"), F.col("value").alias("v")
            ).alias("info"),
        ).alias("user"),
    )
    return flatten_struct_columns(nested)


SQL_FLATTEN_STRUCT = """
SELECT event_id,
       user_id   AS user_id,
       event_type AS user_info_type,
       value      AS user_info_v
FROM events
"""


# --- P3/X1: complex→JSON sanitize ---------------------------------
def q_sanitize_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    complexed = e.select(
        "event_id",
        F.array(F.col("user_id"), F.col("event_id")).alias("ids"),
        F.struct(F.col("event_type").alias("t"), F.col("user_id").alias("u")).alias(
            "meta"
        ),
    )
    from dish_data_pipeline_spark.operators.flatten import sanitize_complex_columns

    return sanitize_complex_columns(complexed)


SQL_SANITIZE_JSON = """
SELECT event_id,
       '[' || user_id || ',' || event_id || ']' AS ids,
       '{"t":"' || event_type || '","u":' || user_id || '}' AS meta
FROM events
"""


# --- X3-X8: scalar cast/format functions --------------------------
def q_scalar_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("date_str"),  # X3
        F.to_date(F.col("o_orderdate")).alias("odate"),  # X4/X7
        F.col("o_orderkey").cast("string").alias("key_str"),  # X5/X8
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_floor"),
        # X4 invalid→null coercion: odd keys carry an unparseable
        # string, so the output mixes real dates and nulls.
        F.to_date(
            F.when(
                F.col("o_orderkey") % 2 == 0,
                F.date_format(F.col("o_orderdate"), "yyyy-MM-dd"),
            ).otherwise(F.lit("not-a-date"))
        ).alias("bad_date"),
    )


SQL_SCALAR_CASTS = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS date_str,
       CAST(o_orderdate AS DATE) AS odate,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                     THEN strftime(o_orderdate, '%Y-%m-%d')
                     ELSE 'not-a-date' END AS DATE) AS bad_date
FROM orders
"""


# --- J1: MERGE upsert (update + insert branches) ------------------
def q_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    inserts = o.filter(F.col("o_orderkey") % 17 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    staging = updates.unionByName(inserts)
    return upsert(o, staging, ["o_orderkey"])


SQL_UPSERT_ORDERS = """
WITH stg AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 17 = 0)
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
       o.o_orderdate, o.o_orderpriority
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM stg s WHERE s.o_orderkey = o.o_orderkey)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority FROM stg
"""


# --- J2: keep-latest dedup + upsert (reference ga_sessions MERGE) -
def q_upsert_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    target = keep_latest(
        e.filter(F.col("event_id") % 2 == 0),
        ["user_id", "event_type"],
        "ts",
        tiebreakers=["event_id"],
    )
    staging = e.filter(F.col("event_id") % 3 == 0)
    return upsert_keep_latest(
        target, staging, ["user_id", "event_type"], "ts", tiebreakers=["event_id"]
    )


SQL_UPSERT_KEEP_LATEST = """
WITH tgt AS (
  SELECT event_id, ts, user_id, event_type, value, props FROM (
    SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
    FROM events e WHERE event_id % 2 = 0) t WHERE rn = 1),
stg AS (
  SELECT event_id, ts, user_id, event_type, value, props FROM (
    SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
    FROM events e WHERE event_id % 3 = 0) t WHERE rn = 1)
SELECT t.event_id, t.ts, t.user_id, t.event_type, t.value, t.props
FROM tgt t
WHERE NOT EXISTS (SELECT 1 FROM stg s
                  WHERE s.user_id = t.user_id AND s.event_type = t.event_type)
UNION ALL
SELECT event_id, ts, user_id, event_type, value, props FROM stg
"""


# --- Textual MERGE INTO surface (merge_sql.py, round-12 gap) ------
# The reference's query surface IS a SQL MERGE string; these two
# queries push the reference's two literal statement SHAPES through
# the parser+executor instead of the operator API, so the textual
# surface itself is driver-certified against DuckDB.
MERGE_SQL_SESSIONS = """
    MERGE `proj.dishdata.tgt_events` T
    USING (
        SELECT * EXCEPT(row_num) FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC
            ) AS row_num
            FROM `proj.dishdata.staging_events`
        )
        WHERE row_num = 1
    ) S
    ON T.user_id = S.user_id AND T.event_type = S.event_type
    WHEN MATCHED THEN
      UPDATE SET
        T.event_id = S.event_id,
        T.ts = S.ts,
        T.value = S.value,
        T.id_str = CAST(S.event_id AS STRING)
    WHEN NOT MATCHED THEN
      INSERT (event_id, ts, user_id, event_type, value, id_str)
      VALUES (S.event_id, S.ts, S.user_id, S.event_type, S.value,
              CAST(S.event_id AS STRING))
"""


def q_merge_sql_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference ga_sessions MERGE shape (reference
    pipeline/data_pipeline.py:177-206) run as a LITERAL SQL string
    through ``merge_sql.execute_merge``: inline keep-latest dedup
    subquery, bare-equality keys, an X8 ``CAST(... AS STRING)`` in
    both branches. Same three-branch plan as ``operators.upsert`` —
    staging broadcasts, the target never shuffles."""
    from dish_data_pipeline_spark.merge_sql import execute_merge

    e = read(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    target = keep_latest(
        e.filter(F.col("event_id") % 2 == 0),
        ["user_id", "event_type"],
        "ts",
        tiebreakers=["event_id"],
    ).withColumn("id_str", F.col("event_id").cast("string"))
    staging = e.filter(F.col("event_id") % 3 == 0)
    return execute_merge(
        spark,
        MERGE_SQL_SESSIONS,
        {
            "proj.dishdata.tgt_events": target,
            "proj.dishdata.staging_events": staging,
        },
    )


SQL_MERGE_SQL_ROUNDTRIP = """
WITH tgt AS (
  SELECT event_id, ts, user_id, event_type, value,
         CAST(event_id AS VARCHAR) AS id_str FROM (
    SELECT event_id, ts, user_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 2 = 0) t WHERE rn = 1),
stg AS (
  SELECT event_id, ts, user_id, event_type, value FROM (
    SELECT event_id, ts, user_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 3 = 0) t WHERE rn = 1)
SELECT t.user_id, t.event_type, s.event_id, s.ts, s.value,
       CAST(s.event_id AS VARCHAR) AS id_str
FROM tgt t JOIN stg s
  ON t.user_id = s.user_id AND t.event_type = s.event_type
UNION ALL
SELECT t.user_id, t.event_type, t.event_id, t.ts, t.value, t.id_str
FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM stg s
  WHERE s.user_id = t.user_id AND s.event_type = t.event_type)
UNION ALL
SELECT s.user_id, s.event_type, s.event_id, s.ts, s.value,
       CAST(s.event_id AS VARCHAR) AS id_str
FROM stg s WHERE NOT EXISTS (SELECT 1 FROM tgt t
  WHERE t.user_id = s.user_id AND t.event_type = s.event_type)
"""


MERGE_SQL_DAILY = """
    MERGE `proj.dishdata.tgt_daily` T
    USING `proj.dishdata.staging_daily` S
    ON date(T.visit_ts) = date(S.visit_ts) AND T.event_type = S.event_type
    WHEN MATCHED THEN
      UPDATE SET
        T.total_visits = S.total_visits,
        T.load_ts = S.load_ts
    WHEN NOT MATCHED THEN
      INSERT (visit_ts, event_type, total_visits, load_ts)
      VALUES (S.visit_ts, S.event_type, S.total_visits, S.load_ts)
"""


def q_merge_sql_datekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference daily_visits MERGE shape (reference
    pipeline/data_pipeline.py:160-175): ``date()``-wrapped
    expression keys and a PARTIAL update set — matched rows must
    RETAIN the target's ``visit_ts`` (its time-of-day differs from
    staging's), which distinguishes faithful UPDATE SET semantics
    from row replacement. Exercised through the literal SQL string
    via ``merge_sql.execute_merge``."""
    from dish_data_pipeline_spark.merge_sql import execute_merge

    e = read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())

    def daily(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.to_date("ts").alias("d"), F.col("event_type")
        ).agg(
            F.max("ts").alias("visit_ts"),
            F.count(F.lit(1)).alias("total_visits"),
            F.min("ts").alias("load_ts"),
        ).drop("d")

    target = daily(e.filter(F.col("event_id") % 2 == 0))
    staging = daily(e.filter(F.col("event_id") % 3 == 0))
    return execute_merge(
        spark,
        MERGE_SQL_DAILY,
        {
            "proj.dishdata.tgt_daily": target,
            "proj.dishdata.staging_daily": staging,
        },
    )


SQL_MERGE_SQL_DATEKEY = """
WITH tgt AS (
  SELECT event_type, MAX(ts) AS visit_ts,
         CAST(COUNT(*) AS BIGINT) AS total_visits, MIN(ts) AS load_ts
  FROM events WHERE event_id % 2 = 0 AND ts IS NOT NULL
  GROUP BY CAST(ts AS DATE), event_type),
stg AS (
  SELECT event_type, MAX(ts) AS visit_ts,
         CAST(COUNT(*) AS BIGINT) AS total_visits, MIN(ts) AS load_ts
  FROM events WHERE event_id % 3 = 0 AND ts IS NOT NULL
  GROUP BY CAST(ts AS DATE), event_type)
SELECT t.visit_ts, t.event_type, s.total_visits, s.load_ts
FROM tgt t JOIN stg s
  ON CAST(t.visit_ts AS DATE) = CAST(s.visit_ts AS DATE)
 AND t.event_type = s.event_type
UNION ALL
SELECT t.visit_ts, t.event_type, t.total_visits, t.load_ts
FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM stg s
  WHERE CAST(s.visit_ts AS DATE) = CAST(t.visit_ts AS DATE)
    AND s.event_type = t.event_type)
UNION ALL
SELECT s.visit_ts, s.event_type, s.total_visits, s.load_ts
FROM stg s WHERE NOT EXISTS (SELECT 1 FROM tgt t
  WHERE CAST(t.visit_ts AS DATE) = CAST(s.visit_ts AS DATE)
    AND t.event_type = s.event_type)
"""


MERGE_SQL_FULL = """
    MERGE `proj.dishdata.tgt_orders` T
    USING `proj.dishdata.stg_orders` S
    ON T.o_orderkey = S.o_orderkey
    WHEN MATCHED AND S.o_totalprice > 300000 THEN DELETE
    WHEN MATCHED THEN
      UPDATE SET T.o_totalprice = S.o_totalprice, T.o_orderstatus = 'U'
    WHEN NOT MATCHED AND S.o_totalprice > 200000 THEN
      INSERT (o_orderkey, o_totalprice, o_orderstatus)
      VALUES (S.o_orderkey, S.o_totalprice, 'I')
    WHEN NOT MATCHED BY SOURCE AND T.o_totalprice < 50000 THEN DELETE
    WHEN NOT MATCHED BY SOURCE THEN UPDATE SET T.o_orderstatus = 'R'
"""


def q_merge_sql_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL ANSI/BigQuery/Delta MERGE branch set through the
    textual surface — conditional MATCHED DELETE, fallback MATCHED
    UPDATE, conditional NOT MATCHED INSERT (non-qualifying source
    rows ignored), and both NOT MATCHED BY SOURCE actions (the
    retention/purge shape) — clause precedence per the standard:
    first holding condition wins. Same broadcast-join plan per
    branch; the target is never shuffled."""
    from dish_data_pipeline_spark.merge_sql import execute_merge

    o = read(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    staging = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
    )
    return execute_merge(
        spark,
        MERGE_SQL_FULL,
        {
            "proj.dishdata.tgt_orders": target,
            "proj.dishdata.stg_orders": staging,
        },
    )


SQL_MERGE_SQL_FULL = """
WITH tgt AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 2 = 0),
stg AS (
  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0)
SELECT t.o_orderkey, s.o_totalprice, 'U' AS o_orderstatus
FROM tgt t JOIN stg s ON t.o_orderkey = s.o_orderkey
WHERE NOT (s.o_totalprice > 300000)
UNION ALL
SELECT t.o_orderkey, t.o_totalprice, 'R' AS o_orderstatus
FROM tgt t
WHERE NOT EXISTS (SELECT 1 FROM stg s WHERE s.o_orderkey = t.o_orderkey)
  AND NOT (t.o_totalprice < 50000)
UNION ALL
SELECT s.o_orderkey, s.o_totalprice, 'I' AS o_orderstatus
FROM stg s
WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.o_orderkey = s.o_orderkey)
  AND s.o_totalprice > 200000
"""


def q_staging_sql_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WHOLE lifecycle driven textually through
    ``merge_sql.run_sql`` against a committed manifest table estate —
    no API calls, only SQL strings (round-13 judge ask #4):

    1. ``CREATE OR REPLACE TABLE`` truncate-loads staging
       (WRITE_TRUNCATE, reference pipeline/data_pipeline.py:141-148)
       — run TWICE with different slices so the result proves the
       second load truncated the first;
    2. ``INSERT INTO`` appends an audit row per load (WRITE_APPEND,
       reference :234-237);
    3. ``MERGE INTO`` upserts staging into the final table through
       the backend-committing route (the default-on ANSI cardinality
       check live on a real commit);
    4. a final ``SELECT`` over the committed estate returns the
       card: per-status counts/key extents of the merged table plus
       the audit trail.

    The DuckDB twin replays the same loads in pure SQL, so the hash
    matches only if truncate, append, and merge each committed
    exactly the right rows."""
    import os as _os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.merge_sql import run_sql

    from dish_data_pipeline_spark.plans.common import scratch_dir

    base = scratch_dir(
        "staging_sql", _os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(base, ignore_errors=True)
    be = ManifestParquetBackend()
    paths = {
        "staging_orders": _os.path.join(base, "staging_orders"),
        "tgt_orders": _os.path.join(base, "tgt_orders"),
        "audit": _os.path.join(base, "audit"),
    }
    raw = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    cat = {"orders": raw}

    def sql(stmt: str) -> DataFrame | None:
        return run_sql(spark, stmt, cat, backend=be, table_paths=paths)

    # load 1 (to be truncated away) + its audit row
    sql("CREATE OR REPLACE TABLE `proj.ds.staging_orders` AS "
        "SELECT * FROM `proj.ds.orders` WHERE o_orderkey % 3 = 0")
    sql("CREATE TABLE `proj.ds.audit` AS "
        "SELECT 'orders' AS table_name, CAST(1 AS BIGINT) AS load_seq, "
        "CAST(COUNT(*) AS BIGINT) AS record_count, 'SUCCESS' AS status "
        "FROM `proj.ds.staging_orders`")
    # load 2: WRITE_TRUNCATE — replaces load 1 wholesale
    sql("CREATE OR REPLACE TABLE `proj.ds.staging_orders` AS "
        "SELECT * FROM `proj.ds.orders` WHERE o_orderkey % 2 = 0")
    sql("INSERT INTO `proj.ds.audit` "
        "SELECT 'orders', CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT), "
        "'SUCCESS' FROM `proj.ds.staging_orders`")
    # pre-existing final table, then the textual MERGE commit
    sql("CREATE TABLE `proj.ds.tgt_orders` AS "
        "SELECT * FROM `proj.ds.orders` WHERE o_orderkey % 5 = 0")
    sql("MERGE `proj.ds.tgt_orders` T USING `proj.ds.staging_orders` S "
        "ON T.o_orderkey = S.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET "
        "T.o_totalprice = S.o_totalprice, T.o_orderstatus = 'U' "
        "WHEN NOT MATCHED THEN "
        "INSERT (o_orderkey, o_totalprice, o_orderstatus) "
        "VALUES (S.o_orderkey, S.o_totalprice, 'I')")
    out = sql(
        "SELECT 'tgt:' || o_orderstatus AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi "
        "FROM `proj.ds.tgt_orders` GROUP BY o_orderstatus "
        "UNION ALL "
        "SELECT 'audit:' || CAST(load_seq AS STRING), record_count, "
        "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM `proj.ds.audit`"
    )
    # materialize JVM-side before the scratch tables are torn down
    # (eager localCheckpoint: no driver collect round-trip). Trade-off
    # vs the old collect(): results live in executor block storage,
    # NOT driver rows — on a real cluster an executor loss after
    # teardown makes the frame unrecoverable, so consume promptly.
    # Fine for the single-process harness; applies to every eager
    # localCheckpoint materialization in this module and analytics.py.
    final = out.localCheckpoint()
    shutil.rmtree(base, ignore_errors=True)
    return final


SQL_STAGING_SQL_ROUNDTRIP = """
WITH stg AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 2 = 0),
tgt0 AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 5 = 0),
merged AS (
  SELECT t.o_orderkey, s.o_totalprice, 'U' AS o_orderstatus
  FROM tgt0 t JOIN stg s ON t.o_orderkey = s.o_orderkey
  UNION ALL
  SELECT t.o_orderkey, t.o_totalprice, t.o_orderstatus
  FROM tgt0 t
  WHERE NOT EXISTS (SELECT 1 FROM stg s
                    WHERE s.o_orderkey = t.o_orderkey)
  UNION ALL
  SELECT s.o_orderkey, s.o_totalprice, 'I' AS o_orderstatus
  FROM stg s
  WHERE NOT EXISTS (SELECT 1 FROM tgt0 t
                    WHERE t.o_orderkey = s.o_orderkey)),
audit AS (
  SELECT 1 AS load_seq, CAST(COUNT(*) AS BIGINT) AS record_count
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT 2, CAST(COUNT(*) AS BIGINT)
  FROM orders WHERE o_orderkey % 2 = 0)
SELECT 'tgt:' || o_orderstatus AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi
FROM merged GROUP BY o_orderstatus
UNION ALL
SELECT 'audit:' || CAST(load_seq AS VARCHAR), record_count,
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM audit
"""


def q_time_travel_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through the TEXTUAL surface (round 13): a manifest
    table is created from one orders slice (v0), truncate-reloaded
    from another via textual ``CREATE OR REPLACE TABLE`` (v1 —
    ``replace`` keeps history), then ONE SQL statement joins the
    current snapshot against ``VERSION AS OF 0`` (Delta's syntax,
    bound to the backend's versioned read by ``run_sql``) to report
    per-status counts and the v0 overlap. Hash-matches only if the
    versioned read returns exactly the committed v0 — the audit
    "what did last night's load replace?" shape without leaving SQL."""
    import os as _os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.merge_sql import run_sql

    from dish_data_pipeline_spark.plans.common import scratch_dir

    base = scratch_dir("tt_sql", _os.path.basename(sf_dir.rstrip("/")))
    shutil.rmtree(base, ignore_errors=True)
    be = ManifestParquetBackend()
    path = _os.path.join(base, "t")
    raw = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    cat = {"orders": raw}
    paths = {"t": path}
    run_sql(
        spark,
        "CREATE TABLE t AS SELECT * FROM `proj.ds.orders` "
        "WHERE o_orderkey % 3 = 0",
        cat, backend=be, table_paths=paths,
    )
    run_sql(
        spark,
        "CREATE OR REPLACE TABLE t AS SELECT * FROM `proj.ds.orders` "
        "WHERE o_orderkey % 2 = 0",
        cat, backend=be, table_paths=paths,
    )
    out = run_sql(
        spark,
        "SELECT cur.o_orderstatus AS st, "
        "CAST(COUNT(*) AS BIGINT) AS n_cur, "
        "CAST(COUNT(old.o_orderkey) AS BIGINT) AS n_also_v0 "
        "FROM t cur LEFT JOIN t VERSION AS OF 0 old "
        "ON cur.o_orderkey = old.o_orderkey "
        "GROUP BY cur.o_orderstatus",
        backend=be, table_paths=paths,
    )
    final = out.localCheckpoint()  # eager: outlives scratch teardown
    shutil.rmtree(base, ignore_errors=True)
    return final


SQL_TIME_TRAVEL_SQL = """
SELECT o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n_cur,
       CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_also_v0
FROM orders WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
"""


def q_dml_sql_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual ``UPDATE``/``DELETE`` certified end-to-end (round 13):
    a manifest table is created from an orders slice, a textual
    UPDATE rewrites the high-value rows (SET over the ORIGINAL row
    values, unlisted columns untouched), a textual DELETE drops the
    low-value tail through the file-scoped ``delete_where`` path,
    and the final SELECT aggregates the committed estate with the
    cross-engine quantized sum. The DuckDB twin replays both verbs
    as CASE/filter SQL, so the hash matches only if UPDATE applied
    exactly once over pre-update values and DELETE removed exactly
    the predicate's rows."""
    import os as _os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.merge_sql import run_sql_script

    from dish_data_pipeline_spark.plans.common import scratch_dir

    base = scratch_dir("dml_sql", _os.path.basename(sf_dir.rstrip("/")))
    shutil.rmtree(base, ignore_errors=True)
    be = ManifestParquetBackend()
    paths = {"t": _os.path.join(base, "t")}
    raw = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    qsum = (
        "CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 1000000 "
        "+ 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0"
    )
    out = run_sql_script(
        spark,
        "CREATE TABLE t AS SELECT * FROM `proj.ds.orders` "
        "WHERE o_orderkey % 4 = 1;"
        "UPDATE t SET o_orderstatus = 'X', "
        "o_totalprice = o_totalprice + 1000 WHERE o_totalprice > 200000;"
        "DELETE FROM t WHERE o_totalprice < 50000;"
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
        f"{qsum} AS total FROM t GROUP BY o_orderstatus",
        {"orders": raw},
        backend=be,
        table_paths=paths,
    )
    final = out.localCheckpoint()  # eager: outlives scratch teardown
    shutil.rmtree(base, ignore_errors=True)
    return final


SQL_DML_SQL_ROUNDTRIP = f"""
WITH t0 AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 4 = 1),
t1 AS (
  SELECT o_orderkey,
         CASE WHEN o_totalprice > 200000 THEN o_totalprice + 1000
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_totalprice > 200000 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus
  FROM t0),
t2 AS (SELECT * FROM t1 WHERE NOT (o_totalprice < 50000))
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM t2 GROUP BY o_orderstatus
"""


def q_maintenance_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole table-maintenance lifecycle as SQL statements
    (round 13): create → append → file-scoped UPDATE → DELETE →
    OPTIMIZE ZORDER → RESTORE, then ``DESCRIBE HISTORY`` returns the
    version/parent/operation card. Every operation string (including
    the update/delete predicates and the restore target) is
    deterministic, so the DuckDB twin is a plain VALUES table — the
    hash matches only if each verb committed exactly one version
    with exactly the right manifest markers."""
    import os as _os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.merge_sql import run_sql, run_sql_script

    from dish_data_pipeline_spark.plans.common import scratch_dir

    base = scratch_dir("maint_sql", _os.path.basename(sf_dir.rstrip("/")))
    shutil.rmtree(base, ignore_errors=True)
    be = ManifestParquetBackend()
    paths = {"t": _os.path.join(base, "t")}
    raw = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    run_sql_script(
        spark,
        "CREATE TABLE t AS SELECT * FROM `proj.ds.orders` "
        "WHERE o_orderkey % 3 = 0;"
        "INSERT INTO t SELECT * FROM `proj.ds.orders` "
        "WHERE o_orderkey % 3 = 1;"
        "UPDATE t SET o_orderstatus = 'X' WHERE o_totalprice > 200000;"
        "DELETE FROM t WHERE o_orderkey % 7 = 0;"
        "OPTIMIZE t ZORDER BY (o_orderkey, o_totalprice);"
        "RESTORE TABLE t TO VERSION AS OF 2",
        {"orders": raw},
        backend=be,
        table_paths=paths,
    )
    hist = run_sql(
        spark, "DESCRIBE HISTORY `proj.ds.t`",
        backend=be, table_paths=paths,
    ).select("version", "parent", "operation")
    final = hist.localCheckpoint()  # eager: outlives scratch teardown
    shutil.rmtree(base, ignore_errors=True)
    return final


SQL_MAINTENANCE_SQL = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(NULL AS BIGINT), 'create'),
  (1, 0, 'write'),
  (2, 1, 'update(o_totalprice > 200000)'),
  (3, 2, 'delete(o_orderkey % 7 = 0)'),
  (4, 3, 'compact'),
  (5, 4, 'restore(v2)')
) AS t(version, parent, operation)
"""


def q_time_travel_ts_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TIMESTAMP AS OF`` through the textual surface (round 14):
    a manifest table is created from one orders slice (v0), then
    truncate-reloaded from another (v1); the commit wall-clocks are
    read back from ``DESCRIBE HISTORY``'s new timestamp column, and
    ONE SQL statement unions per-status counts at a literal BETWEEN
    the two commits (resolves to v0 — the greatest version with
    commit_ts <= literal, Delta's rule) with counts at a literal
    AFTER the last commit (resolves to the current snapshot). Hash-
    matches only if timestamp resolution lands on exactly the right
    committed versions. Reference parity: the reference has no
    lakehouse tier; this extends its BigQuery-MERGE surface
    (pipeline/data_pipeline.py:160-206) with the audit-by-time shape
    Delta users write daily."""
    import os as _os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import time as _time  # noqa: PLC0415
    from datetime import datetime, timezone  # noqa: PLC0415

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.merge_sql import run_sql

    from dish_data_pipeline_spark.plans.common import scratch_dir

    base = scratch_dir("tt_ts_sql", _os.path.basename(sf_dir.rstrip("/")))
    shutil.rmtree(base, ignore_errors=True)
    be = ManifestParquetBackend()
    path = _os.path.join(base, "t")
    raw = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    cat = {"orders": raw}
    paths = {"t": path}
    run_sql(
        spark,
        "CREATE TABLE t AS SELECT * FROM `proj.ds.orders` "
        "WHERE o_orderkey % 5 = 0",
        cat, backend=be, table_paths=paths,
    )
    # the two commits must be strictly ordered in wall-clock for the
    # midpoint literal to be unambiguous (file IO already separates
    # them; the sleep makes it certain)
    _time.sleep(0.02)
    run_sql(
        spark,
        "CREATE OR REPLACE TABLE t AS SELECT * FROM `proj.ds.orders` "
        "WHERE o_orderkey % 2 = 1",
        cat, backend=be, table_paths=paths,
    )
    hist = be.history(path)
    ts0, ts1 = hist[0]["timestamp"], hist[1]["timestamp"]

    def _lit(ts: float) -> str:
        return datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )

    out = run_sql(
        spark,
        "SELECT 'v0' AS snap, o_orderstatus AS st, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM t TIMESTAMP AS OF '{_lit((ts0 + ts1) / 2.0)}' "
        "GROUP BY o_orderstatus "
        "UNION ALL "
        "SELECT 'cur' AS snap, o_orderstatus AS st, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM t TIMESTAMP AS OF '{_lit(ts1 + 3600.0)}' "
        "GROUP BY o_orderstatus",
        backend=be, table_paths=paths,
    )
    final = out.localCheckpoint()  # eager: outlives scratch teardown
    shutil.rmtree(base, ignore_errors=True)
    return final


SQL_TIME_TRAVEL_TS_SQL = """
SELECT 'v0' AS snap, o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_orderkey % 5 = 0 GROUP BY o_orderstatus
UNION ALL
SELECT 'cur' AS snap, o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_orderstatus
"""


def q_alter_table_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual schema evolution (round 14): CTAS an orders slice,
    ``ALTER TABLE ADD COLUMN batch_tag STRING`` (metadata-only — the
    committed files are untouched, the manifest schema widens), then
    INSERT a second slice WITH the new column and aggregate over
    ``COALESCE(batch_tag, 'legacy')``. Hash-matches only if the
    pre-alter rows read NULL for the evolved column and the post-
    alter insert carried its values — Delta's additive-evolution
    semantics driven entirely from SQL strings."""
    import os as _os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.merge_sql import run_sql_script

    from dish_data_pipeline_spark.plans.common import scratch_dir

    base = scratch_dir("alter_sql", _os.path.basename(sf_dir.rstrip("/")))
    shutil.rmtree(base, ignore_errors=True)
    be = ManifestParquetBackend()
    paths = {"t": _os.path.join(base, "t")}
    raw = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    out = run_sql_script(
        spark,
        "CREATE TABLE t AS SELECT * FROM `proj.ds.orders` "
        "WHERE o_orderkey % 4 = 0;"
        "ALTER TABLE t ADD COLUMN batch_tag STRING;"
        "INSERT INTO t SELECT o_orderkey, o_totalprice, o_orderstatus, "
        "'r14' FROM `proj.ds.orders` WHERE o_orderkey % 4 = 2;"
        "SELECT COALESCE(batch_tag, 'legacy') AS tag, "
        "o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n, "
        "MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi "
        "FROM t GROUP BY COALESCE(batch_tag, 'legacy'), o_orderstatus",
        {"orders": raw},
        backend=be,
        table_paths=paths,
    )
    final = out.localCheckpoint()  # eager: outlives scratch teardown
    shutil.rmtree(base, ignore_errors=True)
    return final


SQL_ALTER_TABLE_SQL = """
WITH t AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, NULL AS batch_tag
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderstatus, 'r14'
  FROM orders WHERE o_orderkey % 4 = 2)
SELECT COALESCE(batch_tag, 'legacy') AS tag, o_orderstatus AS st,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi
FROM t GROUP BY COALESCE(batch_tag, 'legacy'), o_orderstatus
"""


def q_ddl_lifecycle_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DDL verbs end-to-end (round 14): ``CREATE TABLE (col
    type, ...)`` declares an EMPTY table, ``INSERT INTO`` loads one
    orders slice, ``TRUNCATE TABLE`` commits an empty snapshot
    (history preserved — v1 stays time-travelable), a second INSERT
    loads a different slice, and ONE final statement unions per-
    status counts of the pre-truncate snapshot (``VERSION AS OF 1``)
    with the current table. Hash-matches only if the declared schema
    round-tripped, the truncate actually emptied the table without
    destroying history, and both loads landed exactly once."""
    import os as _os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from dish_data_pipeline_spark.io_backends import ManifestParquetBackend
    from dish_data_pipeline_spark.merge_sql import run_sql_script

    from dish_data_pipeline_spark.plans.common import scratch_dir

    base = scratch_dir("ddl_sql", _os.path.basename(sf_dir.rstrip("/")))
    shutil.rmtree(base, ignore_errors=True)
    be = ManifestParquetBackend()
    paths = {"t": _os.path.join(base, "t")}
    raw = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    out = run_sql_script(
        spark,
        "CREATE TABLE t (o_orderkey BIGINT, o_totalprice DOUBLE, "
        "o_orderstatus STRING);"
        "INSERT INTO t SELECT o_orderkey, o_totalprice, o_orderstatus "
        "FROM `proj.ds.orders` WHERE o_orderkey % 6 = 0;"
        "TRUNCATE TABLE t;"
        "INSERT INTO t SELECT o_orderkey, o_totalprice, o_orderstatus "
        "FROM `proj.ds.orders` WHERE o_orderkey % 6 = 3;"
        "SELECT 'pre' AS phase, o_orderstatus AS st, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM t VERSION AS OF 1 GROUP BY o_orderstatus "
        "UNION ALL "
        "SELECT 'cur' AS phase, o_orderstatus AS st, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM t GROUP BY o_orderstatus",
        {"orders": raw},
        backend=be,
        table_paths=paths,
    )
    final = out.localCheckpoint()  # eager: outlives scratch teardown
    shutil.rmtree(base, ignore_errors=True)
    return final


SQL_DDL_LIFECYCLE_SQL = """
SELECT 'pre' AS phase, o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_orderkey % 6 = 0 GROUP BY o_orderstatus
UNION ALL
SELECT 'cur' AS phase, o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_orderkey % 6 = 3 GROUP BY o_orderstatus
"""


# --- J3: semi/anti joins ------------------------------------------
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 450000)
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    # anti: customers with no big-ticket order; semi: of those, the
    # ones that do have an urgent order.
    no_big = c.join(big, c.c_custkey == big.o_custkey, "left_anti")
    return no_big.join(
        urgent, no_big.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SQL_SEMI_ANTI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


# --- A: grouped aggregation (TPC-H Q1 shape) ----------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- Multi-way join + top-k (TPC-H Q3 shape) ----------------------
def q_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_TOPK_REVENUE = f"""
SELECT l_orderkey, o_orderdate,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- 6-way join (TPC-H Q5 shape; broadcast small dims) ------------
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = read(spark, sf_dir, "region")
    n = read(spark, sf_dir, "nation")
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = read(spark, sf_dir, "lineitem")
    s = read(spark, sf_dir, "supplier")
    # region/nation are tiny at any SF → broadcast; supplier/customer
    # shuffle on their keys; AQE handles the rest.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


SQL_REGION_REVENUE = f"""
SELECT n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# --- Window analytics: lag + running/moving aggregates ------------
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmov = w.rowsBetween(-2, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.sum(F.col("value").cast(DEC)).over(wrows).cast("double").alias("run_sum"),
        (
            F.sum(F.col("value").cast(DEC)).over(wmov).cast("double")
            / F.count(F.lit(1)).over(wmov)
        ).alias("mov_avg3"),
        F.row_number().over(w).alias("seq"),
    )


SQL_WINDOW_RUNNING = """
SELECT event_id, user_id,
       LAG(value) OVER w AS prev_value,
       CAST(SUM(CAST(value AS DECIMAL(38,6)))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS run_sum,
       CAST(SUM(CAST(value AS DECIMAL(38,6)))
            OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS mov_avg3,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS seq
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- Rollup / grouping sets ---------------------------------------
def q_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")
    return e.rollup("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("sum_value"),
    )


SQL_ROLLUP_EVENTS = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('value')} AS sum_value
FROM events GROUP BY ROLLUP(event_type)
"""


# --- Set operations -----------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read(spark, sf_dir, "events")

    def users(pred) -> DataFrame:
        return e.filter(pred).select("user_id").distinct()

    purchasers = users(F.col("event_type") == "purchase")
    clickers = users(F.col("event_type") == "click")
    high_signup = users((F.col("event_type") == "signup") & (F.col("value") > 450))
    errored = users(F.col("event_type") == "error")
    return (
        purchasers.intersect(clickers)
        .union(high_signup)
        .distinct()
        .subtract(errored)
    )


SQL_SET_OPS = """
SELECT user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'click'
  UNION
  SELECT user_id FROM events WHERE event_type = 'signup' AND value > 450)
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
"""


PARITY_QUERIES: dict[str, QueryDef] = {
    "keep_latest_events": QueryDef(
        q_keep_latest_events, SQL_KEEP_LATEST_EVENTS,
        "W1/D3 keep-latest window dedup + aggregate (flagship)", ("window", "dedup")),
    "dedup_first_wins": QueryDef(
        q_dedup_first_wins, SQL_DEDUP_FIRST_WINS,
        "D1 deterministic first-wins dedup", ("dedup",)),
    "dup_key_counts": QueryDef(
        q_dup_key_counts, SQL_DUP_KEY_COUNTS,
        "A2 duplicate-key counting per group", ("agg",)),
    "dq_summary": QueryDef(
        q_dq_summary, SQL_DQ_SUMMARY,
        "Q1-Q5 data-quality metrics in one pass", ("quality",)),
    "flatten_struct": QueryDef(
        q_flatten_struct, SQL_FLATTEN_STRUCT,
        "F1 recursive struct flatten (3 levels)", ("flatten",)),
    "sanitize_json": QueryDef(
        q_sanitize_json, SQL_SANITIZE_JSON,
        "P3/X1 complex→JSON-string projection", ("flatten",)),
    "scalar_casts": QueryDef(
        q_scalar_casts, SQL_SCALAR_CASTS,
        "X3-X8 cast/format scalar functions", ("functions",)),
    "upsert_orders": QueryDef(
        q_upsert_orders, SQL_UPSERT_ORDERS,
        "J1 MERGE upsert, update+insert branches", ("upsert", "join")),
    "upsert_keep_latest": QueryDef(
        q_upsert_keep_latest, SQL_UPSERT_KEEP_LATEST,
        "J2 dedup-then-upsert (ga_sessions MERGE)", ("upsert", "join", "window")),
    "merge_sql_roundtrip": QueryDef(
        q_merge_sql_roundtrip, SQL_MERGE_SQL_ROUNDTRIP,
        "textual MERGE INTO, ga_sessions shape (inline dedup + CAST)",
        ("upsert", "sql", "window")),
    "merge_sql_datekey": QueryDef(
        q_merge_sql_datekey, SQL_MERGE_SQL_DATEKEY,
        "textual MERGE INTO, daily_visits shape (date() keys, partial SET)",
        ("upsert", "sql")),
    "merge_sql_full": QueryDef(
        q_merge_sql_full, SQL_MERGE_SQL_FULL,
        "full MERGE branch set: conditional DELETE/INSERT + BY SOURCE",
        ("upsert", "sql")),
    "staging_sql_roundtrip": QueryDef(
        q_staging_sql_roundtrip, SQL_STAGING_SQL_ROUNDTRIP,
        "whole lifecycle textually: CTAS truncate-load + INSERT audit "
        "+ committed MERGE (S3/S4/S5 via SQL strings)",
        ("sql", "sink", "upsert")),
    "time_travel_sql": QueryDef(
        q_time_travel_sql, SQL_TIME_TRAVEL_SQL,
        "VERSION AS OF via run_sql: current snapshot joined against "
        "the pre-reload v0 through the backend's versioned read",
        ("sql", "lakehouse")),
    "time_travel_ts_sql": QueryDef(
        q_time_travel_ts_sql, SQL_TIME_TRAVEL_TS_SQL,
        "TIMESTAMP AS OF via run_sql: commit wall-clocks resolve to "
        "the right versions (between-commits → v0, after-latest → cur)",
        ("sql", "lakehouse")),
    "alter_table_sql": QueryDef(
        q_alter_table_sql, SQL_ALTER_TABLE_SQL,
        "ALTER TABLE ADD COLUMN textually: metadata-only additive "
        "evolution, NULL backfill + post-alter INSERT",
        ("sql", "lakehouse")),
    "ddl_lifecycle_sql": QueryDef(
        q_ddl_lifecycle_sql, SQL_DDL_LIFECYCLE_SQL,
        "empty CREATE TABLE + INSERT + TRUNCATE (history preserved) "
        "+ reload, pre/post union via VERSION AS OF",
        ("sql", "lakehouse")),
    "dml_sql_roundtrip": QueryDef(
        q_dml_sql_roundtrip, SQL_DML_SQL_ROUNDTRIP,
        "textual UPDATE + file-scoped DELETE committed to a manifest "
        "table, quantized-sum aggregate of the result",
        ("sql", "lakehouse")),
    "maintenance_sql": QueryDef(
        q_maintenance_sql, SQL_MAINTENANCE_SQL,
        "create/append/UPDATE/DELETE/OPTIMIZE/RESTORE via SQL, "
        "DESCRIBE HISTORY card vs a constant oracle",
        ("sql", "lakehouse")),
    "semi_anti_join": QueryDef(
        q_semi_anti_join, SQL_SEMI_ANTI_JOIN,
        "J3 anti-join (customers without orders)", ("join",)),
    "pricing_summary": QueryDef(
        q_pricing_summary, SQL_PRICING_SUMMARY,
        "TPC-H Q1-shape grouped aggregation", ("agg",)),
    "topk_revenue": QueryDef(
        q_topk_revenue, SQL_TOPK_REVENUE,
        "TPC-H Q3-shape 3-way join + top-k", ("join", "topk")),
    "region_revenue": QueryDef(
        q_region_revenue, SQL_REGION_REVENUE,
        "TPC-H Q5-shape 6-way join", ("join",)),
    "window_running": QueryDef(
        q_window_running, SQL_WINDOW_RUNNING,
        "lag + running sum + moving average windows", ("window",)),
    "rollup_events": QueryDef(
        q_rollup_events, SQL_ROLLUP_EVENTS,
        "ROLLUP grouping sets", ("agg",)),
    "set_ops": QueryDef(
        q_set_ops, SQL_SET_OPS,
        "INTERSECT/UNION/EXCEPT set operations", ("setops",)),
}
