"""Readers and writers for the engine's three-zone layout.

Mirrors the reference's raw/staging/target/audit zones
(reference README.md:195-203, pipeline/data_pipeline.py:46-53,
140-148, 234-237) on files Spark natively understands:

- raw zone: Hive-style date-partitioned JSON
  (``year=YYYY/month=MM/day=DD``) — partition pruning is free on read.
- staging/target/audit: Parquet (columnar, predicate pushdown,
  column pruning).

At 100 TB the same code holds: partitioned writes shard per task, and
readers get pushdown + pruning from the DataSource v2 path.
"""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's vectorized
    reader rejects those outright (PARQUET_TYPE_ILLEGAL)."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with transparent TIMESTAMP(NANOS)
    support: ns columns are read as raw longs
    (``legacy.parquet.nanosAsLong``) and converted to microsecond
    timestamps (ns→µs floor — lossless for µs-grain data)."""
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    # The flag is consumed at schema resolution (inside .parquet()),
    # so it can be restored immediately after — later plain reads of
    # TIMESTAMP(NANOS) files in the same session are unaffected.
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev: str | None = spark.conf.get(conf_key)
    except Exception:
        prev = None
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (``<sf_dir>/<name>.parquet``)."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_temp_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> None:
    """Register each table as a temp view for ``spark.sql`` queries."""
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_raw_zone(df: DataFrame, path: str, fmt: str = "json") -> None:
    """Raw/landing-zone writer: Hive-style date partitions.

    Spark-native equivalent of the reference's per-page GCS blob
    layout ``raw_api_data/<name>/year=/month=/day=/`` (reference
    pipeline/data_pipeline.py:46-53). Requires ``year``/``month``/
    ``day`` columns (see enrich.with_date_partitions).
    """
    (
        df.write.mode("append")
        .partitionBy("year", "month", "day")
        .format(fmt)
        .save(path)
    )


#: Formats the generic table reader/writer accepts — the Spark-native
#: columnar pair, the text interchange pair, and Avro. Avro is
#: two-tier: the vectorized spark-avro JVM module when it's on the
#: classpath (see :func:`avro_available`), else the dependency-free
#: pure-Python container-file tier (``sources.avro_python`` —
#: spec-faithful, distributed, slow path; all three spec codecs:
#: null, deflate, snappy), so an Avro estate is always functional.
#: :class:`FormatUnavailable` remains for genuinely-JVM-only
#: features (e.g. zstandard-coded input).
TABLE_FORMATS = ("parquet", "orc", "json", "csv", "avro")


class FormatUnavailable(RuntimeError):
    """The requested format needs an external package this session
    doesn't ship (mirror of the DeltaBackend import gate)."""


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro JVM package is on the session
    classpath (``--packages org.apache.spark:spark-avro_2.13:<ver>``
    or a cluster image that bakes it in). Resolved through Spark's
    own DataSource registry — a bare ``Class.forName`` is NOT enough
    (some distributions ship avro classes without registering the
    data source module).

    Only the EXPECTED absence signal is treated as "unavailable",
    and detection does not hinge on any one exception class: pyspark
    installs a py4j capture hook that (version-depending) converts
    the Java SparkClassNotFoundException into a captured
    AnalysisException, while a hook-less path surfaces the raw
    Py4JJavaError. Both forms are inspected — the Python-side
    message for the stable absence markers ("Failed to find data
    source", DATA_SOURCE_NOT_FOUND, _LEGACY_ERROR_TEMP_1139), and
    the Java exception's full cause chain for a
    *ClassNotFoundException class name. Any other failure (py4j
    transport, classloader corruption, ...) propagates: a
    fail-closed gate must not masquerade a real error as a missing
    optional dependency."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jvm.org.apache.spark.sql.internal.SQLConf.get()
        )
        return True
    except Exception as e:
        msg = str(e).lower()
        if (
            ("failed to find" in msg and "data source" in msg)
            or "data_source_not_found" in msg
            or "_legacy_error_temp_1139" in msg
        ):
            return False
        # Raw py4j form: walk the Java cause chain — Spark wraps the
        # underlying ClassNotFoundException before it reaches py4j.
        cause, hops = getattr(e, "java_exception", None), 0
        while cause is not None and hops < 8:
            jcls = cause.getClass().getName()
            jmsg = (cause.getMessage() or "").lower()
            if (
                "ClassNotFoundException" in jcls
                or ("failed to find" in jmsg and "data source" in jmsg)
                or "data_source_not_found" in jmsg
            ):
                return False
            cause, hops = cause.getCause(), hops + 1
        raise


AVRO_INSTALL_HINT = (
    "the external spark-avro package (launch with --packages "
    "org.apache.spark:spark-avro_2.13:<spark version>)"
)


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """Generic table writer over the supported interchange formats —
    ORC rounds out the columnar pair (both are Spark-native with
    predicate pushdown and column pruning; ORC is the warehouse-side
    format a Hive/Trino estate usually mandates). CSV writes a
    header so the file round-trips through :func:`read_any`."""
    if fmt not in TABLE_FORMATS:
        raise ValueError(f"fmt must be one of {TABLE_FORMATS}, got {fmt!r}")
    if fmt == "avro" and not avro_available(df.sparkSession):
        from dish_data_pipeline_spark.sources.avro_python import write_avro

        if mode not in ("overwrite", "append"):
            raise ValueError(
                f"python avro tier supports overwrite|append, got {mode!r}"
            )
        write_avro(df, path, mode=mode)
        return
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_any(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Generic reader for :data:`TABLE_FORMATS`. Parquet routes
    through :func:`read_parquet` (nanos-timestamp handling); CSV
    reads the written header with schema inference — pass an
    explicit-schema scan (``sources.files.read_csv_validated``) for
    production CSV, where inference is a correctness hazard."""
    if fmt not in TABLE_FORMATS:
        raise ValueError(f"fmt must be one of {TABLE_FORMATS}, got {fmt!r}")
    if fmt == "parquet":
        return read_parquet(spark, path)
    if fmt == "avro" and not avro_available(spark):
        from dish_data_pipeline_spark.sources.avro_python import read_avro

        return read_avro(spark, path)
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true").option("inferSchema", "true")
    return r.load(path)


def write_staging(df: DataFrame, path: str) -> None:
    """Truncate-load staging write (reference WRITE_TRUNCATE,
    pipeline/data_pipeline.py:141-148)."""
    df.write.mode("overwrite").parquet(path)


def write_append(df: DataFrame, path: str) -> None:
    """Append write (audit sink, reference
    pipeline/data_pipeline.py:234-237)."""
    df.write.mode("append").parquet(path)


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the target's swap lock.

    The parquet swap path is read-modify-write: a second concurrent
    writer would silently base its merge on a snapshot the first
    writer is about to replace (lost update). The advisory lock turns
    that silent corruption into this loud, retryable error — the
    single-writer scope of ``atomic_overwrite`` is ENFORCED, not just
    documented. For genuine multi-writer MERGE use the
    transaction-logged ``DeltaBackend`` (io_backends)."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


@contextlib.contextmanager
def _swap_lock(base: str):
    """Single-host advisory lock for the swap critical section
    (O_EXCL lock file holding the owner pid). A lock whose owner pid
    is gone — a crashed writer — is stolen; a live owner raises
    ``ConcurrentWriteError``. Pid liveness is a same-host judgement,
    which matches the rename-pair swap itself (atomic only on one
    filesystem); a shared lakehouse needs the Delta tier anyway."""
    lock = base + ".lock"
    parent = os.path.dirname(base)
    if parent:
        os.makedirs(parent, exist_ok=True)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        owner: int | None = None
        with contextlib.suppress(OSError, ValueError):
            with open(lock) as f:
                owner = int(f.read().strip() or "0") or None
        if owner is not None and _pid_alive(owner):
            raise ConcurrentWriteError(
                f"target {base!r} is being rewritten by live pid {owner} "
                f"(lock {lock}); retry after it finishes — concurrent "
                "swap-writers would lose updates"
            ) from None
        # Stale lock from a crashed/unreadable owner: take it over.
        with contextlib.suppress(FileNotFoundError):
            os.remove(lock)
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.write(fd, str(os.getpid()).encode())
    os.close(fd)
    try:
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.remove(lock)


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """Overwrite ``path`` with ``df`` safely even when ``df`` reads
    from ``path`` (the upsert read-modify-write cycle).

    Plain ``mode("overwrite")`` on the source path would delete the
    files mid-read. Strategy: materialize to a temp sibling, then
    swap directories, all inside an advisory single-writer lock — a
    concurrent writer on the same target fails fast with
    ``ConcurrentWriteError`` instead of silently losing an update
    (the lazy plan's READ of the old target executes during the
    write, so the whole read-modify-write cycle is inside the lock).
    Crash-safety: every intermediate state is healable by
    ``recover_interrupted_swap`` (the completed-write marker is
    Spark's ``_SUCCESS``); a crashed writer's stale lock is stolen by
    the next writer. For true multi-writer atomicity use a table
    format with a transaction log (Delta/Iceberg ``MERGE INTO``) —
    the operator composition in operators/upsert.py is
    format-agnostic, so only this writer changes.
    """
    base = path.rstrip("/")
    with _swap_lock(base):
        tmp = os.path.join(
            os.path.dirname(base), f".tmp-{uuid.uuid4().hex}-{os.path.basename(base)}"
        )
        df.write.mode("overwrite").parquet(tmp)
        old = tmp + ".old"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)


def recover_interrupted_swap(path: str) -> str:
    """Heal a target directory after a writer crashed anywhere inside
    ``atomic_overwrite``. Returns the action taken:

    - ``"clean"`` — target present, no debris.
    - ``"cleaned"`` — target present; stale tmp/old siblings removed.
    - ``"completed"`` — target missing but a FULLY WRITTEN tmp
      (Spark's ``_SUCCESS`` marker) existed: the interrupted swap is
      finished by promoting it (the merge result is not lost).
    - ``"rolled_back"`` — target missing, no complete tmp, but the
      pre-swap snapshot (``.old``) existed: restored; re-running the
      (idempotent, keyed) merge reproduces the lost update.
    - ``"missing"`` — nothing restorable (partial tmps removed).

    Call at writer startup, after taking over a stale lock, or from
    an orchestrator's recovery path.
    """
    base = path.rstrip("/")
    parent, name = os.path.dirname(base) or ".", os.path.basename(base)
    olds = glob.glob(os.path.join(parent, f".tmp-*-{name}.old"))
    tmps = [
        p
        for p in glob.glob(os.path.join(parent, f".tmp-*-{name}"))
        if not p.endswith(".old")
    ]
    if os.path.exists(base):
        for p in olds + tmps:
            shutil.rmtree(p, ignore_errors=True)
        return "cleaned" if (olds or tmps) else "clean"
    complete = sorted(
        (p for p in tmps if os.path.exists(os.path.join(p, "_SUCCESS"))),
        key=os.path.getmtime,
    )
    if complete:
        os.rename(complete[-1], base)
        for p in olds + tmps:
            if p != complete[-1]:
                shutil.rmtree(p, ignore_errors=True)
        return "completed"
    if olds:
        newest = max(olds, key=os.path.getmtime)
        os.rename(newest, base)
        for p in olds + tmps:
            if p != newest:
                shutil.rmtree(p, ignore_errors=True)
        return "rolled_back"
    for p in tmps:
        shutil.rmtree(p, ignore_errors=True)
    return "missing"


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    *bucket_cols: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a BUCKETED (and by default sorted) parquet
    table in the session catalog — the co-location contract that
    removes the shuffle from every subsequent equi-join or
    aggregation on the bucket columns.

    At 100 TB this is the difference between re-shuffling a fact
    table on every join against it and shuffling it ONCE at write
    time: two tables bucketed by the same columns into the same
    bucket count join with zero Exchange in the plan (asserted by
    ``tests/test_bucketed.py``), and sorting within buckets lets
    SortMergeJoin skip its sort. Spark's bucketing is hash(pmod)
    based and stable across writes, so incremental loads land in the
    right bucket files.

    Uses ``saveAsTable`` because bucket metadata lives in the
    catalog, not the parquet footers — path-based ``spark.read
    .parquet`` of the same files would NOT see the bucketing."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("at least one bucket column required")
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)
