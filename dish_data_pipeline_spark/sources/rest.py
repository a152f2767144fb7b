"""Paginated REST JSON source (S1, reference
pipeline/data_pipeline.py:26-65).

Envelope/stop semantics replicated exactly:

- payload records live under ``"records"`` or ``"data"`` (ref :41);
- stop on non-200 (ref :36-38), empty page (ref :42-43), or when both
  ``pagination.has_next`` and ``hasMore`` are falsy (ref :55);
- 30 s per-page timeout (ref :35).

Two tiers:

- ``fetch_paginated_data`` — driver-side sequential loop, faithful to
  the reference's scale (~3k rows/run) and its raw-zone landing.
- ``fetch_pages_distributed`` — the 100 TB path: a page-range
  manifest distributed over executors with ``mapPartitions``, each
  task fetching its page slice with its own HTTP session (SURVEY.md
  §7.5). Use after a cheap page-count probe, with ``partitions``
  sized to the API's rate limit.

HTTP is injectable (``http_get``) so tests run against an in-process
fake; the real ``requests`` dependency is imported lazily.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

PageResult = tuple[int, dict | None]  # (status_code, parsed_json_or_None)
HttpGet = Callable[[str], PageResult]

TIMEOUT_S = 30  # reference pipeline/data_pipeline.py:35


def _requests_get(url: str) -> PageResult:
    import requests  # lazy: keep the engine importable without it

    resp = requests.get(url, timeout=TIMEOUT_S)
    try:
        body = resp.json()
    except ValueError:
        body = None
    return resp.status_code, body


def extract_records(payload: dict | None) -> list[dict]:
    """Records envelope: ``records`` else ``data`` (ref :41) — an
    or-chain, so a PRESENT-but-falsy ``records`` (null/[]) still
    falls through to ``data``, exactly like the reference's
    ``data.get("records") or data.get("data") or []``."""
    if not payload:
        return []
    return payload.get("records") or payload.get("data") or []


def has_more_pages(payload: dict | None) -> bool:
    """Continue when either pagination flag is truthy (ref :55)."""
    if not payload:
        return False
    has_next = bool((payload.get("pagination") or {}).get("has_next"))
    return has_next or bool(payload.get("hasMore"))


def page_url(base_url: str, endpoint: str, page: int) -> str:
    return f"{base_url}/{endpoint}?page={page}"


def fetch_paginated_data(
    base_url: str,
    endpoint: str,
    http_get: HttpGet = _requests_get,
    raw_zone_dir: str | None = None,
    name: str | None = None,
    max_pages: int = 10_000,
    clock=None,
) -> tuple[list[dict], list[str]]:
    """Driver-side fetch loop → (records, landed file paths).

    When ``raw_zone_dir`` is set, each page lands as one JSON file
    under Hive-style date partitions
    ``<raw_zone_dir>/<name>/year=/month=/day=/<name>_page_<p>.json``
    (reference layout, pipeline/data_pipeline.py:46-53) so Spark can
    re-read the raw zone with partition pruning.

    The partition date is captured ONCE per run (``clock`` injectable
    for tests), not per page — the reference stamps now() per page,
    so a run straddling midnight splits its raw files across day
    partitions (defect ledger row 9, pipeline/data_pipeline.py:46-50).
    """
    import datetime as dt

    records: list[dict] = []
    source_files: list[str] = []
    now = (clock or (lambda: dt.datetime.now(dt.timezone.utc)))()
    page = 1
    while page <= max_pages:
        status, payload = http_get(page_url(base_url, endpoint, page))
        if status != 200:
            break
        page_records = extract_records(payload)
        if not page_records:
            break
        records.extend(page_records)

        if raw_zone_dir and name:
            part_dir = os.path.join(
                raw_zone_dir,
                name,
                f"year={now.year}",
                f"month={now.month:02d}",
                f"day={now.day:02d}",
            )
            os.makedirs(part_dir, exist_ok=True)
            path = os.path.join(part_dir, f"{name}_page_{page}.json")
            with open(path, "w") as f:
                for rec in page_records:
                    f.write(json.dumps(rec) + "\n")
            source_files.append(path)

        if not has_more_pages(payload):
            break
        page += 1
    return records, source_files


def fetch_pages_distributed(
    spark: SparkSession,
    base_url: str,
    endpoint: str,
    n_pages: int,
    partitions: int = 8,
    http_get: HttpGet = _requests_get,
) -> DataFrame:
    """Scale path: fetch a known page range on executors.

    Returns a DataFrame of raw JSON record strings (column ``json``);
    parse with ``spark.read.json(df.rdd.map(...))`` or
    ``F.from_json`` against an explicit schema. Each task handles a
    contiguous page slice — per-task rate limiting belongs in
    ``http_get``.
    """
    pages = spark.range(1, n_pages + 1, numPartitions=partitions)

    def fetch_partition(rows: Iterator) -> Iterator[tuple[str]]:
        for row in rows:
            status, payload = http_get(page_url(base_url, endpoint, row.id))
            if status != 200:
                continue
            for rec in extract_records(payload):
                yield (json.dumps(rec),)

    return pages.rdd.mapPartitions(fetch_partition).toDF(["json"])


def records_to_dataframe(
    spark: SparkSession, records: list[dict], schema=None
) -> DataFrame:
    """Small-feed path: driver records → DataFrame. Schema explicit
    when known (inference drift is a reference defect class,
    SURVEY.md §7.4.4); JSON-inference fallback otherwise.

    The JSON fallback's RDD is sliced by RECORD COUNT, not the
    default ``defaultParallelism``: a feed-sized batch (the
    reference ingests ~3k rows/run) in 32 slices pays ~32 near-empty
    tasks per consuming action — twice over, because
    ``spark.read.json`` runs an eager schema-inference job first.
    One slice per ~4k records keeps the per-task JSON parse bounded
    while a genuinely large record list still fans out to cluster
    width."""
    if schema is not None:
        return spark.createDataFrame(records, schema)
    payload = [json.dumps(r) for r in records]
    slices = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-len(payload) // 4_000),  # ceil
        ),
    )
    return spark.read.json(spark.sparkContext.parallelize(payload, slices))
