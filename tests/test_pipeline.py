"""Golden end-to-end: synthetic paginated API → full pipeline →
target + audit contents; re-run proves MERGE idempotency
(SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import datetime as dt

from dish_data_pipeline_spark.pipeline import FeedConfig, run_feed

FEED = FeedConfig(
    name="daily_visits",
    endpoint="daily_visits",
    keys=["visit_date", "source_file"],
    required=["visit_date", "total_visits"],
)


def visits_server(n=8, dup=True):
    recs = [
        {"visit_date": f"2024-01-{i+1:02d}", "total_visits": 100 + i}
        for i in range(n)
    ]
    if dup:
        recs.append({"visit_date": "2024-01-01", "total_visits": 999})
    half = len(recs) // 2

    def http_get(url):
        page = int(url.rsplit("=", 1)[1])
        if page == 1:
            return 200, {"records": recs[:half], "hasMore": True}
        if page == 2:
            return 200, {"data": recs[half:], "pagination": {"has_next": False}}
        return 200, {"records": []}

    return http_get


def test_end_to_end_success_and_idempotent_rerun(spark, tmp_path):
    wh = str(tmp_path / "wh")
    res = run_feed(
        spark,
        FEED,
        "http://fake",
        wh,
        http_get=visits_server(),
        load_date=dt.date(2024, 2, 1),
    )
    assert res.status == "SUCCESS", res.issues
    # duplicate visit_date recovered by dedup → 8 rows
    assert res.record_count == 8

    tgt = spark.read.parquet(f"{wh}/tgt_daily_visits")
    assert tgt.count() == 8
    assert set(tgt.columns) >= {"visit_date", "total_visits", "load_timestamp", "source_file"}

    audit = spark.read.parquet(f"{wh}/load_audit")
    arow = audit.collect()[0]
    assert arow.status == "SUCCESS" and arow.record_count == 8
    assert len(arow.source_files) == 2  # two landed pages

    # Re-deliver the same feed: target must not grow (idempotent MERGE).
    res2 = run_feed(
        spark,
        FEED,
        "http://fake",
        wh,
        http_get=visits_server(),
        load_date=dt.date(2024, 2, 1),
    )
    assert res2.status == "SUCCESS"
    tgt2 = spark.read.parquet(f"{wh}/tgt_daily_visits")
    assert tgt2.count() == 8
    assert spark.read.parquet(f"{wh}/load_audit").count() == 2


def test_empty_feed_fails_with_audit(spark, tmp_path):
    wh = str(tmp_path / "wh")

    def empty(url):
        return 200, {"records": []}

    res = run_feed(spark, FEED, "http://fake", wh, http_get=empty)
    assert res.status == "FAILED"
    audit = spark.read.parquet(f"{wh}/load_audit").collect()
    assert len(audit) == 1 and audit[0].status.startswith("FAILED")


def test_low_volume_fails(spark, tmp_path):
    wh = str(tmp_path / "wh")

    def tiny(url):
        return 200, {
            "records": [{"visit_date": "2024-01-01", "total_visits": 1}],
            "hasMore": False,
        }

    res = run_feed(spark, FEED, "http://fake", wh, http_get=tiny)
    assert res.status == "FAILED"
    assert any("Low record count" in i for i in res.issues)
