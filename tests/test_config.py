"""Config module: feed registry → end-to-end run_all loop."""

from __future__ import annotations

from dish_data_pipeline_spark.config import EngineConfig, FEEDS, run_all


def both_feeds_server(url: str):
    page = int(url.rsplit("=", 1)[1])
    if page > 1:
        return 200, {"records": []}
    if "daily_visits" in url:
        return 200, {
            "records": [
                {"visit_date": f"2024-01-{i:02d}", "total_visits": i}
                for i in range(1, 8)
            ],
            "hasMore": False,
        }
    return 200, {
        "records": [
            {
                "visitId": f"v{i}",
                "channelGrouping": "Direct",
                "device": {"browser": "FF"},
                "totals": {"hits": i},
            }
            for i in range(1, 8)
        ],
        "hasMore": False,
    }


def test_run_all_feeds(spark, tmp_path):
    cfg = EngineConfig(base_url="http://fake", warehouse_dir=str(tmp_path / "wh"))
    report = run_all(spark, cfg, http_get=both_feeds_server)
    assert report.ok, [r.issues for r in report.results]
    assert {r.table for r in report.results} == set(FEEDS)
    for name in FEEDS:
        assert spark.read.parquet(str(tmp_path / "wh" / f"tgt_{name}")).count() == 7
    audit = spark.read.parquet(str(tmp_path / "wh" / "load_audit"))
    assert audit.count() == 2
