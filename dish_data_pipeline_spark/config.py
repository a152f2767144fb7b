"""Feed configuration — the engine's equivalent of the reference's
``pipeline/config_file_template.py`` (project/bucket/dataset/API
base URL + endpoint map, reference config_file_template.py:1-14),
minus its defects (DATASET assigned twice — defect ledger item 7).

The reference hardcodes two endpoints; here the same shape is data:
each feed carries its endpoint, merge keys, and DQ policy, and the
pipeline/CLI consume ``FEEDS`` directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    base_url: str = "https://api.example.com"
    warehouse_dir: str = "/data/warehouse"
    raw_zone: str = "raw_api_data"  # reference layout name (:46)


# Reference endpoints (config_file_template.py:9-12) with their
# recovered schemas' keys/required columns (FIXTURES.md §A).
FEEDS: dict[str, dict] = {
    "daily_visits": {
        "endpoint": "daily_visits",
        "keys": ["visit_date", "source_file"],
        "required": ["visit_date", "total_visits"],
    },
    "ga_sessions": {
        "endpoint": "ga_sessions",
        "keys": ["visitId", "source_file"],
        "required": ["visitId", "channelGrouping"],
    },
}


def feed_config(name: str):
    """Build a pipeline.FeedConfig for a configured feed."""
    from dish_data_pipeline_spark.pipeline import FeedConfig

    spec = FEEDS[name]
    return FeedConfig(
        name=name,
        endpoint=spec["endpoint"],
        keys=list(spec["keys"]),
        required=list(spec["required"]),
    )


@dataclass
class RunReport:
    """Aggregate of per-feed results for a full run (reference
    main() loops feeds sequentially, :247)."""

    results: list = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(r.status == "SUCCESS" for r in self.results)


def run_all(spark, config: EngineConfig, http_get=None) -> RunReport:
    """Run every configured feed — the reference ``main()`` loop."""
    from dish_data_pipeline_spark.pipeline import run_feed

    report = RunReport()
    for name in FEEDS:
        report.results.append(
            run_feed(
                spark,
                feed_config(name),
                config.base_url,
                config.warehouse_dir,
                http_get=http_get,
            )
        )
    return report
