"""S1 paginated REST source: envelope spellings, stop conditions
(reference pipeline/data_pipeline.py:26-65), raw-zone landing, and
the distributed fetch path."""

from __future__ import annotations

import glob

from dish_data_pipeline_spark.sources.rest import (
    extract_records,
    fetch_paginated_data,
    fetch_pages_distributed,
    has_more_pages,
)


def make_server(pages):
    """pages: list of (status, payload); serves page N from index N-1."""

    def http_get(url: str):
        page = int(url.rsplit("=", 1)[1])
        if page <= len(pages):
            return pages[page - 1]
        return 200, {"records": []}

    return http_get


def test_envelope_records_and_data():
    assert extract_records({"records": [{"a": 1}]}) == [{"a": 1}]
    assert extract_records({"data": [{"b": 2}]}) == [{"b": 2}]
    assert extract_records({}) == []
    assert extract_records(None) == []


def test_pagination_flags():
    assert has_more_pages({"pagination": {"has_next": True}})
    assert has_more_pages({"hasMore": True})
    assert not has_more_pages({"pagination": {"has_next": False}, "hasMore": False})
    assert not has_more_pages({})


def test_fetch_stops_on_empty_page():
    srv = make_server(
        [
            (200, {"records": [{"i": 1}], "hasMore": True}),
            (200, {"records": [], "hasMore": True}),
        ]
    )
    records, files = fetch_paginated_data("http://x", "e", http_get=srv)
    assert records == [{"i": 1}] and files == []


def test_fetch_stops_on_non_200():
    srv = make_server(
        [
            (200, {"records": [{"i": 1}], "hasMore": True}),
            (500, None),
        ]
    )
    records, _ = fetch_paginated_data("http://x", "e", http_get=srv)
    assert records == [{"i": 1}]


def test_fetch_stops_when_both_flags_false():
    srv = make_server(
        [(200, {"data": [{"i": 1}], "pagination": {"has_next": False}})]
    )
    records, _ = fetch_paginated_data("http://x", "e", http_get=srv)
    assert records == [{"i": 1}]


def test_fetch_lands_raw_zone(tmp_path):
    srv = make_server(
        [
            (200, {"records": [{"i": 1}], "hasMore": True}),
            (200, {"records": [{"i": 2}], "hasMore": False}),
        ]
    )
    records, files = fetch_paginated_data(
        "http://x", "e", http_get=srv, raw_zone_dir=str(tmp_path), name="feed"
    )
    assert [r["i"] for r in records] == [1, 2]
    assert len(files) == 2
    landed = glob.glob(str(tmp_path / "feed" / "year=*" / "month=*" / "day=*" / "*.json"))
    assert sorted(landed) == sorted(files)


def test_distributed_fetch(spark):
    def http_get(url):
        page = int(url.rsplit("=", 1)[1])
        return 200, {"records": [{"page": page}]}

    df = fetch_pages_distributed(spark, "http://x", "e", n_pages=6, partitions=3,
                                 http_get=http_get)
    assert df.count() == 6
