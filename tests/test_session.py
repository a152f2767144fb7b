"""session.py — env-driven conf overrides (r15)."""

import pytest

from dish_data_pipeline_spark.session import _parse_env_conf


def test_parse_env_conf_empty_and_none():
    assert _parse_env_conf(None) == {}
    assert _parse_env_conf("") == {}
    assert _parse_env_conf(" ; ; ") == {}


def test_parse_env_conf_pairs():
    got = _parse_env_conf(
        "spark.io.compression.codec=zstd; "
        "spark.sql.join.preferSortMergeJoin=false"
    )
    assert got == {
        "spark.io.compression.codec": "zstd",
        "spark.sql.join.preferSortMergeJoin": "false",
    }


def test_parse_env_conf_value_may_contain_equals():
    got = _parse_env_conf("spark.driver.extraJavaOptions=-Dx=1")
    assert got == {"spark.driver.extraJavaOptions": "-Dx=1"}


def test_parse_env_conf_malformed_raises():
    with pytest.raises(ValueError, match="DISH_SPARK_CONF"):
        _parse_env_conf("no_equals_here")
    with pytest.raises(ValueError, match="DISH_SPARK_CONF"):
        _parse_env_conf("=valueonly")
