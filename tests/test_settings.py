"""Config-file layer: precedence chain env > file > code default, and the
CLI wired through it (reference utils/constants.py parity)."""

import os

from reddit_data_pipeline_engineering_spark import config as defaults
from reddit_data_pipeline_engineering_spark.settings import load_settings


def test_defaults_without_file_or_env():
    s = load_settings(None, env={})
    assert s.locations_page_size == defaults.LOCATIONS_PAGE_SIZE
    assert s.pollutants == defaults.POLLUTANTS
    assert s.api_timeout_s == 30.0
    assert s.input_path is None


def test_file_overrides_defaults(tmp_path):
    conf = tmp_path / "settings.conf"
    conf.write_text(
        "[api]\napi_key = sekrit\nlocations_page_size = 25\n"
        "[pipeline]\npollutants = pm25, o3\n"
        "[file_paths]\ninput_path = /data/raw\n"
    )
    s = load_settings(str(conf), env={})
    assert s.api_key == "sekrit"
    assert s.locations_page_size == 25
    assert s.pollutants == ("pm25", "o3")
    assert s.input_path == "/data/raw"
    assert s.measurements_limit == defaults.MEASUREMENTS_LIMIT  # untouched


def test_env_beats_file(tmp_path):
    conf = tmp_path / "settings.conf"
    conf.write_text("[api]\nlocations_page_size = 25\n")
    env = {"RDPE_API_LOCATIONS_PAGE_SIZE": "7", "RDPE_CATALOG_TABLE": "m"}
    s = load_settings(str(conf), env=env)
    assert s.locations_page_size == 7
    assert s.table == "m"


def test_missing_explicit_file_is_loud(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        load_settings(str(tmp_path / "nope.conf"))
