"""S4/S5/P5: CSV scan, multi-format timestamp parse, type inference
(datapump.py:442-473,149-166)."""

from __future__ import annotations

from datetime import datetime

import pytest

from datapump_spark.queries import IOT_GLOB
from datapump_spark.sources.csv_ingest import (
    infer_ckan_fields,
    ingest_csv,
    multi_format_ts,
    read_csv_raw,
)


@pytest.fixture(scope="module")
def typed(spark):
    return ingest_csv(spark, IOT_GLOB)


def test_inferred_types(spark):
    fields = {f.name: f.ckan_type for f in infer_ckan_fields(read_csv_raw(spark, IOT_GLOB))}
    assert fields == {
        "DateTime": "timestamp", "Sensor_id": "text",
        "PM25": "float", "PM10": "float",
        "AQI": "int",  # nullable int stays int (improvement over pandas)
        "LAT": "float", "LONG": "float", "Remarks": "text",
    }


def test_multiformat_parse_all_rows(typed):
    # every fixture DateTime is written in one of the 4 reference formats
    assert typed.where(typed.DateTime.isNull()).count() == 0


def test_two_digit_year_parses_to_2021(spark):
    df = spark.createDataFrame([("21-10-01 05:00:00",), ("2021/10/01 05:00:00",)], "s string")
    got = [r[0] for r in df.select(multi_format_ts("s")).collect()]
    assert got == [datetime(2021, 10, 1, 5)] * 2


def test_whitespace_and_nulls(typed):
    # leading whitespace after commas must not leak into values
    sensors = {r[0] for r in typed.select("Sensor_id").distinct().collect()}
    assert all(not s.startswith(" ") for s in sensors)
    # empty AQI fields are NULL, not 0
    assert typed.where(typed.AQI.isNull()).count() > 0


def test_free_text_not_sniffed_as_timestamp(spark):
    fields = {f.name: f.ckan_type for f in infer_ckan_fields(read_csv_raw(spark, IOT_GLOB))}
    assert fields["Remarks"] == "text"


def test_sampled_inference_bounds_the_scan(spark, tmp_path):
    """sample_rows actually limits what inference sees: a type flip AFTER
    the sample bound doesn't change the verdict (the stray value degrades
    to NULL via try_cast), while full inference catches it."""
    from datapump_spark.sources.csv_ingest import infer_ckan_fields, read_csv_raw

    p = tmp_path / "flip.csv"
    p.write_text("a\n" + "\n".join(["1"] * 10) + "\nnot-a-number\n")
    raw = read_csv_raw(spark, str(p))
    assert infer_ckan_fields(raw, sample_rows=5)[0].ckan_type == "int"
    assert infer_ckan_fields(raw, sample_rows=None)[0].ckan_type == "text"


def test_sampled_inference_matches_full_on_fixture(spark):
    from datapump_spark.queries import IOT_GLOB
    from datapump_spark.sources.csv_ingest import infer_ckan_fields, read_csv_raw

    raw = read_csv_raw(spark, IOT_GLOB)
    assert infer_ckan_fields(raw, sample_rows=200) == infer_ckan_fields(raw)
