"""Catalog pipeline unit tests (mirror of the reference's test strategy,
SURVEY §5.1: parametrized parse cases + zarr chunk-key collapse + output
re-read verification)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from downscaledclimatedata_spark.operators.catalog import (
    build_catalog, parse_key_columns, well_formed, write_catalog, zarr_base_path,
)


# parse-position contract: path part 1 -> model, 2 -> scheme; filename
# dot-fields 1 -> variable, 4 -> experiment_id, 5 -> time_range
# (reference parse_key, loca2.py:115-136)
PARSE_CASES = [
    ("ACCESS-CM2/historical/pr.ACCESS-CM2.historical.r1i1p1f1.1950-2014.LOCA_16thdeg_v20240915.cent.monthly.nc",
     {"variable": "pr", "model": "ACCESS-CM2", "scheme": "historical",
      "experiment_id": "r1i1p1f1", "time_range": "1950-2014"}),
    ("TaiESM1/ssp585/tasmax.TaiESM1.ssp585.r1i1p1f1.2075-2100.LOCA_16thdeg_v20220413.monthly.cent.nc",
     {"variable": "tasmax", "model": "TaiESM1", "scheme": "ssp585",
      "experiment_id": "r1i1p1f1", "time_range": "2075-2100"}),
    # leading slash produces an empty first segment that must be dropped
    ("/EC-Earth3/ssp370/tasmin.EC-Earth3.ssp370.r4i1p1f1.2015-2044.LOCA_16thdeg_v20240915.monthly.cent.zarr",
     {"variable": "tasmin", "model": "EC-Earth3", "scheme": "ssp370",
      "experiment_id": "r4i1p1f1", "time_range": "2015-2044"}),
]


@pytest.mark.parametrize("rel_key,expected", PARSE_CASES)
def test_parse_key_positions(spark, rel_key, expected):
    df = spark.createDataFrame([(rel_key,)], "rel_key string")
    row = parse_key_columns(df, "rel_key", bucket="bkt").collect()[0]
    for col, val in expected.items():
        assert row[col] == val, f"{col}: {row[col]} != {val}"
    assert row["path"] == f"s3://bkt/{rel_key}"


def test_zarr_chunk_collapse(spark):
    """3 listing keys for one zarr store + 1 netcdf key -> 2 catalog rows
    (reference test semantics: chunk keys collapse to the store)."""
    store = "m/s/pr.m.s.r1i1p1f1.1950-2014.LOCA_16thdeg_v1.monthly.cent.zarr"
    keys = [(f"{store}/pr/0.0.0",), (f"{store}/.zmetadata",), (store,),
            ("m/s/pr.m.s.r1i1p1f1.1950-2014.LOCA_16thdeg_v1.monthly.cent.nc",)]
    listing = spark.createDataFrame(keys, "key string")
    catalog, quarantine = build_catalog(listing, bucket="bkt")
    rows = catalog.collect()
    assert len(rows) == 2
    assert quarantine.count() == 0
    paths = {r["path"] for r in rows}
    assert f"s3://bkt/{store}" in paths


def test_cent_monthly_zarr_variant(spark):
    """The second zarr naming convention (loca2.py:197-199) collapses too."""
    store = "m/s/pr.m.s.r1i1p1f1.1950-2014.LOCA_16thdeg_v1.cent.monthly.zarr"
    df = spark.createDataFrame([(f"{store}/chunk/1",)], "key string")
    out = df.select(zarr_base_path(F.col("key")).alias("b")).collect()[0]["b"]
    assert out == store


def test_malformed_keys_quarantined(spark):
    keys = [("too-few-dots/x/a.b.nc",), ("no-slash-at-all",),
            ("m/s/ok.m.s.r1i1p1f1.1950-2014.v1.nc",),
            ("m/s/junk.ncks.tmp",)]  # the real fixture's dirty-row class
    listing = spark.createDataFrame(keys, "key string")
    catalog, quarantine = build_catalog(listing, bucket="bkt")
    assert catalog.count() == 1
    assert quarantine.count() == 3


def test_null_and_empty_keys_quarantined(spark):
    """Null/empty keys must be quarantined, not silently dropped (the
    naive ~well_formed filter loses NULL rows on both sides)."""
    from pyspark.sql import types as T
    listing = spark.createDataFrame(
        [(None,), ("",), ("m/s/ok.m.s.r1i1p1f1.1950-2014.v1.nc",)],
        T.StructType([T.StructField("key", T.StringType(), True)]))
    catalog, quarantine = build_catalog(listing, bucket="bkt")
    assert catalog.count() == 1
    assert quarantine.count() == 2  # conservation: 3 in = 1 + 2 out


def test_prefix_strip(spark):
    listing = spark.createDataFrame(
        [("netcdf/LOCA2/m/s/pr.m.s.r1i1p1f1.1950-2014.v1.nc",)], "key string")
    catalog, _ = build_catalog(listing, bucket="bkt", prefix="netcdf/LOCA2/")
    row = catalog.collect()[0]
    assert row["model"] == "m"
    assert row["scheme"] == "s"


def test_well_formed_predicate(spark):
    df = spark.createDataFrame([("a/b/c.d.e.f.g.nc",), ("a",), ("a/b/c.d",)],
                               "rel_key string")
    flags = [r[0] for r in df.select(well_formed("rel_key")).collect()]
    assert flags == [True, False, False]


def test_write_catalog_roundtrip(spark, tmp_path):
    """CSV + JSON sink re-read verification (reference re-reads its CSV
    with pandas, test_loca2_esm_catalog.py:91)."""
    import json
    listing = spark.createDataFrame(
        [("m/s/pr.m.s.r1i1p1f1.1950-2014.v1.nc",),
         ("m2/s2/tasmax.m2.s2.r2i1p1f1.2015-2044.v1.nc",)], "key string")
    catalog, _ = build_catalog(listing, bucket="bkt")
    out = str(tmp_path / "cat")
    write_catalog(catalog, out, "test-catalog", "a test catalog", "netcdf")
    back = spark.read.option("header", True).csv(f"{out}/test-catalog.csv")
    assert back.count() == 2
    assert back.columns == ["variable", "model", "scheme", "experiment_id",
                            "time_range", "path"]
    spec = json.loads(open(f"{out}/test-catalog.json").read())
    assert spec["esmcat_version"] == "0.1.0"
    assert spec["assets"]["format"] == "netcdf"
