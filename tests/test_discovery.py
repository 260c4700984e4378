"""Discovery pipeline unit tests: registry flatten, regex filter,
manifest projection, cursor progression, idempotency (mirrors the
reference's sensor tests, SURVEY §5.1 test_local2_sensors semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from downscaledclimatedata_spark.operators.discovery import (
    build_manifest, file_pattern, filter_filenames, group_keys,
    monthly_prefixed_key, new_work, next_group, registry_from_nested,
)

# deliberately unsorted (the reference's fixture is too — sorting is
# under test)
TEST_MODELS = {
    "ZModel": {"historical": {"r1i1p1f1"}},
    "AModel": {"ssp245": {"r1i1p1f1", "r2i1p1f1"}, "historical": {"r1i1p1f1"}},
    "MModel": {"ssp585": {"r3i1p1f2"}},
}


def test_registry_flatten(spark):
    reg = registry_from_nested(spark, TEST_MODELS)
    assert reg.count() == 5
    assert reg.columns == ["model", "scenario", "memberid"]


def test_group_keys_sorted_distinct(spark):
    reg = registry_from_nested(spark, TEST_MODELS)
    keys = [r["ms"] for r in group_keys(reg).orderBy("ms").collect()]
    assert keys == ["AModel/historical", "AModel/ssp245", "MModel/ssp585",
                    "ZModel/historical"]


def test_cursor_progression(spark):
    """fresh -> first group; mid -> next group; exhausted -> None
    (reference cursor tests semantics)."""
    reg = registry_from_nested(spark, TEST_MODELS)
    assert next_group(reg, None) == ("AModel", "historical")
    assert next_group(reg, "AModel/historical") == ("AModel", "ssp245")
    assert next_group(reg, "AModel/ssp245") == ("MModel", "ssp585")
    assert next_group(reg, "ZModel/historical") is None


def test_file_pattern_monthly_vs_daily(spark):
    files = spark.createDataFrame(
        [("tasmax.AModel.ssp245.r1i1p1f1.2015-2044.LOCA_16thdeg_v20240915.monthly.cent.nc",),
         ("tasmax.AModel.ssp245.r1i1p1f1.2015-2044.LOCA_16thdeg_v20240915.cent.monthly.nc",),
         ("tasmax.AModel.ssp245.r1i1p1f1.2015-2044.LOCA_16thdeg_v20240915.cent.nc",),
         ("pr.AModel.ssp245.r1i1p1f1.2015-2044.LOCA_16thdeg_v20240915.monthly.cent.nc",),
         ("index.html",), ("../",), ("tasmax.ncks.tmp",)],
        "filename string")
    monthly = file_pattern("tasmax", "AModel", "ssp245", "r1i1p1f1", monthly=True)
    daily = file_pattern("tasmax", "AModel", "ssp245", "r1i1p1f1", monthly=False)
    # both monthly naming conventions accepted; daily + junk rejected
    assert filter_filenames(files, monthly).count() == 2
    assert filter_filenames(files, daily).count() == 1


def test_manifest_projection(spark):
    files = spark.createDataFrame(
        [("AModel", "ssp245", "r1i1p1f1",
          "tasmax.AModel.ssp245.r1i1p1f1.2015-2044.LOCA_16thdeg_v20240915.monthly.cent.nc")],
        "model string, scenario string, memberid string, filename string")
    m = build_manifest(files, "tasmax", "https://example.test/LOCA2/").collect()[0]
    assert m["url"] == ("https://example.test/LOCA2/AModel/cent/0p0625deg/r1i1p1f1/"
                        "ssp245/tasmax/tasmax.AModel.ssp245.r1i1p1f1.2015-2044."
                        "LOCA_16thdeg_v20240915.monthly.cent.nc")
    assert m["s3_key"].startswith("/AModel/ssp245/tasmax.")
    assert m["variable"] == "tasmax"


def test_monthly_key_prefix(spark):
    df = spark.createDataFrame([("/m/s/file.nc",)], "s3_key string")
    with_prefix = df.select(monthly_prefixed_key(F.col("s3_key"), True).alias("k"))
    without = df.select(monthly_prefixed_key(F.col("s3_key"), False).alias("k"))
    assert with_prefix.collect()[0]["k"] == "/monthly/m/s/file.nc"
    assert without.collect()[0]["k"] == "/m/s/file.nc"


def test_idempotency_anti_join(spark):
    manifest = spark.createDataFrame(
        [("/a/1.nc",), ("/a/2.nc",), ("/a/3.nc",)], "s3_key string")
    processed = spark.createDataFrame(
        [("/a/1.nc",), ("/a/1.nc",)], "run_key string")  # dup log entries ok
    remaining = new_work(manifest, processed)
    keys = sorted(r["s3_key"] for r in remaining.collect())
    assert keys == ["/a/2.nc", "/a/3.nc"]
    # re-running with everything processed emits zero rows
    all_done = spark.createDataFrame(
        [("/a/1.nc",), ("/a/2.nc",), ("/a/3.nc",)], "run_key string")
    assert new_work(manifest, all_done).count() == 0
