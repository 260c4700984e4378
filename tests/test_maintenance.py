"""Compaction: fragmented table -> ~target-sized files, content preserved,
sort_cols variant leaves range-clustered files for data skipping."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from downscaledclimatedata_spark.operators.maintenance import (
    compact_parquet, key_skew_stats, table_bytes,
)


def _parquet_files(d: str) -> list[Path]:
    return [p for p in Path(d).rglob("*.parquet") if p.is_file()]


def test_compact_merges_small_files(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"))
    df.repartition(40).write.parquet(src)
    assert len(_parquet_files(src)) == 40

    n = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    assert n == 1  # 10k rows << 1 GiB target
    assert len(_parquet_files(dst)) == 1
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert out.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2


def test_compact_sorted_clusters_ranges(spark, tmp_path):
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "sorted")
    spark.range(0, 10_000).select(
        (F.col("id") * 37 % 10_000).alias("k"), F.col("id")) \
        .repartition(20).write.parquet(src)

    compact_parquet(spark, src, dst, target_bytes=60_000, sort_cols=["k"])
    files = _parquet_files(dst)
    assert len(files) >= 2
    # range partitioning => per-file key ranges must not overlap
    ranges = []
    for f in files:
        stats = spark.read.parquet(str(f)).agg(
            F.min("k"), F.max("k")).collect()[0]
        ranges.append((stats[0], stats[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {ranges}"
    assert spark.read.parquet(dst).count() == 10_000


def test_table_bytes_counts_everything(spark, tmp_path):
    src = str(tmp_path / "t")
    spark.range(0, 1000).write.parquet(src)
    data_bytes = sum(p.stat().st_size for p in _parquet_files(src))
    all_bytes = sum(p.stat().st_size for p in Path(src).rglob("*")
                    if p.is_file())
    # exact accounting of metadata files (_SUCCESS, .crc) differs by FS
    # implementation; sizing only needs the data-file order of magnitude
    assert data_bytes <= table_bytes(spark, src) <= all_bytes


def test_key_skew_stats_flags_hot_key(spark):
    rows = [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)]
    df = spark.createDataFrame(rows, "k int, v int")
    s = key_skew_stats(df, "k").collect()[0]
    assert s.n_keys == 101
    assert s.max_cnt == 900
    assert s.skew_factor > 50  # 900 / (1000/101) ~= 90.9


def test_dynamic_partition_overwrite_preserves_siblings(spark, tmp_path):
    from downscaledclimatedata_spark.operators.maintenance import (
        overwrite_partitions,
    )
    out = str(tmp_path / "table")
    v1 = spark.createDataFrame(
        [("d1", 1, 10), ("d2", 2, 20)], "day string, id int, v int")
    overwrite_partitions(v1, out, ["day"])
    # rewrite ONLY day=d2 with new content
    v2 = spark.createDataFrame([("d2", 2, 99)], "day string, id int, v int")
    overwrite_partitions(v2, out, ["day"])
    rows = {(r.day, r.id): r.v for r in spark.read.parquet(out).collect()}
    assert rows == {("d1", 1): 10, ("d2", 2): 99}
