"""Real listing sources (S6): filesystem tree via pruned binaryFile scan,
S3 via (fake-client) paginator — driver-side and distributed — and the
catalog fixture e2e driven from a MATERIALIZED local directory tree
instead of an injected DataFrame.
"""

from __future__ import annotations

import contextlib
import csv
import io
import os

import pytest

from downscaledclimatedata_spark.operators.catalog import build_catalog
from downscaledclimatedata_spark.operators.listing import (
    listing_from_fs,
    listing_from_s3,
    listing_from_s3_distributed,
)

FIXTURE = "/root/reference/tests/assets/loca2_esm_catalog.csv"
BUCKET = "ees240146"
PREFIX = "netcdf/LOCA2/monthly/"


def _fixture_keys():
    with open(FIXTURE, newline="") as f:
        return [r["path"].removeprefix(f"s3://{BUCKET}/")
                for r in csv.DictReader(f)]


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    """The reference catalog snapshot materialized as real files on disk."""
    root = tmp_path_factory.mktemp("bucket_tree")
    for key in _fixture_keys():
        p = root / key
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")  # non-empty so size is meaningful
    return str(root)


def test_listing_from_fs_lists_all_keys(spark, fixture_tree):
    keys = set(_fixture_keys())
    got = listing_from_fs(spark, fixture_tree).collect()
    assert {r.key for r in got} == keys
    assert all(r.size == 1 for r in got)
    assert all(r.last_modified for r in got)


def test_listing_from_fs_prunes_content(spark, fixture_tree):
    """The listing must be metadata-only: the binaryFile scan's ReadSchema
    must not include the content column (else every byte is read)."""
    df = listing_from_fs(spark, fixture_tree)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    read = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "content" not in read, f"listing scan reads file content: {read}"


def test_catalog_e2e_from_materialized_tree(spark, fixture_tree):
    """Full S6 path: real directory walk -> build_catalog == fixture."""
    listing = listing_from_fs(spark, fixture_tree)
    catalog, quarantine = build_catalog(listing, bucket=BUCKET, prefix=PREFIX)
    got = {tuple(r) for r in catalog.collect()}
    with open(FIXTURE, newline="") as f:
        want = {(r["variable"], r["model"], r["scheme"], r["experiment_id"],
                 r["time_range"], r["path"]) for r in csv.DictReader(f)}
    assert quarantine.count() == 0
    assert got == want


class _FakePaginator:
    def __init__(self, pages_by_prefix):
        self._pages = pages_by_prefix

    def paginate(self, Bucket, Prefix=""):
        return iter(self._pages.get(Prefix, [{"Contents": []}]))


class _FakeS3Client:
    """Pages shaped exactly like botocore list_objects_v2 responses."""

    def __init__(self, pages_by_prefix):
        self._paginator = _FakePaginator(pages_by_prefix)

    def get_paginator(self, name):
        assert name == "list_objects_v2"
        return self._paginator


def _pages(prefix, n_keys, per_page=2):
    keys = [f"{prefix}model{i}/file.{i}.nc" for i in range(n_keys)]
    pages = []
    for i in range(0, n_keys, per_page):
        pages.append({"Contents": [
            {"Key": k, "Size": 10, "LastModified": "2024-01-01"}
            for k in keys[i:i + per_page]]})
    return pages or [{}]


def test_listing_from_s3_paginates(spark):
    client = _FakeS3Client({"a/": _pages("a/", 5)})
    df = listing_from_s3(spark, "bkt", prefix="a/", client=client)
    rows = df.collect()
    assert len(rows) == 5
    assert {r.key for r in rows} == {f"a/model{i}/file.{i}.nc" for i in range(5)}
    assert all(r.size == 10 for r in rows)


def test_listing_from_s3_empty_prefix(spark):
    client = _FakeS3Client({})
    assert listing_from_s3(spark, "bkt", prefix="none/", client=client).count() == 0


def test_listing_from_s3_distributed_runs_on_executors(spark):
    """Each prefix pages independently inside mapInPandas; the union of
    per-prefix listings must equal the flat listing. The fake client is
    built INSIDE the factory closure (classes defined at test-module level
    don't unpickle on executors)."""
    pages = {f"p{i}/": _pages(f"p{i}/", 3) for i in range(4)}

    def factory(pages=pages):
        class Paginator:
            def paginate(self, Bucket, Prefix=""):
                return iter(pages.get(Prefix, [{}]))

        class Client:
            def get_paginator(self, name):
                return Paginator()

        return Client()

    df = listing_from_s3_distributed(
        spark, "bkt", [f"p{i}/" for i in range(4)], client_factory=factory)
    rows = df.collect()
    assert len(rows) == 12
    assert {r.key for r in rows} == {
        f"p{i}/model{j}/file.{j}.nc" for i in range(4) for j in range(3)}


def test_listing_feeds_catalog(spark):
    """The S3 listing relation plugs straight into build_catalog."""
    key = "netcdf/LOCA2/ACCESS-CM2/ssp245/pr.ACCESS-CM2.ssp245.r1i1p1f1.2015-2044.nc"
    client = _FakeS3Client({"": [{"Contents": [
        {"Key": key, "Size": 1, "LastModified": "2024-01-01"}]}]})
    listing = listing_from_s3(spark, "bkt", client=client)
    catalog, quarantine = build_catalog(listing, bucket="bkt")
    row = catalog.collect()[0]
    assert quarantine.count() == 0
    assert (row.variable, row.model, row.scheme) == ("pr", "netcdf", "LOCA2")


def test_listing_from_fs_key_prefix(spark, fixture_tree):
    """key_prefix prepends a bucket-style path so a local tree can stand
    in for a prefixed bucket listing."""
    got = listing_from_fs(spark, fixture_tree, key_prefix="mirror/").limit(5).collect()
    assert got and all(r.key.startswith("mirror/") for r in got)
