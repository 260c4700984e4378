"""Property-based catalog-parse tests (SURVEY §5.2.4): the Spark pipeline
must agree with an independent pure-Python reimplementation of the parse
contract on arbitrary generated keys — valid, malformed, and zarr-chunked.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from downscaledclimatedata_spark.operators.catalog import build_catalog

_SEG = st.text(alphabet="abcXYZ019-_", min_size=1, max_size=8)

_VALID_KEY = st.builds(
    lambda model, scheme, fields, ext: f"{model}/{scheme}/" + ".".join(fields) + ext,
    _SEG, _SEG,
    st.lists(_SEG, min_size=5, max_size=7),
    st.sampled_from([".nc", ""]),
)

_ZARR_KEY = st.builds(
    lambda model, scheme, fields, marker, chunk:
        f"{model}/{scheme}/" + ".".join(fields) + f".{marker}" + chunk,
    _SEG, _SEG,
    st.lists(_SEG, min_size=4, max_size=5),
    st.sampled_from(["monthly.cent.zarr", "cent.monthly.zarr"]),
    st.sampled_from(["", "/var/0.0.0", "/.zmetadata"]),
)

_JUNK_KEY = st.text(alphabet="ab./-", min_size=0, max_size=20)

_KEYS = st.lists(st.one_of(_VALID_KEY, _ZARR_KEY, _JUNK_KEY),
                 min_size=1, max_size=25)

_ZARR_MARKERS = ("monthly.cent.zarr", "cent.monthly.zarr")


def _py_collapse(key: str) -> str:
    # independent reimplementation of the reference's chunk-key collapse
    # (loca2.py:193-199)
    for marker in _ZARR_MARKERS:
        if marker in key:
            return key.split(marker, 1)[0] + marker
    return key


def _py_well_formed(key: str) -> bool:
    # independent reimplementation of the parse_key positional contract
    # (loca2.py:115-136): >=2 non-empty path parts, >=5 filename dot-fields
    parts = [p for p in key.split("/") if p]
    return len(parts) >= 2 and len(parts[-1].split(".")) >= 5


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=_KEYS)
def test_catalog_partitions_all_keys(spark, keys):
    listing = spark.createDataFrame([(k,) for k in keys], "key string")
    catalog, quarantine = build_catalog(listing, bucket="b")
    collapsed = {_py_collapse(k) for k in keys}
    expect_ok = {k for k in collapsed if _py_well_formed(k)}
    expect_bad = collapsed - expect_ok

    cat_rows = catalog.collect()
    bad_keys = {r["rejected_key"] for r in quarantine.collect()}

    # conservation: every distinct collapsed key lands exactly one side
    assert len(cat_rows) == len(expect_ok)
    assert bad_keys == expect_bad
    # every catalog row's path embeds its source key and the bucket
    assert {r["path"] for r in cat_rows} == {f"s3://b/{k}" for k in expect_ok}
    # parse agrees with the positional contract
    for r in cat_rows:
        key = r["path"].removeprefix("s3://b/")
        parts = [p for p in key.split("/") if p]
        fields = parts[-1].split(".")
        assert r["model"] == parts[0]
        assert r["scheme"] == parts[1]
        assert r["variable"] == fields[0]
        assert r["experiment_id"] == fields[3]
        assert r["time_range"] == fields[4]
