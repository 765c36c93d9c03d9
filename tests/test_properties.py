"""Property-based tests (hypothesis) for the pure kernels.

The reference has no property tests (SURVEY.md §5); these pin the
invariants the distributed operators rely on, driver-side (no Spark
session -- they run in milliseconds).
"""

import ast
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmnetfusion_spark import h3idx
from osmnetfusion_spark.functions import geo, tags
from osmnetfusion_spark.functions.folds import listify_py
from osmnetfusion_spark.plans.merge import py_list_str

lats = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lons = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)


@given(lat=lats, lon=lons, res=st.integers(min_value=2, max_value=15))
@settings(max_examples=200, deadline=None)
def test_cell_encode_decode_consistency(lat, lon, res):
    """encode-at-parent-res == parent-of-encode, for every step count.

    This is the invariant tile_pyramid and the cover-cell joins rely on:
    the cell hierarchy is a strict prefix tree of the encode."""
    cell = int(h3idx.cell_np(np.array([lat]), np.array([lon]), res)[0])
    for steps in range(1, res):
        direct = int(h3idx.cell_np(np.array([lat]), np.array([lon]), res - steps)[0])
        r = cell // h3idx.SHIFT_RES
        rem = cell - r * h3idx.SHIFT_RES
        j = rem // h3idx.SHIFT_J
        i = rem - j * h3idx.SHIFT_J
        parent = (r - steps) * h3idx.SHIFT_RES + (j >> steps) * h3idx.SHIFT_J + (i >> steps)
        assert parent == direct


@given(lat1=lats, lon1=lons, lat2=lats, lon2=lons)
@settings(max_examples=200, deadline=None)
def test_haversine_metric_properties(lat1, lon1, lat2, lon2):
    d_ab = float(geo.haversine_np(lat1, lon1, lat2, lon2))
    d_ba = float(geo.haversine_np(lat2, lon2, lat1, lon1))
    assert d_ab >= 0.0
    assert math.isclose(d_ab, d_ba, rel_tol=1e-12, abs_tol=1e-9)  # symmetry
    assert float(geo.haversine_np(lat1, lon1, lat1, lon1)) == 0.0  # identity


@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=500),
            st.text(alphabet="abcdefg ,", min_size=0, max_size=8),
        ),
        min_size=0,
        max_size=10,
    )
)
@settings(max_examples=200, deadline=None)
def test_listify_sorted_dedup(vals):
    """listify output is always sorted + deduplicated (the merged-tag
    dictionary invariant the golden gpkg serialization depends on)."""
    import pandas as pd

    out = listify_py(pd.Series(vals, dtype=object))
    key = lambda x: (isinstance(x, str), x)  # noqa: E731
    assert out == sorted(set(out), key=key)
    assert len(out) == len(set(out))


@given(
    items=st.lists(
        st.one_of(st.integers(-1000, 1000), st.text(alphabet="abc_", max_size=6)),
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_py_list_str_roundtrip(items):
    """The saved-list serialization must literal_eval back to the list
    (byte-format parity with the reference's str(list) output)."""
    s = py_list_str(items)
    assert ast.literal_eval(s) == items


@given(xs=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_clean_float_reductions_bound(xs):
    """clean on a reference-format list string reduces within bounds and
    agrees with the exact min/mean/max of the parsed values."""
    s = "['" + "', '".join(str(x) for x in xs) + "']"
    mn = tags.clean_float(s, keep="min")
    mx = tags.clean_float(s, keep="max")
    mean = tags.clean_float(s, keep="mean")
    assert mn == min(xs)
    assert mx == max(xs)
    assert math.isclose(mean, sum(xs) / len(xs), rel_tol=1e-12)
    assert mn <= mean <= mx


@given(
    lat=st.floats(min_value=48.0, max_value=48.2, allow_nan=False),
    lon=st.floats(min_value=11.4, max_value=11.6, allow_nan=False),
    w=st.floats(min_value=1e-4, max_value=0.01, allow_nan=False),
    h=st.floats(min_value=1e-4, max_value=0.01, allow_nan=False),
    plat=st.floats(min_value=47.9, max_value=48.3, allow_nan=False),
    plon=st.floats(min_value=11.3, max_value=11.7, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_pip_matches_rect_truth(lat, lon, w, h, plat, plon):
    """Ray-casting PIP agrees with the closed-form answer on rectangles
    (away from the measure-zero boundary)."""
    poly = np.array(
        [[lon, lat], [lon + w, lat], [lon + w, lat + h], [lon, lat + h]]
    )
    eps = 1e-9
    on_boundary = (
        abs(plon - lon) < eps or abs(plon - (lon + w)) < eps
        or abs(plat - lat) < eps or abs(plat - (lat + h)) < eps
    )
    if on_boundary:
        return
    expect = (lon < plon < lon + w) and (lat < plat < lat + h)
    got = bool(geo.point_in_polygon_np(np.array([plon]), np.array([plat]), poly)[0])
    assert got == expect
