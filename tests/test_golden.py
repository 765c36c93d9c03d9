"""Golden-fixture regression: pipeline output must match the committed
parquet fixtures byte-for-value (doubles rounded 6 dp).

The fixtures (tests/golden/, built by tools/make_golden.py) pin the
reference-parity semantics the north star names: simplified-network row
counts, merged-tag dictionaries (sorted-list serialization), and per-tile
edge assignments. Regenerate deliberately with make_golden.py after an
intentional semantic change -- never to silence a diff you can't explain.
"""

import os

import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def regenerated(spark):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_golden import build_outputs

    return build_outputs(spark)


def _assert_frame_equal(actual: pd.DataFrame, golden: pd.DataFrame, name: str):
    assert list(actual.columns) == list(golden.columns), f"{name}: column set/order"
    assert len(actual) == len(golden), f"{name}: row count {len(actual)} != {len(golden)}"
    for c in actual.columns:
        a, g = actual[c], golden[c]
        if a.dtype == object:  # strings / lists-as-strings
            a = a.astype(str)
            g = g.astype(str)
        mism = (a != g) & ~(a.isna() & g.isna())
        assert not mism.any(), (
            f"{name}.{c}: {int(mism.sum())} mismatching rows, first at index "
            f"{mism.idxmax()}: {a[mism].iloc[0]!r} != {g[mism].iloc[0]!r}"
        )


def test_golden_nodes(regenerated):
    npdf, _, _ = regenerated
    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, "simplified_nodes.parquet"))
    _assert_frame_equal(npdf, golden, "nodes")


def test_golden_edges(regenerated):
    _, epdf, _ = regenerated
    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, "simplified_edges.parquet"))
    _assert_frame_equal(epdf, golden, "edges")


def test_golden_tile_assignments(regenerated):
    _, _, tpdf = regenerated
    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, "tile_edges.parquet"))
    _assert_frame_equal(tpdf, golden, "tiles")


@pytest.fixture(scope="module")
def regenerated8(spark):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_golden import build_outputs

    return build_outputs(spark, scale=8)


def test_golden_scale8(regenerated8):
    """Second-scale fixture (VERDICT r3 #6): exact row counts plus a
    stride-sampled full-column row set at city scale 8 — pins the
    scale-dependent semantics (multi-split edges, KMeans threshold
    crossings, CC block-boundary fraction) a scale-1 fixture can't see."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_golden import sample_rows

    n8, e8, t8 = regenerated8
    counts = json.load(open(os.path.join(GOLDEN_DIR, "scale8_counts.json")))
    assert {"nodes": len(n8), "edges": len(e8), "tiles": len(t8)} == counts
    for pdf, name in ((n8, "nodes"), (e8, "edges"), (t8, "tiles")):
        golden = pd.read_parquet(
            os.path.join(GOLDEN_DIR, f"scale8_{name}_sample.parquet")
        )
        _assert_frame_equal(sample_rows(pdf), golden, f"scale8_{name}")
