"""PBF-shaped codec (S5 analog): pure-codec roundtrips incl. the encodings
the contract query's friendly arithmetic never hits (negative zigzag
deltas, southern/western hemispheres, unicode tags, empty blocks)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from osmnetfusion_spark.sources import pbf


def _roundtrip(nodes, ways=(), relations=()):
    return pbf._decode_blob(pbf.encode_blob(nodes, ways, relations))


def test_roundtrip_basic():
    nodes = [
        (1, 485_000_000, 113_000_000, [("highway", "residential")]),
        (5, 485_000_100, 112_999_900, []),
    ]
    ways = [(10, [1, 5], [("oneway", "yes"), ("name", "Straße Über")])]
    dn, dw, dr = _roundtrip(nodes, ways)
    assert dn == [(1, 485_000_000, 113_000_000, {"highway": "residential"}),
                  (5, 485_000_100, 112_999_900, {})]
    assert dw == [(10, [1, 5], {"oneway": "yes", "name": "Straße Über"})]
    assert dr == []


def test_relation_roundtrip():
    relations = [
        (100, [("n", 1, "stop"), ("w", 10, "platform"), ("r", 99, "")],
         [("route", "bus"), ("name", "Linie 58 Süd")]),
        # backward member-ref delta + id gap down
        (7, [("n", 50, "stop"), ("n", 3, "stop_exit_only")],
         [("route", "tram")]),
    ]
    dn, dw, dr = _roundtrip([], [], relations)
    assert dn == [] and dw == []
    assert dr == [
        (100, [("n", 1, "stop"), ("w", 10, "platform"), ("r", 99, "")],
         {"route": "bus", "name": "Linie 58 Süd"}),
        (7, [("n", 50, "stop"), ("n", 3, "stop_exit_only")],
         {"route": "tram"}),
    ]


def test_negative_coords_and_backward_deltas():
    # southern/western hemisphere + ids that DECREASE (negative zigzag delta)
    nodes = [
        (1_000_000, -338_000_000, -702_000_000, []),
        (7, -900_000_000, 1_799_999_999, [("k", "v")]),
    ]
    dn, _, _ = _roundtrip(nodes)
    assert [(n[0], n[1], n[2]) for n in dn] == [
        (1_000_000, -338_000_000, -702_000_000),
        (7, -900_000_000, 1_799_999_999),
    ]


def test_empty_block():
    assert _roundtrip([]) == ([], [], [])


def test_string_table_dedup():
    # the same key/value must be stored once; blob stays small
    nodes = [(i, 0, 0, [("highway", "residential")]) for i in range(1000)]
    blob = pbf.encode_blob(nodes)
    assert len(blob) < 3000  # ~2 bytes/node after delta + dedup + zlib
    dn, _, _ = _roundtrip(nodes)
    assert len(dn) == 1000 and dn[500][3] == {"highway": "residential"}


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**50),
            st.integers(min_value=-900_000_000, max_value=900_000_000),
            st.integers(min_value=-1_800_000_000, max_value=1_800_000_000),
            st.lists(
                st.tuples(st.text(max_size=8), st.text(max_size=8)),
                max_size=3,
            ),
        ),
        max_size=20,
    )
)
def test_roundtrip_property(raw):
    # dict(tags) collapses duplicate keys -- normalize expectation the same way
    nodes = [(i, la, lo, t) for i, la, lo, t in raw]
    dn, _, _ = _roundtrip(nodes)
    assert dn == [(i, la, lo, dict(t)) for i, la, lo, t in nodes]


def test_corrupt_blob_strict_vs_skip(spark):
    """strict (default) fails the task on a corrupt blob; strict=False
    skips exactly that blob and decodes the rest -- the blob boundary is
    the independent-decode unit."""
    import pytest

    good = pbf.encode_blob([(1, 10, 20, [("highway", "path")])])
    corrupt = b"\x78\x9c" + b"\xde\xad\xbe\xef" * 4  # bad zlib stream
    blobs = spark.createDataFrame(
        [(0, good), (1, corrupt)], "blob_id long, data binary"
    )
    with pytest.raises(Exception):
        pbf.parse_nodes(blobs).count()
    rows = pbf.parse_nodes(blobs, strict=False).collect()
    assert [(r.node_id, r.lat_1e7, r.lon_1e7) for r in rows] == [(1, 10, 20)]
    assert pbf.parse_ways(blobs, strict=False).count() == 0
    assert pbf.parse_relations(blobs, strict=False).count() == 0


def test_pt_stops_from_relations(spark):
    """End-to-end: blobs -> parse -> PT-stop extraction, mirroring the
    reference's relation loop (p1_getFurtherOSMData.py:121-151): node
    member -> Point, way member -> LineString over the way's refs in
    order, other member types -> geometry None, name falls back to the
    1-based relation counter when the tag is absent."""
    nodes = [
        (1, 10_000_000, 20_000_000, []),
        (2, 30_000_000, 40_000_000, []),
        (3, 50_000_000, 60_000_000, []),
    ]
    ways = [(10, [3, 1, 2], [])]  # ref order must be preserved
    relations = [
        # no 'route' tag -> dropped entirely
        (4, [("n", 1, "stop")], [("type", "multipolygon")]),
        (5, [("n", 2, "stop"), ("w", 10, "platform")],
         [("route", "bus"), ("name", "L1"), ("operator", "op")]),
        # name absent -> falls back to rel_iter; rank over route
        # relations ordered by id: 5 -> 1, 9 -> 2
        (9, [("r", 5, "sub")], [("route", "tram"), ("from", "A"), ("to", "B")]),
    ]
    blobs = spark.createDataFrame(
        [(0, pbf.encode_blob(nodes, ways, relations))], "blob_id long, data binary"
    )
    out = pbf.pt_stops_from_relations(
        pbf.parse_relations(blobs), pbf.parse_nodes(blobs), pbf.parse_ways(blobs)
    )
    rows = {(r.relation_id, r.member_idx): r for r in out.collect()}
    assert len(rows) == 3 and (4, 0) not in rows

    r = rows[(5, 0)]
    assert (r.mode, r.stop_type, r.member_ref, r.name, r.operator) == (
        "bus", "stop", 2, "L1", "op"
    )
    assert r.geometry == [[4.0, 3.0]]  # [[lon, lat]] degrees

    r = rows[(5, 1)]
    assert r.stop_type == "platform"
    assert r.geometry == [[6.0, 5.0], [2.0, 1.0], [4.0, 3.0]]  # way ref order

    r = rows[(9, 0)]
    assert (r.mode, r.name, r["from"], r.to) == ("tram", "2", "A", "B")
    assert r.geometry is None


def test_manual_pbf_pt_path_feeds_enrichment(spark):
    """The reference's manual-PBF fallback end-to-end: PBF blobs ->
    relations -> PT stops -> add_pt_stops over a car-accessible edge.
    A user replaying p1_getFurtherOSMData.py's manual path then
    p2_enrichData's PT snap gets the same flow here."""
    from pyspark.sql import functions as F

    from osmnetfusion_spark.plans import enrich

    # one residential edge along the equator near (0, 0)
    edges = spark.createDataFrame(
        [(1, "residential", [[0.0, 0.0], [0.001, 0.0]])],
        "edge_id long, highway string, geometry array<array<double>>",
    ).withColumn("length", enrich.polyline_length_col(F.col("geometry")))

    # relation: bus route with one node member ~11 m north of the edge
    nodes = [(7, 1_000, 5_000, [])]  # lat 1e-4 deg ~ 11 m north, lon 5e-4
    relations = [(100, [("n", 7, "stop")], [("route", "bus"), ("name", "L1")])]
    blobs = spark.createDataFrame(
        [(0, pbf.encode_blob(nodes, [], relations))], "blob_id long, data binary"
    )
    stops = pbf.pt_stops_from_relations(
        pbf.parse_relations(blobs), pbf.parse_nodes(blobs), pbf.parse_ways(blobs)
    )
    # adapt to the pt_stops input schema (member_ref, name, lat, lon)
    pt = stops.filter(F.col("geometry").isNotNull()).select(
        "member_ref", "name",
        F.element_at("geometry", 1)[1].alias("lat"),
        F.element_at("geometry", 1)[0].alias("lon"),
    )
    out = enrich.add_pt_stops(edges, pt).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pt_stop_on, r.pt_stop_count, r.pt_stop_routes) == (1, 1, "L1")


def test_shingle_fast_kernel_matches_column_kernel(spark):
    """The Arrow-batched shingle kernel must produce byte-identical arrays
    to the interpreted column-expression definition (the oracle side)."""
    from pyspark.sql import functions as F

    from osmnetfusion_spark.operators import dedup

    texts = [
        "The quick brown fox jumps over the lazy dog",
        "the the the the",
        "", "   ", "a b", "punct!!! and, more; tokens... here ok 123 456 789",
        "MiXeD CaSe ToKeNs REPEAT repeat RePeAt tail one two three",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = (
        df.select(
            "i",
            dedup.shingle_hashes(F.col("t"), 3).alias("col_v"),
            dedup.shingle_hashes_fast(3)(F.col("t")).alias("fast_v"),
        )
        .collect()
    )
    for r in got:
        cv = r.col_v if r.col_v is not None else []
        assert list(r.fast_v) == list(cv), f"row {r.i}: {r.fast_v} != {cv}"
