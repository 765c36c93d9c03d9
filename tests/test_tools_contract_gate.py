"""The local contract gate must be a faithful driver mimic.

Round-2 post-mortem (VERDICT r2 "What's wrong" #1-2): three oracle SQLs
emitted DuckDB HUGEINT columns (sum over BIGINT/INTEGER widens to int128),
which a pandas fetch renders as float64 and the driver's raw stringify
then hashes differently from Spark's int — while fetchall() + %.9g in the
old local gate masked it. These tests pin the two defenses added in
round 3: an oracle output-type lint and a raw pandas-fetch hash path.
"""

import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")

from check_contract import (  # noqa: E402
    ALLOWED_ORACLE_TYPES,
    lint_oracle_types,
    raw_cell,
    value_hash,
)


def test_lint_catches_hugeint_sum():
    con = duckdb.connect()
    rel = con.sql("SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)")
    assert lint_oracle_types(rel) == ["s:HUGEINT"]


def test_lint_passes_cast_bigint_sum():
    con = duckdb.connect()
    rel = con.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s, CAST(1.5 AS DOUBLE) AS d, "
        "'a' AS v, TRUE AS b "
        "FROM (SELECT CAST(1 AS BIGINT) AS x)"
    )
    assert lint_oracle_types(rel) == []


def test_allowed_types_are_driver_safe():
    # Exactly the scalar types that round-trip a pandas/Arrow fetch
    assert ALLOWED_ORACLE_TYPES == {
        "BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
    }


def test_raw_hash_catches_hugeint_float_rendering():
    """The driver-mimic raw hash must distinguish 3100000 from the
    float64 3100000.0 a HUGEINT degrades to — the exact r1/r2 failure."""
    cols = ["s"]
    h_int = value_hash([(3100000,)], cols, cell=raw_cell)
    h_float = value_hash([(3100000.0,)], cols, cell=raw_cell)
    assert h_int != h_float
    # while NaN on both sides (int-with-null degrading identically) matches
    assert value_hash([(float("nan"),)], cols, cell=raw_cell) == value_hash(
        [(float("nan"),)], cols, cell=raw_cell
    )


def test_cli_help_renders():
    """Regression: pre-formatting an argparse help string with % used to
    collapse the escaped %% and crash --help with a TypeError."""
    import pytest

    sys.path.insert(0, "/root/repo")
    from osmnetfusion_spark import cli

    for args in (["pipeline", "--help"], ["--help"], ["snap", "--help"]):
        with pytest.raises(SystemExit) as e:
            cli.main(args)
        assert e.value.code == 0


def test_driver_window_rotation():
    """Every contract query with no prior driver-green round must sit inside
    the driver's sampling window (first 50 dict entries); queries rotated
    past position 50 must have >=2 prior green rounds.

    Round-3 verdict finding: the round driver's correctness gate checks
    exactly ``list(queries())[:50]``, so with a >50-entry vector the dict
    ORDER decides driver visibility.  This test derives prior coverage from
    the committed CORRECTNESS_r*.json records, so it automatically re-fires
    each round as new records land and new queries are added.
    """
    import glob
    import json

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import queries

    keys = list(queries())
    green_rounds = {}  # name -> number of rounds with a fully green row
    latest_green: set = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rec = json.load(open(path))
        round_green = set()
        for name, row in rec.items():
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only checks
                and not row.get("err")
            )
            if ok:
                green_rounds[name] = green_rounds.get(name, 0) + 1
                round_green.add(name)
        latest_green = round_green  # sorted() => last file is newest round

    window = set(keys[:50])
    uncovered_outside = [
        k for k in keys if green_rounds.get(k, 0) == 0 and k not in window
    ]
    assert uncovered_outside == [], (
        "queries with zero prior driver coverage are outside the driver's "
        f"50-entry window: {uncovered_outside}"
    )
    # A rotated-out query needs either >=2 prior green rounds, or a green
    # row in the LATEST round record (fresh coverage: safe to skip for one
    # round; it must cycle back in before that row grows stale).
    weak_tail = [
        k
        for k in keys[50:]
        if green_rounds.get(k, 0) < 2 and k not in latest_green
    ]
    assert weak_tail == [], (
        "queries rotated past position 50 without >=2 prior driver-green "
        f"rounds or a latest-round green row: {weak_tail}"
    )
