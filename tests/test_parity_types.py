"""Regression tests for the driver-faithful type gate in tools/parity_check.

Round-2 postmortem: two oracles omitted an outer ::BIGINT cast, DuckDB
returned HUGEINT, and the driver's type-sensitive hash failed — while the
local parity harness (Python fetchall, which collapses HUGEINT to int)
passed.  These tests pin the failure mode: the Arrow-level canonicalizer
must distinguish DuckDB's sum(BIGINT) -> HUGEINT from a Spark BIGINT, and
must treat the properly cast form as equal.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "tools")

from parity_check import canon_arrow_type, canon_spark_type, type_mismatches


class FakeSdf:
    def __init__(self, dtypes):
        self.dtypes = dtypes


def test_hugeint_sum_is_flagged_against_spark_bigint():
    con = duckdb.connect()
    # the exact pre-fix oracle shape: sum over a BIGINT -> HUGEINT
    tbl = con.execute(
        "SELECT sum(x::BIGINT) AS revenue_cents FROM (VALUES (1),(2)) v(x)"
    ).fetch_arrow_table()
    bad = type_mismatches(FakeSdf([("revenue_cents", "bigint")]), tbl)
    assert bad == [("revenue_cents", "int64", "decimal(38,0)")]


def test_outer_bigint_cast_matches_spark_bigint():
    con = duckdb.connect()
    tbl = con.execute(
        "SELECT sum(x::BIGINT)::BIGINT AS revenue_cents FROM (VALUES (1),(2)) v(x)"
    ).fetch_arrow_table()
    assert type_mismatches(FakeSdf([("revenue_cents", "bigint")]), tbl) == []


def test_canonical_mapping_covers_catalog_types():
    con = duckdb.connect()
    tbl = con.execute(
        """
        SELECT 1::INT AS i, 1::BIGINT AS l, 1.5::DOUBLE AS d,
               'x' AS s, true AS b, now() AS t,
               [1.0::FLOAT, 2.0::FLOAT] AS v
        """
    ).fetch_arrow_table()
    got = {f.name: canon_arrow_type(f.type) for f in tbl.schema}
    want_spark = {
        "i": "int", "l": "bigint", "d": "double", "s": "string",
        "b": "boolean", "t": "timestamp", "v": "array<float>",
    }
    for name, sdt in want_spark.items():
        assert canon_spark_type(sdt) == got[name], (name, sdt, got[name])
