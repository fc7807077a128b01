"""Unit tests for tools/check_oracles.py's driver-fidelity canonicalizer.

Round-6 lesson: the driver's value hash is TYPE-sensitive. DuckDB
promotes integer ``sum()`` to HUGEINT, pandas renders it float64, and
the driver flagged ``dp_pack`` red while the old ``check_dtype=False``
compare said ok. ``canonicalize_pair`` must therefore flag
int-vs-float dtype splits as failures even when values are equal.
"""

import sys

import pandas as pd
import pytest

sys.path.insert(0, ".")
from tools.check_oracles import canonicalize_pair  # noqa: E402


def test_int_vs_float_split_is_flagged():
    # the exact dp_pack r6 shape: equal values, int64 vs float64
    s = pd.DataFrame({"bin_pos": pd.Series([183, 0, 42], dtype="int64")})
    o = pd.DataFrame({"bin_pos": pd.Series([183.0, 0.0, 42.0], dtype="float64")})
    _, _, problems = canonicalize_pair(s, o)
    assert len(problems) == 1
    assert "int-vs-float" in problems[0]
    assert "bin_pos" in problems[0]


def test_int_width_mismatch_is_canonicalized_not_flagged():
    s = pd.DataFrame({"d": pd.Series([1, 2], dtype="int32")})
    o = pd.DataFrame({"d": pd.Series([1, 2], dtype="int64")})
    cs, co, problems = canonicalize_pair(s, o)
    assert problems == []
    assert cs["d"].dtype == co["d"].dtype == "int64"
    pd.testing.assert_frame_equal(cs, co)


def test_nullable_int_promotion_lands_in_float_float_branch():
    # both engines render nullable int columns as NaN-bearing float64 —
    # a genuine nullable pair is float-vs-float and passes; an
    # int-vs-NaN-float pair can never be value-equal, so the split is
    # flagged rather than exempted
    s = pd.DataFrame({"v": pd.Series([1.0, float("nan"), 3.0])})
    o = pd.DataFrame({"v": pd.Series([1.0, float("nan"), 3.0])})
    _, _, problems = canonicalize_pair(s, o)
    assert problems == []

    s2 = pd.DataFrame({"v": pd.Series([1.0, float("nan"), 3.0])})
    o2 = pd.DataFrame({"v": pd.Series([1, 2, 3], dtype="int64")})
    _, _, problems2 = canonicalize_pair(s2, o2)
    assert problems2 and "int-vs-float" in problems2[0]


def test_float_vs_float_ok():
    s = pd.DataFrame({"x": pd.Series([1.5], dtype="float32")})
    o = pd.DataFrame({"x": pd.Series([1.5], dtype="float64")})
    cs, co, problems = canonicalize_pair(s, o)
    assert problems == []
    assert cs["x"].dtype == co["x"].dtype == "float64"


def test_bool_vs_int_split_is_flagged():
    s = pd.DataFrame({"keep": pd.Series([True, False], dtype="bool")})
    o = pd.DataFrame({"keep": pd.Series([1, 0], dtype="int64")})
    _, _, problems = canonicalize_pair(s, o)
    assert problems and "bool" in problems[0]


def test_midnight_stripped_only_when_both_sides_date_granular():
    # date-granular pair: DuckDB datetime64 midnight vs Spark date objects
    s = pd.DataFrame({"d": pd.Series(["2024-01-01", "2024-02-03"])})
    o = pd.DataFrame(
        {"d": pd.to_datetime(pd.Series(["2024-01-01", "2024-02-03"]))}
    )
    cs, co, problems = canonicalize_pair(s, o)
    assert problems == []
    pd.testing.assert_frame_equal(cs, co)

    # genuine timestamp column with SOME midnight values: full precision kept
    s2 = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 05:30:00"])}
    )
    o2 = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 05:30:00"])}
    )
    cs2, co2, _ = canonicalize_pair(s2, o2)
    assert (cs2["ts"] == ["2024-01-01 00:00:00", "2024-01-01 05:30:00"]).all()
    assert (co2["ts"] == cs2["ts"]).all()


def test_all_midnight_timestamps_compare_consistently():
    # all-midnight on both sides → stripped symmetrically, still equal
    s = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    o = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    cs, co, problems = canonicalize_pair(s, o)
    assert problems == []
    pd.testing.assert_frame_equal(cs, co)


def test_subsecond_timestamps_compare_at_full_precision():
    # sub-second mismatch must FAIL the value compare, not truncate away
    s = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 05:30:00.123"])})
    o = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 05:30:00.456"])})
    cs, co, problems = canonicalize_pair(s, o)
    assert problems == []
    assert cs["ts"][0] != co["ts"][0]

    # equal sub-second values still compare equal
    s2 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 05:30:00.123"])})
    o2 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 05:30:00.123"])})
    cs2, co2, _ = canonicalize_pair(s2, o2)
    assert (cs2["ts"] == co2["ts"]).all()

    # whole-second pairs keep the round-trippable second-granular form
    s3 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 05:30:00"])})
    o3 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 05:30:00"])})
    cs3, co3, _ = canonicalize_pair(s3, o3)
    assert cs3["ts"][0] == "2024-01-01 05:30:00"
    assert (cs3["ts"] == co3["ts"]).all()
