"""Profile operator edge cases the registry query can't hit (all-null and
empty inputs)."""

from __future__ import annotations

from vectordbfaiss_spark.operators.profile import profile


def test_profile_all_null_and_empty(spark):
    df = spark.createDataFrame(
        [(None, "a"), (None, None), (None, "b")], "x DOUBLE, s STRING"
    )
    rows = {r.col_name: r for r in profile(df, ["x"], ["s"]).collect()}
    assert rows["x"].n_rows == 3 and rows["x"].n_nulls == 3
    assert rows["x"].n_distinct == 0 and rows["x"].min_num is None
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_str == "a" and rows["s"].max_str == "b"

    empty = df.filter("x IS NOT NULL AND false")
    rows = {r.col_name: r for r in profile(empty, ["x"], ["s"]).collect()}
    assert rows["x"].n_rows == 0 and rows["x"].n_nulls == 0
