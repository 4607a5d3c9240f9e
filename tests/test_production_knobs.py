"""Production storage/observability knobs: compression codecs, corrupt-file
behavior, and in-flight metrics — the operational surface a 100 TB
deployment relies on beyond query correctness."""

from __future__ import annotations

import pathlib

from pyspark.sql import Observation, functions as F

from vectordbfaiss_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_parquet_zstd_roundtrip(spark, tmp_path):
    """Codec choice is per-write config; zstd output must read back
    losslessly and actually be zstd-compressed (checked in the footers —
    at 100 TB codec choice is a double-digit-percent storage/scan cost
    decision)."""
    import pyarrow.parquet as pq

    src = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "zstd")
    src.write.option("compression", "zstd").parquet(out)
    files = list(pathlib.Path(out).glob("*.parquet"))
    assert files
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        codecs = {
            md.row_group(rg).column(0).compression
            for rg in range(md.num_row_groups)
        }
        assert codecs == {"ZSTD"}, codecs
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    a = src.orderBy("o_orderkey").collect()
    b = back.orderBy("o_orderkey").collect()
    assert a == b


def test_corrupt_file_fails_loudly_then_skips_when_told(spark, tmp_path):
    """Default: a corrupt file in a table directory fails the scan (no
    silent data loss). With ignoreCorruptFiles the scan completes on the
    healthy files — the explicit trade a recovery runbook makes."""
    out = str(tmp_path / "tbl")
    load_table(spark, SF_DIR, "region").write.parquet(out)
    (pathlib.Path(out) / "part-corrupt.parquet").write_bytes(b"not a parquet")

    import pytest

    with pytest.raises(Exception):
        spark.read.parquet(out).count()

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        n = spark.read.parquet(out).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assert n == 5  # all healthy rows survive


def test_observation_metrics_piggyback_on_query(spark):
    """Observation metrics ride the job itself (no second scan) — how a
    production pipeline exports row counts / sums to monitoring without
    re-reading 100 TB."""
    li = load_table(spark, SF_DIR, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("l_quantity").alias("qty_sum"),
    )
    agg = observed.groupBy("l_returnflag").count()
    agg.collect()
    got = obs.get
    assert got["rows_seen"] == li.count()
    assert abs(got["qty_sum"] - li.agg(F.sum("l_quantity")).first()[0]) < 1e-6
