"""Z-order clustering: Morton-code unit tests, oracle differential for the
registered profile query, and the actual data-skipping property measured
from parquet footers — clustered layout must prune files on BOTH dimensions
where a one-column sort only prunes its own."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hadoop_jobanalyzer_spark.operators.zorder import (
    cluster_by_zorder,
    interleave_bits,
    quantize,
    zorder_key,
)
from hadoop_jobanalyzer_spark.plans.tables import load_tables


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for k in range(bits):
        out |= ((x >> k) & 1) << (2 * k)
        out |= ((y >> k) & 1) << (2 * k + 1)
    return out


def test_interleave_bits_known_values(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (170, 85)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], 8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"], 8), (r["x"], r["y"])


def test_interleave_bits_rejects_overflow(spark):
    with pytest.raises(ValueError, match="signed long"):
        interleave_bits([F.col("a"), F.col("b")], 32)


def test_quantize_bounds_and_monotone(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("v"))
    q = df.select(
        "v", quantize(F.col("v"), F.lit(0), F.lit(999), 4).alias("q")
    ).orderBy("v").collect()
    vals = [r["q"] for r in q]
    assert min(vals) == 0 and max(vals) == 15
    assert vals == sorted(vals)


def _file_ranges(path: str, col: str):
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _overlapping(ranges, lo, hi):
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def test_zorder_layout_skips_files_on_both_dims(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    n_files = 16
    zpath = str(tmp_path / "orders_z")
    spath = str(tmp_path / "orders_bykey")
    cluster_by_zorder(orders, ["o_custkey", "cents"], bits=16, num_files=n_files)\
        .write.parquet(zpath)
    # baseline: the common single-column layout (sorted by custkey only)
    orders.repartitionByRange(n_files, "o_custkey")\
        .sortWithinPartitions("o_custkey").write.parquet(spath)

    # row multiset is preserved by the re-layout
    a = spark.read.parquet(zpath).agg(
        F.count("*"), F.sum("o_orderkey"), F.sum("cents")
    ).collect()[0]
    b = orders.agg(F.count("*"), F.sum("o_orderkey"), F.sum("cents")).collect()[0]
    assert tuple(a) == tuple(b)

    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("cents"), F.max("cents")
    ).collect()[0]
    cl, ch, pl, ph = stats
    # ~12% slice in each dimension, kept inside one top-level curve
    # quadrant (25-50%) — a slice straddling the 50% boundary touches two
    # quadrant columns by construction, which is curve geometry, not a
    # layout defect
    c_lo, c_hi = cl + (ch - cl) * 30 // 100, cl + (ch - cl) * 42 // 100
    p_lo, p_hi = pl + (ph - pl) * 30 // 100, pl + (ph - pl) * 42 // 100

    z_cust = _overlapping(_file_ranges(zpath, "o_custkey"), c_lo, c_hi)
    z_cents = _overlapping(_file_ranges(zpath, "cents"), p_lo, p_hi)
    s_cust = _overlapping(_file_ranges(spath, "o_custkey"), c_lo, c_hi)
    s_cents = _overlapping(_file_ranges(spath, "cents"), p_lo, p_hi)

    # single-column sort: perfect on its own column, useless on the other
    assert s_cust <= 3
    assert s_cents == n_files
    # z-order: must skip files on BOTH dimensions
    assert z_cust <= n_files // 2, f"custkey pruning too weak: {z_cust}/{n_files}"
    assert z_cents <= n_files // 2, f"cents pruning too weak: {z_cents}/{n_files}"


def test_zorder_key_is_deterministic(spark, sf_dir):
    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    a = zorder_key(orders, ["o_custkey", "cents"], bits=8)
    got = {r["o_orderkey"]: r["_zvalue"] for r in a.collect()}
    again = {r["o_orderkey"]: r["_zvalue"] for r in a.collect()}
    assert got == again and len(got) > 0
