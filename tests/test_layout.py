"""Z-order layout: Morton interleave spec, answer preservation, and
footer-level pruning on every clustered column."""

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.sources.layout import (
    zorder_column,
    zorder_stats,
    zorder_write,
)

N = 100_000


def _grid(spark, n=8):
    return spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )


def _ref_morton(a, b, hi=7, bits=8):
    """Pure-python reference: minmax cell then bit interleave."""
    cells = (1 << bits) - 1

    def cell(v):
        return min(cells, int(v / hi * (cells + 1)))

    z = 0
    for i in range(bits):
        z |= (cell(a) >> i & 1) << (2 * i)
        z |= (cell(b) >> i & 1) << (2 * i + 1)
    return z


def test_morton_interleave_matches_reference(spark):
    zdf, stats = zorder_column(_grid(spark), ["x", "y"], bits=8)
    rows = {(r["x"], r["y"]): r["__z"] for r in zdf.collect()}
    for x in range(8):
        for y in range(8):
            assert rows[(x, y)] == _ref_morton(x, y), (x, y)
    assert stats["x"] == {"min": 0.0, "max": 7.0}


def test_zorder_long_range_no_int_overflow(spark):
    """bits=16 x 3 columns pushes spread bytes past bit 31 — the
    interleave must stay in long arithmetic (regression guard for the
    int-typed element_at)."""
    df = spark.createDataFrame(
        [(65535, 65535, 65535), (0, 0, 0)], "a int, b int, c int"
    )
    zdf, _ = zorder_column(df, ["a", "b", "c"], bits=16)
    vals = sorted(r["__z"] for r in zdf.collect())
    assert vals[0] == 0 and vals[1] == (1 << 48) - 1  # all 48 bits set


def test_zorder_write_preserves_answers(spark, tmp_path):
    big = spark.range(N).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    zorder_write(big, str(tmp_path / "z"), ["x", "y"], target_files=16)
    back = spark.read.parquet(str(tmp_path / "z"))
    assert back.count() == N
    assert (
        back.agg(F.sum("x"), F.sum("y"), F.sum("payload")).first()
        == big.agg(F.sum("x"), F.sum("y"), F.sum("payload")).first()
    )
    # the helper column never reaches disk
    assert "__z" not in back.columns


def test_zorder_prunes_on_every_column_single_sort_does_not(spark, tmp_path):
    """THE layout claim: a single-column sort prunes its own column
    and nothing else; the z-order layout prunes meaningfully on BOTH —
    measured from the parquet footers, the same min/max decision a
    scan makes."""
    big = spark.range(N).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
    )
    zorder_write(big, str(tmp_path / "z"), ["x", "y"], target_files=32)
    (
        big.repartitionByRange(32, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(str(tmp_path / "xsort"))
    )
    pred = {"x": (100, 120), "y": (500, 520)}
    z = zorder_stats(str(tmp_path / "z"), pred)
    xs = zorder_stats(str(tmp_path / "xsort"), pred)
    # dedicated sort: excellent on x, useless on y
    assert xs["x"]["prunable"] >= xs["x"]["files"] - 3
    assert xs["y"]["prunable"] == 0
    # z-order: strong on BOTH (>= half the files prunable on each)
    for c in ("x", "y"):
        assert z[c]["prunable"] >= z[c]["files"] // 2, (c, z)


def test_zorder_quantile_mode_handles_skew(spark, tmp_path):
    """Cubed values put 99% of the minmax range in the top cells;
    quantile cells keep equal row mass, so pruning survives the skew."""
    skew = spark.range(N).select(
        F.pow(F.col("id") % 1000, 3).alias("x"),
        ((F.col("id") * 7919) % 1000).cast("double").alias("y"),
    )
    zorder_write(
        skew, str(tmp_path / "q"), ["x", "y"],
        target_files=16, bits=8, normalize="quantile",
    )
    # a range over the DENSE low end of x (90% of minmax range is
    # above 1000^3 * 0.1^3 = 1e6... predicate over the low mass)
    st = zorder_stats(str(tmp_path / "q"), {"x": (0.0, 1_000_000.0)})
    assert st["x"]["prunable"] > 0
    assert spark.read.parquet(str(tmp_path / "q")).count() == N


def test_zorder_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5, 1), (3, 5, 2), (7, 5, 3)], "x int, c int, id int"
    )
    # constant column: zero range -> every row cell 0; NULL -> cell 0,
    # which the column's MINIMUM value also scales to (min and NULL
    # share the first curve cell — both cluster at the low end)
    zdf, _ = zorder_column(df, ["x", "c"], bits=8)
    got = {r["id"]: r["__z"] for r in zdf.collect()}
    assert got[1] == 0  # NULL x, constant c
    assert got[2] == 0  # x == min scales to cell 0 as well
    assert got[3] > 0   # larger x => larger z (c constant)


def test_zorder_validation(spark):
    df = _grid(spark)
    with pytest.raises(ValueError, match="at least two"):
        zorder_column(df, ["x"])
    with pytest.raises(ValueError, match="63 usable"):
        zorder_column(df.withColumn("w", F.col("x")).withColumn(
            "v", F.col("y")), ["x", "y", "w", "v"], bits=16)
    with pytest.raises(ValueError, match="bits must be"):
        zorder_column(df, ["x", "y"], bits=2)
    with pytest.raises(ValueError, match="minmax"):
        zorder_column(df, ["x", "y"], normalize="rank")
    with pytest.raises(ValueError, match="bits <= 10"):
        zorder_column(df, ["x", "y"], bits=16, normalize="quantile")
    with pytest.raises(ValueError, match="__z already"):
        zorder_column(df.withColumn("__z", F.lit(1)), ["x", "y"])


# ---------------------------------------------------------------- #
# bucketed_write: the co-located-join lever                          #
# ---------------------------------------------------------------- #

def test_bucketed_join_has_zero_exchange(spark, tmp_path):
    """Both sides bucketed on the join key with the same count =>
    SortMergeJoin with NO Exchange anywhere in the plan; and the
    result equals the plain join exactly."""
    from fabstir_vectordb_spark.sources.layout import bucketed_write

    a = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("x")
    )
    b = spark.range(0, 4000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("y")
    )
    bucketed_write(a, "bt_a", ["k"], n_buckets=8,
                   path=str(tmp_path / "bt_a"))
    bucketed_write(b, "bt_b", ["k"], n_buckets=8,
                   path=str(tmp_path / "bt_b"))
    try:
        ta, tb = spark.table("bt_a"), spark.table("bt_b")
        joined = ta.hint("merge").join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        got = sorted((r["k"], r["x"], r["y"]) for r in joined.collect())
        want = sorted((r["k"], r["x"], r["y"])
                      for r in a.join(b, "k").collect())
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_bucketed_write_validation(spark, tmp_path):
    from fabstir_vectordb_spark.sources.layout import bucketed_write

    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="keys"):
        bucketed_write(df, "bt_x", [], path=str(tmp_path / "x"))
    with pytest.raises(ValueError, match="n_buckets"):
        bucketed_write(df, "bt_x", ["k"], n_buckets=0,
                       path=str(tmp_path / "x"))
