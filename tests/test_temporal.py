"""Temporal joins (operators/temporal.py): as-of semantics (latest
right <= left, inclusive boundary, tolerance, no-match NULLs,
deterministic ties) and bucketed range-join exactness across bucket
boundaries."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def test_asof_basic_latest_and_boundary(spark):
    left = spark.createDataFrame(
        [(0, _ts(10), 7), (1, _ts(4), 7), (2, _ts(100), 8), (3, _ts(1), 9)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(4), 7, 1.0),   # equal ts -> inclusive match for left 1
            (101, _ts(9), 7, 2.0),   # latest <= 10 for left 0
            (102, _ts(11), 7, 3.0),  # in the future of both
            (103, _ts(50), 8, 4.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {
        r["event_id"]: (r["value_r"], r["ts_r"])
        for r in asof_join(
            left, right, on="user_id", value_cols=["value"],
            right_order_col="event_id",
        ).collect()
    }
    assert got[0] == (2.0, _ts(9))
    assert got[1] == (1.0, _ts(4))    # boundary ts==ts matches
    assert got[2] == (4.0, _ts(50))
    assert got[3] == (None, None)     # user 9: no right rows at all


def test_asof_tolerance_and_tie_break(spark):
    left = spark.createDataFrame(
        [(0, _ts(1000), 1), (1, _ts(20), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(10, _ts(15), 1, 1.0), (11, _ts(15), 1, 2.0)],  # duplicate ts
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {
        r["event_id"]: r["value_r"]
        for r in asof_join(
            left, right, on="user_id", value_cols=["value"],
            tolerance_seconds=60, right_order_col="event_id",
        ).collect()
    }
    assert got[1] == 2.0      # largest right_order_col wins the tie
    assert got[0] is None     # match exists but is 985s old > 60s tolerance


def test_asof_struct_keeps_right_row_atomic(spark):
    """A NULL in one right value column must not splice columns from
    different right rows (the per-column last() trap the struct
    payload exists to prevent)."""
    left = spark.createDataFrame(
        [(0, _ts(30), 1)], "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [(10, _ts(10), 1, 1.0, "a"), (11, _ts(20), 1, None, "b")],
        "event_id long, ts timestamp, user_id long, value double, tag string",
    )
    row = asof_join(
        left, right, on="user_id", value_cols=["value", "tag"],
        right_order_col="event_id",
    ).first()
    # the matched row is event 11 wholesale: NULL value AND tag 'b' —
    # never (1.0, 'b') spliced across rows
    assert row["value_r"] is None and row["tag_r"] == "b"


def test_range_join_across_bucket_boundaries(spark):
    points = spark.createDataFrame(
        [(0, _ts(5), 1), (1, _ts(3599), 1), (2, _ts(7200), 1), (3, _ts(50), 2)],
        "event_id long, ts timestamp, user_id long",
    )
    intervals = spark.createDataFrame(
        [
            ("s1", _ts(0), _ts(4000), 1),      # spans a 3600s bucket edge
            ("s2", _ts(7000), _ts(8000), 1),
            ("s3", _ts(100), _ts(200), 2),     # point 3 is OUTSIDE
        ],
        "iv_id string, start timestamp, end timestamp, user_id long",
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in range_join(
            points, intervals, on="user_id", bucket_seconds=3600
        ).collect()
    )
    assert got == [(0, "s1"), (1, "s1"), (2, "s2")]
    # exactness is bucket-size independent
    tiny = sorted(
        (r["event_id"], r["iv_id"])
        for r in range_join(
            points, intervals, on="user_id", bucket_seconds=7
        ).collect()
    )
    assert tiny == got


def test_range_join_reproduces_session_assignment(spark, events):
    """Self-consistency at fixture scale: range-joining events into
    their own sessions' [min ts, max ts] intervals must reproduce the
    sessionize() assignment exactly (same-user sessions are disjoint)."""
    from fabstir_vectordb_spark.operators.stats import sessionize

    ev = events.limit(2000)
    s = sessionize(ev, gap_seconds=3600)
    bounds = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("start"), F.max("ts").alias("end")
    )
    rj = range_join(
        ev, bounds, on="user_id", bucket_seconds=3600
    ).select("event_id", F.col("session_id").alias("rj_session"))
    diff = (
        s.select("event_id", "session_id")
        .join(rj, "event_id", "full")
        .filter(
            F.col("session_id").isNull()
            | F.col("rj_session").isNull()
            | (F.col("session_id") != F.col("rj_session"))
        )
        .count()
    )
    assert diff == 0


def test_asof_default_tie_break_is_deterministic(spark):
    """Without right_order_col, colliding (key, ts) right rows fall back
    to an xxhash64-of-payload tie-break: arbitrary which row wins, but
    STABLE — the same winner regardless of input row order or
    partitioning, and the winner's payload arrives intact (never a
    splice of the colliding rows)."""
    left = spark.createDataFrame(
        [(0, _ts(30), 1)], "event_id long, ts timestamp, user_id long"
    )
    rows = [
        (10, _ts(15), 1, 1.0, "a"),
        (11, _ts(15), 1, 2.0, "b"),
        (12, _ts(15), 1, 3.0, "c"),
    ]
    schema = "event_id long, ts timestamp, user_id long, value double, tag string"

    def run(rws, parts):
        right = spark.createDataFrame(rws, schema).repartition(parts)
        return asof_join(
            left, right, on="user_id", value_cols=["event_id", "value", "tag"]
        ).first()

    first = run(rows, 1)
    assert (first["event_id_r"], first["value_r"], first["tag_r"]) in {
        (10, 1.0, "a"), (11, 2.0, "b"), (12, 3.0, "c")
    }
    for rws, parts in [(rows[::-1], 1), (rows, 4), (rows[::-1], 7)]:
        again = run(rws, parts)
        assert (again["event_id_r"], again["value_r"], again["tag_r"]) == (
            first["event_id_r"], first["value_r"], first["tag_r"]
        )


def test_range_join_drops_inverted_intervals_before_explode(spark):
    """end < start is unsatisfiable (no point can be contained), and
    pre-filtering it also prevents Spark's sequence() from generating a
    DESCENDING bucket list (default step -1), which would replicate an
    inverted year-long interval into ~thousands of garbage bucket rows
    that only the containment filter pays to discard."""
    points = spark.createDataFrame(
        [(0, _ts(5), 1)], "event_id long, ts timestamp, user_id long"
    )
    intervals = spark.createDataFrame(
        [
            ("ok", _ts(0), _ts(10), 1),
            # inverted AND spanning ~10k hourly buckets if exploded
            ("bad", _ts(40_000_000), _ts(0), 1),
        ],
        "iv_id string, start timestamp, end timestamp, user_id long",
    )
    got = [
        (r["event_id"], r["iv_id"])
        for r in range_join(
            points, intervals, on="user_id", bucket_seconds=3600
        ).collect()
    ]
    assert got == [(0, "ok")]


def test_asof_hot_key_matches_inequality_join(spark):
    """Degenerate skew: ONE key holding the entire timeline (the case
    the docstring names as the serialization boundary).  Correctness
    must hold even though the window runs in a single task — checked
    against the naive inequality-join formulation at a size where
    O(L x R) is still affordable."""
    n = 800
    left = spark.createDataFrame(
        [(i, _ts(3 * i + 1), 1) for i in range(n)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(1000 + i, _ts(5 * i), 1, float(i)) for i in range(n)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = asof_join(
        left, right, on="user_id", value_cols=["value"],
        right_order_col="event_id",
    ).select("event_id", "value_r")
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") <= F.col("l.ts")),
            "left",
        )
        .groupBy(F.col("l.event_id").alias("event_id"))
        .agg(F.max_by("r.value", F.struct("r.ts", "r.event_id")).alias("value_r"))
    )
    diff = (
        got.join(naive, "event_id", "full")
        .filter(
            ~(
                (got["value_r"].isNull() & naive["value_r"].isNull())
                | (got["value_r"] == naive["value_r"])
            )
        )
        .count()
    )
    assert diff == 0


def test_interval_join_overlap_matrix(spark):
    """Every overlap relation (partial both ways, containment, touching
    endpoints, disjoint) against the closed-interval spec; bucket size
    must never change the answer; inverted intervals drop."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.temporal import interval_join

    T0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return T0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [
            ("a1", 1, ts(0), ts(100)),
            ("a2", 1, ts(200), ts(300)),
            ("a3", 1, ts(500), ts(400)),   # inverted: dropped
            ("a4", 2, ts(0), ts(100)),     # other key
        ],
        "lid string, user_id long, start timestamp, end timestamp",
    )
    right = spark.createDataFrame(
        [
            ("b1", 1, ts(50), ts(150)),    # partial overlap with a1
            ("b2", 1, ts(100), ts(250)),   # touches a1 at 100; overlaps a2
            ("b3", 1, ts(301), ts(350)),   # disjoint from everything
            ("b4", 1, ts(10), ts(20)),     # contained in a1
            ("b5", 2, ts(90), ts(600)),    # overlaps a4 only (key 2)
        ],
        "rid string, user_id long, rstart timestamp, rend timestamp",
    )
    want = sorted(
        [("a1", "b1"), ("a1", "b2"), ("a1", "b4"),
         ("a2", "b2"), ("a4", "b5")]
    )
    for bucket in (7, 60, 3600, None):  # None = tune_overlap_bucket
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, on="user_id", bucket_seconds=bucket
            ).collect()
        )
        assert got == want, f"bucket={bucket}"


def test_interval_join_matches_plain_inequality_join(spark):
    """Fixture-scale oracle: the bucketed overlap join must equal
    Spark's own plain inequality join (correct by construction) on
    derived day-span x shifted-week-span intervals — including the
    duplicate-free guarantee (one row per overlapping pair)."""
    from pyspark.sql import functions as F

    from fabstir_vectordb_spark.operators.temporal import interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    day = ev.groupBy(
        "user_id", F.floor(us / 86_400_000_000).cast("long").alias("d")
    ).agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
    week = ev.groupBy(
        "user_id",
        F.floor((us + 302_400_000_000) / 604_800_000_000)
        .cast("long")
        .alias("w"),
    ).agg(F.min("ts").alias("rstart"), F.max("ts").alias("rend"))
    got = sorted(
        (r["user_id"], r["d"], r["w"])
        for r in interval_join(day, week, on="user_id").collect()
    )
    plain = sorted(
        (r["user_id"], r["d"], r["w"])
        for r in day.alias("a")
        .join(
            week.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.start") <= F.col("b.rend"))
            & (F.col("b.rstart") <= F.col("a.end")),
        )
        .select("a.user_id", "d", "w")
        .collect()
    )
    assert got == plain and got
    assert len(got) == len(set(got))  # duplicate-free by construction


def test_multikey_range_and_interval_join_match_plain(spark):
    """Multi-key on= (VERDICT r8 'What's missing' #4 / 'Next round' #5):
    range_join and interval_join keyed (user_id, day) must equal the
    plain inequality join with BOTH equalities — a single-key join
    would pair across days."""
    from pyspark.sql import functions as F

    from fabstir_vectordb_spark.operators.temporal import (
        interval_join,
        range_join,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.select(
        "event_id", "user_id", "ts",
        F.floor(us / 86_400_000_000).cast("long").alias("day"),
    )
    # per-(user, day, session-third) intervals: several per key-pair
    ivs = ev.groupBy(
        "user_id",
        F.floor(us / 86_400_000_000).cast("long").alias("day"),
        (F.col("event_id") % 3).alias("third"),
    ).agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
    got = sorted(
        (r["event_id"], r["third"])
        for r in range_join(
            pts, ivs, on=["user_id", "day"], bucket_seconds=3600
        ).collect()
    )
    plain = sorted(
        (r["event_id"], r["third"])
        for r in pts.alias("p")
        .join(
            ivs.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.day") == F.col("i.day"))
            & (F.col("p.ts") >= F.col("i.start"))
            & (F.col("p.ts") <= F.col("i.end")),
        )
        .select("p.event_id", "i.third")
        .collect()
    )
    assert got == plain and got

    # interval overlap keyed (user_id, day): thirds x halves of each day
    halves = ev.groupBy(
        "user_id",
        F.floor(us / 86_400_000_000).cast("long").alias("day"),
        (F.col("event_id") % 2).alias("half"),
    ).agg(F.min("ts").alias("rstart"), F.max("ts").alias("rend"))
    got_iv = sorted(
        (r["user_id"], r["day"], r["third"], r["half"])
        for r in interval_join(
            ivs, halves, on=["user_id", "day"]
        ).collect()
    )
    plain_iv = sorted(
        (r["user_id"], r["day"], r["third"], r["half"])
        for r in ivs.alias("a")
        .join(
            halves.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.start") <= F.col("b.rend"))
            & (F.col("b.rstart") <= F.col("a.end")),
        )
        .select("a.user_id", "a.day", "third", "half")
        .collect()
    )
    assert got_iv == plain_iv and got_iv
    assert len(got_iv) == len(set(got_iv))  # duplicate-free


def test_interval_join_rejects_shared_columns(spark):
    import pytest as _pytest

    from fabstir_vectordb_spark.operators.temporal import interval_join

    df = spark.range(1).select(
        F.col("id").alias("user_id"),
        F.current_timestamp().alias("start"),
        F.current_timestamp().alias("end"),
    )
    with _pytest.raises(ValueError, match="distinct column names"):
        interval_join(df, df, on="user_id")


def test_clamp_intervals_caps_and_screens(spark):
    from fabstir_vectordb_spark.operators.temporal import clamp_intervals

    df = spark.createDataFrame(
        [("short", _ts(0), _ts(100)), ("long", _ts(0), _ts(10_000))],
        "iv string, start timestamp, end timestamp",
    )
    got = {
        r["iv"]: r["end"]
        for r in clamp_intervals(df, max_seconds=500).collect()
    }
    assert got == {"short": _ts(100), "long": _ts(500)}


def test_clamp_intervals_int_dtype_near_max_does_not_wrap(spark):
    """start + max_seconds on an int-typed epoch column near INT_MAX
    must not wrap negative (which would invert the interval and get it
    silently DROPPED by the joins instead of capped) — the arithmetic
    happens in long and only the <=end result casts back (r9 review)."""
    from fabstir_vectordb_spark.operators.temporal import clamp_intervals

    df = spark.createDataFrame(
        [(2_147_450_000, 2_147_483_000), (2_147_000_000, 2_147_483_000)],
        "start int, end int",
    )
    got = sorted(
        (r["start"], r["end"])
        for r in clamp_intervals(df, max_seconds=86_400).collect()
    )
    # row 1: start+86400 overflows INT_MAX in int32 — in long it simply
    # exceeds end, so end stays; row 2: genuine cap at start+86400
    assert got == [
        (2_147_000_000, 2_147_000_000 + 86_400),
        (2_147_450_000, 2_147_483_000),
    ]
    assert clamp_intervals(df, max_seconds=86_400).dtypes[1][1] == "int"


def test_split_intervals_resplit_raises(spark):
    """Re-splitting an already-split frame would emit duplicate
    orig_* column names (AMBIGUOUS_REFERENCE downstream) — raise with
    the remedy instead (r9 review)."""
    import pytest as _pytest

    from fabstir_vectordb_spark.operators.temporal import split_intervals

    df = spark.createDataFrame([(0, 100)], "start long, end long")
    tiled = split_intervals(df, tile_seconds=10)
    assert tiled.count() == 11
    with _pytest.raises(ValueError, match="orig_prefix"):
        split_intervals(tiled, tile_seconds=5)


# ---------------------------------------------------------------- #
# validity_intervals: change log -> SCD2 dimension                   #
# ---------------------------------------------------------------- #

def test_validity_intervals_basic_and_lookup(spark):
    """Change log -> closed intervals; range_join over them picks the
    version in effect; the open row needs a horizon to be joinable."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.temporal import (
        range_join, validity_intervals,
    )

    T = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    changes = spark.createDataFrame(
        [(1, T(0), "v1"), (1, T(100), "v2"), (2, T(50), "w1")],
        "k long, ts timestamp, ver string",
    )
    dim = validity_intervals(changes, "k", horizon=T(10_000))
    rows = {(r["k"], r["ver"]): (r["start"], r["end"])
            for r in dim.collect()}
    assert rows[(1, "v1")] == (T(0), T(100) - dt.timedelta(microseconds=1))
    assert rows[(1, "v2")] == (T(100), T(10_000))
    assert rows[(2, "w1")] == (T(50), T(10_000))
    # lookup: points at 99s and 100s straddle the v1/v2 boundary
    pts = spark.createDataFrame(
        [(1, T(99)), (1, T(100)), (2, T(49))],
        "k long, pts timestamp",
    )
    looked = range_join(
        pts, dim.drop("ts"), "k", ts_col="pts", bucket_seconds=60,
    )
    got = {(r["k"], r["pts"]): r["ver"] for r in looked.collect()}
    assert got == {(1, T(99)): "v1", (1, T(100)): "v2"}
    # without a horizon the open rows carry NULL end and the joins
    # drop them by the malformed-interval contract
    no_h = validity_intervals(changes, "k")
    assert no_h.filter(F.col("end").isNull()).count() == 2


def test_validity_intervals_ties_and_numeric_epoch(spark):
    """Same-instant writes: the largest order_col wins the real
    interval, superseded rows get inverted spans the joins drop; raw
    integer mode end = next - 1 raw unit."""
    from fabstir_vectordb_spark.operators.temporal import (
        range_join, validity_intervals,
    )

    changes = spark.createDataFrame(
        [(1, 100, 1, "a"), (1, 100, 2, "b"), (1, 200, 3, "c")],
        "k long, tsu long, seq int, ver string",
    )
    dim = validity_intervals(
        changes, "k", ts_col="tsu", order_col="seq", horizon=10_000
    )
    rows = {r["ver"]: (r["start"], r["end"]) for r in dim.collect()}
    assert rows["b"] == (100, 199)       # tie winner
    assert rows["c"] == (200, 10_000)
    s, e = rows["a"]
    assert e < s                          # superseded: inverted span
    assert dim.count() == 3               # auditable: nothing silently lost
    pts = spark.createDataFrame([(1, 150)], "k long, p long")
    got = range_join(pts, dim.drop("tsu"), "k", ts_col="p",
                     bucket_seconds=100).collect()
    assert [r["ver"] for r in got] == ["b"]


def test_validity_lookup_equals_asof(spark):
    """The composition identity: range_join over validity_intervals
    (horizon past every point) == asof_join(points, changes) — the
    SCD2 lookup IS the backward as-of, derived two independent ways."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.temporal import (
        asof_join, range_join, validity_intervals,
    )

    import random
    rnd = random.Random(7)
    T = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    changes = spark.createDataFrame(
        [(k, T(rnd.randrange(0, 5000)), f"v{i}")
         for i, k in enumerate(rnd.choices(range(5), k=40))],
        "k long, ts timestamp, ver string",
    ).dropDuplicates(["k", "ts"])
    pts = spark.createDataFrame(
        [(k, T(rnd.randrange(0, 6000)))
         for k in rnd.choices(range(6), k=60)],
        "k long, pts timestamp",
    )
    dim = validity_intervals(changes, "k", horizon=T(10_000))
    via_range = {
        (r["k"], r["pts"]): r["ver"]
        for r in range_join(pts, dim.drop("ts"), "k", ts_col="pts",
                            bucket_seconds=600).collect()
    }
    via_asof = {
        (r["k"], r["pts"]): r["ver_r"]
        for r in asof_join(pts, changes, "k", ts_col="pts",
                           right_ts_col="ts").collect()
        if r["ver_r"] is not None
    }
    assert via_range == via_asof


def test_validity_intervals_validation(spark):
    import pytest

    from fabstir_vectordb_spark.operators.temporal import validity_intervals

    df = spark.createDataFrame([(1, 100, 5)], "k long, tsu long, start int")
    with pytest.raises(ValueError, match="already exist"):
        validity_intervals(df, "k", ts_col="tsu")
    df2 = spark.createDataFrame([(1, 100)], "k long, tsu long")
    with pytest.raises(ValueError, match="raw integer"):
        validity_intervals(df2, "k", ts_col="tsu", horizon="2024-01-01")


def test_validity_horizon_string_uses_session_timezone(spark):
    """A string horizon must convert through the engine's own
    cast-to-timestamp (session timezone), matching the data path —
    a pandas UTC parse would shift the open end by the session offset
    in non-UTC sessions (r9 advice)."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.temporal import (
        validity_intervals,
    )

    changes = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "v1")],
        "k long, ts timestamp, ver string",
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        dim = validity_intervals(changes, "k", horizon="2030-01-01")
        want = spark.createDataFrame([("2030-01-01",)], "h string").select(
            F.col("h").cast("timestamp").alias("h")
        ).collect()[0]["h"]
        got = dim.collect()[0]["end"]
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_validity_intervals_bad_horizon_raises(spark):
    """A horizon string that does not cast to a timestamp must raise
    up front — in non-ANSI sessions the cast yields NULL, which would
    silently degrade the last interval per key to open-ended (NULL
    valid_to) instead of the declared horizon."""
    from fabstir_vectordb_spark.operators.temporal import (
        validity_intervals,
    )

    changes = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a")],
        "k long, ts timestamp, val string",
    )
    with pytest.raises(ValueError, match="does not cast"):
        validity_intervals(changes, "k", horizon="not-a-timestamp")
