"""Funnel analysis: the one-exchange fold plan must reproduce a
pure-Python reference of the first-touch chain spec — t1 = earliest
step-1 event, t_i = earliest step-i event at-or-after t_{i-1}, every
match inside the t1-anchored window — for ANY small event set,
including timestamp ties, events matching several steps, and keys
missing early steps."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.funnel import funnel, funnel_summary

T0 = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=int(seconds))


def _reference(rows, n_steps, window, strict=False):
    """{key: [t1, t2, ...]} by the first-touch chain spec; rows are
    (key, sec, step_set)."""
    out = {}
    for key in {r[0] for r in rows if r[2]}:
        evs = sorted(
            (sec, step)
            for k, sec, steps in rows
            if k == key
            for step in steps
        )
        chain = []
        for sec, step in evs:
            if step != len(chain) + 1:
                continue
            if chain and (sec <= chain[-1] if strict else sec < chain[-1]):
                continue
            if window is not None and chain and sec > chain[0] + window:
                continue
            chain.append(sec)
        out[key] = chain
    return out


_key = st.integers(min_value=0, max_value=2)
_sec = st.integers(min_value=0, max_value=40)
_steps = st.sets(st.integers(min_value=1, max_value=3), max_size=3)
_rows = st.lists(st.tuples(_key, _sec, _steps), min_size=1, max_size=14)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, window=st.one_of(st.none(), st.integers(5, 30)),
       strict=st.booleans())
def test_funnel_matches_reference(spark, rows, window, strict):
    df = spark.createDataFrame(
        [(k, _ts(sec), bool(s & {1}), bool(s & {2}), bool(s & {3}))
         for k, sec, s in rows],
        "k long, ts timestamp, p1 boolean, p2 boolean, p3 boolean",
    )
    got = {
        r["k"]: [t for t in (r["t1"], r["t2"], r["t3"]) if t is not None]
        for r in funnel(
            df, "k", [F.col("p1"), F.col("p2"), F.col("p3")],
            window_seconds=window, strict_increase=strict,
        ).collect()
    }
    want = {
        k: [int(T0.replace(tzinfo=dt.timezone.utc).timestamp() + s) * 1_000_000
            for s in chain]
        for k, chain in _reference(rows, 3, window, strict).items()
    }
    assert got == want


def test_funnel_basics_and_summary(spark):
    rows = [
        (1, _ts(0), "search"), (1, _ts(10), "click"), (1, _ts(20), "buy"),
        (2, _ts(0), "click"), (2, _ts(30), "search"),
        (3, _ts(0), "search"), (3, _ts(60), "click"),
        (4, _ts(5), "buy"),
        (5, _ts(0), "view"),  # no funnel activity at all -> absent
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    steps = [F.col("et") == "search", F.col("et") == "click",
             F.col("et") == "buy"]
    r = funnel(df, "user_id", steps, window_seconds=50)
    by_user = {x["user_id"]: x["depth"] for x in r.collect()}
    assert by_user == {1: 3, 2: 1, 3: 1, 4: 0}
    # the window is what cut user 3; unbounded reaches depth 2
    r2 = funnel(df, "user_id", steps)
    assert {x["user_id"]: x["depth"] for x in r2.collect()}[3] == 2
    summ = {x["step"]: (x["reached"], x["conversion"])
            for x in funnel_summary(r, 3).collect()}
    assert summ[1] == (3, 0.75)          # 3 of 4 active users searched
    assert summ[2] == (1, pytest.approx(1 / 3))
    assert summ[3] == (1, 1.0)


def test_funnel_strict_increase_breaks_ties(spark):
    """The tie fixture: one user fires all three steps at the SAME
    instant — non-strict chains to depth 3, strict stops at depth 1
    (ClickHouse strict_increase semantics)."""
    rows = [(1, _ts(0), "a"), (1, _ts(0), "b"), (1, _ts(0), "c"),
            (2, _ts(0), "a"), (2, _ts(1), "b"), (2, _ts(2), "c")]
    df = spark.createDataFrame(rows, "k long, ts timestamp, et string")
    steps = [F.col("et") == "a", F.col("et") == "b", F.col("et") == "c"]
    lax = {r["k"]: r["depth"] for r in funnel(df, "k", steps).collect()}
    strict = {r["k"]: r["depth"]
              for r in funnel(df, "k", steps,
                              strict_increase=True).collect()}
    assert lax == {1: 3, 2: 3}
    assert strict == {1: 1, 2: 3}


def test_funnel_null_ts_dropped_and_numeric_epoch(spark):
    df = spark.createDataFrame(
        [(1, 100, "a"), (1, None, "b"), (1, 200, "b")],
        "k long, tsec int, et string",
    )
    r = funnel(
        df, "k", [F.col("et") == "a", F.col("et") == "b"],
        ts_col="tsec", window_seconds=150,
    ).collect()
    # raw units: t columns come back as the raw integers, the NULL-ts
    # 'b' row is dropped, and window_seconds reads in the raw unit
    assert [(x["depth"], x["t1"], x["t2"]) for x in r] == [(2, 100, 200)]


def test_funnel_multikey_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "x", _ts(0), "a"), (1, "y", _ts(0), "b"), (1, "x", _ts(5), "b")],
        "k long, g string, ts timestamp, et string",
    )
    steps = [F.col("et") == "a", F.col("et") == "b"]
    r = {(x["k"], x["g"]): x["depth"]
         for x in funnel(df, ["k", "g"], steps).collect()}
    assert r == {(1, "x"): 2, (1, "y"): 0}
    with pytest.raises(ValueError, match="2..8 steps"):
        funnel(df, "k", [F.col("et") == "a"])
    with pytest.raises(ValueError, match="window_seconds"):
        funnel(df, "k", steps, window_seconds=0)
    with pytest.raises(ValueError, match="collide"):
        funnel(df.withColumnRenamed("g", "depth"), ["k", "depth"], steps)
    with pytest.raises(ValueError, match="reserved"):
        funnel(df.withColumnRenamed("g", "__g"), ["k", "__g"], steps)


def test_funnel_plan_single_exchange_no_udf(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "a")], "k long, ts timestamp, et string"
    )
    plan = funnel(
        df, "k", [F.col("et") == "a", F.col("et") == "b"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- #
# retention: cohort triangles                                        #
# ---------------------------------------------------------------- #

def test_retention_matches_manual(spark):
    from fabstir_vectordb_spark.operators.funnel import retention

    # periods of 10s; users first-seen in different periods
    rows = [
        (1, 0), (1, 5), (1, 12), (1, 31),      # cohort 0: active 0,1,3
        (2, 3), (2, 25),                        # cohort 0: active 0,2
        (3, 11), (3, 22),                       # cohort 1: active 1,2
        (4, 14),                                # cohort 1: active 1
    ]
    df = spark.createDataFrame(
        [(k, _ts(s)) for k, s in rows], "u long, ts timestamp"
    )
    got = {
        (r["cohort"], r["offset"]):
            (r["n_active"], r["n_cohort"], r["retention"])
        for r in retention(df, "u", period_seconds=10).collect()
    }
    base = int(_ts(0).replace(tzinfo=__import__("datetime").timezone.utc)
               .timestamp() * 1_000_000) // 10_000_000
    want = {
        (base + 0, 0): (2, 2, 1.0), (base + 0, 1): (1, 2, 0.5),
        (base + 0, 2): (1, 2, 0.5), (base + 0, 3): (1, 2, 0.5),
        (base + 1, 0): (2, 2, 1.0), (base + 1, 1): (1, 2, 0.5),
    }
    assert got == want


def test_retention_numeric_epoch_and_caps(spark):
    from fabstir_vectordb_spark.operators.funnel import retention

    df = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 990), (2, 5), (2, None)],
        "u long, tsu long",
    )
    got = {
        (r["cohort"], r["offset"]): r["n_active"]
        for r in retention(df, "u", ts_col="tsu", period_seconds=100,
                           max_periods=5).collect()
    }
    # raw units; user 1's 990 event is offset 9 > max_periods, dropped;
    # user 2's NULL ts dropped
    assert got == {(0, 0): 2, (0, 1): 1}
    import pytest as _pt
    with _pt.raises(ValueError, match="period_seconds"):
        retention(df, "u", ts_col="tsu", period_seconds=0)
    with _pt.raises(ValueError, match="collide"):
        retention(df.withColumnRenamed("u", "cohort"), "cohort",
                  ts_col="tsu")


def test_retention_plan_two_exchanges(spark):
    from fabstir_vectordb_spark.operators.funnel import retention

    df = spark.createDataFrame([(1, _ts(0))], "u long, ts timestamp")
    plan = retention(df, "u")._jdf.queryExecution().executedPlan().toString()
    # distinct(key, period) + final (cohort, offset) agg; the cohort
    # window and n_cohort window reuse existing partitionings
    assert plan.count("Exchange") <= 3
    assert "BatchEvalPython" not in plan


def test_sessionized_funnel_composition(spark):
    """The composition pattern: sessionize first, then funnel keyed
    (user, session) — each session runs its own first-touch chain, so
    a step sequence split across two sessions does NOT convert while
    the same sequence inside one session does."""
    from fabstir_vectordb_spark.operators.stats import sessionize

    rows = [
        # user 1: search+buy in ONE session (gap < 60s)
        (1, 1, _ts(0), "search"), (2, 1, _ts(30), "buy"),
        # user 2: search, then a >60s gap, buy lands in a NEW session
        (3, 2, _ts(0), "search"), (4, 2, _ts(200), "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, et string"
    )
    sess = sessionize(df, gap_seconds=60)
    steps = [F.col("et") == "search", F.col("et") == "buy"]
    per_session = funnel(sess, ["user_id", "session_id"], steps)
    depth_by_user = {}
    for r in per_session.collect():
        depth_by_user[r["user_id"]] = max(
            depth_by_user.get(r["user_id"], 0), r["depth"]
        )
    assert depth_by_user == {1: 2, 2: 1}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, window=st.one_of(st.none(), st.integers(5, 30)),
       strict=st.booleans(), chunk=st.sampled_from([1, 3, 7, 100]))
def test_funnel_chunked_equals_plain(spark, rows, window, strict, chunk):
    """chunk_seconds (r10, the hot-key escape hatch): pre-fold per
    (key, time-chunk) + stitch must equal the plain single-task fold
    for ANY chunk width, window, tie pattern, and strictness —
    numeric-epoch mode so chunk boundaries land exactly on the
    generated second values (tie storms included)."""
    df = spark.createDataFrame(
        [(k, sec, bool(s & {1}), bool(s & {2}), bool(s & {3}))
         for k, sec, s in rows],
        "k long, ts long, p1 boolean, p2 boolean, p3 boolean",
    )
    steps = [F.col("p1"), F.col("p2"), F.col("p3")]
    plain = {
        r["k"]: (r["depth"], r["t1"], r["t2"], r["t3"])
        for r in funnel(
            df, "k", steps, window_seconds=window, strict_increase=strict,
        ).collect()
    }
    chunked = {
        r["k"]: (r["depth"], r["t1"], r["t2"], r["t3"])
        for r in funnel(
            df, "k", steps, window_seconds=window, strict_increase=strict,
            chunk_seconds=chunk,
        ).collect()
    }
    assert chunked == plain


def test_funnel_chunked_timestamp_mode_and_validation(spark):
    """Timestamp-typed path through chunk_seconds + the positivity
    check; a chain spanning three chunks stitches across boundaries."""
    df = spark.createDataFrame(
        [(1, _ts(2), True, False, False),
         (1, _ts(70), False, True, False),
         (1, _ts(140), False, False, True),
         (2, _ts(5), True, True, True)],
        "k long, ts timestamp, p1 boolean, p2 boolean, p3 boolean",
    )
    steps = [F.col("p1"), F.col("p2"), F.col("p3")]
    got = {
        r["k"]: r["depth"]
        for r in funnel(df, "k", steps, chunk_seconds=60).collect()
    }
    assert got == {1: 3, 2: 3}
    # window cap applied at stitch time across chunks
    capped = {
        r["k"]: r["depth"]
        for r in funnel(
            df, "k", steps, window_seconds=100, chunk_seconds=60
        ).collect()
    }
    assert capped == {1: 2, 2: 3}
    with pytest.raises(ValueError, match="chunk_seconds"):
        funnel(df, "k", steps, chunk_seconds=0)


def test_funnel_from_chunks_roundtrip_and_validation(spark):
    """funnel_from_chunks over a persisted chunk frame (the streaming
    sink shape) reproduces funnel(chunk_seconds=...); n_steps is
    validated."""
    from fabstir_vectordb_spark.operators.funnel import (
        funnel, funnel_from_chunks,
    )
    from fabstir_vectordb_spark.streaming.ingest import (
        funnel_chunks_stream,
    )

    df = spark.createDataFrame(
        [(1, _ts(5), True, False), (1, _ts(100), False, True),
         (2, _ts(10), True, True)],
        "k long, ts timestamp, p1 boolean, p2 boolean",
    )
    steps = [F.col("p1"), F.col("p2")]
    # build the chunk frame BATCH-side with the SAME shared helpers
    # the stream uses (schema parity: chunk/sufs naming)
    from fabstir_vectordb_spark.operators.funnel import (
        _step_tags, _suffixes_expr, _timeline_expr,
    )

    slim = df.select(
        "k", F.unix_micros("ts").alias("__tsu"),
        F.explode(_step_tags(steps)).alias("__step"),
    )
    chunks = (
        slim.withColumn("chunk", F.floor(F.col("__tsu") / 60_000_000))
        .groupBy("k", "chunk")
        .agg(_suffixes_expr(_timeline_expr(), 2, False).alias("sufs"))
    )
    got = {
        (r["k"], r["depth"], r["t1"], r["t2"])
        for r in funnel_from_chunks(chunks, "k", 2).collect()
    }
    want = {
        (r["k"], r["depth"], r["t1"], r["t2"])
        for r in funnel(df, "k", steps, chunk_seconds=60).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="2..8"):
        funnel_from_chunks(chunks, "k", 1)
    with pytest.raises(ValueError, match="2..8"):
        funnel_from_chunks(chunks, "k", 9)


def test_funnel_from_chunks_duplicate_chunk_guard(spark):
    """A duplicated (keys, chunk) row raises by default — it would
    silently double-count its chunk's events; validate=False skips the
    check for trusted producers (the watermarked streaming sink)."""
    from fabstir_vectordb_spark.operators.funnel import (
        funnel_from_chunks,
    )
    from py4j.protocol import Py4JJavaError

    sufs = [[_ts(5).timestamp() * 1e6], []]
    chunks = spark.createDataFrame(
        [(1, 0, sufs), (1, 0, sufs), (2, 1, sufs)],
        "k long, chunk long, sufs array<array<double>>",
    ).withColumn(
        "sufs",
        F.transform(
            "sufs",
            lambda a: F.transform(a, lambda x: x.cast("long")),
        ),
    )
    with pytest.raises(Exception, match="duplicate .keys, chunk."):
        funnel_from_chunks(chunks, "k", 2).collect()
    # validate=False: the duplicate is folded as-is (trusted input)
    rows = funnel_from_chunks(chunks, "k", 2, validate=False).collect()
    assert {r["k"] for r in rows} == {1, 2}
    # clean input passes WITH validation on
    clean = chunks.dropDuplicates(["k", "chunk"])
    rows2 = funnel_from_chunks(clean, "k", 2).collect()
    assert {r["k"] for r in rows2} == {1, 2}
