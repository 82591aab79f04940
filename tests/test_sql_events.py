"""funnel_sql / gapfill_sql: the canonical WINDOW_FUNNEL and
TIME_BUCKET_GAPFILL statements must rewrite to the funnel / resample
operator plans (parity pinned row-for-row), non-keyword statements
must delegate to spark.sql verbatim, and malformed keyword statements
must raise their SyntaxError naming the canonical form."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.funnel import funnel
from fabstir_vectordb_spark.operators.timeseries import resample
from fabstir_vectordb_spark.plans.sql_events import (
    FunnelSyntaxError,
    GapfillSyntaxError,
    explain_funnel,
    explain_gapfill,
    funnel_sql,
    gapfill_sql,
)

T0 = dt.datetime(2024, 3, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=int(s))


@pytest.fixture()
def events(spark):
    rows = [
        (1, _ts(0), "search", 1.0),
        (1, _ts(30), "click", 2.0),
        (1, _ts(90), "buy", 3.0),
        (2, _ts(10), "search", 4.0),
        (2, _ts(5000), "click", 1.5),
        (3, _ts(20), "click", 9.0),
        (4, _ts(40), "other", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, action string, value double"
    )
    df.createOrReplaceTempView("ev_sql")
    return df


def test_funnel_sql_matches_operator(spark, events):
    sql = """SELECT user_id,
                    WINDOW_FUNNEL(3600 SECONDS)
                      (ts, action = 'search', action = 'click',
                           action = 'buy') AS depth
             FROM ev_sql GROUP BY user_id"""
    got = {r["user_id"]: r["depth"] for r in funnel_sql(spark, sql).collect()}
    steps = [
        F.col("action") == "search",
        F.col("action") == "click",
        F.col("action") == "buy",
    ]
    want = {
        r["user_id"]: r["depth"]
        for r in funnel(events, "user_id", steps, window_seconds=3600).collect()
    }
    assert got == want
    # user 1 completes; user 2's click is outside the hour; user 3
    # never searched; user 4 matched nothing and is absent
    assert got == {1: 3, 2: 1, 3: 0}
    assert explain_funnel(sql) == "funnel"


def test_funnel_sql_strict_and_multikey(spark, events):
    events.withColumn("grp", F.lit("g")).createOrReplaceTempView("ev_mk")
    sql = """SELECT grp, user_id,
                    WINDOW_FUNNEL(7200 SECONDS, STRICT INCREASE)
                      (ts, value >= 1.0, value >= 2.0) AS d
             FROM ev_mk GROUP BY grp, user_id"""
    got = {(r["grp"], r["user_id"]): r["d"]
           for r in funnel_sql(spark, sql).collect()}
    want = {
        ("g", r["user_id"]): r["depth"]
        for r in funnel(
            events.withColumn("grp", F.lit("g")),
            ["grp", "user_id"],
            [F.col("value") >= 1.0, F.col("value") >= 2.0],
            window_seconds=7200, strict_increase=True,
        ).collect()
    }
    assert got == want


def test_funnel_sql_delegation_and_errors(spark, events):
    # no keyword -> spark.sql verbatim
    plain = "SELECT user_id, count(*) AS n FROM ev_sql GROUP BY user_id"
    assert explain_funnel(plain) == "delegate"
    assert funnel_sql(spark, plain).count() == 4
    for bad in (
        # one predicate only
        """SELECT user_id, WINDOW_FUNNEL(60 SECONDS)(ts, value > 0) AS d
           FROM ev_sql GROUP BY user_id""",
        # GROUP BY mismatch
        """SELECT user_id, WINDOW_FUNNEL(60 SECONDS)
             (ts, value > 0, value > 1) AS d
           FROM ev_sql GROUP BY action""",
        # no keys
        """SELECT WINDOW_FUNNEL(60 SECONDS)(ts, value > 0, value > 1) AS d
           FROM ev_sql GROUP BY user_id""",
        # ts not a bare column
        """SELECT user_id, WINDOW_FUNNEL(60 SECONDS)
             (ts + 1, value > 0, value > 1) AS d
           FROM ev_sql GROUP BY user_id""",
    ):
        with pytest.raises(FunnelSyntaxError):
            funnel_sql(spark, bad)


def test_gapfill_sql_matches_operator(spark, events):
    sql = """SELECT TIME_BUCKET_GAPFILL(60 SECONDS, ts) AS bucket,
                    user_id,
                    AVG(value) AS v,
                    LOCF(AVG(value)) AS v_locf,
                    INTERPOLATE(MAX(value)) AS mx_i,
                    COUNT(*) AS n
             FROM ev_sql GROUP BY bucket, user_id"""
    got = sorted(
        tuple(r) for r in gapfill_sql(spark, sql).collect()
    )
    rs = resample(
        events, "user_id", ts_col="ts", step_seconds=60,
        aggs={
            "v": F.avg("value"),
            "v2": F.avg("value"),
            "mx": F.max("value"),
            "n": F.count(F.lit(1)),
        },
        fill={"v2": ("locf",), "mx": ("interp",)},
    )
    want = sorted(
        tuple(r)
        for r in rs.select(
            F.col("bucket_ts").alias("bucket"), "user_id",
            "v", F.col("v2_locf").alias("v_locf"),
            F.col("mx_interp").alias("mx_i"), "n",
        ).collect()
    )
    assert got == want
    assert explain_gapfill(sql) == "gapfill"
    # gap buckets exist (user 2 spans 5000 s at 60 s steps) and bare
    # aggregates are NULL there while LOCF carries forward
    rows = gapfill_sql(spark, sql).collect()
    gaps = [r for r in rows if r["user_id"] == 2 and r["v"] is None]
    assert gaps and all(r["v_locf"] == 4.0 for r in gaps)


def test_gapfill_sql_bounds_and_numeric_epoch(spark):
    df = spark.createDataFrame(
        [(1, 100, 5.0), (1, 400, 9.0)], "k long, ts long, value double"
    )
    df.createOrReplaceTempView("ev_raw")
    sql = """SELECT TIME_BUCKET_GAPFILL(100 SECONDS, ts, 0, 500) AS b,
                    k, SUM(value) AS s
             FROM ev_raw GROUP BY b, k"""
    got = sorted(
        (r["b"], r["k"], r["s"]) for r in gapfill_sql(spark, sql).collect()
    )
    want = sorted(
        (r["bucket_ts"], r["k"], r["s"])
        for r in resample(
            df, "k", ts_col="ts", step_seconds=100,
            aggs={"s": F.sum("value")}, grid_start=0, grid_end=500,
        ).collect()
    )
    assert got == want
    assert len(got) == 6  # buckets 0..500 inclusive at 100 s


def test_gapfill_sql_delegation_and_errors(spark, events):
    plain = "SELECT action, avg(value) AS v FROM ev_sql GROUP BY action"
    assert explain_gapfill(plain) == "delegate"
    assert gapfill_sql(spark, plain).count() == 4
    for bad in (
        # no measures
        """SELECT TIME_BUCKET_GAPFILL(60 SECONDS, ts) AS b, user_id
           FROM ev_sql GROUP BY b, user_id""",
        # GROUP BY missing the bucket alias
        """SELECT TIME_BUCKET_GAPFILL(60 SECONDS, ts) AS b, user_id,
                  AVG(value) AS v
           FROM ev_sql GROUP BY user_id""",
        # AVG(*) is nonsense
        """SELECT TIME_BUCKET_GAPFILL(60 SECONDS, ts) AS b, user_id,
                  AVG(*) AS v
           FROM ev_sql GROUP BY b, user_id""",
        # duplicate output names
        """SELECT TIME_BUCKET_GAPFILL(60 SECONDS, ts) AS v, user_id,
                  AVG(value) AS v
           FROM ev_sql GROUP BY v, user_id""",
    ):
        with pytest.raises(GapfillSyntaxError):
            gapfill_sql(spark, bad)


def test_gapfill_sql_bound_literal_unit_validation(spark, events):
    """Integer start/finish literals are raw units for numeric-epoch
    columns ONLY — fed to a timestamp column they would read as
    nanoseconds and silently clamp the grid to 1970; quoted literals
    are likewise refused for integer columns."""
    with pytest.raises(GapfillSyntaxError, match="raw integer"):
        gapfill_sql(
            spark,
            """SELECT TIME_BUCKET_GAPFILL(3600 SECONDS, ts,
                                          1704067200, 1704153600) AS b,
                      user_id, COUNT(*) AS n
               FROM ev_sql GROUP BY b, user_id""",
        )
    spark.createDataFrame(
        [(1, 100, 1.0)], "k long, ts long, value double"
    ).createOrReplaceTempView("ev_raw2")
    with pytest.raises(GapfillSyntaxError, match="quoted timestamp"):
        gapfill_sql(
            spark,
            """SELECT TIME_BUCKET_GAPFILL(100 SECONDS, ts,
                                          '2024-01-01', '2024-01-02') AS b,
                      k, COUNT(*) AS n
               FROM ev_raw2 GROUP BY b, k""",
        )


def test_funnel_sql_escaped_string_literals(spark, events):
    """String literals containing commas and escaped quotes — SQL
    doubled '' and Spark backslash \\' — must not split the argument
    list or toggle the lexer's quote state (Spark SQL lexing parity)."""
    from fabstir_vectordb_spark.plans.sql_events import _split_top

    assert _split_top("a, x = 'it''s, ok', b") == [
        "a", "x = 'it''s, ok'", "b",
    ]
    assert _split_top(r"a, x = 'it\'s, (ok', b") == [
        "a", r"x = 'it\'s, (ok'", "b",
    ]
    # end-to-end: a comma-and-paren-bearing escaped literal as a step
    # predicate parses as ONE predicate (never matches on this
    # fixture, so depth stops at 1 for keys whose first step matched)
    sql = (
        "SELECT user_id, WINDOW_FUNNEL(3600 SECONDS)"
        "(ts, action = 'search', action = 'it''s, (ok') AS depth "
        "FROM ev_sql GROUP BY user_id"
    )
    got = {(r["user_id"], r["depth"]) for r in
           funnel_sql(spark, sql).collect()}
    assert got == {(1, 1), (2, 1)}


# ------------------------------------------------------------------ #
# RETENTION + FUNNEL_SUMMARY (r11)                                    #
# ------------------------------------------------------------------ #

def test_retention_sql_clickhouse_semantics(spark, events):
    """ClickHouse's exact rule: slot 1 = any row meets pred1; slot i =
    (any row meets pred_i) AND slot 1 — the anchor gates every later
    slot, rows may differ."""
    from fabstir_vectordb_spark.plans.sql_events import retention_sql

    got = {
        r["user_id"]: list(r["r"])
        for r in retention_sql(
            spark,
            """SELECT user_id,
                      RETENTION(action = 'search', action = 'click',
                                action = 'buy') AS r
               FROM ev_sql GROUP BY user_id""",
        ).collect()
    }
    # user 1: search+click+buy -> [1,1,1]; user 2: search+click ->
    # [1,1,0]; user 3: click only -> anchor unmet, gated to [0,0,0];
    # user 4: 'other' only -> [0,0,0] (still a row: agg over every key)
    assert got == {
        1: [1, 1, 1], 2: [1, 1, 0], 3: [0, 0, 0], 4: [0, 0, 0],
    }


def test_retention_sql_matches_retention_from_activity(spark, events):
    """Composition identity tying the statement to the operator: with
    period-membership predicates anchored at each cohort's period 0,
    sum(slot_i) over the cohort's keys == the operator's n_active at
    offset i (single-cohort fixture: every key's first period is 0)."""
    from fabstir_vectordb_spark.operators.funnel import (
        retention_from_activity,
    )
    from fabstir_vectordb_spark.plans.sql_events import retention_sql

    act = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 0), (2, 2), (3, 0)],
        "user_id long, period long",
    )
    act.createOrReplaceTempView("ret_act")
    arr = retention_sql(
        spark,
        """SELECT user_id, RETENTION(period = 0, period = 1,
                                     period = 2) AS r
           FROM ret_act GROUP BY user_id""",
    )
    sums = arr.select(
        *[F.sum(F.col("r")[i]).alias(f"s{i}") for i in range(3)]
    ).collect()[0]
    want = {
        r["offset"]: r["n_active"]
        for r in retention_from_activity(act, "user_id").collect()
    }
    assert [sums["s0"], sums["s1"], sums["s2"]] == [
        want[0], want[1], want[2]
    ]


def test_retention_sql_delegation_and_errors(spark, events):
    from fabstir_vectordb_spark.plans.sql_events import (
        RetentionSyntaxError, explain_retention, retention_sql,
    )

    # no RETENTION call -> verbatim spark.sql, even with a column
    # literally named retention
    spark.createDataFrame(
        [(0, 0.5)], "cohort long, retention double"
    ).createOrReplaceTempView("ret_tri")
    assert explain_retention(
        "SELECT cohort, retention FROM ret_tri"
    ) == "delegate"
    assert retention_sql(
        spark, "SELECT cohort, retention FROM ret_tri"
    ).count() == 1
    assert explain_retention(
        """SELECT user_id, RETENTION(action = 'search',
                                     action = 'buy') AS r
           FROM ev_sql GROUP BY user_id"""
    ) == "retention"
    with pytest.raises(RetentionSyntaxError, match="at least two"):
        retention_sql(
            spark,
            "SELECT user_id, RETENTION(action = 'x') AS r "
            "FROM ev_sql GROUP BY user_id",
        )
    with pytest.raises(RetentionSyntaxError, match="GROUP BY"):
        retention_sql(
            spark,
            "SELECT user_id, RETENTION(action = 'x', action = 'y') "
            "AS r FROM ev_sql GROUP BY user_id, ts",
        )
    with pytest.raises(RetentionSyntaxError, match="canonical"):
        retention_sql(spark, "SELECT RETENTION(a, b) FROM t")


def test_funnel_summary_sql_matches_operators(spark, events):
    """FUNNEL_SUMMARY == funnel() + funnel_summary() row-for-row."""
    from fabstir_vectordb_spark.operators.funnel import funnel_summary
    from fabstir_vectordb_spark.plans.sql_events import (
        explain_funnel_summary, funnel_summary_sql,
    )

    steps = [
        F.col("action") == "search",
        F.col("action") == "click",
        F.col("action") == "buy",
    ]
    per_key = funnel(events, "user_id", steps, window_seconds=3600)
    want = {
        (r["step"], r["reached"], r["conversion"])
        for r in funnel_summary(per_key, 3).collect()
    }
    got = {
        (r["step"], r["reached"], r["conversion"])
        for r in funnel_summary_sql(
            spark,
            """SELECT FUNNEL_SUMMARY(3600 SECONDS)
                      (ts, action = 'search', action = 'click',
                       action = 'buy')
               FROM ev_sql GROUP BY user_id""",
        ).collect()
    }
    assert got == want
    assert explain_funnel_summary("SELECT 1 AS x FROM ev_sql GROUP BY x") \
        == "delegate"


def test_funnel_summary_sql_errors(spark, events):
    from fabstir_vectordb_spark.plans.sql_events import (
        funnel_summary_sql,
    )

    with pytest.raises(FunnelSyntaxError, match="ONLY select item"):
        funnel_summary_sql(
            spark,
            """SELECT user_id, FUNNEL_SUMMARY(60 SECONDS)(ts, a, b)
               FROM ev_sql GROUP BY user_id""",
        )
    with pytest.raises(FunnelSyntaxError, match="at least two"):
        funnel_summary_sql(
            spark,
            """SELECT FUNNEL_SUMMARY(60 SECONDS)(ts, action = 'x')
               FROM ev_sql GROUP BY user_id""",
        )
    with pytest.raises(FunnelSyntaxError, match="bare"):
        funnel_summary_sql(
            spark,
            """SELECT FUNNEL_SUMMARY(60 SECONDS)(ts + 1, a = 1, b = 2)
               FROM ev_sql GROUP BY user_id""",
        )


def test_funnel_summary_sql_strict_and_retention_nulls(spark, events):
    """STRICT INCREASE threads through FUNNEL_SUMMARY to the funnel
    operator; RETENTION reads SQL ternary NULLs as not-met (coalesce
    to false) rather than poisoning the aggregate."""
    from fabstir_vectordb_spark.operators.funnel import (
        funnel, funnel_summary,
    )
    from fabstir_vectordb_spark.plans.sql_events import (
        funnel_summary_sql, retention_sql,
    )

    per_key = funnel(
        events, "user_id",
        [F.col("action") == "search", F.col("action") == "click"],
        window_seconds=3600, strict_increase=True,
    )
    want = {
        (r["step"], r["reached"], r["conversion"])
        for r in funnel_summary(per_key, 2).collect()
    }
    got = {
        (r["step"], r["reached"], r["conversion"])
        for r in funnel_summary_sql(
            spark,
            """SELECT FUNNEL_SUMMARY(3600 SECONDS, STRICT INCREASE)
                      (ts, action = 'search', action = 'click')
               FROM ev_sql GROUP BY user_id""",
        ).collect()
    }
    assert got == want
    # NULL predicate result (value IS NULL comparisons) -> not met
    spark.createDataFrame(
        [(1, None), (1, 5.0), (2, None)], "k long, x double"
    ).createOrReplaceTempView("ret_nulls")
    got_n = {
        r["k"]: list(r["r"])
        for r in retention_sql(
            spark,
            "SELECT k, RETENTION(x > 1, x > 10) AS r "
            "FROM ret_nulls GROUP BY k",
        ).collect()
    }
    assert got_n == {1: [1, 0], 2: [0, 0]}
