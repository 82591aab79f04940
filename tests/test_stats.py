

# -------------------------------------------------------- sessionization


def test_sessionize_gap_semantics(spark):
    """A session breaks exactly when the within-user gap EXCEEDS the
    threshold; ids are '<user>#<dense k>'; sub-second gaps use exact
    microsecond arithmetic (a 0.9 s gap straddling a second boundary
    must not break a 1 s-gap session)."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.stats import (
        session_stats,
        sessionize,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 500_000)
    rows = [
        # user 1: 0.9s gap (same session at gap=1s), then 100s gap
        (0, t0, 1, 1.0),
        (1, t0 + dt.timedelta(microseconds=900_000), 1, 2.0),
        (2, t0 + dt.timedelta(seconds=101), 1, 3.0),
        # user 2: single event
        (3, t0, 2, 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    s = sessionize(ev, gap_seconds=1)
    got = {r["event_id"]: r["session_id"] for r in s.collect()}
    assert got == {0: "1#1", 1: "1#1", 2: "1#2", 3: "2#1"}

    stats = {
        r["session_id"]: (r["n_events"], r["duration_us"], r["sum_value"])
        for r in session_stats(s).collect()
    }
    assert stats["1#1"] == (2, 900_000, 3.0)
    assert stats["1#2"] == (1, 0, 3.0)
    assert stats["2#1"] == (1, 0, 4.0)


def test_sessionize_exact_gap_does_not_break(spark):
    """The break rule is strictly-greater: a gap of exactly
    gap_seconds stays in the session."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.stats import sessionize

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(0, t0, 7, 0.0), (1, t0 + dt.timedelta(seconds=60), 7, 0.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(ev, gap_seconds=60).collect()}
    assert got == {0: "7#1", 1: "7#1"}
