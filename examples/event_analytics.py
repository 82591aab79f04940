"""Event analytics: sessionization, temporal joins, and their SQL
surfaces, end to end on the events fixture.

Covers the round-6/7 temporal tier the way a user would reach it:
  1. gaps-and-islands sessionization + per-session rollup (batch)
  2. the same sessions from a live stream (session_window twin)
  3. as-of join — attach the latest same-user 'view' to every 'click'
  4. the ASOF JOIN statement form (Spark has no such keyword; the
     rewriter turns it into the single-exchange plan)
  5. point-in-interval range join via the canonical BETWEEN statement
  6. resample onto a dense aligned grid + locf/interp gap-fill
  7. the rollup report card with HLL distinct-user counts (two-phase
     plan: Expand sees dim combos, never the raw scan)
  8. the first-touch conversion funnel (view -> click -> purchase)
  9. refreshing the report INCREMENTALLY: summarize only a new day's
     events and merge into the stored summary
 10. weekly cohort retention (the triangle)
 11. SCD2: the view log as a validity-interval dimension, looked up
     with range_join (== the as-of lookup, by the pinned identity)
 12. the funnel in ClickHouse's WINDOW_FUNNEL SQL spelling and the
     gap-fill in TimescaleDB's TIME_BUCKET_GAPFILL spelling
 13. percentile reports that refresh incrementally (mergeable
     fixed-grid histogram measures through summarize/merge)
 14. the STREAMING funnel refresh loop: chunk pre-folds stream under
     a watermark (funnel_chunks_stream), the keys-only stitch
     (funnel_from_chunks) refreshes the funnel from accumulated
     chunk rows — history is never rescanned; == batch, asserted
 15. moving aggregates: a trailing 6h mean per user over raw events
     (rolling) and the gap-filled 3-bucket moving average over the
     daily grid (resample + rolling_buckets — the hot-key scale path:
     events compact to buckets before any frame is evaluated), plus
     trailing DISTINCT counts both ways: per-day collect_set / HLL
     sketch partials unioned over a 3-bucket frame (exact capped tier
     and unbounded approx tier agreeing in the sparse regime)

Run:  python examples/event_analytics.py
(uses the sf0.001 fixture tables; finishes in ~1 min on local[8])
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def main(spark: SparkSession) -> dict:
    out = {}
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # --- 1. batch sessionization + rollup ------------------------------
    from fabstir_vectordb_spark.operators.stats import (
        session_stats,
        sessionize,
    )

    sessions = session_stats(sessionize(events, gap_seconds=3600))
    out["n_sessions"] = sessions.count()
    out["longest_session_events"] = sessions.agg(
        F.max("n_events")
    ).first()[0]

    # --- 2. the same sessions from a stream ----------------------------
    from fabstir_vectordb_spark.streaming.ingest import sessionize_stream

    src = tempfile.mkdtemp(prefix="evex_")
    events.select("user_id", "ts", "value", "event_id").repartition(
        4
    ).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "user_id bigint, ts timestamp, value double, event_id bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=3600, watermark="3650 days")
        .writeStream.format("memory")
        .queryName("evex_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out["n_sessions_streamed"] = spark.table("evex_sessions").count()
    assert out["n_sessions_streamed"] == out["n_sessions"]

    # --- 3. as-of join (operator form) ---------------------------------
    from fabstir_vectordb_spark.operators.temporal import asof_join

    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    attributed = asof_join(
        clicks, views, on="user_id", value_cols=["event_id", "value"],
        tolerance_seconds=7200, right_order_col="event_id",
    )
    out["clicks_with_view"] = attributed.filter(
        F.col("ts_r").isNotNull()
    ).count()

    # --- 4. the same thing as the canonical ASOF statement -------------
    from fabstir_vectordb_spark.plans.sql_temporal import asof_sql

    clicks.createOrReplaceTempView("clicks")
    views.createOrReplaceTempView("views")
    sql_hits = asof_sql(
        spark,
        """SELECT l.event_id, r.event_id AS view_id, r.value AS view_value
           FROM clicks l ASOF JOIN views r
             ON l.user_id = r.user_id AND l.ts >= r.ts""",
    )
    out["asof_sql_rows"] = sql_hits.count()

    # the statement form also takes a match-age bound (maps to the
    # operator's tolerance_seconds; out-of-tolerance drops under inner)
    recent_hits = asof_sql(
        spark,
        """SELECT l.event_id, r.event_id AS view_id
           FROM clicks l ASOF JOIN views r
             ON l.user_id = r.user_id AND l.ts >= r.ts
           TOLERANCE 1800 SECONDS""",
    )
    out["asof_sql_recent_rows"] = recent_hits.count()
    assert out["asof_sql_recent_rows"] <= out["asof_sql_rows"]

    # hot-key escape hatch: a single entity holding most of the stream
    # serializes the plain window; chunk_seconds spreads its timeline
    # across tasks (identical answers — property-tested + driver-
    # certified — so this is purely a latency knob for skewed keys)
    chunked = asof_join(
        clicks, views, on="user_id", value_cols=["event_id", "value"],
        tolerance_seconds=7200, right_order_col="event_id",
        chunk_seconds=86_400,
    )
    assert chunked.filter(
        F.col("ts_r").isNotNull()
    ).count() == out["clicks_with_view"]

    # --- 5. range join via the canonical BETWEEN statement -------------
    from fabstir_vectordb_spark.plans.sql_temporal import range_sql

    bounds = (
        sessionize(events, gap_seconds=3600)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    events.createOrReplaceTempView("ev")
    bounds.createOrReplaceTempView("session_bounds")
    assigned = range_sql(
        spark,
        """SELECT p.event_id, i.session_id
           FROM ev p JOIN session_bounds i
             ON p.user_id = i.user_id AND p.ts BETWEEN i.s AND i.e""",
        # no bucket_seconds: tune_range measures the intervals' median
        # length and picks the bucket (any width computes the same rows)
    )
    out["events_assigned"] = assigned.count()
    assert out["events_assigned"] == events.count()

    # --- 6. resample onto a dense grid + gap-fill -----------------------
    from fabstir_vectordb_spark.operators.timeseries import resample

    hourlyish = resample(
        events, "user_id", "ts", step_seconds=6 * 3600,
        aggs={"n": F.count(F.lit(1)), "v": F.avg("value")},
        fill={"v": ("locf", "interp"), "n": ("zero",)},
        # pin the window: aligned grids per user, sentinel-proof
        grid_start="2024-01-01", grid_end="2024-01-07",
    )
    out["grid_rows"] = hourlyish.count()
    out["grid_gaps"] = hourlyish.filter("is_gap").count()
    # every user shares the same 6h grid over the pinned window:
    # 6 full days x 4 buckets + the Jan-7 00:00 bucket (bounds are
    # inclusive at bucket granularity) = 25 buckets per user
    assert out["grid_rows"] % 25 == 0

    # --- 7. the corpus report card: rollup with distinct counts ---------
    from fabstir_vectordb_spark.operators.olap import grouped_report

    report = grouped_report(
        events.withColumn("hour", F.hour("ts").cast("string")),
        ["event_type", "hour"],
        {
            "n": ("count", None),
            "users": ("approx_distinct", "user_id"),  # mergeable HLL
            "v_sum": ("sum", "value"),
        },
        mode="rollup",  # pre_aggregate=True: Expand sees dim combos,
    )                   # never the raw scan — the 100 TB path
    out["report_rows"] = report.count()
    grand = report.filter("g_event_type = 1 AND g_hour = 1").first()
    out["distinct_users_total"] = grand["users"]

    # --- 8. conversion funnel: view -> click -> purchase, 1-day window -
    from fabstir_vectordb_spark.operators.funnel import (
        funnel, funnel_summary,
    )

    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    per_user = funnel(events, "user_id", steps, window_seconds=86400)
    for row in funnel_summary(per_user, 3).collect():
        out[f"funnel_step{row['step']}_users"] = row["reached"]

    # --- 9. incremental report refresh ---------------------------------
    # a pipeline stores the summary, then folds each new day in without
    # rescanning history; the report itself never touches raw events
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, report_from_summary, summarize,
    )

    dims = ["event_type"]
    ms = {"n": ("count", None), "users": ("approx_distinct", "user_id")}
    history = events.filter(F.dayofmonth("ts") < 28)
    new_day = events.filter(F.dayofmonth("ts") >= 28)
    stored = summarize(history, dims, ms)          # persisted in practice
    merged = merge_summaries(stored, summarize(new_day, dims, ms))
    refreshed = report_from_summary(merged, dims, ms, mode="rollup")
    out["refreshed_report_rows"] = refreshed.count()
    # identical to the one-shot report over all events (pinned by test)
    assert (
        refreshed.filter("g_event_type = 1").first()["n"] == events.count()
    )

    # --- 10. weekly cohort retention ------------------------------------
    from fabstir_vectordb_spark.operators.funnel import retention

    tri = retention(events, "user_id", period_seconds=604800)
    week0 = tri.filter("offset = 0").agg(F.sum("n_cohort")).first()[0]
    out["retention_cells"] = tri.count()
    out["cohorted_users"] = week0

    # --- 11. SCD2 dimension lookup --------------------------------------
    # each user's view history becomes validity intervals; range_join
    # assigns every click the view version in effect at click time
    from fabstir_vectordb_spark.operators.temporal import (
        range_join, validity_intervals,
    )

    view_log = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("version_id")
    ).dropDuplicates(["user_id", "ts"])
    dim = validity_intervals(view_log, "user_id", horizon="2030-01-01")
    clicks2 = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    out["clicks_with_version"] = range_join(
        clicks2, dim.drop("ts"), "user_id",
        ts_col="click_ts", bucket_seconds=86400,
        long_interval_buckets=1,
    ).count()

    # --- 12. (r10) the event-analytics SQL statement forms ---------------
    # the funnel in ClickHouse's WINDOW_FUNNEL spelling and the gap-fill
    # in TimescaleDB's TIME_BUCKET_GAPFILL spelling — both rewrite to
    # the operator plans above; ordinary SQL delegates verbatim
    from fabstir_vectordb_spark.plans.sql_events import (
        funnel_sql, gapfill_sql,
    )

    events.createOrReplaceTempView("ex_events")
    depths = funnel_sql(
        spark,
        """SELECT user_id,
                  WINDOW_FUNNEL(86400 SECONDS)
                    (ts, event_type = 'view', event_type = 'click',
                         event_type = 'purchase') AS depth
           FROM ex_events GROUP BY user_id""",
    )
    out["sql_funnel_completed"] = depths.filter("depth = 3").count()
    filled = gapfill_sql(
        spark,
        """SELECT TIME_BUCKET_GAPFILL(21600 SECONDS, ts) AS bucket,
                  user_id, LOCF(AVG(value)) AS v, COUNT(*) AS n
           FROM ex_events GROUP BY bucket, user_id""",
    )
    out["sql_gapfill_rows"] = filled.count()

    # --- 13. (r10) percentiles that refresh incrementally ----------------
    # the mergeable histogram measure: derive the grid ONCE, then p90
    # reports refresh through the same summarize/merge path as step 9
    from fabstir_vectordb_spark.operators.olap import suggest_grid

    grid = suggest_grid(events, "value", buckets=64)
    pms = {"n": ("count", None), "p90": ("approx_p90", "value", grid),
           "du": ("exact_distinct", "user_id", {"cap": 100_000})}
    merged_p = merge_summaries(
        summarize(history, dims, pms), summarize(new_day, dims, pms)
    )
    prep = report_from_summary(merged_p, dims, pms, mode="rollup")
    one_shot = grouped_report(events, dims, pms, mode="rollup")
    got = {tuple(r) for r in prep.collect()}
    assert got == {tuple(r) for r in one_shot.collect()}  # EXACTLY equal
    out["p90_value_overall"] = round(
        prep.filter("g_event_type = 1").first()["p90"], 3
    )

    # --- 14. (r11) the STREAMING funnel refresh loop ---------------------
    # funnel's chunked decomposition split across the stream/batch
    # boundary: chunk pre-folds stream under a watermark
    # (funnel_chunks_stream — a chunk finalizes exactly when no late
    # event can change it), land in a sink table, and the cheap
    # keys-only stitch (funnel_from_chunks) refreshes the funnel from
    # the ACCUMULATED chunk rows — the full event history is never
    # rescanned.  Must equal the batch funnel(chunk_seconds=...) and
    # the plain funnel (same steps/window) exactly.
    from fabstir_vectordb_spark.operators.funnel import (
        funnel_from_chunks,
    )
    from fabstir_vectordb_spark.streaming.ingest import (
        funnel_chunks_stream,
    )

    src_f = tempfile.mkdtemp(prefix="evexf_")
    events.select(
        "user_id", "ts", "value", "event_id", "event_type"
    ).repartition(4).write.mode("overwrite").parquet(src_f)
    qf = (
        funnel_chunks_stream(
            spark.readStream.schema(
                "user_id bigint, ts timestamp, value double, "
                "event_id bigint, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_f),
            "user_id",
            steps,
            chunk_seconds=21600,
            watermark="3650 days",
        )
        .writeStream.format("memory")
        .queryName("evex_funnel_chunks")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    qf.awaitTermination(300)
    chunk_rows = spark.table("evex_funnel_chunks").select(
        "user_id", "chunk", "sufs"
    )
    refreshed = funnel_from_chunks(
        chunk_rows, "user_id", 3, window_seconds=86400
    )
    got_f = {
        (r["user_id"], r["depth"]) for r in refreshed.collect()
    }
    want_f = {
        (r["user_id"], r["depth"]) for r in per_user.collect()
    }
    assert got_f == want_f  # stream-refreshed == batch funnel, exactly
    out["funnel_users_streamed"] = len(got_f)

    # --- 15. (r11) moving aggregates -------------------------------------
    from fabstir_vectordb_spark.operators.timeseries import (
        rolling, rolling_buckets,
    )

    # trailing 6h mean/count per user, one row per event
    trail = rolling(
        events, "user_id", "ts",
        {"v6h_mean": ("mean", "value"), "n6h": ("count", None)},
        window_seconds=21600,
    )
    out["rolling_rows"] = trail.count()
    assert out["rolling_rows"] == events.filter(
        F.col("ts").isNotNull()
    ).count()

    # the dashboard staple: daily zero-filled sums, 3-day moving avg —
    # resample compacts events to buckets BEFORE the frame runs, so a
    # hot key slides over days, not events
    daily = resample(
        events, "user_id", "ts", 86400,
        aggs={"s": F.sum("value")}, fill={"s": ("zero", "locf")},
    )
    ma = rolling_buckets(daily, "user_id", {"s_ma3": ("mean", "s_zero")}, 3)
    out["moving_avg_rows"] = ma.count()
    assert out["moving_avg_rows"] == daily.count()  # windows add no rows

    # trailing DISTINCT counts, the "distinct event types in the last
    # 3 days" measure: compact each day to a value set + HLL sketch
    # first (events never cross a frame), then union over the frame —
    # the exact tier is capped-loud, the HLL tier unbounded
    dsets = resample(
        events, "user_id", "ts", 86400,
        aggs={"st": F.collect_set("event_type"),
              "sk": F.hll_sketch_agg("event_type")},
    )
    dd = rolling_buckets(
        dsets, "user_id",
        {"et_3d": ("exact_distinct", "st"),
         "et_3d_approx": ("approx_distinct", "sk")},
        n_buckets=3,
    )
    both = dd.agg(
        F.max("et_3d").alias("mx"),
        F.sum(
            (F.col("et_3d") != F.col("et_3d_approx")).cast("int")
        ).alias("diffs"),
    ).collect()[0]
    out["distinct_3d_max"] = both["mx"]
    # event_type cardinality is far inside the sketch's exact sparse
    # regime, so the HLL tier agrees with the exact tier verbatim here
    assert both["diffs"] == 0

    # trailing heavy hitters: top event types per user over the same
    # 3-day windows — counts explode to the windows they cover, so
    # there is no inequality join and no per-row set state
    from fabstir_vectordb_spark.operators.timeseries import (
        rolling_top_values,
    )

    tv = rolling_top_values(
        events.withColumn(
            "bucket",
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(86_400_000_000)
            ).cast("long"),
        )
        .filter(F.col("bucket").isNotNull())
        .groupBy("user_id", "bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("w")),
        "user_id", n_buckets=3, k=1,
        value_col="event_type", weight_col="w",
    )
    out["top_value_windows"] = tv.count()
    assert tv.filter(F.col("rank") != 1).count() == 0  # k=1 cut

    return out


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("event_analytics_example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in main(spark).items():
        print(f"{k}: {v}")
