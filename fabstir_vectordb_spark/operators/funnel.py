"""Ordered conversion-funnel analysis: how deep into a step sequence
each key (user) gets, and when.

``funnel`` answers the classic product-analytics question — "of the
users who SEARCHED, how many then CLICKED, then PURCHASED, within an
hour of the first search?" — the operator ClickHouse ships as
``windowFunnel`` and every event warehouse reimplements.  Semantics
here are the deterministic FIRST-TOUCH chain, chosen because it is
exactly replayable in ANSI SQL (the certification path):

  t1 = the key's EARLIEST step-1 event;
  t_i = the earliest step-i event with ``ts >= t_{i-1}``
        (and ``ts <= t1 + window_seconds`` when a window is given —
        the window anchors at the chain's first touch, ClickHouse's
        reading);
  depth = the largest i reached.  Boundaries are inclusive: an event
  at exactly ``t_{i-1}`` (or exactly ``t1 + window``) counts, so two
  steps may share one timestamp — or one physical event satisfying
  two consecutive step predicates may advance both.  This non-strict
  reading is the default windowFunnel contract;
  ``strict_increase=True`` is ClickHouse's strict_increase mode —
  each step must land STRICTLY after the previous match, so tied
  timestamps (and a single event matching consecutive steps) no
  longer chain.

First-touch greedy IS the chained-minimum: advancing from the
earliest valid t_i never forecloses a later step that some other
choice of t_i would reach *within the same t1-anchored window*, since
any event usable from a later t_i is also at-or-after the earliest
one.  (Depth-MAXIMIZING funnels over all possible anchors are a
different operator: a later t1 can open a later window.  First-touch
is the common reporting semantics and the one with a closed-form SQL
oracle.)

Spark plan, one exchange end-to-end:

  1. Map side: each event is tagged with the step indices it
     satisfies (a literal array of ``when`` expressions + explode);
     events matching NO step are dropped BEFORE the shuffle and the
     survivors are projected to slim (keys, ts_micros, step) rows —
     at 100 TB the funnel events are typically a sliver of the
     event table, and only that sliver ever moves.
  2. One groupBy on the keys: ``sort_array(collect_list(struct(ts,
     step)))`` then a single ``F.aggregate`` fold walks the key's
     timeline once, appending a step's timestamp to the chain array
     whenever it is the next step needed, at-or-after the previous
     match, and inside the window.  Pure column expressions inside
     whole-stage codegen — no UDF, no Python in the hot path.

Skew boundary, stated honestly: the per-key state is the key's list
of STEP-MATCHING events (never the full event list).  A key with
10^7 matching events serializes in one task like any per-key
aggregate; cap or pre-thin such keys upstream (``cap_per_group``) —
for step 1 only the minimum matters, but later steps legitimately
depend on every occurrence, so the operator does not thin silently.

Numeric-epoch mode as in operators/temporal.py: an all-integer
``ts_col`` orders on the raw integers (no timestamp cast) and
``window_seconds`` is read in the column's raw unit.

Streaming boundary, stated as a contract (the resample/curation-gate
split): the chain is NOT closed under micro-batching — a late
step-1 event can rewrite a key's entire chain (t1 anchors the
window), so there is no per-batch state smaller than the key's
step-event history.  The round-10 chunked decomposition gives the
split an exact streamable HALF: per-(key, chunk) suffix pre-folds
finalize when the watermark passes the chunk's end
(``streaming/ingest.funnel_chunks_stream``), and the keys-only
stitch stays batch over the accumulated chunk rows
(:func:`funnel_from_chunks`) — identical to
``funnel(chunk_seconds=...)`` by construction, stream≡batch pinned.
Retention splits the same way: per-(key, period) activity streams
under the watermark (``retention_activity_stream``), the cohort
fold stays batch (:func:`retention_from_activity`) — a late earlier
period rewrites a key's cohort exactly like late step-1, so the
fold has no bounded streaming state either.

Reference parity: none (no event-analytics surface in the
reference); extension-axis with operators/stats.py sessionization
and operators/temporal.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.temporal import _raw_time_mode

__all__ = [
    "funnel",
    "funnel_from_chunks",
    "funnel_summary",
    "retention",
    "retention_from_activity",
]


def _step_tags(steps) -> Column:
    """Map-side step tagging: the array of 1-based step indices an
    event satisfies (array_compact drops the non-matching slots) —
    shared by funnel, its chunked path, and the streaming half so the
    tagging rule can never desynchronize."""
    return F.array_compact(
        F.array(
            *[
                F.when(p, F.lit(i + 1).cast("int"))
                for i, p in enumerate(steps)
            ]
        )
    )


def _timeline_expr() -> Column:
    """The per-group sorted distinct (t, s) timeline over the slim
    (__tsu, __step) projection — collect_SET, not list: duplicate
    entries are interchangeable to the greedy fold (it takes the first
    eligible; any copy chains identically), and deduping happens in
    the map-side partial aggregate, bounding per-key state on
    tie-heavy data at zero extra exchanges."""
    return F.sort_array(
        F.collect_set(
            F.struct(F.col("__tsu").alias("t"), F.col("__step").alias("s"))
        )
    )



def funnel(
    events: DataFrame,
    on: str | list[str],
    steps: list[Column],
    ts_col: str = "ts",
    window_seconds: int | None = None,
    strict_increase: bool = False,
    chunk_seconds: int | None = None,
) -> DataFrame:
    """First-touch funnel per key (see module docstring for the exact
    chain semantics).

    ``steps``  ordered boolean Columns over ``events``'s columns, one
               per funnel step (2..8 steps).
    ``window_seconds``  optional cap: every matched step must land at
               or before ``t1 + window_seconds`` (raw units for an
               integer ``ts_col``).  None = unbounded.
    ``strict_increase``  require each step STRICTLY after the previous
               match (ClickHouse's strict_increase): tied timestamps
               stop chaining.  The window bound stays inclusive.
    ``chunk_seconds``  hot-key escape hatch (answers IDENTICAL by
               construction, property-pinned): pre-fold per (key,
               time-chunk), then stitch chunks in key order.  Without
               it the per-key state is the key's full distinct
               (ts, step) matching-event set in ONE task (10M-on-one-
               key: 6.5 s at the r9 datum — honest but single-task);
               with it the first aggregate groups on (keys, chunk) —
               a hot key parallelizes across chunks and per-task state
               is one chunk's events — and the keys-only stitch sees
               <= n_steps^2 longs per chunk.  Exactness: the pre-fold
               computes, per entry state j, the greedy chain suffix
               assuming steps 1..j-1 matched in an EARLIER chunk
               (time-bucketing makes every in-chunk event later than
               any earlier-chunk match, ties included, so the
               within-chunk greedy is the global greedy); the window
               cap applies at stitch time, exact because the greedy
               picks the EARLIEST eligible event at every step —
               a capped-out suffix element implies no later event of
               that step can qualify either.  Raw units in
               numeric-epoch mode, like window_seconds.

    Output: one row per key that matched AT LEAST ONE step predicate
    (keys with no funnel activity at all are absent — join back to a
    key dimension for the zero row), with

      keys..., depth (int, 0..len(steps)),
      t1..t<k> (epoch micros — or raw integers in numeric-epoch
      mode — of each matched step; NULL beyond ``depth``).

    Rows whose timestamp is NULL (or casts to NULL) are dropped up
    front, as in asof_join: they order nowhere on the timeline.
    """
    k = len(steps)
    if not 2 <= k <= 8:
        raise ValueError(f"funnel needs 2..8 steps; got {k}")
    if window_seconds is not None and int(window_seconds) <= 0:
        raise ValueError(
            f"window_seconds must be positive; got {window_seconds}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    taken = {"depth", *[f"t{i}" for i in range(1, k + 1)]} & set(keys)
    if taken:
        raise ValueError(
            f"key column(s) {sorted(taken)} collide with the output "
            "depth/t<i> columns; rename the keys first"
        )
    reserved = [c for c in keys if c.startswith("__")]
    if reserved:
        raise ValueError(
            f"key column(s) {reserved} use the reserved __ prefix"
        )

    raw = _raw_time_mode((events, [ts_col]))
    tsu = (
        F.col(ts_col).cast("long")
        if raw
        else F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    win_u = (
        None
        if window_seconds is None
        else int(window_seconds) * (1 if raw else 1_000_000)
    )

    # map side: tag + explode the step indices each event satisfies,
    # drop non-matching events BEFORE the shuffle, project slim rows
    tags = _step_tags(steps)
    slim = (
        events.filter(tsu.isNotNull())
        .select(*keys, tsu.alias("__tsu"), F.explode(tags).alias("__step"))
    )

    # one exchange: per key, walk the sorted (ts, step) timeline once.
    # The accumulator is the chain array of matched timestamps; a row
    # extends it when it is the NEXT step, at-or-after the previous
    # match, and inside the t1-anchored window.  Ties sort by step
    # ascending, so equal-timestamp events advance deterministically
    # in step order (the inclusive >= makes them eligible).
    timeline = _timeline_expr()
    def _fold(acc: Column, e: Column) -> Column:
        after_prev = (
            e["t"] > F.try_element_at(acc, F.lit(-1))
            if strict_increase
            else e["t"] >= F.try_element_at(acc, F.lit(-1))
        )
        eligible = (
            (e["s"] == F.size(acc) + 1)
            & ((F.size(acc) == 0) | after_prev)
        )
        if win_u is not None:
            eligible = eligible & (
                (F.size(acc) == 0)
                | (e["t"] <= F.try_element_at(acc, F.lit(1)) + F.lit(win_u))
            )
        return F.when(eligible, F.concat(acc, F.array(e["t"]))).otherwise(acc)

    if chunk_seconds is not None:
        if int(chunk_seconds) <= 0:
            raise ValueError(
                f"chunk_seconds must be positive; got {chunk_seconds}"
            )
        chunk_u = int(chunk_seconds) * (1 if raw else 1_000_000)
        grouped = _funnel_chunked(
            slim, keys, k, chunk_u, win_u, strict_increase
        )
    else:
        chain = F.aggregate(
            timeline, F.array().cast("array<long>"), _fold
        ).alias("__chain")
        grouped = slim.groupBy(*keys).agg(chain)
    return grouped.select(
        *keys,
        F.size("__chain").alias("depth"),
        *[
            F.try_element_at("__chain", F.lit(i)).alias(f"t{i}")
            for i in range(1, k + 1)
        ],
    )


def _suffixes_expr(timeline, k: int, strict_increase: bool):
    """The k ENTRY-STATE chain suffixes over a sorted (t, s) timeline:
    suffix j is the greedy chain assuming steps 1..j-1 matched before
    this chunk (so the first pick has no lower time bound), UNCAPPED —
    the window applies at stitch time.  Pure column folds."""

    def _fold_from(j):
        def f(acc, e):
            after_prev = (
                e["t"] > F.try_element_at(acc, F.lit(-1))
                if strict_increase
                else e["t"] >= F.try_element_at(acc, F.lit(-1))
            )
            eligible = (
                (e["s"] == F.size(acc) + j)
                & ((F.size(acc) == 0) | after_prev)
            )
            return F.when(
                eligible, F.concat(acc, F.array(e["t"]))
            ).otherwise(acc)

        return f

    return F.array(
        *[
            F.aggregate(timeline, F.array().cast("array<long>"), _fold_from(j))
            for j in range(1, k + 1)
        ]
    )


def _stitch_chunks(per_chunk, keys, k, win_u, chunk_col, sufs_col,
                   validate=False):
    """Fold per-(keys, chunk) suffix rows in chunk order into the
    chain: with c steps matched so far, append entry-state-(c+1)'s
    suffix, window-capped against t1 — a plain array filter, exact
    because suffix times ascend and the greedy takes the earliest
    eligible event, so the first capped-out element already proves no
    later event of its step qualifies.

    ``validate=True`` raises (loudly, naming the key) when a (keys,
    chunk) pair appears more than once — a duplicated chunk row would
    silently double-count its chunk's events.  The check is a per-group
    array-distinct comparison over the ALREADY-collected chunk list, so
    it costs no extra exchange or scan."""

    def _stitch(acc, e):
        cur = F.size(acc)
        suf = F.try_element_at(e["v"], cur + 1)
        if win_u is not None:
            t1 = F.when(cur == 0, F.try_element_at(suf, F.lit(1))).otherwise(
                F.try_element_at(acc, F.lit(1))
            )
            suf = F.filter(suf, lambda x: x <= t1 + F.lit(win_u))
        return F.when(cur >= k, acc).otherwise(
            F.concat(acc, F.coalesce(suf, F.array().cast("array<long>")))
        )

    chunks_tl = F.sort_array(
        F.collect_list(
            F.struct(F.col(chunk_col).alias("c"), F.col(sufs_col).alias("v"))
        )
    )
    if validate:
        ids = F.transform(chunks_tl, lambda x: x["c"])
        chunks_tl = F.when(
            F.size(F.array_distinct(ids)) < F.size(ids),
            F.raise_error(
                F.concat(
                    F.lit(
                        "funnel_from_chunks: duplicate (keys, chunk) "
                        "row — a chunk pre-fold must appear exactly "
                        "once per key or its events double-count; "
                        "offending key: "
                    ),
                    F.to_json(F.struct(*[F.col(c) for c in keys])),
                    F.lit("  chunks: "),
                    F.to_json(ids),
                )
            ),
        ).otherwise(chunks_tl)
    return per_chunk.groupBy(*keys).agg(
        F.aggregate(
            chunks_tl, F.array().cast("array<long>"), _stitch
        ).alias("__chain")
    )


def _funnel_chunked(slim, keys, k, chunk_u, win_u, strict_increase):
    """The chunked pre-fold + stitch (funnel's chunk_seconds path).

    Per (keys, floor(ts/chunk)) group: the same sorted-timeline greedy
    runs k times, once per ENTRY STATE j (= steps 1..j-1 already
    matched before this chunk, so the first pick has no lower time
    bound — every in-chunk event is later than any earlier-chunk match
    because equal timestamps share a chunk), each UNCAPPED, yielding k
    chain suffixes of <= k timestamps.  The keys-only stitch
    (:func:`_stitch_chunks`) then folds chunks in time order."""
    timeline = _timeline_expr()
    per_chunk = (
        slim.withColumn("__chunk", F.floor(F.col("__tsu") / chunk_u))
        .groupBy(*keys, "__chunk")
        .agg(_suffixes_expr(timeline, k, strict_increase).alias("__sufs"))
    )
    return _stitch_chunks(per_chunk, keys, k, win_u, "__chunk", "__sufs")


def funnel_from_chunks(
    chunks: DataFrame,
    on: str | list[str],
    n_steps: int,
    window_seconds: int | None = None,
    raw: bool = False,
    chunk_col: str = "chunk",
    sufs_col: str = "sufs",
    validate: bool = True,
) -> DataFrame:
    """The BATCH stitch over accumulated per-(key, chunk) suffix rows —
    the second half of funnel's chunked decomposition, exposed for the
    streaming split: ``streaming/ingest.funnel_chunks_stream`` emits
    finalized chunk pre-folds under a watermark, this folds them into
    chains exactly as ``funnel(chunk_seconds=...)`` would
    (stream≡batch pinned in tests/test_streaming.py).

    ``chunks``  (keys..., chunk_col long, sufs_col array<array<long>>
    of n_steps entry-state suffixes in epoch MICROS — or raw units
    with ``raw=True``, matching ``window_seconds``'s unit rule).
    Output: funnel's shape — keys, depth, t1..t<n_steps>.

    Chunk rows must be one per (keys, chunk) with COMPLETE suffixes
    for that chunk (the watermark guarantee); a duplicated or partial
    chunk row would double-count or truncate its chunk.  The
    one-per-(keys, chunk) half of that contract is ENFORCED by default
    (``validate=True``): a duplicate chunk id raises, naming the key —
    a free array check over the already-collected chunk list, no extra
    exchange.  Pass ``validate=False`` on trusted input (e.g. the
    shipped streaming sink, whose watermark guarantees uniqueness) to
    skip it; completeness of each suffix row is not checkable here."""
    k = int(n_steps)
    if not 2 <= k <= 8:
        raise ValueError(f"funnel needs 2..8 steps; got {k}")
    keys = [on] if isinstance(on, str) else list(on)
    # same output-name hygiene as funnel(): keys may not collide with
    # the depth/t<i> outputs or use the reserved prefix
    taken = {"depth", *[f"t{i}" for i in range(1, k + 1)]} & set(keys)
    if taken:
        raise ValueError(
            f"key column(s) {sorted(taken)} collide with the output "
            "depth/t<i> columns; rename the keys first"
        )
    reserved = [c for c in keys if c.startswith("__")]
    if reserved:
        raise ValueError(
            f"key column(s) {reserved} use the reserved __ prefix"
        )
    missing = [
        c for c in (*keys, chunk_col, sufs_col) if c not in chunks.columns
    ]
    if missing:
        raise ValueError(
            f"chunks frame lacks column(s) {missing} — expected the "
            "funnel_chunks_stream sink shape (keys..., chunk, sufs)"
        )
    win_u = (
        None
        if window_seconds is None
        else int(window_seconds) * (1 if raw else 1_000_000)
    )
    grouped = _stitch_chunks(
        chunks, keys, k, win_u, chunk_col, sufs_col, validate=validate
    )
    return grouped.select(
        *keys,
        F.size("__chain").alias("depth"),
        *[
            F.try_element_at("__chain", F.lit(i)).alias(f"t{i}")
            for i in range(1, k + 1)
        ],
    )


def retention_from_activity(
    activity: DataFrame,
    on: str | list[str] = "user_id",
    period_col: str = "period",
    max_periods: int = 12,
) -> DataFrame:
    """The BATCH cohort fold over pre-binned (key, period) activity —
    retention's second half, exposed for the streaming split:
    ``streaming/ingest.retention_activity_stream`` emits one row per
    (key, active period) under a watermark, this computes the
    retention triangle exactly as ``retention`` does from raw events
    (stream≡batch pinned).  Duplicate (key, period) rows are fine —
    the set collect dedups.  Output: retention's shape (cohort,
    offset, n_active, n_cohort, retention)."""
    from pyspark.sql.window import Window

    if int(max_periods) < 0:
        raise ValueError(f"max_periods must be >= 0; got {max_periods}")
    keys = [on] if isinstance(on, str) else list(on)
    per_key = (
        activity.filter(F.col(period_col).isNotNull())
        .select(*keys, F.col(period_col).cast("long").alias("__p"))
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_set("__p")).alias("__ps"))
    )
    rows = per_key.select(
        F.col("__ps")[0].alias("cohort"),
        F.explode("__ps").alias("__p"),
    ).withColumn("offset", (F.col("__p") - F.col("cohort")).cast("int"))
    act = (
        rows.filter(F.col("offset") <= max_periods)
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    n_cohort = F.max(
        F.when(F.col("offset") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort"))
    return act.withColumn("n_cohort", n_cohort).withColumn(
        "retention",
        F.col("n_active").cast("double") / F.col("n_cohort"),
    )


def funnel_summary(per_key: DataFrame, n_steps: int) -> DataFrame:
    """Fold a :func:`funnel` result into the report shape: one row per
    step with ``reached`` = keys whose depth is at least that step and
    ``conversion`` = reached / previous step's reached (step 1 divides
    by the total key count, i.e. every key with any funnel activity;
    NULL when the denominator is 0).  ONE aggregate over the per-key
    frame, then ``n_steps`` literal rows — nothing scales with keys."""
    row = per_key.agg(
        F.count(F.lit(1)).alias("__n0"),
        *[
            F.sum((F.col("depth") >= i).cast("long")).alias(f"__n{i}")
            for i in range(1, n_steps + 1)
        ],
    )
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step"),
                        F.col(f"__n{i}").alias("reached"),
                        F.col(f"__n{i - 1}").alias("__prev"),
                    )
                    for i in range(1, n_steps + 1)
                ]
            )
        ).alias("s")
    ).select(
        F.col("s.step").alias("step"),
        F.col("s.reached").alias("reached"),
        F.when(
            F.col("s.__prev") > 0,
            F.col("s.reached").cast("double") / F.col("s.__prev"),
        ).alias("conversion"),
    )


def retention(
    events: DataFrame,
    on: str | list[str] = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604800,
    max_periods: int = 12,
) -> DataFrame:
    """Cohort retention: keys grouped by the period of their FIRST
    event (the cohort), and for each later period the fraction still
    active — the triangle every product dashboard draws, next to
    :func:`funnel` and sessionization in the event-analytics set.

    Output, one row per (cohort, offset) that had any activity:
      ``cohort``    the cohort's period id (``floor(first_ts / period)``,
                    long; multiply back for the period start)
      ``offset``    periods since the cohort period (0..``max_periods``)
      ``n_active``  distinct keys of that cohort active in that period
      ``n_cohort``  the cohort's size (= ``n_active`` at offset 0, by
                    construction: the first period is always active)
      ``retention`` ``n_active / n_cohort``

    Plan, ONE exchange over raw data: each key's distinct active
    periods collect as a sorted SET in a single keyed aggregate
    (map-side partial set merge — a key active in 10^8 events in one
    period still contributes one set element; set size is bounded by
    time-range/period, e.g. five years of weeks = 260), the cohort is
    the set's first element, offsets explode from the set, and
    because (key, period) pairs are distinct by construction the
    final per-(cohort, offset) count is a plain count(*) — no
    count_distinct expansion.  Two further exchanges touch only the
    compact frames: the (cohort, offset) aggregate and the tiny
    n_cohort window over the result rows.

    Numeric-epoch mode as elsewhere: an all-integer ``ts_col`` buckets
    on the raw integers and ``period_seconds`` reads in the raw unit.
    NULL timestamps are dropped up front; NULL keys form their own
    cohort member, as groupBy treats them.
    """
    if int(period_seconds) <= 0:
        raise ValueError(
            f"period_seconds must be positive; got {period_seconds}"
        )
    if int(max_periods) < 0:
        raise ValueError(f"max_periods must be >= 0; got {max_periods}")
    keys = [on] if isinstance(on, str) else list(on)
    taken = {"cohort", "offset", "n_active", "n_cohort", "retention"} & set(
        keys
    )
    if taken:
        raise ValueError(
            f"key column(s) {sorted(taken)} collide with the output "
            "columns; rename the keys first"
        )
    raw = _raw_time_mode((events, [ts_col]))
    tsu = (
        F.col(ts_col).cast("long")
        if raw
        else F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    per_u = int(period_seconds) * (1 if raw else 1_000_000)
    # bin, then the shared cohort fold — (key, period) pairs dedup in
    # retention_from_activity's set collect, so the per-cell count is
    # a plain count(*), no count_distinct Expand
    binned = events.filter(tsu.isNotNull()).select(
        *keys, F.floor(tsu / per_u).cast("long").alias("__period")
    )
    return retention_from_activity(binned, keys, "__period", max_periods)
