"""Temporal joins: as-of and range (point-in-interval) — the two
classic time-series operators the DataFrame API has no primitive for,
named in this engine's design brief as the canonical "custom operator"
cases.

**As-of join** (the trades/quotes join): for each left row, the LATEST
right row of the same key with ``right.ts <= left.ts`` (optionally
within a tolerance).  The naive formulation is an inequality join —
O(L x R) per key — and Spark has no ASOF keyword.  The scalable
formulation used here is the classic union trick: tag both sides, union
them, sort each key's timeline once (right rows before left rows at
equal timestamps, so the boundary is inclusive), and carry the last
right row forward with ``last(struct, ignorenulls=True)`` over an
unbounded-preceding row frame.  ONE exchange (the key), ONE window
pass, no inequality join anywhere.  The right row travels as a STRUCT
so its columns can never mix across rows (per-column ``last`` would
pair column A of one row with column B of another whenever right-side
values contain NULLs).

**Range join** (point-in-interval): pair each point with the intervals
of its key that contain it.  The naive form is again an inequality
join; the scalable form buckets time — each interval replicates to the
fixed-width buckets it covers, points join on (key, bucket) equality,
and the exact containment predicate filters.  A (point, interval) pair
can only meet in the point's own bucket, so no dedup stage is needed.
Pick ``bucket_seconds`` near the typical interval length: too small
replicates intervals, too large inflates the per-bucket candidate set.

Both replay exactly in SQL (DuckDB has a native ASOF JOIN; the range
predicate is a plain inequality join at oracle scale), which is what
certifies them — see __spark_entry__ ``event_asof``.

Reference parity: none (no temporal surface in the reference);
extension-axis alongside operators/stats.py's sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "clamp_intervals",
    "interval_join",
    "range_join",
    "split_intervals",
    "validity_intervals",
]


def _micros(col):
    return F.unix_micros(F.col(col).cast("timestamp"))


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _raw_time_mode(*sides) -> bool:
    """True when EVERY time column across the given (df, cols) pairs is
    integral — the numeric-epoch mode: bucket on the raw integers (no
    timestamp cast), so integer floor-division reproduces exactly the
    grouping the verbatim integer comparison orders by, whatever the
    epoch unit.  Any non-integral column (timestamp, date, castable
    string) keeps the micros mode for every column — mixing raw and
    cast bucketing across sides would compare different units."""
    kinds = set()
    for df, cols in sides:
        dt = dict(df.dtypes)
        for c in cols:
            kinds.add(dt[c] in _INT_TYPES)
    return kinds == {True}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    right_order_col: str | None = None,
    suffix: str = "_r",
    chunk_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: ``left``'s columns plus, per value column,
    ``<col><suffix>`` from the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key — NULL when no such
    row exists (or the match is older than ``tolerance_seconds``).
    Also emits ``ts<suffix>``, the matched right timestamp.  ``on`` may
    be a single column name or a list (multi-key equality, DuckDB's
    multi-condition ASOF); both sides must carry every key under the
    same name.

    ``direction`` (pandas merge_asof's vocabulary):
      'backward' (default)  latest right with ``rts <= lts``
      'forward'             EARLIEST right with ``rts >= lts``
      'nearest'             whichever of the two is closer in time;
                            exact ties (|lag| equal, including the
                            rts == lts case both directions see)
                            resolve BACKWARD
    All three share the one-exchange union+window plan — 'forward' is
    the same window ordered descending, 'nearest' evaluates both
    orderings over the SAME partitioning (one exchange, two sorts).
    ``tolerance_seconds`` bounds the match age in the direction's sense
    (|lag| for 'nearest').  For 'nearest' the tolerance screen is
    applied PER LEG before the closer-leg comparison — pandas
    merge_asof's candidate rule.  (With this operator's non-negative
    per-leg lags the two orders are provably equivalent anyway: if the
    closer leg exceeds the tolerance the farther leg does too — but the
    per-leg form states the pandas contract directly instead of by
    argument.)  A boundary match ``rts == lts`` is inclusive
    in every direction.  Tie-break among equal (key, ts) right rows is
    the same largest-``right_order_col``/hash rule in every direction.

    Right rows whose timestamp is NULL (or casts to NULL) are dropped
    up front: a NULL timestamp satisfies no ``right_ts <= left_ts``
    comparison, and carrying it into the timeline would make it sort
    first and masquerade as a match older than everything.

    Numeric-epoch mode, as in range_join/interval_join: when BOTH ts
    columns are integer dtypes (epoch seconds/micros/nanos — any unit),
    the timeline orders on the RAW integers with no timestamp cast
    (a bigint-micros value cast to timestamp reads as SECONDS and
    overflows the timestamp range outright), ``ts<suffix>`` comes back
    as the raw integer, and ``tolerance_seconds``/``chunk_seconds`` are
    read in the columns' own unit.  Mixed integer/temporal pairs keep
    the cast path (an int-seconds column against a timestamp column is
    the one mixed case the cast handles correctly).

    ``right_order_col``: tie-break among right rows sharing (key, ts);
    the LARGEST wins (the latest writer).  Without it the tie-break
    falls back to ``xxhash64`` of the right payload struct — an
    arbitrary but DETERMINISTIC winner, so reruns and retried tasks
    agree (fully identical duplicate rows tie harmlessly: either copy
    carries the same payload).  Pass a real order column whenever the
    collision winner is semantically meaningful (e.g. a sequence
    number); the hash fallback only guarantees stability, not
    latest-writer semantics.

    Skew boundary and its escape hatch: the single window serializes
    each key in one task — a pathologically hot key (one key holding
    ~10^8 rows) becomes a straggler, inherent to any windowed as-of.
    ``chunk_seconds`` is the opt-in two-pass fix, available in EVERY
    direction: both sides split into fixed ``chunk_seconds`` periods,
    the window partitions by (key, chunk) — per-chunk parallelism, the
    hot key's timeline now spreads across tasks — and each chunk's
    unmatched left rows patch from a one-row-per-(key, chunk) boundary
    summary of the right side: the latest CLOSING right row of earlier
    chunks for the backward leg, the earliest OPENING right row of
    later chunks for the forward leg (the same plan time-reversed),
    and both for 'nearest'.  Boundary summaries are one row per
    (key, chunk), so the per-key serialized pass shrinks from #rows to
    #chunks.  Answers are identical to the plain operator for every
    input and direction (property-tested); pick a chunk near the hot
    key's natural period (e.g. a day).  For non-skewed keys prefer the
    plain single-window form — the extra exchanges buy nothing there.
    Alternatively cap/sample the hot key upstream the way
    ``cap_per_group`` does for sampling.
    """
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward', or 'nearest'; "
            f"got {direction!r}"
        )

    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts_col or ts_col
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, rts)]

    # numeric-epoch mode (see docstring): both ts columns integral =>
    # order on the raw integers, tolerance/chunk in raw units
    raw = _raw_time_mode((left, [ts_col]), (right, [rts]))
    tsx = (
        (lambda c: F.col(c).cast("long"))
        if raw
        else (lambda c: F.col(c).cast("timestamp"))
    )
    us = (lambda e: e) if raw else F.unix_micros
    unit = 1 if raw else 1_000_000

    # NULL right timestamps can never match (see docstring); dropping
    # them also keeps ts_r a reliable "matched" sentinel downstream
    right = right.filter(tsx(rts).isNotNull())

    payload = F.struct(
        tsx(rts).alias("__rts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    order = (
        F.col(right_order_col) if right_order_col else F.xxhash64(payload)
    )
    r = right.select(
        *[F.col(k).alias(k) for k in keys],
        tsx(rts).alias("__ts"),
        F.lit(0).alias("__side"),
        order.alias("__ord"),
        payload.alias("__rv"),
    )
    l = left.select(
        *[F.col(k).alias(k) for k in keys],
        tsx(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__ord"].dataType).alias("__ord"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r = r.withColumn(
        "__lrow", F.lit(None).cast(l.schema["__lrow"].dataType)
    )
    part_cols = list(keys)
    if chunk_seconds is not None:
        ck_us = int(chunk_seconds) * unit
        # floor, not a truncating cast: pre-epoch timestamps are
        # negative micros and must bucket downward like range_join's
        ck = F.floor(us(F.col("__ts")) / ck_us).cast("long")
        l, r = l.withColumn("__ck", ck), r.withColumn("__ck", ck)
        part_cols = [*keys, "__ck"]
    # right rows sort BEFORE left rows at the same instant (side 0 < 1):
    # the boundary right.ts == left.ts is an inclusive match; among
    # equal right timestamps the largest __ord sorts last and wins.
    # The forward window is the same traversal time-reversed
    # (desc_nulls_first so a NULL left ts still sees nothing); 'nearest'
    # evaluates both over the SAME partitioning — one exchange, two
    # sorts.
    w_b = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__ord"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy(*part_cols)
        .orderBy(
            F.col("__ts").desc_nulls_first(), F.col("__side"), F.col("__ord")
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = l.unionByName(r)
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    carried = u
    if need_b:
        carried = carried.withColumn(
            "__mb", F.last("__rv", ignorenulls=True).over(w_b)
        )
    if need_f:
        carried = carried.withColumn(
            "__mf", F.last("__rv", ignorenulls=True).over(w_f)
        )
    carried = carried.filter(F.col("__side") == 1)
    if chunk_seconds is not None:
        # pass 2 — patch across chunk boundaries with one-row-per-
        # (key, chunk) BOUNDARY SUMMARIES of the right side:
        #   closing = the max by (ts, ord), exactly the row the backward
        #             window carries at the chunk's end;
        #   opening = the min by ts / max by ord, exactly the row the
        #             forward window carries at the chunk's start.
        # Chunk timestamps are monotone in the chunk id, so a left
        # chunk's correct out-of-chunk backward match is the latest
        # closing among STRICTLY EARLIER chunks, and its forward match
        # the earliest opening among STRICTLY LATER chunks (every right
        # row of a later chunk is at-or-after every left ts of this
        # one).  Probes sort before summaries at the same chunk id in
        # BOTH traversals — pass 1 already resolved in-chunk
        # visibility.  One timeline, one (key)-partitioned exchange,
        # one sort per needed leg.
        probes = l.select(*keys, "__ck").distinct()
        rv_t = r.schema["__rv"].dataType
        tl = probes.select(
            *keys,
            "__ck",
            F.lit(0).alias("__cside"),
            F.lit(None).cast(rv_t).alias("__cv"),
            F.lit(None).cast(rv_t).alias("__ov"),
        )
        if need_b:
            closing = r.groupBy(*keys, "__ck").agg(
                F.max_by("__rv", F.struct("__ts", "__ord")).alias("__cv")
            )
            tl = tl.unionByName(
                closing.select(
                    *keys, "__ck", F.lit(1).alias("__cside"), "__cv",
                    F.lit(None).cast(rv_t).alias("__ov"),
                )
            )
        if need_f:
            # min ts, max ord among ties: max_by over (negated micros,
            # ord) — ord's type is caller-chosen, so negate the ts leg
            opening = r.groupBy(*keys, "__ck").agg(
                F.max_by(
                    "__rv",
                    F.struct(
                        (-us(F.col("__ts"))).alias("__nts"),
                        F.col("__ord"),
                    ),
                ).alias("__ov")
            )
            tl = tl.unionByName(
                opening.select(
                    *keys, "__ck", F.lit(1).alias("__cside"),
                    F.lit(None).cast(rv_t).alias("__cv"), "__ov",
                )
            )
        wc_b = (
            Window.partitionBy(*keys)
            .orderBy("__ck", "__cside")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # desc_nulls_first: a NULL-ts left row has a NULL chunk id and
        # must see NO openings (the plain forward window shows it
        # nothing); default desc puts NULLs last, where it would wrongly
        # inherit the earliest real opening
        wc_f = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ck").desc_nulls_first(), "__cside")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        if need_b:
            tl = tl.withColumn(
                "__carry_b", F.last("__cv", ignorenulls=True).over(wc_b)
            )
        if need_f:
            tl = tl.withColumn(
                "__carry_f", F.last("__ov", ignorenulls=True).over(wc_f)
            )
        carry = tl.filter(F.col("__cside") == 0).select(
            *[F.col(k).alias(f"__ca_{i}") for i, k in enumerate(keys)],
            F.col("__ck").alias("__ca_ck"),
            *(["__carry_b"] if need_b else []),
            *(["__carry_f"] if need_f else []),
        )
        # NULL-SAFE equality: the pass-1 window groups NULL keys together
        # (they match each other, same as the plain operator), so the
        # patch join must too — a plain equality join would silently
        # skip cross-chunk matches for NULL-keyed rows and diverge from
        # the unchunked plan
        cond = F.col("__ck").eqNullSafe(F.col("__ca_ck"))
        for i, k in enumerate(keys):
            cond = cond & F.col(k).eqNullSafe(F.col(f"__ca_{i}"))
        carried = carried.join(carry, cond, "left")
        if need_b:
            carried = carried.withColumn(
                "__mb", F.coalesce("__mb", "__carry_b")
            ).drop("__carry_b")
        if need_f:
            carried = carried.withColumn(
                "__mf", F.coalesce("__mf", "__carry_f")
            ).drop("__carry_f")
        carried = carried.drop(
            "__ca_ck", *[f"__ca_{i}" for i in range(len(keys))]
        )
    if tolerance_seconds is not None:
        # PER LEG, before the nearest comparison (pandas merge_asof's
        # candidate rule; equivalent either way for this operator —
        # see the docstring — but per-leg states the contract directly)
        tol_us = tolerance_seconds * unit
        lts_us = us(F.col("__ts"))
        if need_b:
            carried = carried.withColumn(
                "__mb",
                F.when(
                    lts_us - us(F.col("__mb.__rts")) <= tol_us,
                    F.col("__mb"),
                ),
            )
        if need_f:
            carried = carried.withColumn(
                "__mf",
                F.when(
                    us(F.col("__mf.__rts")) - lts_us <= tol_us,
                    F.col("__mf"),
                ),
            )
    if direction == "backward":
        carried = carried.withColumnRenamed("__mb", "__match")
    elif direction == "forward":
        carried = carried.withColumnRenamed("__mf", "__match")
    else:  # nearest: closer of the two surviving legs, exact ties backward
        lts_us = us(F.col("__ts"))
        lag_b = lts_us - us(F.col("__mb.__rts"))
        lag_f = us(F.col("__mf.__rts")) - lts_us
        carried = carried.withColumn(
            "__match",
            F.when(F.col("__mf").isNull(), F.col("__mb"))
            .when(F.col("__mb").isNull(), F.col("__mf"))
            .when(lag_b <= lag_f, F.col("__mb"))
            .otherwise(F.col("__mf")),
        ).drop("__mb", "__mf")
    out_left = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_right = [F.col("__match.__rts").alias(f"ts{suffix}")] + [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in value_cols
    ]
    return carried.select(*out_left, *out_right)


def clamp_intervals(
    df: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    max_seconds: int = 86400,
) -> DataFrame:
    """Cap every interval at ``max_seconds``: ``end`` becomes
    ``min(end, start + max_seconds)``.  A SCREEN, not an equivalence —
    containment/overlap beyond the cap is discarded by design (the
    usual reading: an interval open for a year is a data bug, not a
    year of intent).  Use :func:`split_intervals` or the joins'
    ``long_interval_buckets`` instead when the long tail is real and
    answers must be preserved.  Numeric-epoch columns (all-integer, as
    in range_join) read ``max_seconds`` in their own raw unit."""
    raw = _raw_time_mode((df, [start_col, end_col]))
    if raw:
        # arithmetic in long: int-typed epochs near the dtype max would
        # wrap on start + max_seconds (non-ANSI overflow); least() of
        # the LONG values is <= end, so the cast back always fits
        capped = F.least(
            F.col(end_col).cast("long"),
            F.col(start_col).cast("long") + F.lit(int(max_seconds)),
        ).cast(df.schema[end_col].dataType)
    else:
        capped = F.least(
            F.col(end_col).cast("timestamp"),
            F.timestamp_micros(
                _micros(start_col) + F.lit(int(max_seconds) * 1_000_000)
            ),
        )
    return df.withColumn(end_col, capped)


def split_intervals(
    df: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    tile_seconds: int = 86400,
    orig_prefix: str = "orig_",
) -> DataFrame:
    """Break each closed interval into grid-aligned tiles of width
    ``tile_seconds``: one output row per tile, ``start_col``/``end_col``
    REPLACED by the tile's (clamped) bounds, and the parent span
    preserved at ``<orig_prefix><start_col>`` / ``<orig_prefix><end_col>``.
    Tiles are disjoint at the data's resolution (a tile ends 1 µs — or
    1 raw unit for all-integer columns — before the next begins) and
    cover the parent exactly, so:

    - ``range_join`` over the tiles is answer-preserving AS IS: a
      contained point falls in exactly one tile of its parent, and the
      output row carries the parent bounds in the orig columns.
    - ``interval_join`` over tiles needs one extra keep filter (an
      overlapping parent pair meets once per overlapping TILE pair):
      keep only the tile pair containing the overlap's first instant
      ``greatest(orig_l_start, orig_r_start)`` — exactly one such pair
      exists, the same first-instant rule the join already uses for
      buckets.  Prefer ``interval_join(long_interval_buckets=...)``,
      which routes long intervals around the explode entirely.

    Splitting bounds the per-row explode burst (a year-long interval at
    day tiles emits 365 bounded rows instead of one row fanning out
    ~9,000x at hourly buckets) but NOT the total bucket-row count — the
    tiles still cover the same span.  For the total-work fix see the
    joins' ``long_interval_buckets``.  Inverted parents (end < start)
    are dropped, as in the joins."""
    taken = {f"{orig_prefix}{start_col}", f"{orig_prefix}{end_col}"} & set(
        df.columns
    )
    if taken:
        raise ValueError(
            f"split_intervals would overwrite existing column(s) "
            f"{sorted(taken)} (already-split frame?); pass a different "
            "orig_prefix or re-split from the parent spans"
        )
    raw = _raw_time_mode((df, [start_col, end_col]))
    t_u = int(tile_seconds) * (1 if raw else 1_000_000)
    tx = (lambda c: F.col(c).cast("long")) if raw else _micros
    df = df.filter(tx(start_col) <= tx(end_col))
    tiled = df.withColumn(
        "__tile",
        F.explode(
            F.sequence(
                F.floor(tx(start_col) / t_u).cast("long"),
                F.floor(tx(end_col) / t_u).cast("long"),
            )
        ),
    )
    lo = F.greatest(tx(start_col), F.col("__tile") * t_u)
    hi = F.least(tx(end_col), (F.col("__tile") + 1) * t_u - 1)
    if raw:
        s_t, e_t = df.schema[start_col].dataType, df.schema[end_col].dataType
        lo, hi = lo.cast(s_t), hi.cast(e_t)
    else:
        lo, hi = F.timestamp_micros(lo), F.timestamp_micros(hi)
    return tiled.select(
        *[c for c in df.columns if c not in (start_col, end_col)],
        F.col(start_col).alias(f"{orig_prefix}{start_col}"),
        F.col(end_col).alias(f"{orig_prefix}{end_col}"),
        lo.alias(start_col),
        hi.alias(end_col),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int | None = None,
    long_interval_buckets: int | None = None,
) -> DataFrame:
    """Inner point-in-interval join: one row per (point, containing
    interval) pair of the same key, ``start <= ts <= end`` inclusive —
    points' columns plus the interval's.  ``on`` may be a single column
    name or a list (multi-key equality, e.g. sessions x campaigns keyed
    (user, campaign)); both sides must carry every key under the same
    name.  Equality-join on
    (keys..., time-bucket) with the exact predicate as a post-filter;
    the interval side replicates per covered bucket, the point side
    never duplicates (a pair meets only in the point's own bucket).

    ``bucket_seconds=None`` (the default) auto-tunes: the median
    interval length of the actual data, snapped to a fixed grid
    (plans/tuning.tune_range) — one extra aggregate job per side at
    plan time, nothing per-query.  The same measurement also SELF-ARMS
    ``long_interval_buckets`` when the p99 interval span exceeds
    LONG_TAIL_BUCKETS buckets (the year-long "no expiry" shape) and
    the caller left it None — answers are identical either way, so
    auto mode simply refuses to let one pathological row replicate
    unboundedly.  Pass an explicit width to skip the measurement (e.g.
    when the typical interval length is known or the same tables join
    repeatedly); explicit values pin both knobs.  Any width computes
    the same answer; these knobs are purely about replication vs
    candidate-set size.

    Numeric-epoch mode: when ts/start/end are ALL integer columns
    (epoch seconds, micros, nanos — any unit), buckets come from the
    RAW integers (no timestamp cast) and ``bucket_seconds`` is read in
    the columns' own unit; the auto-tuner then snaps to a 1-2-5 decade
    ladder instead of the seconds grid.  Mixed or castable-string
    columns keep the cast-to-timestamp path.

    Malformed intervals (``end < start``) are dropped BEFORE the bucket
    explode: they can contain no point (``start <= ts <= end`` is
    unsatisfiable), and without the filter Spark's ``sequence`` would
    silently generate a DESCENDING bucket list for them (default step
    -1 when start > stop), replicating garbage buckets that only the
    containment filter pays to discard.

    Skew boundary and its escape hatch: an interval spanning B buckets
    emits B rows — one open-ended or year-long interval at hourly
    buckets replicates ~9,000x.  Pick ``bucket_seconds`` near the
    TYPICAL interval length; for a real long tail set
    ``long_interval_buckets=N``: intervals spanning more than N buckets
    SKIP the explode and take a plain key-equality join + containment
    filter instead (they are rare by construction — that is what makes
    them pathological — so the native leg's per-key pair enumeration is
    cheap), and the two disjoint strata union.  Answers are identical
    for every input and threshold (property-tested); replication per
    interval row is then BOUNDED by N.  For a hard screen instead, see
    :func:`clamp_intervals`; :func:`split_intervals` bounds the per-row
    explode burst when intervals must stay on the bucketed path."""
    keys = [on] if isinstance(on, str) else list(on)
    # numeric-epoch mode: all-integer time columns bucket on the RAW
    # integers and bucket_seconds is read in the columns' own unit
    # (floor-division groups consistently for ANY positive width, so
    # this is a tuning knob, not a semantics change) — int-epoch event
    # tables get the bucketed plan without a cast (VERDICT r8 #4)
    raw = _raw_time_mode(
        (points, [ts_col]), (intervals, [start_col, end_col])
    )
    if bucket_seconds is None:
        from fabstir_vectordb_spark.plans.tuning import tune_range

        plan = tune_range(
            points, intervals, keys,
            ts_col=ts_col, start_col=start_col, end_col=end_col,
        )
        bucket_seconds = plan.bucket_seconds
        # auto mode also self-arms the long-tail stratification when
        # the tuner's p99 span measurement says the tail is
        # pathological (> LONG_TAIL_BUCKETS buckets per row) — answers
        # identical either way, replication bounded.  An explicit
        # long_interval_buckets (or explicit bucket_seconds) pins it.
        if long_interval_buckets is None:
            long_interval_buckets = plan.long_interval_buckets
    tx = (lambda c: F.col(c).cast("long")) if raw else _micros
    b_u = int(bucket_seconds) * (1 if raw else 1_000_000)
    intervals = intervals.filter(tx(start_col) <= tx(end_col))
    contains = (tx(ts_col) >= tx(start_col)) & (tx(ts_col) <= tx(end_col))
    native_iv = None
    if long_interval_buckets is not None:
        # stratify: intervals spanning more than N buckets skip the
        # explode — rare by construction, so the native per-key pair
        # enumeration is cheap — and replication per row is bounded by N
        span = F.floor(tx(end_col) / b_u) - F.floor(tx(start_col) / b_u)
        native_iv = intervals.filter(span > long_interval_buckets)
        intervals = intervals.filter(span <= long_interval_buckets)
    p = points.withColumn("__bkt", F.floor(tx(ts_col) / b_u).cast("long"))
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(tx(start_col) / b_u).cast("long"),
                F.floor(tx(end_col) / b_u).cast("long"),
            )
        ),
    )
    joined = p.join(iv, [*keys, "__bkt"]).filter(contains).drop("__bkt")
    if native_iv is not None:
        joined = joined.unionByName(
            points.join(native_iv, keys).filter(contains)
        )
    return joined


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "rstart",
    right_end: str = "rend",
    bucket_seconds: int | None = None,
    long_interval_buckets: int | None = None,
) -> DataFrame:
    """Inner interval-OVERLAP join: one row per (left interval, right
    interval) pair of the same key whose CLOSED intervals intersect —
    ``l.start <= r.end AND r.start <= l.end`` (touching endpoints
    overlap) — with both sides' columns.  ``on`` may be a single column
    name or a list (multi-key equality); both sides must carry every
    key under the same name.  The third temporal join next
    to as-of (point→latest point) and range (point→interval): sessions
    × campaigns, downtime × incident windows, shifts × bookings.

    Scalable form: both sides replicate to the fixed-width time buckets
    they cover and equality-join on (key, bucket) with the exact
    overlap predicate as a post-filter.  An overlapping pair meets in
    EVERY shared bucket, so unlike range_join a dedup rule is needed —
    but not a dedup STAGE: the pair is kept only in the bucket of
    ``greatest(l.start, r.start)`` (the overlap's first instant, which
    both intervals cover by definition), making the join output
    duplicate-free by construction.

    Malformed intervals (``end < start``) are dropped from both sides
    before the explode, as in range_join.  Column names other than
    ``on`` must be distinct across the two frames (rename before
    joining).  ``bucket_seconds=None`` auto-tunes: the grid width
    nearest the geometric mean of the two sides' median interval
    lengths (one aggregate per side at plan time) — the same
    "bucket near the typical length" rule as range_join, balanced so
    neither side over-replicates — and the same measurement SELF-ARMS
    ``long_interval_buckets`` when either side's p99 span exceeds
    LONG_TAIL_BUCKETS buckets (answers identical; see range_join).
    Numeric-epoch mode as in range_join:
    ALL-integer bounds bucket on the raw integers, ``bucket_seconds``
    reads in the raw unit, and the auto-tuner snaps to the 1-2-5 decade
    ladder.

    Skew boundary and its escape hatch: identical to range_join's — an
    interval spanning B buckets emits B rows.  Set
    ``long_interval_buckets=N`` to stratify: intervals spanning more
    than N buckets skip the explode and pair through plain key-equality
    legs with the overlap filter (long-left x all-right, short-left x
    long-right — the three legs partition the pair space, so the union
    is duplicate-free without any distinct).  Answers are identical for
    every input and threshold (property-tested); replication per row is
    then bounded by N.  :func:`clamp_intervals` is the hard screen;
    :func:`split_intervals` + the first-instant keep filter (see its
    docstring) is the tiling recipe when rows must stay bucketed.

    Reference parity: none (no temporal surface in the reference);
    extension-axis with asof_join/range_join."""
    keys = [on] if isinstance(on, str) else list(on)
    shared = (set(left.columns) & set(right.columns)) - set(keys)
    if shared:
        raise ValueError(
            f"interval_join requires distinct column names outside the "
            f"keys; shared: {sorted(shared)} — rename one side first"
        )
    # numeric-epoch mode, as in range_join: all-integer interval bounds
    # bucket on the raw integers; bucket_seconds reads in the raw unit
    raw = _raw_time_mode(
        (left, [left_start, left_end]), (right, [right_start, right_end])
    )
    tx = (lambda c: F.col(c).cast("long")) if raw else _micros
    left = left.filter(tx(left_start) <= tx(left_end))
    right = right.filter(tx(right_start) <= tx(right_end))
    if bucket_seconds is None:
        from fabstir_vectordb_spark.plans.tuning import tune_overlap

        bucket_seconds, auto_tail = tune_overlap(
            left, right,
            (left_start, left_end), (right_start, right_end),
        )
        # auto mode self-arms the stratification on a measured
        # pathological p99 tail, as in range_join — identical answers,
        # bounded replication; explicit args pin both knobs
        if long_interval_buckets is None:
            long_interval_buckets = auto_tail
    b_u = int(bucket_seconds) * (1 if raw else 1_000_000)
    overlaps = (tx(left_start) <= tx(right_end)) & (
        tx(right_start) <= tx(left_end)
    )
    l_long = r_long = None
    if long_interval_buckets is not None:
        # stratify BOTH sides; the three legs below partition the pair
        # space — (short, short) bucketed, (long, any) native,
        # (short, long) native — so the union needs no distinct
        def _span(s, e):
            return F.floor(tx(e) / b_u) - F.floor(tx(s) / b_u)

        lspan = _span(left_start, left_end)
        rspan = _span(right_start, right_end)
        l_long = left.filter(lspan > long_interval_buckets)
        left = left.filter(lspan <= long_interval_buckets)
        r_long = right.filter(rspan > long_interval_buckets)
        r_all = right  # both right strata — the (long-left) leg's side
        right = right.filter(rspan <= long_interval_buckets)

    def _explode(df, s, e):
        return df.withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(tx(s) / b_u).cast("long"),
                    F.floor(tx(e) / b_u).cast("long"),
                )
            ),
        )

    joined = _explode(left, left_start, left_end).join(
        _explode(right, right_start, right_end), [*keys, "__bkt"]
    ).filter(
        overlaps
        # keep the pair ONLY in the overlap's first bucket — both
        # intervals cover greatest(start, start), so exactly one
        # surviving copy exists per overlapping pair
        & (
            F.floor(
                F.greatest(tx(left_start), tx(right_start)) / b_u
            ).cast("long")
            == F.col("__bkt")
        )
    ).drop("__bkt")
    if long_interval_buckets is not None:
        joined = joined.unionByName(
            l_long.join(r_all, keys).filter(overlaps)
        ).unionByName(left.join(r_long, keys).filter(overlaps))
    return joined


def validity_intervals(
    df: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    order_col: str | None = None,
    start_col: str = "start",
    end_col: str = "end",
    horizon=None,
) -> DataFrame:
    """Turn a CHANGE-EVENT log into an SCD2-style dimension of CLOSED
    validity intervals: per key, each change row becomes
    ``[start, end]`` with ``start`` = its own timestamp and ``end`` =
    1 µs (1 raw unit in numeric-epoch mode) before the key's next
    change — so :func:`range_join` on the output IS the
    as-of-dimension lookup (``start <= ts <= end`` picks exactly the
    version in effect), completing the slowly-changing-dimension
    story with the joins' own inclusive-closed convention.

    The latest change per key stays OPEN: its ``end`` is ``horizon``
    when given (a timestamp / ISO string, or a raw integer in
    numeric-epoch mode — pass the far-future sentinel your pipeline
    uses), else NULL — and a NULL end is DROPPED by
    range_join/interval_join's malformed-interval filter, so pass a
    horizon whenever current rows must be joinable.  Stated rather
    than defaulted: inventing a magic far-future constant here would
    bake an epoch assumption into every caller.  In numeric-epoch
    mode the interval columns come back in the ts column's own dtype,
    so a horizon beyond that dtype's range fails LOUDLY at run time
    (ANSI cast overflow), never wraps.

    Ties (two change rows at one (key, ts)) order by ``order_col``
    (largest = latest writer) or, absent one, by ``xxhash64`` of the
    full row — asof_join's deterministic-tie rule.  Every tied row
    but the last gets ``end < start`` (an INVERTED interval), which
    the interval joins drop by contract: superseded same-instant
    writes vanish from lookups without a distinct stage, and the
    output row count stays equal to the input's (auditable).  Rows
    whose timestamp is NULL are dropped up front, as everywhere in
    this module.

    One window over the change log — at dimension scale (changes, not
    facts) this is the cheap side; the expensive side stays the
    bucketed range_join.  Plan: one exchange on the keys.
    """
    from pyspark.sql.window import Window

    keys = [on] if isinstance(on, str) else list(on)
    taken = {start_col, end_col} & set(df.columns)
    if taken:
        raise ValueError(
            f"output column(s) {sorted(taken)} already exist on the "
            "change log; pass different start_col/end_col"
        )
    raw = _raw_time_mode((df, [ts_col]))
    tx = (
        (lambda c: F.col(c).cast("long"))
        if raw
        else (lambda c: F.unix_micros(F.col(c).cast("timestamp")))
    )
    df = df.filter(tx(ts_col).isNotNull())
    order = (
        F.col(order_col)
        if order_col
        else F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    )
    w = Window.partitionBy(*keys).orderBy(tx(ts_col), order)
    nxt = F.lead(tx(ts_col)).over(w)
    if horizon is None:
        open_end = F.lit(None).cast("long")
    elif raw:
        if not isinstance(horizon, int):
            raise ValueError(
                "horizon must be a raw integer in numeric-epoch mode; "
                f"got {type(horizon).__name__}"
            )
        open_end = F.lit(int(horizon)).cast("long")
    else:
        # derive the horizon through the SAME engine convention as the
        # data path (cast-to-timestamp honors the session timezone) —
        # a pandas parse would pin naive ISO strings to UTC and shift
        # the open-interval end by the session offset in non-UTC sessions.
        # The cast is validated on one literal row up front: in non-ANSI
        # sessions an unparsable string casts to NULL, which would
        # silently degrade every last interval to open-ended (NULL
        # valid_to) — same loud-failure rule as resample's grid bounds.
        try:
            us = (
                df.sparkSession.range(1)
                .select(
                    F.unix_micros(
                        F.lit(str(horizon)).cast("timestamp")
                    ).alias("u")
                )
                .collect()[0]["u"]
            )
        except Exception:  # ANSI sessions throw instead of NULLing
            us = None
        if us is None:
            raise ValueError(
                f"horizon value {horizon!r} does not cast to a "
                "timestamp in the session timezone"
            )
        open_end = F.lit(int(us)).cast("long")
    end_u = F.coalesce(nxt - F.lit(1), open_end)
    start_e = tx(ts_col)
    if raw:
        t = df.schema[ts_col].dataType
        start_e, end_u = start_e.cast(t), end_u.cast(t)
    else:
        start_e, end_u = (
            F.timestamp_micros(start_e), F.timestamp_micros(end_u),
        )
    return df.select(
        "*", start_e.alias(start_col), end_u.alias(end_col)
    )
