"""Time-series resampling and gap-fill: regularize an event stream
onto a fixed grid, then fill the holes.

``resample`` bins events to ``step_seconds`` buckets per key,
aggregates each bucket, DENSIFIES the grid (every bucket between each
key's first and last observation, gaps included), and fills gap values
by the caller's choice of methods:

  locf    last observation carried forward (step-function read)
  nocb    next observation carried backward (the reverse)
  interp  linear interpolation between the neighboring observed
          buckets (exact at observed buckets by construction)
  zero    ``coalesce(x, 0)`` — the right read for additive measures
          (counts, sums), where an empty bucket IS zero

This is the standard time-series "resample + fill" surface (pandas
``df.resample(...).mean().interpolate()``, TimescaleDB's
``time_bucket_gapfill`` + ``locf``/``interpolate``) re-expressed as a
Spark plan with bounded blow-up:

  1. ONE exchange aggregates events to (key, bucket) — count/sum/avg
     partial-aggregate map-side, so the shuffle carries buckets, not
     events.
  2. The dense grid generates from a ONE-ROW-PER-KEY span frame
     (min/max bucket) via ``sequence``+``explode`` — grid size is
     span/step per key, bounded by the TIME RANGE, not the row count.
     A hot key with 10^8 events in a month still yields ~720 hourly
     grid rows: resampling is itself the skew fix here, unlike the
     raw-event windows in operators/temporal.py.
  3. Fill methods are window passes per key over GRID rows (again
     span/step, never event-count) — ``last(ignorenulls)`` forward for
     locf, the reverse frame for nocb, and for interp the neighboring
     observed (bucket, value) pairs travel as structs so a value can
     never pair with another row's bucket.

The blow-up boundary is honest: a key whose span is years at 1-second
steps emits span/step grid rows whether or not it has data.  Pick
``step_seconds`` near the cadence questions are asked at; when the
data carries "1970" sentinel timestamps or open-ended history, pass
``grid_start``/``grid_end`` — the explicit window bounds the grid AND
filters the observations, so one garbage row cannot inflate a key's
grid by decades.

Numeric-epoch mode, as in operators/temporal.py: when the ts column is
an integer dtype (epoch seconds/micros/nanos — any unit),
``step_seconds`` is read in the column's own raw unit and buckets come
from integer floor-division of the raw values (no timestamp cast), so
bigint-micros event tables resample without overflow.  ``bucket_ts``
is then the raw bucket start, not a timestamp.

Rows whose timestamp is NULL (or casts to NULL) are dropped up front:
they belong to no bucket.  NULL keys form their own group, exactly as
``groupBy`` treats them (the grid join is null-safe on the keys).

Reference parity: none (no temporal surface in the reference);
extension-axis with operators/temporal.py's as-of/range/overlap joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.temporal import _raw_time_mode

__all__ = ["resample", "rolling", "rolling_buckets", "rolling_multi",
           "rolling_top_values"]

_FILL_METHODS = ("locf", "nocb", "interp", "zero")


def resample(
    df: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    step_seconds: int = 3600,
    aggs: dict[str, Column] | None = None,
    fill: dict[str, tuple[str, ...]] | None = None,
    grid_start=None,
    grid_end=None,
) -> DataFrame:
    """Resample ``df`` onto a dense fixed grid and gap-fill.

    ``on``          key column name or list of names (multi-key).
    ``step_seconds``  bucket width; raw units in numeric-epoch mode.
    ``aggs``        output-name -> aggregate Column over the bucket's
                    events (default ``{"n": count(*), "v": avg(value)}``
                    only when the frame has a ``value`` column; pass
                    explicitly otherwise).  Gap buckets carry NULL for
                    every agg except ``count``-shaped ones filled via
                    ``zero``.
    ``fill``        agg-name -> methods from {locf, nocb, interp,
                    zero}; each emits ``<name>_<method>``.  Fills read
                    per-column VALUE nullness (an observed bucket whose
                    agg is NULL — e.g. avg of all-NULL — fills like a
                    gap for that column).
    ``grid_start`` / ``grid_end``  optional explicit grid window
                    (TimescaleDB ``time_bucket_gapfill``'s start/
                    finish): a datetime or ISO string (a raw integer in
                    numeric-epoch mode), inclusive at bucket
                    granularity.  When given, the window both BOUNDS
                    the grid and FILTERS the observations — buckets
                    outside contribute nothing, so one "1970" sentinel
                    timestamp can no longer inflate a key's grid by
                    decades.  With both bounds set, every key gets the
                    SAME aligned grid (the cross-key reporting shape)
                    and grid size is constant per key by construction.
                    Each bound also works alone (clamp one side, keep
                    the other observation-driven).

    Output: keys..., ``bucket`` (long), ``bucket_ts`` (bucket start:
    timestamp, or the raw integer in numeric-epoch mode), ``is_gap``
    (no event in the bucket), the agg columns, the fill columns.
    Without explicit bounds, endpoint buckets of each key are observed
    by construction (the grid spans first..last observation), so
    inside the grid ``locf`` and ``interp`` are never NULL for a
    column observed at least once per key with non-NULL values at the
    endpoints; with bounds, leading/trailing gap buckets carry NULL
    locf/nocb respectively (interp falls back to the nearest observed
    side, as at any edge).
    """
    from pyspark.sql.window import Window

    if int(step_seconds) <= 0:
        raise ValueError(f"step_seconds must be positive; got {step_seconds}")
    keys = [on] if isinstance(on, str) else list(on)
    if aggs is None:
        aggs = {"n": F.count(F.lit(1))}
        if "value" in df.columns:
            aggs["v"] = F.avg("value")
    fill = dict(fill or {})
    # every emitted name — keys, grid columns, agg outputs, fill
    # outputs — must be distinct, or the result frame carries duplicate
    # column names that only fail downstream with an opaque error
    out_names = list(keys) + ["bucket", "bucket_ts", "is_gap"]
    for name in aggs:
        if name.startswith("__"):
            raise ValueError(f"agg name {name!r}: the __ prefix is reserved")
        out_names.append(name)
    for name, methods in fill.items():
        if name not in aggs:
            raise ValueError(f"fill names an unknown agg column {name!r}")
        bad = set(methods) - set(_FILL_METHODS)
        if bad:
            raise ValueError(
                f"unknown fill method(s) {sorted(bad)}; "
                f"choose from {_FILL_METHODS}"
            )
        out_names.extend(f"{name}_{m}" for m in methods)
    dupes = {n for n in out_names if out_names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"output column name collision: {sorted(dupes)} (keys, "
            "bucket/bucket_ts/is_gap, agg names, and <agg>_<method> "
            "fill names must all be distinct)"
        )

    raw = _raw_time_mode((df, [ts_col]))
    tx = (
        (lambda c: F.col(c).cast("long"))
        if raw
        else (lambda c: F.unix_micros(F.col(c).cast("timestamp")))
    )
    step_u = int(step_seconds) * (1 if raw else 1_000_000)

    def _bound_bucket(v, side):
        # driver-side constant: the window is part of the QUESTION, not
        # the data, so no extra job computes it
        if raw:
            if not isinstance(v, int):
                raise ValueError(
                    f"grid_{side} must be a raw integer in numeric-epoch "
                    f"mode; got {type(v).__name__}"
                )
            us = v
        else:
            # naive bounds localize to the SESSION timezone — the same
            # convention the data path's cast-to-timestamp uses, so a
            # non-UTC session cannot shift the grid window relative to
            # the column values (the validity_intervals horizon rule).
            # pandas is the no-extra-job fast path; zones or instants
            # it cannot localize the way the engine can (offset zones
            # like 'GMT+08:00', DST-gap/ambiguous local times — Spark
            # resolves all of these) fall back to ONE tiny literal-only
            # engine round-trip, correct by construction.
            import pandas as pd

            try:
                ts = pd.Timestamp(v)
                if ts.tz is None:
                    ts = ts.tz_localize(
                        df.sparkSession.conf.get(
                            "spark.sql.session.timeZone"
                        )
                    )
                us = int(ts.value // 1_000)
            except Exception:
                try:
                    us = (
                        df.sparkSession.range(1)
                        .select(
                            F.unix_micros(
                                F.lit(str(v)).cast("timestamp")
                            ).alias("u")
                        )
                        .collect()[0]["u"]
                    )
                except Exception:  # ANSI sessions throw, not NULL
                    us = None
                if us is None:
                    raise ValueError(
                        f"grid_{side} value {v!r} does not cast to a "
                        "timestamp in the session timezone"
                    )
        return us // step_u  # python floor-division: exact at any epoch

    lo = _bound_bucket(grid_start, "start") if grid_start is not None else None
    hi = _bound_bucket(grid_end, "end") if grid_end is not None else None
    if lo is not None and hi is not None and lo > hi:
        raise ValueError(
            f"grid_start bucket {lo} is after grid_end bucket {hi}"
        )

    # NULL timestamps belong to no bucket; floor (not a truncating
    # cast) so pre-epoch values bucket downward, as in range_join
    binned = (
        df.filter(tx(ts_col).isNotNull())
        .withColumn("__bkt", F.floor(tx(ts_col) / step_u).cast("long"))
        .groupBy(*keys, "__bkt")
        .agg(*[a.alias(n) for n, a in aggs.items()])
        .withColumn("__obs", F.lit(True))
    )
    # explicit bounds filter the OBSERVATIONS too: an out-of-window
    # bucket must not leak into fills (nor define a key's span)
    if lo is not None:
        binned = binned.filter(F.col("__bkt") >= lo)
    if hi is not None:
        binned = binned.filter(F.col("__bkt") <= hi)
    # one row per key -> sequence/explode: the grid never materializes
    # more than span/step rows per key, however many events the key has
    spans = binned.groupBy(*keys).agg(
        (
            F.lit(lo).cast("long") if lo is not None else F.min("__bkt")
        ).alias("__mn"),
        (
            F.lit(hi).cast("long") if hi is not None else F.max("__bkt")
        ).alias("__mx"),
    )
    grid = spans.select(
        *keys, F.explode(F.sequence("__mn", "__mx")).alias("__bkt")
    )
    # null-safe on the keys: groupBy kept NULL keys as a real group and
    # a plain equality join would silently orphan their grid rows
    b = binned.select(
        *[F.col(k).alias(f"__bk_{i}") for i, k in enumerate(keys)],
        F.col("__bkt").alias("__bb"),
        *aggs,
        "__obs",
    )
    cond = F.col("__bkt") == F.col("__bb")
    for i, k in enumerate(keys):
        cond = cond & F.col(k).eqNullSafe(F.col(f"__bk_{i}"))
    dense = grid.join(b, cond, "left").drop(
        "__bb", *[f"__bk_{i}" for i in range(len(keys))]
    )

    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bwd = (
        Window.partitionBy(*keys)
        .orderBy("__bkt")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for name, methods in fill.items():
        c = F.col(name)
        if "locf" in methods:
            dense = dense.withColumn(
                f"{name}_locf", F.last(name, ignorenulls=True).over(w_fwd)
            )
        if "nocb" in methods:
            dense = dense.withColumn(
                f"{name}_nocb", F.first(name, ignorenulls=True).over(w_bwd)
            )
        if "interp" in methods:
            # neighboring observed (bucket, value) pairs travel as ONE
            # struct so a value can never pair with another row's bucket
            obs = F.when(c.isNotNull(), F.struct(F.col("__bkt").alias("b"), c.alias("v")))
            prev = F.last(obs, ignorenulls=True).over(w_fwd)
            nxt = F.first(obs, ignorenulls=True).over(w_bwd)
            frac = (F.col("__bkt") - prev["b"]).cast("double") / (
                nxt["b"] - prev["b"]
            ).cast("double")
            dense = dense.withColumn(
                f"{name}_interp",
                F.when(c.isNotNull(), c)
                .when(prev.isNull(), nxt["v"])
                .when(nxt.isNull(), prev["v"])
                .otherwise(prev["v"] + (nxt["v"] - prev["v"]) * frac),
            )
        if "zero" in methods:
            dense = dense.withColumn(
                f"{name}_zero",
                F.coalesce(c, F.lit(0).cast(dense.schema[name].dataType)),
            )
    bucket_ts = (
        (F.col("__bkt") * step_u)
        if raw
        else F.timestamp_micros(F.col("__bkt") * step_u)
    )
    return (
        dense.withColumn("bucket_ts", bucket_ts)
        .withColumn("is_gap", F.col("__obs").isNull())
        .withColumnRenamed("__bkt", "bucket")
        .drop("__obs")
    )


_ROLL_FNS = ("sum", "mean", "avg", "min", "max", "count",
             "exact_distinct", "approx_distinct", "hist_quantile")


def _norm_roll_spec(name, spec, out_label, columns):
    """Normalize an agg spec — ``(fn, col)`` or ``(fn, col, opts)`` —
    and validate it against the input columns."""
    if not (isinstance(spec, (tuple, list)) and len(spec) in (2, 3)):
        raise ValueError(
            f"{out_label} {name!r}: spec must be (fn, col) or "
            f"(fn, col, opts); got {spec!r}"
        )
    fn, col = spec[0], spec[1]
    if len(spec) == 3 and not isinstance(spec[2], dict):
        raise ValueError(
            f"{out_label} {name!r}: the third spec element must be "
            f"an options dict; got {spec[2]!r}"
        )
    opts = dict(spec[2]) if len(spec) == 3 else {}
    if name.startswith("__"):
        raise ValueError(f"agg name {name!r}: the __ prefix is reserved")
    if fn not in _ROLL_FNS:
        raise ValueError(
            f"{out_label} {name!r}: unknown fn {fn!r}; choose from "
            f"{_ROLL_FNS}"
        )
    if fn != "count" and col is None:
        raise ValueError(
            f"{out_label} {name!r}: fn {fn!r} needs a column"
        )
    if col is not None and col not in columns:
        raise ValueError(
            f"{out_label} {name!r}: unknown column {col!r}"
        )
    return fn, col, opts


def _distinct_agg_expr(dt, fn, col, opts, where, over=None):
    """The distinct-count tier's aggregate expression, SHARED between
    the batch window path (``over`` = the frame) and the streaming
    grouped path (``over`` = None) so the dtype dispatch, cap guard,
    and defaults cannot drift between the twins.  Dispatch on the
    SOURCE dtype — the bucket-compaction contract (module docstring):

      raw column      exact: ``collect_set`` over the frame, capped;
                      approx: DataSketches HLL built over the frame.
      array column    exact over PRE-COLLECTED per-bucket sets (a
                      ``resample`` agg of ``collect_set``): union =
                      flatten + array_distinct, same cap.
      binary column   approx over PRE-BUILT per-bucket HLL sketches
                      (a ``resample`` agg of ``hll_sketch_agg``):
                      union via ``hll_union_agg`` — identical to
                      building one sketch over the frame's raw values
                      while frames stay in the sketch's exact sparse
                      regime (~384 distinct at lgk=12); past it both
                      paths hold the HLL error bound but can differ
                      by a few counts (see :func:`rolling_buckets`).
                      exact_distinct REFUSES a binary column: it
                      would silently count distinct sketch BLOBS
                      (~ observed buckets), not values.
    """
    from pyspark.sql.types import ArrayType, BinaryType

    from fabstir_vectordb_spark.operators.olap import (
        _EXACT_DISTINCT_DEFAULT_CAP, _set_guard,
    )

    def _w(e):
        return e.over(over) if over is not None else e

    if fn == "approx_distinct":
        if isinstance(dt, BinaryType):
            u = _w(F.hll_union_agg(col))
        else:
            lgk = int(opts.get("lgk", 12))
            u = _w(F.hll_sketch_agg(col, F.lit(lgk)))
        # empty/all-NULL frame: NULL estimate reads as 0 distinct
        return F.coalesce(
            F.hll_sketch_estimate(u), F.lit(0).cast("bigint")
        )
    if isinstance(dt, BinaryType):
        raise ValueError(
            f"{where}: exact_distinct cannot read a BINARY (HLL "
            "sketch) column — it would count distinct sketch blobs, "
            "not distinct values; use approx_distinct on sketch "
            "columns, or point at the raw / collect_set column"
        )
    cap = int(opts.get("cap", _EXACT_DISTINCT_DEFAULT_CAP))
    if isinstance(dt, ArrayType):
        merged = F.array_distinct(F.flatten(_w(F.collect_list(col))))
    else:
        merged = _w(F.collect_set(col))
    return F.size(_set_guard(merged, cap, where)).cast("bigint")


def _distinct_frame_val(df, fn, col, opts, frame_window, where):
    """Batch window wrapper of :func:`_distinct_agg_expr`."""
    return _distinct_agg_expr(
        df.schema[col].dataType, fn, col, opts, where,
        over=frame_window,
    )


def _hist_frame_val(df, col, opts, frame_window, out_label, name):
    """Trailing-window PERCENTILE over pre-built histogram partials:
    ``col`` is an ``array<bigint>`` fixed-grid bucket-count column
    (olap.hist_partial via a resample agg, or a summarize
    ``__hist_*`` partial), the frame fold sums the arrays elementwise
    (counts are exact longs, so the folded histogram is bit-identical
    to one built over the frame's raw values), and the read-off is
    the summary algebra's certified nearest-rank + in-bucket
    interpolation formula.  NULL over an empty frame.

    The grid comes from opts ``{'q': ..., 'lo': ..., 'hi': ...[,
    'buckets': ...]}``; when lo/hi are omitted and the column is a
    summarize partial, the grid parses from the ``__hist_<col>__
    lo<lo>_hi<hi>_n<n>`` name itself — the name IS the declaration."""
    import re as _re

    from pyspark.sql.types import ArrayType, LongType

    from fabstir_vectordb_spark.operators.olap import (
        _hist_estimate, _hist_grid, _hist_total,
    )

    dt = df.schema[col].dataType
    if not (isinstance(dt, ArrayType)
            and isinstance(dt.elementType, LongType)):
        raise ValueError(
            f"{out_label} {name!r}: hist_quantile needs an "
            f"array<bigint> histogram-partial column (build it with "
            f"olap.hist_partial in a resample/summarize agg); got "
            f"{dt.simpleString()}"
        )
    if "q" not in opts:
        raise ValueError(
            f"{out_label} {name!r}: hist_quantile needs opts['q']"
        )
    q = float(opts["q"])
    if not 0.0 < q <= 1.0:
        raise ValueError(
            f"{out_label} {name!r}: need 0 < q <= 1; got {q}"
        )
    def _s2f(tok: str) -> float:
        # inverse of olap._f2s ('.'->p, '-'->m, 'e'->E)
        return float(
            tok.replace("p", ".").replace("m", "-").replace("E", "e")
        )

    m = _re.fullmatch(
        r"__hist_\w+__lo(?P<lo>[^_]+)_hi(?P<hi>[^_]+)_n(?P<n>\d+)",
        col,
    )
    name_grid = None
    if m is not None:
        try:
            name_grid = (_s2f(m["lo"]), _s2f(m["hi"]), int(m["n"]))
        except ValueError:
            # a column that merely LOOKS like the encoding (non-_f2s
            # tokens) carries no grid declaration
            name_grid = None
    if "lo" in opts or "hi" in opts:
        lo, hi, n = _hist_grid(name, opts)
        if name_grid is not None and name_grid != (lo, hi, n):
            # the partial's NAME already declares its grid — a
            # conflicting explicit declaration must not win silently
            # (the name encoding exists precisely to catch this)
            raise ValueError(
                f"{out_label} {name!r}: opts grid [{lo}, {hi})/"
                f"{n} contradicts the grid encoded in the column "
                f"name {col!r} ({name_grid}) — drop the lo/hi opts "
                "to read the name, or point at the right column"
            )
    else:
        if name_grid is None:
            raise ValueError(
                f"{out_label} {name!r}: no grid — pass opts "
                "{'lo', 'hi'[, 'buckets']} matching the grid the "
                "partial was built with, or point at a summarize "
                "__hist_* column whose name encodes it"
            )
        lo, hi, n = name_grid
        if "buckets" in opts and int(opts["buckets"]) != n:
            raise ValueError(
                f"{out_label} {name!r}: opts buckets="
                f"{int(opts['buckets'])} contradicts the {n}-bucket "
                f"grid encoded in the column name {col!r}"
            )
    # in-plan length guard: a partial built on a DIFFERENT bucket
    # count would zip_with-pad to NULL (silently NULL estimates) —
    # fail loudly naming the mismatch instead
    guarded = F.when(
        F.col(col).isNotNull() & (F.size(F.col(col)) != n),
        F.raise_error(
            F.concat(
                F.lit(
                    f"hist_quantile {name!r}: histogram partial "
                    f"{col!r} has "
                ),
                F.size(F.col(col)).cast("string"),
                F.lit(
                    f" slots but the declared grid has {n} — the "
                    "partial was built with a different grid"
                ),
            )
        ).cast(df.schema[col].dataType),
    ).otherwise(F.col(col))
    zeros = F.array_repeat(F.lit(0).cast("bigint"), n)
    merged = F.aggregate(
        F.collect_list(guarded).over(frame_window),
        zeros,
        lambda acc, a: F.zip_with(acc, a, lambda x, y: x + y),
    )
    return _hist_estimate(merged, _hist_total(merged), q, lo, hi, n)


def _rolling_over(df, keys, aggs, min_periods, frame_window, out_label):
    """Shared body of :func:`rolling` / :func:`rolling_buckets`: attach
    one output column per agg, all over the SAME window frame — Spark
    collapses same-frame window functions into a single Window node,
    so the whole family costs ONE exchange (hash on the keys) + one
    per-key sort, however many aggregates are requested."""
    if min_periods < 1:
        raise ValueError(f"min_periods must be >= 1; got {min_periods}")
    out_names = []
    specs = {}
    for name, spec in aggs.items():
        specs[name] = _norm_roll_spec(name, spec, out_label, df.columns)
        if name in df.columns:
            raise ValueError(
                f"agg name {name!r} collides with an input column"
            )
        out_names.append(name)
    dupes = {n for n in out_names if out_names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate agg name(s): {sorted(dupes)}")

    cols = []
    for name, (fn, col, opts) in specs.items():
        src = F.lit(1) if col is None else F.col(col)
        cnt = F.count(src).over(frame_window)
        if fn == "count":
            val = cnt
        elif fn == "sum":
            val = F.sum(src).over(frame_window)
        elif fn in ("mean", "avg"):
            val = F.avg(src).over(frame_window)
        elif fn == "min":
            val = F.min(src).over(frame_window)
        elif fn == "max":
            val = F.max(src).over(frame_window)
        elif fn == "hist_quantile":
            val = _hist_frame_val(
                df, col, opts, frame_window, out_label, name
            )
        else:
            val = _distinct_frame_val(
                df, fn, col, opts, frame_window,
                f"{out_label} {name!r} frame",
            )
        if min_periods > 1:
            # pandas' min_periods rule: NULL until the frame holds at
            # least min_periods NON-NULL observations of the source —
            # for pre-compacted sources (array/binary buckets) an
            # observation is a BUCKET row, not an underlying event
            val = F.when(cnt >= min_periods, val)
        cols.append(val.alias(name))
    return df.select("*", *cols)


def rolling(
    df: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    aggs: dict[str, tuple[str, str | None]] | None = None,
    window_seconds: int = 3600,
    min_periods: int = 1,
) -> DataFrame:
    """Trailing-window aggregates per key over RAW events: for each
    row, aggregate every event of the same key in the closed interval
    ``[t - window_seconds, t]`` (TimescaleDB/ClickHouse's moving-
    aggregate shape, time-based — gaps in the event stream shrink the
    population, they do not stretch the window).

    ``aggs``  output-name -> ("sum"|"mean"|"min"|"max"|"count"|
              "exact_distinct"|"approx_distinct"|"hist_quantile",
              col[, opts]);
              col None is row count.  Default: ``{"n": ("count",
              None)}`` plus ``{"v_mean": ("mean", "value")}`` when the
              frame has a ``value`` column.  The distinct pair is the
              trailing-window "distinct users per day" dashboard
              measure, tiered exactly like the summary algebra
              (operators/olap.py): ``exact_distinct`` materializes the
              frame's value set under a loud cap (opts ``{'cap': N}``,
              default 100k — past it the plan ERRORS naming the
              mergeable alternative); ``approx_distinct`` is the
              unbounded-cardinality path (DataSketches HLL, opts
              ``{'lgk': K}``, default 12 ≈ 1.6% relative error;
              int/long/string/binary sources — cast doubles first).
              Both also accept PRE-COMPACTED per-bucket sources, the
              hot-key scale path — see :func:`rolling_buckets`.
    ``window_seconds``  trailing span; RAW units in numeric-epoch mode
              (integer ``ts_col``), the package-wide unit rule.
    ``min_periods``  outputs are NULL until the frame holds this many
              non-NULL source observations (pandas' rule).

    Output: every input row (NULL-timestamp rows dropped — they belong
    to no window) plus one column per agg.  Rows sharing (key, ts) are
    RANGE-frame peers: each sees the full peer group, so equal rows
    get equal aggregates in any engine.

    Scale: ONE hash exchange on the keys + a per-key sort (plan-pinned
    in tests).  The frame pointers advance monotonically, but Spark's
    sliding-frame evaluator RE-AGGREGATES the buffered frame whenever
    rows leave it (sum/avg/min/max are not evaluated with inverses),
    so a key's aggregate cost scales with rows x average frame
    population.  For a hot key under a dense window, pre-aggregate
    onto a grid first (:func:`resample`) and slide over buckets
    (:func:`rolling_buckets`) — events compact into at most span/step
    rows per key before any frame is evaluated, and the frame
    population is bounded by n_buckets (measured datum in
    PERFORMANCE.md §Round 11).

    Reference parity: none (no temporal surface in the reference);
    extension-axis, TimescaleDB's time-based moving aggregates as the
    public model."""
    from pyspark.sql.window import Window

    if int(window_seconds) <= 0:
        raise ValueError(
            f"window_seconds must be positive; got {window_seconds}"
        )
    if "__ord" in df.columns:
        raise ValueError(
            "input column '__ord' collides with rolling's internal "
            "order column (the __ prefix is reserved); rename it first"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if aggs is None:
        aggs = {"n": ("count", None)}
        if "value" in df.columns:
            aggs["v_mean"] = ("mean", "value")
    raw = _raw_time_mode((df, [ts_col]))
    tx = (
        F.col(ts_col).cast("long")
        if raw
        else F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    w_u = int(window_seconds) * (1 if raw else 1_000_000)
    df = df.filter(tx.isNotNull()).withColumn("__ord", tx)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ord")
        .rangeBetween(-w_u, 0)
    )
    return _rolling_over(
        df, keys, aggs, min_periods, w, "rolling agg"
    ).drop("__ord")


def rolling_buckets(
    df: DataFrame,
    on: str | list[str],
    aggs: dict[str, tuple[str, str | None]],
    n_buckets: int,
    bucket_col: str = "bucket",
    min_periods: int = 1,
) -> DataFrame:
    """Trailing-N-BUCKET aggregates over a resampled grid: for each
    grid row, aggregate the key's rows whose ``bucket_col`` lies in
    ``[bucket - (n_buckets - 1), bucket]`` — the moving average over a
    gap-filled :func:`resample` output, the dashboard staple.

    The frame is a RANGE over bucket ids, not ROWS, so it is correct
    on SPARSE grids too (a missing bucket simply contributes nothing);
    on resample's dense grid the two coincide.  Gap buckets carry NULL
    aggs, which mean/min/max ignore — slide over the ``_zero`` fill
    column instead when an empty bucket should count as zero (the
    additive-metric convention).

    Composition is the hot-key scale path: resample compacts a key's
    events to at most span/step grid rows BEFORE this window runs, so
    a billion-event key slides over thousands of buckets.  When
    resample ran a keyed fill window (locf/nocb/interp), its output is
    already hash-partitioned on the keys and this window adds NO new
    exchange (plan-pinned in tests); with only ``zero`` fills (pure
    projection, no trailing keyed stage) the window pays its own keyed
    exchange — over grid rows, not events, so still compacted.

    Output: every input row plus one column per agg (same ``aggs`` /
    ``min_periods`` contract as :func:`rolling`).

    **Trailing distinct counts compose the same way** — the classic
    "distinct users in the trailing 7 days, per day".  Sliding a
    distinct over raw events re-scans the frame's events per row; the
    scale path compacts each bucket FIRST via a ``resample`` agg,
    then slides over buckets:

      approx   ``resample(..., aggs={"sk": F.hll_sketch_agg("user")})``
               then ``("approx_distinct", "sk")`` here — a BINARY
               column unions per-bucket sketches (``hll_union_agg``).
               In the sketch's EXACT regime (DataSketches HLL stays
               in sparse mode through ~384 distinct per frame at the
               default lgk=12) the union is bit-identical to
               sketching the frame's raw events AND to the true
               count; beyond it the union path and the direct path
               both estimate within the standard HLL bound (~1.6% at
               lgk=12) but are NOT bit-identical — the direct build
               and the union finalize through different estimators
               once dense.  Both regimes pinned by test.  Frame cost
               is n_buckets sketch unions, however many events each
               bucket held.
      exact    ``resample(..., aggs={"s": F.collect_set("user")})``
               then ``("exact_distinct", "s")`` — an ARRAY column
               unions per-bucket sets (flatten + array_distinct),
               capped like the summary algebra's exact tier.

    **Trailing percentiles** complete the tier — ``hist_quantile``
    slides the summary algebra's fixed-grid histogram partials
    (``olap.hist_partial`` as a resample agg, or a ``summarize``
    ``__hist_*`` column, whose NAME carries the grid) over the frame:
    the fold sums exact long counts, so the folded histogram is
    bit-identical to one built over the frame's raw events and the
    read-off is the certified nearest-rank + interpolation formula —
    opts ``{'q': 0.9[, 'lo', 'hi', 'buckets']}``, p90-latency-per-day
    in one keyed window pass, cost bounded by n_buckets x grid slots.

    The per-bucket sketch frame is mergeable by construction (HLL
    union, set union, histogram elementwise sum), so an incremental
    store of per-bucket partials refreshes these rolling
    distincts/percentiles without event-history replay — the same
    append-only algebra as ``summarize``."""
    from pyspark.sql.window import Window

    if int(n_buckets) < 1:
        raise ValueError(f"n_buckets must be >= 1; got {n_buckets}")
    keys = [on] if isinstance(on, str) else list(on)
    if bucket_col not in df.columns:
        raise ValueError(f"unknown bucket column {bucket_col!r}")
    dt = df.schema[bucket_col].dataType.simpleString()
    if dt not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"bucket column {bucket_col!r} must be an integer bucket "
            f"id (resample's `bucket`); got {dt} — a lossy cast would "
            "silently misorder the frame"
        )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(bucket_col).cast("long"))
        .rangeBetween(-(int(n_buckets) - 1), 0)
    )
    return _rolling_over(
        df, keys, aggs, min_periods, w, "rolling_buckets agg"
    )


def rolling_multi(
    df: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    windows: dict[str, int] | None = None,
    aggs: dict[str, tuple[str, str | None]] | None = None,
    min_periods: int = 1,
) -> DataFrame:
    """Multi-horizon trailing aggregates in ONE pass — the
    feature-engineering staple (activity at 1h / 24h / 7d per entity):
    every ``aggs`` output computed at every ``windows`` horizon, named
    ``<agg>_<suffix>``.

    ``windows``  suffix -> trailing span (seconds; raw units in
                 numeric-epoch mode), e.g. ``{"1h": 3600, "1d":
                 86400, "7d": 604800}``.
    ``aggs`` / ``min_periods``  :func:`rolling`'s contract, applied
                 per horizon.

    All horizons share one partitioning and one sort, and Spark
    groups the same-(partition, order) frames into a SINGLE Window
    node — so k horizons x m aggregates cost exactly one keyed
    exchange + one per-key sort, same as one (plan-pinned in tests).
    The per-row evaluation cost still scales with each frame's
    population (see :func:`rolling`'s scale note); for dense long
    horizons compose with :func:`resample` + :func:`rolling_buckets`
    per horizon instead."""
    from pyspark.sql.window import Window

    if not windows:
        raise ValueError(
            "windows must map at least one suffix to a positive "
            "trailing span, e.g. {'1h': 3600, '1d': 86400}"
        )
    if "__ord" in df.columns:
        raise ValueError(
            "input column '__ord' collides with rolling's internal "
            "order column (the __ prefix is reserved); rename it first"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if aggs is None:
        aggs = {"n": ("count", None)}
        if "value" in df.columns:
            aggs["v_mean"] = ("mean", "value")
    raw = _raw_time_mode((df, [ts_col]))
    tx = (
        F.col(ts_col).cast("long")
        if raw
        else F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    out = df.filter(tx.isNotNull()).withColumn("__ord", tx)
    for suffix, span in windows.items():
        if not suffix or not str(suffix).strip():
            raise ValueError("window suffix must be non-empty")
        if int(span) <= 0:
            raise ValueError(
                f"window {suffix!r}: span must be positive; got {span}"
            )
        w_u = int(span) * (1 if raw else 1_000_000)
        frame = (
            Window.partitionBy(*keys)
            .orderBy("__ord")
            .rangeBetween(-w_u, 0)
        )
        suffixed = {
            f"{name}_{suffix}": spec for name, spec in aggs.items()
        }
        out = _rolling_over(
            out, keys, suffixed, min_periods, frame,
            f"rolling_multi[{suffix}] agg",
        )
    return out.drop("__ord")


def rolling_top_values(
    counts: DataFrame,
    on: str | list[str],
    n_buckets: int,
    k: int = 3,
    bucket_col: str = "bucket",
    value_col: str = "value",
    weight_col: str = "weight",
) -> DataFrame:
    """Trailing-window TOP VALUES per key — "top referrers in the last
    7 days, per day", the heavy-hitter member of the rolling family.

    Input is a per-(keys, bucket, value) COUNTS frame — the output of
    ``df.groupBy(*keys, bucket, value).count()``, a ``summarize`` on
    those dims, or (approximately) a Misra-Gries summary's exploded
    counters (``operators/sketch.top_from_freq`` weights; the carried
    undercount bound then applies to the rolled weights too, since
    sums of underestimates underestimate the sum).  For each key and
    each trailing ``n_buckets`` window this returns the ``k`` heaviest
    values by summed weight, cut deterministically by
    ``(weight DESC, value ASC)`` — the same rule as
    ``olap.top_values``.

    Scale shape: NO inequality join and NO per-row set state — each
    counts row explodes to the ``n_buckets`` grid buckets whose
    trailing window it covers (bounded fan-out over the COMPACT counts
    frame, never over events), then one exact groupBy + one ranking
    window.  A hot key costs (its distinct values x n_buckets) rows,
    however many events it had.

    Output: (keys..., ``bucket_col``, ``value_col``, ``weight_col``
    summed over the window, ``rank`` 1..k) — one row group per bucket
    some input row covers (compose with ``resample``'s grid and an
    anti-join if empty-window rows must exist; a window with no
    observations has no top values).

    Streaming: ranking is not closed under micro-batching, so the
    split is the funnel_chunks_stream pattern — maintain the
    per-(keys, bucket, value) counts with a watermarked streaming
    aggregation (``streaming/ingest.summarize_stream`` on those
    dims), then run THIS over the stored counts at read time."""
    keys = [on] if isinstance(on, str) else list(on)
    if int(n_buckets) < 1:
        raise ValueError(f"n_buckets must be >= 1; got {n_buckets}")
    if int(k) < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    for c in (*keys, bucket_col, value_col, weight_col):
        if c not in counts.columns:
            raise ValueError(f"unknown column {c!r}")
    dt = counts.schema[bucket_col].dataType.simpleString()
    if dt not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"bucket column {bucket_col!r} must be an integer bucket "
            f"id; got {dt}"
        )
    if "__cover" in counts.columns:
        raise ValueError(
            "input column '__cover' collides with the internal cover "
            "column (the __ prefix is reserved); rename it first"
        )
    from pyspark.sql.window import Window

    b = F.col(bucket_col).cast("long")
    covered = counts.select(
        *keys,
        F.explode(
            F.sequence(b, b + F.lit(int(n_buckets) - 1))
        ).alias("__cover"),
        F.col(value_col),
        F.col(weight_col),
    )
    agg = covered.groupBy(*keys, "__cover", value_col).agg(
        F.sum(weight_col).alias(weight_col)
    )
    rank = F.row_number().over(
        Window.partitionBy(*keys, "__cover").orderBy(
            F.col(weight_col).desc_nulls_last(),
            F.col(value_col).asc_nulls_last(),
        )
    )
    return (
        agg.withColumn("rank", rank)
        .filter(F.col("rank") <= int(k))
        .withColumnRenamed("__cover", bucket_col)
    )
