"""resample: dense-grid resampling + gap-fill vs a pure-Python spec."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.timeseries import resample

STEP = 6 * 3600  # 6h buckets
STEP_US = STEP * 1_000_000


def _fixture(spark, with_null_key=True):
    rng = np.random.default_rng(17)
    rows = []
    base = pd.Timestamp("2024-03-01")
    for key in [1, 2, 3] + ([None] if with_null_key else []):
        n = int(rng.integers(8, 25))
        ts = base + pd.to_timedelta(
            np.sort(rng.integers(0, 12 * 86400, n)), unit="s"
        )
        for t in ts:
            v = None if rng.random() < 0.15 else float(rng.normal(50, 10))
            rows.append((key, t.to_pydatetime(), v))
    # NULL timestamps: belong to no bucket, must vanish
    rows.append((1, None, 123.0))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
    sdf = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    return pdf, sdf


def _interp_spec(bins, vals):
    """Per-key linear interpolation spec: observed values verbatim;
    gaps from the neighboring observed pair; edges carry the nearest
    observed value (cannot happen when endpoints are observed)."""
    obs = [(b, v) for b, v in zip(bins, vals) if v is not None]
    out = []
    for b, v in zip(bins, vals):
        if v is not None:
            out.append(v)
            continue
        prev = max(((ob, ov) for ob, ov in obs if ob < b), default=None)
        nxt = min(((ob, ov) for ob, ov in obs if ob > b), default=None)
        if prev is None and nxt is None:
            out.append(None)
        elif prev is None:
            out.append(nxt[1])
        elif nxt is None:
            out.append(prev[1])
        else:
            (pb, pv), (nb, nv) = prev, nxt
            out.append(pv + (nv - pv) * (b - pb) / (nb - pb))
    return out


def _spec(pdf):
    """Expected dense grid with all four fills, keyed (k, bucket)."""
    pdf = pdf[pdf.ts.notna()].copy()
    pdf["bucket"] = (
        pdf.ts.astype("datetime64[us]").astype("int64") * 1000
    ) // (STEP_US * 1000)
    exp = {}
    for k, g in pdf.groupby("k", dropna=False):
        key = None if pd.isna(k) else int(k)
        agg = g.groupby("bucket").agg(
            n=("value", "size"), v=("value", "mean")
        )
        bins = list(range(int(agg.index.min()), int(agg.index.max()) + 1))
        n = [int(agg.n[b]) if b in agg.index else None for b in bins]
        v = [
            None
            if b not in agg.index or pd.isna(agg.v[b])
            else float(agg.v[b])
            for b in bins
        ]
        locf, last = [], None
        for x in v:
            last = x if x is not None else last
            locf.append(last)
        nocb, nxt = [None] * len(v), None
        for i in range(len(v) - 1, -1, -1):
            nxt = v[i] if v[i] is not None else nxt
            nocb[i] = nxt
        interp = _interp_spec(bins, v)
        for i, b in enumerate(bins):
            exp[(key, b)] = dict(
                n=n[i], v=v[i], locf=locf[i], nocb=nocb[i],
                interp=interp[i], zero=n[i] or 0,
                is_gap=b not in agg.index,
            )
    return exp


def _approx(a, b):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) < 1e-9


def test_resample_matches_spec(spark):
    pdf, sdf = _fixture(spark)
    out = resample(
        sdf, "k", "ts", STEP,
        aggs={"n": F.count("value"), "v": F.avg("value")},
        fill={"v": ("locf", "nocb", "interp"), "n": ("zero",)},
    ).collect()
    # count("value") counts NON-NULL values; the spec's n counts rows —
    # align by using size only where the bucket exists; compare v/fills
    exp = _spec(pdf)
    assert len(out) == len(exp)  # dense grid, NULL key kept as a group
    for r in out:
        key = (r.k, r.bucket)
        assert key in exp, key
        e = exp[key]
        assert r.is_gap == e["is_gap"], key
        assert _approx(r.v, e["v"]), (key, r.v, e["v"])
        assert _approx(r.v_locf, e["locf"]), key
        assert _approx(r.v_nocb, e["nocb"]), key
        assert _approx(r.v_interp, e["interp"]), (key, r.v_interp, e["interp"])
        assert (r.n_zero or 0) == (r.n if r.n is not None else 0)
        # bucket_ts is the bucket start instant
        assert int(r.bucket_ts.timestamp() * 1_000_000) == r.bucket * STEP_US


def test_resample_endpoints_observed(spark):
    _, sdf = _fixture(spark, with_null_key=False)
    out = resample(sdf, "k", "ts", STEP).groupBy("k").agg(
        F.min_by("is_gap", "bucket").alias("first_gap"),
        F.max_by("is_gap", "bucket").alias("last_gap"),
    )
    for r in out.collect():
        assert r.first_gap is False and r.last_gap is False


def test_resample_raw_epoch_mode(spark):
    """All-integer ts resamples on the raw unit with no timestamp cast:
    same buckets and values as the cast path, bucket_ts the raw start."""
    _, sdf = _fixture(spark, with_null_key=False)
    cast_rows = {
        (r.k, r.bucket): (r.n, r.v)
        for r in resample(
            sdf, "k", "ts", STEP,
            aggs={"n": F.count("value"), "v": F.avg("value")},
        ).collect()
    }
    raw_df = sdf.withColumn("ts", F.unix_micros("ts"))
    raw = resample(
        raw_df, "k", "ts", STEP_US,
        aggs={"n": F.count("value"), "v": F.avg("value")},
    ).collect()
    assert {(r.k, r.bucket): (r.n, r.v) for r in raw} == cast_rows
    for r in raw:
        assert r.bucket_ts == r.bucket * STEP_US  # raw integer, not a ts


def test_resample_multi_key(spark):
    _, sdf = _fixture(spark, with_null_key=False)
    two = sdf.withColumn("k2", F.col("k") % 2)
    out = resample(two, ["k", "k2"], "ts", STEP)
    # k2 is a function of k here, so the grid matches the single-key one
    single = resample(sdf, "k", "ts", STEP)
    assert out.count() == single.count()
    assert {"k", "k2", "bucket", "bucket_ts", "is_gap"} <= set(out.columns)


def test_resample_validation_errors(spark):
    _, sdf = _fixture(spark, with_null_key=False)
    with pytest.raises(ValueError, match="unknown agg column"):
        resample(sdf, "k", "ts", STEP, fill={"nope": ("locf",)})
    with pytest.raises(ValueError, match="unknown fill method"):
        resample(
            sdf, "k", "ts", STEP,
            aggs={"v": F.avg("value")}, fill={"v": ("spline",)},
        )
    with pytest.raises(ValueError, match="collision"):
        resample(sdf.withColumnRenamed("k", "bucket"), "bucket", "ts", STEP)


def test_resample_grid_bounds_align_keys(spark):
    """Explicit grid_start/grid_end: every key gets the SAME aligned
    grid, and observations outside the window contribute nothing —
    a '1970' sentinel timestamp cannot inflate the grid."""
    rows = [
        (1, "2024-03-02 01:00:00", 10.0),
        (1, "2024-03-05 01:00:00", 20.0),
        (2, "2024-03-03 01:00:00", 30.0),
        # sentinel garbage: outside the window, must vanish entirely
        (2, "1970-01-01 00:00:00", 999.0),
        (1, "2024-03-20 00:00:00", 888.0),
    ]
    sdf = spark.createDataFrame(
        rows, "k long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample(
        sdf, "k", "ts", 86400,
        aggs={"v": F.avg("value")}, fill={"v": ("locf", "interp")},
        grid_start="2024-03-01", grid_end="2024-03-07",
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    # identical 7-day grid for both keys, sentinel values absent
    for k, rs in by_key.items():
        assert len(rs) == 7, k
        assert {r.bucket_ts.day for r in rs} == set(range(1, 8))
        assert all((r.v or 0) < 100 for r in rs)
    # leading gap buckets: locf NULL (no in-window observation yet)
    k1 = {r.bucket_ts.day: r for r in by_key[1]}
    assert k1[1].v_locf is None and k1[2].v_locf == 10.0
    assert k1[6].v_locf == 20.0  # carried past the last observation
    # interp at the leading edge falls back to the nearest observed side
    assert k1[1].v_interp == 10.0
    # interior interpolation unaffected by the clamp
    assert abs(k1[3].v_interp - (10 + 10 / 3)) < 1e-9


def test_resample_single_sided_bound(spark):
    _, sdf = _fixture(spark, with_null_key=False)
    both = resample(sdf, "k", "ts", STEP)
    lo_bkt = min(r.bucket for r in both.collect())
    clamped = resample(sdf, "k", "ts", STEP, grid_start="2024-03-05")
    want = (pd.Timestamp("2024-03-05").value // 1000) // STEP_US
    assert min(r.bucket for r in clamped.collect()) >= want
    # upper side stays observation-driven
    assert (
        max(r.bucket for r in clamped.collect())
        == max(r.bucket for r in both.collect())
    )
    assert lo_bkt < want  # the clamp actually removed something


def test_resample_raw_mode_bounds(spark):
    _, sdf = _fixture(spark, with_null_key=False)
    raw_df = sdf.withColumn("ts", F.unix_micros("ts"))
    lo = int(pd.Timestamp("2024-03-02").value // 1000)
    hi = int(pd.Timestamp("2024-03-09").value // 1000)
    out = resample(
        raw_df, "k", "ts", STEP_US, grid_start=lo, grid_end=hi
    )
    buckets = sorted({r.bucket for r in out.collect()})
    assert buckets[0] >= lo // STEP_US and buckets[-1] <= hi // STEP_US
    with pytest.raises(ValueError, match="raw integer"):
        resample(raw_df, "k", "ts", STEP_US, grid_start="2024-03-02")


def test_resample_bounds_validation(spark):
    _, sdf = _fixture(spark, with_null_key=False)
    with pytest.raises(ValueError, match="after grid_end"):
        resample(
            sdf, "k", "ts", STEP,
            grid_start="2024-03-09", grid_end="2024-03-02",
        )


def test_resample_output_name_collisions_raise(spark):
    _, sdf = _fixture(spark, with_null_key=False)
    with pytest.raises(ValueError, match="collision"):
        resample(sdf, "k", "ts", STEP, aggs={"bucket": F.count(F.lit(1))})
    with pytest.raises(ValueError, match="collision"):
        resample(
            sdf, "k", "ts", STEP,
            aggs={"v": F.avg("value"), "v_locf": F.avg("value")},
            fill={"v": ("locf",)},
        )
    with pytest.raises(ValueError, match="reserved"):
        resample(sdf, "k", "ts", STEP, aggs={"__x": F.count(F.lit(1))})
    with pytest.raises(ValueError, match="positive"):
        resample(sdf, "k", "ts", 0)


def test_grid_bounds_use_session_timezone(spark):
    """Naive grid_start/grid_end strings must localize to the SESSION
    timezone — the data path's cast convention — so a non-UTC session
    cannot shift the window against the column values (the
    validity_intervals horizon rule, r10)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from fabstir_vectordb_spark.operators.timeseries import resample

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # one event at local midnight 2024-01-15 (NY) — a UTC-parsed
        # bound would push the one-day window off this bucket
        df = spark.createDataFrame(
            [(1, "2024-01-15 00:00:00", 5.0)],
            "k long, s string, value double",
        ).select("k", F.col("s").cast("timestamp").alias("ts"), "value")
        out = resample(
            df, "k", ts_col="ts", step_seconds=86400,
            aggs={"v": F.avg("value")},
            grid_start="2024-01-15", grid_end="2024-01-15",
        ).collect()
        assert len(out) == 1
        assert out[0]["v"] == 5.0 and not out[0]["is_gap"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# ------------------------------------------------------------------ #
# rolling / rolling_buckets: trailing-window moving aggregates        #
# ------------------------------------------------------------------ #

def _roll_df(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for k, pts in {
        "a": [(0, 1.0), (30, 2.0), (90, 4.0), (200, 8.0)],
        "b": [(10, 5.0), (10, 7.0), (400, 1.0)],
    }.items():
        rows += [(k, t0 + dt.timedelta(seconds=s), v) for s, v in pts]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_rolling_matches_pandas(spark):
    """Trailing time window [t-w, t] closed both ends — pandas
    df.rolling('101s') on the same data is the independent oracle
    (pandas' window is (t-w, t] half-open, so use w+1s there against
    our closed 100s to align the boundary row)."""
    from fabstir_vectordb_spark.operators.timeseries import rolling

    df = _roll_df(spark)
    got = rolling(
        df, "k", "ts",
        {"n": ("count", None), "m": ("mean", "v"), "s": ("sum", "v"),
         "lo": ("min", "v"), "hi": ("max", "v")},
        window_seconds=100,
    ).collect()
    pdf = df.toPandas().sort_values(["k", "ts"]).set_index("ts")
    for r in got:
        sub = pdf[pdf["k"] == r["k"]]["v"]
        w = sub[(sub.index >= r["ts"] - pd.Timedelta(seconds=100))
                & (sub.index <= r["ts"])]
        assert r["n"] == len(w)
        assert abs(r["m"] - w.mean()) < 1e-12
        assert abs(r["s"] - w.sum()) < 1e-12
        assert r["lo"] == w.min() and r["hi"] == w.max()


def test_rolling_min_periods_and_peers(spark):
    """min_periods gates every output to NULL until the frame holds
    enough observations; rows sharing (key, ts) are RANGE peers and
    get identical aggregates."""
    from fabstir_vectordb_spark.operators.timeseries import rolling

    df = _roll_df(spark)
    got = {
        (r["k"], r["ts"], r["v"]): (r["n"], r["m"])
        for r in rolling(
            df, "k", "ts", {"n": ("count", None), "m": ("mean", "v")},
            window_seconds=100, min_periods=2,
        ).collect()
    }
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # a@0s: frame has 1 row -> NULL mean, NULL count (gated too)
    assert got[("a", t0, 1.0)] == (None, None)
    # a@90s: frame holds 0,30,90 -> 3 rows
    assert got[("a", t0 + dt.timedelta(seconds=90), 4.0)][0] == 3
    # b's two t=10s rows are peers: both see both rows
    p1 = got[("b", t0 + dt.timedelta(seconds=10), 5.0)]
    p2 = got[("b", t0 + dt.timedelta(seconds=10), 7.0)]
    assert p1 == p2 == (2, 6.0)


def test_rolling_raw_epoch_mode_and_validation(spark):
    """Integer ts column: window_seconds reads in the column's raw
    unit (no timestamp cast); validation errors name the problem."""
    from fabstir_vectordb_spark.operators.timeseries import rolling

    df = spark.createDataFrame(
        [(1, 100, 1.0), (1, 150, 3.0), (1, 300, 5.0)],
        "k long, ts long, v double",
    )
    got = {r["ts"]: r["m"] for r in rolling(
        df, "k", "ts", {"m": ("mean", "v")}, window_seconds=60,
    ).collect()}
    assert got == {100: 1.0, 150: 2.0, 300: 5.0}
    with pytest.raises(ValueError, match="positive"):
        rolling(df, "k", "ts", {"m": ("mean", "v")}, window_seconds=0)
    with pytest.raises(ValueError, match="unknown fn"):
        rolling(df, "k", "ts", {"m": ("median", "v")})
    with pytest.raises(ValueError, match="needs a column"):
        rolling(df, "k", "ts", {"m": ("mean", None)})
    with pytest.raises(ValueError, match="unknown column"):
        rolling(df, "k", "ts", {"m": ("mean", "nope")})
    with pytest.raises(ValueError, match="collides"):
        rolling(df, "k", "ts", {"v": ("mean", "v")})
    with pytest.raises(ValueError, match="reserved"):
        rolling(df, "k", "ts", {"__m": ("mean", "v")})
    with pytest.raises(ValueError, match="min_periods"):
        rolling(df, "k", "ts", {"m": ("mean", "v")}, min_periods=0)


def test_rolling_buckets_dense_and_sparse(spark):
    """N-bucket trailing frame over a grid: RANGE over bucket ids, so
    a SPARSE grid (missing buckets) contributes nothing — unlike a
    ROWS frame, which would wrongly reach further back in time."""
    from fabstir_vectordb_spark.operators.timeseries import (
        rolling_buckets,
    )

    sparse = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0), ("a", 5, 10.0)],
        "k string, bucket long, s double",
    )
    got = {r["bucket"]: r["ma"] for r in rolling_buckets(
        sparse, "k", {"ma": ("mean", "s")}, n_buckets=3,
    ).collect()}
    # bucket 5's frame is [3, 5] -> only bucket 5 itself
    assert got == {0: 1.0, 1: 1.5, 5: 10.0}
    with pytest.raises(ValueError, match="n_buckets"):
        rolling_buckets(sparse, "k", {"ma": ("mean", "s")}, n_buckets=0)
    with pytest.raises(ValueError, match="bucket column"):
        rolling_buckets(sparse, "k", {"ma": ("mean", "s")}, n_buckets=2,
                        bucket_col="nope")


def test_rolling_buckets_composes_with_resample(spark):
    """The dashboard staple: resample daily + zero-fill, then a
    3-bucket moving average — gap buckets count as zero via the _zero
    column.  When resample ends with a keyed fill window (locf), its
    output is already partitioned on the keys, so the moving-average
    window adds NO new exchange to the composed plan."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.timeseries import (
        rolling_buckets,
    )

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, 3.0), ("a", t0 + dt.timedelta(days=2), 6.0)],
        "k string, ts timestamp, v double",
    )
    rs = resample(
        df, "k", "ts", 86400,
        aggs={"s": F.sum("v")}, fill={"s": ("zero", "locf")},
    )
    out = rolling_buckets(rs, "k", {"ma": ("mean", "s_zero")}, 3)
    got = {r["bucket"] - 19723: r["ma"] for r in out.collect()}
    assert got == {0: 3.0, 1: 1.5, 2: 3.0}
    # plan shape: compare STATIC plans (AQE re-plans at runtime and its
    # exchange reuse varies with session state, which made an
    # executed-plan count flaky under the full suite)
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rs2 = resample(
            df, "k", "ts", 86400,
            aggs={"s": F.sum("v")}, fill={"s": ("zero", "locf")},
        )
        out2 = rolling_buckets(rs2, "k", {"ma": ("mean", "s_zero")}, 3)
        n_rs = rs2._jdf.queryExecution().executedPlan().toString().count(
            "Exchange hashpartitioning"
        )
        n_out = out2._jdf.queryExecution().executedPlan().toString().count(
            "Exchange hashpartitioning"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert n_out <= n_rs, (n_out, n_rs)


def test_rolling_reserved_and_bucket_dtype_guards(spark):
    """Internal-column collision and lossy-bucket-cast guards fail
    loudly instead of silently corrupting order."""
    from fabstir_vectordb_spark.operators.timeseries import (
        rolling, rolling_buckets,
    )

    df = spark.createDataFrame(
        [(1, 100, 1.0, 5)], "k long, ts long, v double, __ord int"
    )
    with pytest.raises(ValueError, match="__ord"):
        rolling(df, "k", "ts", {"m": ("mean", "v")})
    sdf = spark.createDataFrame(
        [("a", "0", 1.0)], "k string, bucket string, s double"
    )
    with pytest.raises(ValueError, match="integer bucket"):
        rolling_buckets(sdf, "k", {"m": ("mean", "s")}, 2)


def test_rolling_property_random_vs_bruteforce(spark):
    """Random raw-epoch fixtures with heavy timestamp ties and NULL
    values: rolling's RANGE-frame outputs equal a brute-force python
    evaluation of the closed [t-w, t] window per row, min_periods
    included."""
    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 200
        ks = rng.integers(0, 3, n)
        ts = rng.integers(0, 50, n)  # dense -> many exact ties
        vs = [
            None if rng.random() < 0.2 else float(rng.integers(0, 9))
            for _ in range(n)
        ]
        rows = [(int(k), int(t), v) for k, t, v in zip(ks, ts, vs)]
        df = spark.createDataFrame(rows, "k long, ts long, v double")
        from fabstir_vectordb_spark.operators.timeseries import rolling

        w, mp = 7, 2
        got = rolling(
            df, "k", "ts",
            {"s": ("sum", "v"), "m": ("mean", "v"),
             "c": ("count", "v")},
            window_seconds=w, min_periods=mp,
        ).collect()
        assert len(got) == n
        for r in got:
            frame = [
                v for k, t, v in rows
                if k == r["k"] and r["ts"] - w <= t <= r["ts"]
                and v is not None
            ]
            if len(frame) < mp:
                assert r["s"] is None and r["m"] is None and (
                    r["c"] is None
                ), (trial, r)
            else:
                assert r["c"] == len(frame)
                assert abs(r["s"] - sum(frame)) < 1e-9
                assert abs(r["m"] - sum(frame) / len(frame)) < 1e-9


def test_rolling_multi_horizons_one_window_node(spark):
    """rolling_multi: every agg at every horizon in ONE pass — values
    equal per-horizon rolling() calls, and the static plan carries
    exactly one exchange, one sort, and one Window node however many
    horizons are requested."""
    from fabstir_vectordb_spark.operators.timeseries import (
        rolling, rolling_multi,
    )

    df = spark.createDataFrame(
        [(1, 100, 1.0), (1, 150, 3.0), (1, 5000, 5.0),
         (2, 120, 7.0), (2, 130, None)],
        "k long, ts long, v double",
    )
    windows = {"1m": 60, "2h": 7200}
    out = rolling_multi(
        df, "k", "ts", windows,
        {"s": ("sum", "v"), "c": ("count", "v")},
    )
    rows = {(r["k"], r["ts"]): r for r in out.collect()}
    for suffix, span in windows.items():
        single = rolling(
            df, "k", "ts", {"s": ("sum", "v"), "c": ("count", "v")},
            window_seconds=span,
        ).collect()
        for r in single:
            m = rows[(r["k"], r["ts"])]
            assert m[f"s_{suffix}"] == r["s"], (suffix, r)
            assert m[f"c_{suffix}"] == r["c"], (suffix, r)
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = rolling_multi(
            df, "k", "ts", windows,
            {"s": ("sum", "v"), "c": ("count", "v")},
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort ") == 1, plan
    assert plan.count("Window") == 1, plan
    with pytest.raises(ValueError, match="at least one suffix"):
        rolling_multi(df, "k", "ts", {}, {"s": ("sum", "v")})
    with pytest.raises(ValueError, match="span must be positive"):
        rolling_multi(df, "k", "ts", {"x": 0}, {"s": ("sum", "v")})


def test_rolling_distinct_matches_bruteforce(spark):
    """Trailing-window distinct counts: exact_distinct against a
    python brute force over random keyed fixtures (timestamp ties,
    NULL values included — NULLs are not observations); the HLL twin
    must agree within its error bound, and at these cardinalities
    (far below the sparse-mode boundary) exactly."""
    import datetime as dt
    import random

    from fabstir_vectordb_spark.operators.timeseries import rolling

    rng = random.Random(41)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for k in ("a", "b", "c"):
        for _ in range(120):
            s = rng.randrange(0, 600)
            u = f"u{rng.randrange(0, 40)}" if rng.random() > 0.1 else None
            rows.append((k, t0 + dt.timedelta(seconds=s), u))
    df = spark.createDataFrame(rows, "k string, ts timestamp, u string")
    got = rolling(
        df, "k", "ts",
        {"xd": ("exact_distinct", "u"), "ad": ("approx_distinct", "u")},
        window_seconds=100,
    ).collect()
    assert got  # NULL-u rows survive (only NULL ts drops rows)
    by_key = {}
    for k, ts, u in rows:
        by_key.setdefault(k, []).append((ts, u))
    for r in got:
        lo = r["ts"] - dt.timedelta(seconds=100)
        want = len({
            u for ts, u in by_key[r["k"]]
            if u is not None and lo <= ts <= r["ts"]
        })
        assert r["xd"] == want, (r["k"], r["ts"], r["xd"], want)
        assert r["ad"] == want, (r["k"], r["ts"], r["ad"], want)


def test_rolling_distinct_bucket_compaction_identity(spark):
    """The hot-key scale path: per-bucket partials (collect_set /
    hll_sketch_agg via resample) slid over an N-bucket frame equal
    the raw-value computation over the same frame EXACTLY — set
    union for the exact tier always; for the approx tier because this
    fixture stays inside the sketch's exact sparse regime (<= 300
    distinct per frame < the ~384 lgk=12 boundary, where sketch ==
    union == truth bit-identically).  The out-of-regime behavior
    (bounded, not bit-identical) is pinned in
    test_rolling_distinct_from_summary_store."""
    import datetime as dt
    import random

    from fabstir_vectordb_spark.operators.timeseries import (
        resample, rolling_buckets,
    )

    rng = random.Random(7)
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (k, t0 + dt.timedelta(minutes=rng.randrange(0, 48 * 60)),
         f"u{rng.randrange(0, 300)}")
        for k in ("a", "b") for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, u string")
    per = resample(
        df, "k", "ts", 3600,
        aggs={"sk": F.hll_sketch_agg("u"), "st": F.collect_set("u"),
              "nr": F.count(F.lit(1))},
        fill={"nr": ("zero",)},
    )
    compact = rolling_buckets(
        per, "k",
        {"ad": ("approx_distinct", "sk"), "xd": ("exact_distinct", "st")},
        n_buckets=6,
    )
    got = {
        (r["k"], r["bucket"]): (r["xd"], r["ad"])
        for r in compact.collect()
    }
    # raw twin: bucket each event, slide the same 6-bucket frame over
    # raw values attached to the dense grid
    raw = df.withColumn(
        "bucket", F.floor(F.unix_micros("ts") / F.lit(3_600_000_000))
    ).select("k", "bucket", "u")
    grid = per.select("k", "bucket").join(raw, ["k", "bucket"], "left")
    direct = rolling_buckets(
        grid, "k",
        {"ad": ("approx_distinct", "u"), "xd": ("exact_distinct", "u")},
        n_buckets=6,
    )
    want = {
        (r["k"], r["bucket"]): (r["xd"], r["ad"])
        for r in direct.select("k", "bucket", "xd", "ad")
        .distinct().collect()
    }
    assert got == want and len(got) >= 90
    # gap buckets: NULL sketch/set cells contribute nothing, count 0
    # only when the whole frame is empty (here frames always overlap
    # an observation, so every count is positive)
    assert all(x > 0 for x, _ in got.values())


def test_rolling_distinct_validation(spark):
    """Loud failures: cap exceeded names the alternative; malformed
    specs, unknown fns and distinct-without-column raise up front."""
    from pyspark.errors import SparkRuntimeException

    from fabstir_vectordb_spark.operators.timeseries import rolling

    df = _roll_df(spark).withColumn(
        "u", F.concat(F.lit("x"), F.col("v").cast("string"))
    )
    with pytest.raises(SparkRuntimeException, match="exceeded cap"):
        rolling(
            df, "k", "ts", {"xd": ("exact_distinct", "u", {"cap": 1})},
            window_seconds=1000,
        ).collect()
    with pytest.raises(ValueError, match="needs a column"):
        rolling(df, "k", "ts", {"xd": ("exact_distinct", None)})
    with pytest.raises(ValueError, match="spec must be"):
        rolling(df, "k", "ts", {"xd": ("exact_distinct",)})
    with pytest.raises(ValueError, match="unknown fn"):
        rolling(df, "k", "ts", {"xd": ("distinct", "u")})
    # min_periods gates distinct outputs like every other agg
    got = rolling(
        df, "k", "ts", {"xd": ("exact_distinct", "u")},
        window_seconds=100, min_periods=2,
    ).collect()
    assert any(r["xd"] is None for r in got)
    assert any(r["xd"] is not None for r in got)


def test_rolling_distinct_from_summary_store(spark):
    """The incremental-refresh composition: summarize() per (key,
    bucket) with an approx_distinct measure builds a mergeable
    per-bucket HLL store (__hll_<col>); merging a new chunk's summary
    and sliding rolling_buckets' approx_distinct over the merged
    store refreshes trailing distinct users without event-history
    replay.  This fixture deliberately CROSSES the sketch's exact
    sparse regime (~500 distinct users, frames past the ~384 lgk=12
    boundary): there the merged-store estimate and the one-shot
    raw-event estimate may differ by a few counts (different dense
    finalizers), but BOTH must hold the HLL bound against the true
    distinct count — the contract the docstrings state."""
    import datetime as dt
    import random

    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, summarize,
    )
    from fabstir_vectordb_spark.operators.timeseries import (
        rolling_buckets,
    )

    rng = random.Random(3)
    t0 = dt.datetime(2024, 5, 1)
    rows = [
        (k, t0 + dt.timedelta(minutes=rng.randrange(0, 14 * 24 * 60)),
         f"u{rng.randrange(0, 500)}")
        for k in ("a", "b") for _ in range(1500)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, u string")
    bucketed = df.withColumn(
        "bucket",
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long"),
    ).select("k", "bucket", "u")
    half = rows[: len(rows) // 2]
    ch1 = spark.createDataFrame(half, "k string, ts timestamp, u string")
    ch2 = spark.createDataFrame(
        rows[len(rows) // 2:], "k string, ts timestamp, u string"
    )

    def _sm(frame):
        b = frame.withColumn(
            "bucket",
            F.floor(
                F.unix_micros("ts") / F.lit(86_400_000_000)
            ).cast("long"),
        )
        return summarize(
            b, ["k", "bucket"], {"du": ("approx_distinct", "u")}
        )

    store = merge_summaries(_sm(ch1), _sm(ch2))
    got = {
        (r["k"], r["bucket"]): r["ad"]
        for r in rolling_buckets(
            store, "k", {"ad": ("approx_distinct", "__hll_u")},
            n_buckets=7,
        ).select("k", "bucket", "ad").collect()
    }
    want = {
        (r["k"], r["bucket"]): r["ad"]
        for r in rolling_buckets(
            bucketed.select("k", "bucket").distinct()
            .join(bucketed, ["k", "bucket"], "left"),
            "k", {"ad": ("approx_distinct", "u")}, n_buckets=7,
        ).select("k", "bucket", "ad").distinct().collect()
    }
    assert set(got) == set(want) and len(got) >= 25
    # true distinct per trailing 7-bucket frame (python brute force)
    by_kb = {}
    for r in bucketed.collect():
        by_kb.setdefault((r["k"], r["bucket"]), set()).add(r["u"])
    crossed = 0
    for (k, b), est in got.items():
        truth = len(set().union(*(
            by_kb.get((k, bb), set()) for bb in range(b - 6, b + 1)
        )))
        tol = max(2.0, 0.02 * truth)
        assert abs(est - truth) <= tol, ((k, b), est, truth)
        assert abs(want[(k, b)] - truth) <= tol, ((k, b), want[(k, b)], truth)
        if truth > 384:
            crossed += 1
    assert crossed >= 5  # the fixture really leaves the exact regime


def test_rolling_hist_quantile_matches_formula(spark):
    """Trailing-window percentiles over pre-built histogram partials:
    the frame fold sums exact long counts, so the estimate equals a
    python replay of the certified fixed-grid formula (nearest-rank
    bucket + in-bucket interpolation) to the ulp, and sits within one
    bucket width of the exact in-range percentile."""
    import collections
    import datetime as dt
    import math
    import random

    from fabstir_vectordb_spark.operators.olap import hist_partial
    from fabstir_vectordb_spark.operators.timeseries import (
        resample, rolling_buckets,
    )

    rng = random.Random(5)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(minutes=rng.randrange(0, 5 * 24 * 60)),
         rng.uniform(0, 100))
        for k in "ab" for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    per = resample(
        df, "k", "ts", 86400,
        aggs={"h": hist_partial("v", 0.0, 100.0, 50),
              "nr": F.count(F.lit(1))},
        fill={"nr": ("zero",)},
    )
    grid = {"lo": 0.0, "hi": 100.0, "buckets": 50}
    out = rolling_buckets(
        per, "k",
        {"p50": ("hist_quantile", "h", {"q": 0.5, **grid}),
         "p90": ("hist_quantile", "h", {"q": 0.9, **grid})},
        n_buckets=3,
    ).select("k", "bucket", "p50", "p90").collect()
    assert len(out) >= 10

    byb = collections.defaultdict(list)
    for k, t, v in rows:
        byb[(k, int(t.timestamp() * 1e6) // 86_400_000_000)].append(v)

    def est(vals, q, lo=0.0, hi=100.0, n=50):
        w = (hi - lo) / n
        cnt = [0] * n
        for v in vals:
            cnt[min(max(int(math.floor((v - lo) / w)), 0), n - 1)] += 1
        tot = sum(cnt)
        if tot == 0:
            return None
        kr, cum = max(1, math.ceil(q * tot)), 0
        for i, c in enumerate(cnt):
            if cum + c >= kr:
                return lo + w * (i + (kr - cum) / c)
            cum += c

    import numpy as np

    for r in out:
        vals = sum(
            (byb.get((r["k"], bb), [])
             for bb in range(r["bucket"] - 2, r["bucket"] + 1)),
            [],
        )
        for name, q in (("p50", 0.5), ("p90", 0.9)):
            want = est(vals, q)
            assert abs(r[name] - want) < 1e-9, (r, want)
            # within one bucket width of the exact nearest-rank value
            exact = float(np.sort(vals)[max(0, math.ceil(q * len(vals)) - 1)])
            assert abs(r[name] - exact) <= 2.0 + 1e-9, (r[name], exact)


def test_rolling_hist_quantile_grid_from_name_and_validation(spark):
    """A summarize __hist_* partial column carries its grid in the
    NAME — hist_quantile reads it when opts omit lo/hi and matches
    the explicit-grid read bit-for-bit; malformed specs fail loudly."""
    import datetime as dt
    import random

    from fabstir_vectordb_spark.operators.olap import (
        hist_partial, summarize,
    )
    from fabstir_vectordb_spark.operators.timeseries import (
        resample, rolling_buckets,
    )

    rng = random.Random(6)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(minutes=rng.randrange(0, 4 * 24 * 60)),
         rng.uniform(-5, 105))  # out-of-range mass clamps identically
        for k in "ab" for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    per = resample(
        df, "k", "ts", 86400,
        aggs={"h": hist_partial("v", 0.0, 100.0, 50)},
    )
    explicit = {
        (r["k"], r["bucket"]): r["p"]
        for r in rolling_buckets(
            per, "k",
            {"p": ("hist_quantile", "h",
                   {"q": 0.5, "lo": 0.0, "hi": 100.0, "buckets": 50})},
            n_buckets=3,
        ).collect()
    }
    sm = summarize(
        df.withColumn(
            "bucket",
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(86_400_000_000)
            ).cast("long"),
        ),
        ["k", "bucket"],
        {"q50": ("approx_p50", "v",
                 {"lo": 0.0, "hi": 100.0, "buckets": 50})},
    )
    hc = [c for c in sm.columns if c.startswith("__hist_")][0]
    named = {
        (r["k"], r["bucket"]): r["p"]
        for r in rolling_buckets(
            sm, "k", {"p": ("hist_quantile", hc, {"q": 0.5})},
            n_buckets=3,
        ).collect()
    }
    assert set(named) == set(explicit)
    for key in named:
        assert named[key] == explicit[key], key

    with pytest.raises(ValueError, match="needs opts\\['q'\\]"):
        rolling_buckets(per, "k", {"p": ("hist_quantile", "h")}, 3)
    with pytest.raises(ValueError, match="0 < q <= 1"):
        rolling_buckets(
            per, "k", {"p": ("hist_quantile", "h", {"q": 1.5})}, 3
        )
    with pytest.raises(ValueError, match="no grid"):
        rolling_buckets(
            per.withColumnRenamed("h", "plain"), "k",
            {"p": ("hist_quantile", "plain", {"q": 0.5})}, 3,
        )
    with pytest.raises(ValueError, match="array<bigint>"):
        rolling_buckets(
            per.withColumn("bad", F.lit(1.0)), "k",
            {"p": ("hist_quantile", "bad",
                   {"q": 0.5, "lo": 0.0, "hi": 1.0})}, 3,
        )


def test_rolling_distinct_quantile_plan_shape(spark):
    """Adding the distinct and percentile frame aggregates to a
    rolling_buckets pass changes NOTHING in the plan footprint: the
    same exchange count, the same single Window node family, zero
    Python stages — every new aggregate rides the existing frame
    (static plans, AQE off, per the suite's plan-pin convention)."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.olap import hist_partial
    from fabstir_vectordb_spark.operators.timeseries import (
        resample, rolling_buckets,
    )

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, "u1", 5.0)],
        "k string, ts timestamp, u string, v double",
    )
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rs = resample(
            df, "k", "ts", 86400,
            aggs={"s": F.sum("v"), "sk": F.hll_sketch_agg("u"),
                  "st": F.collect_set("u"),
                  "h": hist_partial("v", 0.0, 10.0, 4)},
            fill={"s": ("zero", "locf")},
        )
        base = rolling_buckets(rs, "k", {"ma": ("mean", "s_zero")}, 3)
        full = rolling_buckets(
            rs, "k",
            {"ma": ("mean", "s_zero"),
             "ad": ("approx_distinct", "sk"),
             "xd": ("exact_distinct", "st"),
             "p9": ("hist_quantile", "h",
                    {"q": 0.9, "lo": 0.0, "hi": 10.0, "buckets": 4})},
            3,
        )
        pb = base._jdf.queryExecution().executedPlan().toString()
        pf = full._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert (pf.count("Exchange hashpartitioning")
            == pb.count("Exchange hashpartitioning"))
    assert pf.count("Window ") == pb.count("Window ")
    for marker in ("Python", "ArrowEval", "BatchEval"):
        assert marker not in pf, marker


def test_rolling_review_guards(spark):
    """Round-11 review closures, all loud: exact_distinct refuses a
    binary (sketch) column instead of silently counting blobs; a
    non-dict opts element names the contract; a hist_quantile opts
    grid contradicting the __hist_* column name raises; a partial
    built on a different bucket count fails in-plan instead of
    NULLing."""
    import datetime as dt

    from pyspark.errors import SparkRuntimeException

    from fabstir_vectordb_spark.operators.olap import hist_partial
    from fabstir_vectordb_spark.operators.timeseries import (
        resample, rolling_buckets,
    )

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, "u1", 5.0),
         ("a", t0 + dt.timedelta(days=1), "u2", 7.0)],
        "k string, ts timestamp, u string, v double",
    )
    rs = resample(
        df, "k", "ts", 86400,
        aggs={"sk": F.hll_sketch_agg("u"),
              "h": hist_partial("v", 0.0, 10.0, 4)},
    )
    with pytest.raises(ValueError, match="distinct sketch blobs"):
        rolling_buckets(rs, "k", {"xd": ("exact_distinct", "sk")}, 3)
    with pytest.raises(ValueError, match="options dict"):
        rolling_buckets(
            rs, "k", {"xd": ("exact_distinct", "sk", "cap=1")}, 3
        )
    # summarize-named column + contradicting explicit grid
    named = rs.withColumnRenamed("h", "__hist_v__lo0p0_hi10p0_n4")
    ok = rolling_buckets(
        named, "k",
        {"p": ("hist_quantile", "__hist_v__lo0p0_hi10p0_n4",
               {"q": 0.5, "lo": 0.0, "hi": 10.0, "buckets": 4})},
        3,
    )
    assert ok.collect()  # matching explicit grid is fine
    with pytest.raises(ValueError, match="contradicts the grid"):
        rolling_buckets(
            named, "k",
            {"p": ("hist_quantile", "__hist_v__lo0p0_hi10p0_n4",
                   {"q": 0.5, "lo": 0.0, "hi": 20.0, "buckets": 4})},
            3,
        )
    # wrong-length partial: declared 8 buckets, built with 4
    with pytest.raises(SparkRuntimeException, match="different grid"):
        rolling_buckets(
            rs, "k",
            {"p": ("hist_quantile", "h",
                   {"q": 0.5, "lo": 0.0, "hi": 10.0, "buckets": 8})},
            3,
        ).collect()


def test_rolling_top_values_matches_bruteforce(spark):
    """Trailing-window heavy hitters: rolling_top_values on a counts
    frame equals a python brute force (sum weights over the covered
    window, (weight DESC, value ASC) deterministic cut), including
    windows that only exist through trailing coverage of an earlier
    bucket."""
    import collections
    import random

    from fabstir_vectordb_spark.operators.timeseries import (
        rolling_top_values,
    )

    rng = random.Random(11)
    rows = []
    for key in "ab":
        for _ in range(300):
            rows.append((
                key, rng.randrange(0, 15),
                f"v{rng.randrange(0, 12)}", rng.randrange(1, 9),
            ))
    df = spark.createDataFrame(
        rows, "k string, bucket long, value string, weight long"
    ).groupBy("k", "bucket", "value").agg(
        F.sum("weight").alias("weight")
    )
    got = {}
    for r in rolling_top_values(df, "k", n_buckets=4, k=3).collect():
        got.setdefault((r["k"], r["bucket"]), []).append(
            (r["rank"], r["value"], r["weight"])
        )
    by_kb = collections.defaultdict(collections.Counter)
    for k, b, v, w in rows:
        by_kb[(k, b)][v] += w
    want = {}
    covered = {(k, b + off) for (k, b) in by_kb for off in range(4)}
    for (k, b) in covered:
        tot = collections.Counter()
        for bb in range(b - 3, b + 1):
            tot.update(by_kb.get((k, bb), {}))
        if not tot:
            continue
        top = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want[(k, b)] = [
            (i + 1, v, w) for i, (v, w) in enumerate(top)
        ]
    assert {kb: sorted(v) for kb, v in got.items()} == {
        kb: sorted(v) for kb, v in want.items()
    }
    # validation
    with pytest.raises(ValueError, match="n_buckets"):
        rolling_top_values(df, "k", n_buckets=0)
    with pytest.raises(ValueError, match="unknown column"):
        rolling_top_values(df, "k", n_buckets=2, value_col="nope")
    with pytest.raises(ValueError, match="integer bucket"):
        rolling_top_values(
            df.withColumn("bucket", F.col("bucket").cast("double")),
            "k", n_buckets=2,
        )


def test_hist_quantile_grid_guard_edges(spark):
    """Review closures on the grid guards: a buckets-only
    contradiction against a __hist_* name raises; a column that only
    LOOKS like the encoding (non-numeric tokens) still works with an
    explicit grid instead of crashing the name parse."""
    import datetime as dt

    from fabstir_vectordb_spark.operators.olap import hist_partial
    from fabstir_vectordb_spark.operators.timeseries import (
        resample, rolling_buckets,
    )

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, 5.0), ("a", t0 + dt.timedelta(days=1), 7.0)],
        "k string, ts timestamp, v double",
    )
    rs = resample(
        df, "k", "ts", 86400, aggs={"h": hist_partial("v", 0.0, 10.0, 4)}
    )
    named = rs.withColumnRenamed("h", "__hist_v__lo0p0_hi10p0_n4")
    with pytest.raises(ValueError, match="buckets=8 contradicts"):
        rolling_buckets(
            named, "k",
            {"p": ("hist_quantile", "__hist_v__lo0p0_hi10p0_n4",
                   {"q": 0.5, "buckets": 8})},
            3,
        )
    # pseudo-encoded name, explicit grid: must work, not crash _s2f
    pseudo = rs.withColumnRenamed("h", "__hist_v__loA_hiB_n4")
    got = rolling_buckets(
        pseudo, "k",
        {"p": ("hist_quantile", "__hist_v__loA_hiB_n4",
               {"q": 0.5, "lo": 0.0, "hi": 10.0, "buckets": 4})},
        3,
    ).collect()
    assert got and all(r["p"] is not None for r in got)
    # and without a grid it reports no-grid, not a float parse error
    with pytest.raises(ValueError, match="no grid"):
        rolling_buckets(
            pseudo, "k",
            {"p": ("hist_quantile", "__hist_v__loA_hiB_n4",
                   {"q": 0.5})},
            3,
        )


def test_rolling_top_values_composes_with_mg_summaries(spark):
    """The approximate composition the docstring claims: per-bucket
    Misra-Gries summaries (operators/sketch) exploded into the counts
    frame roll up with the bound intact — for every reported (key,
    window, value): est <= true rolled count <= est + the sum of the
    covered buckets' per-group undercount bounds (sums of
    underestimates underestimate the sum, and each bucket's error is
    bounded by its own MG bound)."""
    import collections
    import random

    from fabstir_vectordb_spark.operators.sketch import (
        freq_partials, merge_freq, top_from_freq,
    )
    from fabstir_vectordb_spark.operators.timeseries import (
        rolling_top_values,
    )

    rng = random.Random(23)
    rows = []
    for b in range(6):
        for _ in range(4000):
            # zipf-ish: heavy head + long tail, per bucket
            v = (f"hot{rng.randrange(0, 5)}" if rng.random() < 0.7
                 else f"tail{rng.randrange(0, 800)}")
            rows.append(("g", b, v))
    df = spark.createDataFrame(rows, "k string, bucket long, v string")
    mg = merge_freq(freq_partials(df, ["k", "bucket"], "v", k=32))
    hits = top_from_freq(mg, top=2000)
    counts = hits.select(
        "k", F.col("bucket").cast("long").alias("bucket"),
        F.col("value"), F.col("est").alias("weight"),
    )
    rolled = rolling_top_values(
        counts, "k", n_buckets=3, k=5, value_col="value",
    ).collect()
    assert rolled
    truth = collections.defaultdict(collections.Counter)
    for k, b, v in rows:
        truth[(k, b)][v] += 1
    bounds = {
        (r["k"], r["bucket"]): r["max_undercount"]
        for r in hits.select(
            "k", "bucket", "max_undercount"
        ).distinct().collect()
    }
    for r in rolled:
        t = sum(
            truth[(r["k"], bb)][r["value"]]
            for bb in range(r["bucket"] - 2, r["bucket"] + 1)
        )
        bound = sum(
            bounds.get((r["k"], bb), 0)
            for bb in range(r["bucket"] - 2, r["bucket"] + 1)
        )
        assert r["weight"] <= t <= r["weight"] + bound, (r, t, bound)
