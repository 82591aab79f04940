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
