"""Mergeable rank sketch (operators/sketch.py): exactness under k,
bounded rank error on adversarially DRIFTING distributions (the
declared-grid histogram's blind spot), merge-order determinism, and
the Spark partial/merge/read-off pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.sketch import (
    _sk_dumps, _sk_loads, _sk_merge, _sk_new, _sk_quantile, _sk_update,
    merge_sketches, sketch_partials, sketch_quantiles,
)


def _rank_err(est, values, q):
    """|empirical rank of est - q| as a fraction of N."""
    s = np.sort(values)
    lo = np.searchsorted(s, est, side="left")
    hi = np.searchsorted(s, est, side="right")
    n = len(s)
    target = q * n
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


def test_kernel_exact_below_k():
    sk = _sk_new(256)
    vals = np.arange(1, 101, dtype="float64")
    _sk_update(sk, vals)
    assert _sk_quantile(sk, 0.5) == 50.0
    assert _sk_quantile(sk, 0.99) == 99.0
    assert _sk_quantile(sk, 1.0) == 100.0
    assert _sk_quantile(_sk_new(64), 0.5) is None  # empty -> NULL


def test_kernel_roundtrip_and_merge_guards():
    sk = _sk_new(64)
    _sk_update(sk, np.random.RandomState(0).rand(1000))
    raw = _sk_dumps(sk)
    back = _sk_loads(raw)
    assert _sk_dumps(back) == raw
    with pytest.raises(ValueError, match="bad magic"):
        _sk_loads(b"nope" + raw)
    other = _sk_new(128)
    with pytest.raises(ValueError, match="different k"):
        _sk_merge(sk, other)


def test_kernel_rank_bound_on_drifting_distribution():
    """Adversarial drift: three regimes with disjoint ranges — the
    fixed-grid histogram clamps regime 2 and 3 into its edge buckets;
    the sketch's rank error stays bounded with NO declaration.
    Checked one-shot AND chunk-merged, several quantiles."""
    rs = np.random.RandomState(7)
    chunks = [
        rs.rand(20_000),                      # [0, 1)
        1000.0 + 1000.0 * rs.rand(20_000),    # [1000, 2000) drift up
        -50.0 + 50.0 * rs.rand(20_000),       # [-50, 0) drift down
    ]
    allv = np.concatenate(chunks)
    k = 512
    one = _sk_new(k)
    _sk_update(one, allv)
    parts = []
    for c in chunks:
        s = _sk_new(k)
        _sk_update(s, c)
        parts.append(s)
    merged = _sk_merge(_sk_merge(parts[0], parts[1]), parts[2])
    # MRL-style heuristic bound ~ L/(2k); assert a generous 2% at
    # k=512, n=60k (L ~ 7 -> ~0.7% expected)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        for sk in (one, merged):
            est = _sk_quantile(sk, q)
            assert _rank_err(est, allv, q) <= 0.02, (q, est)


def test_kernel_merge_is_order_insensitive_within_bound():
    rs = np.random.RandomState(3)
    chunks = [rs.standard_normal(5000) * (i + 1) for i in range(6)]
    allv = np.concatenate(chunks)
    sks = []
    for c in chunks:
        s = _sk_new(256)
        _sk_update(s, c)
        sks.append(s)
    import functools

    fwd = functools.reduce(_sk_merge, sks)
    rev = functools.reduce(_sk_merge, sks[::-1])
    for q in (0.05, 0.5, 0.95):
        assert _rank_err(_sk_quantile(fwd, q), allv, q) <= 0.03
        assert _rank_err(_sk_quantile(rev, q), allv, q) <= 0.03


def test_spark_pipeline_matches_exact_within_bound(spark, documents):
    """sketch_partials -> merge_sketches -> sketch_quantiles per lang
    vs the exact nearest-rank percentile, with and without fanout."""
    docs = documents.select("lang", "n_chars")
    parts = sketch_partials(docs, ["lang"], "n_chars", k=512)
    exact = {
        r["lang"]: r["xs"]
        for r in docs.groupBy("lang")
        .agg(F.sort_array(F.collect_list("n_chars")).alias("xs"))
        .collect()
    }
    for fanout in (None, 4):
        merged = merge_sketches(parts, ["lang"], "n_chars",
                                fanout=fanout)
        est = sketch_quantiles(
            merged, ["lang"], "n_chars", {"p50": 0.5, "p99": 0.99}
        ).collect()
        assert {r["lang"] for r in est} == set(exact)
        for r in est:
            xs = np.asarray(exact[r["lang"]], dtype="float64")
            assert r["n"] == len(xs)
            assert _rank_err(r["p50"], xs, 0.5) <= 0.02, r
            assert _rank_err(r["p99"], xs, 0.99) <= 0.02, r


def test_spark_merge_is_deterministic(spark, documents):
    """The merged sketch is a pure function of the partial SET (cells
    merge in byte order, not shuffle order): two runs, identical
    bytes."""
    docs = documents.select("lang", "n_chars")
    parts = sketch_partials(docs, ["lang"], "n_chars", k=256).persist()
    a = {
        r["lang"]: bytes(r["__rsk_n_chars"])
        for r in merge_sketches(parts, ["lang"], "n_chars").collect()
    }
    b = {
        r["lang"]: bytes(r["__rsk_n_chars"])
        for r in merge_sketches(
            parts.repartition(7), ["lang"], "n_chars"
        ).collect()
    }
    parts.unpersist()
    assert a == b


def test_spark_incremental_equals_one_shot_within_bound(spark):
    """Chunked (incremental) build over a DRIFTING stream: union the
    chunk partials, merge once — same bound as the one-shot build, no
    grid declared anywhere."""
    import pandas as pd

    rs = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "chunk": np.repeat([0, 1, 2], 10_000),
        "v": np.concatenate([
            rs.rand(10_000),
            500 + 500 * rs.rand(10_000),
            -20 + 20 * rs.rand(10_000),
        ]),
    })
    df = spark.createDataFrame(pdf)
    allv = pdf["v"].to_numpy()
    chunk_parts = [
        sketch_partials(
            df.filter(F.col("chunk") == i).drop("chunk"), [], "v", k=512
        )
        for i in range(3)
    ]
    unioned = chunk_parts[0].unionByName(chunk_parts[1]).unionByName(
        chunk_parts[2]
    )
    est = sketch_quantiles(
        merge_sketches(unioned, [], "v"), [], "v",
        {"p50": 0.5, "p90": 0.9},
    ).collect()[0]
    assert est["n"] == 30_000
    assert _rank_err(est["p50"], allv, 0.5) <= 0.02
    assert _rank_err(est["p90"], allv, 0.9) <= 0.02


def test_sketch_validation_errors(spark, documents):
    docs = documents.select("lang", "n_chars")
    with pytest.raises(ValueError, match="k must be"):
        sketch_partials(docs, ["lang"], "n_chars", k=4)
    with pytest.raises(ValueError, match="cannot be a dim"):
        sketch_partials(docs, ["n_chars"], "n_chars")
    with pytest.raises(ValueError, match="unknown column"):
        sketch_partials(docs, ["lang"], "nope")
    parts = sketch_partials(docs, ["lang"], "n_chars")
    with pytest.raises(ValueError, match="lacks column"):
        merge_sketches(docs, ["lang"], "n_chars")
    with pytest.raises(ValueError, match="fanout"):
        merge_sketches(parts, ["lang"], "n_chars", fanout=1)
    merged = merge_sketches(parts, ["lang"], "n_chars")
    with pytest.raises(ValueError, match="0 < q"):
        sketch_quantiles(merged, ["lang"], "n_chars", {"bad": 0.0})


def test_sketch_nan_null_count_nowhere(spark):
    import pandas as pd

    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, np.nan, np.inf, -np.inf]})
    df = spark.createDataFrame(pdf)
    est = sketch_quantiles(
        merge_sketches(sketch_partials(df, [], "v", k=64), [], "v"),
        [], "v", {"p50": 0.5},
    ).collect()[0]
    assert est["n"] == 3
    assert est["p50"] == 2.0


def test_sketch_persists_to_parquet(spark, documents, tmp_path):
    """The incremental loop's storage step: partial and merged cells
    are plain binary columns — parquet round-trip must change nothing
    (byte-identical merged cells, identical estimates)."""
    docs = documents.select("lang", "n_chars")
    parts = sketch_partials(docs, ["lang"], "n_chars", k=256)
    p1 = str(tmp_path / "parts.parquet")
    parts.write.parquet(p1)
    merged = merge_sketches(
        spark.read.parquet(p1), ["lang"], "n_chars"
    )
    m1 = str(tmp_path / "merged.parquet")
    merged.write.parquet(m1)
    back = spark.read.parquet(m1)
    direct = {
        r["lang"]: bytes(r["__rsk_n_chars"])
        for r in merge_sketches(parts, ["lang"], "n_chars").collect()
    }
    stored = {
        r["lang"]: bytes(r["__rsk_n_chars"]) for r in back.collect()
    }
    assert direct == stored
    est = {
        r["lang"]: (r["n"], r["p50"])
        for r in sketch_quantiles(
            back, ["lang"], "n_chars", {"p50": 0.5}
        ).collect()
    }
    est_direct = {
        r["lang"]: (r["n"], r["p50"])
        for r in sketch_quantiles(
            merged, ["lang"], "n_chars", {"p50": 0.5}
        ).collect()
    }
    assert est == est_direct


def test_sketch_partials_stream_then_batch_merge(spark, tmp_path):
    """The streaming split, for free: sketch_partials is a STATELESS
    mapInPandas, so it runs on a stream as-is (append mode, no state);
    partials land in a sink and merge_sketches + sketch_quantiles stay
    batch over the accumulated cells — same split as summarize_stream.
    Estimates equal the all-batch build."""
    import pandas as pd

    rs = np.random.RandomState(5)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b"], 5000),
        "v": np.concatenate([rs.rand(5000), 100 + rs.rand(5000)]),
    })
    df = spark.createDataFrame(pdf)
    src = str(tmp_path / "sk_src")
    df.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sketch_partials(stream, ["g"], "v", k=256)
        .writeStream.format("memory")
        .queryName("sk_parts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    streamed = spark.table("sk_parts")
    est_s = {
        r["g"]: (r["n"], r["p50"])
        for r in sketch_quantiles(
            merge_sketches(streamed, ["g"], "v"), ["g"], "v",
            {"p50": 0.5},
        ).collect()
    }
    est_b = {
        r["g"]: (r["n"], r["p50"])
        for r in sketch_quantiles(
            merge_sketches(
                sketch_partials(df, ["g"], "v", k=256), ["g"], "v"
            ),
            ["g"], "v", {"p50": 0.5},
        ).collect()
    }
    # same n exactly; estimates within the rank bound of each other
    assert {g: n for g, (n, _) in est_s.items()} == {
        g: n for g, (n, _) in est_b.items()
    }
    for g in est_b:
        xs = pdf[pdf.g == g]["v"].to_numpy()
        assert _rank_err(est_s[g][1], xs, 0.5) <= 0.02
        assert _rank_err(est_b[g][1], xs, 0.5) <= 0.02


# ------------------------------------------------------------------ #
# Misra-Gries frequent items                                          #
# ------------------------------------------------------------------ #

def _zipf_rows(seed, n, keys=("a", "b")):
    rs = np.random.RandomState(seed)
    vals = (np.floor(rs.pareto(1.2, n)) % 500).astype(int)
    ks = rs.choice(list(keys), n)
    return [(str(k), f"v{v}") for k, v in zip(ks, vals)]


def test_mg_guarantees_on_skewed_data(spark):
    """Classic MG contract, one-shot AND chunk-merged: est <= true <=
    est + max_undercount for every reported item, and every value
    whose true count exceeds max_undercount is PRESENT in the
    summary."""
    from fabstir_vectordb_spark.operators.sketch import (
        freq_partials, merge_freq, top_from_freq,
    )
    import collections

    rows = _zipf_rows(3, 30_000)
    truth: dict = collections.defaultdict(collections.Counter)
    for k, v in rows:
        truth[k][v] += 1
    df = spark.createDataFrame(rows, "g string, v string")
    one = freq_partials(df, ["g"], "v", k=64)
    ch = df.withColumn("__c", F.abs(F.xxhash64("v", "g")) % 4)
    parts = [
        freq_partials(
            ch.filter(F.col("__c") == i).drop("__c"), ["g"], "v", k=64
        )
        for i in range(4)
    ]
    merged = merge_freq(*parts)
    for summary in (one, merged):
        # summary totals are exact
        tot = {r["g"]: r["__mg_v__k64_n"] for r in
               summary.select("g", "__mg_v__k64_n").collect()}
        assert tot == {g: sum(c.values()) for g, c in truth.items()}
        hits = top_from_freq(summary, top=1000).collect()
        seen: dict = collections.defaultdict(set)
        for r in hits:
            t = truth[r["g"]][r["value"]]
            assert r["est"] <= t <= r["est"] + r["max_undercount"], r
            seen[r["g"]].add(r["value"])
        for g, c in truth.items():
            bound = next(
                r["max_undercount"] for r in hits if r["g"] == g
            )
            for v, t in c.items():
                if t > bound:
                    assert v in seen[g], (g, v, t, bound)


def test_mg_summary_bounded_and_validation(spark):
    from fabstir_vectordb_spark.operators.sketch import (
        freq_partials, merge_freq, top_from_freq,
    )

    df = spark.createDataFrame(
        _zipf_rows(7, 5000), "g string, v string"
    )
    parts = freq_partials(df, ["g"], "v", k=16)
    sizes = parts.select(
        F.size("__mg_v__k16").alias("s")
    ).agg(F.max("s")).collect()[0][0]
    assert sizes <= 16  # bounded summary, never the distinct set
    with pytest.raises(ValueError, match="k must be"):
        freq_partials(df, ["g"], "v", k=0)
    with pytest.raises(ValueError, match="cannot be a dim"):
        freq_partials(df, ["v"], "v")
    with pytest.raises(ValueError, match="exactly one __mg_"):
        merge_freq(parts, freq_partials(df, ["g"], "v", k=8))
    with pytest.raises(ValueError, match="lacks a __mg_"):
        top_from_freq(df)
    # NULL values count nowhere
    withnull = df.unionByName(
        spark.createDataFrame([("a", None)], "g string, v string")
    )
    n0 = freq_partials(df, ["g"], "v", k=16).agg(
        F.sum("__mg_v__k16_n")
    ).collect()[0][0]
    n1 = freq_partials(withnull, ["g"], "v", k=16).agg(
        F.sum("__mg_v__k16_n")
    ).collect()[0][0]
    assert n0 == n1


def test_mg_exact_when_k_covers_cardinality(spark):
    """With k >= the distinct-value count nothing truncates: the
    summary IS the exact counts and top_from_freq == top_values."""
    from fabstir_vectordb_spark.operators.olap import top_values
    from fabstir_vectordb_spark.operators.sketch import (
        freq_partials, merge_freq, top_from_freq,
    )

    rows = _zipf_rows(11, 8000)
    df = spark.createDataFrame(rows, "g string, v string")
    n_distinct = df.select("v").distinct().count()
    ch = df.withColumn("__c", F.abs(F.xxhash64("v")) % 3)
    merged = merge_freq(*[
        freq_partials(
            ch.filter(F.col("__c") == i).drop("__c"),
            ["g"], "v", k=n_distinct + 10,
        )
        for i in range(3)
    ])
    got = {
        (r["g"], r["value"], r["est"], r["rank"])
        for r in top_from_freq(merged, top=5).collect()
    }
    want = {
        (r["g"], r["value"], r["weight"], r["rank"])
        for r in top_values(df, ["g"], "v", k=5).collect()
    }
    assert got == want
    assert all(
        r["max_undercount"] == 0
        for r in top_from_freq(merged, top=5).collect()
    )


def test_mg_null_group_keys_survive(spark):
    """groupBy emits a row for the NULL group key; the summary joins
    must be NULL-SAFE or that group silently loses its counters (and
    empty dims = one global summary row)."""
    from fabstir_vectordb_spark.operators.sketch import (
        freq_partials, merge_freq, top_from_freq,
    )

    df = spark.createDataFrame(
        [(None, "x"), (None, "x"), (None, "y"), ("a", "x")],
        "g string, v string",
    )
    parts = freq_partials(df, ["g"], "v", k=8)
    merged = merge_freq(parts, parts)
    hits = {
        (r["g"], r["value"]): r["est"]
        for r in top_from_freq(merged, top=10).collect()
    }
    assert hits[(None, "x")] == 4  # doubled input, NULL group intact
    assert hits[(None, "y")] == 2
    assert hits[("a", "x")] == 2
    # empty dims: one global row
    g = merge_freq(freq_partials(df, [], "v", k=8))
    rows = top_from_freq(g, top=10).collect()
    assert {(r["value"], r["est"]) for r in rows} == {("x", 3), ("y", 1)}


def test_suggest_sketch_k_meets_bound():
    from fabstir_vectordb_spark.operators.sketch import suggest_sketch_k
    import math

    for eps, n in ((0.01, 1e12), (0.05, 1e9), (0.001, 1e8)):
        k = suggest_sketch_k(eps, n)
        levels = max(1.0, math.log2(max(2.0, n / k)))
        assert levels / (2 * k) <= eps
        assert k & (k - 1) == 0  # power of two
    with pytest.raises(ValueError, match="target_rank_error"):
        suggest_sketch_k(0.0)
    with pytest.raises(ValueError, match="n_estimate"):
        suggest_sketch_k(0.01, 0)


def test_kernel_random_merge_trees_property():
    """Property over random data, random chunkings, random MERGE
    TREES: however the partials are associated, the rank bound holds
    at every tested quantile."""
    rs = np.random.RandomState(42)
    for trial in range(5):
        n = int(rs.randint(2_000, 40_000))
        regime = rs.choice(["uniform", "lognorm", "steps"])
        if regime == "uniform":
            allv = rs.rand(n)
        elif regime == "lognorm":
            allv = np.exp(rs.standard_normal(n) * 3)
        else:
            allv = np.repeat(
                rs.randint(-5, 5, 40).astype("float64"), n // 40 + 1
            )[:n]
        k = int(rs.choice([128, 256, 512]))
        cuts = np.sort(rs.choice(n, rs.randint(1, 6), replace=False))
        chunks = np.split(allv, cuts)
        sks = []
        for c in chunks:
            s = _sk_new(k)
            _sk_update(s, c)
            sks.append(s)
        # random association order
        while len(sks) > 1:
            i = rs.randint(len(sks) - 1)
            sks[i] = _sk_merge(sks[i], sks.pop(i + 1))
        bound = 0.04 if k == 128 else 0.02
        for q in (0.01, 0.25, 0.5, 0.9, 0.999):
            est = _sk_quantile(sks[0], q)
            assert _rank_err(est, allv, q) <= bound, (
                trial, regime, k, q,
            )


def test_kernel_mass_invariant_exact():
    """Only FULL buffers collapse, so the sketch's weighted mass
    equals n EXACTLY — always, under any build or merge order (the
    pre-fix behavior drifted mass up to ~6% above n by collapsing a
    full buffer against the trailing partial)."""
    import functools

    def mass(sk):
        return sum(w * b.size for w, b in sk["bufs"])

    rs = np.random.RandomState(9)
    sk = _sk_new(16)
    _sk_update(sk, np.arange(24, dtype="float64"))
    assert mass(sk) == sk["n"] == 24
    sks = []
    for i in range(300):
        s = _sk_new(16)
        _sk_update(s, rs.rand(17))
        sks.append(s)
    m = functools.reduce(_sk_merge, sks)
    assert mass(m) == m["n"] == 300 * 17
    big = _sk_new(64)
    _sk_update(big, rs.rand(100_000))
    assert mass(big) == big["n"] == 100_000


def test_sketch_quantile_name_validation(spark):
    docs = spark.createDataFrame([("a", 1.0)], "g string, v double")
    merged = merge_sketches(sketch_partials(docs, ["g"], "v"), ["g"], "v")
    with pytest.raises(ValueError, match="at least one"):
        sketch_quantiles(merged, ["g"], "v", {})
    with pytest.raises(ValueError, match="identifier"):
        sketch_quantiles(merged, ["g"], "v", {"p 50": 0.5})
    with pytest.raises(ValueError, match="collides"):
        sketch_quantiles(merged, ["g"], "v", {"n": 0.5})
    with pytest.raises(ValueError, match="collides"):
        sketch_quantiles(merged, ["g"], "v", {"g": 0.5})
    with pytest.raises(ValueError, match="lacks column"):
        sketch_quantiles(merged.drop("__rsk_v_n"), ["g"], "v",
                         {"p50": 0.5})


def test_mg_fanout_same_guarantees(spark):
    """The salted pre-truncation (fanout=) keeps the MG contract: the
    bound holds on every reported item and heavy values above the
    bound are present — and with k covering the cardinality it stays
    exact."""
    from fabstir_vectordb_spark.operators.sketch import (
        freq_partials, merge_freq, top_from_freq,
    )
    import collections

    rows = _zipf_rows(13, 20_000)
    truth: dict = collections.defaultdict(collections.Counter)
    for k, v in rows:
        truth[k][v] += 1
    df = spark.createDataFrame(rows, "g string, v string")
    merged = merge_freq(
        freq_partials(df, ["g"], "v", k=64, fanout=4),
        freq_partials(df, ["g"], "v", k=64, fanout=4),
    )
    hits = top_from_freq(merged, top=1000).collect()
    for r in hits:
        t = 2 * truth[r["g"]][r["value"]]  # doubled input
        assert r["est"] <= t <= r["est"] + r["max_undercount"], r
    # exact when k covers cardinality, fanout or not
    nd = df.select("v").distinct().count()
    exact = freq_partials(df, ["g"], "v", k=nd + 5, fanout=4)
    got = {
        (r["g"], r["value"], r["est"])
        for r in top_from_freq(exact, top=5).collect()
    }
    plain = {
        (r["g"], r["value"], r["est"])
        for r in top_from_freq(
            freq_partials(df, ["g"], "v", k=nd + 5), top=5
        ).collect()
    }
    assert got == plain
    with pytest.raises(ValueError, match="fanout"):
        freq_partials(df, ["g"], "v", k=8, fanout=1)


def test_sketch_quantiles_dim_named_n_rejected(spark):
    docs = spark.createDataFrame([("a", 1.0)], "n string, v double")
    merged = merge_sketches(sketch_partials(docs, ["n"], "v"), ["n"], "v")
    with pytest.raises(ValueError, match="dim 'n' collides"):
        sketch_quantiles(merged, ["n"], "v", {"p50": 0.5})
