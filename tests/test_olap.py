"""grouped_report: rollup/cube/grouping-sets vs manual aggregation,
and the two-phase (pre-aggregate) plan's exact equivalence."""

import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.olap import grouped_report

SF_DIR = "/root/testdata/sf0.001"

MEASURES = {
    "n": ("count", None),
    "chars": ("sum", "n_chars"),
    "mx": ("max", "n_chars"),
    "mn": ("min", "n_chars"),
}


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _manual(df, dims_subsets):
    """Expected rows per grouping set, computed with plain groupBy."""
    out = {}
    for subset in dims_subsets:
        agg = df.groupBy(*subset).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
            F.max("n_chars").alias("mx"),
            F.min("n_chars").alias("mn"),
        )
        for r in agg.collect():
            key = tuple(r[c] if c in subset else None for c in ("lang", "source"))
            out[key + (tuple(sorted(subset)),)] = (r.n, r.chars, r.mx, r.mn)
    return out


def _check(rep, expected):
    seen = set()
    for r in rep.collect():
        subset = tuple(
            sorted(d for d in ("lang", "source") if r[f"g_{d}"] == 0)
        )
        key = (r.lang, r.source, subset)
        assert key in expected, key
        assert (r.n, r.chars, r.mx, r.mn) == expected[key], key
        seen.add(key)
    assert seen == set(expected)


@pytest.mark.parametrize("pre", [True, False])
def test_rollup_matches_manual(spark, pre):
    docs = _docs(spark)
    rep = grouped_report(
        docs, ["lang", "source"], MEASURES, mode="rollup", pre_aggregate=pre
    )
    _check(rep, _manual(docs, [["lang", "source"], ["lang"], []]))


@pytest.mark.parametrize("pre", [True, False])
def test_cube_matches_manual(spark, pre):
    docs = _docs(spark)
    rep = grouped_report(
        docs, ["lang", "source"], MEASURES, mode="cube", pre_aggregate=pre
    )
    _check(
        rep,
        _manual(docs, [["lang", "source"], ["lang"], ["source"], []]),
    )


@pytest.mark.parametrize("pre", [True, False])
def test_grouping_sets_matches_manual(spark, pre):
    docs = _docs(spark)
    rep = grouped_report(
        docs, ["lang", "source"], MEASURES, mode="grouping_sets",
        grouping_sets=[["lang"], ["source"], []], pre_aggregate=pre,
    )
    _check(rep, _manual(docs, [["lang"], ["source"], []]))


def test_two_phase_equals_direct_exactly(spark):
    """Integer measures: the two plans must agree to the bit."""
    docs = _docs(spark)
    for mode, gs in (
        ("rollup", None),
        ("cube", None),
        ("grouping_sets", [["lang"], []]),
    ):
        a = grouped_report(
            docs, ["lang", "source"], MEASURES, mode=mode,
            grouping_sets=gs, pre_aggregate=True,
        )
        b = grouped_report(
            docs, ["lang", "source"], MEASURES, mode=mode,
            grouping_sets=gs, pre_aggregate=False,
        )
        assert _rows(a) == _rows(b), mode


@pytest.mark.parametrize("pre", [True, False])
def test_avg_measure(spark, pre):
    docs = _docs(spark)
    rep = grouped_report(
        docs, ["lang"], {"a": ("avg", "n_chars"), "n": ("count", None)},
        mode="rollup", pre_aggregate=pre,
    )
    exp = {
        r.lang: r.a
        for r in docs.groupBy("lang")
        .agg((F.sum("n_chars") / F.count("n_chars")).alias("a"))
        .collect()
    }
    total = docs.agg(
        (F.sum("n_chars") / F.count("n_chars")).alias("a")
    ).collect()[0].a
    for r in rep.collect():
        want = total if r.g_lang == 1 else exp[r.lang]
        assert abs(r.a - want) < 1e-9


def test_null_dim_value_vs_subtotal(spark):
    """A real NULL dimension value is distinguishable from a subtotal
    row only via the grouping marker — assert both appear distinctly."""
    df = spark.createDataFrame(
        [("en", 5), (None, 7), ("en", 3)], "lang string, n_chars long"
    )
    rep = grouped_report(
        df, ["lang"], {"chars": ("sum", "n_chars")}, mode="rollup"
    )
    rows = {(r.lang, r.g_lang): r.chars for r in rep.collect()}
    assert rows[(None, 0)] == 7      # genuine NULL group
    assert rows[(None, 1)] == 15     # grand total
    assert rows[("en", 0)] == 8


def test_count_column_counts_non_null(spark):
    df = spark.createDataFrame(
        [("en", 5), ("en", None), ("de", 1)], "lang string, n_chars long"
    )
    for pre in (True, False):
        rep = grouped_report(
            df, ["lang"], {"nn": ("count", "n_chars")},
            mode="rollup", pre_aggregate=pre,
        )
        rows = {(r.lang, r.g_lang): r.nn for r in rep.collect()}
        assert rows[("en", 0)] == 1 and rows[(None, 1)] == 2


def test_validation_errors(spark):
    docs = _docs(spark)
    m = {"n": ("count", None)}
    with pytest.raises(ValueError, match="mode must be"):
        grouped_report(docs, ["lang"], m, mode="windowed")
    with pytest.raises(ValueError, match="grouping_sets list is required"):
        grouped_report(docs, ["lang"], m, mode="grouping_sets")
    with pytest.raises(ValueError, match="grouping_sets list is required"):
        grouped_report(docs, ["lang"], m, mode="cube", grouping_sets=[[]])
    with pytest.raises(ValueError, match="non-dim column"):
        grouped_report(
            docs, ["lang"], m, mode="grouping_sets",
            grouping_sets=[["source"]],
        )
    with pytest.raises(ValueError, match="unknown fn"):
        grouped_report(docs, ["lang"], {"x": ("median", "n_chars")})
    with pytest.raises(ValueError, match="only count may omit"):
        grouped_report(docs, ["lang"], {"x": ("sum", None)})
    with pytest.raises(ValueError, match="marker column"):
        grouped_report(
            docs.withColumn("g_lang", F.lit(1)), ["lang"], m
        )


def test_two_phase_expand_sits_above_an_aggregate(spark):
    """THE scale guard: pre_aggregate=True must put Expand above the
    compact phase-1 Aggregate (Expand replicates distinct dim combos);
    the direct plan's Expand reads the scan (replicates every row)."""
    docs = _docs(spark)
    m = {"n": ("count", None), "chars": ("sum", "n_chars")}
    two = grouped_report(docs, ["lang", "source"], m, mode="cube")
    plan = two._jdf.queryExecution().optimizedPlan().toString()
    below_expand = plan.split("Expand", 1)[1]
    assert "Aggregate" in below_expand
    direct = grouped_report(
        docs, ["lang", "source"], m, mode="cube", pre_aggregate=False
    )
    plan_d = direct._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan_d.split("Expand", 1)[1]


def test_count_distinct_exact_direct_only(spark):
    docs = _docs(spark)
    rep = grouped_report(
        docs, ["lang"], {"ds": ("count_distinct", "source")},
        mode="rollup", pre_aggregate=False,
    )
    exp = {
        r.lang: r.ds
        for r in docs.groupBy("lang")
        .agg(F.count_distinct("source").alias("ds"))
        .collect()
    }
    total = docs.select("source").distinct().count()
    for r in rep.collect():
        assert r.ds == (total if r.g_lang == 1 else exp[r.lang])
    # two-phase cannot legally compute it: a clear error, not wrongness
    with pytest.raises(ValueError, match="not\\s+decomposable"):
        grouped_report(docs, ["lang"], {"ds": ("count_distinct", "source")})


def test_approx_distinct_identical_across_plans_and_close_to_exact(spark):
    """HLL sketches are mergeable with set-union semantics, so the
    two-phase and direct plans must return the IDENTICAL estimate —
    and at these cardinalities (<=20 sources) the estimate is exact."""
    docs = _docs(spark)
    ms = {"ds": ("approx_distinct", "source"), "n": ("count", None)}
    two = grouped_report(docs, ["lang"], ms, mode="rollup")
    one = grouped_report(docs, ["lang"], ms, mode="rollup",
                         pre_aggregate=False)
    ra = {(r.lang, r.g_lang): (r.ds, r.n) for r in two.collect()}
    rb = {(r.lang, r.g_lang): (r.ds, r.n) for r in one.collect()}
    assert ra == rb
    exact = {
        r.lang: r.ds
        for r in docs.groupBy("lang")
        .agg(F.count_distinct("source").alias("ds"))
        .collect()
    }
    for (lang, g), (est, _) in ra.items():
        if g == 0:
            assert est == exact[lang]


def test_approx_distinct_all_null_cell_is_zero(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 1)], "g string, x int"
    )
    for pre in (True, False):
        rep = grouped_report(
            df, ["g"], {"dx": ("approx_distinct", "x")},
            mode="rollup", pre_aggregate=pre,
        )
        rows = {(r.g, r.g_g): r.dx for r in rep.collect()}
        assert rows[("a", 0)] == 0 and rows[("b", 0)] == 1
        assert rows[(None, 1)] == 1


def test_measure_name_collisions_raise(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="collide"):
        grouped_report(docs, ["lang"], {"lang": ("count", None)})
    with pytest.raises(ValueError, match="collide"):
        grouped_report(docs, ["lang"], {"g_lang": ("count", None)})
    with pytest.raises(ValueError, match="collide"):
        grouped_report(docs, ["lang"], {"__cnt_x": ("count", None)})


# ---------------------------------------------------------------- #
# incremental maintenance: summarize / merge_summaries /            #
# report_from_summary                                               #
# ---------------------------------------------------------------- #

def test_incremental_summary_equals_one_shot(spark):
    """The pinned contract: report_from_summary(merge_summaries(
    summarize(A), summarize(B), summarize(C))) == grouped_report(
    A u B u C), bit-identical for exact measure types, for every
    mode."""
    from fabstir_vectordb_spark.operators.olap import (
        grouped_report, merge_summaries, report_from_summary, summarize,
    )

    docs = _docs(spark).withColumn(
        "chunk", F.abs(F.xxhash64("doc_id")) % 3
    )
    chunks = [docs.filter(F.col("chunk") == i).drop("chunk")
              for i in range(3)]
    full = _docs(spark)
    dims = ["lang", "source"]
    for mode, gs in [("rollup", None), ("cube", None),
                     ("grouping_sets", [["lang"], []])]:
        merged = merge_summaries(
            *[summarize(c, dims, MEASURES) for c in chunks]
        )
        inc = report_from_summary(merged, dims, MEASURES, mode=mode,
                                  grouping_sets=gs)
        ref = grouped_report(full, dims, MEASURES, mode=mode,
                             grouping_sets=gs)
        assert _rows(inc) == _rows(ref), mode


def test_incremental_hll_identical_to_one_shot(spark):
    """HLL sketches union exactly: the merged-summary estimate equals
    the one-shot two-phase estimate (set-union semantics, not merely
    close)."""
    from fabstir_vectordb_spark.operators.olap import (
        grouped_report, merge_summaries, report_from_summary, summarize,
    )

    ms = {"du": ("approx_distinct", "source"), "n": ("count", None)}
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    inc = report_from_summary(
        merge_summaries(summarize(a, ["lang"], ms), summarize(b, ["lang"], ms)),
        ["lang"], ms, mode="rollup",
    )
    ref = grouped_report(docs, ["lang"], ms, mode="rollup")
    assert _rows(inc) == _rows(ref)


def test_summary_is_persistable_and_self_describing(spark, tmp_path):
    """A summary round-trips through parquet (sketches are binary
    columns) and merges BY NAME — no measure spec at merge time."""
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, report_from_summary, summarize,
    )

    ms = {"n": ("count", None), "chars": ("sum", "n_chars"),
          "du": ("approx_distinct", "source")}
    docs = _docs(spark)
    s1 = summarize(docs.filter(F.col("doc_id") % 2 == 0), ["lang"], ms)
    p = str(tmp_path / "summary")
    s1.write.mode("overwrite").parquet(p)
    stored = spark.read.parquet(p)
    s2 = summarize(docs.filter(F.col("doc_id") % 2 == 1), ["lang"], ms)
    rep = report_from_summary(
        merge_summaries(stored, s2), ["lang"], ms, mode="rollup"
    )
    from fabstir_vectordb_spark.operators.olap import grouped_report
    assert _rows(rep) == _rows(grouped_report(docs, ["lang"], ms))


def test_incremental_validation_errors(spark):
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, report_from_summary, summarize,
    )

    docs = _docs(spark)
    with pytest.raises(ValueError, match="count_distinct"):
        summarize(docs, ["lang"], {"d": ("count_distinct", "source")})
    with pytest.raises(ValueError, match="at least one"):
        merge_summaries()
    with pytest.raises(ValueError, match="partial columns"):
        merge_summaries(docs.select("lang"))
    s = summarize(docs, ["lang"], {"n": ("count", None)})
    with pytest.raises(ValueError, match="schemas differ"):
        merge_summaries(s, s.withColumnRenamed("__cnt_*", "__cnt_x"))
    # report over a summary built with a NARROWER measure set
    with pytest.raises(ValueError, match="lacks partial"):
        report_from_summary(
            s, ["lang"], {"chars": ("sum", "n_chars")}
        )
    # measure-name hygiene mirrors grouped_report's
    with pytest.raises(ValueError, match="collide"):
        report_from_summary(s, ["lang"], {"lang": ("count", None)})


def test_merge_summaries_expand_never_touches_corpus(spark):
    """Plan shape: the report's Expand reads the merged summary
    aggregate, not a corpus scan — the incremental path keeps the
    two-phase guarantee."""
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, report_from_summary, summarize,
    )

    docs = _docs(spark)
    ms = {"n": ("count", None)}
    rep = report_from_summary(
        merge_summaries(summarize(docs, ["lang", "source"], ms)),
        ["lang", "source"], ms, mode="cube",
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    expand_pos = plan.find("Expand")
    agg_pos = plan.find("HashAggregate", expand_pos)
    assert expand_pos != -1 and agg_pos != -1, plan


# ---------------------------------------------------------------- #
# top_values: exact per-group heavy hitters                          #
# ---------------------------------------------------------------- #

def test_top_values_matches_manual(spark):
    from fabstir_vectordb_spark.operators.olap import top_values

    docs = _docs(spark)
    got = top_values(docs, ["lang"], "source", k=2)
    # manual: full counts, python-side rank with the same tie-break
    counts = {}
    for r in docs.groupBy("lang", "source").count().collect():
        counts.setdefault(r["lang"], []).append((r["source"], r["count"]))
    want = set()
    for lang, vs in counts.items():
        vs.sort(key=lambda t: (-t[1], t[0] is None, t[0]))
        for rank, (v, n) in enumerate(vs[:2], start=1):
            want.add((lang, v, n, rank))
    assert {(r["lang"], r["value"], r["weight"], r["rank"])
            for r in got.collect()} == want


def test_top_values_weighted_and_validation(spark):
    from fabstir_vectordb_spark.operators.olap import top_values

    docs = _docs(spark)
    got = top_values(docs, ["lang"], "source", k=1,
                     weight_col="n_chars").collect()
    # weighted winner per lang == manual argmax of summed n_chars
    sums = {}
    for r in docs.groupBy("lang", "source").agg(
        F.sum("n_chars").alias("w")
    ).collect():
        cur = sums.get(r["lang"])
        cand = (r["w"], r["source"])
        # max weight; ties broken by ASCENDING value
        if cur is None or cand[0] > cur[0] or (
            cand[0] == cur[0] and cand[1] < cur[1]
        ):
            sums[r["lang"]] = cand
    assert {(r["lang"], r["value"], r["weight"]) for r in got} == {
        (lang, v, w) for lang, (w, v) in sums.items()
    }
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        top_values(docs, ["lang"], "source", k=0)
    with _pt.raises(ValueError, match="also a dim"):
        top_values(docs, ["lang"], "lang")
    with _pt.raises(ValueError, match="collide"):
        top_values(docs.withColumnRenamed("lang", "rank"),
                   ["rank"], "source")


def test_top_values_plan_compacts_before_ranking(spark):
    """The window must read the grouped counts, not the raw scan: one
    aggregate below the window sort."""
    from fabstir_vectordb_spark.operators.olap import top_values

    plan = top_values(_docs(spark), ["lang"], "source", k=3)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    agg_pos = plan.find("HashAggregate")
    assert agg_pos != -1
    assert "BatchEvalPython" not in plan


def test_percentile_measures_direct_only(spark):
    """p50/p90/p99 (exact percentile_cont) work in the direct plan and
    are refused by the two-phase plan with the alternatives named —
    the count_distinct contract shape."""
    docs = _docs(spark)
    ms = {"n": ("count", None), "med": ("p50", "n_chars"),
          "tail": ("p99", "n_chars")}
    rep = grouped_report(docs, ["lang"], ms, mode="rollup",
                         pre_aggregate=False)
    rows = {tuple(sorted(d for d in ("lang",) if r["g_lang"] == 0)):
            (r["med"], r["tail"])
            for r in rep.collect() if r["g_lang"] == 1}
    import numpy as np
    vals = np.array([r["n_chars"] for r in docs.select("n_chars").collect()],
                    dtype=float)
    med, tail = rows[()]
    assert med == pytest.approx(float(np.percentile(vals, 50)), rel=1e-9)
    assert tail == pytest.approx(float(np.percentile(vals, 99)), rel=1e-9)
    with pytest.raises(ValueError, match="not\\s+decomposable|not "
                                         "decomposable"):
        grouped_report(docs, ["lang"], ms, mode="rollup")
    from fabstir_vectordb_spark.operators.olap import summarize
    with pytest.raises(ValueError, match="decomposable"):
        summarize(docs, ["lang"], ms)


# ------------------------------------------------------------------ #
# round 10: mergeable percentiles + exact mergeable count_distinct   #
# ------------------------------------------------------------------ #

_R10_MS = {
    "n": ("count", None),
    "ap50": ("approx_p50", "n_chars", {"lo": 0.0, "hi": 4000.0,
                                       "buckets": 64}),
    "ap99": ("approx_p99", "n_chars", {"lo": 0.0, "hi": 4000.0,
                                       "buckets": 64}),
    "xd": ("exact_distinct", "source", {"cap": 10_000}),
}


def test_approx_pctl_identical_across_all_three_plans(spark):
    """approx_pXX and exact_distinct: direct == two-phase ==
    incremental (3-chunk summarize/merge/report), EXACTLY — the
    histogram partial is exact longs, so plan choice and chunking
    change nothing at all (unlike float sums, which agree to ulp)."""
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, report_from_summary, summarize,
    )

    docs = _docs(spark)
    dims = ["lang", "source"]
    two = _rows(grouped_report(docs, dims, _R10_MS, mode="rollup"))
    direct = _rows(grouped_report(docs, dims, _R10_MS, mode="rollup",
                                  pre_aggregate=False))
    ch = docs.withColumn("__c", F.abs(F.xxhash64("doc_id")) % 3)
    merged = merge_summaries(*[
        summarize(ch.filter(F.col("__c") == i).drop("__c"), dims, _R10_MS)
        for i in range(3)
    ])
    incr = _rows(report_from_summary(merged, dims, _R10_MS, mode="rollup"))
    assert two == direct
    assert two == incr


def test_approx_pctl_error_bound_vs_exact(spark):
    """For in-range data the estimate is within ONE BUCKET WIDTH of
    the exact nearest-rank percentile — the stated accuracy contract,
    checked per rollup cell at two grid resolutions."""
    import math

    docs = _docs(spark)
    vals_by_lang: dict = {}
    for r in docs.select("lang", "n_chars").collect():
        vals_by_lang.setdefault(r["lang"], []).append(r["n_chars"])
        vals_by_lang.setdefault(None, []).append(r["n_chars"])
    hi = float(max(vals_by_lang[None])) + 1.0
    for buckets in (32, 256):
        w = hi / buckets
        ms = {
            "ap50": ("approx_p50", "n_chars",
                     {"lo": 0.0, "hi": hi, "buckets": buckets}),
            "ap90": ("approx_p90", "n_chars",
                     {"lo": 0.0, "hi": hi, "buckets": buckets}),
        }
        rep = grouped_report(docs, ["lang"], ms, mode="rollup")
        for r in rep.collect():
            key = None if r["g_lang"] == 1 else r["lang"]
            vals = sorted(vals_by_lang[key])
            for q, col in ((0.5, "ap50"), (0.9, "ap90")):
                exact = vals[max(1, math.ceil(q * len(vals))) - 1]
                assert abs(r[col] - exact) <= w, (
                    buckets, key, q, r[col], exact, w
                )


def test_approx_pctl_grid_validation_and_exact_refusal_unchanged(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="FIXED grid"):
        grouped_report(docs, ["lang"], {"p": ("approx_p50", "n_chars")})
    with pytest.raises(ValueError, match="hi > lo"):
        grouped_report(docs, ["lang"], {
            "p": ("approx_p50", "n_chars", {"lo": 5.0, "hi": 5.0})})
    with pytest.raises(ValueError, match="buckets >= 2"):
        grouped_report(docs, ["lang"], {
            "p": ("approx_p50", "n_chars",
                  {"lo": 0.0, "hi": 1.0, "buckets": 1})})
    # exact percentiles stay direct-only; the refusal now names the
    # mergeable sibling
    with pytest.raises(ValueError, match="approx_p50"):
        grouped_report(docs, ["lang"], {"p": ("p50", "n_chars")})


def test_exact_distinct_matches_count_distinct(spark):
    """Two-phase exact_distinct == direct count_distinct on every
    rollup cell (both exact); grid mismatch across summaries is caught
    by merge_summaries' schema check."""
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, summarize,
    )

    docs = _docs(spark)
    two = grouped_report(
        docs, ["lang"],
        {"xd": ("exact_distinct", "source", {"cap": 1000})},
    )
    direct = grouped_report(
        docs, ["lang"], {"xd": ("count_distinct", "source")},
        pre_aggregate=False,
    )
    assert _rows(two) == _rows(direct)
    # differing caps (or grids) produce different partial column names
    # -> merge refuses, instead of silently mixing incompatible partials
    s1 = summarize(docs, ["lang"],
                   {"xd": ("exact_distinct", "source", {"cap": 1000})})
    s2 = summarize(docs, ["lang"],
                   {"xd": ("exact_distinct", "source", {"cap": 2000})})
    with pytest.raises(ValueError, match="schemas differ"):
        merge_summaries(s1, s2)


def test_exact_distinct_cap_guard_fires(spark):
    """Past the cap the plan fails loudly, naming the alternative —
    at the partial (summarize) stage, before any oversized set can
    shuffle."""
    docs = _docs(spark)
    rep = grouped_report(
        docs, ["lang"],
        {"xd": ("exact_distinct", "doc_id", {"cap": 5})},
    )
    with pytest.raises(Exception, match="exceeded cap=5"):
        rep.collect()


def test_summary_with_histogram_persists_to_parquet(spark, tmp_path):
    """Histogram and set partials survive a parquet round-trip (the
    materialized-summary deployment shape) and still merge + report."""
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, report_from_summary, summarize,
    )

    docs = _docs(spark)
    p = str(tmp_path / "summary")
    summarize(docs, ["lang"], _R10_MS).write.parquet(p)
    back = spark.read.parquet(p)
    rep = _rows(report_from_summary(
        merge_summaries(back), ["lang"], _R10_MS, mode="rollup"))
    want = _rows(grouped_report(docs, ["lang"], _R10_MS, mode="rollup"))
    assert rep == want


def test_suggest_grid_roundtrip(spark):
    """suggest_grid: one min/max job -> opts the approx measures
    accept; padded + snapped outward so later chunks near the extrema
    still bucket inside, and stable under superset re-derivation."""
    from fabstir_vectordb_spark.operators.olap import suggest_grid

    docs = _docs(spark)
    opts = suggest_grid(docs, "n_chars", buckets=64)
    lohi = docs.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    assert opts["lo"] <= lohi[0] and opts["hi"] >= lohi[1]
    assert opts["buckets"] == 64
    ms = {"p": ("approx_p90", "n_chars", opts)}
    rep = grouped_report(docs, ["lang"], ms, mode="rollup")
    assert rep.filter(F.col("p").isNull()).count() == 0
    with pytest.raises(ValueError, match="no non-NULL"):
        suggest_grid(docs.filter(F.lit(False)), "n_chars")


def test_top_values_from_summary_equals_top_values(spark):
    """The incremental heavy-hitters: summarize per chunk on
    (dims..., value), merge, rank — must equal top_values over the
    full frame, unweighted and weighted, including the deterministic
    (weight DESC, value ASC) cut."""
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, summarize, top_values, top_values_from_summary,
    )

    docs = _docs(spark)
    ch = docs.withColumn("__c", F.abs(F.xxhash64("doc_id")) % 3)
    merged = merge_summaries(*[
        summarize(
            ch.filter(F.col("__c") == i).drop("__c"),
            ["lang", "source"], {"w": ("count", None)},
        )
        for i in range(3)
    ])
    got = _rows(top_values_from_summary(merged, ["lang"], "source", k=3))
    want = _rows(top_values(docs, ["lang"], "source", k=3))
    assert got == want
    # weighted: token-mass heavy hitters via the sum partial
    merged_w = merge_summaries(*[
        summarize(
            ch.filter(F.col("__c") == i).drop("__c"),
            ["lang", "source"], {"w": ("sum", "n_chars")},
        )
        for i in range(3)
    ])
    got_w = _rows(top_values_from_summary(
        merged_w, ["lang"], "source", k=3, weight_col="n_chars"))
    want_w = _rows(top_values(
        docs, ["lang"], "source", k=3, weight_col="n_chars"))
    assert got_w == want_w
    with pytest.raises(ValueError, match="lacks partial"):
        top_values_from_summary(merged, ["lang"], "source",
                                weight_col="n_chars")


def test_suggest_grid_narrow_range_keeps_resolution(spark):
    """Sub-integer spans (latencies in seconds, ratios) must NOT snap
    to whole numbers — that would collapse the whole distribution into
    one bucket."""
    from fabstir_vectordb_spark.operators.olap import suggest_grid

    df = spark.createDataFrame(
        [(i, 0.01 + 0.04 * i / 99) for i in range(100)],
        "id long, v double",
    )
    opts = suggest_grid(df, "v", buckets=64)
    assert opts["hi"] - opts["lo"] < 0.1  # resolution preserved
    rep = grouped_report(
        df.withColumn("g", F.lit("a")), ["g"],
        {"p50": ("approx_p50", "v", opts)},
    ).collect()
    vals = sorted(0.01 + 0.04 * i / 99 for i in range(100))
    exact = vals[49]
    w = (opts["hi"] - opts["lo"]) / 64
    assert abs(rep[0]["p50"] - exact) <= w


def test_approx_pctl_property_random_grids(spark):
    """Property: on random values and random grids covering them, the
    estimate is within one bucket width of the exact nearest-rank
    percentile, and two-phase == direct, for every q."""
    import math
    import random

    from fabstir_vectordb_spark.operators.olap import grouped_report

    rnd = random.Random(17)
    for trial in range(4):
        n_vals = rnd.randrange(5, 120)
        lo = rnd.uniform(-50, 0)
        hi = lo + rnd.uniform(1, 200)
        buckets = rnd.choice([8, 32, 128])
        vals = [rnd.uniform(lo, hi - 1e-9) for _ in range(n_vals)]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "k string, v double"
        )
        ms = {
            name: (fn, "v", {"lo": lo, "hi": hi, "buckets": buckets})
            for name, fn in (
                ("e50", "approx_p50"), ("e90", "approx_p90"),
                ("e99", "approx_p99"),
            )
        }
        two = grouped_report(df, ["k"], ms).filter("g_k = 0").collect()[0]
        direct = grouped_report(
            df, ["k"], ms, pre_aggregate=False
        ).filter("g_k = 0").collect()[0]
        w = (hi - lo) / buckets
        s = sorted(vals)
        for q, name in ((0.5, "e50"), (0.9, "e90"), (0.99, "e99")):
            exact = s[max(1, math.ceil(q * len(s))) - 1]
            assert two[name] == direct[name], (trial, name)
            assert abs(two[name] - exact) <= w + 1e-9, (
                trial, name, two[name], exact, w
            )


def test_approx_pctl_nan_counts_nowhere(spark):
    """NaN values count NOWHERE in the histogram partial (same rule as
    NULL) — without the explicit isnan exclusion a NaN passes IS NOT
    NULL and its bucket cast clamps it into bucket 0 in non-ANSI
    sessions, dragging the estimate DOWN while exact ordering treats
    NaN as greatest.  Estimate over NaN-bearing data == estimate over
    the same data with the NaNs removed."""
    clean = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)], "g string, v double"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("a", float("nan"))] * 25, "g string, v double"
        )
    )
    ms = {"p50": ("approx_p50", "v", {"lo": 0.0, "hi": 101.0,
                                      "buckets": 64})}
    est_clean = grouped_report(clean, ["g"], ms).collect()
    est_dirty = grouped_report(dirty, ["g"], ms).collect()
    pick = lambda rows: {
        (r["g"], r["g_g"]): r["p50"] for r in rows
    }
    assert pick(est_clean) == pick(est_dirty)


def test_top_values_from_summary_reaggregates_unmerged_input(spark):
    """An UNMERGED union of chunk summaries (several rows per (dims,
    value)) must rank on the SUMMED weights, not per-chunk — the
    defensive re-aggregate makes ranks identical whether the caller
    merged first or not."""
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, summarize, top_values, top_values_from_summary,
    )

    docs = _docs(spark)
    ch = docs.withColumn("__c", F.abs(F.xxhash64("doc_id")) % 3)
    parts = [
        summarize(
            ch.filter(F.col("__c") == i).drop("__c"),
            ["lang", "source"], {"w": ("count", None)},
        )
        for i in range(3)
    ]
    unmerged = parts[0].unionByName(parts[1]).unionByName(parts[2])
    got = _rows(top_values_from_summary(unmerged, ["lang"], "source", k=3))
    want = _rows(top_values(docs, ["lang"], "source", k=3))
    assert got == want
    # and still a no-op on properly merged input
    merged = merge_summaries(*parts)
    assert _rows(
        top_values_from_summary(merged, ["lang"], "source", k=3)
    ) == want


def test_public_hist_helpers_match_report_path(spark):
    """olap.hist_partial / hist_quantile (public, r11): a summary
    built from the public partial reads off the IDENTICAL estimate as
    the certified approx_pXX report path over the same grid — the
    helpers ARE the report machinery, re-exported; and the partial
    validates its grid like the measures do."""
    from fabstir_vectordb_spark.operators.olap import (
        grouped_report, hist_partial, hist_quantile,
    )

    docs = _docs(spark)
    grid = {"lo": 0.0, "hi": 4000.0, "buckets": 64}
    rep = grouped_report(
        docs, ["lang"],
        {"p90": ("approx_p90", "n_chars", grid)},
        mode="rollup",
    ).filter(F.col("g_lang") == 0)
    want = {r["lang"]: r["p90"] for r in rep.collect()}
    manual = (
        docs.groupBy("lang")
        .agg(hist_partial("n_chars", 0.0, 4000.0, 64).alias("h"))
        .select(
            "lang",
            hist_quantile("h", 0.9, 0.0, 4000.0, 64).alias("p90"),
        )
    )
    got = {r["lang"]: r["p90"] for r in manual.collect()}
    assert got == want and len(got) >= 3
    with pytest.raises(ValueError, match="hi > lo"):
        hist_partial("n_chars", 10.0, 5.0)
    with pytest.raises(ValueError, match="0 < q <= 1"):
        hist_quantile("h", 1.5, 0.0, 1.0)
