"""Corpus reporting: the mergeable-summary algebra end to end on the
documents fixture — how a 100 TB corpus keeps its dashboards fresh
without rescanning history.

  1. the report card: ROLLUP with exact counts, HLL distinct, and a
     derived mean (two-phase plan — Expand sees dim combos, never the
     corpus scan)
  2. incremental refresh: summarize only the new chunk, merge into the
     stored summary, re-report — equals the one-shot report EXACTLY
  3. percentiles, declared-grid tier: suggest_grid once, mergeable
     fixed-grid histogram measures through the same summarize/merge
  4. percentiles, NO-declaration tier: the rank sketch (drift-proof —
     chunk distributions can move; nothing clamps)
  5. heavy hitters, exact tier: top_values_from_summary (incremental,
     needs the distinct-value set in the summary)
  6. heavy hitters, bounded tier: Misra-Gries frequent items (<= k
     counters per group, carries its own undercount bound)
  7. per-group exemplars, incrementally: mergeable bottom-k partials
     == cap_per_group's one-shot window, rows AND ranks

Run:  python examples/corpus_reports.py
(uses the sf0.001 fixture tables; finishes in ~1 min on local[8])
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def main(spark: SparkSession) -> dict:
    out = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dims = ["lang", "source"]

    # --- 1. the report card ---------------------------------------------
    from fabstir_vectordb_spark.operators.olap import grouped_report

    measures = {
        "n": ("count", None),
        "chars": ("sum", "n_chars"),
        "docs_est": ("approx_distinct", "doc_id"),
    }
    report = grouped_report(docs, dims, measures, mode="rollup")
    out["report_rows"] = report.count()
    grand = report.filter("g_lang = 1 AND g_source = 1").first()
    out["total_docs"] = grand["n"]

    # --- 2. incremental refresh == one-shot EXACTLY -----------------------
    from fabstir_vectordb_spark.operators.olap import (
        merge_summaries, report_from_summary, summarize,
    )

    history = docs.filter(F.col("doc_id") % 10 != 0)
    new_chunk = docs.filter(F.col("doc_id") % 10 == 0)
    stored = summarize(history, dims, measures)      # persisted in real use
    merged = merge_summaries(stored, summarize(new_chunk, dims, measures))
    refreshed = report_from_summary(merged, dims, measures, mode="rollup")
    assert {tuple(r) for r in refreshed.collect()} == {
        tuple(r) for r in report.collect()
    }
    out["refresh_equals_one_shot"] = True

    # --- 3. percentiles with a declared grid ------------------------------
    from fabstir_vectordb_spark.operators.olap import suggest_grid

    grid = suggest_grid(docs, "n_chars", buckets=64)  # one job, reuse forever
    pms = {"n": ("count", None), "p90": ("approx_p90", "n_chars", grid)}
    prep = report_from_summary(
        merge_summaries(
            summarize(history, dims, pms), summarize(new_chunk, dims, pms)
        ),
        dims, pms, mode="rollup",
    )
    out["p90_chars"] = prep.filter("g_lang = 1 AND g_source = 1").first()["p90"]

    # --- 4. percentiles with NO grid: the rank sketch ---------------------
    from fabstir_vectordb_spark.operators.sketch import (
        merge_sketches, sketch_partials, sketch_quantiles,
        suggest_sketch_k,
    )

    k = suggest_sketch_k(target_rank_error=0.01, n_estimate=1e8)
    cells = merge_sketches(
        sketch_partials(history, ["lang"], "n_chars", k=k).unionByName(
            sketch_partials(new_chunk, ["lang"], "n_chars", k=k)
        ),
        ["lang"], "n_chars",
    )
    est = sketch_quantiles(cells, ["lang"], "n_chars",
                           {"p50": 0.5, "p99": 0.99})
    out["sketch_langs"] = est.count()
    assert est.agg(F.sum("n")).first()[0] == docs.count()

    # --- 5. heavy hitters, exact tier -------------------------------------
    from fabstir_vectordb_spark.operators.olap import (
        top_values, top_values_from_summary,
    )

    hh_parts = merge_summaries(
        summarize(history, [*["lang"], "source"], {"w": ("count", None)}),
        summarize(new_chunk, ["lang", "source"], {"w": ("count", None)}),
    )
    inc_top = top_values_from_summary(hh_parts, ["lang"], "source", k=3)
    assert {tuple(r) for r in inc_top.collect()} == {
        tuple(r) for r in top_values(docs, ["lang"], "source", k=3).collect()
    }
    out["top_sources_rows"] = inc_top.count()

    # --- 6. heavy hitters, bounded tier (unbounded cardinality) -----------
    from fabstir_vectordb_spark.operators.sketch import (
        freq_partials, merge_freq, top_from_freq,
    )

    mg = merge_freq(
        freq_partials(history, ["lang"], "source", k=64),
        freq_partials(new_chunk, ["lang"], "source", k=64),
    )
    hits = top_from_freq(mg, top=3)
    out["mg_rows"] = hits.count()
    # with k above the source cardinality the summary is exact: same
    # values and counts as the exact tier
    assert {
        (r["lang"], r["value"], r["est"]) for r in hits.collect()
    } == {
        (r["lang"], r["value"], r["weight"]) for r in inc_top.collect()
    }

    # --- 7. exemplars, incrementally ---------------------------------------
    from fabstir_vectordb_spark.operators.sampling import (
        cap_per_group, exemplar_partials, exemplars_from_summary,
        merge_exemplars,
    )

    ex = exemplars_from_summary(
        merge_exemplars(
            exemplar_partials(history, "source", 5),
            exemplar_partials(new_chunk, "source", 5),
        )
    )
    assert {
        (r["source"], r["id"], r["rank"]) for r in ex.collect()
    } == {
        (r["source"], r["doc_id"], r["grp_rank"])
        for r in cap_per_group(docs, 5).filter("grp_kept").collect()
    }
    out["exemplar_rows"] = ex.count()

    return out


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("corpus_reports_example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in main(spark).items():
        print(f"{k}: {v}")
