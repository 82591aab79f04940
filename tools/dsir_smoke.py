"""DSIR scale smoke: fit + score + select over an executor-side
synthetic corpus (operators/dsir.py).

The corpus mixes two disjoint vocabulary styles (1/8 of docs speak the
"target" style); the target exemplar set is a fixed 2,000-doc slice of
the target style.  Measures the three phases separately — fit (two
bucket-count aggregations), score (broadcast join + per-doc mean),
select (global rank of one scalar per doc) — and reports the style
purity of the selection (fraction of selected docs that are genuinely
target-style: the method's end-to-end quality signal at scale).

Usage: python tools/dsir_smoke.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_docs(spark, n: int):
    # Two styles with SMALL per-style vocabularies (128 tokens each) so
    # style bigrams genuinely repeat across documents — DSIR learns an
    # n-gram DISTRIBUTION, so the fixture must put the style signal in
    # recurring n-grams, not in per-doc-unique strings (a large crossed
    # vocab makes every bigram near-unique: nothing to transfer from the
    # exemplars to fresh documents, and any selector's purity pins to
    # the base rate).
    doc_id = F.col("id")
    is_target_style = F.pmod(doc_id, 8) == 3
    length = (F.pmod(F.xxhash64(doc_id, F.lit("len")), 61) + 20).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda i: F.concat(
            F.when(is_target_style, F.lit("t")).otherwise(F.lit("w")),
            F.pmod(F.xxhash64(doc_id, i), 128),
        ),
    )
    return spark.range(n).select(
        doc_id.alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        is_target_style.alias("is_target_style"),
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    temperature = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dsir_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fabstir_vectordb_spark.operators.dsir import (
        dsir_score,
        dsir_select,
        fit_dsir_ratios,
    )

    docs = synth_docs(spark, n_docs).repartition(64).cache()
    docs.count()
    target = docs.filter(F.col("is_target_style") & (F.col("doc_id") < 16_000))
    k_keep = n_docs // 20

    t0 = time.time()
    ratios = fit_dsir_ratios(
        target, docs, n=2, num_buckets=65_536, k=0.5
    ).cache()
    ratios.count()
    fit_s = time.time() - t0

    t0 = time.time()
    scored = dsir_score(docs, ratios, n=2, num_buckets=65_536).cache()
    scored.count()
    score_s = time.time() - t0

    t0 = time.time()
    sel = dsir_select(scored, k_keep=k_keep, temperature=temperature)
    purity = (
        sel.filter("selected")
        .join(docs.select(F.col("doc_id").alias("id"), "is_target_style"), "id")
        .agg(F.avg(F.col("is_target_style").cast("double")))
        .first()[0]
    )
    select_s = time.time() - t0

    print(json.dumps({
        "n_docs": n_docs,
        "k_keep": k_keep,
        "temperature": temperature,
        "fit_s": round(fit_s, 1),
        "score_s": round(score_s, 1),
        "select_s": round(select_s, 1),
        "selected_purity": round(float(purity), 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
