"""Full-funnel scale smoke: run curate_corpus end to end (every
SQL-replayable stage ON) over an executor-side synthetic corpus.

Extends the per-doc-cost series in PERFORMANCE.md (200k/500k/1M/2M in
round 5).  Data is generated with spark.range + column expressions —
nothing ships from the driver — using the same discrimination properties
as tools/scale_smoke.py (4096-word vocab, planted exact + near dups)
plus a planted boilerplate footer line and a repeated span so the
boilerplate and span-trim stages have real work.

Usage: python tools/funnel_smoke.py [n_docs] [--checkpoint-dir DIR]
                                    [--stage-times]
Prints one JSON line {"n_docs": N, "funnel_s": S, "survivors": K, ...}.
--checkpoint-dir exercises the RELIABLE checkpoint branch of
curate_corpus's stage truncation (persist + checkpoint to durable
storage) instead of localCheckpoint.  --stage-times materializes the
funnel's audit frames in order and reports the incremental wall-clock
per drop stage (each count triggers exactly the work between that
stage's checkpoint and the previous one), locating which stage owns
the time at a given scale.
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
    doc_id = F.col("id")
    seed = F.when(
        (F.pmod(doc_id, 31) == 1) | (F.pmod(doc_id, 29) == 1), doc_id - 1
    ).otherwise(doc_id)
    length = (F.pmod(F.xxhash64(seed, F.lit("len")), 61) + 20).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(seed, i), 4096)),
    )
    words = F.when(
        (F.pmod(doc_id, 29) == 1) & (F.pmod(doc_id, 31) != 1),
        F.slice(words, 1, length - 1),
    ).otherwise(words)
    body = F.concat_ws(" ", words)
    # repeated 24-token span in 1/9 of docs (span-trim prey) and a hot
    # footer line in 1/2 (boilerplate prey)
    span = " ".join(f"sp{i}" for i in range(24))
    body = F.when(
        F.pmod(doc_id, 9) == 2, F.concat(body, F.lit(" " + span))
    ).otherwise(body)
    text = F.concat_ws(
        "\n", body,
        F.when(F.pmod(doc_id, 2) == 0, F.lit("-- corpus footer line --")),
    )
    src = F.concat(F.lit("src"), F.pmod(doc_id, 20))
    return spark.range(n).select(
        doc_id.alias("doc_id"), text.alias("text"), src.alias("source")
    )


def main() -> int:
    # flag VALUES must not leak into the positional list (the old
    # "drop everything starting with --" filter kept the checkpoint
    # dir and crashed int() on flag-only invocations)
    argv = sys.argv[1:]
    pos: list[str] = []
    ckpt = None
    stage_times = False
    r7_gates = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--checkpoint-dir":
            if i + 1 >= len(argv):
                raise SystemExit("--checkpoint-dir needs a value")
            ckpt = argv[i + 1]
            i += 2
        elif a == "--stage-times":
            stage_times = True
            i += 1
        elif a == "--r7-gates":
            r7_gates = True
            i += 1
        else:
            pos.append(a)
            i += 1
    n_docs = int(pos[0]) if pos else 200_000

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("funnel_smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)

    from fabstir_vectordb_spark.pipelines import curate_corpus

    docs = synth_docs(spark, n_docs)
    gate_kwargs: dict = {}
    if r7_gates:
        # the round-7 screen families ON, measuring their marginal
        # cost over the same corpus shape:
        # - every line gains terminal punctuation so the C4 line filter
        #   has real work instead of vacuously emptying the synthetic
        #   corpus (its lines end in w-words, not sentence punctuation)
        # - Gopher A1.1 thresholds relax to the synthetic vocab (no
        #   stopwords, digit-bearing words, 20-80-word docs): every
        #   signal still COMPUTES — the datum measures cost, not a
        #   vacuous 100% drop
        # - A1.2 runs at paper thresholds (the synthetic dups repeat
        #   ACROSS docs, not within, so signals are real but verdicts
        #   permissive)
        docs = docs.withColumn(
            "text",
            F.concat_ws(
                "\n",
                F.transform(
                    F.split(F.col("text"), "\n"),
                    lambda l: F.concat(l, F.lit(" end.")),
                ),
            ),
        )
        gate_kwargs = dict(
            c4_rules=True,
            gopher={
                "min_words": 0,
                "min_required_hits": 0,
                "min_alpha_frac": 0.0,
                "min_mean_word_len": 0.0,
                "max_mean_word_len": 100.0,
                "max_symbol_ratio": 1.0,
            },
            gopher_repetition=True,
        )
    docs = docs.repartition(64).cache()
    docs.count()

    bench = docs.filter(F.col("doc_id") % 5000 == 0).select("text")
    aud: dict = {}
    t0 = time.time()
    out = curate_corpus(
        docs,
        **gate_kwargs,
        boilerplate_min_doc_freq=1000,
        lang="en",
        min_quality=None,        # synthetic w-words have no stopwords
        max_repetition=0.6,
        token_bounds=(10, 5000),
        near_dup_threshold=0.8,
        benchmark=bench,
        decontaminate_ngram=8,
        source_col="source",
        max_per_source=max(1000, n_docs // 40),
        mixture={f"src{i}": 0.05 for i in range(20)},
        mixture_tokens=int(n_docs * 40),
        lm_drop_fraction=0.05,
        trim_span_tokens=20,
        trim_span_min_occurrences=3,
        audit=aud if stage_times else None,
    )
    stage_s = {}
    if stage_times:
        prev = time.time()
        for name, frame in aud.items():
            n = frame.count()
            stage_s[name] = {"s": round(time.time() - prev, 1), "rows": n}
            prev = time.time()
    survivors = out.count()
    wall = round(time.time() - t0, 1)
    rec = {
        "n_docs": n_docs,
        "funnel_s": wall,
        "us_per_doc": round(wall * 1e6 / n_docs, 1),
        "survivors": survivors,
        "checkpoint": "reliable" if ckpt else "local",
        "r7_gates": r7_gates,
    }
    if stage_times:
        rec["stage_s"] = stage_s
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
