"""Capture .explain("formatted") for the bench headline queries.

Usage: python tools/capture_plans.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each bench query (default
suffix "before"; default query set = bench.py's BENCH_QUERIES with the
same raw-body overrides the bench times).  Plans are captured with the
bench's session configuration so what we read is what the bench runs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
import bench  # noqa: E402


def main() -> int:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("plans/r11")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    out_dir.mkdir(parents=True, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture_plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    qs.update(
        {
            "knn_l2": E.q_knn_l2,
            "knn_cosine": E.q_knn_cosine,
            "knn_dot": E.q_knn_dot,
            "ann_ivf_probe": E.q_ann_ivf_probe_raw,
            "filter_or_mixed": E.q_filter_or_mixed,
            "simhash": E.q_simhash_raw,
            "hybrid_merge": E.q_hybrid_merge_raw,
            "dedup_exact": E.q_dedup_exact_raw,
            "text_stats": E.q_text_stats_raw,
            "text_quality": E.q_text_quality_raw,
            "keyword_bm25": E.q_keyword_bm25_raw,
        }
    )
    names = [n for n in bench.BENCH_QUERIES if n in qs]
    if only:
        names = [n for n in names if n in only]

    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"captured {name}")
        except Exception as e:  # keep going; report at the end
            print(f"FAILED {name}: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
