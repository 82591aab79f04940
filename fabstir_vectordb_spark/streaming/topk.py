"""Streaming top-k accumulator (SURVEY §2.2) as a stateful streaming op.

Parity target: StreamingTopK (src/core/vector_ops.rs:204-263): add
(id, score) pairs incrementally, keep the best k, emit sorted.  The
reference uses it in-process; here it is a real Structured Streaming
stateful operator via applyInPandasWithState — per query_id, the state
holds the current top-k (ids + distances), each micro-batch merges its
rows in, and the operator emits the updated top-k.

State is bounded at k rows per key.  Deterministic ordering matches the
batch engine: (round(distance, 6), id) ascending.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ROUND = 6

STATE_SCHEMA = "ids array<string>, dists array<double>"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("distance", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)


def _merge_topk(
    ids: list[str], dists: list[float], new_ids: list[str], new_dists: list[float], k: int
) -> tuple[list[str], list[float]]:
    best: dict[str, float] = {}
    for i, d in zip(ids + new_ids, dists + new_dists):
        # duplicate ids keep min distance (SearchResult::dedup semantics)
        if i not in best or d < best[i]:
            best[i] = d
    ranked = sorted(best.items(), key=lambda t: (round(t[1], ROUND), t[0]))[:k]
    return [i for i, _ in ranked], [d for _, d in ranked]


def streaming_topk(
    stream: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "id",
    distance_col: str = "distance",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Keep a running top-k per query over a stream of scored candidates.

    Emits the full current top-k of every key seen in the micro-batch
    (output mode: update semantics — downstream sinks see the newest
    ranking per key)."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, dists = state.get
            ids, dists = list(ids), list(dists)
        else:
            ids, dists = [], []
        new_ids: list[str] = []
        new_dists: list[float] = []
        for pdf in pdfs:
            new_ids.extend(str(x) for x in pdf[id_col])
            new_dists.extend(float(x) for x in pdf[distance_col])
        ids, dists = _merge_topk(ids, dists, new_ids, new_dists, k)
        state.update((ids, dists))
        yield pd.DataFrame(
            {
                "query_id": [key[0]] * len(ids),
                "id": ids,
                "distance": dists,
                "rank": list(range(1, len(ids) + 1)),
            }
        )

    return (
        stream.select(query_col, id_col, distance_col)
        .groupBy(query_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )
