"""IVF (inverted-file) approximate nearest neighbor — clustered-table ANN.

Parity targets (reference):
  k-means train (k-means++ + Lloyd)   src/ivf/core.rs:240-429
  insert = nearest-centroid assign    src/ivf/core.rs:431-491
  n_probe search                      src/ivf/core.rs:622-681
  retrain / optimize clusters         src/ivf/operations.rs:148-261
  balance clusters                    src/ivf/operations.rs:422-492
  recall/precision self-evaluation    src/ivf/operations.rs:329-391
  cluster distribution / stats        src/ivf/core.rs:536-550, operations.rs:264-289
  defaults: 256 clusters, n_probe=16, train_size=10000, 25 iters
                                      src/ivf/core.rs:50-60

Spark-first shape: the "inverted lists" are a vectors table augmented
with a ``cluster_id`` column (MLlib KMeans assignment) and written
``partitionBy("cluster_id")``.  Search computes each query's n_probe
nearest centroids driver-side (centroids are tiny), then scans ONLY the
probed partitions: a ``cluster_id IN (...)`` predicate gives Catalyst
partition pruning, and a broadcast (query, cluster) pair join restricts
each query to exactly its own probe set — the reference's list-probing
semantics, executed as a pruned scan.

The HNSW graph is deliberately NOT ported (pointer-chasing ⟂ BSP); its
observable contract — approximate top-k with high recall — is served by
this operator, with ``probe_all`` (n_probe = n_clusters) exactly equal
to brute force, which is both the reference's own ground-truth trick and
our oracle hook.

Small-data mode: below ``min_training_size`` (reference: 10,
src/hybrid/core.rs:262-269) no clustering happens and search degrades to
an exact scan — identical observable behavior to the reference's
"HNSW-only mode".
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fabstir_vectordb_spark.functions import distance as D
from fabstir_vectordb_spark.operators.knn import brute_force_knn
from fabstir_vectordb_spark.operators.topk import topk_per_query

DEFAULT_N_CLUSTERS = 256  # src/ivf/core.rs:50-60
DEFAULT_N_PROBE = 16
DEFAULT_TRAIN_SIZE = 10_000
DEFAULT_MAX_ITER = 25
MIN_TRAINING_SIZE = 10  # below this: brute-force mode (hybrid/core.rs:262-269)


@dataclass
class IVFIndex:
    centroids: np.ndarray | None  # (n_clusters, dim) float64; None = brute-force mode
    id_col: str = "id"
    vector_col: str = "vector"
    training_error: float | None = None  # mean sq dist (ivf/core.rs:419-429)

    # ------------------------------------------------------------------ fit

    @classmethod
    def fit(
        cls,
        vectors: DataFrame,
        n_clusters: int = DEFAULT_N_CLUSTERS,
        train_size: int = DEFAULT_TRAIN_SIZE,
        max_iter: int = DEFAULT_MAX_ITER,
        seed: int = 42,
        id_col: str = "id",
        vector_col: str = "vector",
        engine: str = "sample",
    ) -> "IVFIndex":
        """Train on a deterministic sample (order by id, take train_size) —
        the reference trains on the first ``train_size`` inserts.

        engine="sample" (default): collect the size-capped sample and run
        driver-side numpy k-means — the sample is <= train_size rows
        (~30 MB at 10k x 384), and MLlib's distributed Lloyd pays ~maxIter
        rounds of job-scheduling overhead for data this small.
        engine="mllib": distributed KMeans for when train_size is raised
        beyond driver scale."""
        n = vectors.count()
        if n < MIN_TRAINING_SIZE:
            return cls(centroids=None, id_col=id_col, vector_col=vector_col)
        n_clusters = min(n_clusters, n)  # k-means needs >= k points (ivf/core.rs:252)

        if engine == "sample":
            from fabstir_vectordb_spark.operators._kmeans import (
                kmeans_fit,
                training_error,
            )

            sample = (
                vectors.select(F.col(vector_col).alias("__arr"))
                .orderBy(vectors[id_col])
                .limit(train_size)
                .collect()
            )
            X = np.asarray([np.asarray(r[0], dtype=np.float64) for r in sample])
            cents = kmeans_fit(
                X, n_clusters, iters=max_iter, rng=np.random.RandomState(seed)
            )
            idx = cls(centroids=cents, id_col=id_col, vector_col=vector_col)
            idx.training_error = training_error(X, cents)
            return idx

        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = (
            vectors.select(F.col(vector_col).alias("__arr"))
            .orderBy(vectors[id_col])
            .limit(train_size)
            .withColumn("features", array_to_vector(F.col("__arr").cast("array<double>")))
        )
        km = KMeans(k=n_clusters, maxIter=max_iter, seed=seed, featuresCol="features")
        model = km.fit(train)
        cents = np.array([np.asarray(c) for c in model.clusterCenters()], dtype=np.float64)
        return cls(centroids=cents, id_col=id_col, vector_col=vector_col)

    @property
    def n_clusters(self) -> int:
        return 0 if self.centroids is None else len(self.centroids)

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    # --------------------------------------------------------------- assign

    def assign(self, vectors: DataFrame, out_col: str = "cluster_id") -> DataFrame:
        """Add nearest-centroid cluster ids (IVF insert, ivf/core.rs:431-455).

        Arrow-batched numpy argmin over the broadcast centroid matrix —
        one (batch x n_clusters) GEMM per Arrow batch, no per-row Python.
        (A pure column-expression argmin over 256 centroids x D dims blows
        past codegen method limits, so the kernel is the right physical
        choice here.)
        """
        import pandas as pd
        from pyspark.sql import types as T

        if self.centroids is None:
            return vectors.withColumn(out_col, F.lit(0))

        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast(self.centroids)
        vector_col = self.vector_col
        out_schema = T.StructType(
            list(vectors.schema) + [T.StructField(out_col, T.IntegerType(), False)]
        )

        def assign_batches(batches):
            C = bc.value  # (n_clusters, dim)
            c_sq = (C * C).sum(axis=1)
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
                )
                # argmin_c |v-c|^2 = argmin_c (|c|^2 - 2 v.c); |v|^2 constant per row
                scores = c_sq[None, :] - 2.0 * (V @ C.T)
                yield pdf.assign(**{out_col: scores.argmin(axis=1).astype("int32")})

        return vectors.mapInPandas(assign_batches, out_schema)

    # --------------------------------------------------------------- search

    def _probes_from_rows(self, rows: list, n_probe: int) -> list[tuple]:
        out = []
        for r in rows:
            q = np.asarray(r[1], dtype=np.float64)
            d = np.linalg.norm(self.centroids - q, axis=1)
            order = np.lexsort((np.arange(len(d)), np.round(d, 6)))[:n_probe]
            for cid in order:
                out.append((r[0], int(cid)))
        return out

    def probes_for(self, queries: DataFrame, n_probe: int, query_id_col="query_id",
                   query_vector_col="vector") -> list[tuple]:
        """Driver-side: rank centroids per query, take n_probe
        (ivf/core.rs:645-656). Centroids are tiny — this is the same
        'broadcast the small side' decision the reference hard-codes."""
        rows = queries.select(query_id_col, query_vector_col).collect()
        return self._probes_from_rows(rows, n_probe)

    def search(
        self,
        vectors_with_cluster: DataFrame,
        queries: DataFrame,
        k: int,
        n_probe: int = DEFAULT_N_PROBE,
        metric: str = "l2",
        cluster_col: str = "cluster_id",
        query_id_col: str = "query_id",
        query_vector_col: str = "vector",
    ) -> DataFrame:
        """Probe n_probe clusters per query, exact top-k within the probe set.

        Plan shape: `cluster_id IN (union probes)` prunes partitions at the
        scan, then a broadcast hash join on (cluster_id) fans each surviving
        row out only to the queries that probed its cluster.
        """
        if self.centroids is None:
            # brute-force mode (below training threshold)
            return brute_force_knn(
                vectors_with_cluster, queries, k, metric=metric,
                id_col=self.id_col, vector_col=self.vector_col,
                query_id_col=query_id_col, query_vector_col=query_vector_col,
            )
        n_probe = min(n_probe, self.n_clusters)
        spark = vectors_with_cluster.sparkSession
        # ONE query-set collect serves both the probe ranking and the
        # broadcast (query, cluster, vector) table
        qrows = queries.select(query_id_col, query_vector_col).collect()
        pairs = self._probes_from_rows(qrows, n_probe)
        probe_union = sorted({cid for _, cid in pairs})

        # NOTE (r11 optimization round): an attach-vectors-by-in-plan-join
        # variant (createDataFrame of (qid, cid) pairs only, broadcast
        # join against `queries` for the vectors) was measured 1.26x
        # SLOWER in an interleaved A/B at sf0.1 — the join adds a scan +
        # join stage inside the broadcast build that costs more than
        # re-serializing the (tiny, <= Q) query vectors through
        # createDataFrame.  Kept as the direct local relation.
        qvecs = {r[0]: r[1] for r in qrows}
        probes = spark.createDataFrame(
            [(qid, cid, qvecs[qid]) for qid, cid in pairs],
            schema=queries.select(
                F.col(query_id_col).alias("query_id"),
                F.lit(0).alias("cluster_id"),
                F.col(query_vector_col).alias("__qvec"),
            ).schema,
        )
        pruned = vectors_with_cluster.filter(F.col(cluster_col).isin(probe_union))
        joined = pruned.join(
            F.broadcast(probes),
            pruned[cluster_col] == probes["cluster_id"],
            "inner",
        )
        dist = D.distance_expr(metric, F.col(self.vector_col), F.col("__qvec"))
        scored = joined.select(
            "query_id", F.col(self.id_col).alias("id"), dist.alias("distance")
        )
        return topk_per_query(scored, k)

    def search_bulk(
        self,
        vectors_with_cluster: DataFrame,
        queries: DataFrame,
        k: int,
        n_probe: int = DEFAULT_N_PROBE,
        metric: str = "l2",
        cluster_col: str = "cluster_id",
        query_id_col: str = "query_id",
        query_vector_col: str = "vector",
        sub_blocks: int = 1,
    ) -> DataFrame:
        """IVF probe search with the QUERY SET as a DataFrame — no driver
        collect anywhere, the bulk companion to ``search`` (reference
        analogue: parallel_search, src/hybrid/search_integration.rs:125-211,
        which loops per query; this is set-at-a-time).

        ``sub_blocks``: the cogroup loads ONE block's vectors into one
        task's Arrow frame, so a block must fit task memory.  With S > 1
        each cluster splits into S hash sub-blocks (probes replicate per
        sub-block — an S-fold fanout of the tiny probe table, the same
        deliberate small-side cost as knn_bulk's vector_blocks knob);
        size S so cluster_rows/S * dim * 8B fits an executor task.  The
        merge is unchanged: top-k over block-local partials is exact for
        any partitioning of the same probed row set.

        Plan: centroids (tiny, driver-held by construction) broadcast
        into a map-only Arrow kernel that ranks them per query batch with
        one GEMM and emits the n_probe nearest as (query, cluster) rows —
        distributed probe selection with the exact ranking order of the
        driver path (``_probes_from_rows``).  The probe table (Q x
        n_probe rows) then COGROUPS with the clustered table on
        cluster_id, and each cluster runs one vectorized GEMM kernel
        emitting <= k rows per (query, cluster) — the same block-partial
        shape as knn_bulk, with the IVF cluster as the block.  (Both a
        plain join + distance expression and a crossJoin + window over
        centroids leave the distance in interpreted higher-order
        functions — HOFs never enter whole-stage codegen — which
        measured ~10x slower at Q=8 and ~100s at Q=2000 when the query
        side sat on one post-limit partition.)

        At n_probe = n_clusters this is exactly brute force — the same
        oracle hook as ``search``.
        """
        import pandas as pd
        from pyspark.sql import types as T

        from fabstir_vectordb_spark.operators.knn import cogroup_block_knn, knn_bulk

        if self.centroids is None:
            return knn_bulk(
                vectors_with_cluster, queries, k, metric=metric,
                id_col=self.id_col, vector_col=self.vector_col,
                query_id_col=query_id_col, query_vector_col=query_vector_col,
            )
        spark = vectors_with_cluster.sparkSession
        probes = self.probe_pairs(
            queries, n_probe,
            query_id_col=query_id_col, query_vector_col=query_vector_col,
        )
        v = vectors_with_cluster.select(
            F.col(self.id_col).alias("id"),
            F.col(self.vector_col).alias("__v"),
            F.col(cluster_col).cast("int").alias("__blk"),
        )
        if sub_blocks > 1:
            S = sub_blocks
            v = v.withColumn(
                "__blk",
                F.col("__blk") * S
                + F.pmod(F.xxhash64(F.col("id")), F.lit(S)).cast("int"),
            )
            subs = spark.range(S).select(F.col("id").cast("int").alias("__sub"))
            probes = probes.crossJoin(subs).select(
                "query_id",
                (F.col("__blk") * S + F.col("__sub")).alias("__blk"),
                "__qv",
            )
        partials = cogroup_block_knn(
            v, probes, k, metric,
            qid_type=queries.schema[query_id_col].dataType,
            id_type=vectors_with_cluster.schema[self.id_col].dataType,
        )
        return topk_per_query(partials, k)

    def probe_pairs(
        self,
        queries: DataFrame,
        n_probe: int,
        query_id_col: str = "query_id",
        query_vector_col: str = "vector",
    ) -> DataFrame:
        """Distributed probe selection: (query_id, __blk, __qv) rows, one
        per probed cluster — a map-only Arrow kernel over the broadcast
        centroids with the exact ranking order of the driver path
        (``_probes_from_rows``).  Shared by ``search_bulk`` and the
        IVFPQ composition (operators/ivfpq.py)."""
        import pandas as pd
        from pyspark.sql import types as T

        if self.centroids is None:
            raise ValueError(
                "index is untrained (brute-force mode): no centroids to probe"
            )
        spark = queries.sparkSession
        bc = spark.sparkContext.broadcast(self.centroids)
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vector_col).alias("__qv"),
        )
        probe_schema = T.StructType(
            [
                T.StructField("query_id", queries.schema[query_id_col].dataType, False),
                T.StructField("__blk", T.IntegerType(), False),
                T.StructField("__qv", q.schema["__qv"].dataType, False),
            ]
        )
        np_ = min(n_probe, self.n_clusters)

        def probe_kernel(batches):
            C = np.asarray(bc.value, dtype=np.float64)
            for pdf in batches:
                if pdf.empty:
                    continue
                out_qid, out_blk, out_qv = [], [], []
                for qid, qv in zip(pdf["query_id"], pdf["__qv"]):
                    # same arithmetic + tie order as _probes_from_rows
                    d = np.linalg.norm(C - np.asarray(qv, dtype=np.float64), axis=1)
                    order = np.lexsort((np.arange(len(d)), np.round(d, 6)))[:np_]
                    out_qid.extend([qid] * len(order))
                    out_blk.extend(int(c) for c in order)
                    out_qv.extend([qv] * len(order))
                yield pd.DataFrame(
                    {"query_id": out_qid, "__blk": out_blk, "__qv": out_qv}
                )

        return q.mapInPandas(probe_kernel, probe_schema)

    # ------------------------------------------------------------- evaluate

    def evaluate_recall(
        self,
        vectors_with_cluster: DataFrame,
        queries: DataFrame,
        k: int,
        n_probe: int,
        **search_cols,
    ) -> dict:
        """ANN vs exhaustive ground truth (ivf/operations.rs:329-391)."""
        ann = self.search(vectors_with_cluster, queries, k, n_probe, **search_cols)
        exact = brute_force_knn(
            vectors_with_cluster, queries, k,
            id_col=self.id_col, vector_col=self.vector_col,
        )
        hits = ann.select("query_id", "id").intersect(exact.select("query_id", "id"))
        n_queries = queries.count()
        n_hits = hits.count()
        n_exact = exact.count()
        n_ann = ann.count()
        return {
            "avg_recall": n_hits / n_exact if n_exact else 1.0,
            "avg_precision": n_hits / n_ann if n_ann else 1.0,
            "n_queries": n_queries,
        }

    # ---------------------------------------------------------- maintenance

    def cluster_stats(self, assigned: DataFrame, cluster_col: str = "cluster_id") -> dict:
        """n_clusters, total, avg/variance of sizes, empty count
        (ivf/operations.rs:264-289, size variance :552-564)."""
        sizes = assigned.groupBy(cluster_col).count()
        row = sizes.agg(
            F.sum("count").alias("total"),
            F.avg("count").alias("avg"),
            F.var_pop("count").alias("var"),
            F.count("*").alias("nonempty"),
        ).collect()[0]
        return {
            "n_clusters": self.n_clusters,
            "total_vectors": row["total"] or 0,
            "avg_cluster_size": float(row["avg"] or 0.0),
            "size_variance": float(row["var"] or 0.0),
            "empty_clusters": self.n_clusters - (row["nonempty"] or 0),
        }

    def retrain(self, vectors: DataFrame, n_clusters: int | None = None, **fit_kw) -> "IVFIndex":
        """Re-fit with a new cluster count and reassign — covers the
        reference's retrain / add_clusters / optimize / balance family
        (ivf/operations.rs:148-261,422-492): Spark assignment is always
        exact nearest-centroid, so imbalance repair IS retraining."""
        return IVFIndex.fit(
            vectors,
            n_clusters=n_clusters or self.n_clusters or DEFAULT_N_CLUSTERS,
            id_col=self.id_col,
            vector_col=self.vector_col,
            **fit_kw,
        )

    # ---------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        meta = {
            "n_clusters": self.n_clusters,
            "id_col": self.id_col,
            "vector_col": self.vector_col,
            "centroids": None if self.centroids is None else self.centroids.tolist(),
        }
        with open(os.path.join(path, "ivf_index.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        with open(os.path.join(path, "ivf_index.json")) as f:
            meta = json.load(f)
        cents = meta["centroids"]
        return cls(
            centroids=None if cents is None else np.asarray(cents, dtype=np.float64),
            id_col=meta["id_col"],
            vector_col=meta["vector_col"],
        )


def write_clustered(
    vectors: DataFrame,
    index: IVFIndex,
    path: str,
    cluster_col: str = "cluster_id",
    codec: str = "snappy",
) -> None:
    """Persist the clustered table partitioned by cluster id — the Spark
    equivalent of the reference's per-list chunk files (SURVEY §2.7): a
    probed query reads only its clusters' files (partition pruning).

    ``codec``: parquet compression — the reference's CBOR+zstd chunk
    format (SURVEY §2 row 71) maps to ``codec="zstd"`` here; snappy
    stays the hot-table default (cheaper decode on the probe path)."""
    assigned = index.assign(vectors, out_col=cluster_col)
    assigned.write.mode("overwrite").option("compression", codec).partitionBy(
        cluster_col
    ).parquet(path)
    index.save(path)


def read_clustered(spark: SparkSession, path: str) -> tuple[DataFrame, IVFIndex]:
    return spark.read.parquet(path), IVFIndex.load(path)
