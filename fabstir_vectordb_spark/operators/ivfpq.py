"""IVF x PQ: the canonical big-corpus ANN layout (the IVFADC structure of
Jegou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — coarse inverted lists + product-quantized residuals).
``residual=True`` is the paper's IVFADC exactly (PQ over x - centroid);
the default raw-vector PQ stays for composability with the standalone
quantizer and for untrained-IVF degradation.

At 100 TB this is THE structure that works: the encoded table
(id, cluster_id, pq_codes) is ~32 bytes/vector instead of 256+ for raw
float32x64, persisted ``partitionBy(cluster_id)`` so a probe reads only
n_probe/n_clusters of the files (Catalyst partition pruning), ADC scans
codes with M table lookups per row (no full-width math, no decode), and
the full-precision vectors are touched ONLY for the Q x k x oversample
re-rank rows.

Plan shape per search: one map-only probe-selection kernel over the
broadcast centroids (Q x n_probe rows), a cogroup of the probed clusters'
codes with their probing queries (one (M, K) lookup table per query per
cluster, block-local top-(k*oversample)), then the exact re-rank join.
Shuffle volume: Q x n_probe x k*oversample partial rows — never codes,
never raw vectors.

Reference parity: composes SURVEY §2.4 (IVF probe search,
ivf/core.rs:622-681) with §2.1 PQ (vector_ops.rs:390-578); the reference
never combines them — this is the scale-path extension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fabstir_vectordb_spark.operators.ivf import IVFIndex
from fabstir_vectordb_spark.operators.pq import ProductQuantizer, _adc_tables
from fabstir_vectordb_spark.operators.topk import ROUND_DECIMALS, topk_per_query


class IVFPQIndex:
    def __init__(self, ivf: IVFIndex, pq: ProductQuantizer, residual: bool = False):
        self.ivf = ivf
        self.pq = pq
        # residual=True is the TRUE IVFADC of the paper: PQ quantizes
        # r = x - centroid(cluster), whose variance is what remains
        # AFTER the coarse quantizer explains the cluster structure —
        # tighter codebooks, better recall at the same byte budget.
        # False keeps raw-vector PQ (composable with the standalone
        # quantizer, and the only option when the IVF is untrained).
        self.residual = bool(residual)
        # set by fit(recall_target=...): the PQPlan whose n_probe /
        # oversample become search_bulk's defaults for this index
        self.tuned = None

    def _with_residual(self, assigned: DataFrame, out_col: str) -> DataFrame:
        """assigned (+cluster_id) -> + residual column, JVM-side: a
        broadcast (cluster_id, centroid) join + zip_with subtraction —
        no Python, no shuffle (broadcast hash join)."""
        spark = assigned.sparkSession
        cents = spark.createDataFrame(
            [(int(c), self.ivf.centroids[c].tolist())
             for c in range(len(self.ivf.centroids))],
            "cluster_id int, __cent array<double>",
        )
        return (
            assigned.join(F.broadcast(cents), "cluster_id")
            .withColumn(
                out_col,
                F.zip_with(
                    F.col(self.ivf.vector_col).cast("array<double>"),
                    "__cent",
                    lambda x, y: x - y,
                ),
            )
            .drop("__cent")
        )

    @classmethod
    def fit(
        cls,
        vectors: DataFrame,
        n_clusters: int = 16,
        n_subspaces: int = 8,
        n_centroids: int = 32,
        seed: int = 42,
        id_col: str = "vec_id",
        vector_col: str = "embedding",
        residual: bool = False,
        recall_target: float | None = None,
        opq: bool | str | None = None,
    ) -> "IVFPQIndex":
        """``recall_target`` auto-tunes the code geometry from the
        measured knob-recovery guidance (plans/tuning.tune_pq): it
        OVERRIDES n_subspaces / n_centroids / residual, and stores the
        recommended n_probe / oversample on the index so search_bulk
        uses them when the caller doesn't pass explicit values.  This
        exists because guidance that lives only in docs doesn't protect
        the user: the historical 8-subspace default bottoms out at
        0.28-0.36 recall@10 on distance-concentrated corpora while the
        tuned plan reaches 0.91 on the same data (PERFORMANCE.md
        "IVFPQ knob recovery at 500k")."""
        tuned = None
        if recall_target is not None:
            from fabstir_vectordb_spark.plans.tuning import tune_pq

            first = vectors.select(F.size(vector_col)).first()
            dim = int(first[0]) if first is not None else 0
            n_rows = vectors.count()
            tuned = tune_pq(
                dim, recall_target=recall_target, n_clusters=n_clusters,
                train_rows=min(n_rows, 10_000), dataset_size=n_rows,
            )
            n_subspaces = tuned.n_subspaces
            n_centroids = tuned.n_centroids
            residual = tuned.residual
            # an explicit opq argument (True OR False) always wins; only
            # the None default takes the tuned plan's recommendation —
            # `opq or tuned.opq` would make an explicit False
            # indistinguishable from unset and force the rotation fit
            if opq is None:
                opq = tuned.opq
        ivf = IVFIndex.fit(
            vectors, n_clusters=n_clusters, seed=seed,
            id_col=id_col, vector_col=vector_col,
        )
        if residual and ivf.centroids is not None:
            idx = cls(ivf, None, residual=True)
            res = idx._with_residual(ivf.assign(vectors), "__res")
            idx.pq = ProductQuantizer.fit(
                res, n_subspaces=n_subspaces, n_centroids=n_centroids,
                seed=seed, vector_col="__res", opq=opq,
            )
            idx.tuned = tuned
            return idx
        pq = ProductQuantizer.fit(
            vectors, n_subspaces=n_subspaces, n_centroids=n_centroids,
            seed=seed, vector_col=vector_col, opq=opq,
        )
        idx = cls(ivf, pq, residual=False)
        idx.tuned = tuned
        return idx

    def encode(self, vectors: DataFrame) -> DataFrame:
        """(input cols, cluster_id, pq_codes) — what a 100 TB deployment
        persists ``partitionBy(cluster_id)``; raw vectors are needed only
        if exact re-rank is wanted at query time.

        Untrained-IVF mode (below the training threshold, mirroring
        IVFIndex's small-data bypass): everything lands in cluster 0 and
        search degrades to plain ADC over the whole table."""
        if self.ivf.centroids is None:
            assigned = vectors.withColumn("cluster_id", F.lit(0).cast("int"))
        else:
            assigned = self.ivf.assign(vectors)
        if self.residual and self.ivf.centroids is not None:
            res = self._with_residual(assigned, "__res")
            return self.pq.encode(res, vector_col="__res").drop("__res")
        return self.pq.encode(assigned, vector_col=self.ivf.vector_col)

    def search_bulk(
        self,
        encoded: DataFrame,
        queries: DataFrame,
        k: int,
        n_probe: int | None = None,
        oversample: int | None = None,
        rerank_vectors: DataFrame | None = None,
        cluster_col: str = "cluster_id",
        code_col: str = "pq_codes",
        query_id_col: str = "query_id",
        query_vector_col: str = "vector",
        prune_scan: bool = False,
    ) -> DataFrame:
        """Probe n_probe clusters, ADC over only their codes, exact
        re-rank of the oversampled candidates.  Query set stays a
        DataFrame end-to-end (no driver collect).  At n_probe =
        n_clusters the probe set is the whole table, so the result
        equals plain PQ ADC(+rerank) — the oracle hook.

        ``prune_scan=True``: collect the DISTINCT probed cluster ids (a
        tiny list, <= n_clusters ints) and filter ``encoded`` with a
        static ``cluster_id IN (...)`` BEFORE the cogroup.  Over a table
        persisted partitionBy(cluster_id) (write_encoded) this reaches
        the scan as PartitionFilters — only n_probe/n_clusters of the
        files are read, the 100 TB I/O claim of this module's header.
        Default off: the in-memory path doesn't need the extra tiny job.

        ``n_probe`` / ``oversample`` default to the index's tuned plan
        (fit(recall_target=...)) when one exists, else to the legacy
        (4, 4) — explicit arguments always win."""
        if n_probe is None:
            n_probe = self.tuned.n_probe if self.tuned is not None else 4
        if oversample is None:
            oversample = self.tuned.oversample if self.tuned is not None else 4
        id_col = self.ivf.id_col
        if self.ivf.centroids is None:
            # small-data bypass: no coarse partition exists — plain ADC
            # over all codes (same graceful degradation as
            # IVFIndex.search_bulk's brute-force fallback)
            return self.pq.adc_knn_bulk(
                encoded, queries, k,
                id_col=id_col, code_col=code_col,
                query_id_col=query_id_col, query_vector_col=query_vector_col,
                rerank_vectors=rerank_vectors, oversample=oversample,
                rerank_vector_col=self.ivf.vector_col,
            )
        probes = self.ivf.probe_pairs(
            queries, n_probe,
            query_id_col=query_id_col, query_vector_col=query_vector_col,
        )
        if prune_scan:
            probed = sorted(
                r[0] for r in probes.select("__blk").distinct().collect()
            )
            encoded = encoded.filter(F.col(cluster_col).isin(probed))
        v = encoded.select(
            F.col(id_col).alias("id"),
            F.col(code_col).alias("__codes"),
            F.col(cluster_col).cast("int").alias("__blk"),
        )
        bc = encoded.sparkSession.sparkContext.broadcast(
            (self.pq.codebooks, self.pq.rotation)
        )
        bc_cents = (
            encoded.sparkSession.sparkContext.broadcast(self.ivf.centroids)
            if self.residual
            else None
        )
        residual = self.residual
        M, sub = self.pq.n_subspaces, self.pq.sub_dim
        fetch = k * (oversample if rerank_vectors is not None else 1)

        out_schema = T.StructType(
            [
                T.StructField("query_id", queries.schema[query_id_col].dataType, False),
                T.StructField("id", encoded.schema[id_col].dataType, False),
                T.StructField("distance", T.DoubleType(), False),
            ]
        )

        def cluster_adc(key, vpdf: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
            # one probed cluster x the queries that probed it: same
            # per-pair arithmetic and (round(6), id) tie order as
            # ProductQuantizer.adc_knn_bulk's block kernel.  In residual
            # mode (true IVFADC) the LUT is built from the query's
            # RESIDUAL vs this cluster's centroid — the codes encode
            # x - centroid, so ||x - q|| == ||code - (q - centroid)||.
            if vpdf.empty or qpdf.empty:
                return pd.DataFrame({"query_id": [], "id": [], "distance": []})
            books, rot = bc.value
            codes = np.asarray([np.asarray(c) for c in vpdf["__codes"]])
            ids = vpdf["id"].to_numpy()
            if ids.dtype == object:
                ids = ids.astype(str)
            cent = bc_cents.value[int(key[0])] if residual else None
            marange = np.arange(M)[None, :]
            Qm = np.asarray(
                [np.asarray(qv, dtype=np.float64) for qv in qpdf["__qv"]]
            )
            if residual:
                # elementwise broadcast == the former per-query subtract
                Qm = Qm - cent[None, :]
            if rot is not None:
                # codes encode R*(x - c) (or R*x raw): rotate AFTER the
                # residual shift so LUT space matches code space.
                # Per-row dgemv, exactly the former per-query `q @ rot`.
                Qm = np.stack([q @ rot for q in Qm])
            # (nq, M, K) LUTs for the whole probe batch in one vectorized
            # pass (bit-identical values, see pq._adc_tables)
            tables = _adc_tables(books, Qm, M, sub)
            out_q, out_id, out_d = [], [], []
            for i, qid in enumerate(qpdf["query_id"]):
                d = np.sqrt(np.sum(tables[i][marange, codes], axis=1))
                dr = np.round(d, ROUND_DECIMALS)
                # `> fetch > 0`: k=0 falls to the empty lexsort[:0]
                # branch (the shortlist's empty-slice max would raise)
                if len(d) > fetch > 0:
                    part = np.argpartition(dr, fetch - 1)
                    thresh = dr[part[:fetch]].max()
                    cand = np.flatnonzero(dr <= thresh)
                    cand = cand[np.lexsort((ids[cand], dr[cand]))][:fetch]
                else:
                    cand = np.lexsort((ids, dr))[:fetch]
                out_q.extend([qid] * len(cand))
                out_id.extend(ids[cand].tolist())
                out_d.extend(d[cand].tolist())
            return pd.DataFrame({"query_id": out_q, "id": out_id, "distance": out_d})

        partials = (
            v.groupBy("__blk")
            .cogroup(probes.groupBy("__blk"))
            .applyInPandas(cluster_adc, out_schema)
        )
        cand = topk_per_query(partials, fetch)
        if rerank_vectors is None:
            return topk_per_query(cand, k)
        from fabstir_vectordb_spark.operators.pq import exact_rerank

        return exact_rerank(
            cand, queries, rerank_vectors, k,
            id_col=id_col, rerank_vector_col=self.ivf.vector_col,
            query_id_col=query_id_col, query_vector_col=query_vector_col,
        )

    # ------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """Model metadata (coarse centroids + PQ codebooks + residual
        flag) as sidecars — the encoded table itself goes through
        write_encoded."""
        import json
        import os

        self.ivf.save(path)
        self.pq.save(path)
        meta = {"residual": self.residual}
        if self.tuned is not None:
            # the tuned plan must SURVIVE the save/load cycle: a user who
            # fit with recall_target and reloads later would otherwise
            # silently fall back to the legacy (4, 4) search defaults —
            # the exact docs-not-defaults trap tune_pq exists to close
            from dataclasses import asdict

            meta["tuned"] = asdict(self.tuned)
        with open(os.path.join(path, "ivfpq.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str) -> "IVFPQIndex":
        import json
        import os

        from fabstir_vectordb_spark.operators.pq import ProductQuantizer

        residual = False
        tuned = None
        meta_path = os.path.join(path, "ivfpq.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            residual = bool(meta.get("residual", False))
            if meta.get("tuned") is not None:
                from fabstir_vectordb_spark.plans.tuning import PQPlan

                tuned = PQPlan(**meta["tuned"])
        idx = cls(
            IVFIndex.load(path), ProductQuantizer.load(path), residual=residual
        )
        idx.tuned = tuned
        return idx


def write_encoded(
    vectors: DataFrame, index: IVFPQIndex, path: str, codec: str = "zstd"
) -> None:
    """Persist the IVFADC layout: assign + PQ-encode, then parquet
    partitionBy(cluster_id) with the model sidecars.  This IS the 100 TB
    artifact — ~(id + M bytes)/vector, probe reads touch only the probed
    clusters' files (see search_bulk prune_scan).  Default codec is zstd
    (the reference's CBOR+zstd archival format, SURVEY §2 row 71): the
    encoded table is the cold layout, so the denser codec wins."""
    enc = index.encode(vectors).drop(index.ivf.vector_col)  # codes, not floats
    enc.write.mode("overwrite").option("compression", codec).partitionBy(
        "cluster_id"
    ).parquet(path)
    index.save(path)


def read_encoded(spark, path: str) -> tuple[DataFrame, IVFPQIndex]:
    return spark.read.parquet(path), IVFPQIndex.load(path)
