"""LSH ANN — the optional third search strategy (SURVEY §7.1).

MLlib's BucketedRandomProjectionLSH (Euclidean random-projection LSH)
over the vectors table: hash each vector into `num_hash_tables` buckets;
candidate pairs are rows sharing any bucket; distances are verified
exactly on the candidates.  Complements the other two strategies:

  brute  — exact, map-only partial reduction (operators/knn.py)
  ivf    — clustered-table probe with partition pruning (operators/ivf.py)
  lsh    — this module: no training-time k-means; quality is controlled
           by (bucket_length, num_hash_tables) instead of n_probe

Reference analogue: none (the reference's ANN are HNSW/IVF); this is the
Spark-native option the blueprint names for workloads where re-clustering
on ingest is too expensive.  Like every approximate path here, exactness
claims go through the recall harness (IVFIndex.evaluate_recall's
exact-join pattern), not assumptions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fabstir_vectordb_spark.operators.topk import topk_per_query


@dataclass
class LSHIndex:
    model: object  # BucketedRandomProjectionLSHModel
    id_col: str = "id"
    vector_col: str = "vector"

    @classmethod
    def fit(
        cls,
        vectors: DataFrame,
        bucket_length: float = 2.0,
        num_hash_tables: int = 3,
        seed: int = 42,
        id_col: str = "id",
        vector_col: str = "vector",
    ) -> "LSHIndex":
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector

        feat = vectors.select(
            array_to_vector(F.col(vector_col).cast("array<double>")).alias("__feat")
        )
        lsh = BucketedRandomProjectionLSH(
            inputCol="__feat",
            outputCol="__hashes",
            bucketLength=bucket_length,
            numHashTables=num_hash_tables,
            seed=seed,
        )
        return cls(model=lsh.fit(feat), id_col=id_col, vector_col=vector_col)

    def _featurize(self, df: DataFrame, vector_col: str) -> DataFrame:
        from pyspark.ml.functions import array_to_vector

        return df.withColumn(
            "__feat", array_to_vector(F.col(vector_col).cast("array<double>"))
        )

    def search(
        self,
        vectors: DataFrame,
        queries: DataFrame,
        k: int,
        threshold: float,
        query_id_col: str = "query_id",
        query_vector_col: str = "vector",
    ) -> DataFrame:
        """Approximate L2 top-k: LSH-bucketed candidate join (only rows
        sharing a bucket with a query are compared) + exact distance on
        candidates + per-query top-k.  `threshold` bounds the candidate
        radius — results beyond it are invisible, the standard LSH
        recall/cost dial.

        Output: (query_id, id, distance), <= k rows per query, ascending.
        """
        v = self._featurize(
            vectors.select(F.col(self.id_col).alias("id"), self.vector_col),
            self.vector_col,
        )
        q = self._featurize(
            queries.select(
                F.col(query_id_col).alias("query_id"), query_vector_col
            ),
            query_vector_col,
        )
        joined = self.model.approxSimilarityJoin(
            q, v, threshold, distCol="distance"
        ).select(
            F.col("datasetA.query_id").alias("query_id"),
            F.col("datasetB.id").alias("id"),
            "distance",
        )
        return topk_per_query(joined, k)
