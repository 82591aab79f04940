"""Archival compression parity (SURVEY §2 row 71: the reference's
CBOR+zstd chunk format maps to parquet zstd here): codec knob reaches
the files, and reads are codec-agnostic."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fabstir_vectordb_spark.session import VectorDbSession


def _file_codecs(root: str) -> set[str]:
    codecs = set()
    for f in glob.glob(f"{root}/**/*.parquet", recursive=True):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            codecs.add(meta.row_group(rg).column(0).compression)
    return codecs


def test_session_save_zstd_roundtrip(spark, tmp_path):
    s = VectorDbSession(spark)
    s.add_vectors(
        [{"id": f"v{i}", "vector": [float(i), 1.0], "metadata": {"i": i}}
         for i in range(20)]
    )
    path = str(tmp_path / "zstd_sess")
    s.save(path, codec="zstd")
    assert _file_codecs(f"{path}/vectors") == {"ZSTD"}
    s2 = VectorDbSession.load(spark, path)
    assert s2._df.filter(~F.col("deleted")).count() == 20
    assert s2.get_vector("v7")["metadata"]["i"] == 7


def test_ivfpq_encoded_default_is_zstd(spark, tmp_path, embeddings):
    from fabstir_vectordb_spark.operators.ivfpq import (
        IVFPQIndex,
        read_encoded,
        write_encoded,
    )

    emb = embeddings.limit(200)
    idx = IVFPQIndex.fit(
        emb, n_clusters=4, n_subspaces=8, n_centroids=16,
        id_col="vec_id", vector_col="embedding",
    )
    path = str(tmp_path / "enc")
    write_encoded(emb, idx, path)
    assert _file_codecs(path) == {"ZSTD"}
    enc, idx2 = read_encoded(spark, path)
    assert enc.count() == 200
