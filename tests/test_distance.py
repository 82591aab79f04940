"""Distance-kernel parity tests — FIXTURES.md §7 unit vectors plus
numpy cross-checks on real embeddings."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fabstir_vectordb_spark.functions import distance as D

CASES = [
    # a, b
    ([1.0, 0.0], [0.0, 1.0]),   # orthogonal
    ([1.0, 2.0], [1.0, 2.0]),   # identical
    ([0.0, 0.0], [1.0, 1.0]),   # zero vector guard
    ([1.0, 2.0, 3.0], [-4.0, 5.5, 0.25]),
]


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(
        [(a, b) for a, b in CASES], "a array<float>, b array<float>"
    )


def test_kernels_match_numpy(pairs):
    rows = pairs.select(
        D.dot("a", "b").alias("dot"),
        D.l2_distance("a", "b").alias("l2"),
        D.cosine_similarity("a", "b").alias("cos"),
        D.angular_distance("a", "b").alias("ang"),
        D.norm("a").alias("norm_a"),
    ).collect()
    for (a, b), r in zip(CASES, rows):
        a32, b32 = np.array(a, dtype=np.float32), np.array(b, dtype=np.float32)
        a64, b64 = a32.astype(np.float64), b32.astype(np.float64)
        assert r["dot"] == pytest.approx(float(a64 @ b64), abs=1e-12)
        assert r["l2"] == pytest.approx(float(np.linalg.norm(a64 - b64)), abs=1e-12)
        na, nb = np.linalg.norm(a64), np.linalg.norm(b64)
        expected_cos = 0.0 if na * nb == 0 else float(a64 @ b64 / (na * nb))
        assert r["cos"] == pytest.approx(expected_cos, abs=1e-12)
        assert r["ang"] == pytest.approx(
            math.acos(max(-1.0, min(1.0, expected_cos))), abs=1e-12
        )
        assert r["norm_a"] == pytest.approx(float(na), abs=1e-12)


def test_fixture_identities(pairs):
    r = pairs.select(
        D.cosine_similarity("a", "b").alias("cos"),
        D.l2_distance("a", "b").alias("l2"),
    ).collect()
    assert r[0]["cos"] == 0.0 and r[0]["l2"] == pytest.approx(math.sqrt(2))
    assert r[1]["cos"] == pytest.approx(1.0) and r[1]["l2"] == 0.0
    assert r[2]["cos"] == 0.0  # zero vector => 0, not NaN


def test_normalize_and_score(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "v array<float>")
    rows = df.select(
        D.norm(D.normalize("v")).alias("unit_norm"),
        D.similarity_score(F.lit(1.0)).alias("score"),
    ).collect()
    assert rows[0]["unit_norm"] == pytest.approx(1.0)
    assert rows[1]["unit_norm"] == 0.0  # zero vector stays zero
    assert rows[0]["score"] == 0.5


def test_quantize_roundtrip(spark):
    df = spark.createDataFrame([([0.0, 0.5, 1.0],)], "v array<float>")
    out = df.select(
        D.dequantize_u8(
            D.quantize_u8("v", D.vector_min("v"), D.vector_max("v")),
            D.vector_min("v"),
            D.vector_max("v"),
        ).alias("rt")
    ).collect()[0]["rt"]
    assert out == pytest.approx([0.0, 0.5, 1.0], abs=1 / 255)
