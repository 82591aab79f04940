"""Property-based sequence-packing tests: for ANY token-count multiset
and context length, the distributed layout must satisfy the dataloader
contract — every window except the last exactly full, per-doc spans
contiguous and complete, global offsets dense in id order.

A pure-Python reference packer (concatenate in id order, chop at L)
computes the expected layout; the Spark operator must reproduce it
exactly under arbitrary input partitioning.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fabstir_vectordb_spark.operators.sampling import pack_sequences


def _reference_pack(counts: list[int], L: int):
    out = []
    start = 0
    for i, n in enumerate(counts):
        if n > 0:
            for b in range(start // L, (start + n - 1) // L + 1):
                out.append(
                    (i, b, start, min(start + n, (b + 1) * L) - max(start, b * L))
                )
        start += n
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    L=st.integers(min_value=1, max_value=128),
    parts=st.integers(min_value=1, max_value=5),
)
def test_pack_matches_reference(spark, counts, L, parts):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(counts)], "doc_id long, n long"
    ).repartition(3)
    got = sorted(
        (r["id"], r["bin_id"], r["start_tok"], r["tokens_in_bin"])
        for r in pack_sequences(
            df, L, id_col="doc_id", n_tokens_col="n", range_partitions=parts
        ).collect()
    )
    assert got == _reference_pack(counts, L)
