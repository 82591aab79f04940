"""Plan-metadata helpers shared by operators.

`scan_partitions` answers "how parallel does this DataFrame arrive?"
without paying the full `df.rdd.getNumPartitions()` conversion on every
call: that call builds the physical plan and crosses py4j (~60 ms
measured at sf0.1), and per-search construction re-derives the SAME
select over the same memoized table handle every time.  The analyzed
plan's semanticHash (~15 ms) keys a memo holding the previously probed
count.  The memo stores plan METADATA (an int), never data or results;
within a session Spark's own InMemoryFileIndex already caches the file
listing behind the same plans, so this introduces no new staleness
class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_NPART_MEMO: dict = {}


def scan_partitions(df: DataFrame) -> int:
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:
        return df.rdd.getNumPartitions()
    n = _NPART_MEMO.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        _NPART_MEMO[key] = n
    return n
