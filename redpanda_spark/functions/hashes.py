"""Hash kernels: Kafka's murmur2 partitioner (byte-compatible).

Reference: the default partitioner routes key→partition with murmur2
(`src/v/kafka/server/...partitioner`, Kafka default). Spark has xxhash64 /
murmur3 builtins but not Kafka's murmur2, so byte-compat routing needs a
custom kernel — implemented as a vectorized Pandas UDF (Arrow batches; the
per-key work is tiny so the Python cost is amortized), with a pure-Python
scalar version for tests and driver-side routing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_M = 0x5BD1E995
_SEED = 0x9747B28C
_MASK = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """Kafka murmur2 (org.apache.kafka.common.utils.Utils.murmur2)."""
    length = len(data)
    h = (_SEED ^ length) & _MASK
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _M) & _MASK
        k ^= k >> 24
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k
    rem = length & 3
    if rem:
        tail = data[n4:]
        if rem == 3:
            h ^= (tail[2] & 0xFF) << 16
        if rem >= 2:
            h ^= (tail[1] & 0xFF) << 8
        if rem >= 1:
            h ^= tail[0] & 0xFF
            h = (h * _M) & _MASK
    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15
    return h


def murmur2_partition(key: bytes, num_partitions: int) -> int:
    """Kafka DefaultPartitioner: toPositive(murmur2(key)) % numPartitions."""
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


def murmur2_partition_udf(num_partitions: int):
    """Vectorized key(binary) → partition(int) column function."""

    @pandas_udf("int")
    def _udf(keys: pd.Series) -> pd.Series:
        out = np.empty(len(keys), dtype=np.int32)
        for i, k in enumerate(keys):
            if k is None:
                out[i] = -1
            else:
                out[i] = murmur2_partition(bytes(k), num_partitions)
        return pd.Series(out)

    return _udf


def crc32_col(col):
    """Record-batch CRC analog (reference `model/record_utils.cc`) — Spark builtin."""
    return F.crc32(col)


def xxhash64_col(*cols):
    """xxhash64 (reference uses xxhash in `hashing/`) — Spark builtin, JVM-side."""
    return F.xxhash64(*cols)
