"""Vector SQL functions (reference ``SparkFunctions.scala`` registers
``lakesoul_hamming_distance`` into the catalog,
``functions/HammingDistFunc.scala``: hamming distance of two packed
``array<bigint>`` code vectors).

Two surfaces, same semantics:

- :func:`hamming_distance` — a pure Column expression
  (``bit_count(xor)`` fold, whole-stage codegen; the fast path and
  what the index search itself uses);
- :func:`register_sql_functions` — registers the name for ``spark.sql``
  callers. Spark's Python API cannot register catalog ScalarFunctions,
  so the SQL-callable form is an Arrow-batched pandas UDF (vectorized
  numpy XOR+popcount — batch-at-a-time where the reference's
  ScalarFunction is row-at-a-time JVM).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession, functions as F

SQL_FUNC_NAME = "lakesoul_hamming_distance"


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two equal-length packed code vectors
    (``array<bigint>``), as a codegen expression. Mismatched lengths
    raise at runtime like the reference's ``require``."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    mismatch = F.raise_error(
        F.lit("The input sequences must have the same length")
    )
    total = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(a) != F.size(b), mismatch).otherwise(total).cast("int")


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Make the function callable from ``spark.sql`` by name. Returns
    the registered names (reference ``SparkFunctions.functionNames``)."""
    from pyspark.sql.types import IntegerType

    def _kernel(a, b):
        import numpy as np
        import pandas as pd

        out = np.empty(len(a), dtype=np.int32)
        for i, (x, y) in enumerate(zip(a, b)):
            xv = np.asarray(x, dtype=np.int64)
            yv = np.asarray(y, dtype=np.int64)
            if xv.shape != yv.shape:
                raise ValueError(
                    "The input sequences must have the same length"
                )
            out[i] = sum(
                int(v).bit_count()
                for v in (xv ^ yv).view(np.uint64)
            )
        return pd.Series(out)

    spark.udf.register(SQL_FUNC_NAME, F.pandas_udf(_kernel, IntegerType()))
    return [SQL_FUNC_NAME]
