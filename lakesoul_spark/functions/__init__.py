from lakesoul_spark.functions.merge_operators import (
    MERGE_OP_NAMES,
    merge_agg_expr,
)

__all__ = ["MERGE_OP_NAMES", "merge_agg_expr"]
