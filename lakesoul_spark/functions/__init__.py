from lakesoul_spark.functions.merge_operators import (
    MERGE_OP_NAMES,
    merge_agg_expr,
)
from lakesoul_spark.functions.vector import (
    SQL_FUNC_NAME,
    hamming_distance,
    register_sql_functions,
)

__all__ = [
    "MERGE_OP_NAMES",
    "merge_agg_expr",
    "SQL_FUNC_NAME",
    "hamming_distance",
    "register_sql_functions",
]
