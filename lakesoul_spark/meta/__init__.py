from lakesoul_spark.meta.store import (
    CommitInfo,
    FileOp,
    MetaStore,
    Snapshot,
    TableInfo,
)

__all__ = ["MetaStore", "TableInfo", "CommitInfo", "FileOp", "Snapshot"]
