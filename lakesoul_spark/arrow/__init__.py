from lakesoul_spark.arrow.dataset import LakeSoulArrowDataset  # noqa: F401
from lakesoul_spark.arrow.writer import (  # noqa: F401
    ArrowBatchWriter,
    write_arrow,
)
