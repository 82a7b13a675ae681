from lakesoul_spark.arrow.dataset import LakeSoulArrowDataset  # noqa: F401
from lakesoul_spark.arrow.writer import write_arrow  # noqa: F401
