from lakesoul_spark.arrow.dataset import LakeSoulArrowDataset  # noqa: F401
