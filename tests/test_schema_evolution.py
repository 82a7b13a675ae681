"""ALTER TABLE / schema evolution tests, modeled on the reference
AlterTableTests + SchemaEnforcementSuite + the file_exist_cols
mechanism (entity.proto:109-110, default_column.rs)."""

import pytest
from pyspark.sql import functions as F

from lakesoul_spark.table import LakeSoulTable, write


def _df(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_add_column_null_fill(spark, tmp_table):
    write(_df(spark, [(1, "a")], "id int, v string"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.add_column("extra", "int")
    assert [tuple(r) for r in t.to_df().collect()] == [(1, "a", None)]


def test_add_column_default_only_fills_missing_files(spark, tmp_table):
    """The default applies to files lacking the column; genuine nulls
    in newer files stay null."""
    write(_df(spark, [(1, 10)], "id int, v int"), tmp_table,
          hash_partitions=["id"], hash_bucket_num=2)
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.add_column("tag", "string", default="d")
    t.upsert(_df(spark, [(2, 20, None)], "id int, v int, tag string"))
    got = dict((r["id"], r["tag"]) for r in t.to_df().collect())
    assert got == {1: "d", 2: None}


def test_add_column_duplicate_rejected(spark, tmp_table):
    write(_df(spark, [(1, "a")], "id int, v string"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("v", "string")


def test_widen_int_to_long(spark, tmp_table):
    write(_df(spark, [(1, 10)], "id int, v int"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.alter_column_type("v", "bigint")
    df = t.to_df()
    assert dict(df.dtypes)["v"] == "bigint"
    assert [tuple(r) for r in df.collect()] == [(1, 10)]
    # old narrow files and new wide files coexist
    write(_df(spark, [(2, 2**40)], "id int, v long"), tmp_table)
    assert sorted(map(tuple, t.to_df().collect())) == [(1, 10), (2, 2**40)]


def test_narrowing_rejected(spark, tmp_table):
    write(_df(spark, [(1, 10)], "id int, v long"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    with pytest.raises(ValueError, match="lossless widening"):
        t.alter_column_type("v", "int")
    with pytest.raises(ValueError, match="lossless widening"):
        t.alter_column_type("v", "string")


def test_drop_column(spark, tmp_table):
    write(_df(spark, [(1, "a", 5)], "id int, v string, x int"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.drop_column("x")
    assert t.to_df().columns == ["id", "v"]
    with pytest.raises(ValueError, match="no such column"):
        t.drop_column("x")


def test_drop_pk_column_rejected(spark, tmp_table):
    write(_df(spark, [(1, "a")], "id int, v string"), tmp_table,
          hash_partitions=["id"], hash_bucket_num=2)
    t = LakeSoulTable.for_path(spark, tmp_table)
    with pytest.raises(ValueError, match="partition/PK"):
        t.drop_column("id")


def test_unknown_write_column_rejected(spark, tmp_table):
    """Schema enforcement: a write carrying a column the table does not
    have fails (reference SchemaEnforcementSuite)."""
    write(_df(spark, [(1, "a")], "id int, v string"), tmp_table)
    with pytest.raises(ValueError, match="not in table schema"):
        write(_df(spark, [(2, "b", 1)], "id int, v string, zz int"), tmp_table)


def test_set_unset_properties(spark, tmp_table):
    write(_df(spark, [(1, "a")], "id int, v string"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.set_properties({"compaction.ttl": "7d"})
    assert t.info.properties["compaction.ttl"] == "7d"
    t.unset_properties(["compaction.ttl"])
    assert "compaction.ttl" not in t.info.properties
