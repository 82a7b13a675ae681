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


# ---------------------------------------------------------------- positions
# reference AlterTableAddColumnsCommand / AlterTableChangeColumnCommand
# (alterTableCommands.scala:113-163,191-327): FIRST / AFTER placement,
# comment updates, and REPLACE COLUMNS whole-schema rewrites are
# metadata-only commits.


def test_add_column_first_and_after(spark, tmp_table):
    write(_df(spark, [(1, "a")], "id int, v string"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.add_column("lead", "int", first=True)
    t.add_column("mid", "int", after="id")
    assert t.to_df().columns == ["lead", "id", "mid", "v"]
    with pytest.raises(ValueError, match="AFTER column"):
        t.add_column("bad", "int", after="nope")
    with pytest.raises(ValueError, match="FIRST with AFTER"):
        t.add_column("bad", "int", first=True, after="id")


def test_change_column_comment_and_position(spark, tmp_table):
    write(_df(spark, [(1, "a", 5)], "id int, v string, x int"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.change_column("x", comment="the x", first=True)
    assert t.to_df().columns == ["x", "id", "v"]
    t.change_column("v", after="x")
    assert t.to_df().columns == ["x", "v", "id"]
    fields = {f.name: f for f in t.schema().fields}
    assert fields["x"].metadata["comment"] == "the x"
    # data survives reorders — reads are name-resolved
    assert [tuple(r) for r in t.to_df().collect()] == [(5, "a", 1)]


def test_change_column_type_plus_comment(spark, tmp_table):
    write(_df(spark, [(1, 10)], "id int, v int"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.change_column("v", new_type="bigint", comment="widened")
    fields = {f.name: f for f in t.schema().fields}
    assert fields["v"].dataType.simpleString() == "bigint"
    assert fields["v"].metadata["comment"] == "widened"
    assert [tuple(r) for r in t.to_df().collect()] == [(1, 10)]


def test_replace_columns_reorder_widen_drop_add(spark, tmp_table):
    write(_df(spark, [(1, "a", 5)], "id int, v string, x int"), tmp_table,
          hash_partitions=["id"], hash_bucket_num=2)
    t = LakeSoulTable.for_path(spark, tmp_table)
    # reorder, widen x, drop v, add fresh
    t.replace_columns([
        ("x", "bigint", "widened x"),
        ("id", "int", None),
        ("fresh", "string", "brand new"),
    ])
    assert t.to_df().columns == ["x", "id", "fresh"]
    assert [tuple(r) for r in t.to_df().collect()] == [(5, 1, None)]
    fields = {f.name: f for f in t.schema().fields}
    assert fields["x"].metadata["comment"] == "widened x"
    assert fields["fresh"].metadata["comment"] == "brand new"


def test_replace_columns_guards(spark, tmp_table):
    write(_df(spark, [(1, "a")], "id int, v string"), tmp_table,
          hash_partitions=["id"], hash_bucket_num=2)
    t = LakeSoulTable.for_path(spark, tmp_table)
    with pytest.raises(ValueError, match="partition/PK"):
        t.replace_columns([("v", "string")])
    with pytest.raises(ValueError, match="lossless widening"):
        t.replace_columns([("id", "int"), ("v", "int")])
    with pytest.raises(ValueError, match="duplicate column"):
        t.replace_columns([("id", "int"), ("v", "string"), ("v", "string")])


def test_sql_alter_column_surface(spark, tmp_path):
    from lakesoul_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.sql(spark, "CREATE TABLE at (id INT, v STRING, x INT) USING lakesoul")
    cat.sql(spark, "INSERT INTO at VALUES (1, 'a', 5)")
    cat.sql(spark, "ALTER TABLE at ALTER COLUMN x COMMENT 'it''s x'")
    cat.sql(spark, "ALTER TABLE at ALTER COLUMN x FIRST")
    cat.sql(spark, "ALTER TABLE at ALTER COLUMN v AFTER x")
    desc = {r.col_name: r for r in cat.sql(spark, "DESCRIBE at").collect()}
    assert desc["x"].comment == "it's x"
    assert [r.col_name for r in cat.sql(spark, "DESCRIBE at").collect()] == \
        ["x", "v", "id"]
    cat.sql(spark, "ALTER TABLE at CHANGE COLUMN v v string COMMENT 'vv' AFTER id")
    desc = {r.col_name: r for r in cat.sql(spark, "DESCRIBE at").collect()}
    assert desc["v"].comment == "vv"
    assert [r.col_name for r in cat.sql(spark, "DESCRIBE at").collect()] == \
        ["x", "id", "v"]
    with pytest.raises(ValueError, match="rename"):
        cat.sql(spark, "ALTER TABLE at CHANGE COLUMN v w string")
    cat.sql(spark, """
        ALTER TABLE at ADD COLUMNS (
            a INT COMMENT 'first col' FIRST,
            b BIGINT AFTER id
        )
    """)
    assert [r.col_name for r in cat.sql(spark, "DESCRIBE at").collect()] == \
        ["a", "x", "id", "b", "v"]
    cat.sql(spark, """
        ALTER TABLE at REPLACE COLUMNS (
            id INT COMMENT 'key', v STRING, x BIGINT
        )
    """)
    rows = cat.sql(spark, "DESCRIBE at").collect()
    assert [r.col_name for r in rows] == ["id", "v", "x"]
    desc = {r.col_name: r for r in rows}
    assert desc["id"].comment == "key"
    assert desc["x"].data_type == "bigint"
    got = cat.sql(spark, "SELECT * FROM at").collect()
    assert [tuple(r) for r in got] == [(1, "a", 5)]


def test_pk_column_type_change_rejected(spark, tmp_table):
    """Widening a PK column must be refused: murmur3 buckets depend on
    the physical type (hash(int 1) != hash(long 1)), so existing files'
    bucket layout would no longer match and point_lookup / bucket-pruned
    reads would silently miss rows."""
    write(_df(spark, [(i, 0) for i in range(10)], "id int, v int"),
          tmp_table, hash_partitions=["id"], hash_bucket_num=4)
    t = LakeSoulTable.for_path(spark, tmp_table)
    with pytest.raises(ValueError, match="PK column"):
        t.alter_column_type("id", "bigint")
    with pytest.raises(ValueError, match="PK column"):
        t.change_column("id", new_type="bigint")
    with pytest.raises(ValueError, match="PK column"):
        t.replace_columns([("id", "bigint"), ("v", "int")])
    # non-type changes on the PK stay allowed
    t.change_column("id", comment="the key")
    # widening a VALUE column stays allowed
    t.alter_column_type("v", "bigint")
    got = [tuple(r) for r in t.point_lookup(id=3).collect()]
    assert got == [(3, 0)]


def test_range_partition_type_change_rejected(spark, tmp_table):
    """Widening a range-partition column must be refused: partition
    descriptors encode values under the old type's formatting, so
    freshly-derived descs would miss existing partitions (DELETE/UPDATE
    silently no-op — reproduced) and new writes would split one logical
    partition across two descs."""
    import datetime

    df = _df(spark, [(1, datetime.date(2021, 1, 1))], "id int, d date")
    from lakesoul_spark.table import write as _write
    _write(df, tmp_table, range_partitions=["d"])
    t = LakeSoulTable.for_path(spark, tmp_table)
    with pytest.raises(ValueError, match="range-partition"):
        t.alter_column_type("d", "timestamp")
    with pytest.raises(ValueError, match="range-partition"):
        t.replace_columns([("id", "int"), ("d", "timestamp")])
    # comment-only change on a range col stays allowed
    t.change_column("d", comment="partition day")


def test_cdc_change_column_drop_rejected(spark, tmp_table):
    """Dropping the CDC change column must be refused: without it the
    CDC MOR filter disengages and delete tombstones resurface as live
    rows (reproduced before the guard)."""
    write(_df(spark, [(1, "a", "insert"), (2, "b", "insert")],
              "id int, v string, op string"),
          tmp_table, hash_partitions=["id"], hash_bucket_num=2,
          properties={"lakesoul_cdc_change_column": "op"})
    t = LakeSoulTable.for_path(spark, tmp_table)
    t.upsert(_df(spark, [(2, "b", "delete")], "id int, v string, op string"))
    assert sorted((r.id, r.v) for r in t.to_df().collect()) == [(1, "a")]
    with pytest.raises(ValueError, match="CDC change column"):
        t.drop_column("op")
    with pytest.raises(ValueError, match="CDC change column"):
        t.replace_columns([("id", "int"), ("v", "string")])
    # the tombstone stays invisible
    assert sorted((r.id, r.v) for r in t.to_df().collect()) == [(1, "a")]


def test_add_column_name_and_default_validation(spark, tmp_table):
    """ADD COLUMN validates at DDL time what would otherwise fail (or
    silently misbehave) later: parquet-invalid characters, the reserved
    '__' prefix, and defaults that cannot be cast to the column type
    (which would read as silent nulls forever)."""
    write(_df(spark, [(1, "a")], "id int, v string"), tmp_table)
    t = LakeSoulTable.for_path(spark, tmp_table)
    for bad in ["a b", "a,b", "x=y", "p(q)", "", "{c}"]:
        with pytest.raises(ValueError, match="invalid column name"):
            t.add_column(bad, "int")
    with pytest.raises(ValueError, match="reserved"):
        t.add_column("__bucket", "int")
    with pytest.raises(ValueError, match="does not cast"):
        t.add_column("n", "int", default="not-a-number")
    with pytest.raises(ValueError, match="invalid column name"):
        t.replace_columns([("id", "int"), ("v", "string"), ("a b", "int")])
    # valid default still works, including numeric strings
    t.add_column("n", "int", default="7")
    assert [tuple(r) for r in t.to_df().collect()] == [(1, "a", 7)]


def test_cdc_batch_requires_change_column(spark, tmp_table):
    """A CDC-table batch missing the change column is rejected at write:
    a NEW key would land with a null op and the CDC filter would drop it
    silently (null != 'delete' is null) — data loss, not a
    partial-column upsert."""
    write(_df(spark, [(1, "a", "insert")], "id int, v string, op string"),
          tmp_table, hash_partitions=["id"], hash_bucket_num=2,
          properties={"lakesoul_cdc_change_column": "op"})
    t = LakeSoulTable.for_path(spark, tmp_table)
    with pytest.raises(ValueError, match="change column"):
        t.upsert(_df(spark, [(2, "b")], "id int, v string"))
    # carrying the op column works, including partial VALUE columns
    t.upsert(_df(spark, [(2, "insert")], "id int, op string"))
    got = sorted((r.id, r.v) for r in
                 LakeSoulTable.for_path(spark, tmp_table).to_df().collect())
    assert got == [(1, "a"), (2, None)]


def test_readd_dropped_column_requires_purge(spark, tmp_path):
    """Name-identity contract: after DROP COLUMN (metadata-only), both
    re-add paths (ADD COLUMN, REPLACE COLUMNS) refuse while live files
    still physically carry the name — stale stored values would
    resurface and shadow a declared default; compaction purges, then
    the re-add succeeds and the default applies everywhere."""
    from lakesoul_spark.table import LakeSoulTable, write

    path = str(tmp_path / "t")
    write(spark.createDataFrame([(1, 1, 7)], "id int, v int, x int"),
          path, mode="overwrite", hash_partitions=["id"],
          hash_bucket_num=2)
    t = LakeSoulTable.for_path(spark, path)
    t.drop_column("x")
    with pytest.raises(ValueError, match="compaction"):
        t.add_column("x", "int", default=10)
    with pytest.raises(ValueError, match="compaction"):
        t.replace_columns([("id", "int"), ("v", "int"), ("x", "int")])
    t.compaction(force=True)
    t = LakeSoulTable.for_path(spark, path)
    t.add_column("x", "int", default=10)
    assert [r["x"] for r in
            LakeSoulTable.for_path(spark, path).to_df().collect()] == [10]


def test_auto_migrate_and_rollback_respect_column_identity(spark, tmp_path):
    """The remaining two re-introduction paths honor the name-identity
    contract: (a) upsert schema auto-migrate refuses a carried name;
    (b) rollback refuses a target whose files predate a column
    re-added since (stale values would resurface under the current
    schema); (c) rollback to before the first commit refuses instead
    of silently truncating (the epoch-seconds-for-millis trap)."""
    from lakesoul_spark.table import LakeSoulTable, write

    path = str(tmp_path / "t")
    write(spark.createDataFrame([(1, 1, 7)], "id int, v int, x int"),
          path, mode="overwrite", hash_partitions=["id"],
          hash_bucket_num=2)
    t = LakeSoulTable.for_path(spark, path)
    t.drop_column("x")
    # (a) auto-migrate is the add-column path in disguise
    with pytest.raises(ValueError, match="auto-migrate"):
        t.upsert(spark.createDataFrame([(2, 2, 8)],
                                       "id int, v int, x int"),
                 schema_auto_migrate=True)
    # purge, re-add with a default, and remember the pre-purge version
    v_before_compact = t.store.head_version()
    t.compaction(force=True)
    t = LakeSoulTable.for_path(spark, path)
    t.add_column("x", "int", default=10)
    # (b) restoring past the re-add would reinstate pre-drop x bytes
    with pytest.raises(ValueError, match="re-added"):
        t.rollback(version=v_before_compact)
    # rolling back to a post-purge version is fine
    t.upsert(spark.createDataFrame([(9, 9)], "id int, v int"))
    t.rollback(version=t.store.head_version() - 1)
    assert LakeSoulTable.for_path(spark, path).to_df().count() == 1
    # (c) pre-creation timestamp refuses, table intact
    with pytest.raises(ValueError, match="first commit"):
        t.rollback(timestamp_ms=1)
    assert LakeSoulTable.for_path(spark, path).to_df().count() == 1
