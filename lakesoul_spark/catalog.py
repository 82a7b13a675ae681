"""Namespace / table catalog over a filesystem root.

Re-expresses the reference catalog surface — PG-backed namespaces and
table name registry (``LakeSoulCatalog.scala:129-352,512-578``,
``python/src/lakesoul/catalog.py:39-263``, ``entity.proto:68-76``) — as
a directory-per-namespace layout with JSON registries:

    <root>/<namespace>/_namespace.json       properties
    <root>/<namespace>/_tables.json          short name -> table path
    <root>/<namespace>/<table>/              default table location

No Spark catalog plugin exists for pure PySpark (SURVEY §7.1), so SQL
access goes through :meth:`Catalog.create_sql_views`, which registers
each table's MOR view as a temp view — after which ``spark.sql`` serves
the full relational surface.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession

from lakesoul_spark.table import LakeSoulTable, create_table as _create_table

_NS_FILE = "_namespace.json"
_TABLES_FILE = "_tables.json"
_NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.-]*$")


def _write_json(path: str, payload: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


class Catalog:
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    # ---------------------------------------------------------- namespaces

    def _ns_dir(self, ns: str) -> str:
        if not _NAME_RE.match(ns):
            raise ValueError(f"bad namespace name {ns!r}")
        return os.path.join(self.root, ns)

    def create_namespace(self, ns: str, properties: dict | None = None) -> None:
        d = self._ns_dir(ns)
        if os.path.exists(os.path.join(d, _NS_FILE)):
            raise ValueError(f"namespace {ns!r} already exists")
        _write_json(os.path.join(d, _NS_FILE), {"properties": properties or {}})
        _write_json(os.path.join(d, _TABLES_FILE), {})

    def namespace_exists(self, ns: str) -> bool:
        return os.path.exists(os.path.join(self._ns_dir(ns), _NS_FILE))

    def list_namespaces(self) -> list[str]:
        out = []
        for n in sorted(os.listdir(self.root)):
            if os.path.exists(os.path.join(self.root, n, _NS_FILE)):
                out.append(n)
        return out

    def drop_namespace(self, ns: str, *, cascade: bool = False) -> None:
        import shutil

        d = self._ns_dir(ns)
        if not self.namespace_exists(ns):
            raise ValueError(f"no such namespace {ns!r}")
        if self.list_tables(ns) and not cascade:
            raise ValueError(f"namespace {ns!r} is not empty (use cascade=True)")
        shutil.rmtree(d)

    # -------------------------------------------------------------- tables

    def _registry(self, ns: str) -> dict:
        p = os.path.join(self._ns_dir(ns), _TABLES_FILE)
        return _read_json(p) if os.path.exists(p) else {}

    def create_table(
        self,
        spark: SparkSession,
        name: str,
        schema,
        *,
        namespace: str = "default",
        path: str | None = None,
        **kwargs,
    ) -> LakeSoulTable:
        if not self.namespace_exists(namespace):
            if namespace == "default":
                self.create_namespace("default")
            else:
                raise ValueError(f"no such namespace {namespace!r}")
        if not _NAME_RE.match(name):
            raise ValueError(f"bad table name {name!r}")
        reg = self._registry(namespace)
        if name in reg:
            raise ValueError(f"table {namespace}.{name} already exists")
        tpath = os.path.abspath(path or os.path.join(self._ns_dir(namespace), name))
        t = _create_table(
            spark, tpath, schema, table_name=name, namespace=namespace, **kwargs
        )
        reg[name] = tpath
        _write_json(os.path.join(self._ns_dir(namespace), _TABLES_FILE), reg)
        return t

    def list_tables(self, ns: str = "default") -> list[str]:
        return sorted(self._registry(ns))

    def table_exists(self, name: str, ns: str = "default") -> bool:
        return name in self._registry(ns)

    def get_table(self, spark: SparkSession, name: str, ns: str = "default") -> LakeSoulTable:
        if "." in name and ns == "default":
            ns, name = name.split(".", 1)
        reg = self._registry(ns)
        if name not in reg:
            raise ValueError(f"no such table {ns}.{name}")
        return LakeSoulTable.for_path(spark, reg[name])

    def drop_table(self, name: str, ns: str = "default") -> None:
        reg = self._registry(ns)
        if name not in reg:
            raise ValueError(f"no such table {ns}.{name}")
        path = reg.pop(name)
        _write_json(os.path.join(self._ns_dir(ns), _TABLES_FILE), reg)
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    # ------------------------------------------------------------------ SQL

    def create_sql_views(self, spark: SparkSession, ns: str = "default") -> list[str]:
        """Register every table's MOR view as ``<ns>_<table>`` temp view
        so ``spark.sql`` can query the lake directly."""
        out = []
        for name in self.list_tables(ns):
            view = f"{ns}_{name}"
            self.get_table(spark, name, ns).to_df().createOrReplaceTempView(view)
            out.append(view)
        return out


def merge_into(
    target: LakeSoulTable,
    source: DataFrame,
    on: list[str],
    *,
    when_matched_update: str = "all",
    when_not_matched_insert: str = "all",
) -> None:
    """``MERGE INTO`` with the reference's restrictions
    (``PreprocessTableMergeInto.scala:20-31,34-92``): the ON clause must
    be equality on the full primary key, with exactly one unconditional
    matched-UPDATE-all and one not-matched-INSERT-all — which is
    precisely an upsert, so it is rewritten to one."""
    info = target.info
    if not info.is_pk_table:
        raise ValueError("MERGE INTO requires a primary-key (hash-partitioned) table")
    if sorted(on) != sorted(info.hash_partitions):
        raise ValueError(
            f"MERGE INTO ON clause must be equality on the full PK "
            f"{info.hash_partitions}, got {on}"
        )
    if when_matched_update != "all" or when_not_matched_insert != "all":
        raise ValueError(
            "only unconditional UPDATE SET * / INSERT * are supported "
            "(reference PreprocessTableMergeInto.scala:20-31)"
        )
    target.upsert(source)
