"""Namespace / table catalog over a pluggable metadata backend.

Re-expresses the reference catalog surface — PG-backed namespaces and
table name registry (``LakeSoulCatalog.scala:129-352,512-578``,
``python/src/lakesoul/catalog.py:39-263``, ``entity.proto:68-76``).
Two backends ship:

- :class:`JsonFsBackend` (default) — directory-per-namespace layout
  with JSON registries, self-contained under the warehouse root:

      <root>/<namespace>/_namespace.json       properties
      <root>/<namespace>/_tables.json          short name -> table path
      <root>/<namespace>/<table>/              default table location

- :class:`SqliteBackend` — one shared database file that many driver
  processes open concurrently, the stand-in for the reference's shared
  PostgreSQL metadata service (``lakesoul-common/.../DBManager.java``,
  ``rust/lakesoul-metadata/src/metadata_client.rs:139-904``): name
  uniqueness is a transactional UNIQUE constraint, not a read-modify-
  write of a JSON file, so two racing CREATE TABLEs serialize exactly
  like two drivers against one PG.

No Spark catalog plugin exists for pure PySpark (SURVEY §7.1), so SQL
access goes through :meth:`Catalog.create_sql_views`, which registers
each table's MOR view as a temp view — after which ``spark.sql`` serves
the full relational surface.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from lakesoul_spark.table import LakeSoulTable, create_table as _create_table


def _dbl_order_key(s) -> tuple:
    """NaN-safe sort key for float/double carriers: Spark's total
    order puts NaN above +Infinity, while a raw ``float`` key would
    silently break Python sort transitivity (every NaN comparison is
    False)."""
    import math

    v = float(s)
    return (1, 0.0) if math.isnan(v) else (0, v)

# distinct from None (a legitimate SQL NULL value) in the metadata
# GROUP BY fast path: "this group cannot be proven — fall back"
_REFUSE = object()

_INT_DESC_RE = re.compile(r"^[+-]?[0-9]+$")


def _int_desc(v: str, bits: int) -> int:
    """STRICT integer parse of a partition-desc value: only the forms
    Spark's string→int CAST accepts and only in-range values (Python's
    int() would happily parse '1_0' as 10 and any magnitude, where the
    CAST yields NULL — the metadata answer must never merge or order
    groups differently than the relational one)."""
    if not _INT_DESC_RE.match(v):
        raise ValueError(f"non-canonical int desc value {v!r}")
    n = int(v)
    if not (-(1 << (bits - 1)) <= n < (1 << (bits - 1))):
        raise ValueError(f"desc value {v!r} overflows {bits}-bit int")
    return n


_DATE_DESC_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _date_desc(v: str):
    """STRICT ISO date parse (zero-padded extended form only): a
    CONVERT TO LAKESOUL import can carry 'd=2024-1-2' dirs, which
    Spark's CAST merges with '2024-01-02' while a string key would
    keep them distinct and order them wrong — parse canonically or
    raise (→ fall back to a scan). The regex guard exists because
    Python ≥3.11 ``fromisoformat`` also accepts the BASIC form
    '20240102', which Spark's CAST does not."""
    import datetime

    if not _DATE_DESC_RE.match(v):
        raise ValueError(f"non-canonical date desc value {v!r}")
    return datetime.date.fromisoformat(v)

_NS_FILE = "_namespace.json"
_TABLES_FILE = "_tables.json"
_NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.-]*$")


def _parse_ts_literal(raw: str) -> int:
    """``AS OF`` timestamp literal → epoch millis: digits are millis,
    anything else an ISO datetime (naive treated as UTC — the pinned
    session timezone). Shared by time-travel reads and RESTORE."""
    raw = raw.strip().strip("'\"").strip()
    if raw.isdigit():
        return int(raw)
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(raw)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


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


class JsonFsBackend:
    """Per-root JSON registry (the original layout). Atomicity comes
    from atomic file replace; adequate for one driver per warehouse."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _ns_dir(self, ns: str) -> str:
        return os.path.join(self.root, ns)

    def create_namespace(self, ns: str, properties: dict) -> None:
        d = self._ns_dir(ns)
        if os.path.exists(os.path.join(d, _NS_FILE)):
            raise ValueError(f"namespace {ns!r} already exists")
        _write_json(os.path.join(d, _NS_FILE), {"properties": properties})
        _write_json(os.path.join(d, _TABLES_FILE), {})

    def namespace_exists(self, ns: str) -> bool:
        return os.path.exists(os.path.join(self._ns_dir(ns), _NS_FILE))

    def namespace_properties(self, ns: str) -> dict:
        p = os.path.join(self._ns_dir(ns), _NS_FILE)
        return _read_json(p)["properties"] if os.path.exists(p) else {}

    def list_namespaces(self) -> list[str]:
        out = set()
        for n in os.listdir(self.root):
            if os.path.exists(os.path.join(self.root, n, _NS_FILE)):
                out.add(n)
        return sorted(out)

    def drop_namespace(self, ns: str) -> None:
        import shutil

        shutil.rmtree(self._ns_dir(ns), ignore_errors=True)

    def tables(self, ns: str) -> dict:
        p = os.path.join(self._ns_dir(ns), _TABLES_FILE)
        return _read_json(p) if os.path.exists(p) else {}

    def register_table(self, ns: str, name: str, path: str) -> None:
        reg = self.tables(ns)
        if name in reg:
            raise ValueError(f"table {ns}.{name} already exists")
        reg[name] = path
        _write_json(os.path.join(self._ns_dir(ns), _TABLES_FILE), reg)

    def unregister_table(self, ns: str, name: str) -> str:
        reg = self.tables(ns)
        if name not in reg:
            raise ValueError(f"no such table {ns}.{name}")
        path = reg.pop(name)
        _write_json(os.path.join(self._ns_dir(ns), _TABLES_FILE), reg)
        return path


class SqliteBackend:
    """Shared-database catalog backend — the reference's PG metadata
    service shape (``DBManager.java`` createNewTable/listTables…): many
    drivers, one metastore, uniqueness enforced by the database inside
    a transaction. Each operation opens its own connection (one
    "session" per call, like a pooled PG client) so a single backend
    object is safe to share across threads and processes."""

    def __init__(self, db_path: str, *, timeout_s: float = 30.0):
        self.db_path = os.path.abspath(db_path)
        self.timeout_s = timeout_s
        os.makedirs(os.path.dirname(self.db_path), exist_ok=True)
        with self._conn() as c:
            c.execute(
                "CREATE TABLE IF NOT EXISTS namespaces ("
                " ns TEXT PRIMARY KEY, properties TEXT NOT NULL)"
            )
            c.execute(
                "CREATE TABLE IF NOT EXISTS tables ("
                " ns TEXT NOT NULL, name TEXT NOT NULL, path TEXT NOT NULL,"
                " PRIMARY KEY (ns, name))"
            )

    def _conn(self):
        # context manager: one transaction per call, connection closed
        # after (sqlite3's own `with conn` commits but does NOT close)
        import contextlib
        import sqlite3

        @contextlib.contextmanager
        def cm():
            c = sqlite3.connect(self.db_path, timeout=self.timeout_s)
            try:
                c.execute(
                    "PRAGMA busy_timeout = %d" % int(self.timeout_s * 1000)
                )
                with c:
                    yield c
            finally:
                c.close()

        return cm()

    def create_namespace(self, ns: str, properties: dict) -> None:
        import sqlite3

        with self._conn() as c:
            try:
                c.execute(
                    "INSERT INTO namespaces (ns, properties) VALUES (?, ?)",
                    (ns, json.dumps(properties, sort_keys=True)),
                )
            except sqlite3.IntegrityError:
                raise ValueError(f"namespace {ns!r} already exists") from None

    def namespace_exists(self, ns: str) -> bool:
        with self._conn() as c:
            row = c.execute(
                "SELECT 1 FROM namespaces WHERE ns = ?", (ns,)
            ).fetchone()
        return row is not None

    def namespace_properties(self, ns: str) -> dict:
        with self._conn() as c:
            row = c.execute(
                "SELECT properties FROM namespaces WHERE ns = ?", (ns,)
            ).fetchone()
        return json.loads(row[0]) if row else {}

    def list_namespaces(self) -> list[str]:
        with self._conn() as c:
            rows = c.execute("SELECT ns FROM namespaces").fetchall()
        return sorted(r[0] for r in rows)

    def drop_namespace(self, ns: str) -> None:
        with self._conn() as c:
            c.execute("DELETE FROM tables WHERE ns = ?", (ns,))
            c.execute("DELETE FROM namespaces WHERE ns = ?", (ns,))

    def tables(self, ns: str) -> dict:
        with self._conn() as c:
            rows = c.execute(
                "SELECT name, path FROM tables WHERE ns = ?", (ns,)
            ).fetchall()
        return dict(rows)

    def register_table(self, ns: str, name: str, path: str) -> None:
        import sqlite3

        with self._conn() as c:
            try:
                c.execute(
                    "INSERT INTO tables (ns, name, path) VALUES (?, ?, ?)",
                    (ns, name, path),
                )
            except sqlite3.IntegrityError:
                raise ValueError(f"table {ns}.{name} already exists") from None

    def unregister_table(self, ns: str, name: str) -> str:
        with self._conn() as c:
            row = c.execute(
                "SELECT path FROM tables WHERE ns = ? AND name = ?", (ns, name)
            ).fetchone()
            if row is None:
                raise ValueError(f"no such table {ns}.{name}")
            c.execute(
                "DELETE FROM tables WHERE ns = ? AND name = ?", (ns, name)
            )
        return row[0]


class Catalog:
    def __init__(self, root: str, backend=None):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.backend = backend if backend is not None else JsonFsBackend(self.root)

    # ---------------------------------------------------------- namespaces

    def _ns_dir(self, ns: str) -> str:
        if not _NAME_RE.match(ns):
            raise ValueError(f"bad namespace name {ns!r}")
        return os.path.join(self.root, ns)

    def create_namespace(self, ns: str, properties: dict | None = None) -> None:
        self._ns_dir(ns)  # name validation
        self.backend.create_namespace(ns, properties or {})

    def namespace_exists(self, ns: str) -> bool:
        self._ns_dir(ns)
        return self.backend.namespace_exists(ns)

    def list_namespaces(self) -> list[str]:
        # "default" is implicit (usable without CREATE NAMESPACE), so it
        # always lists — same as SHOW NAMESPACES in a Spark catalog
        return sorted({"default", *self.backend.list_namespaces()})

    def drop_namespace(self, ns: str, *, cascade: bool = False) -> None:
        import shutil

        if not self.namespace_exists(ns):
            raise ValueError(f"no such namespace {ns!r}")
        tables = self.backend.tables(ns)
        if tables and not cascade:
            raise ValueError(f"namespace {ns!r} is not empty (use cascade=True)")
        for path in tables.values():
            shutil.rmtree(path, ignore_errors=True)
        self.backend.drop_namespace(ns)
        shutil.rmtree(self._ns_dir(ns), ignore_errors=True)

    # -------------------------------------------------------------- tables

    def _registry(self, ns: str) -> dict:
        self._ns_dir(ns)
        return self.backend.tables(ns)

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
        if self.table_exists(name, namespace):
            raise ValueError(f"table {namespace}.{name} already exists")
        tpath = os.path.abspath(path or os.path.join(self._ns_dir(namespace), name))
        created_dir = not os.path.exists(tpath)
        t = _create_table(
            spark, tpath, schema, table_name=name, namespace=namespace, **kwargs
        )
        # registration is the commit point: if another driver raced us
        # to the name, the backend's uniqueness constraint rejects the
        # SECOND registration (reference DBManager.createNewTable) —
        # and the loser must not leave its freshly-created table dir +
        # commit log orphaned on disk
        try:
            self.backend.register_table(namespace, name, tpath)
        except Exception:
            if created_dir:
                import shutil

                shutil.rmtree(tpath, ignore_errors=True)
            raise
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
        path = self.backend.unregister_table(ns, name)
        import shutil

        from lakesoul_spark.mv import companion_paths

        # exact count_distinct companions live in sibling dirs and
        # follow the view's lifecycle
        for dv in companion_paths(path):
            shutil.rmtree(dv, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)

    # ------------------------------------------------------------------ SQL

    def create_sql_views(self, spark: SparkSession, ns: str = "default") -> list[str]:
        """Register every table's MOR view as ``<ns>_<table>`` temp view
        so ``spark.sql`` can query the lake directly."""
        out = []
        for name in self.list_tables(ns):
            view = f"{ns}_{name}"
            self._view_df(spark, name, ns).createOrReplaceTempView(view)
            out.append(view)
        return out

    def sql(self, spark: SparkSession, statement: str) -> DataFrame | None:
        """SQL entry point covering the reference catalog's statement
        surface (``LakeSoulCatalog.scala:129-352`` + the command rules)
        without a JVM catalog plugin — LakeSoul DDL/DML statements are
        parsed here and routed to the table API; everything else
        (SELECT, VALUES, …) runs on ``spark.sql`` with every catalog
        table registered as a temp view (default-namespace tables under
        their bare name, others as ``<ns>_<table>``).

        Supported statements (same grammar the reference test suites
        use, e.g. ``DDLSuite.scala:66-95``, ``PrimaryKeyFilterEval
        .scala:68``)::

            CREATE TABLE [IF NOT EXISTS] [ns.]t USING lakesoul … AS SELECT …
            CREATE TABLE [IF NOT EXISTS] [ns.]t (a LONG, b STRING)
                USING lakesoul [PARTITIONED BY (p)] [LOCATION '/path']
                [TBLPROPERTIES('hashPartitions'='a','hashBucketNum'='4',
                               'lakesoul_cdc_change_column'='kind', …)]
            DROP TABLE [IF EXISTS] [ns.]t
            TRUNCATE TABLE [ns.]t
            INSERT INTO [ns.]t [PARTITION (p=v, …)] [(col, …)] <query>
            INSERT OVERWRITE [TABLE] [ns.]t [PARTITION (p=v, …)] <query>
            UPDATE [ns.]t SET a = <expr>[, …] [WHERE <cond>]
            DELETE FROM [ns.]t [WHERE <cond>]
            MERGE INTO [ns.]t [AS] x USING <table | (query)> [AS] y
                ON <pk equality> WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *
            ALTER TABLE [ns.]t ADD COLUMNS (c TYPE [COMMENT 'c']
                [FIRST | AFTER x][, …])
            ALTER TABLE [ns.]t ALTER COLUMN c TYPE <type>
            ALTER TABLE [ns.]t ALTER COLUMN c COMMENT '<comment>'
            ALTER TABLE [ns.]t ALTER COLUMN c FIRST | AFTER x
            ALTER TABLE [ns.]t CHANGE [COLUMN] c c TYPE
                [COMMENT 'c'] [FIRST | AFTER x]
            ALTER TABLE [ns.]t REPLACE COLUMNS (c TYPE [COMMENT 'c'][, …])
            ALTER TABLE [ns.]t SET TBLPROPERTIES('k'='v'[, …])
            ALTER TABLE [ns.]t UNSET TBLPROPERTIES('k'[, …])
            CREATE NAMESPACE [IF NOT EXISTS] ns
            DROP NAMESPACE [IF EXISTS] ns [CASCADE]
            SHOW NAMESPACES
            SHOW TABLES [IN ns]
            SHOW COLUMNS IN|FROM [ns.]t
            SHOW PARTITIONS [ns.]t [EXTENDED]
            SHOW TBLPROPERTIES [ns.]t [('key')]
            DESCRIBE [TABLE] [EXTENDED] [ns.]t
            DESCRIBE HISTORY [ns.]t
            DESCRIBE DETAIL [ns.]t
            CREATE TABLE [ns.]t [SHALLOW|DEEP] CLONE [ns.]s
                [VERSION AS OF n]
            SHOW CREATE TABLE [ns.]t
            SELECT … FROM [ns.]t VERSION AS OF n
            SELECT … FROM [ns.]t TIMESTAMP AS OF <ms | 'iso datetime'>
            SELECT … FROM table_changes('[ns.]t', startV [, endV])
            OPTIMIZE [ns.]t [LEVELED | ZORDER BY (a, b[, …])]
                     [WHERE partition-pred]   (not with ZORDER)
            VACUUM [ns.]t [RETAIN n HOURS] [DRY RUN]
            CHECK TABLE [ns.]t
            CONVERT TO LAKESOUL '/path/to/parquet' [AS [ns.]t]
            RESTORE [TABLE] [ns.]t TO VERSION [AS OF] n
            RESTORE [TABLE] [ns.]t TO TIMESTAMP [AS OF]
                'iso-datetime' | epoch_millis
            CREATE MATERIALIZED VIEW [IF NOT EXISTS] [ns.]v
                [TBLPROPERTIES('hashBucketNum'='8'
                    [, 'allowExtremumRescan'='true']
                    [, 'exactDistinct'='true'])]
                AS SELECT k[, …], sum(x) AS a, count(*) AS b,
                          min(x) AS c, max(x) AS d,
                          approx_count_distinct(x) AS e,
                          count(DISTINCT x) AS f   -- exactDistinct only
                   FROM [ns.]src [WHERE <cond>] GROUP BY k[, …]
                -- allowExtremumRescan opts min/max in over a PK/CDC
                -- (upsert-churning) source: evict-triggered rescans
                -- exactDistinct opts count(DISTINCT …) in over a
                -- PK/CDC source: exact per-value companion tables
            CREATE MATERIALIZED VIEW [ns.]v        -- no GROUP BY:
                AS SELECT <expr> AS a[, …]         -- insert-only
                   FROM [ns.]src [WHERE <cond>]    -- transform pipe
            CREATE MATERIALIZED VIEW [ns.]v        -- delta-join view,
                TBLPROPERTIES('primaryKey'='k')    -- both sides may
                AS SELECT a, b[, …]                -- churn (JoinMV)
                   FROM [ns.]l [INNER | LEFT [OUTER]] JOIN [ns.]r
                        USING (k[, …])
                   [WHERE <cond>]                  -- inner views only;
                       -- LEFT needs a unique right key + left-identity
                       -- primaryKey; a source whose PK == k may churn
                       -- by upsert
            REFRESH MATERIALIZED VIEW [ns.]v [FULL | REPIN]
            DROP MATERIALIZED VIEW [IF EXISTS] [ns.]v
            SHOW MATERIALIZED VIEWS [IN ns]

        Identifiers may be backtick-quoted (```ns`.`t```); backticks
        around word-character identifiers are stripped (outside string
        literals) before dispatch, mirroring how Spark's parser
        normalizes them. Returns a DataFrame for queries / SHOW
        TABLES, else None. For ``;``-separated scripts use
        :meth:`sql_script`.
        """
        stmt = statement.strip().rstrip(";").strip()
        stmt = _strip_backticks(stmt)
        head = re.match(r"(\w+)\s+(\w+)?", stmt)
        verb = (head.group(1) if head else "").upper()
        verb2 = (head.group(2) or "" if head else "").upper()

        if verb == "CREATE" and verb2 == "TABLE":
            cm = re.match(
                r"CREATE\s+TABLE\s+([\w.`]+)\s+(SHALLOW\s+|DEEP\s+)?CLONE"
                r"\s+([\w.`]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*$",
                stmt, re.I,
            )
            if cm:
                # CREATE TABLE t [SHALLOW|DEEP] CLONE s [VERSION AS OF n]
                # — deep by default (Delta's CLONE contract); shallow is
                # metadata-only and instant at any size
                ns, name = self._split_name(cm.group(1))
                if not _NAME_RE.match(name):
                    raise ValueError(f"invalid table name {name!r}")
                if self.table_exists(name, ns):
                    raise ValueError(f"table {ns}.{name} already exists")
                if not self.namespace_exists(ns):
                    if ns == "default":
                        self.create_namespace("default")
                    else:
                        raise ValueError(f"no such namespace {ns!r}")
                sns, sname = self._split_name(cm.group(3))
                src = self.get_table(spark, sname, sns)
                deep = (cm.group(2) or "DEEP").strip().upper() == "DEEP"
                version = int(cm.group(4)) if cm.group(4) else None
                tgt = os.path.abspath(os.path.join(self._ns_dir(ns), name))
                created_dir = not os.path.exists(tgt)
                try:
                    src.clone(tgt, deep=deep, version=version,
                              namespace=ns)
                    self.backend.register_table(ns, name, tgt)
                except Exception:
                    # clone() cleans its own target; only remove the
                    # dir if this statement created it
                    if created_dir:
                        shutil.rmtree(tgt, ignore_errors=True)
                    raise
                return None
            return self._sql_create_table(spark, stmt)
        if verb == "CREATE" and verb2 == "MATERIALIZED":
            return self._sql_create_mv(spark, stmt)
        if verb == "REFRESH":
            m = _rx(
                r"REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)"
                r"(\s+FULL|\s+REPIN)?$",
                stmt,
            )
            mv = self._get_mv(spark, m.group(1))
            mode = (m.group(2) or "").strip().upper()
            if mode == "FULL":
                r = mv.rebuild()
            else:
                if mode == "REPIN":
                    # verified append-only dim re-pin (repin_dims), then
                    # the normal incremental window — the cheap recovery
                    # for drifted append-only dimensions
                    mv.repin_dims()
                r = mv.refresh()
            return spark.createDataFrame(
                [(int(r["end_version"]), bool(r["applied"]))],
                "source_end_version bigint, applied boolean",
            )
        if verb == "DROP" and verb2 == "MATERIALIZED":
            m = _rx(
                r"DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)$",
                stmt,
            )
            ns, name = self._split_name(m.group(2))
            if not self.table_exists(name, ns):
                if m.group(1):
                    return None
                raise ValueError(f"no such materialized view {ns}.{name}")
            self._get_mv(spark, m.group(2))  # must actually BE a view
            self.drop_table(name, ns)
            return None
        if verb == "DROP" and verb2 == "TABLE":
            m = _rx(r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.`]+)$", stmt)
            ns, name = self._split_name(m.group(2))
            if not self.table_exists(name, ns):
                if m.group(1):
                    return None
                raise ValueError(f"no such table {ns}.{name}")
            self.drop_table(name, ns)
            return None
        if verb == "TRUNCATE":
            m = _rx(r"TRUNCATE\s+TABLE\s+([\w.`]+)$", stmt)
            ns, name = self._split_name(m.group(1))
            # truncate = unconditional delete (metadata-only fast path)
            t = self.get_table(spark, name, ns)
            self._reject_mv_write(t, ns, name, "TRUNCATE TABLE")
            t.delete(None)
            return None
        if verb == "INSERT":
            return self._sql_insert(spark, stmt)
        if verb == "UPDATE":
            # the WHERE split must ignore 'WHERE' inside string literals
            # (a lazy regex would cut `SET note = 'a WHERE b'` in half)
            m = _rx(r"UPDATE\s+([\w.`]+)\s+SET\s+(.*)$", stmt)
            ns, name = self._split_name(m.group(1))
            body = m.group(2)
            wi = _find_top_keyword(body, "WHERE")
            sets_str = body[:wi] if wi >= 0 else body
            cond = body[wi + 5:].strip() if wi >= 0 else "true"
            sets = {}
            for part in _split_top(sets_str):
                col, _, expr = part.partition("=")
                if not expr:
                    raise ValueError(f"bad SET clause {part!r}")
                sets[col.strip().strip("`")] = expr.strip()
            t = self.get_table(spark, name, ns)
            self._reject_mv_write(t, ns, name, "UPDATE")
            t.update(cond, sets)
            return None
        if verb == "DELETE":
            m = _rx(r"DELETE\s+FROM\s+([\w.`]+)(?:\s+WHERE\s+(.*))?$", stmt)
            ns, name = self._split_name(m.group(1))
            t = self.get_table(spark, name, ns)
            self._reject_mv_write(t, ns, name, "DELETE")
            t.delete(m.group(2))
            return None
        if verb == "MERGE":
            return self._sql_merge(spark, stmt)
        if verb == "ALTER" and verb2 == "TABLE":
            return self._sql_alter_table(spark, stmt)
        if verb == "CREATE" and verb2 in ("NAMESPACE", "DATABASE"):
            m = _rx(r"CREATE\s+(?:NAMESPACE|DATABASE)\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)$", stmt)
            if self.namespace_exists(m.group(2)):
                if m.group(1):
                    return None
                raise ValueError(f"namespace {m.group(2)} already exists")
            self.create_namespace(m.group(2))
            return None
        if verb == "DROP" and verb2 in ("NAMESPACE", "DATABASE"):
            m = _rx(r"DROP\s+(?:NAMESPACE|DATABASE)\s+(IF\s+EXISTS\s+)?(\w+)(\s+CASCADE)?$", stmt)
            if not self.namespace_exists(m.group(2)):
                if m.group(1):
                    return None
                raise ValueError(f"no such namespace {m.group(2)}")
            self.drop_namespace(m.group(2), cascade=bool(m.group(3)))
            return None
        if verb == "SHOW" and verb2 in ("NAMESPACES", "DATABASES"):
            return spark.createDataFrame(
                [(n,) for n in self.list_namespaces()] or [], "namespace string"
            )
        if verb == "SHOW" and verb2 == "MATERIALIZED":
            m = _rx(r"SHOW\s+MATERIALIZED\s+VIEWS(?:\s+IN\s+(\w+))?$", stmt)
            from lakesoul_spark.mv import SPEC_PROP, open_view

            ns = m.group(1) or "default"
            rows = []
            for n in self.list_tables(ns):
                t = self.get_table(spark, n, ns)
                spec = t.info.properties.get(SPEC_PROP)
                if not spec:
                    continue
                v = open_view(spark, t.path)
                rows.append((
                    ns, n, json.loads(spec).get("kind", "agg"),
                    v.source_path, v.last_applied_version(),
                ))
            return spark.createDataFrame(
                rows or [],
                "namespace string, viewName string, kind string, "
                "source string, applied_source_version bigint",
            )
        if verb == "SHOW" and verb2 == "TABLES":
            m = _rx(r"SHOW\s+TABLES(?:\s+IN\s+(\w+))?$", stmt)
            ns = m.group(1) or "default"
            return spark.createDataFrame(
                [(ns, n) for n in self.list_tables(ns)] or [],
                "namespace string, tableName string",
            )
        if verb == "SHOW" and verb2 == "COLUMNS":
            m = _rx(r"SHOW\s+COLUMNS\s+(?:IN|FROM)\s+([\w.`]+)$", stmt)
            ns, name = self._split_name(m.group(1))
            from lakesoul_spark.io.writer import table_schema as _ts

            info = self.get_table(spark, name, ns).info
            return spark.createDataFrame(
                [(f.name,) for f in _ts(info).fields], "col_name string"
            )
        if verb == "SHOW" and verb2 == "PARTITIONS":
            m = _rx(r"SHOW\s+PARTITIONS\s+([\w.`]+)(\s+EXTENDED)?$", stmt)
            ns, name = self._split_name(m.group(1))
            t = self.get_table(spark, name, ns)
            from lakesoul_spark.meta.store import NON_PARTITIONED

            snap = t.store.snapshot()
            descs = sorted(
                {f.partition_desc for f in snap.files} - {NON_PARTITIONED}
            )
            if m.group(2) is None:
                return spark.createDataFrame(
                    [(d,) for d in descs] or [], "partition string"
                )
            # EXTENDED: per-partition file/byte/row stats from the
            # commit log alone — the per-partition audit a pipeline
            # polls, with zero file IO at any table size. num_rows is
            # NULL when that partition's scope cannot PROVE physical
            # == logical — LITERALLY the count_fast gate
            # (_snapshot_provable + _count_from), applied to a
            # per-partition sub-snapshot so churn in one partition
            # never hides the others, and so a future unprovable
            # condition lands here automatically.
            import dataclasses

            info = t.info
            by_desc = snap.partitions()
            by_desc.pop(NON_PARTITIONED, None)
            rows = []
            for d in descs:
                fs = by_desc[d]
                sub = dataclasses.replace(snap, files=fs)
                n = (LakeSoulTable._count_from(sub)
                     if LakeSoulTable._snapshot_provable(info, sub)
                     else None)
                rows.append((d, len(fs), sum(f.size for f in fs), n))
            return spark.createDataFrame(
                rows or [],
                "partition string, n_files bigint, size_bytes bigint, "
                "num_rows bigint",
            )
        if verb == "SHOW" and verb2 == "TBLPROPERTIES":
            m = _rx(
                r"SHOW\s+TBLPROPERTIES\s+([\w.`]+)"
                r"(?:\s*\(\s*'([^']*)'\s*\))?$",
                stmt,
            )
            ns, name = self._split_name(m.group(1))
            props = dict(self.get_table(spark, name, ns).info.properties)
            if m.group(2) is not None:
                key = m.group(2)
                rows = [(key, props.get(key))]
            else:
                rows = sorted(props.items())
            return spark.createDataFrame(
                rows or [], "key string, value string"
            )
        if verb == "OPTIMIZE":
            # LEVELED must be captured as its own group: a table named
            # `my_leveled` would otherwise trip a suffix check
            m = _rx(
                r"OPTIMIZE\s+([\w.`]+)"
                r"(?:(\s+LEVELED)|\s+ZORDER\s+BY\s*\(([^)]*)\))?"
                r"(?:\s+WHERE\s+(.+?))?\s*$",
                stmt,
            )
            ns, name = self._split_name(m.group(1))
            t = self.get_table(spark, name, ns)
            where = m.group(4)
            if m.group(3) is not None:
                if where:
                    raise ValueError(
                        "OPTIMIZE ... ZORDER BY cannot take WHERE — "
                        "z-ordering is a whole-table clustering rewrite"
                    )
                cols = [c.strip().strip("`")
                        for c in m.group(3).split(",") if c.strip()]
                t.optimize_zorder(cols)
                return None
            if where:
                # compact ONLY the partitions a deterministic
                # partition predicate selects (the 100 TB maintenance
                # shape: rewrite churned partitions, skip the quiet
                # ones) — same evaluator as replaceWhere/DELETE, so a
                # data-column or nondeterministic predicate raises
                from lakesoul_spark.table import _descs_matching

                descs = {f.partition_desc
                         for f in t.store.snapshot().files}
                for d in sorted(_descs_matching(
                        spark, t.info, sorted(descs), where)):
                    if m.group(2):
                        t.leveled_compaction(d)
                    else:
                        t.compaction(d, force=True)
                return None
            if m.group(2):
                t.leveled_compaction()
            else:
                t.compaction(force=True)
            return None
        if verb == "VACUUM":
            m = _rx(
                r"VACUUM\s+([\w.`]+)(?:\s+RETAIN\s+(\d+)\s+HOURS?)?"
                r"(\s+DRY\s+RUN)?$",
                stmt,
            )
            ns, name = self._split_name(m.group(1))
            hours = int(m.group(2)) if m.group(2) else 1
            n = self.get_table(spark, name, ns).vacuum(
                retention_ms=hours * 3_600_000, dry_run=bool(m.group(3))
            )
            if m.group(3):
                return spark.createDataFrame(
                    [(n,)], "files_to_delete bigint"
                )
            return None
        if verb == "CONVERT":
            m = _rx(
                r"CONVERT\s+TO\s+LAKESOUL\s+'([^']+)'"
                r"(?:\s+AS\s+([\w.`]+))?$",
                stmt,
            )
            from lakesoul_spark.table import convert_to_lakesoul

            # Validate the AS target BEFORE converting: the conversion
            # commits a metastore in-place and cannot be retried, so a
            # bad namespace / taken name must fail while the directory
            # is still untouched.
            target = None
            if m.group(2):
                ns, name = self._split_name(m.group(2))
                if not self.namespace_exists(ns) and ns != "default":
                    raise ValueError(f"no such namespace {ns!r}")
                if self.table_exists(name, ns):
                    raise ValueError(f"table {ns}.{name} already exists")
                target = (ns, name)
            t = convert_to_lakesoul(spark, m.group(1))
            if target is not None:
                ns, name = target
                if ns == "default" and not self.namespace_exists("default"):
                    self.create_namespace("default")
                self.backend.register_table(ns, name, t.path)
            return None
        if verb == "CHECK":
            m = _rx(r"CHECK\s+TABLE\s+([\w.`]+)$", stmt)
            ns, name = self._split_name(m.group(1))
            return self.get_table(spark, name, ns).fsck()
        if verb == "RESTORE":
            m = _rx(
                r"RESTORE\s+(?:TABLE\s+)?([\w.`]+)\s+TO\s+"
                r"(VERSION|TIMESTAMP)\s+(?:AS\s+OF\s+)?(.+?)$",
                stmt,
            )
            ns, name = self._split_name(m.group(1))
            t = self.get_table(spark, name, ns)
            # a rolled-back MV keeps its newest applied-source-version
            # marker (it rides earlier commits), so the next refresh
            # would silently SKIP the rolled-back window — refuse, like
            # every other verb that mutates MV state out-of-band
            self._reject_mv_write(t, ns, name, "RESTORE")
            if m.group(2).upper() == "VERSION":
                raw = m.group(3).strip().strip("'\"")
                if not raw.isdigit():
                    raise ValueError(
                        f"cannot parse RESTORE version {m.group(3)!r}: "
                        "expected an integer"
                    )
                t.rollback(version=int(raw))
            else:
                t.rollback(timestamp_ms=_parse_ts_literal(m.group(3)))
            return None
        if verb in ("DESCRIBE", "DESC") and verb2 == "HISTORY":
            m = _rx(r"(?:DESCRIBE|DESC)\s+HISTORY\s+([\w.`]+)$", stmt)
            ns, name = self._split_name(m.group(1))
            return self.get_table(spark, name, ns).history()
        if verb in ("DESCRIBE", "DESC") and verb2 == "DETAIL":
            # table facts from the commit log alone (Delta's DESCRIBE
            # DETAIL shape): zero data-file IO — num_rows comes from
            # count_fast and is NULL when metadata cannot prove it
            # (CDC tables, overlapping PK generations, legacy files)
            from lakesoul_spark.mv import SPEC_PROP

            m = _rx(r"(?:DESCRIBE|DESC)\s+DETAIL\s+([\w.`]+)$", stmt)
            ns, name = self._split_name(m.group(1))
            t = self.get_table(spark, name, ns)
            info = t.info
            snap = t.store.snapshot()
            row = (
                "lakesoul", info.table_id, f"{ns}.{name}", info.path,
                list(info.range_partitions), list(info.hash_partitions),
                info.hash_bucket_num, len(snap.files),
                sum(f.size for f in snap.files), t.count_fast(),
                snap.max_generations_per_bucket() if snap.files else 0,
                t.store.head_version(),
                SPEC_PROP in info.properties,
            )
            return spark.createDataFrame(
                [row],
                "format string, id string, name string, location string, "
                "partition_columns array<string>, "
                "hash_partition_columns array<string>, "
                "hash_bucket_num int, num_files long, size_bytes long, "
                "num_rows long, max_generations_per_bucket int, "
                "version long, is_materialized_view boolean",
            )
        if verb in ("DESCRIBE", "DESC") and verb2 != "HISTORY":
            # EXTENDED is a captured keyword, not a substring test — a
            # table whose NAME contains "extended" must not trigger it
            m = _rx(r"(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?(EXTENDED\s+)?([\w.`]+)$", stmt)
            extended = bool(m.group(1))
            ns, name = self._split_name(m.group(2))
            info = self.get_table(spark, name, ns).info
            from lakesoul_spark.io.writer import table_schema as _ts

            rows = [(f.name, f.dataType.simpleString(),
                     "range" if f.name in info.range_partitions
                     else "hash" if f.name in info.hash_partitions else "",
                     f.metadata.get("comment", ""))
                    for f in _ts(info).fields]
            if extended:
                rows += [
                    ("", "", "", ""),
                    ("# location", info.path, "", ""),
                    ("# hash_bucket_num", str(info.hash_bucket_num), "", ""),
                    ("# properties",
                     json.dumps(info.properties, sort_keys=True), "", ""),
                ]
            return spark.createDataFrame(
                rows,
                "col_name string, data_type string, partition string, "
                "comment string",
            )
        if verb == "SHOW" and verb2 == "CREATE":
            m = _rx(r"SHOW\s+CREATE\s+TABLE\s+([\w.`]+)$", stmt)
            ns, name = self._split_name(m.group(1))
            info = self.get_table(spark, name, ns).info
            from lakesoul_spark.io.writer import table_schema as _ts

            cols = ",\n  ".join(
                f"{f.name} {f.dataType.simpleString().upper()}"
                for f in _ts(info).fields
            )
            ddl = f"CREATE TABLE {ns}.{name} (\n  {cols})\nUSING lakesoul"
            if info.range_partitions:
                ddl += f"\nPARTITIONED BY ({', '.join(info.range_partitions)})"
            props = dict(info.properties)
            if info.hash_partitions:
                props["hashPartitions"] = ",".join(info.hash_partitions)
                props["hashBucketNum"] = str(info.hash_bucket_num)
            if props:
                kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
                ddl += f"\nTBLPROPERTIES({kv})"
            ddl += f"\nLOCATION '{info.path}'"
            return spark.createDataFrame([(ddl,)], "createtab_stmt string")

        # metadata-only fast path for the most common ad-hoc probes:
        # a SELECT of only COUNT(*)/COUNT(col)/MIN/MAX/SUM/AVG(col)
        # items over one table, bare or with a PARTITION-ONLY WHERE
        # (and optional VERSION AS OF / GROUP BY over range-partition
        # columns), answers from the commit log (count_fast /
        # min_max_fast / sum_fast) with ZERO file IO and zero scan jobs —
        # the result is a LocalTableScan whose collect() doesn't even
        # launch a job. Dispatches only when EVERY item can PROVE
        # physical == logical (no CDC, no multi-generation PK buckets
        # in the scoped partitions, num_rows/stats everywhere, exact
        # stats types for min/max, and any WHERE a deterministic
        # predicate over range-partition columns only — reference
        # PartitionFilter.scala prunes in PG metadata the same way);
        # anything unprovable — a data-column predicate, a GROUP BY
        # tail, any other SELECT shape — falls through to the
        # relational path below unchanged (never wrong, just a scan).
        am = re.match(
            r"SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<tbl>[\w.]+)"
            r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
            r"|\s+TIMESTAMP\s+AS\s+OF\s+(?P<ts>'[^']*'|\d+))?"
            r"(?:\s+WHERE\s+(?P<where>.+?))?"
            r"(?:\s+GROUP\s+BY\s+(?P<gby>.+?)"
            r"(?:\s+HAVING\s+(?P<hav>.+?))?"
            r"(?:\s+ORDER\s+BY\s+(?P<oby>.+?))?"
            r"(?:\s+LIMIT\s+(?P<lim>\d+))?)?"
            r"\s*;?\s*$",
            stmt, re.I | re.S,
        )
        if am:
            if am.group("gby"):
                fast = self._try_metadata_group_by(spark, am)
            else:
                dm = re.match(r"DISTINCT\s+(.+)$", am.group("items"),
                              re.I | re.S)
                if dm is not None:
                    # SELECT DISTINCT <range-partition cols> ≡ GROUP BY
                    # those columns: the distinct partition tuples are
                    # the commit log's descs (with ≥1 live row) — the
                    # other canonical freshness probe, zero jobs; any
                    # non-bare-partition item refuses inside
                    fast = self._try_metadata_group_by(
                        spark, am, items_txt=dm.group(1),
                        group_txt=dm.group(1))
                else:
                    fast = self._try_metadata_aggs(spark, am)
            if fast is not None:
                return fast

        # relational fallback: expose the lake as temp views, delegate.
        # Temp views cannot be dot-qualified, so qualified references
        # (`ns.table`) are rewritten to the `<ns>_<table>` view name.
        # LAZY: only tables the statement textually references are
        # resolved — with hundreds of catalog tables, registering all
        # of them would cost hundreds of snapshot resolutions per
        # statement. A name match inside a string literal registers one
        # extra view (harmless); a genuine reference always matches
        # (word-bounded scan, backticks are non-word chars). Safety
        # net: if Spark still reports an unresolved relation, register
        # everything once and retry.
        stmt = self._register_table_changes(spark, stmt)
        stmt = self._register_time_travel(spark, stmt)
        stmt = self._register_referenced(spark, stmt)
        try:
            return spark.sql(stmt)
        except Exception as e:  # pragma: no cover - safety net
            if "TABLE_OR_VIEW_NOT_FOUND" not in str(e):
                raise
            stmt = self._register_referenced(spark, stmt, register_all=True)
            return spark.sql(stmt)

    _META_AGG_RE = re.compile(
        r"^COUNT\s*\(\s*(?:\*|1)\s*\)(?:\s+AS\s+(\w+))?$"
        r"|^(MIN|MAX|SUM|AVG|COUNT)\s*\("
        r"\s*`?(?!(?:DISTINCT|ALL)\b)(\w+)`?\s*\)"
        r"(?:\s+AS\s+(\w+))?$"
        r"|^COUNT\s*\(\s*DISTINCT\s+`?(\w+)`?\s*\)"
        r"(?:\s+AS\s+(\w+))?$",
        re.I,
    )

    # range-partition desc values order correctly under these declared
    # types (ints numerically after the strict parse; dates as
    # datetime.date; plain strings lexicographically); anything else
    # (float/bool/timestamp) refuses. The typed parses are STRICT —
    # exactly the strings Spark's string→type CAST accepts, normalized
    # to one canonical value per equivalence class: Python's bare
    # int() accepts '1_0' (→ 10) where the CAST yields NULL, and a
    # CONVERT TO LAKESOUL import can bring non-zero-padded date dirs
    # ('2024-1-2') whose lexicographic order and distinctness diverge
    # from the relational cast. Any unparseable / out-of-range desc
    # value raises → the statement falls back to a real scan.
    _PART_VALUE_KEYS = {
        "tinyint": lambda v: _int_desc(v, 8),
        "smallint": lambda v: _int_desc(v, 16),
        "int": lambda v: _int_desc(v, 32),
        "integer": lambda v: _int_desc(v, 32),
        "bigint": lambda v: _int_desc(v, 64),
        "long": lambda v: _int_desc(v, 64),
        "date": _date_desc, "string": str,
    }

    @staticmethod
    def _part_sum_files(files, col: str, key_fn) -> tuple | None:
        """Exact ``(sum, nonnull, Σ|value|)`` of an INT-FAMILY
        range-partition column over a live-file list: the desc IS the
        value, so the sum is ``Σ typed(desc) × num_rows`` over
        non-sentinel partitions (the NULL-sentinel partition holds SQL
        NULLs — contributes nothing to SUM/AVG). Sound under the
        shared provable-snapshot gate for the same reason COUNT(*) is:
        at most one generation per scoped PK bucket, so ``num_rows``
        sums to the relational row count. ``Σ|value|`` feeds AVG's
        2^53 double-accumulation proof (it bounds every partial sum in
        any execution order). ``None`` when a file predates num_rows
        recording or a desc value is outside the canonical typed
        grammar (→ fall back to a scan)."""
        from lakesoul_spark.io import partition as part_enc

        total = nonnull = bound = 0
        for f in files:
            if f.num_rows < 0:
                return None
            v = part_enc.parse_desc(f.partition_desc).get(col)
            if v is None:
                continue
            try:
                tv = key_fn(v)
            except (TypeError, ValueError):
                return None
            total += tv * f.num_rows
            bound += abs(tv) * f.num_rows
            nonnull += f.num_rows
        return (total, nonnull, bound)

    @staticmethod
    def _part_rows_by_desc(files) -> dict | None:
        """Total live rows per partition desc over a (scoped, provable)
        file list — ``None`` when any file predates the num_rows-
        recording writer. A partition contributes its desc VALUE to
        MIN/MAX/COUNT(DISTINCT) only while it holds >0 rows."""
        rows: dict = {}
        for f in files:
            if f.num_rows < 0:
                return None
            rows[f.partition_desc] = (
                rows.get(f.partition_desc, 0) + f.num_rows)
        return rows

    def _try_metadata_aggs(self, spark: SparkSession, m) -> DataFrame | None:
        """Resolve a SELECT of only ``COUNT(*)``/``COUNT(col)``/
        ``MIN``/``MAX``/``SUM``/``AVG(col)`` items against commit-log
        metadata. Returns the one-row result as a VALUES-backed
        LocalTableScan (collect launches no job), or ``None`` whenever
        ANY item is unprovable — unknown table, non-agg item,
        string/float/decimal min/max without writer-computed exact
        extrema (footer strings may be truncated, footer floats
        NaN-lossy), SUM outside integer/decimal, AVG outside the
        integer family or past the 2^53 double-accumulation proof,
        CDC / churned tables, or a WHERE the partition pruner refuses.
        Timestamp extrema render as Z-suffixed literals, exact in any
        session timezone. Output column names match
        the relational fallback's auto-aliases — ``count(1)``, and
        otherwise the function lowercased with the argument in the
        QUERY's casing (backticks stripped) — so the schema never
        depends on which path answered."""
        items = [s.strip() for s in m.group("items").split(",")]
        parsed = []
        for it in items:
            im = self._META_AGG_RE.match(it)
            if im is None:
                return None
            if im.group(5):  # COUNT(DISTINCT col) — group 5 = USER casing
                parsed.append(("cntd", im.group(5), im.group(6)))
            elif im.group(2):  # MIN/MAX — group(3) keeps the USER casing
                parsed.append((im.group(2).lower(), im.group(3),
                               im.group(4)))
            else:
                parsed.append(("count", None, im.group(1)))
        ns, name = self._split_name(m.group("tbl"))
        if not self.table_exists(name, ns):
            return None
        t = self.get_table(spark, name, ns)
        if m.group("ver") is not None:
            t = LakeSoulTable.for_path_snapshot(
                spark, t.path, version=int(m.group("ver"))
            )
        elif m.group("ts") is not None:
            # epoch millis or a quoted ISO datetime (naive = UTC) —
            # the same literal grammar _register_time_travel accepts
            t = LakeSoulTable.for_path_snapshot(
                spark, t.path,
                end_ts_ms=_parse_ts_literal(m.group("ts").strip("'")),
            )
        fields, ambiguous, case_sensitive = self._schema_index(spark, t)
        # resolve the snapshot ONCE per statement: every item reads the
        # same table version, so a concurrent commit can never produce
        # a row mixing two versions (the relational path's guarantee)
        snap = t._provable_snapshot(m.group("where"))
        if snap is None:
            return None
        sel = []
        mm_cache: dict[str, tuple] = {}
        prows: dict | None = None
        for fn, col, alias in parsed:
            if fn == "count" and col is None:
                n = t._count_from(snap)
                if n is None:
                    return None
                # Spark's analyzer rewrites count(*) to count(1) and
                # auto-aliases it "count(1)"
                sel.append(f"CAST({int(n)} AS BIGINT) AS "
                           f"`{alias or 'count(1)'}`")
                continue
            key = col if case_sensitive else col.lower()
            if key in ambiguous:
                return None
            f = fields.get(key)
            if f is None:
                return None
            st = f.dataType.simpleString()
            if fn == "cntd" and f.name not in t.info.range_partitions:
                return None  # data-column DISTINCT needs a real scan
            if f.name in t.info.range_partitions and fn in (
                    "cntd", "min", "max"):
                # desc-materialized values: the scoped snapshot's
                # partition descs ARE the column's value set — a
                # partition contributes while it holds >0 rows (exact
                # under the provable-snapshot gate), so MAX(day) /
                # COUNT(DISTINCT day) — the most common freshness
                # probes — cost one driver-side metadata pass
                key_fn = self._PART_VALUE_KEYS.get(st)
                if key_fn is None:
                    return None
                if prows is None:
                    prows = self._part_rows_by_desc(snap.files)
                if prows is None:
                    return None
                from lakesoul_spark.io import partition as part_enc

                raw = {part_enc.parse_desc(d).get(f.name)
                       for d, n in prows.items() if n > 0} - {None}
                try:
                    # TYPED values: distinct desc encodings of one
                    # typed value (imported '01' vs written '1') must
                    # collapse exactly as the relational cast does
                    vals = {key_fn(v) for v in raw}
                except (TypeError, ValueError):
                    return None  # unparseable desc value: fall back
                if fn == "cntd":
                    sel.append(f"CAST({len(vals)} AS BIGINT) AS "
                               f"`{alias or f'count(DISTINCT {col})'}`")
                    continue
                # value renders go through a string cast (or nullif):
                # relational MIN/MAX is nullable=True and the schema
                # must not depend on which path answered
                if not vals:
                    lit = f"CAST(NULL AS {st.upper()})"
                elif st == "date":
                    v = (min if fn == "min" else max)(vals)
                    lit = f"CAST('{v}' AS DATE)"
                elif st == "string":
                    lit = _nullable_str_lit(
                        (min if fn == "min" else max)(vals))
                else:
                    v = (min if fn == "min" else max)(vals)
                    lit = f"CAST('{int(v)}' AS {st.upper()})"
                sel.append(f"{lit} AS `{alias or f'{fn}({col})'}`")
                continue
            if fn == "count":
                # COUNT(col) = Σ per-file nonnull (any stats-column
                # type; range-partition columns count via the desc)
                n = t._count_col_from(snap, f.name)
                if n is None:
                    return None
                sel.append(f"CAST({int(n)} AS BIGINT) AS "
                           f"`{alias or f'count({col})'}`")
                continue
            if fn == "avg":
                if f.name in t.info.range_partitions:
                    # desc-derived: avg = Σ value×rows / Σ rows, exact
                    # in Spark's double accumulation under the 2^53
                    # Σ|value| bound (int family only — Spark coerces
                    # other types through casts this path won't mimic)
                    if st not in LakeSoulTable._SUM_EXACT_TYPES:
                        return None
                    kf = self._PART_VALUE_KEYS.get(st)
                    r = kf and self._part_sum_files(snap.files,
                                                    f.name, kf)
                    if not r or r[2] >= 2 ** 53:
                        return None
                    total, nonnull, _b = r
                    lit = ("CAST(NULL AS DOUBLE)" if nonnull == 0 else
                           f"CAST('{float(total) / nonnull!r}' "
                           f"AS DOUBLE)")
                    sel.append(f"{lit} AS `{alias or f'avg({col})'}`")
                    continue
                if st.startswith("decimal("):
                    # exact decimal AVG from the recorded exact sums +
                    # nonnull counts (result type decimal(p+4,s+4),
                    # HALF_UP — proof in _avg_dec_files)
                    r = t._avg_dec_from(snap, f.name, st)
                    if r is None:
                        return None
                    v, rt = r
                    lit = (f"CAST(NULL AS {rt.upper()})" if v is None
                           else f"CAST('{v}' AS {rt.upper()})")
                    sel.append(f"{lit} AS `{alias or f'avg({col})'}`")
                    continue
                r = t._avg_from(snap, f.name)
                if r is None:
                    return None
                v = r[0]
                # repr(float) is the shortest round-trip decimal and
                # Spark's string→double cast is correctly rounded, so
                # the literal parses back to the identical double
                lit = ("CAST(NULL AS DOUBLE)" if v is None
                       else f"CAST('{v!r}' AS DOUBLE)")
                sel.append(f"{lit} AS `{alias or f'avg({col})'}`")
                continue
            if fn == "sum":
                if f.name in t.info.range_partitions:
                    # desc-derived: sum = Σ value×rows (int family;
                    # overflow refused through the shared result-type
                    # bound, exactly like data-column sums)
                    if st not in LakeSoulTable._SUM_EXACT_TYPES:
                        return None
                    kf = self._PART_VALUE_KEYS.get(st)
                    r = kf and self._part_sum_files(snap.files,
                                                    f.name, kf)
                    rr = r and self._sum_render((r[0], r[1]), st)
                    if not rr:
                        return None
                    v, rt = rr
                    lit = (f"CAST(NULL AS {rt})" if v is None
                           else f"CAST('{v}' AS {rt})")
                    sel.append(f"{lit} AS `{alias or f'sum({col})'}`")
                    continue
                lit = self._sum_literal(t, snap, f.name, st)
                if lit is None:
                    return None
                sel.append(f"{lit} AS `{alias or f'sum({col})'}`")
                continue
            kind = ("str" if st == "string"
                    else "dec" if st.startswith("decimal(")
                    else "flt" if st in ("float", "double")
                    else None)
            if kind is not None:
                # exact extrema recorded by the writer from the column
                # VALUES (footer string stats may be truncated
                # prefixes, float footer stats may omit NaN — valid
                # bounds, never claimed-exact extrema)
                if col not in mm_cache:
                    mm = t._minmax_exact_from(snap, f.name, kind)
                    if mm is None:
                        return None
                    mm_cache[col] = mm
                v = mm_cache[col][0 if fn == "min" else 1]
                if v is None:
                    lit = f"CAST(NULL AS {st.upper()})"
                elif kind == "str":
                    lit = _nullable_str_lit(v)
                elif kind == "dec":
                    lit = f"CAST('{v}' AS {st.upper()})"
                else:
                    lit = f"CAST('{_flt_sql_str(v)}' AS {st.upper()})"
                sel.append(f"{lit} AS `{alias or f'{fn}({col})'}`")
                continue
            cname = f.name
            if cname not in mm_cache:
                mm = t._minmax_from(snap, cname)
                if mm is None:
                    return None
                mm_cache[cname] = mm
            v = mm_cache[cname][0 if fn == "min" else 1]
            # every render is a STRING cast: it parses to the same
            # typed value as the bare literal form (a typed literal IS
            # defined as the cast of its string) and, unlike a plain
            # literal, analyzes as nullable=True — the relational
            # MIN/MAX schema
            if st == "date":
                lit = f"CAST('{v}' AS DATE)"
            elif st == "timestamp":
                # micros-exact: stats encode naive-UTC ISO, and the
                # explicit Z suffix pins the cast to that instant
                # in EVERY session timezone (a bare string would be
                # reinterpreted in the session zone; verified incl.
                # pre-epoch values)
                lit = f"CAST('{v}Z' AS TIMESTAMP)"
            elif st == "timestamp_ntz":
                lit = f"CAST('{v}' AS TIMESTAMP_NTZ)"
            else:  # integer family (min_max_fast's type gate)
                lit = f"CAST('{int(v)}' AS {st.upper()})"
            # the fallback's auto-alias lowercases the function but
            # keeps the QUERY's casing of the argument (backticks
            # stripped) — replicate exactly so the schema never
            # depends on which path answered
            sel.append(f"{lit} AS `{alias or f'{fn}({col})'}`")
        # a projection of literals over VALUES constant-folds into a
        # LocalRelation → LocalTableScan; collect() launches no job
        # (a bare SELECT of literals plans Scan OneRowRelation, which
        # DOES run one)
        return spark.sql(
            "SELECT " + ", ".join(sel) + " FROM VALUES (0)"
        )

    @staticmethod
    def _schema_index(spark: SparkSession, t):
        """Case-folded column index shared by the metadata fast paths:
        ``(fields, ambiguous, case_sensitive)``. Two columns that
        collapse under case folding land in ``ambiguous`` — the
        relational path would raise AMBIGUOUS_REFERENCE, so a fast
        path must refuse, never pick one."""
        from lakesoul_spark.io.writer import table_schema

        case_sensitive = str(spark.conf.get(
            "spark.sql.caseSensitive", "false")).lower() == "true"
        fields: dict = {}
        ambiguous: set = set()
        for f in table_schema(t.info).fields:
            key = f.name if case_sensitive else f.name.lower()
            if key in fields:
                ambiguous.add(key)
            fields[key] = f
        return fields, ambiguous, case_sensitive

    _BARE_COL_RE = re.compile(r"^`?(\w+)`?(?:\s+AS\s+(\w+))?$", re.I)

    def _try_metadata_group_by(self, spark: SparkSession, m,
                               items_txt: str | None = None,
                               group_txt: str | None = None,
                               ) -> DataFrame | None:
        """Resolve ``SELECT <group cols + COUNT/MIN/MAX/SUM items>
        FROM t [WHERE partition-pred] GROUP BY <range-partition cols>``
        from per-partition commit-log rows — the same metadata SHOW
        PARTITIONS EXTENDED proves, shaped as a grouped result. Zero
        scan jobs: groups are the scoped snapshot's partition descs
        bucketed by the GROUP BY columns' parsed values, each
        aggregate reads the group's per-file num_rows / [min,max] /
        [sum,nonnull] entries, and the rows materialize as a
        LocalRelation (``local_df``) with every column cast to the
        relational result type. ``None`` — the never-wrong fallback —
        whenever any piece is unprovable: a GROUP BY column that is
        not a range partition (or an ordinal), an item outside the
        provable aggregate family, a churned/CDC snapshot
        (:meth:`LakeSoulTable._provable_snapshot` scoped by the
        WHERE), a file missing a stat, or more groups than a
        LocalRelation should carry. At 100 TB the per-partition
        rollup a pipeline dashboard polls stops costing a corpus
        scan. Reference: the PG-side per-partition stats of
        PartitionInfo + CompactBucketIO.java:220-258."""
        from lakesoul_spark.functions.local_df import (
            MAX_LOCAL_ROWS, local_df,
        )
        from lakesoul_spark.io import partition as part_enc

        ns, name = self._split_name(m.group("tbl"))
        if not self.table_exists(name, ns):
            return None
        t = self.get_table(spark, name, ns)
        if m.group("ver") is not None:
            t = LakeSoulTable.for_path_snapshot(
                spark, t.path, version=int(m.group("ver"))
            )
        elif m.group("ts") is not None:
            # epoch millis or a quoted ISO datetime (naive = UTC) —
            # the same literal grammar _register_time_travel accepts
            t = LakeSoulTable.for_path_snapshot(
                spark, t.path,
                end_ts_ms=_parse_ts_literal(m.group("ts").strip("'")),
            )
        info = t.info
        fields, ambiguous, case_sensitive = self._schema_index(spark, t)
        rset = {c if case_sensitive else c.lower(): c
                for c in info.range_partitions}

        def _range_col(txt: str) -> str | None:
            key = txt if case_sensitive else txt.lower()
            if key in ambiguous:
                return None
            return rset.get(key)

        gcols: list[str] = []
        for g in (s.strip() for s in (group_txt or m.group("gby")).split(",")):
            gm = self._BARE_COL_RE.match(g)
            if gm is None or gm.group(2) or gm.group(1).isdigit():
                return None  # ordinals/expressions: not representable
            rc = _range_col(gm.group(1))
            if rc is None or rc in gcols:
                return None  # non-partition or duplicate group col
            st = fields[rc if case_sensitive
                        else rc.lower()].dataType.simpleString()
            if self._PART_VALUE_KEYS.get(st) is None:
                return None  # no canonical typed form: fall back
            gcols.append(rc)

        # (kind, ...) per SELECT item, in order
        parsed: list[tuple] = []
        for it in (s.strip() for s in (items_txt or m.group("items")).split(",")):
            im = self._META_AGG_RE.match(it)
            if im is not None:
                if im.group(5):
                    parsed.append(("agg", "cntd", im.group(5),
                                   im.group(6)))
                elif im.group(2):
                    parsed.append(("agg", im.group(2).lower(),
                                   im.group(3), im.group(4)))
                else:
                    parsed.append(("agg", "count", None, im.group(1)))
                continue
            cm = self._BARE_COL_RE.match(it)
            if cm is None or cm.group(1).isdigit():
                return None
            rc = _range_col(cm.group(1))
            if rc is None or rc not in gcols:
                return None  # a bare item must be a grouping column
            # a bare reference keeps the QUERY's casing as its output
            # name (Spark resolves but does not re-case it)
            parsed.append(("group", rc, cm.group(2) or cm.group(1)))

        # HAVING / aggregate ORDER BY items resolve against grouping
        # columns, output aliases, and aggregate expressions — hidden
        # items are APPENDED to ``parsed`` (Spark computes an
        # unselected HAVING/ORDER BY aggregate the same way) and ride
        # the ordinary spec machinery below, so every provability gate
        # applies to them too; the final projection drops them.
        n_visible = len(parsed)
        hav_ast = None
        if m.group("hav") is not None:
            hav_ast = self._parse_having_text(
                m.group("hav"), parsed, gcols, case_sensitive, rset,
                ambiguous)
            if hav_ast is None:
                return None
        # hidden-item boundary: HAVING operands outside the SELECT
        # (aggregates OR unselected grouping columns) were appended
        # past n_visible by the parse above. An ("expr", …) item whose
        # leaves all resolved to SELECTED items does NOT count —
        # measured (r15): Spark resolves HAVING arithmetic over
        # selected aggregates fine even combined with aggregate ORDER
        # BY items; only a hidden LEAF (an unselected aggregate or
        # grouping column) trips the analyzer rejection below
        hav_hidden = any(p[0] != "expr" for p in parsed[n_visible:])
        oby_txt = m.group("oby")
        order_extra: dict[str, int] = {}
        if oby_txt is not None:
            oby_txt = self._rewrite_order_aggs(
                oby_txt, parsed, gcols, case_sensitive, rset,
                ambiguous, order_extra, n_visible=n_visible)
            if oby_txt is None:
                return None
            if hav_hidden and order_extra:
                # ERROR PARITY (measured on Spark 4.1, r14): the
                # analyzer rejects a HAVING that resolved to ANY
                # hidden item (an unselected aggregate or grouping
                # column) combined with ANY aggregate-expression
                # ORDER BY item — even one the SELECT carries
                # (UNSUPPORTED_EXPR_FOR_OPERATOR) — the hidden having
                # column breaks sort-aggregate resolution. A HAVING
                # over selected outputs with hidden sort aggregates
                # resolves fine (and is answered below), as does a
                # hidden HAVING with alias/plain ORDER BY items —
                # never answer the one combination Spark errors on
                return None

        snap = t._provable_snapshot(m.group("where"))
        if snap is None:
            return None
        # every per-item gate resolves ONCE here — the per-group value
        # functions below touch only the group's file list (no
        # table_info re-reads inside the group loop; this path's whole
        # point is one driver-side metadata pass)
        defaults = info.column_defaults()
        range_set = set(info.range_partitions)

        # bucket by the TYPED value, not the raw desc string: two
        # encodings of one typed value (e.g. 'p=01' from an imported
        # hive layout and 'p=1' from this writer, both int 1) must land
        # in ONE group, exactly as the relational cast merges them
        gconv = [self._PART_VALUE_KEYS[
            fields[c if case_sensitive
                   else c.lower()].dataType.simpleString()]
            for c in gcols]
        groups: dict[tuple, list] = {}
        for f in snap.files:
            vals = part_enc.parse_desc(f.partition_desc)
            try:
                key = tuple(
                    None if vals.get(c) is None else conv(vals.get(c))
                    for c, conv in zip(gcols, gconv))
            except (TypeError, ValueError):
                return None  # unparseable desc value: fall back
            groups.setdefault(key, []).append(f)
        # relational GROUP BY emits a group only where ≥1 live row
        # exists: a zero-row desc (all rows deleted, an empty write)
        # must not fabricate one, and a file that predates num_rows
        # recording can prove neither way — refuse the statement
        for key in list(groups):
            n = 0
            for f in groups[key]:
                if f.num_rows < 0:
                    return None
                n += f.num_rows
            if n == 0:
                del groups[key]
        if len(groups) > MAX_LOCAL_ROWS:
            return None  # past the LocalRelation budget a scan is fine

        # column spec per item: carrier DDL type for local_df, a final
        # cast (None = carrier already IS the result type), the output
        # name, and a per-group value function
        specs: list[tuple] = []
        for idx, p in enumerate(parsed):
            cname = f"c{idx}"
            if p[0] == "group":
                _, rc, out = p
                st = fields[rc if case_sensitive
                            else rc.lower()].dataType.simpleString()
                gi = gcols.index(rc)
                specs.append((cname, "string", st, out,
                              lambda key, gf, gi=gi:
                              None if key[gi] is None else str(key[gi])))
                continue
            if p[0] == "expr":
                # hidden arithmetic over earlier operands (their spec
                # entries already exist — leaves resolve before the
                # expr item is appended)
                es = self._expr_spec(p[1], specs)
                if es is None:
                    return None
                carrier, cast_to, efv = es
                specs.append((cname, carrier, cast_to, p[3], efv))
                continue
            _, fn, col, alias = p
            if fn == "count" and col is None:
                def _cnt(key, gf):
                    n = LakeSoulTable._count_files(gf)
                    # COUNT is never NULL relationally: an unprovable
                    # group refuses the whole statement, never guesses
                    return _REFUSE if n is None else int(n)
                specs.append((cname, "bigint", None,
                              alias or "count(1)", _cnt))
                continue
            f = fields.get(col if case_sensitive else col.lower())
            if f is None or (col if case_sensitive
                             else col.lower()) in ambiguous:
                return None
            st = f.dataType.simpleString()
            out = alias or f"{fn}({col})"
            has_default = defaults.get(f.name) is not None
            if fn == "cntd" and f.name not in range_set:
                return None  # data-column DISTINCT needs a real scan
            if f.name in range_set and fn in ("cntd", "min", "max"):
                # desc-materialized values per group (a group keyed by
                # a SUBSET of the partition columns may span descs)
                pk_fn = self._PART_VALUE_KEYS.get(st)
                if pk_fn is None:
                    return None
                if fn == "cntd":
                    out = alias or f"count(DISTINCT {col})"

                def _pvals(gf, _c=f.name, _k=pk_fn):
                    prows = self._part_rows_by_desc(gf)
                    if prows is None:
                        return None
                    raw = {part_enc.parse_desc(d).get(_c)
                           for d, n in prows.items() if n > 0} - {None}
                    try:
                        # typed: duplicate desc encodings collapse
                        return {_k(v) for v in raw}
                    except (TypeError, ValueError):
                        return None

                if fn == "cntd":
                    def _cd(key, gf, _pv=_pvals):
                        vals = _pv(gf)
                        return _REFUSE if vals is None else len(vals)
                    specs.append((cname, "bigint", None, out, _cd))
                    continue

                def _mmd(key, gf, _fn=fn, _pv=_pvals):
                    vals = _pv(gf)
                    if vals is None:
                        return _REFUSE
                    if not vals:
                        return None  # no live rows in scope: SQL NULL
                    return str((min if _fn == "min" else max)(vals))
                specs.append((cname, "string", st, out, _mmd))
                continue
            if fn == "count":
                # COUNT(col): per-file nonnull counts; range-partition
                # columns count via the group's descs (non-sentinel
                # partitions contribute num_rows)
                if f.name in range_set:
                    def _cntp(key, gf, _c=f.name):
                        total = 0
                        for ff in gf:
                            if ff.num_rows < 0:
                                return _REFUSE
                            v = part_enc.parse_desc(
                                ff.partition_desc).get(_c)
                            total += ff.num_rows if v is not None else 0
                        return total
                    specs.append((cname, "bigint", None, out, _cntp))
                    continue

                def _cntc(key, gf, _c=f.name, _d=has_default):
                    n = LakeSoulTable._count_col_files(gf, _c, _d)
                    return _REFUSE if n is None else int(n)
                specs.append((cname, "bigint", None, out, _cntc))
                continue
            if fn == "avg":
                if f.name in range_set:
                    # desc-derived per group: Σ value×rows / Σ rows,
                    # exact under the 2^53 Σ|value| bound (int family)
                    if st not in LakeSoulTable._SUM_EXACT_TYPES:
                        return None
                    pk_fn2 = self._PART_VALUE_KEYS.get(st)
                    if pk_fn2 is None:
                        return None

                    def _avgp(key, gf, _c=f.name, _k=pk_fn2):
                        r = self._part_sum_files(gf, _c, _k)
                        if r is None or r[2] >= 2 ** 53:
                            return _REFUSE
                        total, nonnull, _b = r
                        if nonnull == 0:
                            return None  # all rows NULL: SQL NULL
                        return repr(float(total) / nonnull)
                    specs.append((cname, "string", "double", out,
                                  _avgp))
                    continue
                if st.startswith("decimal("):
                    # exact per-group decimal AVG (result type
                    # decimal(p+4,s+4) HALF_UP; proof in
                    # _avg_dec_files); the p≤34 type gate is
                    # group-independent — check it once here
                    if int(st[len("decimal("):-1].split(",")[0]) > 34:
                        return None
                    drt = Catalog._avg_dec_result_type(st)

                    def _avgd(key, gf, _c=f.name, _d=has_default,
                              _st=st):
                        r = LakeSoulTable._avg_dec_files(
                            gf, _c, _d, _st)
                        if r is None:
                            return _REFUSE
                        return r[0]
                    specs.append((cname, "string", drt, out, _avgd))
                    continue
                # integer family, with the per-group 2^53
                # double-accumulation proof (see _avg_files)
                if st not in LakeSoulTable._SUM_EXACT_TYPES:
                    return None

                def _avg(key, gf, _c=f.name, _d=has_default):
                    r = LakeSoulTable._avg_files(gf, _c, _d)
                    if r is None:
                        return _REFUSE
                    # repr round-trips through the string→double cast
                    return None if r[0] is None else repr(r[0])
                specs.append((cname, "string", "double", out, _avg))
                continue
            if fn == "sum":
                if f.name in range_set:
                    # desc-derived per group: Σ value×rows (int
                    # family; shared overflow bound via _sum_render)
                    if st not in LakeSoulTable._SUM_EXACT_TYPES:
                        return None
                    pk_fn2 = self._PART_VALUE_KEYS.get(st)
                    if pk_fn2 is None:
                        return None

                    def _sump(key, gf, _c=f.name, _k=pk_fn2):
                        r = self._part_sum_files(gf, _c, _k)
                        rr = r and self._sum_render((r[0], r[1]),
                                                    "bigint")
                        if not rr:
                            return _REFUSE
                        return rr[0]
                    specs.append((cname, "string",
                                  self._sum_result_type(st), out,
                                  _sump))
                    continue
                if not (st in LakeSoulTable._SUM_EXACT_TYPES
                        or st.startswith("decimal(")):
                    return None
                rt = self._sum_result_type(st)

                def _sum(key, gf, _c=f.name, _st=st, _d=has_default):
                    res = LakeSoulTable._sum_files(gf, _c, _d)
                    if res is None:
                        return _REFUSE
                    r = self._sum_render(res, _st)
                    return _REFUSE if r is None else r[0]
                specs.append((cname, "string", rt, out, _sum))
                continue
            mm_kind = ("str" if st == "string"
                       else "dec" if st.startswith("decimal(")
                       else "flt" if st in ("float", "double")
                       else None)
            if mm_kind is not None and fn in ("min", "max"):
                # exact extrema recorded by the writer from the
                # column VALUES (footer string stats may be truncated
                # prefixes, float footer stats may omit NaN — valid
                # bounds, never claimed extrema)
                def _mms(key, gf, _c=f.name, _fn=fn, _d=has_default,
                         _k=mm_kind):
                    mm = LakeSoulTable._minmax_exact_files(
                        gf, _c, _d, _k)
                    if mm is None:
                        return _REFUSE
                    v = mm[0 if _fn == "min" else 1]
                    if v is None:
                        return None  # provably all-null: SQL NULL
                    if _k == "flt":
                        return _flt_sql_str(v)
                    return str(v) if _k == "dec" else v
                specs.append((
                    cname, "string",
                    None if mm_kind == "str" else st, out, _mms))
                continue
            # min/max: exact-stats types only
            if st not in LakeSoulTable._MINMAX_EXACT_TYPES:
                return None

            def _mm(key, gf, _c=f.name, _fn=fn,
                    _z=(st == "timestamp")):
                mm = LakeSoulTable._minmax_files(gf, _c)
                if mm is None:
                    return _REFUSE
                v = str(mm[0 if _fn == "min" else 1])
                # naive-UTC ISO carrier + Z suffix: the string→
                # timestamp cast honors the zone, so the instant is
                # session-timezone-independent
                return v + "Z" if _z else v
            specs.append((cname, "string", st, out, _mm))

        order_spec = None
        if oby_txt:
            order_spec = self._parse_order_by(
                oby_txt, specs, case_sensitive, extra=order_extra)
            if order_spec is None:
                return None  # unrepresentable ORDER BY: fall back
        hav_pred = None
        if hav_ast is not None:
            hav_pred = self._hav_predicate(hav_ast, specs)
            if hav_pred is None:
                return None  # no provable comparison domain: fall back

        rows = []
        for key in sorted(groups,
                          key=lambda k: tuple((v is None, str(v))
                                              for v in k)):
            gf = groups[key]
            row = []
            for _, _, _, _, fv in specs:
                v = (fv(key, gf, row)
                     if getattr(fv, "_needs_row", False)
                     else fv(key, gf))
                if v is _REFUSE:
                    return None
                row.append(v)
            rows.append(tuple(row))

        if hav_pred is not None:
            # SQL filter semantics: a group survives only on TRUE
            # (Kleene 3-valued — NULL comparisons drop the row), and
            # HAVING applies BEFORE ORDER BY / LIMIT
            rows = [r for r in rows if hav_pred(r) is True]

        if order_spec is not None:
            # typed driver-side ORDER BY over the (≤MAX_LOCAL_ROWS)
            # group rows: layered stable sorts, last item first
            for idx, key_fn, desc, nulls_first in reversed(order_spec):
                nb = (1 if nulls_first else 0) if desc \
                    else (0 if nulls_first else 1)

                def level_key(r, _i=idx, _k=key_fn, _nb=nb):
                    v = _k(r[_i])
                    if v is None:
                        return (_nb, 0)
                    return (1 - _nb, v)
                try:
                    rows.sort(key=level_key, reverse=desc)
                except TypeError:
                    return None  # unorderable carrier: fall back
        if m.group("lim") is not None:
            # LIMIT without ORDER BY keeps the deterministic group
            # order — any n rows are a valid relational answer
            rows = rows[:int(m.group("lim"))]

        pdf = local_df(
            spark, rows,
            ", ".join(f"`{c}` {carrier}" for c, carrier, *_ in specs),
        )
        sel = []
        for c, carrier, cast_to, out, _fv in specs[:n_visible]:
            e = F.col(f"`{c}`")
            if cast_to is not None:
                e = e.cast(cast_to)
            if carrier != "bigint":
                # group keys and MIN/MAX/SUM/AVG are nullable=True in
                # the relational plan (parquet scan columns and
                # aggregates over them); the LocalRelation carrier may
                # analyze non-nullable when no group happens to hold a
                # NULL, so add nullability with an identity nullif
                # (still collapses to LocalTableScan).
                e = F.nullif(e, F.lit(None))
            else:
                # COUNT rides the bigint carrier and is non-nullable
                # relationally; a ZERO-group result materializes as an
                # empty LocalRelation whose columns analyze nullable —
                # coalesce is a no-op on values (COUNT is never NULL)
                # that pins the schema to the relational one
                e = F.coalesce(e, F.lit(0).cast("bigint"))
            sel.append(e.alias(out))
        return pdf.select(*sel)

    _ORDER_ITEM_RE = re.compile(
        r"^`?(\w+)`?(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?$",
        re.I,
    )
    # carrier-string → typed python sort key per result type family;
    # ISO date/timestamp strings and UTF-8 strings already sort in
    # value order (python str compares by codepoint == UTF-8 bytes)
    _ORDER_KEY_CASTS = {
        "tinyint": int, "smallint": int, "int": int, "integer": int,
        "bigint": int, "long": int,
        "date": str, "timestamp": str, "timestamp_ntz": str,
        "string": str, "double": _dbl_order_key,
        "float": _dbl_order_key,
    }

    @classmethod
    def _parse_order_by(cls, text: str, specs, case_sensitive,
                        extra: dict | None = None):
        """ORDER BY items resolved against the SELECT output columns →
        ``[(row_index, key_fn, desc, nulls_first)]``, or ``None`` for
        anything not exactly representable (expressions, ordinals,
        non-output columns, unorderable types) — the caller falls back
        to the relational path. Spark defaults: ASC + NULLS FIRST;
        DESC + NULLS LAST. ``extra`` maps placeholder names (from
        :meth:`_rewrite_order_aggs` — aggregate items resolved to
        possibly-hidden spec indexes) straight to spec positions."""
        import decimal

        by_name = {}
        for i, (cname, carrier, cast_to, out, _fv) in enumerate(specs):
            if out.startswith("__"):
                # hidden machinery items (__havN/__hxN): reachable
                # only via ``extra`` placeholders — a user-written
                # ORDER BY naming one is an unresolved column in the
                # relational plan and must refuse, never resolve here
                continue
            key = out if case_sensitive else out.lower()
            if key in by_name:
                by_name[key] = None  # ambiguous output name: refuse
            else:
                by_name[key] = (i, carrier, cast_to)
        out_spec = []
        for item in (s.strip() for s in text.split(",")):
            im = cls._ORDER_ITEM_RE.match(item)
            if im is None or im.group(1).isdigit():
                return None
            if extra and im.group(1) in extra:
                i2 = extra[im.group(1)]
                hit = (i2, specs[i2][1], specs[i2][2])
            else:
                ref = (im.group(1) if case_sensitive
                       else im.group(1).lower())
                hit = by_name.get(ref)
            if hit is None:
                return None
            i, carrier, cast_to = hit
            rt = (cast_to or carrier).lower()
            if rt.startswith("decimal("):
                def key_fn(v):
                    return None if v is None else decimal.Decimal(str(v))
            else:
                conv = cls._ORDER_KEY_CASTS.get(rt)
                if conv is None:
                    return None
                def key_fn(v, _c=conv):
                    return None if v is None else _c(v)
            desc = (im.group(2) or "").upper() == "DESC"
            nf = im.group(3)
            nulls_first = (not desc) if nf is None \
                else nf.upper() == "FIRST"
            out_spec.append((i, key_fn, desc, nulls_first))
        return out_spec or None

    # ------------------------------------------------- HAVING tails
    # (r13) HAVING on the GROUP BY fast path: atoms are
    # <operand> <cmp> <literal> / <operand> IS [NOT] NULL — plus
    # (r14) <operand> [NOT] BETWEEN <lit> AND <lit> and <operand>
    # [NOT] IN (<lit>, …), both desugared onto the cmp machinery —
    # composed with AND/OR/NOT and parentheses; operands are grouping
    # columns, output aliases, or aggregate expressions of the
    # provable family (Spark resolves ALL of these — measured —
    # computing unselected aggregates as hidden columns, which is
    # exactly what the hidden ``parsed`` items replicate). Anything
    # else refuses → relational.

    _HAV_LIT_INT = re.compile(r"^[+-]?\d+$")
    _HAV_LIT_DEC = re.compile(r"^[+-]?(\d+\.\d*|\.\d+)$")
    _HAV_LIT_DBL = re.compile(
        r"^[+-]?(\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+[dD]?|[dD])$")
    _HAV_LIT_STR = re.compile(r"^'([^'\\]*)'$", re.S)
    _HAV_CMP_RE = re.compile(
        r"^(?P<lhs>.+?)\s*(?P<op><=|>=|<>|!=|==|=|<|>)\s*(?P<lit>.+)$",
        re.S)
    _HAV_NULL_RE = re.compile(
        r"^(?P<lhs>.+?)\s+IS\s+(?P<neg>NOT\s+)?NULL$", re.I | re.S)
    # r14: BETWEEN / IN-list atoms — desugared onto the cmp machinery
    _HAV_BETWEEN_RE = re.compile(
        r"^(?P<lhs>.+?)\s+(?P<neg>NOT\s+)?BETWEEN\s+(?P<lo>.+?)"
        r"\s+AND\s+(?P<hi>.+)$", re.I | re.S)
    _HAV_IN_RE = re.compile(
        r"^(?P<lhs>.+?)\s+(?P<neg>NOT\s+)?IN\s*\((?P<list>.*)\)$",
        re.I | re.S)

    _HAV_LIT_DATE = re.compile(r"^DATE\s+'(\d{4}-\d{2}-\d{2})'$",
                               re.I)

    @classmethod
    def _hav_literal(cls, lit: str):
        """``(kind, value)`` of one comparison literal — exact
        (int/bare-fractional, Spark parses those as DECIMALS),
        double (scientific / D-suffixed), date (``DATE '…'`` in the
        strict zero-padded ISO form — looser spellings refuse to the
        fallback, which applies Spark's own cast), or str — ``None``
        outside the grammar (escapes, column references)."""
        lit = lit.strip()
        if cls._HAV_LIT_INT.match(lit) or cls._HAV_LIT_DEC.match(lit):
            return ("exact", lit)
        if cls._HAV_LIT_DBL.match(lit):
            return ("double", lit.rstrip("dD"))
        dm = cls._HAV_LIT_DATE.match(lit)
        if dm is not None:
            return ("date", dm.group(1))
        sm = cls._HAV_LIT_STR.match(lit)
        if sm is None:
            return None
        return ("str", sm.group(1))

    @staticmethod
    def _parsed_out_name(p) -> str:
        """Output name of one parsed item — the spec loop's auto-alias
        formula, shared so HAVING/ORDER BY resolution and the built
        specs can never disagree."""
        if p[0] == "group":
            return p[2]
        _, fn, col, alias = p
        if alias:
            return alias
        if fn == "count" and col is None:
            return "count(1)"
        if fn == "cntd":
            return f"count(DISTINCT {col})"
        return f"{fn}({col})"

    def _resolve_having_operand(self, text: str, parsed: list,
                                gcols: list, case_sensitive: bool,
                                rset: dict, ambiguous) -> int | None:
        """Operand text → index into ``parsed`` (appending a HIDDEN
        item for an expression not in the SELECT); ``None`` = outside
        the grammar (caller falls back). Resolution order mirrors
        Spark: grouping columns and aggregate expressions first, then
        output aliases; an operand matching two outputs refuses (the
        relational path would raise AMBIGUOUS_REFERENCE — never
        answer a statement Spark itself rejects)."""
        text = text.strip()
        im = self._META_AGG_RE.match(text)
        if im is not None:
            if im.group(1) or im.group(4) or im.group(6):
                return None  # an alias inside an operand is not SQL
            if im.group(5):
                fnk, col = "cntd", im.group(5)
            elif im.group(2):
                fnk, col = im.group(2).lower(), im.group(3)
            else:
                fnk, col = "count", None
            colk = (col if case_sensitive or col is None
                    else col.lower())
            for i, p in enumerate(parsed):
                if p[0] != "agg" or p[1] != fnk:
                    continue
                pk = (p[2] if case_sensitive or p[2] is None
                      else p[2].lower())
                if pk == colk:
                    return i
            parsed.append(("agg", fnk, col, f"__hav{len(parsed)}"))
            return len(parsed) - 1
        bm = self._BARE_COL_RE.match(text)
        if bm is None or bm.group(2) or bm.group(1).isdigit():
            return None
        key = bm.group(1) if case_sensitive else bm.group(1).lower()
        if key in ambiguous:
            return None
        rc = rset.get(key)
        if rc is not None and rc in gcols:
            for i, p in enumerate(parsed):
                if p[0] == "group" and p[1] == rc:
                    return i
            parsed.append(("group", rc, f"__hav{len(parsed)}"))
            return len(parsed) - 1
        if key.startswith("__"):
            # hidden machinery names (__havN/__hxN) are not user
            # addressables — an operand spelling one is an unresolved
            # column in the relational plan (and a user alias that
            # happens to start with '__' refuses into the fallback,
            # which resolves it itself)
            return None
        hits = [i for i, p in enumerate(parsed)
                if (self._parsed_out_name(p) if case_sensitive
                    else self._parsed_out_name(p).lower()) == key]
        return hits[0] if len(hits) == 1 else None

    # ------------------------------------- arithmetic operand exprs
    # (r15) HAVING / ORDER BY items may be ARITHMETIC over provable
    # operands — ratios and sums of aggregates (sum(a)/count(*),
    # sum(a)+sum(b)-count(*), avg chains) and comparisons between two
    # operands — all derivable from the recorded exact stats. The
    # replicated Spark 4.1 semantics (measured):
    #   - int-family ÷ int-family and anything involving double is
    #     DOUBLE IEEE arithmetic (bigint/bigint division IS double
    #     division: float(a)/float(b) bit-for-bit);
    #   - int-family +/- promotes to the wider operand type and, under
    #     ANSI, ERRORS on overflow — a value outside the result type's
    #     range REFUSES the statement so the relational path raises;
    #   - division by zero ERRORS under ANSI — same refusal;
    #   - decimal/float operands refuse (decimal precision algebra and
    #     float32 rounding are not replicated — fall back);
    #   - NULL operands propagate to NULL (dropped by HAVING, ordered
    #     by the NULLS clause).

    _INT_ARITH_BOUNDS = {
        "tinyint": 1 << 7, "smallint": 1 << 15, "int": 1 << 31,
        "integer": 1 << 31, "bigint": 1 << 63, "long": 1 << 63,
    }

    @classmethod
    def _split_arith(cls, text: str) -> list | None:
        """``"sum(a)/count(*) + x"`` → ``["sum(a)", "/", "count(*)",
        "+", "x"]`` split at depth-0 unquoted +, -, / — ``None`` when
        there is no operator (not an expression) or a piece is empty
        (unary signs, trailing operators: refuse)."""
        parts, buf, depth, i, n = [], "", 0, 0, len(text)
        in_q = False
        while i < n:
            c = text[i]
            if in_q:
                buf += c
                in_q = c != "'"
            elif c == "'":
                buf += c
                in_q = True
            elif c == "(":
                depth += 1
                buf += c
            elif c == ")":
                depth -= 1
                buf += c
            elif depth == 0 and c in "+-/":
                if not buf.strip():
                    return None  # unary / doubled operator
                parts += [buf.strip(), c]
                buf = ""
            else:
                buf += c
            i += 1
        if depth != 0 or in_q or not buf.strip() or len(parts) < 2:
            return None
        parts.append(buf.strip())
        return parts

    def _resolve_operand_expr(self, text: str, parsed: list,
                              gcols: list, case_sensitive: bool,
                              rset: dict, ambiguous,
                              visible_only: int | None = None
                              ) -> int | None:
        """Operand text → index into ``parsed``: a simple operand via
        :meth:`_resolve_having_operand`, else an ARITHMETIC expression
        over simple operands appended as a hidden ``("expr", node)``
        item (node = leaf index | ("arith", op, l, r), '/' binding
        tighter than +/-, left-associative). ``visible_only`` bounds
        every LEAF to the SELECT items — the measured Spark-4.1 rule
        for aggregate-expression ORDER BY items, whose leaves must
        resolve against the project output (an unselected aggregate
        leaf is an analyzer error the fallback reproduces)."""
        idx = self._resolve_having_operand(
            text, parsed, gcols, case_sensitive, rset, ambiguous)
        if idx is not None:
            if visible_only is not None and idx >= visible_only:
                return None
            return idx
        parts = self._split_arith(text)
        if parts is None:
            return None
        leaves = []
        for j in range(0, len(parts), 2):
            li = self._resolve_having_operand(
                parts[j], parsed, gcols, case_sensitive, rset,
                ambiguous)
            if li is None or (visible_only is not None
                              and li >= visible_only):
                return None
            leaves.append(li)
        # precedence: fold '/' chains into terms first, then +/-
        terms: list = [leaves[0]]
        ops: list = []
        for j, op in enumerate(parts[1::2]):
            nxt = leaves[j + 1]
            if op == "/":
                terms[-1] = ("arith", "/", terms[-1], nxt)
            else:
                ops.append(op)
                terms.append(nxt)
        node = terms[0]
        for op, t in zip(ops, terms[1:]):
            node = ("arith", op, node, t)
        parsed.append(("expr", node, None, f"__hx{len(parsed)}"))
        return len(parsed) - 1

    @classmethod
    def _arith_result_type(cls, op: str, lt: str, rt: str):
        """Spark's result type for one arithmetic step, or ``None``
        for any pairing outside the replicated set (decimals, float32,
        strings, dates — fall back)."""
        ints = cls._INT_ARITH_BOUNDS
        num = lambda t: t in ints or t == "double"  # noqa: E731
        if not (num(lt) and num(rt)):
            return None
        if op == "/" or lt == "double" or rt == "double":
            return "double"
        return lt if ints[lt] >= ints[rt] else rt

    def _expr_spec(self, node, specs):
        """Spec entry pieces for an ``("expr", node)`` parsed item:
        ``(carrier, cast_to, value_fn)`` with the value_fn taking the
        row-so-far (leaf indices are always lower — operands resolve
        before the expr is appended), or ``None`` when any type step
        is outside the replicated arithmetic."""
        def ntype(nd):
            if isinstance(nd, int):
                return (specs[nd][2] or specs[nd][1]).lower()
            _, op, l, r = nd
            lt, rt = ntype(l), ntype(r)
            if lt is None or rt is None:
                return None
            return self._arith_result_type(op, lt, rt)

        rt = ntype(node)
        if rt is None:
            return None
        ints = self._INT_ARITH_BOUNDS

        def ev(nd, row):
            if isinstance(nd, int):
                v = row[nd]
                if v is None or v is _REFUSE:
                    return v
                t = (specs[nd][2] or specs[nd][1]).lower()
                return float(v) if t == "double" else int(v)
            _, op, l, r = nd
            lv, rv = ev(l, row), ev(r, row)
            if lv is _REFUSE or rv is _REFUSE:
                return _REFUSE
            if lv is None or rv is None:
                return None
            t = ntype(nd)
            if t == "double":
                lf, rf = float(lv), float(rv)
                if op == "/":
                    if rf == 0.0:
                        # ANSI DIVIDE_BY_ZERO: the relational path
                        # raises — never answer what Spark rejects
                        return _REFUSE
                    return lf / rf
                return lf + rf if op == "+" else lf - rf
            res = lv + rv if op == "+" else lv - rv
            if not (-ints[t] <= res < ints[t]):
                return _REFUSE  # ANSI overflow: the fallback raises
            return res

        carrier = "string" if rt == "double" else "bigint"
        cast_to = "double" if rt == "double" else (
            None if rt in ("bigint", "long") else rt)

        def fv(key, gf, row):
            v = ev(node, row)
            if v is _REFUSE or v is None:
                return v
            return repr(v) if rt == "double" else int(v)

        fv._needs_row = True
        return carrier, cast_to, fv

    @staticmethod
    def _hav_tokens(text: str) -> list | None:
        """HAVING text → tokens: LP/RP (top-level grouping parens),
        AND/OR/NOT keywords, and ATOM runs. Parens inside an already-
        started atom (``count(*)``) and anything inside quotes stay in
        the atom; an unbalanced tail returns None."""
        toks: list = []
        buf = ""
        depth = 0
        i, n = 0, len(text)

        def flush():
            nonlocal buf
            if buf.strip():
                toks.append(("ATOM", buf.strip()))
            buf = ""

        while i < n:
            c = text[i]
            if c == "'":
                j = text.find("'", i + 1)
                if j < 0:
                    return None
                buf += text[i:j + 1]
                i = j + 1
                continue
            if c == "(":
                if not buf.strip():
                    flush()
                    toks.append(("LP", "("))
                else:
                    depth += 1
                    buf += c
                i += 1
                continue
            if c == ")":
                if depth == 0:
                    flush()
                    toks.append(("RP", ")"))
                else:
                    depth -= 1
                    buf += c
                i += 1
                continue
            if depth == 0:
                mkw = re.match(r"(AND|OR|NOT)\b", text[i:], re.I)
                if mkw and (i == 0 or not (text[i - 1].isalnum()
                                           or text[i - 1] == "_")):
                    kw = mkw.group(1).upper()
                    # a NOT after atom text belongs to the atom (`IS
                    # NOT NULL`, `NOT BETWEEN`, `NOT IN`): boolean NOT
                    # only ever starts a factor, where the buffer is
                    # empty (r14)
                    if kw == "NOT" and buf.strip():
                        buf += mkw.group(1)
                        i += len(mkw.group(1))
                        continue
                    # the first AND after an unclosed BETWEEN is the
                    # range separator, not a boolean conjunction
                    # (quoted spans stripped so a 'BETWEEN' inside a
                    # string literal can't absorb a real AND) (r14)
                    if kw == "AND" and re.search(
                            r"\bBETWEEN\b(?!.*\bAND\b)",
                            re.sub(r"'[^']*'", "", buf),
                            re.I | re.S):
                        buf += mkw.group(1)
                        i += len(mkw.group(1))
                        continue
                    flush()
                    toks.append((kw, mkw.group(1)))
                    i += len(mkw.group(1))
                    continue
            buf += c
            i += 1
        if depth != 0:
            return None
        flush()
        return toks

    def _parse_having_text(self, text, parsed, gcols, case_sensitive,
                           rset, ambiguous):
        toks = self._hav_tokens(text)
        if toks is None:
            return None
        ctx = (parsed, gcols, case_sensitive, rset, ambiguous)
        ast, pos = self._hav_expr(toks, 0, ctx)
        if ast is None or pos != len(toks):
            return None
        return ast

    def _hav_expr(self, toks, pos, ctx):
        left, pos = self._hav_term(toks, pos, ctx)
        if left is None:
            return None, pos
        while pos < len(toks) and toks[pos][0] == "OR":
            right, pos = self._hav_term(toks, pos + 1, ctx)
            if right is None:
                return None, pos
            left = ("or", left, right)
        return left, pos

    def _hav_term(self, toks, pos, ctx):
        left, pos = self._hav_factor(toks, pos, ctx)
        if left is None:
            return None, pos
        while pos < len(toks) and toks[pos][0] == "AND":
            right, pos = self._hav_factor(toks, pos + 1, ctx)
            if right is None:
                return None, pos
            left = ("and", left, right)
        return left, pos

    def _hav_factor(self, toks, pos, ctx):
        if pos >= len(toks):
            return None, pos
        kind, _val = toks[pos]
        if kind == "NOT":
            inner, pos = self._hav_factor(toks, pos + 1, ctx)
            if inner is None:
                return None, pos
            return ("not", inner), pos
        if kind == "LP":
            inner, pos = self._hav_expr(toks, pos + 1, ctx)
            if (inner is None or pos >= len(toks)
                    or toks[pos][0] != "RP"):
                return None, pos
            return inner, pos + 1
        if kind == "ATOM":
            atom = self._hav_atom(_val, ctx)
            if atom is None:
                return None, pos
            return atom, pos + 1
        return None, pos

    def _hav_atom(self, text, ctx):
        parsed, gcols, case_sensitive, rset, ambiguous = ctx

        def resolve(lhs):
            # r15: operands may be arithmetic over simple operands
            return self._resolve_operand_expr(
                lhs, parsed, gcols, case_sensitive, rset, ambiguous)

        nm = self._HAV_NULL_RE.match(text)
        if nm is not None:
            idx = resolve(nm.group("lhs"))
            if idx is None:
                return None
            return ("null", idx, bool(nm.group("neg")))
        cm = self._HAV_CMP_RE.match(text)
        cm_saved = cm
        if cm is not None:
            lit = self._hav_literal(cm.group("lit"))
            if lit is None:
                # escapes/columns fall back — but first let the
                # BETWEEN/IN matchers below try the atom: a string
                # literal CONTAINING an operator char (p IN ('a=b'),
                # x BETWEEN 'a<b' AND 'z') greedily matches the CMP
                # regex with a truncated "literal", while the
                # quote-aware matchers parse it whole; an
                # operand-shaped RHS (sum(a) > sum(b)) is retried as
                # an operand comparison after those
                cm = None
            else:
                idx = resolve(cm.group("lhs"))
                if idx is None:
                    return None
                op = cm.group("op")
                op = "!=" if op == "<>" else ("=" if op == "==" else op)
                return ("cmp", idx, op, *lit)
        bm = self._HAV_BETWEEN_RE.match(text)
        if bm is not None:
            # Spark itself desugars Between(a,l,u) to a>=l AND a<=u
            # with each comparison coerced INDEPENDENTLY — exactly
            # this AST, so mixed-kind bounds need no guard
            lo = self._hav_literal(bm.group("lo"))
            hi = self._hav_literal(bm.group("hi"))
            if lo is None or hi is None:
                return None
            idx = resolve(bm.group("lhs"))
            if idx is None:
                return None
            ast = ("and", ("cmp", idx, ">=", *lo),
                   ("cmp", idx, "<=", *hi))
            return ("not", ast) if bm.group("neg") else ast
        im = self._HAV_IN_RE.match(text)
        if im is not None:
            parts = _split_top(im.group("list"))
            if not parts:
                return None  # IN () is a Spark parse error — surface it
            lits = [self._hav_literal(p) for p in parts]
            if any(lt is None for lt in lits):
                return None
            if len({k for k, _v in lits}) > 1:
                # Spark coerces the WHOLE in-list + operand to one
                # common type; a mixed exact+double list collapses
                # int operands past 2^53 where per-element domains
                # would not — refuse rather than risk divergence
                return None
            idx = resolve(im.group("lhs"))
            if idx is None:
                return None
            ast = ("cmp", idx, "=", *lits[0])
            for lt in lits[1:]:
                ast = ("or", ast, ("cmp", idx, "=", *lt))
            # x NOT IN (a, b) ≡ NOT(x = a OR x = b), Kleene-exact:
            # a NULL operand stays NULL through the negation
            return ("not", ast) if im.group("neg") else ast
        if cm_saved is not None:
            # r15: comparison between two OPERANDS (sum(a) > sum(b),
            # sum(a)+sum(b) > count(*)) — both sides resolve as
            # (possibly arithmetic) operand expressions
            ridx = resolve(cm_saved.group("lit"))
            if ridx is None:
                return None
            lidx = resolve(cm_saved.group("lhs"))
            if lidx is None:
                return None
            op = cm_saved.group("op")
            op = "!=" if op == "<>" else ("=" if op == "==" else op)
            return ("cmpop", lidx, op, ridx)
        return None

    @staticmethod
    def _hav_predicate(ast, specs):
        """AST → row predicate returning Kleene True/False/None (a
        group survives only on TRUE), or ``None`` when an operand's
        type has no provable comparison domain. Domains replicate
        Spark's coercions (measured): fractional literals are
        DECIMALS (exact against int/decimal operands); scientific /
        D-suffixed literals and float/double operands force the
        DOUBLE domain, where ``_dbl_order_key`` reproduces Spark's
        NaN-above-everything comparison semantics (``NaN = NaN`` is
        true, ``NaN > 1e308`` is true) and ``float(Decimal)`` is the
        same correctly-rounded cast Spark applies; strings compare
        binary (codepoint == UTF-8 byte order)."""
        import decimal

        _OPS = {
            "=": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
        }
        _INTS = ("tinyint", "smallint", "int", "integer", "bigint",
                 "long")

        def build(node):
            tag = node[0]
            if tag in ("and", "or"):
                lf, rf = build(node[1]), build(node[2])
                if lf is None or rf is None:
                    return None
                if tag == "and":
                    def f(row, _l=lf, _r=rf):
                        a, b = _l(row), _r(row)
                        if a is False or b is False:
                            return False
                        if a is None or b is None:
                            return None
                        return True
                else:
                    def f(row, _l=lf, _r=rf):
                        a, b = _l(row), _r(row)
                        if a is True or b is True:
                            return True
                        if a is None or b is None:
                            return None
                        return False
                return f
            if tag == "not":
                inner = build(node[1])
                if inner is None:
                    return None

                def f(row, _i=inner):
                    v = _i(row)
                    return None if v is None else (not v)
                return f
            if tag == "null":
                _, idx, neg = node

                def f(row, _i=idx, _n=neg):
                    isnull = row[_i] is None
                    return (not isnull) if _n else isnull
                return f
            if tag == "cmpop":
                # r15: comparison between two OPERANDS — a common
                # comparison domain must be provable for both result
                # types (exact↔exact compares as DECIMAL, any double
                # forces the IEEE domain with NaN-above-everything,
                # string↔string binary, date↔date as dates — mixed
                # families refuse to the relational coercion)
                _, li, op, ri = node
                lrt = (specs[li][2] or specs[li][1]).lower()
                rrt = (specs[ri][2] or specs[ri][1]).lower()

                def dom(rt0):
                    if rt0 in _INTS or rt0.startswith("decimal("):
                        return "exact"
                    if rt0 in ("double", "float"):
                        return "double"
                    return rt0
                ld, rd = dom(lrt), dom(rrt)
                if {ld, rd} <= {"exact", "double"}:
                    if "double" in (ld, rd):
                        def conv2(v):
                            return _dbl_order_key(float(v))
                    else:
                        def conv2(v):
                            return decimal.Decimal(str(v))
                elif ld == rd == "string":
                    conv2 = str
                elif ld == rd == "date":
                    import datetime as _dt

                    def conv2(v):
                        return _dt.date.fromisoformat(str(v))
                else:
                    return None

                def f(row, _l=li, _r=ri, _c=conv2, _op=_OPS[op]):
                    a, b = row[_l], row[_r]
                    if a is None or b is None:
                        return None
                    return _op(_c(a), _c(b))
                return f
            _, idx, op, lk, lv = node
            rt = (specs[idx][2] or specs[idx][1]).lower()
            if rt == "date" and lk in ("str", "date"):
                # strict zero-padded ISO literal only — Spark's cast
                # also accepts loose forms ('2024-1-2'), which refuse
                # into the fallback rather than risk a different parse
                import datetime as _dt
                try:
                    lit = _date_desc(lv)
                except ValueError:
                    return None

                def conv(v):
                    return _dt.date.fromisoformat(str(v))
            elif lk == "date":
                return None  # a DATE literal against a non-date operand
            elif lk == "str":
                if rt != "string":
                    return None
                conv, lit = str, lv
            elif rt in ("double", "float") or lk == "double":
                if not (rt in ("double", "float") or rt in _INTS
                        or rt.startswith("decimal(")):
                    return None

                def conv(v):
                    return _dbl_order_key(float(v))
                lit = _dbl_order_key(float(lv))
            elif rt in _INTS or rt.startswith("decimal("):
                def conv(v):
                    return decimal.Decimal(str(v))
                lit = decimal.Decimal(lv)
            else:
                return None  # dates/timestamps: fall back

            def f(row, _i=idx, _c=conv, _lit=lit, _op=_OPS[op]):
                v = row[_i]
                if v is None:
                    return None  # SQL: comparison with NULL = unknown
                return _op(_c(v), _lit)
            return f

        return build(ast)

    def _rewrite_order_aggs(self, text, parsed, gcols, case_sensitive,
                            rset, ambiguous, extra: dict,
                            n_visible: int | None = None):
        """ORDER BY tail with AGGREGATE (or r15: ARITHMETIC) items
        resolved to (possibly hidden) spec positions — Spark sorts by
        the aggregate value whether or not it is selected, and by
        arithmetic over SELECTED outputs (an expression with an
        unselected aggregate leaf is an analyzer error — measured —
        so expression leaves are bounded to the first ``n_visible``
        items and anything past that refuses into the fallback, which
        reproduces the error). Rewrites each such item to a
        placeholder recorded in ``extra`` (auto-named outputs like
        ``sum(x)`` are not word-shaped, so a textual rewrite to the
        output name could not resolve); plain items pass through.
        ``None`` = outside the grammar."""
        out_items = []
        for item in _split_top(text):
            item = item.strip()
            if self._ORDER_ITEM_RE.match(item):
                out_items.append(item)
                continue
            sm = re.match(r"^(?P<body>.+?)(?P<suf>(?:\s+(?:ASC|DESC))?"
                          r"(?:\s+NULLS\s+(?:FIRST|LAST))?)$",
                          item, re.I | re.S)
            body = sm.group("body").strip()
            if self._META_AGG_RE.match(body) is not None:
                idx = self._resolve_having_operand(
                    body, parsed, gcols, case_sensitive, rset,
                    ambiguous)
            else:
                idx = self._resolve_operand_expr(
                    body, parsed, gcols, case_sensitive, rset,
                    ambiguous, visible_only=n_visible)
                if idx is not None and parsed[idx][0] != "expr":
                    # a plain non-agg body (e.g. a bare alias the
                    # ORDER_ITEM regex already covers, or a grouping
                    # column) gained nothing here — keep the strict
                    # grammar: only genuine expressions pass
                    return None
            if idx is None:
                return None
            ph = f"__ob{len(extra)}"
            extra[ph] = idx
            out_items.append(ph + sm.group("suf"))
        return ", ".join(out_items)

    @staticmethod
    def _sum_checked(t, snap, cname: str, st: str):
        """:meth:`_sum_render` over a snapshot-resolved sum."""
        res = t._sum_from(snap, cname)
        if res is None:
            return None
        return Catalog._sum_render(res, st)

    @staticmethod
    def _avg_dec_result_type(st: str) -> str:
        """Spark's AVG result type for a decimal input:
        ``decimal(p,s)`` → ``decimal(p+4, s+4)`` (callers refuse
        p+4 > 38 before asking)."""
        p, s = (int(x) for x in st[len("decimal("):-1].split(","))
        return f"decimal({p + 4},{s + 4})"

    @staticmethod
    def _sum_result_type(st: str) -> str:
        """Spark's SUM result type for an exact input type: integer
        family → ``bigint``; ``decimal(p,s)`` →
        ``decimal(min(38,p+10),s)``. The ONE source both the GROUP BY
        carrier cast and :meth:`_sum_render`'s overflow bound use —
        drifting copies would let a value pass a bound its cast type
        cannot hold."""
        if st.startswith("decimal("):
            p, s = (int(x) for x in st[len("decimal("):-1].split(","))
            return f"decimal({min(38, p + 10)},{s})"
        return "bigint"

    @staticmethod
    def _sum_render(res: tuple, st: str):
        """``(value_string_or_None, result_type)`` for an exact
        ``(sum, nonnull)`` pair, in the relational path's RESULT TYPE
        (:meth:`_sum_result_type`); value ``None`` = SQL NULL (zero
        non-null rows). Returns ``None`` (refuse → fallback) when the
        sum would overflow that type — non-ANSI Spark wraps/NULLs
        there, and the fallback reproduces whatever Spark does rather
        than guessing."""
        import decimal

        total, nonnull = res
        rt = Catalog._sum_result_type(st).upper()
        if rt.startswith("DECIMAL("):
            rp, rs = (int(x)
                      for x in rt[len("DECIMAL("):-1].split(","))
            if nonnull == 0:
                return (None, rt)
            if abs(total) >= decimal.Decimal(10) ** (rp - rs):
                return None
            return (str(total), rt)
        if nonnull == 0:
            return (None, "BIGINT")
        if not (-(2 ** 63) <= int(total) < 2 ** 63):
            return None
        return (str(int(total)), "BIGINT")

    @classmethod
    def _sum_literal(cls, t, snap, cname: str, st: str) -> str | None:
        """:meth:`_sum_checked` rendered as a one-row SQL literal."""
        r = cls._sum_checked(t, snap, cname, st)
        if r is None:
            return None
        v, rt = r
        if v is None:
            return f"CAST(NULL AS {rt})"
        # string-cast render: the relational SUM is nullable=True and
        # a bare int literal cast would analyze non-nullable
        return f"CAST('{v}' AS {rt})"

    _TC_RE = re.compile(
        r"table_changes\(\s*'([\w.`]+)'\s*,\s*(\d+)\s*(?:,\s*(\d+))?\s*\)",
        re.I,
    )

    def _register_table_changes(self, spark: SparkSession, stmt: str) -> str:
        """Rewrite ``table_changes('t', startV [, endV])`` (the Delta
        CDF table-valued function shape) into a registered incremental-
        read view: rows committed in versions [startV, endV] — CDC
        tables yield their change rows unfiltered, like the reference's
        ``readtype=incremental`` CDC passthrough. Version bounds filter
        by exact commit seq (``incremental_files_by_version``), never
        round-tripped through ms timestamps — two commits landing in
        the same millisecond still resolve to the right row set."""
        out, pos = [], 0
        for m in self._TC_RE.finditer(stmt):
            if not _outside_quotes(stmt, m.start()):
                continue
            ns, name = self._split_name(m.group(1))
            if not self.table_exists(name, ns):
                raise ValueError(f"no such table {ns}.{name}")
            path = self._registry(ns)[name]
            start_v = int(m.group(2))
            end_v = int(m.group(3)) if m.group(3) is not None else None
            t = LakeSoulTable.for_path(spark, path)
            head = t.store.head_version()
            for v, label in ((start_v, "start"), (end_v, "end")):
                if v is not None and v > head:
                    raise ValueError(
                        f"table_changes: {label} version {v} is beyond "
                        f"{ns}.{name}'s head version {head}"
                    )
            prefix = name if ns == "default" else f"{ns}_{name}"
            view = f"{prefix}__changes_{start_v}_{end_v if end_v is not None else 'head'}"
            LakeSoulTable.for_path_incremental_versions(
                spark, path, start_v, end_v
            ).to_df().createOrReplaceTempView(view)
            out.append(stmt[pos:m.start()] + view)
            pos = m.end()
        out.append(stmt[pos:])
        return "".join(out)

    _TT_RE = re.compile(
        r"([\w.`]+)\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+('[^']*'|\d+)", re.I
    )

    def _register_time_travel(self, spark: SparkSession, stmt: str) -> str:
        """Rewrite ``t VERSION AS OF n`` / ``t TIMESTAMP AS OF ts``
        references (Spark's DSv2 time-travel grammar; reference
        readtype=snapshot, ``LakeSoulTable.scala:642-723``) into
        registered snapshot temp views. ``ts`` is epoch millis or an
        ISO datetime string (naive = UTC). Matches inside string
        literals are left alone."""
        out, pos = [], 0
        for m in self._TT_RE.finditer(stmt):
            if not _outside_quotes(stmt, m.start()):
                continue
            ns, name = self._split_name(m.group(1))
            if not self.table_exists(name, ns):
                continue
            path = self._registry(ns)[name]
            lit = m.group(3)
            prefix = name if ns == "default" else f"{ns}_{name}"
            if m.group(2).upper() == "VERSION":
                version = int(lit)
                view = f"{prefix}__v{version}"
                t = LakeSoulTable.for_path_snapshot(
                    spark, path, version=version
                )
            else:
                ms = _parse_ts_literal(lit)
                view = f"{prefix}__ts{ms}"
                t = LakeSoulTable.for_path_snapshot(spark, path, end_ts_ms=ms)
            t.to_df().createOrReplaceTempView(view)
            out.append(stmt[pos:m.start()] + view)
            pos = m.end()
        out.append(stmt[pos:])
        return "".join(out)

    def sql_script(self, spark: SparkSession, script: str) -> list:
        """Run a ``;``-separated multi-statement script through
        :meth:`sql`, splitting on semicolons OUTSIDE string literals
        (a ``';'`` inside a literal does not end a statement — the
        trap the reference avoids by using Spark's ANTLR parser,
        ``LakeSoulSqlExtensions.g4``). Returns the per-statement
        results in order (None for non-query statements)."""
        return [
            self.sql(spark, s)
            for s in _split_statements(script)
        ]

    def _register_referenced(
        self, spark: SparkSession, stmt: str, *, register_all: bool = False
    ) -> str:
        """Create temp views for the catalog tables ``stmt`` references
        (all of them when ``register_all``); returns the statement with
        dot-qualified names rewritten to their view names."""
        for ns in self.list_namespaces():
            for name in self.list_tables(ns):
                view = name if ns == "default" else f"{ns}_{name}"
                qualified = rf"\b{re.escape(ns)}\.{re.escape(name)}\b"
                referenced = register_all or re.search(
                    qualified, stmt, re.I
                ) or re.search(rf"\b{re.escape(view)}\b", stmt, re.I)
                if not referenced:
                    continue
                self._view_df(spark, name, ns) \
                    .createOrReplaceTempView(view)
                if ns != "default":
                    stmt = re.sub(qualified, view, stmt, flags=re.I)
        return stmt

    # ------------------------------------------------------- SQL internals

    _AGG_ITEM_RE = re.compile(
        r"^(sum|count|avg|min|max|approx_count_distinct)"
        r"\s*\((.+)\)\s+AS\s+(\w+)$", re.I | re.S
    )

    @staticmethod
    def _reject_mv_write(t, ns: str, name: str, verb: str) -> None:
        """Materialized-view tables hold PARTIAL generations folded by
        declared merge operators; a direct write would be silently
        folded into the aggregates (sum_all would add the inserted rows
        to the running totals) — corrupting the view with no error. The
        Arrow/streaming readers already refuse such tables; the SQL
        write verbs must too."""
        from lakesoul_spark.mv import SPEC_PROP

        if SPEC_PROP in t.info.properties:
            raise ValueError(
                f"{ns}.{name} is a materialized view — {verb} would "
                "write into its partial-aggregate generations and "
                "corrupt the view; its content is derived: use REFRESH "
                "MATERIALIZED VIEW (or the Python refresh()/rebuild())"
            )

    def _get_mv(self, spark: SparkSession, ref: str):
        from lakesoul_spark.mv import SPEC_PROP, open_view

        ns, name = self._split_name(ref)
        t = self.get_table(spark, name, ns)
        if SPEC_PROP not in t.info.properties:
            raise ValueError(f"{ns}.{name} is not a materialized view")
        return open_view(spark, t.path)

    def _view_df(self, spark: SparkSession, name: str, ns: str):
        """The frame a SQL reference to a catalog table resolves to:
        plain tables expose their MOR view; materialized views expose
        the FINALIZED aggregate (merged partials, normalized types,
        compacted fast path) — not the raw partial generations."""
        from lakesoul_spark.mv import SPEC_PROP, open_view

        t = self.get_table(spark, name, ns)
        if SPEC_PROP in t.info.properties:
            return open_view(spark, t.path).to_df()
        return t.to_df()

    def _sql_create_mv(self, spark: SparkSession, stmt: str):
        """``CREATE MATERIALIZED VIEW v AS SELECT … FROM src GROUP BY …``
        → :class:`lakesoul_spark.mv.AggMV` over a catalog source table,
        registered under the namespace like any table and populated by
        an initial refresh (CTAS semantics). The SELECT is restricted
        to the incrementally-maintainable shape: one source table,
        GROUP BY columns, and sum/count/min/max aggregates each with an
        ``AS`` alias — anything else fails loudly rather than silently
        materializing a non-refreshable query."""
        from lakesoul_spark.mv import AggMV

        m = _rx(
            r"CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?"
            r"([\w.`]+)(?:\s+TBLPROPERTIES\s*\((.*?)\))?"
            r"\s+AS\s+SELECT\s(.*)$",
            stmt,
        )
        ns, name = self._split_name(m.group(2))
        if self.table_exists(name, ns):
            if m.group(1):
                return None
            raise ValueError(f"table {ns}.{name} already exists")
        if not self.namespace_exists(ns):
            if ns == "default":
                self.create_namespace("default")
            else:
                raise ValueError(f"no such namespace {ns!r}")
        props = _parse_props(m.group(3)) if m.group(3) else {}
        hash_bucket_num = int(props.pop("hashBucketNum", 4))
        join_pk = [c.strip() for c in str(
            props.pop("primaryKey", "")).split(",") if c.strip()]
        # r15: opt min/max over a PK source into evict-triggered
        # group rescans (AggMV allow_extremum_rescan)
        extremum_rescan = str(props.pop("allowExtremumRescan",
                                        "false")).lower() == "true"
        # r15: opt count_distinct over a PK source into EXACT
        # maintenance via per-value companion tables (AggMV
        # exact_distinct) — this is also what legitimizes the
        # count(DISTINCT …) spelling below
        exact_distinct = str(props.pop("exactDistinct",
                                       "false")).lower() == "true"
        if props:
            raise ValueError(
                f"unsupported materialized-view properties {sorted(props)}"
            )
        body = m.group(4)
        fi = _find_top_keyword(body, "FROM")
        if fi < 0:
            raise ValueError("materialized view SELECT needs a FROM clause")
        select_list, rest = body[:fi], body[fi + 4:].strip()
        gi = _find_top_keyword(rest, "GROUP")
        if gi >= 0 and not rest[gi + 5:].strip().upper().startswith("BY"):
            raise ValueError(f"cannot parse GROUP clause in {rest!r}")
        src_ref = rest[:gi].strip() if gi >= 0 else rest
        where = None
        wi = _find_top_keyword(src_ref, "WHERE")
        if wi >= 0:
            where = src_ref[wi + 5:].strip()
            src_ref = src_ref[:wi].strip()
        jm = re.fullmatch(
            r"([\w.`]+)\s+(?:(LEFT|RIGHT)(?:\s+OUTER)?\s+|(?:INNER\s+)?)"
            r"JOIN\s+([\w.`]+)\s+USING\s*\(([^)]*)\)",
            src_ref, re.I | re.S,
        )
        if jm is not None:
            # two-source delta-join view (JoinMV): shared-key equi-join
            # spelled USING (INNER default, LEFT [OUTER] for the
            # unique-right-key left view; RIGHT [OUTER] canonicalizes
            # to the left view with the sides swapped inside
            # JoinMV.create — primaryKey names the preserved side's
            # row identity either way), row-level select, PK from
            # the primaryKey property
            from lakesoul_spark.mv import JoinMV

            how = {"LEFT": "left", "RIGHT": "right"}.get(
                (jm.group(2) or "").upper(), "inner")
            if gi >= 0:
                raise ValueError(
                    "JOIN materialized views are row-level — aggregate "
                    "the view with a second (GROUP BY) view on top"
                )
            if not join_pk:
                raise ValueError(
                    "JOIN materialized views need TBLPROPERTIES("
                    "'primaryKey'='cols that uniquely identify a "
                    "joined row')"
                )
            on = [c.strip().strip("`")
                  for c in jm.group(4).split(",") if c.strip()]
            items = [i.strip() for i in _split_top(select_list)]
            lns, lname = self._split_name(jm.group(1))
            rns, rname = self._split_name(jm.group(3))
            left = self.get_table(spark, lname, lns)
            right = self.get_table(spark, rname, rns)
            mv_path = os.path.abspath(os.path.join(self._ns_dir(ns), name))
            created_dir = not os.path.exists(mv_path)
            JoinMV.create(
                spark, left.path, right.path, mv_path,
                on=on, select=items, pk=join_pk,
                hash_bucket_num=hash_bucket_num, where=where,
                how=how,
            )
            try:
                self.backend.register_table(ns, name, mv_path)
            except Exception:
                if created_dir:
                    shutil.rmtree(mv_path, ignore_errors=True)
                raise
            JoinMV(spark, mv_path).refresh()
            return None
        if re.search(r"(?i)\bJOIN\b", src_ref):
            raise ValueError(
                "JOIN materialized views take the shared-key form "
                "FROM a [INNER | LEFT [OUTER] | RIGHT [OUTER]] JOIN b "
                "USING (k, …) — ON-condition joins and FULL OUTER are "
                "not incrementally maintainable here (full-outer "
                "retractions key on both row identities)"
            )
        if not re.fullmatch(r"[\w.`]+", src_ref):
            raise ValueError(
                "materialized views read ONE source table "
                f"(got FROM {src_ref!r}) — joins/subqueries are not "
                "incrementally maintainable here"
            )
        if gi < 0:
            # no GROUP BY → an insert-only TRANSFORM pipe (TransformMV)
            from lakesoul_spark.mv import TransformMV

            items = [i.strip() for i in _split_top(select_list)]
            aggy = [i for i in items if self._AGG_ITEM_RE.match(i)]
            if aggy:
                raise ValueError(
                    f"aggregates {aggy} need a GROUP BY clause"
                )
            if join_pk:
                raise ValueError(
                    "primaryKey is a JOIN-view property — a transform "
                    "view over a PK source is keyed by the source PK "
                    "(carry it in the select)"
                )
            src_ns, src_name = self._split_name(src_ref)
            src = self.get_table(spark, src_name, src_ns)
            mv_path = os.path.abspath(os.path.join(self._ns_dir(ns), name))
            created_dir = not os.path.exists(mv_path)
            TransformMV.create(
                spark, src.path, mv_path, select=items, where=where,
                hash_bucket_num=hash_bucket_num,
            )
            try:
                self.backend.register_table(ns, name, mv_path)
            except Exception:
                if created_dir:
                    shutil.rmtree(mv_path, ignore_errors=True)
                raise
            TransformMV(spark, mv_path).refresh()
            return None
        group_by = [
            c.strip().strip("`")
            for c in _split_top(rest[gi + 5:].strip()[2:])
        ]
        aggs: dict = {}
        bare: list = []
        for item in _split_top(select_list):
            item = item.strip()
            am = self._AGG_ITEM_RE.match(item)
            if am:
                fn = am.group(1).lower()
                expr = am.group(2).strip()
                if fn == "count" and expr == "*":
                    expr = None
                elif fn == "count" and re.match(r"(?i)DISTINCT\s", expr):
                    # the default incremental maintenance of a distinct
                    # count is an HLL sketch: exact only below the
                    # sketch's sparse-mode threshold, approximate past
                    # it. A SQL reader of `count(DISTINCT …)` expects
                    # exact — the spelling is only honored when
                    # 'exactDistinct'='true' opts into the per-value
                    # companion maintenance that actually delivers it
                    # (PK sources); otherwise make the contract
                    # explicit with approx_count_distinct(…).
                    if not exact_distinct:
                        raise ValueError(
                            "count(DISTINCT …) in a materialized view "
                            "is maintained as an HLL sketch and "
                            "becomes APPROXIMATE at high per-group "
                            "cardinality — spell it "
                            "approx_count_distinct(…) to acknowledge "
                            "the approximation, or set TBLPROPERTIES("
                            "'exactDistinct'='true') on a primary-key "
                            "source for exact companion-table "
                            "maintenance"
                        )
                    fn = "count_distinct"
                    expr = re.sub(r"(?i)^DISTINCT\s+", "", expr).strip()
                elif fn == "approx_count_distinct":
                    fn = "count_distinct"
                aggs[am.group(3)] = (fn, expr)
            else:
                bare.append(item.strip("`"))
        if set(bare) != set(group_by):
            raise ValueError(
                "non-aggregate select items must equal the GROUP BY "
                f"columns (select {bare}, group by {group_by}); "
                "aggregates need an AS alias"
            )
        if not aggs:
            raise ValueError("materialized view needs at least one aggregate")
        if join_pk:
            raise ValueError(
                "primaryKey is a JOIN-view property — an aggregate "
                "view is keyed by its GROUP BY columns"
            )
        src_ns, src_name = self._split_name(src_ref)
        src = self.get_table(spark, src_name, src_ns)
        mv_path = os.path.abspath(os.path.join(self._ns_dir(ns), name))
        created_dir = not os.path.exists(mv_path)
        AggMV.create(
            spark, src.path, mv_path,
            group_by=group_by, aggs=aggs,
            hash_bucket_num=hash_bucket_num, where=where,
            allow_extremum_rescan=extremum_rescan,
            exact_distinct=exact_distinct,
        )
        try:
            self.backend.register_table(ns, name, mv_path)
        except Exception:
            if created_dir:
                shutil.rmtree(mv_path, ignore_errors=True)
            raise
        AggMV(spark, mv_path).refresh()
        return None

    def _sql_insert(self, spark: SparkSession, stmt: str):
        """``INSERT INTO | OVERWRITE [TABLE] t [PARTITION (p=v, …)]
        [(col list)] <query>``. Without a column list, columns match by
        POSITION against the table schema (a VALUES source has
        synthetic colN names). With one, the query's output maps to the
        named columns and unnamed table columns are filled with NULL.
        A static PARTITION spec adds its constant values as columns;
        with OVERWRITE it becomes ``replace_where`` on exactly that
        partition (reference ``WriteIntoTable.scala:122-134``)."""
        m = _rx(
            r"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.`]+)\s*"
            r"(?:PARTITION\s*\(([^)]*)\)\s*)?"
            r"(?:\(([^)]*)\)\s*)?(.*)$",
            stmt,
        )
        ns, name = self._split_name(m.group(2))
        t = self.get_table(spark, name, ns)
        self._reject_mv_write(t, ns, name, f"INSERT {m.group(1).upper()}")
        part_spec, col_list, query = m.group(3), m.group(4), m.group(5)
        # "(SELECT …)" after the table name is a parenthesized source,
        # not a column list
        if col_list is not None and re.match(
            r"\s*(SELECT|VALUES|WITH)\b", col_list, re.I
        ):
            query = f"({col_list}) {query}".strip()
            col_list = None

        target_fields = {f.name: f for f in t.schema().fields}
        target_cols = [f.name for f in t.schema().fields]
        from lakesoul_spark.io.writer import cast_type as _ct

        statics: dict[str, str] = {}
        if part_spec:
            for kv in _split_top(part_spec):
                k, _, v = kv.partition("=")
                if not v:
                    raise ValueError(f"bad PARTITION entry {kv!r}")
                statics[k.strip()] = v.strip().strip("'\"")
            bad = [k for k in statics if k not in target_fields]
            if bad:
                raise ValueError(
                    f"PARTITION columns not in table {ns}.{name}: {bad}"
                )

        src = self.sql(spark, query)
        if col_list is not None:
            named = [c.strip() for c in _split_top(col_list)]
            unknown = [c for c in named if c not in target_fields]
            if unknown:
                raise ValueError(f"INSERT columns not in table: {unknown}")
            both = [c for c in named if c in statics]
            if both:
                raise ValueError(
                    "columns appear in both the INSERT column list and "
                    f"the PARTITION spec: {both} — a static partition "
                    "value cannot also come from the query"
                )
            if len(src.columns) != len(named):
                raise ValueError(
                    f"INSERT column list has {len(named)} columns but "
                    f"query produced {len(src.columns)}"
                )
            src = src.toDF(*named)
            for c in target_cols:
                if c in named:
                    continue
                if c in statics:
                    src = src.withColumn(
                        c, F.lit(statics[c]).cast(_ct(target_fields[c].dataType))
                    )
                else:
                    src = src.withColumn(
                        c, F.lit(None).cast(_ct(target_fields[c].dataType))
                    )
            src = src.select(*target_cols)
        else:
            expect = [c for c in target_cols if c not in statics]
            if len(src.columns) != len(expect):
                raise ValueError(
                    f"INSERT column count {len(src.columns)} != expected "
                    f"{len(expect)}"
                )
            src = src.toDF(*expect)
            for c, v in statics.items():
                src = src.withColumn(
                    c, F.lit(v).cast(_ct(target_fields[c].dataType))
                )
            src = src.select(*target_cols)

        from lakesoul_spark.table import write as _write

        overwrite = m.group(1).upper() == "OVERWRITE"
        replace_where = None
        if overwrite and statics:
            replace_where = " AND ".join(
                f"{k} = '{v}'" for k, v in sorted(statics.items())
            )
        _write(
            src, t.path,
            mode="overwrite" if overwrite else "append",
            replace_where=replace_where,
        )
        return None

    def _sql_alter_table(self, spark: SparkSession, stmt: str):
        """``ALTER TABLE`` surface (reference
        ``alterTableCommands.scala:48,113,191,337``): ADD COLUMN(S) with
        COMMENT/FIRST/AFTER, ALTER/CHANGE COLUMN TYPE/COMMENT/position,
        REPLACE COLUMNS, SET/UNSET TBLPROPERTIES."""
        m = _rx(r"ALTER\s+TABLE\s+([\w.`]+)\s+(.*)$", stmt)
        ns, name = self._split_name(m.group(1))
        t = self.get_table(spark, name, ns)
        rest = m.group(2).strip()
        up = rest.upper()
        if up.startswith("ADD COLUMN"):
            am = _rx(r"ADD\s+COLUMNS?\s*\((.*)\)$", rest)
            for coldef in _split_top(am.group(1), angles=True):
                cname, ctype, comment, first, after = _parse_coldef(coldef)
                t.add_column(cname, ctype, comment=comment,
                             first=first, after=after)
            return None
        if up.startswith("REPLACE COLUMNS"):
            am = _rx(r"REPLACE\s+COLUMNS\s*\((.*)\)$", rest)
            cols = []
            for coldef in _split_top(am.group(1), angles=True):
                cname, ctype, comment, first, after = _parse_coldef(coldef)
                if first or after:
                    raise ValueError(
                        "FIRST/AFTER is meaningless in REPLACE COLUMNS: "
                        "the list order IS the new schema order"
                    )
                cols.append((cname, ctype, comment))
            t.replace_columns(cols)
            return None
        if up.startswith(("ALTER COLUMN", "CHANGE COLUMN", "CHANGE ")):
            am = _rx(
                r"(?:ALTER|CHANGE)\s+(?:COLUMN\s+)?(`?\w+`?)\s+(.*)$", rest
            )
            cname, clause = am.group(1).strip("`"), am.group(2).strip()
            cup = clause.upper()
            if cup.startswith("TYPE "):
                t.alter_column_type(cname, clause[5:].strip())
                return None
            if cup.startswith("COMMENT "):
                cm = _rx(r"COMMENT\s+'((?:[^']|'')*)'$", clause)
                t.change_column(cname, comment=cm.group(1).replace("''", "'"))
                return None
            if cup == "FIRST":
                t.change_column(cname, first=True)
                return None
            if cup.startswith("AFTER "):
                t.change_column(cname, after=clause[6:].strip().strip("`"))
                return None
            # reference CHANGE syntax: old_name new_name type [COMMENT c]
            # [FIRST|AFTER x] — renames rejected (verifyColumnChange), so
            # new_name must equal old_name
            cm = _rx(
                r"(`?\w+`?)\s+([\w()<>,:\s]+?)"
                r"(?:\s+COMMENT\s+'((?:[^']|'')*)')?"
                r"(?:\s+(FIRST)|\s+AFTER\s+(\w+))?$",
                clause,
            )
            if cm.group(1).strip("`") != cname:
                raise ValueError(
                    f"cannot rename column {cname!r} to {cm.group(1)!r}: "
                    "ALTER TABLE CHANGE COLUMN does not support renames"
                )
            new_type = cm.group(2).strip()
            cur = {f.name: f for f in t.schema().fields}
            if cname in cur and cur[cname].dataType.simpleString() != \
                    new_type.lower().replace(" ", ""):
                t.alter_column_type(cname, new_type)
            comment = cm.group(3).replace("''", "'") if cm.group(3) else None
            t.change_column(
                cname, comment=comment,
                first=bool(cm.group(4)), after=cm.group(5),
            )
            return None
        if up.startswith("SET TBLPROPERTIES"):
            am = _rx(r"SET\s+TBLPROPERTIES\s*\((.*)\)$", rest)
            t.set_properties(_parse_props(am.group(1)))
            return None
        if up.startswith("UNSET TBLPROPERTIES"):
            am = _rx(r"UNSET\s+TBLPROPERTIES\s*\((.*)\)$", rest)
            keys = [p.strip().strip("'\"") for p in _split_top(am.group(1))]
            t.unset_properties(keys)
            return None
        raise ValueError(f"unsupported ALTER TABLE clause: {rest!r}")

    def _split_name(self, qualified: str) -> tuple[str, str]:
        # identifier captures tolerate backticks (reserved-word names
        # like `order` stay quoted for Spark passthrough but OUR parser
        # matches any word) — strip them per segment here
        qualified = qualified.replace("`", "")
        if "." in qualified:
            ns, name = qualified.split(".", 1)
            return ns, name
        return "default", qualified

    def _sql_create_table(self, spark: SparkSession, stmt: str):
        ctas = re.match(
            r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.`]+)\s+"
            r"USING\s+lakesoul\b(?P<rest>.*?)\s+AS\s+(?P<q>SELECT\b.*)$",
            stmt, re.I | re.S,
        )
        if ctas:
            return self._sql_ctas(spark, ctas)
        m = _rx(
            r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.`]+)\s*"
            r"\((?P<cols>.*?)\)\s*USING\s+lakesoul\b(?P<rest>.*)$",
            stmt,
        )
        ns, name = self._split_name(m.group(2))
        rest = m.group("rest")
        if not self.namespace_exists(ns) and ns != "default":
            raise ValueError(f"no such namespace {ns!r}")
        if self.table_exists(name, ns):
            if m.group(1):
                return None
            raise ValueError(f"table {ns}.{name} already exists")

        from pyspark.sql.types import StructType
        schema = StructType.fromDDL(m.group("cols"))

        range_partitions: list[str] = []
        pm = re.search(r"PARTITIONED\s+BY\s*\(([^)]*)\)", rest, re.I)
        if pm:
            range_partitions = [c.strip().strip("`") for c in pm.group(1).split(",")]
        location = None
        lm = re.search(r"LOCATION\s+'([^']*)'", rest, re.I)
        if lm:
            location = lm.group(1)
        props: dict[str, str] = {}
        tm = re.search(r"TBLPROPERTIES\s*\((.*)\)", rest, re.I | re.S)
        if tm:
            props = _parse_props(tm.group(1))
        # reference option names (PrimaryKeyFilterEval.scala:68):
        # hashPartitions is comma-separated, hashBucketNum an int
        hash_partitions = [
            c.strip() for c in props.pop("hashPartitions", "").split(",")
            if c.strip()
        ]
        try:
            hash_bucket_num = int(props.pop("hashBucketNum", "4"))
        except ValueError as e:
            raise ValueError("hashBucketNum must be an integer") from e

        self.create_table(
            spark, name, schema, namespace=ns, path=location,
            range_partitions=range_partitions,
            hash_partitions=hash_partitions,
            hash_bucket_num=hash_bucket_num,
            properties=props,
        )
        return None

    def _sql_ctas(self, spark: SparkSession, m):
        """CREATE TABLE ... USING lakesoul [PARTITIONED BY (...)]
        [LOCATION ...] [TBLPROPERTIES(...)] AS SELECT ... — schema from
        the query, then one bucketed write of its result."""
        ns, name = self._split_name(m.group(2))
        if not self.namespace_exists(ns) and ns != "default":
            raise ValueError(f"no such namespace {ns!r}")
        if self.table_exists(name, ns):
            if m.group(1):
                return None
            raise ValueError(f"table {ns}.{name} already exists")
        rest = m.group("rest")
        df = self.sql(spark, m.group("q"))

        range_partitions: list[str] = []
        pm = re.search(r"PARTITIONED\s+BY\s*\(([^)]*)\)", rest, re.I)
        if pm:
            range_partitions = [c.strip().strip("`") for c in pm.group(1).split(",")]
        location = None
        lm = re.search(r"LOCATION\s+'([^']*)'", rest, re.I)
        if lm:
            location = lm.group(1)
        props: dict[str, str] = {}
        tm = re.search(r"TBLPROPERTIES\s*\((.*?)\)", rest, re.I | re.S)
        if tm:
            props = _parse_props(tm.group(1))
        hash_partitions = [
            c.strip() for c in props.pop("hashPartitions", "").split(",")
            if c.strip()
        ]
        try:
            hash_bucket_num = int(props.pop("hashBucketNum", "4"))
        except ValueError as e:
            raise ValueError("hashBucketNum must be an integer") from e

        t = self.create_table(
            spark, name, df.schema, namespace=ns, path=location,
            range_partitions=range_partitions,
            hash_partitions=hash_partitions,
            hash_bucket_num=hash_bucket_num,
            properties=props,
        )
        from lakesoul_spark.table import write as _write
        _write(df, t.path, mode="overwrite")
        return None

    def _sql_merge(self, spark: SparkSession, stmt: str):
        m = _rx(
            r"MERGE\s+INTO\s+([\w.`]+)(?:\s+AS)?(?:\s+(\w+))?\s+"
            r"USING\s+(\(.*\)|[\w.`]+)(?:\s+AS)?(?:\s+(\w+))?\s+"
            r"ON\s+(.*?)\s+"
            r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
            r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*$",
            stmt,
        )
        ns, name = self._split_name(m.group(1))
        target = self.get_table(spark, name, ns)
        self._reject_mv_write(target, ns, name, "MERGE INTO")
        src_ref = m.group(3)
        if src_ref.startswith("("):
            source = self.sql(spark, src_ref[1:-1])
        else:
            sns, sname = self._split_name(src_ref)
            if self.table_exists(sname, sns):
                source = self.get_table(spark, sname, sns).to_df()
            else:
                source = self.sql(spark, f"SELECT * FROM {src_ref}")
        # ON must be AND-ed equalities over the full PK (reference
        # PreprocessTableMergeInto.scala:34-92); aliases are stripped
        on_cols = []
        for clause in re.split(r"\s+AND\s+", m.group(5), flags=re.I):
            em = re.match(
                r"\s*([\w.`]+)\s*=\s*([\w.`]+)\s*$", clause
            )
            if not em:
                raise ValueError(
                    f"MERGE ON clause must be PK equality, got {clause!r}"
                )
            lcol = em.group(1).rsplit(".", 1)[-1]
            rcol = em.group(2).rsplit(".", 1)[-1]
            if lcol != rcol:
                raise ValueError(
                    f"MERGE ON equality must name the same column on "
                    f"both sides, got {clause!r}"
                )
            on_cols.append(lcol)
        merge_into(target, source, on_cols)
        return None


def _flt_sql_str(v: float) -> str:
    """A float as the string Spark's string→float/double cast parses
    back to the identical value: Java ``Double.parseDouble`` accepts
    ``NaN``/``Infinity``/``-Infinity`` (not Python's ``nan``/``inf``)
    and is correctly rounded on ``repr``'s shortest decimal."""
    import math

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    return repr(v)


def _nullable_str_lit(s: str) -> str:
    """A string value as a SQL expression that (a) parses back to
    exactly ``s`` under EVERY parser mode — base64 transport, no
    literal-escaping hazards (the ``local_df`` rendering contract) —
    and (b) analyzes as ``nullable=True``, matching the relational
    MIN/MAX aggregate's schema (a plain literal or a binary→string
    cast is non-nullable; ``nullif(x, NULL)`` is an identity that
    adds nullability and still constant-folds to a LocalRelation)."""
    import base64

    enc = base64.b64encode(s.encode("utf-8")).decode("ascii")
    return f"nullif(CAST(unbase64('{enc}') AS STRING), NULL)"


def _rx(pattern: str, stmt: str) -> "re.Match":
    m = re.match(pattern, stmt, re.I | re.S)
    if not m:
        raise ValueError(f"cannot parse statement: {stmt[:120]!r}")
    return m


def _parse_props(body: str) -> dict[str, str]:
    """Parse a ``'k'='v'[, ...]`` TBLPROPERTIES body."""
    props: dict[str, str] = {}
    for part in _split_top(body):
        km = re.match(r"\s*'([^']*)'\s*=\s*'([^']*)'\s*$", part)
        if not km:
            raise ValueError(f"bad TBLPROPERTIES entry {part!r}")
        props[km.group(1)] = km.group(2)
    return props


def _outside_quotes(s: str, idx: int) -> bool:
    """True when position ``idx`` is not inside a ''/"" literal."""
    quote = None
    for i in range(idx):
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
    return quote is None


# SQL reserved words (ANSI/Spark) whose backticks must SURVIVE
# normalization: stripping them changes the meaning of passthrough
# statements (``SELECT `order` FROM t`` would stop parsing). Keeping
# the quotes is always safe for Spark; the word-bounded reference scan
# in _register_referenced still matches inside backticks.
_RESERVED_WORDS = frozenset(
    w.upper() for w in """
    all alter and any as at authorization between both by case cast
    check collate column commit constraint create cross current
    current_date current_time current_timestamp current_user delete
    desc describe distinct drop else end escape except exists external
    extract false fetch filter for foreign from full function global
    grant group grouping having in inner insert intersect interval
    into is join leading left like local natural not null of offset
    on only or order out outer overlaps partition position primary
    references revoke right rollback rollup row rows select session_user
    set some start table tablesample then time to trailing true
    truncate union unique unknown update user using values when where
    window with
    """.split()
)


def _strip_backticks(stmt: str) -> str:
    """Strip backticks around word-character identifiers, skipping
    string literals ('' / ""). ```ns`.`t``` becomes ``ns.t``; a
    backtick inside a quoted literal is untouched. Identifiers whose
    quoted form contains non-word characters are left quoted (the
    downstream name validation rejects them with a clear error), and
    so are SQL reserved words (``SELECT `order` FROM t`` must keep
    its quoting or the passthrough statement changes meaning)."""
    out: list[str] = []
    quote = None
    i, n = 0, len(stmt)
    while i < n:
        ch = stmt[i]
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
            i += 1
        elif ch in "'\"":
            quote = ch
            out.append(ch)
            i += 1
        elif ch == "`":
            j = stmt.find("`", i + 1)
            body = stmt[i + 1:j] if j > i else ""
            if (
                j > i
                and re.fullmatch(r"\w+", body)
                and body.upper() not in _RESERVED_WORDS
            ):
                out.append(body)
                i = j + 1
            else:
                out.append(ch)
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _split_statements(script: str) -> list[str]:
    """Split a SQL script on ``;`` outside quotes; drops empty parts."""
    parts: list[str] = []
    buf: list[str] = []
    quote = None
    for ch in script:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == ";":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _find_top_keyword(s: str, keyword: str) -> int:
    """Index of the first word-bounded, case-insensitive ``keyword``
    occurring OUTSIDE quotes and parens, or -1."""
    kw = keyword.upper()
    depth, quote = 0, None
    n = len(s)
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and s[i:i + len(kw)].upper() == kw:
            before = s[i - 1] if i else " "
            j = i + len(kw)
            after = s[j] if j < n else " "
            if (not (before.isalnum() or before == "_")
                    and not (after.isalnum() or after == "_")):
                return i
    return -1


def _parse_coldef(coldef: str) -> tuple[str, str, str | None, bool, str | None]:
    """Parse one ``name type [COMMENT 'c'] [FIRST | AFTER x]`` column
    definition (reference ADD COLUMNS grammar,
    ``alterTableCommands.scala:106-117``). Returns
    (name, type, comment, first, after). The type class includes ':'
    for nested struct fields (``struct<a:int>``) and '<>,' for
    array/map/decimal parameters."""
    m = _rx(
        r"(`?\w+`?)\s+([\w()<>,:\s]+?)"
        r"(?:\s+COMMENT\s+'((?:[^']|'')*)')?"
        r"(?:\s+(FIRST)|\s+AFTER\s+(`?\w+`?))?\s*$",
        coldef.strip(),
    )
    comment = m.group(3).replace("''", "'") if m.group(3) is not None else None
    after = m.group(5).strip("`") if m.group(5) else None
    return (m.group(1).strip("`"), m.group(2).strip(), comment,
            bool(m.group(4)), after)


def _split_top(s: str, *, angles: bool = False) -> list[str]:
    """Split on commas at paren/quote depth 0 (SET lists,
    TBLPROPERTIES). ``angles=True`` additionally tracks ``<>`` depth —
    for COLUMN-DEFINITION lists only, where struct<a:int,b:string> /
    map<k,v> commas must stay intact ('<' is a comparison operator in
    SET/expression contexts, so it is not tracked by default)."""
    out, depth, buf, quote = [], 0, [], None
    opens, closes = ("([<", ")]>") if angles else ("([", ")]")
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in opens:
            depth += 1
        elif ch in closes:
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    if buf and "".join(buf).strip():
        out.append("".join(buf))
    return [p.strip() for p in out]


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
