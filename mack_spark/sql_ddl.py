"""SQL utility / DDL front-end for open-protocol Delta tables.

delta-spark users drive table MAINTENANCE as SQL text, not just DML:
``DESCRIBE HISTORY``, ``OPTIMIZE ... ZORDER BY``, ``VACUUM``,
``RESTORE TABLE``, ``ALTER TABLE``, ``CREATE TABLE ... USING DELTA``,
``CONVERT TO DELTA``, time-travel ``SELECT ... VERSION AS OF`` and the
``table_changes(...)`` TVF (reference users inherit all of it from
delta-spark's SQL extension; the reference itself shells out to the
same statements via ``DeltaTable``). Spark's open-source parser only
routes these to a catalog with the Delta extension installed, so this
module parses the statement shapes itself and dispatches onto the SAME
engine methods the Python API uses — no new execution path.

:class:`DeltaSqlSession` is the one entry point. ``sql(text)`` always
returns a DataFrame (``spark.sql`` parity): SELECTs run through
Spark's own parser after table references are rewritten to temp views;
mutations return their one-row metrics frame, exactly the delta-spark
shape of ``spark.sql("OPTIMIZE t")`` returning metrics rows.

Statement → engine method:

* ``DESCRIBE HISTORY t [LIMIT n]``   → :meth:`DeltaProtocolTable.history`
* ``DESCRIBE DETAIL t``              → :meth:`DeltaProtocolTable.detail`
* ``OPTIMIZE t [WHERE p] [ZORDER BY (c,...)]`` → :meth:`optimize`
* ``VACUUM t [RETAIN n HOURS] [DRY RUN]``      → :meth:`vacuum`
* ``RESTORE [TABLE] t TO VERSION|TIMESTAMP AS OF x`` → :meth:`restore`
* ``ALTER TABLE t ADD COLUMN(S) / RENAME COLUMN / DROP COLUMN(S) /
  SET TBLPROPERTIES / ADD|DROP CONSTRAINT / CLUSTER BY`` → the matching
  schema-evolution / metadata commits
* ``CREATE TABLE [IF NOT EXISTS] t (cols) USING DELTA`` and the CTAS
  form ``... USING DELTA [LOCATION p] AS SELECT ...`` → :meth:`create`
* ``CONVERT TO DELTA parquet.`/path```          → :meth:`convert_from_parquet`
* ``MERGE / UPDATE / DELETE``        → :class:`mack_spark.sql_dml.DeltaSqlDml`
* ``SELECT`` with registered names, ``delta.`/path``` refs,
  ``VERSION AS OF`` / ``TIMESTAMP AS OF`` suffixes, and
  ``table_changes('t', lo[, hi])`` calls → rewritten to temp views of
  the protocol reader's scan, then executed by ``spark.sql`` (Catalyst
  optimizes the whole statement; the rewrite is names only).

SCALE: parsing is O(statement text) on the driver. Every dispatch
lands on the existing distributed machinery — pruned scans, file-pruned
MERGE, metadata-only RESTORE — so the SQL skin adds zero data movement.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mack_spark.sql_dml import (
    DeltaSqlDml,
    SqlDmlError,
    _find_kw,
    _kw_at,
    _Tok,
    _tokenize,
    _unquote_ident,
)

__all__ = ["DeltaSqlSession", "SqlDmlError"]


_HISTORY_SCHEMA = StructType([
    StructField("version", LongType()),
    StructField("timestamp", TimestampType()),
    StructField("operation", StringType()),
    StructField("operationParameters", MapType(StringType(), StringType())),
    StructField("operationMetrics", MapType(StringType(), StringType())),
])

_DETAIL_SCHEMA = StructType([
    StructField("format", StringType()),
    StructField("location", StringType()),
    StructField("numFiles", LongType()),
    StructField("sizeInBytes", LongType()),
    StructField("partitionColumns", ArrayType(StringType())),
    StructField("clusteringColumns", ArrayType(StringType())),
    StructField("properties", MapType(StringType(), StringType())),
    StructField("minReaderVersion", IntegerType()),
    StructField("minWriterVersion", IntegerType()),
    StructField("tableFeatures", ArrayType(StringType())),
    StructField("version", LongType()),
])


def _parse_at_suffix(text: str):
    """delta-spark's ``@`` time-travel shorthand: ``v<N>`` → version,
    ``yyyyMMddHHmmss[SSS]`` → timestamp string. Returns
    ``(version|None, timestamp|None)`` — both None when the text is
    not a travel suffix."""
    import re as _re

    if _re.fullmatch(r"[vV]\d+", text):
        return int(text[1:]), None
    if _re.fullmatch(r"\d{14}(\d{3})?", text):
        ts = (
            f"{text[0:4]}-{text[4:6]}-{text[6:8]}"
            f" {text[8:10]}:{text[10:12]}:{text[12:14]}"
        )
        if len(text) == 17:
            ts += f".{text[14:17]}"
        return None, ts
    return None, None


def _str_map(d: Optional[dict]) -> Dict[str, str]:
    """Delta's DESCRIBE HISTORY renders parameter/metric maps as
    string→string; JSON-encode anything structured."""
    out: Dict[str, str] = {}
    for k, v in (d or {}).items():
        out[str(k)] = v if isinstance(v, str) else json.dumps(v)
    return out


class DeltaSqlSession:
    """Execute Delta SQL text — queries, DML, and utility statements —
    against registered open-protocol tables.

    >>> sq = DeltaSqlSession(spark)
    >>> sq.register("events", "/data/events")
    >>> sq.sql("OPTIMIZE events ZORDER BY (user_id)").show()
    >>> sq.sql("SELECT * FROM events VERSION AS OF 3 WHERE ok").show()
    """

    def __init__(self, spark: SparkSession, tables: Optional[dict] = None):
        self._spark = spark
        self._dml = DeltaSqlDml(spark)
        self._tables: Dict[str, object] = self._dml._tables
        self._view_n = 0
        for name, t in (tables or {}).items():
            self.register(name, t)

    def register(self, name: str, table) -> "DeltaSqlSession":
        """Register a table under ``name`` — a
        :class:`DeltaProtocolTable` or a path string."""
        self._dml.register(name, table)
        return self

    # -- public entry -------------------------------------------------

    def sql(self, text: str) -> DataFrame:
        """Parse and run one statement; always returns a DataFrame
        (metrics rows for mutations, like delta-spark's SQL surface)."""
        stmt = text.strip().rstrip(";")
        toks = _tokenize(stmt)
        if not toks:
            raise SqlDmlError("empty statement")
        head = toks[0].upper
        if head in ("SELECT", "WITH", "VALUES"):
            return self._spark.sql(self._rewrite_query(stmt, toks))
        if head in ("MERGE", "UPDATE", "DELETE"):
            return self._metrics_df(self._dml.execute(stmt))
        if head == "INSERT":
            return self._insert(stmt, toks)
        if head == "COPY":
            return self._copy_into(toks)
        if head == "DESCRIBE" or head == "DESC":
            return self._describe(toks)
        if head == "OPTIMIZE":
            return self._optimize(stmt, toks)
        if head == "VACUUM":
            return self._vacuum(toks)
        if head == "RESTORE":
            return self._restore(toks)
        if head == "ALTER":
            return self._alter(stmt, toks)
        if head == "CREATE":
            return self._create(stmt, toks)
        if head == "CONVERT":
            return self._convert(toks)
        if head == "SHOW":
            return self._show(toks)
        if head == "FSCK":
            return self._fsck(toks)
        if head == "GENERATE":
            if len(toks) < 2:
                raise SqlDmlError(
                    "GENERATE supports symlink_format_manifest only"
                )
            mode = toks[1].text
            if mode.lower() != "symlink_format_manifest" and not (
                toks[1].kind == "string"
                and self._string_lit(toks[1]) == "symlink_format_manifest"
            ):
                raise SqlDmlError(
                    "GENERATE supports symlink_format_manifest only"
                )
            if not _kw_at(toks, 2, "FOR", "TABLE"):
                raise SqlDmlError(
                    "expected GENERATE symlink_format_manifest FOR TABLE"
                )
            table, _, _ = self._table_at(toks, 4)
            paths = table.generate_symlink_manifest()
            return self._spark.createDataFrame(
                [(p,) for p in paths],
                StructType([StructField("manifest", StringType())]),
            )
        raise SqlDmlError(
            f"unsupported statement head {toks[0].text!r} — supported:"
            " SELECT/WITH, MERGE/UPDATE/DELETE, DESCRIBE"
            " HISTORY/DETAIL, OPTIMIZE, VACUUM, RESTORE, ALTER TABLE,"
            " CREATE TABLE ... USING DELTA, CONVERT TO DELTA"
        )

    # -- shared helpers ------------------------------------------------

    def _table_at(self, toks: List[_Tok], i: int) -> Tuple[object, str, int]:
        """Resolve a table reference at ``i``: registry name or
        ``delta.`/path```. Returns (table, display-name, next index)."""
        from mack_spark.sources.delta_log import DeltaProtocolTable

        if i >= len(toks):
            raise SqlDmlError("missing table reference")
        t = toks[i]
        if (
            t.kind == "word" and t.upper == "DELTA"
            and i + 2 < len(toks) and toks[i + 1].text == "."
            and toks[i + 2].kind == "bquote"
        ):
            path = _unquote_ident(toks[i + 2].text)
            return DeltaProtocolTable(self._spark, path), path, i + 3
        if t.kind in ("word", "bquote"):
            name = _unquote_ident(t.text)
            if name in self._tables:
                return self._tables[name], name, i + 1
            raise SqlDmlError(
                f"unknown table {name!r} — register(name, path) it"
                " first, or use delta.`/path` syntax"
            )
        raise SqlDmlError(f"cannot parse table reference at {t.text!r}")

    def _metrics_df(self, metrics: dict) -> DataFrame:
        """One-row DataFrame from an engine metrics dict; nested values
        JSON-encoded so the schema is flat and stable."""
        keys = sorted(metrics)
        fields, row = [], []
        for k in keys:
            v = metrics[k]
            if isinstance(v, bool) or not isinstance(v, (int, float, str)):
                fields.append(StructField(k, StringType()))
                row.append(json.dumps(v))
            elif isinstance(v, int):
                fields.append(StructField(k, LongType()))
                row.append(v)
            elif isinstance(v, float):
                fields.append(StructField(k, DoubleType()))
                row.append(v)
            else:
                fields.append(StructField(k, StringType()))
                row.append(v)
        return self._spark.createDataFrame([tuple(row)], StructType(fields))

    def _paren_items(
        self, toks: List[_Tok], i: int
    ) -> Tuple[List[List[_Tok]], int]:
        """Split ``( ... , ... )`` at ``i`` into per-item token lists
        (commas at inner depth separate; deeper ones belong to items)."""
        if i >= len(toks) or toks[i].text != "(":
            raise SqlDmlError("expected '('")
        depth0 = toks[i].depth
        items: List[List[_Tok]] = []
        cur: List[_Tok] = []
        j = i + 1
        while j < len(toks):
            t = toks[j]
            if (t.depth == depth0 + 1 and t.text == ",") or (
                t.depth == depth0 and t.text == ")"
            ):
                if not cur:
                    raise SqlDmlError("empty item in parenthesized list")
                items.append(cur)
                cur = []
                if t.text == ")":
                    return items, j + 1
            else:
                cur.append(t)
            j += 1
        raise SqlDmlError("unterminated parenthesized list")

    def _paren_idents(
        self, toks: List[_Tok], i: int, with_types: bool = False
    ) -> Tuple[List, int]:
        """Parse ``(a, b, ...)`` (or ``(a INT, b STRING, ...)`` when
        ``with_types``) at ``i``; returns (items, next index)."""
        if i >= len(toks) or toks[i].text != "(":
            raise SqlDmlError("expected '('")
        depth0 = toks[i].depth
        j = i + 1
        items: List = []
        cur: List[str] = []
        while j < len(toks):
            t = toks[j]
            # list commas sit INSIDE the parens (depth0+1); the closing
            # paren is back at depth0; deeper commas (decimal(10,2))
            # belong to the item text
            if (t.depth == depth0 + 1 and t.text == ",") or (
                t.depth == depth0 and t.text == ")"
            ):
                if not cur:
                    raise SqlDmlError("empty item in parenthesized list")
                if with_types:
                    if len(cur) < 2:
                        raise SqlDmlError(
                            f"column {cur[0]!r} needs a type"
                        )
                    items.append((cur[0], " ".join(cur[1:])))
                else:
                    items.append(cur[0])
                cur = []
                if t.text == ")":
                    return items, j + 1
            else:
                cur.append(
                    _unquote_ident(t.text) if not cur else t.text
                )
            j += 1
        raise SqlDmlError("unterminated parenthesized list")

    def _string_lit(self, tok: _Tok) -> str:
        if tok.kind != "string":
            raise SqlDmlError(f"expected string literal, got {tok.text!r}")
        return tok.text[1:-1].replace("''", "'").replace("\\'", "'")

    def _next_view(self, df: DataFrame) -> str:
        self._view_n += 1
        name = f"__mack_sql_view_{self._view_n}"
        df.createOrReplaceTempView(name)
        return name

    # -- INSERT ----------------------------------------------------------

    def _copy_into(self, toks: List[_Tok]) -> DataFrame:
        """``COPY INTO t FROM '<path>' FILEFORMAT = PARQUET
        [FILES = ('a','b')] [PATTERN = '<glob>']
        [COPY_OPTIONS ('force' = 'true')]`` — Databricks' idempotent
        batch file ingest, dispatched onto
        :meth:`DeltaProtocolTable.copy_into` (per-file SetTransaction
        watermarks make re-runs land each source file exactly once)."""
        if not _kw_at(toks, 1, "INTO"):
            raise SqlDmlError("expected COPY INTO")
        table, _name, i = self._table_at(toks, 2)
        source = None
        file_format = None
        files = None
        pattern = None
        force = False
        while i < len(toks):
            if _kw_at(toks, i, "FROM"):
                source = self._string_lit(toks[i + 1])
                i += 2
            elif _kw_at(toks, i, "FILEFORMAT"):
                if i + 2 >= len(toks) or toks[i + 1].text != "=":
                    raise SqlDmlError("FILEFORMAT needs '= <format>'")
                file_format = toks[i + 2].text
                i += 3
            elif _kw_at(toks, i, "FILES"):
                if i + 1 >= len(toks) or toks[i + 1].text != "=":
                    raise SqlDmlError("FILES needs '= (...)'")
                items, i = self._paren_items(toks, i + 2)
                files = [
                    self._string_lit(it[0]) for it in items
                ]
            elif _kw_at(toks, i, "PATTERN"):
                if i + 2 >= len(toks) or toks[i + 1].text != "=":
                    raise SqlDmlError("PATTERN needs '= <glob>'")
                pattern = self._string_lit(toks[i + 2])
                i += 3
            elif _kw_at(toks, i, "COPY_OPTIONS"):
                opts = self._tblproperties(toks, i + 1)
                force = str(opts.get("force", "false")).lower() == "true"
                # _tblproperties returns the dict but not the end
                # index; skip to the matching close paren
                d0 = toks[i + 1].depth
                j = i + 2
                while j < len(toks) and not (
                    toks[j].text == ")" and toks[j].depth == d0
                ):
                    j += 1
                i = j + 1
            else:
                raise SqlDmlError(
                    f"unexpected token {toks[i].text!r} in COPY INTO"
                )
        if source is None:
            raise SqlDmlError("COPY INTO needs FROM '<path>'")
        if file_format is None:
            raise SqlDmlError("COPY INTO needs FILEFORMAT = PARQUET")
        m = table.copy_into(
            source, file_format=file_format, files=files,
            pattern=pattern, force=force,
        )
        return self._metrics_df({
            "num_affected_rows": m["num_affected_rows"],
            "num_inserted_rows": m["num_inserted_rows"],
            "num_skipped_files": m["num_skipped_files"],
            "num_loaded_files": m["num_loaded_files"],
        })

    def _insert(self, sql: str, toks: List[_Tok]) -> DataFrame:
        """``INSERT INTO t [(cols)] SELECT ...|VALUES ...``,
        ``INSERT OVERWRITE t ...``, and Delta's ``INSERT INTO t
        REPLACE WHERE pred SELECT ...`` — dispatched onto append /
        overwrite / the replaceWhere predicate overwrite. A column
        list NULL-fills the omitted columns (store assignment casts
        narrower source types up on widened tables)."""
        overwrite = False
        i = 1
        if _kw_at(toks, i, "OVERWRITE"):
            overwrite = True
            i += 1
            if _kw_at(toks, i, "TABLE"):
                i += 1
        elif _kw_at(toks, i, "INTO"):
            i += 1
        else:
            raise SqlDmlError("expected INSERT INTO / INSERT OVERWRITE")
        table, _name, i = self._table_at(toks, i)
        cols = None
        if i < len(toks) and toks[i].text == "(":
            cols, i = self._paren_idents(toks, i)
        replace_where = None
        if _kw_at(toks, i, "REPLACE", "WHERE"):
            if overwrite:
                raise SqlDmlError(
                    "REPLACE WHERE goes with INSERT INTO, not OVERWRITE"
                )
            j = _find_kw(toks, i + 2, "SELECT")
            jv = _find_kw(toks, i + 2, "VALUES")
            j = min(x for x in (j, jv) if x >= 0) if max(j, jv) >= 0 else -1
            if j < 0:
                raise SqlDmlError("REPLACE WHERE needs a SELECT/VALUES")
            replace_where = sql[toks[i + 1].end:toks[j].start].strip()
            i = j
        if i >= len(toks):
            raise SqlDmlError("INSERT needs SELECT ... or VALUES ...")
        body = sql[toks[i].start:]
        df = self._spark.sql(self._rewrite_query(body, _tokenize(body)))
        schema = table.snapshot().schema
        if cols is not None:
            if len(cols) != len(df.columns):
                raise SqlDmlError(
                    f"INSERT column list has {len(cols)} names but the"
                    f" query produces {len(df.columns)} columns"
                )
            df = df.toDF(*cols)
            from mack_spark.sources.delta_log import _column_defaults

            defaults = _column_defaults(schema)
            for f in schema.fields:
                if f.name not in cols:
                    # spec §Default Columns: omitted columns fill from
                    # CURRENT_DEFAULT; NULL otherwise
                    fill = (
                        F.expr(defaults[f.name])
                        if f.name in defaults else F.lit(None)
                    )
                    df = df.withColumn(f.name, fill.cast(f.dataType))
        elif len(df.columns) == len(schema.fields):
            # positional: VALUES / SELECT columns map to schema order
            df = df.toDF(*[f.name for f in schema.fields])
        if replace_where is not None:
            table.overwrite(df, replace_where=replace_where)
        elif overwrite:
            table.overwrite(df)
        else:
            table.append(df)
        snap = table.snapshot()
        return self._metrics_df({
            "version": snap.version,
            "mode": (
                "replaceWhere" if replace_where is not None
                else "overwrite" if overwrite else "append"
            ),
        })

    # -- DESCRIBE -------------------------------------------------------

    def _describe(self, toks: List[_Tok]) -> DataFrame:
        if _kw_at(toks, 1, "HISTORY"):
            table, _, i = self._table_at(toks, 2)
            limit = None
            if i < len(toks) and _kw_at(toks, i, "LIMIT"):
                if i + 1 >= len(toks) or toks[i + 1].kind != "num":
                    raise SqlDmlError("LIMIT needs a number")
                limit = int(toks[i + 1].text)
            rows = table.history()
            if limit is not None:
                rows = rows[:limit]
            import datetime as _dt

            data = [
                (
                    int(r.get("version", -1)),
                    _dt.datetime.fromtimestamp(r["timestamp"] / 1000.0)
                    if r.get("timestamp") is not None else None,
                    r.get("operation"),
                    _str_map(r.get("operationParameters")),
                    _str_map(r.get("operationMetrics")),
                )
                for r in rows
            ]
            return self._spark.createDataFrame(data, _HISTORY_SCHEMA)
        if _kw_at(toks, 1, "DETAIL"):
            table, _, _ = self._table_at(toks, 2)
            d = table.detail()
            row = (
                d["format"], d["location"], int(d["numFiles"]),
                int(d["sizeInBytes"]), list(d["partitionColumns"]),
                list(d["clusteringColumns"]), _str_map(d["properties"]),
                d["minReaderVersion"], d["minWriterVersion"],
                list(d["tableFeatures"]), int(d["version"]),
            )
            return self._spark.createDataFrame([row], _DETAIL_SCHEMA)
        # plain DESCRIBE [TABLE] t — delta-spark's column listing with
        # the partition-information section
        i = 1
        if _kw_at(toks, i, "TABLE"):
            i += 1
        table, _, _ = self._table_at(toks, i)
        snap = table.snapshot()
        rows = [
            (f.name, f.dataType.simpleString(),
             (f.metadata or {}).get("comment"))
            for f in snap.schema.fields
        ]
        pcols = snap.partition_columns
        if pcols:
            types = {f.name: f.dataType.simpleString()
                     for f in snap.schema.fields}
            rows.append(("# Partition Information", "", ""))
            rows.append(("# col_name", "data_type", "comment"))
            rows += [(c, types.get(c, ""), None) for c in pcols]
        return self._spark.createDataFrame(
            rows,
            StructType([
                StructField("col_name", StringType()),
                StructField("data_type", StringType()),
                StructField("comment", StringType()),
            ]),
        )

    # -- OPTIMIZE / VACUUM / RESTORE -------------------------------------

    def _optimize(self, sql: str, toks: List[_Tok]) -> DataFrame:
        table, _, i = self._table_at(toks, 1)
        where = None
        zorder = None
        zi = _find_kw(toks, i, "ZORDER", "BY")
        wi = _find_kw(toks, i, "WHERE")
        if wi >= 0:
            end = toks[zi].start if zi >= 0 else toks[-1].end
            where = sql[toks[wi].end:end].strip()
        if zi >= 0:
            zorder, _ = self._paren_idents(toks, zi + 2)
        return self._metrics_df(table.optimize(where=where, zorder_by=zorder))

    def _vacuum(self, toks: List[_Tok]) -> DataFrame:
        table, _, i = self._table_at(toks, 1)
        retention = None
        dry = False
        lite = False
        if i < len(toks) and _kw_at(toks, i, "LITE"):
            lite = True
            i += 1
        if i < len(toks) and _kw_at(toks, i, "RETAIN"):
            if i + 2 >= len(toks) or toks[i + 1].kind != "num":
                raise SqlDmlError("VACUUM RETAIN takes '<n> HOURS'")
            retention = float(toks[i + 1].text)
            if not _kw_at(toks, i + 2, "HOURS"):
                raise SqlDmlError("VACUUM RETAIN takes '<n> HOURS'")
            i += 3
        if i < len(toks) and _kw_at(toks, i, "DRY", "RUN"):
            dry = True
            i += 2
        if i != len(toks):
            raise SqlDmlError(f"unexpected token {toks[i].text!r} in VACUUM")
        paths = table.vacuum(
            retention_hours=retention, dry_run=dry, lite=lite
        )
        return self._spark.createDataFrame(
            [(p,) for p in paths],
            StructType([StructField("path", StringType())]),
        )

    def _restore(self, toks: List[_Tok]) -> DataFrame:
        i = 2 if _kw_at(toks, 1, "TABLE") else 1
        table, _, i = self._table_at(toks, i)
        if _kw_at(toks, i, "TO"):
            i += 1
        if _kw_at(toks, i, "VERSION", "AS", "OF"):
            return self._metrics_df(table.restore(int(toks[i + 3].text)))
        if _kw_at(toks, i, "TIMESTAMP", "AS", "OF"):
            return self._metrics_df(
                table.restore_to_timestamp(self._string_lit(toks[i + 3]))
            )
        raise SqlDmlError(
            "RESTORE needs TO VERSION AS OF <n> or TO TIMESTAMP AS OF '<ts>'"
        )

    # -- ALTER TABLE ------------------------------------------------------

    def _alter(self, sql: str, toks: List[_Tok]) -> DataFrame:
        if not _kw_at(toks, 1, "TABLE"):
            raise SqlDmlError("expected ALTER TABLE")
        table, name, i = self._table_at(toks, 2)

        def done(**extra) -> DataFrame:
            v = table.snapshot().version
            return self._metrics_df(dict({"table": name, "version": v},
                                         **extra))

        if _kw_at(toks, i, "ADD", "COLUMNS"):
            cols, _ = self._paren_idents(toks, i + 2, with_types=True)
            for cname, ctype in cols:
                table.add_column(cname, ctype)
            return done(added=json.dumps([c for c, _ in cols]))
        if _kw_at(toks, i, "ADD", "COLUMN"):
            cname = _unquote_ident(toks[i + 2].text)
            ctype = sql[toks[i + 2].end:toks[-1].end].strip()
            if not ctype:
                raise SqlDmlError("ADD COLUMN needs a type")
            table.add_column(cname, ctype)
            return done(added=json.dumps([cname]))
        if _kw_at(toks, i, "ALTER", "COLUMN") or _kw_at(
            toks, i, "CHANGE", "COLUMN"
        ):
            cname = _unquote_ident(toks[i + 2].text)
            if _kw_at(toks, i + 3, "TYPE"):
                ctype = sql[toks[i + 3].end:toks[-1].end].strip()
                table.alter_column_type(cname, ctype)
                return done(widened=json.dumps({cname: ctype}))
            if _kw_at(toks, i + 3, "SET", "DEFAULT"):
                expr = sql[toks[i + 4].end:toks[-1].end].strip()
                table.set_column_default(cname, expr)
                return done(default=json.dumps({cname: expr}))
            if _kw_at(toks, i + 3, "DROP", "DEFAULT"):
                table.set_column_default(cname, None)
                return done(default=json.dumps({cname: None}))
            raise SqlDmlError(
                "ALTER COLUMN supports TYPE <wider-type>,"
                " SET DEFAULT <expr>, DROP DEFAULT"
            )
        if _kw_at(toks, i, "RENAME", "COLUMN"):
            old = _unquote_ident(toks[i + 2].text)
            if not _kw_at(toks, i + 3, "TO"):
                raise SqlDmlError("RENAME COLUMN needs TO")
            new = _unquote_ident(toks[i + 4].text)
            table.rename_column(old, new)
            return done(renamed=json.dumps({old: new}))
        if _kw_at(toks, i, "DROP", "COLUMNS"):
            cols, _ = self._paren_idents(toks, i + 2)
            for cname in cols:
                table.drop_column(cname)
            return done(dropped=json.dumps(cols))
        if _kw_at(toks, i, "DROP", "COLUMN"):
            cname = _unquote_ident(toks[i + 2].text)
            table.drop_column(cname)
            return done(dropped=json.dumps([cname]))
        if _kw_at(toks, i, "SET", "TBLPROPERTIES"):
            props = self._tblproperties(toks, i + 2)
            table.set_properties(props)
            return done(set=json.dumps(sorted(props)))
        if _kw_at(toks, i, "UNSET", "TBLPROPERTIES"):
            j = i + 2
            if _kw_at(toks, j, "IF", "EXISTS"):
                j += 2
            keys, _ = self._paren_keys(toks, j)
            table.unset_properties(keys)
            return done(unset=json.dumps(sorted(keys)))
        if _kw_at(toks, i, "ADD", "CONSTRAINT"):
            cname = _unquote_ident(toks[i + 2].text)
            if not _kw_at(toks, i + 3, "CHECK"):
                raise SqlDmlError("ADD CONSTRAINT needs CHECK (expr)")
            if toks[i + 4].text != "(":
                raise SqlDmlError("CHECK needs a parenthesized expression")
            close = toks[-1]
            if close.text != ")":
                raise SqlDmlError("unterminated CHECK (expr)")
            expr = sql[toks[i + 4].end:close.start].strip()
            table.add_constraint(cname, expr)
            return done(constraint=cname)
        if _kw_at(toks, i, "DROP", "CONSTRAINT"):
            cname = _unquote_ident(toks[i + 2].text)
            table.drop_constraint(cname)
            return done(dropped_constraint=cname)
        if _kw_at(toks, i, "CLUSTER", "BY", "NONE"):
            table.set_cluster_by([])
            return done(cluster_by=json.dumps([]))
        if _kw_at(toks, i, "CLUSTER", "BY"):
            cols, _ = self._paren_idents(toks, i + 2)
            table.set_cluster_by(cols)
            return done(cluster_by=json.dumps(cols))
        raise SqlDmlError(
            f"unsupported ALTER TABLE action at {toks[i].text!r}"
        )

    def _paren_keys(self, toks: List[_Tok], i: int) -> Tuple[List[str], int]:
        """Parse ``('k1', 'k2', ...)`` at ``i`` (UNSET TBLPROPERTIES)."""
        if i >= len(toks) or toks[i].text != "(":
            raise SqlDmlError("UNSET TBLPROPERTIES needs ('k', ...)")
        depth0 = toks[i].depth
        keys: List[str] = []
        j = i + 1
        while j < len(toks) and not (
            toks[j].text == ")" and toks[j].depth == depth0
        ):
            if toks[j].text == ",":
                j += 1
                continue
            keys.append(self._string_lit(toks[j]))
            j += 1
        if j >= len(toks):
            raise SqlDmlError("unterminated UNSET TBLPROPERTIES list")
        return keys, j + 1

    def _tblproperties(self, toks: List[_Tok], i: int) -> Dict[str, str]:
        """Parse ``('k' = 'v', ...)`` at ``i``."""
        if i >= len(toks) or toks[i].text != "(":
            raise SqlDmlError("TBLPROPERTIES needs ('k'='v', ...)")
        depth0 = toks[i].depth
        props: Dict[str, str] = {}
        j = i + 1
        while j < len(toks) and not (
            toks[j].text == ")" and toks[j].depth == depth0
        ):
            if j + 2 >= len(toks):
                raise SqlDmlError("unterminated TBLPROPERTIES list")
            k = self._string_lit(toks[j])
            if toks[j + 1].text != "=":
                raise SqlDmlError("TBLPROPERTIES needs 'k' = 'v' pairs")
            props[k] = self._string_lit(toks[j + 2])
            j += 3
            if j < len(toks) and toks[j].text == ",":
                j += 1
        if j >= len(toks):
            raise SqlDmlError("unterminated TBLPROPERTIES list")
        return props

    # -- CREATE TABLE / CONVERT -------------------------------------------

    def _create(self, sql: str, toks: List[_Tok]) -> DataFrame:
        from mack_spark.sources.delta_log import DeltaProtocolTable

        i = 1
        or_replace = False
        if _kw_at(toks, i, "OR", "REPLACE"):
            or_replace = True
            i += 2
        if not _kw_at(toks, i, "TABLE"):
            raise SqlDmlError("expected CREATE [OR REPLACE] TABLE")
        i += 1
        if_not_exists = False
        if _kw_at(toks, i, "IF", "NOT", "EXISTS"):
            if_not_exists = True
            i += 3
        # the name token: registry name (needs LOCATION) or delta.`path`
        path = None
        reg_name = None
        t = toks[i]
        if (
            t.kind == "word" and t.upper == "DELTA"
            and toks[i + 1].text == "." and toks[i + 2].kind == "bquote"
        ):
            path = _unquote_ident(toks[i + 2].text)
            i += 3
        elif t.kind in ("word", "bquote"):
            reg_name = _unquote_ident(t.text)
            i += 1
        else:
            raise SqlDmlError(f"cannot parse CREATE TABLE name {t.text!r}")

        # CLONE form: CREATE TABLE t [SHALLOW|DEEP] CLONE src [LOCATION]
        clone_kind = None
        if _kw_at(toks, i, "SHALLOW", "CLONE"):
            clone_kind, i = "shallow", i + 2
        elif _kw_at(toks, i, "DEEP", "CLONE"):
            clone_kind, i = "deep", i + 2
        elif _kw_at(toks, i, "CLONE"):
            clone_kind, i = "deep", i + 1  # delta: bare CLONE is deep
        if clone_kind is not None:
            src, _sname, i = self._table_at(toks, i)
            version_of = None
            if _kw_at(toks, i, "VERSION", "AS", "OF"):
                version_of = int(toks[i + 3].text)
                i += 4
            elif _kw_at(toks, i, "TIMESTAMP", "AS", "OF"):
                version_of = src.version_at_timestamp(
                    src._ts_ms(self._string_lit(toks[i + 3]))
                )
                i += 4
            if _kw_at(toks, i, "LOCATION"):
                path = self._string_lit(toks[i + 1])
                i += 2
            if i != len(toks):
                raise SqlDmlError(
                    f"unexpected token {toks[i].text!r} in CLONE"
                )
            if path is None:
                raise SqlDmlError(
                    "CLONE needs LOCATION '<path>' or the delta.`/path`"
                    " target form"
                )
            fn = (
                DeltaProtocolTable.shallow_clone
                if clone_kind == "shallow"
                else DeltaProtocolTable.deep_clone
            )
            table = fn(self._spark, src.path, path,
                       version_as_of=version_of)
            if reg_name:
                self.register(reg_name, table)
            return self._metrics_df({
                "path": path, "clone": clone_kind,
                "source": src.path,
                "version": table.snapshot().version,
            })

        col_defs = None
        if i < len(toks) and toks[i].text == "(":
            items, i = self._paren_items(toks, i)
            col_defs = [self._parse_col_def(sql, it) for it in items]
        if not _kw_at(toks, i, "USING", "DELTA"):
            raise SqlDmlError("only CREATE TABLE ... USING DELTA is supported")
        i += 2

        partition_by = None
        cluster_by = None
        properties = None
        select_sql = None
        while i < len(toks):
            if _kw_at(toks, i, "PARTITIONED", "BY"):
                partition_by, i = self._paren_idents(toks, i + 2)
            elif _kw_at(toks, i, "CLUSTER", "BY"):
                cluster_by, i = self._paren_idents(toks, i + 2)
            elif _kw_at(toks, i, "TBLPROPERTIES"):
                properties = self._tblproperties(toks, i + 1)
                # skip past the closing paren
                depth0 = toks[i + 1].depth
                j = i + 2
                while not (toks[j].text == ")" and toks[j].depth == depth0):
                    j += 1
                i = j + 1
            elif _kw_at(toks, i, "LOCATION"):
                path = self._string_lit(toks[i + 1])
                i += 2
            elif _kw_at(toks, i, "AS"):
                select_sql = sql[toks[i].end:].strip()
                break
            else:
                raise SqlDmlError(
                    f"unexpected token {toks[i].text!r} in CREATE TABLE"
                )
        if path is None:
            raise SqlDmlError(
                "CREATE TABLE needs LOCATION '<path>' or the"
                " delta.`/path` name form (no metastore here)"
            )
        if col_defs is None and select_sql is None:
            raise SqlDmlError("CREATE TABLE needs (column defs) or AS SELECT")

        identity = None
        if select_sql is not None:
            stoks = _tokenize(select_sql)
            df = self._spark.sql(self._rewrite_query(select_sql, stoks))
        else:
            from pyspark.sql.types import (
                StructField as _SF,
                StructType as _ST,
                _parse_datatype_string,
            )

            fields = []
            for d in col_defs:
                if d["identity"] is not None:
                    # identity columns go through create()'s identity
                    # param (appended as bigint, hwm-managed) — never
                    # through the frame schema
                    identity = dict(identity or {})
                    identity[d["name"]] = d["identity"]
                    continue
                md = {}
                if d["generated"] is not None:
                    md["delta.generationExpression"] = d["generated"]
                if d["default"] is not None:
                    md["CURRENT_DEFAULT"] = d["default"]
                fields.append(_SF(
                    d["name"], _parse_datatype_string(d["type"]),
                    d["nullable"], md,
                ))
            df = self._spark.createDataFrame([], _ST(fields))

        if DeltaProtocolTable.is_delta(path):
            if if_not_exists:
                table = DeltaProtocolTable(self._spark, path)
                if reg_name:
                    self.register(reg_name, table)
                return self._metrics_df(
                    {"path": path, "created": json.dumps(False),
                     "version": table.snapshot().version}
                )
            if or_replace and select_sql is not None:
                if partition_by or cluster_by or properties:
                    raise SqlDmlError(
                        "CREATE OR REPLACE on an existing table only"
                        " replaces the DATA here — a new table spec"
                        " (PARTITIONED/CLUSTER BY, TBLPROPERTIES) is"
                        " not applied; ALTER the table or recreate it"
                    )
                table = DeltaProtocolTable(self._spark, path)
                table.overwrite(df)
                if reg_name:
                    self.register(reg_name, table)
                return self._metrics_df(
                    {"path": path, "created": json.dumps(False),
                     "version": table.snapshot().version}
                )
            raise SqlDmlError(f"table already exists at {path}")
        table = DeltaProtocolTable.create(
            self._spark, path, df,
            partition_by=partition_by, properties=properties,
            cluster_by=cluster_by, identity=identity,
        )
        if reg_name:
            self.register(reg_name, table)
        return self._metrics_df(
            {"path": path, "created": json.dumps(True),
             "version": table.snapshot().version}
        )

    def _parse_col_def(self, sql: str, item: List[_Tok]) -> dict:
        """One CREATE TABLE column definition: ``name type [NOT NULL]
        [GENERATED ALWAYS AS (expr) | GENERATED ALWAYS|BY DEFAULT AS
        IDENTITY [(START WITH n INCREMENT BY m)]]``."""
        if len(item) < 2:
            raise SqlDmlError(
                f"column {item[0].text!r} needs a type"
            )
        name = _unquote_ident(item[0].text)
        opts_at = len(item)
        for idx in range(1, len(item)):
            t = item[idx]
            if t.kind == "word" and t.upper in (
                "GENERATED", "NOT", "DEFAULT",
            ):
                opts_at = idx
                break
        if opts_at <= 1:
            # 'c NOT NULL' with no type: the slice below would be a
            # reversed span and fail later with a confusing datatype
            # parse error
            raise SqlDmlError(f"column {name!r} needs a type")
        typ = sql[item[1].start:item[opts_at - 1].end]
        d = {"name": name, "type": typ, "nullable": True,
             "generated": None, "identity": None, "default": None}
        j = opts_at
        while j < len(item):
            if _kw_at(item, j, "NOT", "NULL"):
                d["nullable"] = False
                j += 2
            elif _kw_at(item, j, "DEFAULT"):
                # the default expression runs to the next option
                # keyword (or item end)
                k = j + 1
                while k < len(item) and not (
                    item[k].kind == "word"
                    and item[k].upper in ("GENERATED", "NOT")
                    and item[k].depth == item[j].depth
                ):
                    k += 1
                if k == j + 1:
                    raise SqlDmlError(
                        f"DEFAULT needs an expression for {name!r}"
                    )
                d["default"] = sql[item[j + 1].start:item[k - 1].end]
                j = k
            elif _kw_at(item, j, "GENERATED"):
                if _kw_at(item, j + 1, "ALWAYS", "AS", "IDENTITY"):
                    allow = False
                    j += 4
                elif _kw_at(item, j + 1, "BY", "DEFAULT", "AS",
                            "IDENTITY"):
                    allow = True
                    j += 5
                elif _kw_at(item, j + 1, "ALWAYS", "AS") and (
                    j + 3 < len(item) and item[j + 3].text == "("
                ):
                    # generation expression: the parenthesized text
                    depth0 = item[j + 3].depth
                    k = j + 4
                    while k < len(item) and not (
                        item[k].text == ")" and item[k].depth == depth0
                    ):
                        k += 1
                    if k >= len(item):
                        raise SqlDmlError(
                            "unterminated GENERATED ALWAYS AS (expr)"
                        )
                    d["generated"] = sql[
                        item[j + 3].end:item[k].start
                    ].strip()
                    j = k + 1
                    continue
                else:
                    raise SqlDmlError(
                        f"cannot parse GENERATED clause for {name!r}"
                    )
                start, step = 1, 1
                if j < len(item) and item[j].text == "(":
                    if not _kw_at(item, j + 1, "START", "WITH"):
                        raise SqlDmlError(
                            "IDENTITY options need START WITH"
                        )
                    start = int(item[j + 3].text)
                    if not _kw_at(item, j + 4, "INCREMENT", "BY"):
                        raise SqlDmlError(
                            "IDENTITY options need INCREMENT BY"
                        )
                    stepi = j + 6
                    neg = item[stepi].text == "-"
                    if neg:
                        stepi += 1
                    step = int(item[stepi].text) * (-1 if neg else 1)
                    j = stepi + 2  # past the closing paren
                else:
                    pass
                if typ.strip().lower() not in ("bigint", "long"):
                    raise SqlDmlError(
                        f"IDENTITY column {name!r} must be BIGINT"
                    )
                d["identity"] = {
                    "start": start, "step": step,
                    "allow_explicit_insert": allow,
                }
            else:
                raise SqlDmlError(
                    f"unsupported column option {item[j].text!r} for"
                    f" {name!r}"
                )
        return d

    def _convert(self, toks: List[_Tok]) -> DataFrame:
        from mack_spark.sources.delta_log import DeltaProtocolTable

        if not _kw_at(toks, 1, "TO", "DELTA"):
            raise SqlDmlError("expected CONVERT TO DELTA parquet.`/path`")
        i = 3
        if not (
            toks[i].kind == "word" and toks[i].upper == "PARQUET"
            and toks[i + 1].text == "." and toks[i + 2].kind == "bquote"
        ):
            raise SqlDmlError("CONVERT TO DELTA takes parquet.`/path`")
        path = _unquote_ident(toks[i + 2].text)
        i += 3
        partition_by = None
        if i < len(toks) and _kw_at(toks, i, "PARTITIONED", "BY"):
            cols, i = self._paren_idents(toks, i + 2, with_types=True)
            partition_by = [c for c, _ in cols]
        if i != len(toks):
            raise SqlDmlError(
                f"unexpected token {toks[i].text!r} in CONVERT TO DELTA"
            )
        table = DeltaProtocolTable.convert_from_parquet(
            self._spark, path, partition_by=partition_by
        )
        snap = table.snapshot()
        return self._metrics_df(
            {"path": path, "version": snap.version,
             "numFiles": len(snap.files)}
        )

    # -- SHOW / FSCK ------------------------------------------------------

    def _show(self, toks: List[_Tok]) -> DataFrame:
        if _kw_at(toks, 1, "CREATE", "TABLE"):
            table, name, _ = self._table_at(toks, 3)
            snap = table.snapshot()
            cols = []
            for f in snap.schema.fields:
                line = f"  `{f.name}` {f.dataType.simpleString().upper()}"
                if not f.nullable:
                    line += " NOT NULL"
                cols.append(line)
            ident = (
                f"delta.`{table.path}`" if name is None else f"`{name}`"
            )
            stmt = (
                f"CREATE TABLE {ident} (\n" + ",\n".join(cols) + ")\n"
                "USING DELTA"
            )
            pcols = snap.partition_columns
            if pcols:
                stmt += "\nPARTITIONED BY (" + ", ".join(
                    f"`{c}`" for c in pcols
                ) + ")"
            ccols = table.clustering_columns(snap)
            if ccols:
                stmt += "\nCLUSTER BY (" + ", ".join(
                    f"`{c}`" for c in ccols
                ) + ")"
            cfg = snap.metadata.get("configuration") or {}
            if cfg:
                stmt += "\nTBLPROPERTIES (" + ", ".join(
                    "'{}' = '{}'".format(
                        k.replace("'", "''"), v.replace("'", "''")
                    )
                    for k, v in sorted(cfg.items())
                ) + ")"
            stmt += f"\nLOCATION '{table.path}'"
            return self._spark.createDataFrame(
                [(stmt,)],
                StructType([StructField("createtab_stmt", StringType())]),
            )
        if _kw_at(toks, 1, "TBLPROPERTIES"):
            table, _, _ = self._table_at(toks, 2)
            cfg = table.snapshot().metadata.get("configuration") or {}
            return self._spark.createDataFrame(
                sorted(cfg.items()),
                StructType([StructField("key", StringType()),
                            StructField("value", StringType())]),
            )
        if _kw_at(toks, 1, "COLUMNS", "IN") or _kw_at(
            toks, 1, "COLUMNS", "FROM"
        ):
            table, _, _ = self._table_at(toks, 3)
            names = [f.name for f in table.snapshot().schema.fields]
            return self._spark.createDataFrame(
                [(n,) for n in names],
                StructType([StructField("col_name", StringType())]),
            )
        if _kw_at(toks, 1, "PARTITIONS"):
            table, _, _ = self._table_at(toks, 2)
            snap = table.snapshot()
            pcols = snap.partition_columns
            if not pcols:
                raise SqlDmlError("SHOW PARTITIONS: table is unpartitioned")
            types = {f.name: f.dataType for f in snap.schema.fields}
            phys = (
                snap.physical_names()
                if snap.column_mapping_mode != "none"
                else {c: c for c in pcols}
            )
            seen = sorted({
                tuple(
                    (a.get("partitionValues") or {}).get(phys[c])
                    for c in pcols
                )
                for a in snap.files.values()
            }, key=lambda t: tuple("" if v is None else v for v in t))
            df = self._spark.createDataFrame(
                seen or [],
                StructType([StructField(c, StringType()) for c in pcols]),
            )
            for c in pcols:
                df = df.withColumn(c, F.col(f"`{c}`").cast(types[c]))
            return df
        raise SqlDmlError(
            "SHOW supports TBLPROPERTIES, COLUMNS IN/FROM, PARTITIONS"
        )

    def _fsck(self, toks: List[_Tok]) -> DataFrame:
        if not _kw_at(toks, 1, "REPAIR", "TABLE"):
            raise SqlDmlError("expected FSCK REPAIR TABLE <t> [DRY RUN]")
        table, _, i = self._table_at(toks, 3)
        dry = False
        if i < len(toks) and _kw_at(toks, i, "DRY", "RUN"):
            dry = True
            i += 2
        if i != len(toks):
            raise SqlDmlError(f"unexpected token {toks[i].text!r} in FSCK")
        missing = table.fsck_repair(dry_run=dry)
        return self._spark.createDataFrame(
            [(p,) for p in missing],
            StructType([StructField("path", StringType())]),
        )

    # -- SELECT rewrite -----------------------------------------------------

    def _rewrite_query(self, sql: str, toks: List[_Tok]) -> str:
        """Rewrite protocol-table references in a SELECT to temp views:

        * ``FROM|JOIN <registered-name> [VERSION AS OF n | TIMESTAMP AS
          OF 'ts']`` — the time-travel suffix is consumed; the scan is
          the snapshot's pruned read.
        * ``FROM|JOIN delta.`/path``` with the same optional suffix.
        * ``table_changes('name-or-path', lo[, hi])`` anywhere — the
          CDF read as a view (version numbers or timestamp strings).

        Names NOT after FROM/JOIN are left alone (they may be column
        references); unregistered names pass through to Spark's own
        catalog resolution."""
        from mack_spark.sources.delta_log import DeltaProtocolTable

        spans: List[Tuple[int, int, str]] = []  # (start, end, replacement)
        from_depths: set = set()
        i = 0
        n = len(toks)
        while i < n:
            t = toks[i]
            # table_changes('t', lo[, hi]) — at any depth
            if (
                t.kind == "word" and t.upper == "TABLE_CHANGES"
                and i + 1 < n and toks[i + 1].text == "("
            ):
                j = i + 2
                depth0 = toks[i + 1].depth
                args: List[_Tok] = []
                while j < n and not (
                    toks[j].text == ")" and toks[j].depth == depth0
                ):
                    if toks[j].text != ",":
                        args.append(toks[j])
                    j += 1
                if j >= n:
                    raise SqlDmlError("unterminated table_changes(...)")
                view = self._next_view(self._table_changes_df(args))
                spans.append((t.start, toks[j].end, view))
                i = j + 1
                continue
            # clause keywords end a FROM table list — commas after
            # them (ORDER BY a, b) are NOT table separators; join
            # syntax (LEFT/ON/USING...) stays inside the list
            if (
                t.kind == "word" and t.depth in from_depths
                and t.upper in self._FROM_END
            ):
                from_depths.discard(t.depth)
            # a comma at the depth of an open FROM list continues it
            # (FROM a, b) — treat it like FROM again
            if t.kind == "word" and t.upper in ("FROM", "JOIN") or (
                t.text == "," and t.depth in from_depths
            ):
                j = i + 1
                if t.kind == "word" and t.upper == "FROM":
                    # the FROM list is open even when its first item is
                    # a derived table '(SELECT ...)': a later comma at
                    # this depth still continues the table list
                    from_depths.add(t.depth)
                if j >= n or toks[j].text == "(":
                    i += 1
                    continue
                table = None
                name = None
                version_of = None
                timestamp_of = None
                if (
                    toks[j].kind == "word" and toks[j].upper == "DELTA"
                    and j + 2 < n and toks[j + 1].text == "."
                    and toks[j + 2].kind == "bquote"
                ):
                    path = _unquote_ident(toks[j + 2].text)
                    # delta-spark's path@v3 / path@yyyyMMddHHmmssSSS
                    # time-travel suffix INSIDE the backticks
                    if "@" in path:
                        base, _, suf = path.rpartition("@")
                        v, ts = _parse_at_suffix(suf)
                        if v is not None or ts is not None:
                            path, version_of, timestamp_of = base, v, ts
                    table = DeltaProtocolTable(self._spark, path)
                    ref_start, ref_end = toks[j].start, toks[j + 2].end
                    j += 3
                elif toks[j].kind in ("word", "bquote"):
                    name = _unquote_ident(toks[j].text)
                    if name in self._tables:
                        table = self._tables[name]
                        ref_start, ref_end = toks[j].start, toks[j].end
                        j += 1
                if table is None:
                    i += 1
                    continue
                if _kw_at(toks, j, "VERSION", "AS", "OF"):
                    version_of = int(toks[j + 3].text)
                    ref_end = toks[j + 3].end
                    j += 4
                elif _kw_at(toks, j, "TIMESTAMP", "AS", "OF"):
                    timestamp_of = self._string_lit(toks[j + 3])
                    ref_end = toks[j + 3].end
                    j += 4
                elif (
                    j + 1 < n and toks[j].text == "@"
                    and toks[j + 1].kind in ("word", "num")
                ):
                    # name@v3 / name@yyyyMMddHHmmssSSS (delta-spark's
                    # identifier time-travel shorthand)
                    v, ts = _parse_at_suffix(toks[j + 1].text)
                    if v is None and ts is None:
                        raise SqlDmlError(
                            f"bad @ time-travel suffix"
                            f" {toks[j + 1].text!r} — expected @v<N> or"
                            " @yyyyMMddHHmmssSSS"
                        )
                    version_of, timestamp_of = v, ts
                    ref_end = toks[j + 1].end
                    j += 2
                df = table.to_df(
                    version_as_of=version_of, timestamp_as_of=timestamp_of
                )
                repl = self._next_view(df)
                # qualified column refs (`tbl.pkey`) must keep resolving:
                # alias the view back to the original name UNLESS the
                # statement supplies its own alias right after the ref
                if name is not None and not self._user_alias_follows(
                    toks, j
                ):
                    repl = f"{repl} AS {name}"
                spans.append((ref_start, ref_end, repl))
                i = j
                continue
            i += 1
        out = []
        pos = 0
        for start, end, repl in spans:
            out.append(sql[pos:start])
            out.append(repl)
            pos = end
        out.append(sql[pos:])
        return "".join(out)

    # keywords that terminate a FROM table list (the join family does
    # NOT — `FROM a JOIN b ON ..., c` keeps the list open)
    _FROM_END = {
        "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "WINDOW",
        "UNION", "EXCEPT", "INTERSECT", "MINUS", "QUALIFY",
        "DISTRIBUTE", "CLUSTER", "SORT", "PIVOT", "UNPIVOT", "SELECT",
    }

    _ALIAS_STOP = {
        "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "WINDOW", "JOIN",
        "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "SEMI", "ANTI",
        "NATURAL", "LATERAL", "UNION", "EXCEPT", "INTERSECT", "MINUS",
        "ON", "USING", "QUALIFY", "DISTRIBUTE", "CLUSTER", "SORT",
        "PIVOT", "UNPIVOT", "TABLESAMPLE",
    }

    def _user_alias_follows(self, toks: List[_Tok], j: int) -> bool:
        """True when the token after a rewritten table ref is the
        statement's own alias (``FROM t x`` / ``FROM t AS x``)."""
        if j >= len(toks):
            return False
        t = toks[j]
        if t.kind == "word" and t.upper == "AS":
            return True
        return (
            t.kind in ("word", "bquote")
            and t.upper not in self._ALIAS_STOP
        )

    def _table_changes_df(self, args: List[_Tok]) -> DataFrame:
        from mack_spark.sources.delta_log import DeltaProtocolTable

        if not args:
            raise SqlDmlError("table_changes needs ('name', start[, end])")
        name = self._string_lit(args[0])
        if name in self._tables:
            table = self._tables[name]
        else:
            table = DeltaProtocolTable(self._spark, name)
        kw: Dict[str, object] = {}

        def bound(tok: _Tok, which: str):
            if tok.kind == "num":
                kw[f"{which}_version"] = int(tok.text)
            else:
                kw[f"{which}_timestamp"] = self._string_lit(tok)

        if len(args) >= 2:
            bound(args[1], "starting")
        if len(args) >= 3:
            bound(args[2], "ending")
        if len(args) > 3:
            raise SqlDmlError("table_changes takes at most 3 arguments")
        return table.table_changes(**kw)
