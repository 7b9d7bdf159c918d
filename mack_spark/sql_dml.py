"""SQL DML front-end for open-protocol Delta tables.

delta-spark users write mutations as SQL text — ``MERGE INTO``,
``UPDATE``, ``DELETE FROM`` (reference users inherit that surface from
delta-spark; the reference itself builds the same MERGE through
``DeltaTable.merge``, mack/__init__.py:125-139). Spark's open-source
parser only routes those statements to a catalog with a Delta
extension installed, so this module parses the three statement shapes
itself and compiles them onto the SAME executors the Python API uses:

* ``MERGE INTO``  → :class:`mack_spark.tables.KeyedMerge` →
  :meth:`DeltaProtocolTable.merge` (file-pruned two-phase MERGE, one
  atomic commit). Clause expressions pass through VERBATIM — KeyedMerge
  expressions are already SQL over the statement's own aliases.
* ``UPDATE``      → :meth:`DeltaProtocolTable.update_where`
* ``DELETE FROM`` → :meth:`DeltaProtocolTable.delete_where`

Targets resolve through an explicit name→table registry (the pattern
``register_star_schema`` uses for SELECT views) or delta-spark's
path syntax ``delta.`/path/to/table```. Sources in ``USING`` resolve
from the registry, the session catalog (temp views), or an inline
``(SELECT ...)`` subquery executed by Spark itself.

SCALE: parsing is O(statement text) on the driver; everything after
the parse is the existing distributed MERGE/UPDATE/DELETE machinery —
no new execution path, no driver data movement.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple, Union

from pyspark.sql import SparkSession

__all__ = ["DeltaSqlDml", "execute_dml", "SqlDmlError"]


class SqlDmlError(ValueError):
    """The statement does not parse, or uses a shape the descriptor
    subset cannot express (e.g. two WHEN MATCHED UPDATE clauses)."""


# ---------------------------------------------------------------- tokens

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<string>'(?:[^'\\]|\\.|'')*')
    | (?P<dstring>"(?:[^"\\]|\\.)*")
    | (?P<bquote>`(?:[^`]|``)*`)
    | (?P<num>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?)
    | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<op><=>|<>|<=|>=|!=|\|\||::|[(),.;=<>*+\-/%\[\]{}@])
    """,
    re.VERBOSE,
)


class _Tok:
    __slots__ = ("kind", "text", "start", "end", "depth")

    def __init__(self, kind, text, start, end, depth):
        self.kind = kind
        self.text = text
        self.start = start
        self.end = end
        self.depth = depth

    @property
    def upper(self) -> str:
        return self.text.upper() if self.kind == "word" else self.text

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Tok({self.text!r}@{self.start},d{self.depth})"


def _tokenize(sql: str) -> List[_Tok]:
    """Lex ``sql`` into word/operator/literal tokens with paren depth.
    Comments are not supported (raise rather than mis-parse)."""
    out: List[_Tok] = []
    pos, depth = 0, 0
    open_cases = 0
    n = len(sql)
    while pos < n:
        if sql.startswith("--", pos) or sql.startswith("/*", pos):
            raise SqlDmlError(
                "SQL comments are not supported in DML statements —"
                " strip them before execute()"
            )
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            raise SqlDmlError(
                f"cannot lex DML statement at offset {pos}:"
                f" {sql[pos:pos + 20]!r}"
            )
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        if text == "(":
            out.append(_Tok("op", text, m.start(), m.end(), depth))
            depth += 1
            continue
        if text == ")":
            depth -= 1
            if depth < 0:
                raise SqlDmlError("unbalanced ')' in DML statement")
        if m.lastgroup == "word" and text.upper() == "CASE":
            # CASE ... END nests like parens: its WHEN/THEN/ELSE must
            # stay invisible to the MERGE clause scan and the SET
            # comma-splitter
            out.append(_Tok("word", text, m.start(), m.end(), depth))
            depth += 1
            open_cases += 1
            continue
        if (
            m.lastgroup == "word" and text.upper() == "END"
            and open_cases > 0
        ):
            # END closes a CASE only while one is open — `end` is also
            # a legitimate column name (the SCD2 convention)
            depth -= 1
            open_cases -= 1
        out.append(_Tok(m.lastgroup, text, m.start(), m.end(), depth))
    if depth != 0:
        raise SqlDmlError(
            "unbalanced '(' or CASE without END in DML statement"
        )
    return out


def _kw_at(toks: List[_Tok], i: int, *words: str) -> bool:
    """True when word tokens ``words`` appear consecutively at ``i``."""
    if i + len(words) > len(toks):
        return False
    return all(
        toks[i + j].kind == "word" and toks[i + j].upper == w
        for j, w in enumerate(words)
    )


def _find_kw(
    toks: List[_Tok], start: int, *words: str, depth: int = 0
) -> int:
    """Index of the first occurrence of the keyword sequence at the
    given paren depth, or -1."""
    for i in range(start, len(toks)):
        if toks[i].depth == depth and _kw_at(toks, i, *words):
            return i
    return -1


def _unquote_ident(text: str) -> str:
    if text.startswith("`") and text.endswith("`"):
        return text[1:-1].replace("``", "`")
    return text


# ------------------------------------------------------------- the parser


class DeltaSqlDml:
    """Execute SQL DML text against registered open-protocol tables.

    >>> dml = DeltaSqlDml(spark)
    >>> dml.register("customers", "/data/customers")
    >>> dml.execute('''
    ...   MERGE INTO customers t USING updates s
    ...   ON t.pkey = s.pkey
    ...   WHEN MATCHED THEN UPDATE SET *
    ...   WHEN NOT MATCHED THEN INSERT *
    ... ''')
    """

    def __init__(self, spark: SparkSession, tables: Optional[dict] = None):
        self._spark = spark
        self._tables: Dict[str, object] = {}
        for name, t in (tables or {}).items():
            self.register(name, t)

    def register(self, name: str, table) -> "DeltaSqlDml":
        """Register a target/source table under ``name`` — a
        :class:`DeltaProtocolTable` or a path string."""
        from mack_spark.sources.delta_log import DeltaProtocolTable

        if isinstance(table, str):
            table = DeltaProtocolTable(self._spark, table)
        self._tables[name] = table
        return self

    # -- public entry -----------------------------------------------------

    def execute(self, sql: str) -> dict:
        """Parse and run one DML statement; returns the executor's
        metrics dict (``version``, ``touched_files``, ...)."""
        # token offsets index the NORMALIZED text — slice that same text
        sql = sql.strip().rstrip(";")
        toks = _tokenize(sql)
        if not toks:
            raise SqlDmlError("empty DML statement")
        head = toks[0].upper
        if head == "MERGE":
            return self._merge(sql, toks)
        if head == "UPDATE":
            return self._update(sql, toks)
        if head == "DELETE":
            return self._delete(sql, toks)
        raise SqlDmlError(
            f"not a DML statement (expected MERGE/UPDATE/DELETE,"
            f" got {toks[0].text!r}) — run queries through spark.sql()"
        )

    # -- target / source resolution ---------------------------------------

    def _resolve_target(
        self, toks: List[_Tok], i: int
    ) -> Tuple[object, Optional[str], int]:
        """Parse a target table reference at ``i``: ``name``,
        ``delta.`/path/``` or a registry name, plus an optional
        ``[AS] alias``. Returns (table, alias, next index)."""
        from mack_spark.sources.delta_log import DeltaProtocolTable

        if i >= len(toks):
            raise SqlDmlError("missing target table")
        t = toks[i]
        name_fallback = None
        if (
            t.kind == "word" and t.upper == "DELTA"
            and i + 2 < len(toks) and toks[i + 1].text == "."
            and toks[i + 2].kind == "bquote"
        ):
            path = _unquote_ident(toks[i + 2].text)
            table = DeltaProtocolTable(self._spark, path)
            i += 3
        elif t.kind in ("word", "bquote"):
            name = _unquote_ident(t.text)
            if name not in self._tables:
                raise SqlDmlError(
                    f"unknown DML target {name!r} — register(name, path)"
                    " it first, or use delta.`/path` syntax"
                )
            table = self._tables[name]
            name_fallback = name
            i += 1
        else:
            raise SqlDmlError(f"cannot parse target at {t.text!r}")
        alias, i = self._maybe_alias(toks, i)
        if alias is None:
            # no alias: clause expressions reference the table NAME
            # (delta allows both); path targets have no usable name
            alias = name_fallback
        return table, alias, i

    def _maybe_alias(
        self, toks: List[_Tok], i: int
    ) -> Tuple[Optional[str], int]:
        stop = {
            "USING", "ON", "WHEN", "SET", "WHERE", "VALUES", "THEN",
        }
        if i < len(toks) and toks[i].kind == "word" and toks[i].upper == "AS":
            i += 1
            if i >= len(toks) or toks[i].kind not in ("word", "bquote"):
                raise SqlDmlError("expected alias after AS")
            return _unquote_ident(toks[i].text), i + 1
        if (
            i < len(toks)
            and toks[i].kind in ("word", "bquote")
            and toks[i].upper not in stop
        ):
            return _unquote_ident(toks[i].text), i + 1
        return None, i

    def _resolve_source(
        self, sql: str, toks: List[_Tok], i: int
    ):
        """USING <source>: registry name, catalog name (temp view), or
        ``(SELECT ...)``. Returns (DataFrame, alias, next index)."""
        if i < len(toks) and toks[i].text == "(":
            depth0 = toks[i].depth
            j = i + 1
            while j < len(toks) and not (
                toks[j].text == ")" and toks[j].depth == depth0
            ):
                j += 1
            if j >= len(toks):
                raise SqlDmlError("unterminated USING (subquery)")
            sub = sql[toks[i].end:toks[j].start]
            df = self._spark.sql(sub)
            alias, k = self._maybe_alias(toks, j + 1)
            if alias is None:
                raise SqlDmlError("USING (subquery) needs an alias")
            return df, alias, k
        if i >= len(toks) or toks[i].kind not in ("word", "bquote"):
            raise SqlDmlError("cannot parse USING source")
        name = _unquote_ident(toks[i].text)
        if name in self._tables:
            df = self._tables[name].to_df()
        else:
            try:
                df = self._spark.table(name)
            except Exception as exc:
                raise SqlDmlError(
                    f"USING source {name!r} is neither a registered"
                    " table nor a catalog view"
                ) from exc
        alias, k = self._maybe_alias(toks, i + 1)
        return df, alias or name, k

    # -- DELETE ------------------------------------------------------------

    def _delete(self, sql: str, toks: List[_Tok]) -> dict:
        if not _kw_at(toks, 1, "FROM"):
            raise SqlDmlError("expected DELETE FROM ...")
        table, alias, i = self._resolve_target(toks, 2)
        if i >= len(toks):
            # DELETE FROM t (no WHERE): delta deletes every row
            return table.delete_where("true")
        if not _kw_at(toks, i, "WHERE"):
            raise SqlDmlError(
                f"expected WHERE after DELETE target, got {toks[i].text!r}"
            )
        cond = sql[toks[i].end:toks[-1].end]
        return table.delete_where(self._strip_alias(cond, alias))

    # -- UPDATE ------------------------------------------------------------

    def _update(self, sql: str, toks: List[_Tok]) -> dict:
        table, alias, i = self._resolve_target(toks, 1)
        if not _kw_at(toks, i, "SET"):
            raise SqlDmlError("expected SET in UPDATE")
        where_i = _find_kw(toks, i + 1, "WHERE")
        assignments = self._parse_assignments(
            sql, toks, i + 1,
            where_i if where_i >= 0 else len(toks), alias,
        )
        assignments = {
            k: self._strip_alias(v, alias) for k, v in assignments.items()
        }
        cond = (
            self._strip_alias(sql[toks[where_i].end:toks[-1].end], alias)
            if where_i >= 0 else "true"
        )
        return table.update_where(cond, assignments)

    # -- MERGE -------------------------------------------------------------

    def _merge(self, sql: str, toks: List[_Tok]) -> dict:
        from mack_spark.tables import KeyedMerge

        if not _kw_at(toks, 1, "INTO"):
            raise SqlDmlError("expected MERGE INTO ...")
        table, t_alias, i = self._resolve_target(toks, 2)
        if not _kw_at(toks, i, "USING"):
            raise SqlDmlError("expected USING in MERGE")
        source, s_alias, i = self._resolve_source(sql, toks, i + 1)
        if not _kw_at(toks, i, "ON"):
            raise SqlDmlError("expected ON in MERGE")
        t_alias = t_alias or "t"
        first_when = _find_kw(toks, i + 1, "WHEN")
        if first_when < 0:
            raise SqlDmlError("MERGE needs at least one WHEN clause")
        condition = sql[toks[i].end:toks[first_when].start].strip()

        clauses: List[tuple] = []
        w = first_when
        while w < len(toks):
            w = self._parse_when(sql, toks, w, t_alias, clauses)
        kw = self._desugar_clauses(
            clauses, t_alias, s_alias, list(source.columns)
        )

        tk, sk, null_safe = self._extract_keys(condition, t_alias, s_alias)
        km = KeyedMerge(
            source=source,
            condition=condition,
            target_alias=t_alias,
            source_alias=s_alias,
            target_key_col=tk,
            source_key_col=sk,
            null_safe=null_safe,
            **kw,
        )
        return table.merge(km)

    def _parse_when(
        self, sql: str, toks: List[_Tok], w: int, t_alias: str,
        clauses: List[tuple],
    ) -> int:
        """Parse one ``WHEN ... THEN ...`` clause starting at ``w``
        (a WHEN token); append ``(group, action, cond, payload)`` to
        ``clauses`` in statement order; return the index of the next
        WHEN (or len(toks))."""
        i = w + 1
        if _kw_at(toks, i, "NOT", "MATCHED", "BY", "SOURCE"):
            kind = "nms"
            i += 4
        elif _kw_at(toks, i, "NOT", "MATCHED", "BY", "TARGET"):
            kind = "insert"
            i += 4
        elif _kw_at(toks, i, "NOT", "MATCHED"):
            kind = "insert"
            i += 2
        elif _kw_at(toks, i, "MATCHED"):
            kind = "matched"
            i += 1
        else:
            raise SqlDmlError(
                f"cannot parse WHEN clause at {toks[i].text!r}"
            )
        cond: Optional[str] = None
        if _kw_at(toks, i, "AND"):
            then_i = _find_kw(toks, i + 1, "THEN")
            if then_i < 0:
                raise SqlDmlError("WHEN clause missing THEN")
            cond = sql[toks[i].end:toks[then_i].start].strip()
            i = then_i
        if not _kw_at(toks, i, "THEN"):
            raise SqlDmlError("WHEN clause missing THEN")
        i += 1
        nxt = _find_kw(toks, i, "WHEN")
        end = nxt if nxt >= 0 else len(toks)

        if _kw_at(toks, i, "DELETE"):
            if kind == "insert":
                raise SqlDmlError("WHEN NOT MATCHED cannot DELETE")
            clauses.append((kind, "delete", cond, None))
            return end
        if _kw_at(toks, i, "UPDATE", "SET"):
            if kind == "insert":
                raise SqlDmlError("WHEN NOT MATCHED cannot UPDATE")
            i += 2
            if i < end and toks[i].text == "*":
                if kind == "nms":
                    raise SqlDmlError(
                        "WHEN NOT MATCHED BY SOURCE cannot UPDATE SET *"
                        " (source columns are all-NULL on those rows)"
                    )
                payload = "*"
            else:
                payload = self._parse_assignments(
                    sql, toks, i, end, t_alias
                )
            clauses.append((kind, "update", cond, payload))
            return end
        if _kw_at(toks, i, "INSERT"):
            if kind != "insert":
                raise SqlDmlError(
                    "INSERT belongs to WHEN NOT MATCHED clauses"
                )
            i += 1
            if i < len(toks) and toks[i].text == "*":
                payload = "*"
            else:
                payload = self._parse_insert(sql, toks, i, end, t_alias)
            clauses.append((kind, "insert", cond, payload))
            return end
        raise SqlDmlError(
            f"cannot parse merge action at {toks[i].text!r}"
            if i < len(toks) else "WHEN clause missing its action"
        )

    def _desugar_clauses(
        self, clauses: List[tuple], t_alias: str, s_alias: str,
        src_cols: List[str],
    ) -> dict:
        """Compile the statement's clause list onto the single-clause-
        per-kind KeyedMerge descriptor, preserving delta's FIRST-
        APPLICABLE-IN-STATEMENT-ORDER semantics exactly.

        Within each group (matched / not-matched-by-source / insert),
        clause i fires iff its own condition holds AND no earlier
        clause's did — so the effective per-clause conditions ``e_i``
        are mutually disjoint by construction. That makes the group a
        pure desugar: the descriptor's one update gets per-column
        ``CASE WHEN e_i THEN expr_i ELSE target END`` expressions with
        condition ``OR(e_i over updates)``, the one delete gets
        ``OR(e_i over deletes)``, and multiple INSERT clauses merge the
        same way with NULL for columns a firing clause doesn't set.
        Disjointness also makes the descriptor's fixed update-then-
        delete evaluation order irrelevant. Delta's own rule that only
        the LAST clause of a group may omit its condition is enforced
        (an unconditional earlier clause makes the rest dead code).

        Single-clause groups pass through untouched (no CASE
        wrapping), so simple statements compile to the same descriptor
        they did before multi-clause support."""
        kw: dict = {}
        for group in ("matched", "nms", "insert"):
            rows = [c for c in clauses if c[0] == group]
            if not rows:
                continue
            for j, (_g, act, cond, _p) in enumerate(rows):
                if cond is None and j != len(rows) - 1:
                    raise SqlDmlError(
                        f"WHEN {group.upper()} {act.upper()} clause"
                        f" #{j + 1} has no AND condition but is not the"
                        " last clause of its group — the later clauses"
                        " can never apply (delta requires conditions on"
                        " all but the last clause of a group)"
                    )
            # effective disjoint conditions, statement order
            effs: List[Optional[str]] = []
            for j, (_g, _a, cond, _p) in enumerate(rows):
                parts = [
                    f"(NOT coalesce(({c}), false))"
                    for (_gg, _aa, c, _pp) in rows[:j]
                ]
                if cond is not None:
                    parts.append(f"({cond})")
                effs.append(" AND ".join(parts) if parts else None)
            if group in ("matched", "nms"):
                ukey = (
                    "matched_update" if group == "matched"
                    else "not_matched_by_source_update"
                )
                dkey = (
                    "matched_delete" if group == "matched"
                    else "not_matched_by_source_delete"
                )
                upds = [
                    (e, p) for (g, a, c, p), e in zip(rows, effs)
                    if a == "update"
                ]
                dels = [
                    e for (g, a, c, p), e in zip(rows, effs)
                    if a == "delete"
                ]
                if len(upds) == 1:
                    kw[ukey] = upds[0][1]
                    if upds[0][0] is not None:
                        kw[ukey + "_condition"] = upds[0][0]
                elif len(upds) > 1:
                    kw[ukey] = self._merge_update_sets(
                        upds, t_alias, s_alias, src_cols
                    )
                    conds = [e for e, _ in upds]
                    kw[ukey + "_condition"] = (
                        None if any(e is None for e in conds)
                        else " OR ".join(f"({e})" for e in conds)
                    )
                    if kw[ukey + "_condition"] is None:
                        del kw[ukey + "_condition"]
                if len(dels) == 1:
                    kw[dkey] = dels[0] if dels[0] is not None else True
                elif len(dels) > 1:
                    kw[dkey] = (
                        True if any(e is None for e in dels)
                        else " OR ".join(f"({e})" for e in dels)
                    )
            else:  # insert group
                ins = list(zip(effs, [p for (_g, _a, _c, p) in rows]))
                if len(ins) == 1:
                    kw["not_matched_insert"] = ins[0][1]
                    if ins[0][0] is not None:
                        kw["not_matched_condition"] = ins[0][0]
                else:
                    kw["not_matched_insert"] = self._merge_insert_sets(
                        ins, s_alias, src_cols
                    )
                    conds = [e for e, _ in ins]
                    if not any(e is None for e in conds):
                        kw["not_matched_condition"] = " OR ".join(
                            f"({e})" for e in conds
                        )
        return kw

    @staticmethod
    def _merge_update_sets(
        upds: List[tuple], t_alias: str, s_alias: str,
        src_cols: List[str],
    ) -> Dict[str, str]:
        """Fold multiple UPDATE clauses (disjoint effective conditions)
        into one per-column CASE set. ``SET *`` expands by name over
        the source columns (the executors' own rule)."""
        expanded = []
        for e, p in upds:
            if p == "*":
                p = {c: f"{s_alias}.`{c}`" for c in src_cols}
            expanded.append((e, p))
        cols = sorted({c for _e, p in expanded for c in p})
        out = {}
        for col in cols:
            whens = "".join(
                f" WHEN {e if e is not None else 'true'} THEN ({p[col]})"
                for e, p in expanded if col in p
            )
            out[col] = (
                f"CASE{whens} ELSE {t_alias}.`{col}` END"
            )
        return out

    @staticmethod
    def _merge_insert_sets(
        ins: List[tuple], s_alias: str, src_cols: List[str]
    ) -> Dict[str, str]:
        """Fold multiple INSERT clauses into one per-column CASE values
        map; a firing clause that doesn't set a column inserts NULL
        (delta's explicit-values rule)."""
        expanded = []
        for e, p in ins:
            if p == "*":
                p = {c: f"{s_alias}.`{c}`" for c in src_cols}
            expanded.append((e, p))
        cols = sorted({c for _e, p in expanded for c in p})
        out = {}
        for col in cols:
            whens = "".join(
                f" WHEN {e if e is not None else 'true'} THEN "
                f"({p.get(col, 'NULL')})"
                for e, p in expanded
            )
            out[col] = f"CASE{whens} END"
        return out

    # -- pieces ------------------------------------------------------------

    def _parse_assignments(
        self, sql: str, toks: List[_Tok], i: int, end: int,
        t_alias: Optional[str],
    ) -> Dict[str, str]:
        """``col = expr, t.col2 = expr2`` between token indexes
        [i, end). Assignment KEYS lose their target qualifier (the
        executors key on bare column names); VALUES pass verbatim."""
        out: Dict[str, str] = {}
        depth = toks[i].depth if i < len(toks) else 0
        while i < end:
            if toks[i].kind not in ("word", "bquote"):
                raise SqlDmlError(
                    f"expected column name at {toks[i].text!r}"
                )
            col = _unquote_ident(toks[i].text)
            i += 1
            if (
                i < end and toks[i].text == "."
                and t_alias and col == t_alias
            ):
                col = _unquote_ident(toks[i + 1].text)
                i += 2
            if i >= end or toks[i].text != "=":
                raise SqlDmlError(f"expected '=' after {col!r} in SET")
            i += 1
            j = i
            while j < end and not (
                toks[j].text == "," and toks[j].depth == depth
            ):
                j += 1
            stop = toks[j].start if j < end else toks[end - 1].end
            expr = sql[toks[i].start:stop].strip()
            if not expr:
                raise SqlDmlError(f"empty expression for {col!r} in SET")
            out[col] = expr
            i = j + 1
        if not out:
            raise SqlDmlError("empty SET clause")
        return out

    def _parse_insert(
        self, sql: str, toks: List[_Tok], i: int, end: int,
        t_alias: Optional[str],
    ) -> Dict[str, str]:
        """``(col, ...) VALUES (expr, ...)`` → column→expression map."""
        if i >= end or toks[i].text != "(":
            raise SqlDmlError("expected (columns) after INSERT")
        cols: List[str] = []
        i += 1
        while i < end and toks[i].text != ")":
            if toks[i].text == ",":
                i += 1
                continue
            c = _unquote_ident(toks[i].text)
            i += 1
            if i < end and toks[i].text == "." and t_alias == c:
                c = _unquote_ident(toks[i + 1].text)
                i += 2
            cols.append(c)
        i += 1  # past ')'
        if not _kw_at(toks, i, "VALUES"):
            raise SqlDmlError("expected VALUES in INSERT")
        i += 1
        if i >= end or toks[i].text != "(":
            raise SqlDmlError("expected (expressions) after VALUES")
        inner = toks[i].depth + 1
        i += 1
        exprs: List[str] = []
        j = i
        start = toks[i].start if i < end else None
        while j < end and toks[j].depth >= inner:
            if toks[j].text == "," and toks[j].depth == inner:
                exprs.append(sql[start:toks[j].start].strip())
                start = toks[j].end
            j += 1
        exprs.append(sql[start:toks[j - 1].end].strip())
        if len(cols) != len(exprs):
            raise SqlDmlError(
                f"INSERT has {len(cols)} columns but {len(exprs)} values"
            )
        return dict(zip(cols, exprs))

    @staticmethod
    def _extract_keys(
        condition: str, t_alias: str, s_alias: str
    ) -> Tuple[Optional[str], Optional[str], bool]:
        """Pull the file-skipping key pair out of the ON condition:
        the first top-level conjunct of shape ``t.k = s.k2`` (either
        order, ``<=>`` allowed). A conjunct IS implied by the whole
        conjunction, which is exactly the KeyedMerge contract."""
        toks = _tokenize(condition)
        # split on top-level AND
        pieces: List[List[_Tok]] = [[]]
        for t in toks:
            if t.depth == 0 and t.kind == "word" and t.upper == "AND":
                pieces.append([])
            else:
                pieces[-1].append(t)
        for p in pieces:
            # shape: ident . ident (=|<=>) ident . ident
            if len(p) != 7:
                continue
            if p[1].text != "." or p[5].text != ".":
                continue
            if p[3].text not in ("=", "<=>"):
                continue
            a, ac = _unquote_ident(p[0].text), _unquote_ident(p[2].text)
            b, bc = _unquote_ident(p[4].text), _unquote_ident(p[6].text)
            ns = p[3].text == "<=>"
            if a == t_alias and b == s_alias:
                return ac, bc, ns
            if a == s_alias and b == t_alias:
                return bc, ac, ns
        raise SqlDmlError(
            "MERGE ON condition has no target-key = source-key conjunct"
            " — the protocol MERGE requires one for file skipping"
            f" (aliases {t_alias!r}/{s_alias!r}): {condition!r}"
        )

    @staticmethod
    def _strip_alias(expr: str, alias: Optional[str]) -> str:
        """Remove ``alias.`` qualifiers from an UPDATE/DELETE
        expression (the single-table executors evaluate bare column
        names). Token-aware: string literals survive untouched."""
        if not alias:
            return expr.strip()
        toks = _tokenize(expr)
        drop: List[Tuple[int, int]] = []
        k = 0
        while k + 1 < len(toks):
            if (
                toks[k].kind in ("word", "bquote")
                and _unquote_ident(toks[k].text) == alias
                and toks[k + 1].text == "."
            ):
                drop.append((toks[k].start, toks[k + 1].end))
                k += 2
            else:
                k += 1
        if not drop:
            return expr.strip()
        out, pos = [], 0
        for a, b in drop:
            out.append(expr[pos:a])
            pos = b
        out.append(expr[pos:])
        return "".join(out).strip()


def execute_dml(
    spark: SparkSession, sql: str,
    tables: Optional[Dict[str, Union[str, object]]] = None,
) -> dict:
    """One-shot convenience: ``execute_dml(spark, "MERGE INTO ...",
    tables={"customers": "/path"})``."""
    return DeltaSqlDml(spark, tables).execute(sql)
