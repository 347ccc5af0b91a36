"""SQL-text DML front-end over :class:`AcidTable` (reference API parity).

The reference issues its write path as literal SQL statements
(writer/TransactionWriter.java:143-178):

    MERGE INTO t USING (SELECT * FROM updates_view) s
      ON t.primaryKeyValue = s.primaryKeyValue
      WHEN MATCHED THEN UPDATE SET t.dataValue = s.dataValue
      WHEN NOT MATCHED THEN INSERT (primaryKeyValue, partitionKeyValue,
        dataValue) VALUES (s.primaryKeyValue, s.partitionKeyValue, s.dataValue)

    DELETE FROM t WHERE primaryKeyValue IN ('k1', 'k2', ...)

Stock Spark in this environment has no lakehouse catalog jar, so those
statements cannot execute natively (SURVEY.md §7); this shim parses exactly
the two statement shapes the reference emits and dispatches to the
DataFrame-native implementations (``AcidTable.merge`` / ``AcidTable.delete``),
closing the last ergonomic gap with the reference's writer API.

Known-defect compatibility: the reference's DELETE builder joins its quoted
pk list WITHOUT a delimiter (defect D2, ``Collectors.joining()`` —
TransactionWriter.java:173), producing ``IN ('a''b''c')`` which Spark lexes
as one literal. The shim tokenizes quoted literals positionally, so both the
correct comma-separated form and the defective delimiter-less form parse to
the INTENDED key list — same stance as ``AcidTable.delete`` (D2 fixed).
"""

from __future__ import annotations

import re

from .table import AcidTable

_MERGE_RE = re.compile(
    r"""^\s*MERGE\s+INTO\s+(?P<target>[\w.]+)\s+
        USING\s+\(\s*(?P<source_query>SELECT\b.*?)\s*\)\s+(?P<alias>\w+)\s+
        ON\s+(?P<on>.+?)\s+
        WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(?P<set>.+?)\s+
        WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*
        \(\s*(?P<ins_cols>[^)]*?)\s*\)\s*
        VALUES\s*\(\s*(?P<ins_vals>[^)]*?)\s*\)\s*;?\s*$""",
    re.IGNORECASE | re.DOTALL | re.VERBOSE,
)

_DELETE_RE = re.compile(
    r"""^\s*DELETE\s+FROM\s+(?P<target>[\w.]+)\s+
        WHERE\s+(?P<col>\w+)\s+IN\s*\(\s*(?P<list>.*?)\s*\)\s*;?\s*$""",
    re.IGNORECASE | re.DOTALL | re.VERBOSE,
)

_EQ_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")
# quoted SQL string literal WITH '' escaping (comma-delimited lists)
_STR_LIT_ESC_RE = re.compile(r"'((?:[^']|'')*)'")
# bare quoted literal WITHOUT escape handling (delimiter-less D2 lists:
# 'k1''k3' there means the two keys k1, k3 — not one literal k1'k3)
_STR_LIT_BARE_RE = re.compile(r"'([^']*)'")


def _parse_qualified_eq(expr: str, name: str) -> tuple[tuple[str, str], tuple[str, str]]:
    m = _EQ_RE.match(expr)
    if not m:
        raise ValueError(f"unsupported {name} clause: {expr!r}")
    return (m.group(1), m.group(2)), (m.group(3), m.group(4))


def execute_dml(table: AcidTable, sql: str, timeout: float = 60.0) -> int:
    """Execute one reference-shaped MERGE INTO / DELETE FROM statement
    against ``table``; returns the committed manifest version.

    MERGE: the USING subquery runs via ``table.spark.sql`` (the reference
    registers its batch as a temp view first — same protocol here); the
    matched branch's SET list becomes ``update_cols``; the not-matched
    branch must insert the full source row (reference shape).
    DELETE: the IN-list string literals become the key list.
    """
    m = _MERGE_RE.match(sql)
    if m:
        alias = m.group("alias")
        source = table.spark.sql(m.group("source_query"))
        (l_tab, l_col), (r_tab, r_col) = _parse_qualified_eq(
            m.group("on"), "ON"
        )
        on_cols = {l_col, r_col}
        if on_cols != {table.pk} or alias not in (l_tab, r_tab):
            raise ValueError(
                f"MERGE must join target and {alias!r} on the primary key "
                f"{table.pk!r}; got ON {m.group('on')!r}"
            )
        update_cols: list[str] = []
        for part in m.group("set").split(","):
            (_, t_col), (s_tab, s_col) = _parse_qualified_eq(part, "SET")
            if s_tab != alias or t_col != s_col:
                raise ValueError(f"unsupported SET assignment: {part!r}")
            update_cols.append(t_col)
        ins_cols = [c.strip() for c in m.group("ins_cols").split(",") if c.strip()]
        ins_vals = [v.strip() for v in m.group("ins_vals").split(",") if v.strip()]
        if [f"{alias}.{c}" for c in ins_cols] != ins_vals:
            raise ValueError(
                "MERGE insert branch must insert the full source row "
                f"(reference shape); got ({m.group('ins_cols')}) VALUES "
                f"({m.group('ins_vals')})"
            )
        missing = set(ins_cols) ^ set(source.columns)
        if missing:
            raise ValueError(
                f"INSERT column list must cover the source columns; delta: {missing}"
            )
        return table.merge(
            source.select(*ins_cols), update_cols=update_cols, timeout=timeout
        )

    d = _DELETE_RE.match(sql)
    if d:
        if d.group("col") != table.pk:
            raise ValueError(
                f"DELETE must filter on the primary key {table.pk!r}; "
                f"got {d.group('col')!r}"
            )
        list_text = d.group("list")
        if "," in list_text:
            # well-formed comma list: standard lexing, '' unescapes to '
            lit_re = _STR_LIT_ESC_RE
            keys = [s.replace("''", "'") for s in lit_re.findall(list_text)]
        else:
            # no delimiter at all → the reference's D2 output ('k1''k3''k5'):
            # recover the INTENDED keys by splitting adjacent literals.
            # (Reference keys never contain quotes, so this is unambiguous
            # for the workload; a single plain 'k1' hits this branch too and
            # parses identically under both rules.)
            lit_re = _STR_LIT_BARE_RE
            keys = lit_re.findall(list_text)
        residue = lit_re.sub("", list_text).replace(",", "").strip()
        if residue or (not keys and list_text.strip()):
            raise ValueError(f"unsupported IN-list: {list_text!r}")
        return table.delete(keys, timeout=timeout)

    raise ValueError(
        "unsupported statement (this shim accepts exactly the reference's "
        f"MERGE INTO / DELETE FROM shapes): {sql[:120]!r}"
    )
