"""RisingWave-dialect SQL → Spark SQL rewrite pre-pass (SURVEY.md §4).

The reference SDK ships SQL strings verbatim to a PG-compatible
server (/root/reference/risingwave/core.py:161-212). Our engine runs
them on Spark SQL, which covers almost the whole surface natively;
this module handles the dialect deltas:

  - ``tumble(rel, col, interval '…')`` TVF (demo.py:98-100) →
    epoch-aligned bucket arithmetic producing window_start/window_end;
  - ``version()`` → engine-branded literal parseable by the SDK's
    ``RisingWave-(\\d+\\.\\d+\\.\\d+)`` regex (core.py:40-59);
  - ``information_schema.{tables,columns}`` (core.py:70-76, 350-352)
    → catalog-backed temp views;
  - command classification (FLUSH / DDL / subscription protocol) so
    the engine can route statements Spark has no notion of.

Everything else passes through to ``spark.sql`` untouched — Catalyst
is the optimizer, we add no custom rules.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Statement classification
# ---------------------------------------------------------------------------

CMD_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("FLUSH", re.compile(r"^\s*FLUSH\s*;?\s*$", re.I)),
    (
        "CREATE_SCHEMA",
        re.compile(r"^\s*CREATE\s+SCHEMA\s+(IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "DROP_SCHEMA",
        re.compile(r"^\s*DROP\s+SCHEMA\s+(IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "CREATE_MV",
        re.compile(
            r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+AS\s+(?P<stmt>.*)$",
            re.I | re.S,
        ),
    ),
    (
        "DROP_MV",
        re.compile(r"^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "CREATE_SUB",
        re.compile(
            r"^\s*CREATE\s+SUBSCRIPTION\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+FROM\s+(?P<from>[\w.]+)"
            r"(\s+WITH\s*\(\s*retention\s*=\s*'(?P<retention>\w+)'\s*\))?\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "DROP_SUB",
        re.compile(r"^\s*DROP\s+SUBSCRIPTION\s+(IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "CREATE_SOURCE",
        re.compile(
            r"^\s*CREATE\s+SOURCE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+"
            r"WITH\s*\((?P<props>.*)\)\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        "DROP_SOURCE",
        re.compile(r"^\s*DROP\s+SOURCE\s+(IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "CREATE_SINK",
        re.compile(
            r"^\s*CREATE\s+SINK\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+"
            r"FROM\s+(?P<rel>[\w.]+)\s+WITH\s*\((?P<props>.*)\)\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        "CREATE_SINK",
        re.compile(
            r"^\s*CREATE\s+SINK\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+"
            r"AS\s+(?P<stmt>.+?)\s+WITH\s*\((?P<props>.*)\)\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        "DROP_SINK",
        re.compile(r"^\s*DROP\s+SINK\s+(IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "CREATE_FUNCTION",
        re.compile(
            r"^\s*CREATE\s+FUNCTION\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s*"
            r"\((?P<params>[^)]*)\)\s+RETURNS\s+(?P<rettype>[\w ]+?)\s+"
            r"LANGUAGE\s+python\s+AS\s+\$\$(?P<body>.*?)\$\$\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        "DROP_FUNCTION",
        re.compile(r"^\s*DROP\s+FUNCTION\s+(IF\s+EXISTS\s+)?(?P<name>\w+)\s*(\(\s*\))?\s*;?\s*$", re.I),
    ),
    (
        "ALTER_ADD_COLUMN",
        re.compile(
            r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+COLUMN\s+"
            r"(IF\s+NOT\s+EXISTS\s+)?(?P<col>\w+)\s+(?P<type>[\w ]+?)\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "ALTER_DROP_COLUMN",
        re.compile(
            r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+COLUMN\s+"
            r"(IF\s+EXISTS\s+)?(?P<col>\w+)\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "ALTER_MV_RENAME",
        re.compile(
            r"^\s*ALTER\s+MATERIALIZED\s+VIEW\s+(?P<name>[\w.]+)\s+"
            r"RENAME\s+TO\s+(?P<new>[\w.]+)\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "ALTER_RENAME",
        re.compile(
            r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+RENAME\s+TO\s+(?P<new>[\w.]+)\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "SET_VAR",
        re.compile(
            r"^\s*SET\s+(?:SESSION\s+)?(?:(?:TIME\s+ZONE\s+(?P<tz>.+?))|"
            r"(?P<key>[\w.]+)(?:\s+TO\s+|\s*=\s*)(?P<val>.+?))\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "SHOW_CREATE",
        re.compile(
            r"^\s*SHOW\s+CREATE\s+(?:TABLE|MATERIALIZED\s+VIEW|SOURCE|SINK)\s+"
            r"(?P<name>[\w.]+)\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "SHOW_COLUMNS",
        re.compile(r"^\s*SHOW\s+COLUMNS\s+FROM\s+(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "DESCRIBE",
        re.compile(r"^\s*DESC(RIBE)?\s+(TABLE\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "SHOW_OBJECTS",
        re.compile(
            r"^\s*SHOW\s+(?P<what>TABLES|MATERIALIZED\s+VIEWS|SCHEMAS|DATABASES|"
            r"SOURCES|SINKS|SUBSCRIPTIONS|FUNCTIONS)"
            r"(\s+FROM\s+(?P<schema>[\w.]+))?\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "EXPLAIN",
        re.compile(r"^\s*EXPLAIN\s+(?P<stmt>.+)$", re.I | re.S),
    ),
    (
        "CREATE_INDEX",
        re.compile(
            r"^\s*CREATE\s+INDEX\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+"
            r"ON\s+(?P<table>[\w.]+)\s*\((?P<cols>[\w\s,]+)\)\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "DROP_INDEX",
        re.compile(r"^\s*DROP\s+INDEX\s+(IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "SHOW_INDEXES",
        re.compile(r"^\s*SHOW\s+INDEXES\s+FROM\s+(?P<table>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "DELETE_ROWS",
        re.compile(
            r"^\s*DELETE\s+FROM\s+(?P<name>[\w.]+)"
            r"(?:\s+WHERE\s+(?P<where>.+?))?"
            r"(?:\s+RETURNING\s+(?P<ret>.+?))?\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        "UPDATE_ROWS",
        re.compile(
            r"^\s*UPDATE\s+(?P<name>[\w.]+)\s+SET\s+(?P<set>.+?)"
            r"(?:\s+WHERE\s+(?P<where>.+?))?"
            r"(?:\s+RETURNING\s+(?P<ret>.+?))?\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        "DECLARE_CURSOR",
        re.compile(
            r"^\s*DECLARE\s+(?P<name>[\w.]+)\s+subscription\s+cursor\s+for\s+(?P<sub>[\w.]+)"
            r"(\s+SINCE\s+(?P<since>\d+))?\s*;?\s*$",
            re.I,
        ),
    ),
    (
        "FETCH_CURSOR",
        re.compile(r"^\s*FETCH\s+(?P<n>\d+)\s+FROM\s+(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        # upsert variant must come first: the plain pattern's greedy
        # column group would swallow the ON CONFLICT clause
        "CREATE_TABLE",
        re.compile(
            r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s*\((?P<cols>.*)\)\s*"
            r"ON\s+CONFLICT\s+DO\s+UPDATE\s+IF\s+NOT\s+NULL\s+WITH\s+VERSION\s+COLUMN\s*\(\s*(?P<vcol>\w+)\s*\)\s*"
            r"(?:WITH\s*\((?P<props>[^()]*)\)\s*)?;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        # WITH-properties variant must precede the plain pattern (the
        # greedy column group would swallow the WITH clause): carries
        # table layout props, e.g. WITH (bucket_by='l_orderkey',
        # buckets='16') for the Hive-compatible clustered layout.
        "CREATE_TABLE",
        re.compile(
            r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s*\((?P<cols>.*)\)\s*"
            r"WITH\s*\((?P<props>[^()]*)\)\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        "CREATE_TABLE",
        re.compile(
            r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s*\((?P<cols>.*)\)\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    (
        "DROP_TABLE",
        re.compile(r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "TRUNCATE",
        re.compile(r"^\s*TRUNCATE\s+(TABLE\s+)?(?P<name>[\w.]+)\s*;?\s*$", re.I),
    ),
    (
        "INSERT",
        re.compile(
            r"^\s*INSERT\s+INTO\s+(?P<name>[\w.]+)\s*(\((?P<cols>[\w\s,]+)\))?\s*"
            r"(?P<rest>(VALUES|SELECT)\s*.+?)(?:\s+RETURNING\s+(?P<ret>.+?))?\s*;?\s*$",
            re.I | re.S,
        ),
    ),
    # LAST: single-word SHOW falls through to a session variable only
    # after every specific SHOW form above has had its chance.
    (
        "SHOW_VAR",
        re.compile(r"^\s*SHOW\s+(?P<key>TIME\s+ZONE|[\w.]+)\s*;?\s*$", re.I),
    ),
]


@dataclass
class Command:
    kind: str  # one of the CMD_PATTERNS keys, or "QUERY"
    sql: str
    params: dict = field(default_factory=dict)


_PROP = re.compile(r"(?P<key>[\w.]+)\s*=\s*'(?P<val>[^']*)'")


def parse_source_props(props_sql: str) -> dict[str, str]:
    """Parse a WITH (key='value', …) property list (CREATE SOURCE)."""
    return {m.group("key"): m.group("val") for m in _PROP.finditer(props_sql)}


def split_top_level(sql: str) -> list[str]:
    """Split on commas at paren depth 0, outside string literals
    (e.g. ``a = greatest(b, 1), c = 'x,y'`` → two parts)."""
    parts: list[str] = []
    depth, in_str, start = 0, False, 0
    for i, ch in enumerate(sql):
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(sql[start:i])
            start = i + 1
    parts.append(sql[start:])
    return [p.strip() for p in parts if p.strip()]


def split_assignments(set_sql: str) -> list[tuple[str, str]]:
    """Split an UPDATE's SET clause into (column, expression) pairs."""
    parts = split_top_level(set_sql)
    out: list[tuple[str, str]] = []
    for part in parts:
        col, eq, expr = part.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise ValueError(f"malformed SET assignment: {part.strip()!r}")
        out.append((col.strip(), expr.strip()))
    return out


def classify(sql: str) -> Command:
    for kind, pat in CMD_PATTERNS:
        m = pat.match(sql)
        if m:
            return Command(kind, sql, {k: v for k, v in m.groupdict().items() if v is not None})
    return Command("QUERY", sql)


# ---------------------------------------------------------------------------
# PG type → Spark type (CREATE TABLE DDL, SURVEY §1.2)
# ---------------------------------------------------------------------------

PG_TO_SPARK_TYPES = {
    "STRING": "STRING",
    "VARCHAR": "STRING",
    "TEXT": "STRING",
    "TIMESTAMPTZ": "TIMESTAMP",
    "TIMESTAMP": "TIMESTAMP",
    # Spark-native spelling (what DataFrame.schema round-trips for
    # parquet TIMESTAMP(MICROS) under timestampNtz inference) — kept
    # NTZ so DDL generated from an existing relation's schema is
    # loss-free
    "TIMESTAMP_NTZ": "TIMESTAMP_NTZ",
    "DATE": "DATE",
    "FLOAT": "DOUBLE",  # RW FLOAT ≡ float8
    "FLOAT8": "DOUBLE",
    "FLOAT4": "FLOAT",
    "REAL": "FLOAT",
    "DOUBLE": "DOUBLE",
    "DOUBLE PRECISION": "DOUBLE",
    "INT": "INT",
    "INTEGER": "INT",
    "INT4": "INT",
    "SMALLINT": "SMALLINT",
    "BIGINT": "BIGINT",
    "INT8": "BIGINT",
    "BOOLEAN": "BOOLEAN",
    "BOOL": "BOOLEAN",
    "DECIMAL": "DECIMAL(38,10)",
    "NUMERIC": "DECIMAL(38,10)",
    "JSONB": "STRING",
    "BYTEA": "BINARY",
}

_COLDEF = re.compile(
    r"^\s*(?P<name>\w+)\s+(?P<type>[\w ]+?(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
    r"(?P<pk>\s+PRIMARY\s+KEY)?\s*$",
    re.I,
)

# RW watermark DDL inside a CREATE TABLE column list:
#   WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
#   WATERMARK FOR ts AS ts - INTERVAL '5 seconds'
_WATERMARK = re.compile(
    r",?\s*WATERMARK\s+FOR\s+(?P<col>\w+)\s+AS\s+\w+\s*-\s*"
    r"INTERVAL\s+'(?P<val>[^']+)'\s*(?P<unit>[A-Za-z]+)?",
    re.I,
)

# RW append-only MV modifier: CREATE MATERIALIZED VIEW … AS … EMIT ON WINDOW CLOSE
_EMIT_ON_CLOSE = re.compile(r"\s+EMIT\s+ON\s+WINDOW\s+CLOSE\s*;?\s*$", re.I)


def extract_watermark(cols_sql: str) -> tuple[str, dict | None]:
    """Split a WATERMARK clause out of a CREATE TABLE column list.
    Returns (column list without the clause, {col, delay_us} or None)."""
    m = _WATERMARK.search(cols_sql)
    if not m:
        return cols_sql, None
    spec = m.group("val")
    if m.group("unit"):
        spec = f"{spec} {m.group('unit')}"
    if not re.search(r"[A-Za-z]", spec):
        raise ValueError(f"watermark interval needs a unit: {spec!r}")
    # normalize singular units ("5 SECOND" → "5 seconds" form)
    num, unit = spec.split(None, 1)
    unit = unit.lower()
    if not unit.endswith("s"):
        unit += "s"
    delay_us = interval_to_micros(f"{num} {unit}")
    clean = cols_sql[: m.start()] + cols_sql[m.end():]
    return clean, {"col": m.group("col"), "delay_us": delay_us}


def extract_emit_on_close(stmt: str) -> tuple[str, bool]:
    """Strip a trailing EMIT ON WINDOW CLOSE from an MV definition."""
    m = _EMIT_ON_CLOSE.search(stmt)
    if not m:
        return stmt, False
    return stmt[: m.start()], True


_COLDEF_ARRAY = re.compile(
    r"^\s*(?P<name>\w+)\s+(?P<type>[\w ]+?)\s*\[\s*\](?P<pk>\s+PRIMARY\s+KEY)?\s*$", re.I
)


def parse_columns(cols_sql: str) -> tuple[list[tuple[str, str]], list[str]]:
    """Parse a CREATE TABLE column list → ([(name, spark_type)], pk_cols).
    PG array types (``INT[]``, ``STRING[]``) map to ``ARRAY<t>``."""
    cols: list[tuple[str, str]] = []
    pks: list[str] = []
    for part in split_top_level(cols_sql):
        arr = _COLDEF_ARRAY.match(part)
        m = arr or _COLDEF.match(part)
        if not m:
            raise ValueError(f"cannot parse column definition: {part!r}")
        name = m.group("name")
        pg_t = " ".join(m.group("type").split()).upper()
        spark_t = PG_TO_SPARK_TYPES.get(pg_t)
        if spark_t is None:
            # parameterized DECIMAL/NUMERIC and VARCHAR(n) pass through
            dm = re.fullmatch(
                r"(?:DECIMAL|NUMERIC)\s*\((\d+)\s*,\s*(\d+)\)", pg_t
            )
            vm = re.fullmatch(r"(?:VARCHAR|CHARACTER VARYING)\s*\(\d+\)", pg_t)
            if dm:
                spark_t = f"DECIMAL({dm.group(1)},{dm.group(2)})"
            elif vm:
                spark_t = "STRING"
        if spark_t is None:
            raise ValueError(f"unsupported type {pg_t!r} in column {name!r}")
        if arr:
            spark_t = f"ARRAY<{spark_t}>"
        cols.append((name, spark_t))
        if m.group("pk"):
            pks.append(name)
    return cols, pks


# ---------------------------------------------------------------------------
# Query-text rewrites
# ---------------------------------------------------------------------------

_TUMBLE = re.compile(
    r"tumble\s*\(\s*(?P<rel>[\w.]+)\s*,\s*(?P<col>\w+)\s*,"
    r"\s*interval\s+'(?P<ival>[^']+)'(?:\s+(?P<unit>\w+))?\s*\)",
    re.I,
)

_INTERVAL_UNITS = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


def interval_to_micros(spec: str) -> int:
    m = re.match(r"^\s*(\d+)\s*(\w+)\s*$", spec)
    if not m or m.group(2).lower() not in _INTERVAL_UNITS:
        raise ValueError(f"unsupported interval: {spec!r}")
    return int(m.group(1)) * _INTERVAL_UNITS[m.group(2).lower()]


def rewrite_tumble(sql: str) -> str:
    """``FROM tumble(rel, col, interval 'X')`` → derived table with
    epoch-aligned window_start / window_end columns.

    Spelled as integer bucket arithmetic on microseconds — identical
    semantics to Spark's window() TVF for tumbling windows, but usable
    anywhere a relation is expected (and dialect-stable)."""

    def sub(m: re.Match) -> str:
        rel, col = m.group("rel"), m.group("col")
        spec = m.group("ival")
        if m.group("unit"):  # SQL-standard interval '1' second form
            spec = f"{spec} {m.group('unit')}"
        us = interval_to_micros(spec)
        return (
            f"(SELECT *, "
            f"timestamp_micros(CAST(floor(unix_micros({col}) / {us}) AS BIGINT) * {us}) AS window_start, "
            f"timestamp_micros(CAST(floor(unix_micros({col}) / {us}) AS BIGINT) * {us} + {us}) AS window_end "
            f"FROM {rel})"
        )

    return _TUMBLE.sub(sub, sql)


_HOP = re.compile(
    r"hop\s*\(\s*(?P<rel>[\w.]+)\s*,\s*(?P<col>\w+)\s*,"
    r"\s*interval\s+'(?P<slide>[^']+)'(?:\s+(?P<slideunit>\w+))?\s*,"
    r"\s*interval\s+'(?P<size>[^']+)'(?:\s+(?P<sizeunit>\w+))?\s*\)",
    re.I,
)


def rewrite_hop(sql: str) -> str:
    """``FROM hop(rel, col, interval 'slide', interval 'size')`` →
    derived table where each row repeats once per sliding window that
    covers it (RisingWave's hop TVF contract: window_size/window_slide
    copies, windows aligned to the epoch on the slide grid).

    Expressed as a lateral explode of the covering window starts —
    size/slide rows per input row, computed inside codegen; the same
    expansion Spark's window(col, size, slide) performs internally.
    """

    def sub(m: re.Match) -> str:
        rel, col = m.group("rel"), m.group("col")
        slide_spec, size_spec = m.group("slide"), m.group("size")
        if m.group("slideunit"):
            slide_spec = f"{slide_spec} {m.group('slideunit')}"
        if m.group("sizeunit"):
            size_spec = f"{size_spec} {m.group('sizeunit')}"
        slide = interval_to_micros(slide_spec)
        size = interval_to_micros(size_spec)
        if size % slide != 0:
            raise ValueError("hop(): window size must be a multiple of slide")
        n = size // slide
        # A row at t belongs to the n windows whose starts are the
        # slide-grid points in (t - size, t]:
        # floor(t/slide)*slide - k*slide for k = 0..n-1.
        first = f"(CAST(floor(unix_micros({col}) / {slide}) AS BIGINT) - {n - 1}) * {slide}"
        return (
            f"(SELECT *, timestamp_micros(__ws) AS window_start, "
            f"timestamp_micros(__ws + {size}) AS window_end FROM "
            f"(SELECT *, explode(sequence({first}, {first} + {(n - 1) * slide}, {slide})) AS __ws "
            f"FROM {rel}))"
        )

    return _HOP.sub(sub, sql)


# ---------------------------------------------------------------------------
# ASOF JOIN grammar (RisingWave supports `a ASOF [LEFT] JOIN b ON
# eq-conds AND ineq` server-side; the reference client passes the SQL
# through verbatim, /root/reference/risingwave/core.py:161-181).
# Spark SQL has no ASOF JOIN — rewrite to a correlated LATERAL
# LIMIT-1 subquery, which Catalyst decorrelates into a join + per-key
# top-1 (same physical shape as the asof_join_last_click operator).
# ---------------------------------------------------------------------------

_ASOF = re.compile(
    r"\b(?!(?:FROM|JOIN|WHERE|ON|AND|OR|SELECT|AS)\b)(?P<left>[\w.]+)"
    r"(?:\s+(?:AS\s+)?(?!ASOF\b)(?P<la>\w+))?"
    r"\s+ASOF\s+(?P<outer>LEFT\s+)?JOIN\s+"
    r"(?P<right>[\w.]+)"
    r"(?:\s+(?:AS\s+)?(?!ON\b)(?P<ra>\w+))?"
    r"\s+ON\s+(?P<cond>.+?)"
    r"(?=\s+(?:WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|UNION|INTERSECT|EXCEPT)\b|\s*;|\s*$)",
    re.I | re.S,
)

_INEQ_TERM = re.compile(
    r"^\s*(?P<x>[\w.]+)\s*(?P<op>>=|<=|>|<)\s*(?P<y>[\w.]+)\s*$"
)


def _split_and(cond: str) -> list[str]:
    """Split a predicate on top-level ANDs (paren-depth and
    string-literal aware — an AND inside '...' must not split)."""
    parts, depth, start = [], 0, 0
    i, n = 0, len(cond)
    in_str = False
    while i < n:
        c = cond[i]
        if in_str:
            if c == "'":
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and cond[i : i + 3].upper() == "AND":
            before = i == 0 or not (cond[i - 1].isalnum() or cond[i - 1] == "_")
            after = i + 3 >= n or not (cond[i + 3].isalnum() or cond[i + 3] == "_")
            if before and after:
                parts.append(cond[start:i])
                i += 3
                start = i
                continue
        i += 1
    parts.append(cond[start:])
    return [p.strip() for p in parts if p.strip()]


# Escape-aware SQL string-literal pattern ('' is the embedded quote).
# Used to keep text rewrites out of literal contents: "x ~ ''pat''"
# inside a larger string literal, or the word ASOF in a literal, must
# pass through untouched.
_SQL_LITERAL = re.compile(r"('(?:[^']|'')*')")


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    """Replace every string literal with a \\x00<n>\\x00 placeholder
    (no letters, so no rewrite pattern can match inside it)."""
    lits: list[str] = []

    def repl(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    return _SQL_LITERAL.sub(repl, sql), lits


def _unmask_literals(sql: str, lits: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], sql)


def sql_literal(v) -> str:
    """Render a Python bind value as a SQL literal (the DML inline
    path: UPDATE/DELETE WHERE and SET fragments evaluate via F.expr,
    which has no bind-parameter channel, so values are inlined).

    Spark's SQL parser processes backslash escapes inside string
    literals, so backslashes must be doubled BEFORE quotes are — a
    value like ``C:\temp`` would otherwise silently corrupt (``\t``
    → tab) and a trailing backslash would escape the closing quote
    (literal-escape injection through the bind API)."""
    import datetime as _dt
    import decimal as _dec
    import math as _math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if _math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if _math.isinf(v):
            sign = "-" if v < 0 else ""
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, _dec.Decimal):
        # Exponent-notation Decimals (Decimal('1E+3')) would render as
        # '1E+3', which Spark parses as DOUBLE — silent precision loss.
        # Normalize to plain notation and pin the type with a CAST so
        # the parser keeps exact decimal semantics. Non-finite Decimals
        # have no DECIMAL representation in Spark — reject loudly.
        if not v.is_finite():
            raise ValueError(
                f"non-finite Decimal bind value {v!r} has no SQL "
                f"DECIMAL representation (use float for NaN/Infinity)"
            )
        plain = format(v, "f")
        frac = plain.split(".", 1)[1] if "." in plain else ""
        digits = len(plain.replace("-", "").replace(".", "").lstrip("0"))
        precision = max(digits, len(frac), 1)
        return f"CAST('{plain}' AS DECIMAL({min(precision, 38)},{len(frac)}))"
    if isinstance(v, (bytes, bytearray)):
        return f"X'{bytes(v).hex()}'"
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v}'"
    s = str(v).replace("\\", "\\\\").replace("'", "''")
    return "'" + s + "'"


def inline_params(fragments: list[str | None], params) -> list[str | None]:
    """Substitute ``:name`` / positional ``?`` bind markers with SQL
    literals across a list of statement fragments (SET, WHERE,
    RETURNING — positional markers consume left to right across the
    fragments in statement order). String literals inside the
    fragments are masked first so a ``?`` or ``:x`` INSIDE a quoted
    string is never touched. Matches the reference's surface, which
    forwards ``*args`` to SQLAlchemy ``text()`` for every statement
    class (/root/reference/risingwave/core.py:176)."""
    named = params if isinstance(params, dict) else None
    pos = iter(params if not isinstance(params, dict) else ())
    used: set[str] = set()

    def sub_one(frag: str) -> str:
        masked, lits = _mask_literals(frag)

        def named_repl(m: re.Match) -> str:
            key = m.group(1)
            if named is None or key not in named:
                raise KeyError(f"no bind value for :{key}")
            used.add(key)
            return sql_literal(named[key])

        masked = re.sub(r"(?<![:\w]):([A-Za-z_]\w*)", named_repl, masked)
        if named is not None and "?" in masked:
            # silently leaving a ? unbound would surface later as an
            # opaque F.expr parse error — fail at bind time instead
            raise ValueError(
                "positional ? markers cannot be mixed with named "
                "bind parameters"
            )
        if named is None:

            def pos_repl(_m: re.Match) -> str:
                try:
                    return sql_literal(next(pos))
                except StopIteration:
                    # a bare StopIteration from inside re.sub surfaces
                    # as an opaque error — raise the real complaint
                    raise ValueError(
                        "more ? markers than positional bind values"
                    ) from None

            masked = re.sub(r"\?", pos_repl, masked)
        return _unmask_literals(masked, lits)

    out = [None if f is None else sub_one(f) for f in fragments]
    if named is not None and used != set(named):
        raise KeyError(
            f"unused bind parameters: {sorted(set(named) - used)}"
        )
    leftover = list(pos)
    if leftover:
        raise ValueError(f"{len(leftover)} unused positional bind values")
    return out


def rewrite_asof_join(sql: str) -> str:
    """``l ASOF [LEFT] JOIN r ON eq-conds AND l.t >= r.t`` → the
    scalable union-window asof plan, entirely in SQL text:

    1. build the asof-match relation M: union the left side's
       DISTINCT (keys, t) probe domain with the (filtered) right
       rows, window per key ordered by time, and carry the latest
       (earliest, for forward asof) right row to each probe with
       ``last(...) IGNORE NULLS`` — right rows travel as one
       ``struct(*)`` column, so no column resolution is needed;
    2. equi-join M back to the left relation on (keys, t).

    One shuffle for the window (on the join keys), one for the
    join-back — never a correlated-subquery domain join (Catalyst
    decorrelates ``LATERAL ... LIMIT 1`` into a distinct-timestamp ×
    right NESTED-LOOP join: quadratic, measured 100× slower at
    sf0.01). Inclusive vs strict inequality is encoded in the
    side-sort order; residual right-only ON terms (``r.kind = 'x'``)
    filter the right branch. Left-only or two-sided non-key terms
    raise (put them in WHERE)."""

    def sub(m: re.Match) -> str:
        la = m.group("la") or m.group("left").split(".")[-1]
        ra = m.group("ra") or m.group("right").split(".")[-1]
        cond = m.group("cond").strip()
        eqs: list[tuple[str, str]] = []  # (left col, right col)
        ineq = None  # (lcol, rcol, forward, strict)
        residual: list[str] = []
        for term in _split_and(cond):
            t = _INEQ_TERM.match(term)
            lp, rp = la + ".", ra + "."
            if t:
                x, op, y = t.group("x"), t.group("op"), t.group("y")
                if op in (">=", "<=", ">", "<"):
                    if x.startswith(lp) and y.startswith(rp):
                        ineq = (x, y, op in ("<=", "<"), op in (">", "<"))
                        continue
                    if x.startswith(rp) and y.startswith(lp):
                        ineq = (y, x, op in (">=", ">"), op in (">", "<"))
                        continue
            e = re.match(r"^\s*(?P<x>[\w.]+)\s*=\s*(?P<y>[\w.]+)\s*$", term)
            if e:
                x, y = e.group("x"), e.group("y")
                if x.startswith(lp) and y.startswith(rp):
                    eqs.append((x, y))
                    continue
                if x.startswith(rp) and y.startswith(lp):
                    eqs.append((y, x))
                    continue
            if lp not in term:
                residual.append(term)
                continue
            raise ValueError(
                f"ASOF JOIN ON supports equalities, one time inequality, "
                f"and right-side filters; move {term!r} to WHERE"
            )
        if ineq is None:
            raise ValueError(
                "ASOF JOIN requires one inequality between a left and "
                f"a right column in the ON clause: {cond!r}"
            )
        if not eqs:
            raise ValueError("ASOF JOIN requires at least one equality key")
        lt, rt, forward, strict = ineq
        keys = ", ".join(f"__rw_k{i}" for i in range(len(eqs)))
        l_keys = ", ".join(f"{l} AS __rw_k{i}" for i, (l, _) in enumerate(eqs))
        r_keys = ", ".join(f"{r} AS __rw_k{i}" for i, (_, r) in enumerate(eqs))
        r_where = " AND ".join(residual) if residual else "true"
        # Side sort: probes are 1; right rows 0 (eligible at equal t)
        # or 2 (strict: excluded at equal t). Time ASC for backward
        # asof (l.t >= r.t), DESC for forward.
        r_side = 2 if strict else 0
        t_dir = "DESC" if forward else "ASC"
        join_kw = "LEFT JOIN" if m.group("outer") else "JOIN"
        on = " AND ".join(
            [f"{l} = {ra}.__rw_k{i}" for i, (l, _) in enumerate(eqs)]
            + [f"{lt} = {ra}.__rw_ts"]
        )
        return (
            f"{m.group('left')} AS {la} {join_kw} (\n"
            f"  SELECT {keys}, __rw_ts, __rw_row.* FROM (\n"
            f"    SELECT {keys}, __rw_ts, __rw_side,\n"
            f"           last(__rw_row) IGNORE NULLS OVER (\n"
            f"             PARTITION BY {keys} ORDER BY __rw_sort {t_dir}, __rw_side ASC\n"
            f"             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __rw_row\n"
            f"    FROM (\n"
            f"      SELECT DISTINCT {l_keys}, {lt} AS __rw_ts, {lt} AS __rw_sort,\n"
            f"             1 AS __rw_side, NULL AS __rw_row\n"
            f"      FROM {m.group('left')} AS {la}\n"
            f"      UNION ALL\n"
            f"      SELECT {r_keys}, NULL AS __rw_ts, {rt} AS __rw_sort,\n"
            f"             {r_side} AS __rw_side, struct(*) AS __rw_row\n"
            f"      FROM {m.group('right')} AS {ra} WHERE {r_where}\n"
            f"    )\n"
            f"  ) WHERE __rw_side = 1 AND __rw_row IS NOT NULL\n"
            f") AS {ra} ON {on}"
        )

    # Literal-safe: mask string literals so 'ASOF' inside a literal is
    # never treated as join syntax; residual ON literals round-trip
    # through their placeholders into the rewritten text.
    masked, lits = _mask_literals(sql)
    if not re.search(r"\bASOF\b", masked, re.I):
        return sql
    return _unmask_literals(_ASOF.sub(sub, masked), lits)


# PG regex-match operators: `expr ~ 'pat'` and friends. Only the
# literal-RHS shape is rewritten (the one the reference's users write);
# `~*` injects (?i) into the pattern. LHS is a column/qualified name
# or a simple call — anything fancier should spell RLIKE directly.
_PG_REGEX_TAIL = re.compile(
    r"(?P<lhs>[\w.]+(?:\([^()]*\))?)\s+(?P<op>!?~\*?)\s*$"
)


def rewrite_pg_regex_ops(sql: str) -> str:
    """Literal-aware: the statement is split on (escape-aware) string
    literals, and `lhs ~` is only recognized at the END of a
    non-literal segment whose NEXT segment is the pattern literal —
    so `~` shapes embedded inside a larger string literal are never
    rewritten."""
    parts = _SQL_LITERAL.split(sql)
    if len(parts) == 1 and "~" not in sql:
        return sql
    out: list[str] = []
    i = 0
    while i < len(parts):
        part = parts[i]
        if i % 2 == 1:  # a string literal — passthrough
            out.append(part)
            i += 1
            continue
        m = _PG_REGEX_TAIL.search(part)
        if m and i + 1 < len(parts):
            lhs, op, pat = m.group("lhs"), m.group("op"), parts[i + 1]
            if op.endswith("*"):
                pat = "'(?i)" + pat[1:]
            expr = f"{lhs} RLIKE {pat}"
            if op.startswith("!"):
                expr = f"NOT ({expr})"
            out.append(part[: m.start()] + expr)
            i += 2
            continue
        out.append(part)
        i += 1
    return "".join(out)


def rewrite_version(sql: str, version_string: str) -> str:
    return re.sub(r"\bversion\s*\(\s*\)", f"'{version_string}'", sql, flags=re.I)


def rewrite_information_schema(sql: str) -> str:
    """Point information_schema refs at engine-maintained temp views."""
    sql = re.sub(r"\binformation_schema\.tables\b", "rw_information_schema_tables", sql, flags=re.I)
    sql = re.sub(
        r"\binformation_schema\.columns\b", "rw_information_schema_columns", sql, flags=re.I
    )
    return sql


# PG/jsonb arrow operators: col -> 'k', col ->> 'k', chained, with
# integer array indexes after the first step. Both map to
# get_json_object (returns the JSON text of the element — for scalar
# leaves identical to PG ->>; nested objects come back as JSON text,
# which is what chained access consumes). The first step must be a
# quoted key: that keeps Spark lambda arrows (`x -> x + 1`,
# `(a, b) -> 0`) out of the pattern.
_JSON_CHAIN = re.compile(r"(?P<base>[\w.]+)(?P<steps>\s*->>?\s*'[^']*'(\s*->>?\s*('[^']*'|\d+))*)")
_JSON_STEP = re.compile(r"\s*(->>?)\s*(?:'(?P<key>[^']*)'|(?P<idx>\d+))")


def rewrite_json_ops(sql: str) -> str:
    """PG `->`/`->>` json access → ``get_json_object`` path lookups."""

    def sub(m: re.Match) -> str:
        path = "$"
        for step in _JSON_STEP.finditer(m.group("steps")):
            if step.group("idx") is not None:
                path += f"[{step.group('idx')}]"
            else:
                key = step.group("key")
                if re.fullmatch(r"\w+", key):
                    path += f".{key}"
                else:
                    # keys containing '.', '[' etc. must be
                    # bracket-quoted or they read as nested lookups
                    path += f"['{key}']"
        return f"get_json_object({m.group('base')}, '{path}')"

    return _JSON_CHAIN.sub(sub, sql)


def rewrite_query(sql: str, version_string: str) -> str:
    sql = rewrite_tumble(sql)
    sql = rewrite_hop(sql)
    sql = rewrite_asof_join(sql)
    sql = rewrite_pg_regex_ops(sql)
    sql = rewrite_version(sql, version_string)
    sql = rewrite_json_ops(sql)
    sql = rewrite_information_schema(sql)
    return sql


# ---------------------------------------------------------------------------
# PostgreSQL-name function shims (SQL-surface parity, SURVEY §2.7)
# ---------------------------------------------------------------------------

# Most PG spellings the reference's pass-through surface can emit are
# native in Spark 4 (`::` casts, now(), split_part, ||, position(IN),
# string_agg, left/right, btrim). The rest are registered as SQL UDFs
# (pure expression aliases — codegen'd like built-ins, no Python).
_PG_SHIMS = [
    # PG strpos(string, substring) — Spark spells it locate(sub, str).
    "CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING) "
    "RETURNS INT RETURN locate(sub, s)",
    # PG generate_series(a, b) is a set-returning function; the scalar
    # shim returns the array (use explode(...) where PG would FROM it).
    "CREATE OR REPLACE TEMPORARY FUNCTION generate_series(a BIGINT, b BIGINT) "
    "RETURNS ARRAY<BIGINT> RETURN sequence(a, b)",
    # (to_char is NOT shimmed: Spark 4 ships a built-in to_char for
    # numeric formatting that a SQL UDF cannot replace; PG datetime
    # to_char callers use date_format.)
    # PG string_to_array(string, delim) — Spark's split takes a regex;
    # \Q…\E quotes the delimiter so any character splits literally.
    r"CREATE OR REPLACE TEMPORARY FUNCTION string_to_array(s STRING, d STRING) "
    r"RETURNS ARRAY<STRING> RETURN split(s, concat('\\Q', d, '\\E'))",
    # PG array_length(arr, dim) — only dim=1 exists for Spark arrays.
    "CREATE OR REPLACE TEMPORARY FUNCTION array_length(a ARRAY<STRING>, dim INT) "
    "RETURNS INT RETURN CASE WHEN dim = 1 THEN size(a) END",
    # PG split_part is built into Spark 4; left/right/btrim likewise.
]


def register_pg_shims(spark) -> None:
    """Install the PG-name aliases in the session (idempotent)."""
    for ddl in _PG_SHIMS:
        spark.sql(ddl)
