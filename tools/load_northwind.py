"""Load the reference's Northwind dump into committed parquet fixtures.

The reference ships its secondary dataset as a PostgreSQL dump
(reference northwind.sql:250-3696 — 3,362 single-line ``INSERT INTO
<table> VALUES (...);`` rows over the 14 tables declared at
northwind.sql:43-247).  A user porting the reference brings THESE rows,
so the engine's Northwind catalog entries must run over them, not over
synthetic shapes.  This loader parses the INSERT literals against the
engine's schema registry (schemas.NORTHWIND_SCHEMAS) and freezes one
parquet file per table under ``fixtures/northwind/`` — the same
frozen-fixture convention as fixtures/fakestream (the Spark plan and
the DuckDB oracle then read the very same bytes).

Run once: ``python tools/load_northwind.py``.  Deterministic output —
rows land in dump order, one row group, no timestamps.
"""

from __future__ import annotations

import datetime
import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ultimate_data_engineering_project_spark import schemas  # noqa: E402

DUMP = "/root/reference/OLTP_simulator/northwind.sql"
OUT_DIR = os.path.join(REPO, "fixtures", "northwind")

_INSERT_RE = re.compile(r"^INSERT INTO (\w+) VALUES \((.*)\);\s*$")


def split_values(s: str) -> list[str]:
    """Split a Postgres VALUES tuple body on top-level commas.
    Single-quoted strings use '' as the escape for a literal quote.
    Quoted content is bracketed by \\x00 markers on BOTH ends (NULL vs
    'NULL', and so the token-level .strip() — which must eat whitespace
    around unquoted literals — can never reach whitespace that is part
    of the quoted value itself: 'Owner ' keeps its trailing space)."""
    out, buf, i, in_str = [], [], 0, False
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "'":
                if i + 1 < len(s) and s[i + 1] == "'":  # escaped quote
                    buf.append("'")
                    i += 2
                    continue
                in_str = False
                buf.append("\x00")  # close marker: protects edge spaces
            else:
                buf.append(c)
        else:
            if c == "'":
                in_str = True
                buf.append("\x00")  # mark "was quoted" (NULL vs 'NULL')
            elif c == ",":
                out.append("".join(buf).strip())
                buf = []
            else:
                buf.append(c)
        i += 1
    out.append("".join(buf).strip())
    return out


def convert(raw: str, dtype) -> object:
    """One SQL literal -> a Python value matching the Spark field type."""
    import pyspark.sql.types as T

    quoted = raw.startswith("\x00")
    if quoted:
        raw = raw[1:]
        if raw.endswith("\x00"):
            raw = raw[:-1]  # close marker (see split_values)
    elif raw.upper() == "NULL":
        return None
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.LongType)):
        return int(raw)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(raw)
    if isinstance(dtype, T.DateType):
        return datetime.date.fromisoformat(raw)
    if isinstance(dtype, T.BinaryType):
        # bytea hex literal '\x....' (categories/employees pictures)
        hexpart = raw[2:] if raw.startswith("\\x") else raw
        return bytes.fromhex(hexpart)
    return raw


_PA_TYPES = {
    "int": pa.int32(),
    "smallint": pa.int16(),
    "long": pa.int64(),
    "double": pa.float64(),
    "float": pa.float32(),
    "string": pa.string(),
    "date": pa.date32(),
    "binary": pa.binary(),
}


def arrow_schema(struct) -> pa.Schema:
    return pa.schema(
        [
            pa.field(f.name, _PA_TYPES[f.dataType.simpleString()], f.nullable)
            for f in struct.fields
        ]
    )


def main() -> None:
    tables: dict[str, list[list[object]]] = {t: [] for t in schemas.NORTHWIND_SCHEMAS}
    n_matched = n_insert_lines = 0
    with open(DUMP, encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("INSERT INTO"):
                n_insert_lines += 1
            m = _INSERT_RE.match(line)
            if not m:
                continue
            n_matched += 1
            table, body = m.group(1), m.group(2)
            struct = schemas.NORTHWIND_SCHEMAS[table]
            raws = split_values(body)
            assert len(raws) == len(struct.fields), (table, len(raws))
            tables[table].append(
                [convert(r, f.dataType) for r, f in zip(raws, struct.fields)]
            )
    # the line-anchored regex silently skips statements that span lines
    # or deviate in shape — a regenerated dump would corrupt fixtures
    # quietly.  Two guards: every INSERT line must have matched, and the
    # total must equal the committed dump's statement count.
    assert n_matched == n_insert_lines, (
        f"{n_insert_lines - n_matched} INSERT statements did not match the "
        "single-line INSERT regex — the dump format changed; fix the parser "
        "before regenerating fixtures"
    )
    assert n_matched == 3362, (
        f"expected 3362 INSERT statements in the committed dump, matched "
        f"{n_matched} — dump changed; re-verify row counts before freezing"
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    for table, rows in sorted(tables.items()):
        struct = schemas.NORTHWIND_SCHEMAS[table]
        cols = list(zip(*rows)) if rows else [[] for _ in struct.fields]
        pa_schema = arrow_schema(struct)
        arr = [
            pa.array(list(col), type=field.type)
            for col, field in zip(cols, pa_schema)
        ]
        pq.write_table(
            pa.Table.from_arrays(arr, schema=pa_schema),
            os.path.join(OUT_DIR, f"{table}.parquet"),
            compression="snappy",
        )
        print(f"{table}: {len(rows)} rows")


if __name__ == "__main__":
    main()
