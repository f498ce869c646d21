"""Oracle result-type audit.

The driver's correctness gate hashes TYPED values (DuckDB results go
through Arrow), so a Spark ``bigint`` vs DuckDB ``HUGEINT``
(= Arrow ``decimal128(38,0)``) mismatch fails the hash even when every
value is identical.  VERDICT r1 found exactly this on q06/q13 and three
latent copies.  This tool catches ALL of them locally:

- Spark side: build each registered plan lazily and read ``df.dtypes``
  (no execution beyond what plan construction itself needs).
- DuckDB side: ``DESCRIBE <oracle sql>`` (no execution).
- Map both to a canonical type string and diff per column.

Usage: python tools/check_types.py [sf_dir] [query ...]
Exit 1 if any oracle-backed query has a column-type mismatch.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def canon_duck(t: str) -> str:
    """DuckDB type string -> canonical (matching Spark simpleString)."""
    t = t.strip()
    m = re.match(r"^(.*)\[\]$", t)
    if m:
        return f"array<{canon_duck(m.group(1))}>"
    u = t.upper()
    if u.startswith("DECIMAL"):
        return u.replace("DECIMAL", "decimal").replace(" ", "")
    mapping = {
        "BIGINT": "bigint",
        "INTEGER": "int",
        "SMALLINT": "smallint",
        "TINYINT": "tinyint",
        "HUGEINT": "decimal(38,0)",  # Arrow decimal128(38,0)
        "UBIGINT": "uint64",
        "DOUBLE": "double",
        "FLOAT": "float",
        "REAL": "float",
        "VARCHAR": "string",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "TIMESTAMP WITH TIME ZONE": "timestamp",
        "BOOLEAN": "boolean",
        "BLOB": "binary",
    }
    return mapping.get(u, u.lower())


def canon_spark(t: str) -> str:
    t = t.replace(" ", "")
    # CORRECTNESS_r01 proved timestamp_ntz hashes identically to DuckDB
    # TIMESTAMP in the driver gate (q07/q08/q16/q17 were green), so the
    # ntz distinction is not a drift.
    if t == "timestamp_ntz":
        return "timestamp"
    return t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from kaggle_data_pipeline_with_aws_spark.session import get_spark
    from kaggle_data_pipeline_with_aws_spark.sources.readers import TABLES

    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"SKIP  {name}: rows-only (no oracle)")
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_types = {c: canon_spark(t) for c, t in sdf.dtypes}
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: spark plan error: {e}")
            bad.append(name)
            continue
        try:
            d = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            d_types = {r[0]: canon_duck(r[1]) for r in d}
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: duckdb describe error: {e}")
            bad.append(name)
            continue
        diffs = []
        for c in sorted(set(s_types) | set(d_types)):
            st, dt = s_types.get(c), d_types.get(c)
            if st != dt:
                diffs.append(f"{c}: spark={st} duck={dt}")
        if diffs:
            print(f"FAIL  {name}: {'; '.join(diffs)}")
            bad.append(name)
        else:
            print(f"OK    {name}")

    print(f"\n{len(bad)} type mismatches" + (f": {bad}" if bad else ""))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
