"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares:

- row count
- column-name set
- result TYPES (Spark ``df.dtypes`` vs DuckDB ``DESCRIBE``, canonically
  mapped — catches HUGEINT-vs-BIGINT drift that the driver's typed hash
  fails on even when values are identical; see tools/check_types.py)
- order-insensitive values (columns sorted by name, rows sorted; floats
  compared both exactly and with 1e-9 relative tolerance so we can see
  whether a mismatch is real or summation-order ulps)

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def _row_sort_key(t: tuple):
    """Order-insensitive alignment key: non-float columns lead (as
    strings), float columns trail (numerically, NaNs last). Floats
    must NOT participate in the primary key — two rows identical in
    every label column but with ulp-level float noise would otherwise
    sort-swap between engines and misalign the comparison (seen on
    q23 at 10x: two windows with equal sums in DuckDB, one an ulp off
    in Spark, flagged the TIMESTAMP column as a 4-value mismatch)."""
    labels = tuple(str(x) for x in t if not isinstance(x, float))
    floats = tuple(
        (x != x, 0.0 if x != x else x) for x in t if isinstance(x, float)
    )
    return labels, floats


def normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=_row_sort_key), [cols[i] for i in order]


def values_equal(a, b) -> tuple[bool, bool]:
    """(exact, approx) equality."""
    if a is None or b is None:
        eq = a is None and b is None
        return eq, eq
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        approx = exact or math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
        return exact, approx
    eq = a == b
    return eq, eq


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from kaggle_data_pipeline_with_aws_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    from kaggle_data_pipeline_with_aws_spark.sources.readers import TABLES

    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark directory-per-table layout
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        notes = []
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            notes.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        else:
            from check_types import canon_duck, canon_spark

            s_types = {c: canon_spark(t) for c, t in sdf.dtypes}
            d_desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            d_types = {r[0]: canon_duck(r[1]) for r in d_desc}
            tdiffs = [
                f"{c}: spark={s_types[c]} duck={d_types[c]}"
                for c in sorted(s_types)
                if s_types[c] != d_types.get(c)
            ]
            if tdiffs:
                ok = False
                notes.append("types " + "; ".join(tdiffs))
        if len(s_rows) != len(d_rows):
            ok = False
            notes.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if ok:
            sn, _ = normalize(s_rows, s_cols)
            dn, _ = normalize(d_rows, d_cols)
            n_exact_bad = n_approx_bad = 0
            first_bad = None
            for sr, dr in zip(sn, dn):
                for sv, dv in zip(sr, dr):
                    exact, approx = values_equal(sv, dv)
                    if not exact:
                        n_exact_bad += 1
                        if first_bad is None:
                            first_bad = (sv, dv)
                    if not approx:
                        n_approx_bad += 1
            if n_approx_bad:
                ok = False
                notes.append(
                    f"{n_approx_bad} values differ beyond tolerance, first={first_bad}"
                )
            elif n_exact_bad:
                notes.append(
                    f"WARN {n_exact_bad} float ulp-level diffs (first={first_bad})"
                )
        status = "OK   " if ok else "FAIL "
        print(f"{status}{name}: {len(s_rows)} rows ({time.time()-t0:.1f}s) {'; '.join(notes)}")
        if not ok:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
