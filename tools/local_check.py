#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/local_check.py [sfdir] [outdir]

Reads each <outdir>/<name> parquet written by graft.Verify, runs the
matching SQL from <outdir>/oracle_sql.json in DuckDB (bare table names
resolved to <sfdir>/<table>.parquet views), sorts columns by name and rows
by all columns, and compares values the way the driver's hash does:
repr-stringified, type-sensitive (Decimal('62') != 62, 1.0 != 1). A
value-equal-but-type-different result is reported as HASH-FAIL, not EXACT.
Floats to 1e-9 rel remain a fallback diagnostic only.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as pads

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    # sort columns by name, then rows lexicographically (None first)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((v is not None, str(type(v)), str(v)) for v in t)
    return sorted(cols), sorted(out, key=key)


def approx_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_exact = n_approx = n_fail = n_missing = 0
    results = {}
    names = sorted(d.name for d in outdir.iterdir() if d.is_dir())
    for name in names:
        spark_tbl = pads.dataset(str(outdir / name)).to_table()
        s_cols = [c.lower() for c in spark_tbl.column_names]
        s_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(s_rows)}"
            n_missing += 1
            continue
        try:
            # fetch through ARROW, the driver's path: duckdb's native
            # fetchall() coerces HUGEINT->int and hides exactly the
            # typing bugs the driver's hash trips on (HUGEINT arrives
            # as decimal128 -> Decimal under arrow)
            d_tbl = con.execute(oracle[name]).fetch_arrow_table()
            d_cols = [c.lower() for c in d_tbl.column_names]
            d_rows = [tuple(r.values()) for r in d_tbl.to_pylist()]
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            results[name] = f"SCHEMA-MISMATCH spark={sc} duck={dc}"
            n_fail += 1
            continue
        if len(sr) != len(dr):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(sr)} duck={len(dr)}"
            n_fail += 1
            continue
        # driver-identical strictness: repr is type-sensitive where == is not
        # (Decimal('62') == 62 but repr differs, and the driver hash fails)
        if [tuple(map(repr, t)) for t in sr] == [tuple(map(repr, t)) for t in dr]:
            results[name] = f"EXACT rows={len(sr)}"
            n_exact += 1
            continue
        if sr == dr:
            results[name] = (
                f"HASH-FAIL rows={len(sr)} (values == but repr/type differs "
                f"— driver hash would FAIL; check oracle CASTs)")
            n_fail += 1
            continue
        # value-level diff
        bad = []
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b and not all(approx_eq(x, y) for x, y in zip(a, b)):
                bad.append((i, a, b))
                if len(bad) >= 3:
                    break
        if not bad:
            results[name] = f"APPROX rows={len(sr)} (float ulps — hash would FAIL)"
            n_approx += 1
        else:
            results[name] = f"VALUE-MISMATCH e.g. {bad[0]}"
            n_fail += 1

    for k in sorted(results):
        print(f"{k:26s} {results[k]}")
    print(f"\nexact={n_exact} approx={n_approx} fail={n_fail} no-oracle={n_missing}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
