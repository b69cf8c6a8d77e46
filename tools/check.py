"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle on the same
parquet, sorts columns by name, sorts rows, and compares values exactly
(with a tiny float tolerance fallback reported separately so we can chase
bit-level divergence to zero).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from incubator_flink_spark import get_spark
from incubator_flink_spark.catalog import TABLES
from incubator_flink_spark.queries import REGISTRY


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(rows, cols):
    """Sort columns by name, then rows; stringify for comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v!r}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def _kind(df, col):
    """Canonical dtype kind for driver-hash parity checking.

    The driver compares results through pandas (Spark ``toPandas()`` vs
    DuckDB ``.df()``).  Value-exact results still hash-mismatch when the
    two sides land in different pandas representations, e.g. Spark
    DECIMAL -> object(decimal.Decimal) while DuckDB DECIMAL -> float64,
    or DuckDB HUGEINT (SUM of ints) -> float64 while Spark -> int64.
    """
    s = df[col]
    k = str(s.dtype)
    if k.startswith("datetime64"):
        return "datetime"
    if k in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32"):
        # the driver's hash proved int-width tolerant in round 1
        # (window_topn_events: spark int32 rn vs duck int64 → hash_match true)
        return "int"
    if k == "object":
        v = next((x for x in s if x is not None), None)
        if v is None:
            return "obj:empty"
        t = type(v).__name__
        if t in ("list", "ndarray", "tuple"):
            return "seq"
        return f"obj:{t}"
    return k


def dtype_parity(sdf, con, oracle):
    """Return list of per-column kind mismatches between Spark and DuckDB."""
    spd = sdf.toPandas()
    dpd = con.execute(oracle).df()
    issues = []
    for c in spd.columns:
        if c not in dpd.columns:
            continue
        sk, dk = _kind(spd, c), _kind(dpd, c)
        if sk != dk:
            issues.append(f"{c}: spark={sk} duck={dk}")
    return issues


def close_enough(a, b):
    """Secondary check: equal up to 1e-9 relative on floats."""
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        try:
            fx, fy = float(x), float(y)
        except ValueError:
            return False
        if not math.isclose(fx, fy, rel_tol=1e-9, abs_tol=1e-12):
            return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duck_con(sf_dir)
    failures = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"ok?  {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            dres = con.execute(q.oracle)
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc, sn = normalize(srows, scols)
        dc, dn = normalize(drows, dcols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            failures.append(name)
            continue
        if len(sn) != len(dn):
            print(f"FAIL {name}: rowcount spark={len(sn)} duck={len(dn)}")
            failures.append(name)
            continue
        if sn == dn:
            try:
                issues = dtype_parity(sdf, con, q.oracle)
            except Exception as e:  # pandas conversion itself failed
                issues = [f"pandas conversion error: {e}"]
            if issues:
                print(f"WARN {name}: values exact but pandas dtype mismatch (driver hash would FAIL): {issues}")
                failures.append(name)
            else:
                print(f"PASS {name}: {len(sn)} rows exact [{time.time()-t0:.1f}s]")
            continue
        mism = [(a, b) for a, b in zip(sn, dn) if a != b]
        if all(close_enough(a, b) for a, b in mism):
            print(f"WARN {name}: {len(mism)}/{len(sn)} rows differ only at <1e-9 (hash would MISMATCH)")
            for a, b in mism[:3]:
                print(f"   spark={a}\n   duck ={b}")
            failures.append(name)
        else:
            print(f"FAIL {name}: {len(mism)}/{len(sn)} rows differ")
            for a, b in mism[:3]:
                print(f"   spark={a}\n   duck ={b}")
            failures.append(name)
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
