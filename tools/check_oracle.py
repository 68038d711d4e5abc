"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin at a given sf, compare row-count + column names +
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """Dtype-strict canonical cell: the driver's compare hashes pandas values,
    so int64 123 vs HUGEINT-as-float 123.0 MUST be treated as a mismatch here
    too, and unhashable cells (ndarray/list) must fail loudly."""
    if v is None:
        return None
    # numpy scalar -> python scalar (keeps int/float distinction)
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        try:
            v = v.item()
        except (ValueError, AttributeError):
            pass
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        raise TypeError(
            f"unhashable array cell {type(v).__name__} — the driver's canon "
            "crashes on these; flatten or stringify the column"
        )
    return ("o", v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from accumulo_wikisearch_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(norm_cell(v) for v in r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only  n={len(rows):6d} {dt:5.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(norm_cell(v) for v in r) for r in res.fetchall()]
        except Exception as e:
            failures.append(name)
            print(f"{name:28s} ORACLE-ERROR {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {cols} vs {ocols}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if not problems:
            # null-safe sort: None sorts after every value, equal to None
            cell = lambda v: (v is None, 0 if v is None else v)
            key = lambda rws, cs: sorted(
                tuple(cell(x[1]) for x in sorted(zip(cs, r))) for r in rws
            )
            if key(rows, cols) != key(orows, ocols):
                problems.append("value mismatch")
        if problems:
            failures.append(name)
            print(f"{name:28s} FAIL n={len(rows)} {'; '.join(problems)} {dt:5.1f}s")
        else:
            print(f"{name:28s} OK   n={len(rows):6d} {dt:5.1f}s")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
