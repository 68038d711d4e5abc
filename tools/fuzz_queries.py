"""Deep randomized three-way equivalence sweep (index path vs full scan vs
DuckDB) — the heavier offline twin of tests/test_property_queries.py.

Usage: python tools/fuzz_queries.py [n_examples] [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from hypothesis import HealthCheck, given, seed, settings

from tests.test_property_queries import query_st, to_sql

from accumulo_wikisearch_spark.plans.parser import parse
from accumulo_wikisearch_spark.plans.planner import to_nnf


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.sources.corpus import get_engine

    spark = get_spark("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    engine = get_engine(spark, sf_dir)
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )

    ran = [0]

    @seed(20260813)
    @settings(
        max_examples=n,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(q=query_st)
    def check(q: str) -> None:
        nnf = to_nnf(parse(q))
        want = sorted(
            r[0]
            for r in duck.execute(
                f"SELECT doc_id FROM documents WHERE {to_sql(nnf)}"
            ).fetchall()
        )
        got_df, path = engine.query_with_path(q)
        got = sorted(r["doc_id"] for r in got_df.collect())
        assert got == want, f"index path ({path}) != duckdb for {q!r}"
        # every 3rd example also sweeps a pseudo-random auths subset so
        # dual-path branches and security pruning get continuous coverage
        if ran[0] % 3 == 0:
            import random as _r

            auths = _r.Random(ran[0]).sample(["en", "fr", "zh", "de", "es"], 2)
            al = ",".join(f"'{a}'" for a in sorted(auths))
            want_a = sorted(
                r[0]
                for r in duck.execute(
                    "SELECT doc_id FROM documents WHERE "
                    f"({to_sql(nnf)}) AND lang IN ({al})"
                ).fetchall()
            )
            got_a = sorted(
                r["doc_id"] for r in engine.query(q, auths=auths).collect()
            )
            assert got_a == want_a, f"auths={auths} mismatch for {q!r}"
        ran[0] += 1
        if ran[0] % 25 == 0:
            print(f"  {ran[0]} queries checked")

    check()
    print(f"OK: {ran[0]} random queries, three-way equivalent (incl. auths sweeps)")


if __name__ == "__main__":
    main()
