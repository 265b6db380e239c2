"""Registry bookkeeping: README's query counts must match reality.

The r5 verdict flagged silent doc drift (README said 89 and 133 while
the registry held 135). These asserts make the drift impossible: any
registry growth without a README update fails the suite.
"""

import re
from pathlib import Path

from real_time_data_pipeline_spark.queries import REGISTRY, oracle_sql, queries

README = (Path(__file__).resolve().parent.parent / "README.md").read_text()


def test_readme_tree_count_is_a_true_lower_bound():
    m = re.search(r"the registry: (\d+)\+ named queries", README)
    assert m, "README tree must state the registry size as 'N+ named queries'"
    assert len(REGISTRY) >= int(m.group(1))


def test_readme_bench_paragraph_count_is_exact():
    m = re.search(r"full (\d+)-query registry", README)
    assert m, "README must state the full registry size"
    assert int(m.group(1)) == len(REGISTRY)


def test_every_query_exposed_with_oracle_keys_subset():
    q, o = queries(), oracle_sql()
    assert set(q) == set(REGISTRY)
    # every oracle key names a real query; non-SQL-expressible ops may
    # legitimately omit an oracle (driver records a rows-only check)
    assert set(o) <= set(q)


def test_no_oracle_emits_hugeint_output_columns():
    """One-shot audit for the r7 red-query bug class (VERDICT r7 #2).

    DuckDB's sum(INTEGER/BIGINT) returns HUGEINT, which pandas fetches
    as float64 — so an oracle whose SELECT list exposes a bare integer
    sum hashes "25.0" where Spark hashes "25" at the external gate.
    Bind every oracle (lazily — no execution) against the sf0.001
    views and assert no output column resolves to HUGEINT/UHUGEINT;
    the fix at each offending site is CAST(... AS BIGINT).
    """
    import os

    import duckdb

    from tests.oracle import TABLES

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    offending = []
    for name, sql in oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in ("HUGEINT", "UHUGEINT"):
                offending.append(f"{name}.{col}")
    assert not offending, (
        "oracle output columns typed HUGEINT (pandas lands these as "
        f"float64 → external hash mismatch; wrap in CAST(... AS BIGINT)): "
        f"{offending}"
    )
