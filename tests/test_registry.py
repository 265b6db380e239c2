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
