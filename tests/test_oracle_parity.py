"""Every registry query with an oracle must hash-match DuckDB at sf0.001.

This is the local twin of the driver's CORRECTNESS gate.
"""

import pytest

from real_time_data_pipeline_spark.queries import REGISTRY
from tests.oracle import assert_matches


def _specs():
    return [s for s in REGISTRY.values() if s.oracle is not None]


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_query_matches_oracle(spark, sf_dir, spec):
    from real_time_data_pipeline_spark.operators.materialize import release_caches

    df = spec.fn(spark, sf_dir)
    assert_matches(df, spec.oracle, sf_dir)
    # The parity suite is a long-lived session running all registry
    # queries via spec.fn RAW — the queries() hygiene drain never
    # runs here, so drain the tracked-persist registry per query
    # ourselves (this one call releases the ranking helpers' shared
    # range shuffles AND every other persist_tracked frame —
    # release_rank_caches delegates to the same drain). Safe:
    # assert_matches collected the result, so everything registered
    # is materialized and recomputation cannot change values.
    release_caches()


def test_registry_nonempty():
    assert len(REGISTRY) >= 5


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
