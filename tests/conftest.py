import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from real_time_data_pipeline_spark.session import get_spark

    s = get_spark(app_name="rtdp-tests", shuffle_partitions=8)
    # Exercise the RELIABLE checkpoint path of operators/materialize.py
    # (graph queries et al.) rather than the localCheckpoint fallback.
    if s.sparkContext.getCheckpointDir() is None:
        s.sparkContext.setCheckpointDir(
            str(tmp_path_factory.mktemp("spark-checkpoints"))
        )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Unpersist `persist_tracked` frames after every test: similarity
    buckets / ranking range-exchanges otherwise accumulate in executor
    memory for the whole session (bench and the parity harness release
    per query; the suite must too). Safe at teardown: the test's final
    actions have run, lineage recomputes on any later re-collect, and
    foreachBatch bodies register into their own `cache_scope`, not the
    global registry. Shared artifacts use `reliable_materialize` and
    are explicitly unaffected (queries/artifacts.py module doc)."""
    yield
    from real_time_data_pipeline_spark.operators.materialize import release_caches

    release_caches()
