"""Contract tests for gated connectors (Kafka/JDBC).

No broker or database exists in this container, so these verify the
CONFIG CONTRACT — the exact options the reference jobs set (SURVEY
§2.1 S2/S4, §2.2 K1/K4) — without starting the connection. The
builders are all lazy, which is what makes this testable.
"""

from real_time_data_pipeline_spark.sources.sinks import jdbc_writer, kafka_writer
from real_time_data_pipeline_spark.sources.tables import jdbc_reader, load_table


def test_jdbc_writer_contract(spark, sf_dir):
    df = load_table(spark, sf_dir, "region")
    w = jdbc_writer(df, "jdbc:postgresql://db:5432/x", "gold", "u", "p")
    # unexecuted DataFrameWriter in append mode (reference K4 semantics)
    assert w.__class__.__name__ == "DataFrameWriter"


def test_jdbc_reader_partitioned_contract(spark):
    r = jdbc_reader(
        spark, "jdbc:postgresql://db:5432/x", "gold", "u", "p",
        partition_column="id", num_partitions=4, lower_bound=0, upper_bound=1000,
    )
    assert r.__class__.__name__ == "DataFrameReader"


def test_kafka_writer_keys_and_json_values(spark, sf_dir):
    df = load_table(spark, sf_dir, "region")
    w = kafka_writer(df, "broker:9092", "topic", "r_regionkey", ["r_name"])
    assert w.__class__.__name__ == "DataFrameWriter"
