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


def test_read_csv_schema_and_corrupt_handling(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("k,v\n1,10.5\n2,oops\n3,30.5\n")
    from real_time_data_pipeline_spark.sources.tables import read_csv

    df = read_csv(spark, str(p), schema="k long, v double")
    rows = {r.k: r.v for r in df.collect()}
    assert rows[1] == 10.5 and rows[3] == 30.5
    assert rows[2] is None  # malformed cell nulled, row kept (PERMISSIVE)


def test_read_json_lines(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\nnot json\n')
    from real_time_data_pipeline_spark.sources.tables import read_json

    # Spark disallows filtering on ONLY the corrupt column straight off
    # the scan — materialize first (documented JSON-source restriction).
    df = read_json(
        spark, str(p), schema="k long, v string, _corrupt_record string"
    ).cache()
    try:
        ok = {r.k: r.v for r in df.where("_corrupt_record is null").collect()}
        bad = df.where("_corrupt_record is not null").count()
        assert ok == {1: "a", 2: "b"} and bad == 1
    finally:
        df.unpersist()
