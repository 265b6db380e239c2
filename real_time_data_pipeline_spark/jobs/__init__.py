"""spark-submit-able job entrypoints (reference O2).

Each module exposes ``main(argv)`` and is launchable either as
``spark-submit -m real_time_data_pipeline_spark.jobs.backfill ...``-style
python files or directly under an existing SparkSession (tests,
notebooks, Airflow PythonOperator).
"""
