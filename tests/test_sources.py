"""Source/sink round trips: csv, json, partitioned parquet."""

from __future__ import annotations


def _docs_head(spark, sf_dir):
    from parallel_mapreduce_spark.sources import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    from parallel_mapreduce_spark.sources import read_csv, write_table

    df = _docs_head(spark, sf_dir)
    path = str(tmp_path / "docs_csv")
    write_table(df, path, fmt="csv")
    back = read_csv(spark, path, schema="doc_id bigint, lang string, n_chars bigint")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    from parallel_mapreduce_spark.sources import read_json, write_table

    df = _docs_head(spark, sf_dir)
    path = str(tmp_path / "docs_json")
    write_table(df, path, fmt="json")
    back = read_json(spark, path, schema="doc_id bigint, lang string, n_chars bigint")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_parquet_sink_prunes(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.sources import write_table

    df = _docs_head(spark, sf_dir)
    path = str(tmp_path / "docs_part")
    write_table(df, path, fmt="parquet", partition_by=["lang"])
    back = spark.read.parquet(path)
    one = back.filter(F.col("lang") == "en")
    # Partition pruning must reach the scan: the physical plan's partition
    # filters mention lang, and the result matches a plain filter.
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    assert one.count() == df.filter(F.col("lang") == "en").count()
