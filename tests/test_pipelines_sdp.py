"""Contract pins for the Spark Declarative Pipelines exhibit
(operators/pipelines_sdp.py): the decorators must register exactly the
promised graph elements, and the local mini-runner must execute them to
the same result twice (idempotent temp-view materialization)."""

from __future__ import annotations


def test_medallion_graph_registers_expected_elements(spark, sf_dir):
    from pyspark.pipelines.output import MaterializedView, Table

    from parallel_mapreduce_spark.operators.pipelines_sdp import (
        build_medallion_graph,
    )
    from parallel_mapreduce_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    reg = build_medallion_graph(spark, sf_dir)
    names = [o.name for o in reg.outputs]
    assert names == [
        "sdp_bronze_orders",
        "sdp_silver_status_summary",
        "sdp_gold_status_report",
    ]
    assert isinstance(reg.outputs[0], MaterializedView)
    assert isinstance(reg.outputs[1], MaterializedView)
    assert isinstance(reg.outputs[2], Table)
    # comments survive the decorator round trip
    assert reg.outputs[0].comment == "high-value orders, ingest filter"
    # one flow per dataset, each targeting its own dataset, each carrying
    # the source location of the decorated function
    assert [f.target for f in reg.flows] == names
    for f in reg.flows:
        assert f.source_code_location.filename.endswith(
            "pipelines_sdp.py"
        )


def test_medallion_runner_is_idempotent(spark, sf_dir):
    from parallel_mapreduce_spark.operators.pipelines_sdp import (
        build_medallion_graph,
        run_graph,
    )
    from parallel_mapreduce_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    reg = build_medallion_graph(spark, sf_dir)
    r1 = run_graph(spark, reg)["sdp_gold_status_report"].collect()
    r2 = run_graph(spark, reg)["sdp_gold_status_report"].collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert len(r1) == 3  # one row per order status
