"""Edge-semantics tests for the round-5 lakehouse/format queries — the
cases the sf-scaled oracle parity can't hit: empty/total deletion-vector
sets, snapshot immutability after later commits, XML markup escaping,
and variant_get over absent paths."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_deletion_vector_empty_and_total(spark, tmp_path):
    """Merge-on-read must be exact at both extremes: an empty DV keeps
    every row; a DV listing every position yields zero rows."""
    base = str(tmp_path / "base")
    spark.range(100).withColumn("v", F.col("id") * 2).repartition(4).write.parquet(base)
    with_pos = spark.read.parquet(base).select(
        "*",
        F.col("_metadata.file_name").alias("_file"),
        F.col("_metadata.row_index").alias("_pos"),
    )
    empty_dv = with_pos.select("_file", "_pos").limit(0)
    assert with_pos.join(
        F.broadcast(empty_dv), ["_file", "_pos"], "left_anti"
    ).count() == 100
    total_dv = with_pos.select("_file", "_pos")
    assert with_pos.join(
        F.broadcast(total_dv), ["_file", "_pos"], "left_anti"
    ).count() == 0


def test_deletion_vector_conserves_rows(spark, sf_dir):
    """kept + tombstoned == total, and the kept set equals the logical
    filter row-for-row (key-level, not just counts)."""
    from parallel_mapreduce_spark.sources import load_table
    from parallel_mapreduce_spark.sources.roundtrip import (
        DV_DELETE_MOD as MOD,
        dv_alive_rows,
        merge_on_read_deletion_vectors,
    )

    orders = load_table(spark, sf_dir, "orders")
    total = orders.count()
    doomed_pred = (F.col("o_orderstatus") == "F") & (
        F.col("o_orderkey") % MOD == 0
    )
    doomed = orders.filter(doomed_pred).count()
    # One dv_alive_rows call materializes the base+tombstone sink once;
    # both the count check and the key-set check derive from that frame
    # (merge_on_read_deletion_vectors would re-run the whole rewrite).
    alive = dv_alive_rows(spark, sf_dir)
    assert alive.count() == total - doomed
    # Key-level: the merge-on-read kept set equals the logical filter
    # row-for-row in both directions (exceptAll is a multiset diff, so a
    # duplicate-key imbalance would also surface).
    alive_keys = alive.select("o_orderkey")
    logical_keys = orders.filter(~doomed_pred).select("o_orderkey")
    assert alive_keys.exceptAll(logical_keys).count() == 0
    assert logical_keys.exceptAll(alive_keys).count() == 0


def test_snapshot_one_is_immutable_after_second_commit(spark, sf_dir):
    """Reading snapshot 1's manifest after batch 2 landed must return
    exactly snapshot 1's rows — later commits never touch earlier files."""
    from parallel_mapreduce_spark.sources.roundtrip import (
        SNAPSHOT_SPLIT_MOD,
        snapshot_manifest_time_travel,
    )
    from parallel_mapreduce_spark.sources import load_table

    rows = {
        r.snapshot_id: (r.n_orders, r.total_price)
        for r in snapshot_manifest_time_travel(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    n1 = orders.filter(F.col("o_orderkey") % SNAPSHOT_SPLIT_MOD != 0).count()
    n2 = orders.count()
    assert rows[1][0] == n1 and rows[2][0] == n2
    assert rows[1][0] < rows[2][0]


def test_xml_roundtrip_escapes_markup_characters(spark, tmp_path):
    """The XML writer must escape &, <, >, quotes and the reader must
    unescape them exactly — the property the supplier-name oracle can't
    stress because generated names are alphanumeric."""
    nasty = [
        (1, 'a & b < c > d "quoted" \'apos\''),
        (2, "<tag>not markup</tag>"),
        (3, "]]> cdata-terminator &amp; pre-escaped"),
    ]
    df = spark.createDataFrame(nasty, "id bigint, s string")
    out = str(tmp_path / "xml")
    df.write.format("xml").option("rowTag", "row").save(out)
    back = (
        spark.read.schema("id bigint, s string")
        .format("xml")
        .option("rowTag", "row")
        .load(out)
    )
    assert sorted(map(tuple, back.collect())) == sorted(nasty)


def test_variant_get_absent_path_is_null(spark):
    """variant_get over a path the document doesn't carry must be NULL,
    not an error — heterogeneous event payloads routinely omit fields."""
    df = spark.sql(
        "SELECT parse_json('{\"a\": 1}') AS v"
    ).select(
        F.expr("variant_get(v, '$.a', 'bigint')").alias("a"),
        F.expr("variant_get(v, '$.missing', 'bigint')").alias("m"),
        F.expr("variant_get(v, '$.a.nested', 'string')").alias("n"),
    )
    row = df.collect()[0]
    assert row.a == 1 and row.m is None and row.n is None


def test_dynamic_overwrite_leaves_other_partitions_untouched(
    spark, sf_dir, tmp_path
):
    """The physical contract behind dynamic_partition_overwrite_stats that
    the value oracle can't see: a dynamic overwrite of one partition must
    not REWRITE the others — their data files stay byte-identical in
    place (same paths, sizes, mtimes; zero rewrite amplification) while
    the target partition's files are replaced. The static-mode twin's
    destructiveness is pinned too: after it, only the written partition's
    directory remains."""
    import os

    def _files(root):
        out = {}
        for dirpath, _dirs, names in os.walk(root):
            part = os.path.basename(dirpath)
            if not part.startswith("lang="):
                continue
            for n in names:
                if n.startswith("part-"):
                    p = os.path.join(dirpath, n)
                    st = os.stat(p)
                    out[(part, n)] = (st.st_size, st.st_mtime_ns)
        return out

    from parallel_mapreduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    revised = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
    dyn = str(tmp_path / "dyn")
    docs.repartition("lang").write.mode("overwrite").partitionBy("lang").parquet(dyn)
    before = _files(dyn)
    (
        revised.repartition("lang")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(dyn)
    )
    after = _files(dyn)
    before_others = {k: v for k, v in before.items() if k[0] != "lang=en"}
    after_others = {k: v for k, v in after.items() if k[0] != "lang=en"}
    assert before_others == after_others  # untouched, byte-for-byte in place
    assert before_others  # non-vacuous: other partitions exist
    # the target partition's file set was replaced, not appended to
    assert {k for k in before if k[0] == "lang=en"}.isdisjoint(
        {k for k in after if k[0] == "lang=en"}
    )
    assert any(k[0] == "lang=en" for k in after)
    # static twin: the same revised write without the option truncates all
    stat = str(tmp_path / "stat")
    docs.repartition("lang").write.mode("overwrite").partitionBy("lang").parquet(stat)
    revised.repartition("lang").write.mode("overwrite").partitionBy("lang").parquet(stat)
    assert {k[0] for k in _files(stat)} == {"lang=en"}
