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


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.sources import load_table, write_bucketed

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed(li, "li_b", str(tmp_path / "li_b"), "l_orderkey", buckets=4)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "orders_b",
        str(tmp_path / "orders_b"),
        "l_orderkey",
        buckets=4,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(spark.table("orders_b"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Co-located: the bucketed scans satisfy the join's distribution —
        # no shuffle, no broadcast.
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # And it computes the right thing.
        n = joined.count()
        assert n == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        # conf.get(key, None) returns None for an UNSET conf (not the
        # engine default), so the restore must unset — `set(prev)` guarded
        # on prev leaked threshold=-1 into the shared session and failed
        # any later broadcast plan assertion in the same pytest run.
        if prev is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")


def test_python_datasource_partition_planning(spark):
    """The pmr_synth custom Python source must plan the requested number of
    partitions (one task each) and stream rows per partition — the Spark-4
    analogue of the reference's per-file-region scan threads."""
    from parallel_mapreduce_spark.sources.pydatasource import (
        SynthReader,
        register_synth_source,
    )

    parts = SynthReader({"rows": "103", "partitions": "8"}).partitions()
    assert len(parts) == 8
    spans = sorted((p.start, p.end) for p in parts)
    # Contiguous, disjoint, covering [0, rows)
    assert spans[0][0] == 0 and spans[-1][1] == 103
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))

    register_synth_source(spark)
    df = (
        spark.read.format("pmr_synth")
        .option("rows", 1000)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 1000
    # Deterministic content: row 999 -> (999 * A + C) % M
    from parallel_mapreduce_spark.sources.pydatasource import (
        SYNTH_A,
        SYNTH_C,
        SYNTH_M,
    )
    last = df.filter("row_id = 999").collect()[0]
    assert last["value"] == (999 * SYNTH_A + SYNTH_C) % SYNTH_M


def test_python_datasource_filter_pushdown_semantics():
    """Reader-level pushdown contract (pushFilters, Spark 4.1): supported
    row_id range filters narrow the planned partition ranges (pruned rows
    are never generated), bucket equality is consumed, and everything else
    comes back as the residual for Spark to re-evaluate. Exactness matters:
    a consumed filter Spark will NOT re-check, so the unit pins the
    narrowed bounds to the filters' exact integer semantics."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        LessThanOrEqual,
        StringContains,
    )

    from parallel_mapreduce_spark.sources.pydatasource import (
        SYNTH_BUCKETS,
        SynthPushdownReader,
    )

    r = SynthPushdownReader({"rows": "1000", "partitions": "4"})
    residual = list(
        r.pushFilters(
            [
                GreaterThan(("row_id",), 99),  # -> lo = 100 (exclusive)
                LessThanOrEqual(("row_id",), 499),  # -> hi = 500 (inclusive)
                EqualTo(("bucket",), 7),
                StringContains(("row_id",), "9"),  # unsupported -> residual
            ]
        )
    )
    assert [type(f).__name__ for f in residual] == ["StringContains"]
    assert (r.lo, r.hi, r.bucket) == (100, 500, 7)
    # The consumed-filter record: exactly the three handled filters, in
    # arrival order (the residual never appears here).
    assert [s.split("(")[0] for s in r.pushed] == [
        "GreaterThan",
        "LessThanOrEqual",
        "EqualTo",
    ]
    spans = sorted((p.start, p.end) for p in r.partitions())
    assert spans[0][0] == 100 and spans[-1][1] == 500
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    rows = [row for p in r.partitions() for row in r.read(p)]
    assert rows and all(i % SYNTH_BUCKETS == 7 for i, _, _ in rows)
    assert all(100 <= i < 500 for i, _, _ in rows)

    # Contradictory range -> empty single partition, not a negative range.
    r2 = SynthPushdownReader({"rows": "1000", "partitions": "4"})
    list(r2.pushFilters([GreaterThan(("row_id",), 900)]))
    list(r2.pushFilters([LessThanOrEqual(("row_id",), 100)]))
    spans2 = [(p.start, p.end) for p in r2.partitions()]
    assert sum(e - s for s, e in spans2) == 0


def test_python_datasource_pushdown_end_to_end(spark):
    """The pushdown source's filtered scan must generate ONLY the pushed
    range (pruning observable through the row ids that exist), while the
    non-pushable residual predicate still filters post-scan."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_spark.session import apply_runtime_conf
    from parallel_mapreduce_spark.sources.pydatasource import (
        PD_BUCKET,
        PD_HI,
        PD_LO,
        SYNTH_BUCKETS,
        register_synth_source,
    )

    apply_runtime_conf(spark)  # enables spark.sql.python.filterPushdown
    register_synth_source(spark)
    df = (
        spark.read.format("pmr_synth_pd")
        .option("rows", 100_000)
        .option("partitions", 8)
        .load()
        .filter(
            (F.col("row_id") >= PD_LO)
            & (F.col("row_id") < PD_HI)
            & (F.col("bucket") == PD_BUCKET)
        )
    )
    got = df.agg(
        F.count("*").alias("n"),
        F.min("row_id").alias("lo"),
        F.max("row_id").alias("hi"),
    ).collect()[0]
    want = [i for i in range(PD_LO, PD_HI) if i % SYNTH_BUCKETS == PD_BUCKET]
    assert (got["n"], got["lo"], got["hi"]) == (
        len(want),
        want[0],
        want[-1],
    )


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir):
    """Two-dimensional file skipping: after the z-order clustered write,
    at least one output file's [min,max] interval must be a strict subset
    of the domain on EACH dimension — impossible for a single-key range
    sort, where every file spans the full range of the other column."""
    from parallel_mapreduce_spark.sources.roundtrip import (
        zorder_clustered_write_stats,
    )
    from parallel_mapreduce_spark.sources.tables import sink_dir

    zorder_clustered_write_stats(spark, sf_dir).collect()  # writes the layout
    from pyspark.sql import functions as F

    back = spark.read.parquet(sink_dir("zorder_sink") + "/orders_zorder")
    boxes = (
        back.select(
            F.input_file_name().alias("f"), "o_custkey", "o_totalprice"
        )
        .groupBy("f")
        .agg(
            F.min("o_custkey").alias("lc"),
            F.max("o_custkey").alias("hc"),
            F.min("o_totalprice").alias("lp"),
            F.max("o_totalprice").alias("hp"),
        )
        .collect()
    )
    assert len(boxes) > 1
    lo_c = min(b["lc"] for b in boxes)
    hi_c = max(b["hc"] for b in boxes)
    lo_p = min(b["lp"] for b in boxes)
    hi_p = max(b["hp"] for b in boxes)
    span_c, span_p = hi_c - lo_c, hi_p - lo_p
    narrow_c = [b for b in boxes if (b["hc"] - b["lc"]) < 0.9 * span_c]
    narrow_p = [b for b in boxes if (b["hp"] - b["lp"]) < 0.9 * span_p]
    assert narrow_c, "no file is prunable on the custkey dimension"
    assert narrow_p, "no file is prunable on the price dimension"


def test_codec_sinks_actually_use_declared_codecs(spark, sf_dir):
    """codec_roundtrip_compare's claim rests on the two sinks genuinely
    using different codecs — if the compression option were silently
    ignored (misspelled option, conf override), the size comparison
    would trivially pass on identical files. Read the parquet footers
    and assert every column chunk records the declared codec."""
    import glob
    import os

    import pyarrow.parquet as pq

    from parallel_mapreduce_spark.sources.roundtrip import codec_roundtrip_compare
    from parallel_mapreduce_spark.sources.tables import sink_dir

    codec_roundtrip_compare(spark, sf_dir).collect()
    base = sink_dir("codec")
    for codec in ("zstd", "snappy"):
        parts = glob.glob(os.path.join(base, codec, "part-*.parquet"))
        assert parts, f"no part files under {codec} sink"
        for part in parts:
            meta = pq.ParquetFile(part).metadata
            for rg in range(meta.num_row_groups):
                for col in range(meta.num_columns):
                    assert (
                        meta.row_group(rg).column(col).compression.lower()
                        == codec
                    ), (part, rg, col)


def test_binaryfile_blob_writer_is_idempotent(spark, sf_dir):
    """Re-invoking the binaryFile ingest must not duplicate or corrupt
    blobs (the atomic .tmp/replace write path): two consecutive runs
    return identical aggregates and the sink holds exactly one .bin per
    doc_id under 20."""
    import glob
    import os

    from parallel_mapreduce_spark.sources.roundtrip import (
        binaryfile_ingest_roundtrip,
    )
    from parallel_mapreduce_spark.sources.tables import sink_dir

    first = binaryfile_ingest_roundtrip(spark, sf_dir).collect()[0]
    second = binaryfile_ingest_roundtrip(spark, sf_dir).collect()[0]
    assert first == second
    assert first["all_roundtrip_exact"] is True
    files = glob.glob(os.path.join(sink_dir("binaryfile"), "*.bin"))
    assert len(files) == first["n_files"]
    assert not glob.glob(os.path.join(sink_dir("binaryfile"), ".*.tmp"))


def test_python_sink_commit_protocol(spark, sf_dir):
    """The custom Python sink's two-phase commit: staged files are
    published by rename only at driver commit(), exactly one part file
    per input partition survives (attempt suffix stripped), the manifest
    row total equals the input count, and staging is cleaned. A second
    overwrite run must replace the generation, not accumulate files."""
    import glob
    import json
    import os

    from parallel_mapreduce_spark.sources.pydatasource import (
        SINK_PARTS,
        python_datasource_write_roundtrip,
    )
    from parallel_mapreduce_spark.sources.tables import load_table, sink_dir

    first = python_datasource_write_roundtrip(spark, sf_dir).collect()
    out = sink_dir("pyds_jsonl_sink") + "/docs"
    parts = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert len(parts) == SINK_PARTS
    # Published names carry no attempt id: part-<pid>.jsonl.
    assert all(
        os.path.basename(p).count("-") == 1 for p in parts
    ), parts
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert manifest["total_rows"] == n_docs
    assert sum(f["rows"] for f in manifest["files"]) == n_docs
    assert not glob.glob(os.path.join(out, "_staging", "*"))

    second = python_datasource_write_roundtrip(spark, sf_dir).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    assert len(glob.glob(os.path.join(out, "part-*.jsonl"))) == SINK_PARTS


def test_python_stream_source_multibatch_and_replay(spark):
    """The custom stream source must (a) deliver the total in MULTIPLE
    micro-batches (offset pacing, not one big read), (b) sum to exactly
    the closed-form total across batches, and (c) honor the replay
    contract: readBetweenOffsets(a, b) returns exactly the rows the
    paced read()s produced over [a, b) — what makes post-crash recovery
    exactly-once."""
    from parallel_mapreduce_spark.sources.pydatasource import (
        STREAM_BATCH,
        STREAM_TOTAL,
        SynthStreamReader,
        register_synth_source,
    )

    register_synth_source(spark)
    batches = []

    def sink(df, bid):
        batches.append(df.count())

    q = (
        spark.readStream.format("pmr_synth_stream")
        .load()
        .writeStream.foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= -(-STREAM_TOTAL // STREAM_BATCH)
    assert sum(batches) == STREAM_TOTAL

    r = SynthStreamReader({})
    off = r.initialOffset()
    paced = []
    while int(off["i"]) < 2 * STREAM_BATCH + 7:
        rows, off = r.read(off)
        paced.extend(rows)
    assert list(r.readBetweenOffsets({"i": 0}, off)) == paced


def test_corpus_cut_gates_on_table_bytes(spark, sf_dir, monkeypatch):
    """corpus_cut picks its lineage-cut flavor from on-disk corpus bytes:
    localCheckpoint (executor-pinned RDD) below the gate, reliable
    checkpoint above it — and an unknown table reads as huge, so the gate
    fails toward the durable plan, never toward pinning."""
    from parallel_mapreduce_spark.sources import corpus_cut, load_table, table_bytes

    monkeypatch.delenv("SPARK_GRAFT_LOCAL_CKPT_MAX_BYTES", raising=False)
    assert table_bytes("/nonexistent", "documents") == 1 << 62
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # Below the gate (test corpora are KB-MB): LogicalRDD, no checkpoint file.
    small = corpus_cut(docs, sf_dir)
    assert "LogicalRDD" in small._jdf.queryExecution().optimizedPlan().toString()
    assert not small.rdd.isCheckpointed()  # local, not reliable
    assert small.collect() == docs.collect()
    # Above the gate (forced with a 0-byte ceiling): reliable checkpoint —
    # eager, so new files appear under the checkpoint directory.
    import os

    monkeypatch.setenv("SPARK_GRAFT_LOCAL_CKPT_MAX_BYTES", "0")
    from parallel_mapreduce_spark.session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    ckpt_dir = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    if ckpt_dir.startswith("file:"):
        ckpt_dir = ckpt_dir[len("file:"):]
    before = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    big = corpus_cut(docs, sf_dir)
    after = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
    assert after > before
    assert sorted(r.doc_id for r in big.collect()) == sorted(
        r.doc_id for r in docs.collect()
    )
