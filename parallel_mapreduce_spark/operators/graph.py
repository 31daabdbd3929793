"""Link-analysis over a data-derived graph: weighted PageRank in exact
integer arithmetic.

The engine already runs a float PageRank on the event-type transition
graph (`operators/events.py` pagerank_event_types, per-iteration 8-dp
rounding as its determinism contract). This module adds the variant
that closes the remaining PageRank semantics the float twin skips:
(a) EXACT INTEGER arithmetic — no rounding contract at all, the
iteration is bit-replayable on any engine; (b) DANGLING-MASS
redistribution — nodes with no out-edges teleport their rank uniformly
instead of leaking it (the event graph has no dangling nodes by
construction, so that code path was unexercised); (c) a corpus-scale
multi-join edge DERIVATION (lineitem |><| orders with both dimension
sides broadcast) rather than a single-table lag window. PageRank is the
canonical join-per-iteration distributed algorithm — each round is one
rank-to-edges equi-join plus one partial-aggregable SUM per
destination, the shape the reference's emit/shuffle/reduce loop
(src/mapreduce.c:110-238) runs one round of.

Determinism stance: ranks live in integer MICRO-UNITS (start 1_000_000
per node) and every step is bigint arithmetic — contribution =
``rank * w div out_w``, damping = ``85 * x div 100`` — so the
per-destination SUM is an exact integer sum (order-independent on both
engines) and the DuckDB oracle replays the iterations bit-for-bit. No
float rounding boundary exists anywhere (the map_higher_order_report /
clamped_balance_recursive lesson applied from the start).

Scale: the graph is the nation-to-nation trade network (customer nation
-> supplier nation, weighted by lineitem count), so the 100 TB cost is
the ONE corpus-scale edge aggregation (lineitem |><| orders shuffle with
both dimension sides broadcast); the iteration itself runs on the
aggregated |V|=25, |E|<=625 graph with the rank side broadcast — zero
shuffles per round. For a billion-vertex graph the same plan shape
holds with the rank side shuffled instead of broadcast and a
`localCheckpoint` per round to truncate lineage, as neardup_clusters
does; overflow headroom: rank*w stays under 2^63 while
max_rank * max_edge_weight < 9.2e18 (document-level graphs should
pre-normalize weights to per-src shares in micro-units first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from parallel_mapreduce_spark.registry import query
from parallel_mapreduce_spark.sources.tables import load_table, register_views

PR_ITERS = 3
PR_UNIT = 1_000_000  # one rank point, in micro-units
# damping 0.85 as an exact integer formula: new = 0.15*UNIT + 85*x div 100
PR_TELEPORT = 150_000


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    """Unrolled integer PageRank in DuckDB SQL (`//` = exact bigint div,
    same operator precedence as Spark's `div`: * and // left-assoc)."""
    parts = [
        f"""
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ow AS (SELECT src, SUM(w) AS out_w FROM e GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation),
    r0 AS (SELECT n_nationkey AS nk, CAST({PR_UNIT} AS BIGINT) AS r
           FROM nation)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
    d{i} AS (SELECT COALESCE(SUM(r), 0) AS d FROM r{i}
             LEFT JOIN ow ON nk = src WHERE out_w IS NULL),
    i{i} AS (SELECT dst, SUM(r * w // out_w) AS inc
             FROM r{i} JOIN ow ON nk = ow.src JOIN e ON nk = e.src
             GROUP BY dst),
    r{i + 1} AS (SELECT nk, CAST({PR_TELEPORT} + 85 * (COALESCE(inc, 0)
                   + (SELECT d FROM d{i}) // (SELECT n FROM nn)) // 100
                   AS BIGINT) AS r
                 FROM r{i} LEFT JOIN i{i} ON nk = dst)"""
        )
    parts.append(
        f"""
    SELECT n_name AS nation, r AS pr_micro
    FROM r{iters} JOIN nation ON nk = n_nationkey"""
    )
    return "".join(parts)


@query("pagerank_trade_graph", headline=True, oracle=_pagerank_oracle())
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph, {PR_ITERS} exact
    integer power-iteration rounds (damping 0.85, uniform dangling-mass
    redistribution). Returns (nation, pr_micro) — the stationary-ish
    importance of each nation as a trade DESTINATION, in micro-units."""
    register_views(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )

    # The one corpus-scale pass: both dimension sides broadcast, the only
    # shuffle is lineitem |><| orders on the order key + the 625-row-max
    # edge aggregation. Persisted because the tiny aggregated graph feeds
    # every iteration (and the dangling check) — without it each of the
    # 3*2+1 consumers would re-run the corpus join.
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
        .persist()
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    n_nodes = nation.count()  # 25-row dimension; bounded driver count

    ranks = nation.select(
        F.col("n_nationkey").alias("nk"),
        F.lit(PR_UNIT).cast("long").alias("r"),
    )
    for _ in range(PR_ITERS):
        with_out = ranks.join(out_w, ranks.nk == out_w.src, "left").select(
            "nk", "r", "out_w"
        )
        # Dangling mass (rank held by nodes with no out-edges, teleported
        # uniformly) FOLDED into the rank frame as an unpartitioned
        # window SUM instead of a separate one-row aggregate: the
        # round-7 form crossJoin(broadcast(agg)) forced one extra
        # materialization job per iteration just to build each broadcast.
        # The window moves the |V|-row frame to one task — fine here
        # because |V| is the AGGREGATED graph's node count (25), already
        # bounded before the iteration starts; a billion-vertex graph
        # would use the agg+broadcast form instead (see the module
        # docstring's scale paragraph). Exact integer sum either way.
        base = with_out.withColumn(
            "d",
            F.coalesce(
                F.sum(
                    F.when(F.col("out_w").isNull(), F.col("r"))
                ).over(W.partitionBy()),
                F.lit(0),
            ),
        )
        contribs = (
            base.join(edges, base.nk == edges.src)
            .groupBy("dst")
            .agg(F.sum(F.expr("r * w div out_w")).alias("inc"))
        )
        ranks = base.join(contribs, base.nk == contribs.dst, "left").select(
            "nk",
            (
                F.lit(PR_TELEPORT)
                + F.expr(f"85 * (coalesce(inc, 0) + d div {n_nodes}) div 100")
            )
            .cast("long")
            .alias("r"),
        )
    return ranks.join(
        F.broadcast(nation), ranks.nk == nation.n_nationkey
    ).select(F.col("n_name").alias("nation"), F.col("r").alias("pr_micro"))
