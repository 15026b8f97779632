"""Graph operators over fixture-derived graphs (SURVEY §2.13 added
surface).

Two graphs are derived deterministically from the fixtures:

- The **event-transition graph**: directed edges (prev event_type ->
  event_type) from each user's time-ordered event sequence — the
  Markov-chain view of user behaviour that CEP patterns query
  imperatively.
- The **part co-occurrence graph** (market-basket): an undirected edge
  between two parts that appear in the same order (lineitem self-join
  on l_orderkey). Restricted to l_orderkey % 4 == 0 so the toy-scale
  edge set stays bounded; the restriction is a deterministic sample,
  not a semantic.

100 TB posture: all three non-trivial ops (triangles, PageRank,
co-occurrence edges) are expressed as equi-joins + hash aggregates on
node/edge keys — shuffle-partitionable, no driver-side adjacency. The
triangle count uses the degree-ordered node-iterator (orient every
edge from the lexicographically-smaller (degree, node) endpoint), which
bounds the wedge join by sum(min-deg per edge) instead of sum(deg^2) —
the standard MapReduce triangle trick (Suri & Vassilvitskii, WWW'11).
PageRank uses exact fixed-point integer arithmetic (pr scaled by 1e12,
integer division for the per-neighbor share) so Spark and the DuckDB
oracle agree bit-for-bit — float summation order is engine-dependent,
integer sums are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register

# --------------------------------------------------------------------
# event-transition graph
# --------------------------------------------------------------------


@register(
    "graph_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
               AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def graph_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (the edge list of the behaviour
    Markov chain). One window shuffle on user_id (thousands of users
    per partition — no skew), one hash aggregate on the (prev, next)
    pair — 25 output rows regardless of input scale, so the aggregate
    is map-side-combinable down to almost nothing."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", F.coalesce(F.col("event_id"), F.lit(0)))
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# --------------------------------------------------------------------
# part co-occurrence graph (shared edge derivation)
# --------------------------------------------------------------------

_EDGES_SQL = """
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_orderkey % 4 = 0 AND a.l_partkey < b.l_partkey
"""


def cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected edges (u < v) between parts sharing an
    order. The self-join is on l_orderkey (bounded fan-out: ~7 lines
    per order max in TPC-H-shaped data, so pairs-per-key is O(49) —
    safe at any scale; a pathological multi-thousand-line order would
    need a per-key cap first)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 4 == 0
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


@register(
    "graph_degrees",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT u AS node, v AS other FROM edges
            UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
            FROM und GROUP BY node)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-occurrence graph (degree ->
    node count). Two cheap hash aggregates after the edge join; the
    classic first look at any web-scale graph (power-law check,
    skew-hazard census before heavier algorithms)."""
    edges = cooccurrence_edges(spark, sf_dir)
    und = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


# degree-ordered orientation: TRUE iff (deg_a, a) < (deg_b, b)
def _rank_lt(deg_a, a, deg_b, b):
    return (deg_a < deg_b) | ((deg_a == deg_b) & (a < b))


@register(
    "graph_triangles",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges),
    deg AS (SELECT node, count(*) AS d FROM und GROUP BY node),
    -- orient each edge from the smaller (degree, node) endpoint
    oriented AS (
      SELECT CASE WHEN (du.d < dv.d OR (du.d = dv.d AND e.u < e.v))
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.d < dv.d OR (du.d = dv.d AND e.u < e.v))
                  THEN e.v ELSE e.u END AS dst
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v),
    ranked AS (
      SELECT o.src, o.dst, ds.d AS dd FROM oriented o
      JOIN deg ds ON ds.node = o.dst),
    -- wedges at the lowest-rank corner; close with a third oriented edge
    tri AS (
      SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
      FROM ranked w1 JOIN ranked w2
        ON w1.src = w2.src
       AND (w1.dd < w2.dd OR (w1.dd = w2.dd AND w1.dst < w2.dst))
      JOIN oriented e3 ON e3.src = w1.dst AND e3.dst = w2.dst),
    members AS (
      SELECT a AS node FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS n_tri
    FROM members GROUP BY node
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the co-occurrence graph via the
    degree-ordered node-iterator. Orienting every edge from its
    lexicographically-smaller (degree, node) endpoint makes each
    triangle enumerate exactly once (at its lowest-rank corner) and
    bounds the wedge join: high-degree hubs only ever appear as
    destinations, so no reducer receives a hub's full neighborhood
    squared. Plain equi-joins throughout — Catalyst picks
    broadcast/SMJ freely and AQE handles residual skew.

    The corner explode (one array per triangle -> three member rows)
    replaces a 3-way UNION of projections of `tri`: a union re-plans
    its input per branch, so the wedge join — the op's entire cost —
    would run three times for one logical result."""
    edges = cooccurrence_edges(spark, sf_dir).persist()
    und = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d"))

    e = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    lt = _rank_lt(F.col("du"), F.col("u"), F.col("dv"), F.col("v"))
    oriented = e.select(
        F.when(lt, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lt, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).persist()

    # persisted: both wedge sides read it, and exchange reuse across
    # AQE-replanned branches is not guaranteed
    ranked = oriented.join(
        deg.withColumnRenamed("node", "dst").withColumnRenamed("d", "dd"), "dst"
    ).persist()
    w1 = ranked.select(
        F.col("src"), F.col("dst").alias("b"), F.col("dd").alias("db")
    )
    w2 = ranked.select(
        F.col("src"), F.col("dst").alias("c"), F.col("dd").alias("dc")
    )
    wedge_lt = _rank_lt(F.col("db"), F.col("b"), F.col("dc"), F.col("c"))
    tri = (
        w1.join(w2, "src")
        .filter(wedge_lt)
        .join(
            oriented.select(
                F.col("src").alias("b"), F.col("dst").alias("c")
            ),
            ["b", "c"],
        )
        .select(F.col("src").alias("a"), "b", "c")
    )
    members = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )


# --------------------------------------------------------------------
# PageRank — exact fixed-point integer arithmetic
# --------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolled {iters}-iteration integer PageRank as a CTE chain.
    Teleport and damping are integer expressions so the oracle matches
    Spark's result exactly (see module docstring)."""
    parts = [
        f"WITH edges AS ({_EDGES_SQL}),",
        """adj AS (SELECT u AS src, v AS dst FROM edges
               UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT src AS node, count(*) AS d FROM adj GROUP BY src),
    n AS (SELECT count(*) AS n_nodes FROM deg),
    pr0 AS (SELECT node, d, CAST({scale} // n_nodes AS BIGINT) AS pr
            FROM deg, n)""".format(scale=_PR_SCALE),
    ]
    for i in range(_PR_ITERS):
        parts.append(
            """,
    pr{next} AS (
      SELECT p.node, p.d,
             CAST(({t15} * {scale}) // (100 * n.n_nodes)
                  + (85 * coalesce(s.incoming, 0)) // 100 AS BIGINT) AS pr
      FROM pr{cur} p
      LEFT JOIN (
        SELECT a.dst AS node, sum(p2.pr // p2.d) AS incoming
        FROM adj a JOIN pr{cur} p2 ON p2.node = a.src
        GROUP BY a.dst) s ON s.node = p.node
      CROSS JOIN n)""".format(
                next=i + 1, cur=i, scale=_PR_SCALE, t15=15
            )
        )
    parts.append(
        f"\n    SELECT node, pr AS pr_fixed FROM pr{_PR_ITERS}"
    )
    return "".join(parts)


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) on the undirected co-occurrence
    graph, in fixed-point integers (pr scaled by 1e12; per-neighbor
    share = pr // degree; damping = (85*sum)//100) so the result is
    bit-exact across engines — float PageRank differs in the last
    ulps by summation order.

    100 TB shape: each iteration is one equi-join (adjacency x ranks,
    shuffled on the node key) + one hash aggregate — the standard
    Pregel-as-joins encoding. The adjacency list is persisted once and
    reused across iterations; rank updates never leave the JVM. At
    real scale the join would be pre-bucketed on node so iterations
    reuse the exchange (SCALE.md bucketed-join posture)."""
    edges = cooccurrence_edges(spark, sf_dir)
    adj = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .persist()
    )
    deg = adj.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    n_nodes = deg.count()  # scalar graph size — one job, not per-row
    if n_nodes == 0:
        # empty graph: no nodes, no ranks (the teleport term divides
        # by N — guarded, same degenerate-input discipline as the
        # text-op gram guards)
        return spark.createDataFrame([], "node long, pr_fixed long")

    pr = deg.withColumn(
        "pr", F.lit(_PR_SCALE // n_nodes).cast("long")
    )
    teleport = (15 * _PR_SCALE) // (100 * n_nodes)
    for _ in range(_PR_ITERS):
        # `pr div d`: exact integer floor division (a double-division
        # + cast would round through the mantissa and diverge from the
        # oracle's `//` on large fixed-point values)
        shares = adj.join(
            pr.select(F.col("node").alias("src"), "pr", "d"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.expr("pr div d").alias("share"),
        )
        incoming = shares.groupBy("node").agg(F.sum("share").alias("incoming"))
        pr = (
            pr.select("node", "d")
            .join(incoming, "node", "left")
            .select(
                "node",
                "d",
                (
                    F.lit(teleport)
                    + F.expr("85 * coalesce(incoming, 0L) div 100")
                ).cast("long").alias("pr"),
            )
            # each iteration reads the previous ranks TWICE (share
            # emission + join-back); without materialization the
            # unrolled plan recomputes pr_{i-1} per reference — a
            # 2^iters blowup.  Persisting each frontier keeps every
            # iteration computed exactly once (the GraphX/Pregel
            # iteration posture; values unchanged).
            .persist()
        )
    return pr.select("node", F.col("pr").alias("pr_fixed"))


@register(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT u AS node, v AS other FROM edges
            UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
            FROM und GROUP BY node),
    wedge AS (
      SELECT a.node AS x, b.node AS y,
             CAST(count(*) AS BIGINT) AS common
      FROM und a JOIN und b
        ON a.other = b.other AND a.node < b.node
      GROUP BY a.node, b.node
    ),
    scored AS (
      SELECT w.x, w.y, w.common,
             da.degree AS dx, db.degree AS dy,
             round(w.common * 1.0 / (da.degree + db.degree - w.common),
                   6) AS jaccard
      FROM wedge w
      JOIN deg da ON da.node = w.x
      JOIN deg db ON db.node = w.y
      WHERE w.common >= 3
    )
    SELECT x, y, common, dx, dy, jaccard FROM scored
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard link prediction over the co-occurrence
    graph: for node pairs sharing >= 3 neighbors, J(x,y) =
    |N(x) cap N(y)| / |N(x) cup N(y)| — the classic "products bought
    together" / related-entity score, and the graph analogue of the
    dedup family's set-similarity measures.

    Exactness: common/dx/dy are exact BIGINTs; jaccard is one shared
    division rounded to 6dp.

    Scale: the quadratic step is the wedge join through the SHARED
    NEIGHBOR (und self-join on `other`) — pairs-per-hub is O(deg^2),
    so cost concentrates on high-degree hubs exactly like
    graph_triangles; at web scale cap or sample hub adjacency first
    (the triangles degree-orientation trick applies unchanged). The
    common>=3 support floor keeps the output the interesting pairs,
    not every incidental co-neighbor."""
    edges = cooccurrence_edges(spark, sf_dir)
    # persisted: three consumers (degree count + both wedge sides)
    # would otherwise each rebuild the lineitem self-join edge list
    und = edges.select(
        F.col("u").alias("node"), F.col("v").alias("other")
    ).unionAll(edges.select(F.col("v"), F.col("u"))).persist()
    deg = und.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    a = und.select(F.col("node").alias("x"), "other")
    b = und.select(F.col("node").alias("y"), "other")
    wedge = (
        a.join(b, "other")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .filter(F.col("common") >= 3)
    )
    da = deg.select(F.col("node").alias("x"), F.col("degree").alias("dx"))
    db = deg.select(F.col("node").alias("y"), F.col("degree").alias("dy"))
    return (
        wedge.join(da, "x")
        .join(db, "y")
        .select(
            "x",
            "y",
            "common",
            "dx",
            "dy",
            F.round(
                F.col("common") * 1.0
                / (F.col("dx") + F.col("dy") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "graph_khop_bfs",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    adj AS (SELECT u AS src, v AS dst FROM edges
            UNION ALL SELECT v, u FROM edges),
    walk(node, hop) AS (
      SELECT CAST(p_partkey AS BIGINT), 0 FROM part
      WHERE p_partkey % 100 = 0
      UNION
      SELECT a.dst, w.hop + 1 FROM walk w JOIN adj a ON a.src = w.node
      WHERE w.hop < 3
    )
    SELECT node, CAST(min(hop) AS BIGINT) AS hop
    FROM walk GROUP BY node
    """,
)
def graph_khop_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS (k=3) from a seed set over the part co-occurrence
    graph: every part reachable within 3 hops, labelled with its
    MINIMUM hop distance — the neighborhood-expansion primitive
    behind 'related items within k degrees' and contamination-spread
    queries. Spark-first iterative frontier expansion: a FIXED number
    of equi-joins (frontier ⋈ adjacency on the node key, then
    anti-join against the visited set so each node is claimed at its
    first = minimum hop), no collect, no driver-dependent loop count
    — each hop is one shuffle on node id, exactly how Pregel-style
    BFS distributes at 10^9 edges. The adjacency is persisted once
    and reused by all three hops. Oracle: DuckDB recursive CTE with
    UNION-dedup on (node, hop), min-hop per node."""
    edges = cooccurrence_edges(spark, sf_dir)
    adj = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .persist()
    )
    seeds = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 100 == 0)
        .select(F.col("p_partkey").cast("long").alias("node"))
        .distinct()
    )
    visited = seeds.withColumn("hop", F.lit(0).cast("long"))
    frontier = visited.select("node")
    for h in range(1, 4):
        nxt = (
            frontier.join(adj, frontier.node == adj.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("long"))
            # each hop's frontier is read TWICE (visited union + next
            # expansion), and the anti-join re-reads the whole visited
            # chain — unpersisted, the unrolled plan recomputes every
            # earlier hop per reference (combinatorial).  Persisting
            # each frontier keeps every hop computed exactly once (the
            # same iteration posture as connected_components; values
            # unchanged).
            .persist()
        )
        visited = visited.unionAll(nxt)
        frontier = nxt.select("node")
    return visited


@register(
    "graph_components",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    adj AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
    nodes AS (SELECT DISTINCT u AS node FROM adj),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT a.v AS node, r.lbl FROM reach r JOIN adj a ON a.u = r.node
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
    SELECT node, component,
           CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS csize
    FROM comp
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the part co-occurrence graph — the
    standalone graph-family face of the CC machinery dedup_cluster
    uses internally (small-star/large-star, Kiveris et al. SoCC 2014):
    component label = min node id reachable, plus the component size.

    100 TB shape: the two-phase algorithm converges in O(log n)
    DataFrame rounds on ANY topology (plain label propagation needs
    diameter rounds — pathological on chain graphs), each round a
    bounded set of shuffle joins/aggregates with localCheckpoint
    lineage truncation; the driver holds only a convergence counter.
    The oracle is the DuckDB recursive-CTE transitive closure with
    min-label per node — exponentially more work (closure is
    O(n·component-size) rows) but exact at fixture scale, which is the
    point: the cheap distributed algorithm must agree with the
    brute-force definition."""
    from spark_cep_spark.operators.llm_dedup import connected_components

    e = cooccurrence_edges(spark, sf_dir)
    edges = e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    vertices = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = connected_components(edges, vertices, id_col="node").select(
        "node", F.col("cluster_rep").alias("component")
    )
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("csize")
    )
    return labels.join(sizes, "component").select(
        "node", "component", "csize"
    )


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    adj AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
    lab0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),
    s1 AS (SELECT adj.u AS node, l.label, count(*) AS tw
           FROM adj JOIN lab0 l ON l.node = adj.v GROUP BY adj.u, l.label),
    lab1 AS (SELECT node, label FROM (
      SELECT node, label, row_number() OVER (PARTITION BY node
             ORDER BY tw DESC, label) AS rk FROM s1) WHERE rk = 1),
    s2 AS (SELECT adj.u AS node, l.label, count(*) AS tw
           FROM adj JOIN lab1 l ON l.node = adj.v GROUP BY adj.u, l.label),
    lab2 AS (SELECT node, label FROM (
      SELECT node, label, row_number() OVER (PARTITION BY node
             ORDER BY tw DESC, label) AS rk FROM s2) WHERE rk = 1),
    s3 AS (SELECT adj.u AS node, l.label, count(*) AS tw
           FROM adj JOIN lab2 l ON l.node = adj.v GROUP BY adj.u, l.label),
    lab3 AS (SELECT node, label FROM (
      SELECT node, label, row_number() OVER (PARTITION BY node
             ORDER BY tw DESC, label) AS rk FROM s3) WHERE rk = 1),
    s4 AS (SELECT adj.u AS node, l.label, count(*) AS tw
           FROM adj JOIN lab3 l ON l.node = adj.v GROUP BY adj.u, l.label),
    lab4 AS (SELECT node, label FROM (
      SELECT node, label, row_number() OVER (PARTITION BY node
             ORDER BY tw DESC, label) AS rk FROM s4) WHERE rk = 1)
    SELECT node, CAST(label AS BIGINT) AS community,
           CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS csize
    FROM lab4
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al 2007; the GraphX/GraphFrames LPA face) over the part
    co-occurrence graph: every node starts as its own label; each of
    4 SYNCHRONOUS rounds reassigns every node the most frequent label
    among its neighbors, ties broken by the SMALLEST label — the
    deterministic variant (classic LPA tie-breaks randomly, which no
    oracle could replay). Emits each node's community and its size.

    100 TB shape: one round = one equi-join of the adjacency against
    the previous labels + a (node, label) hash aggregate + a per-NODE
    top-1 window (bounded by the node's degree, never the graph) —
    the Pregel message-pass expressed as joins, exactly like
    graph_pagerank. Fixed 4 rounds (LPA converges in a few rounds on
    co-occurrence topologies; a production run adds a
    labels-changed-counter stop). The adjacency persists once; labels
    localCheckpoint per round to truncate lineage. Exact integer
    counts end to end — no float anywhere, so the argmax can never
    flip on engine noise.

    Oracle: the same 4 rounds unrolled as chained CTEs — the
    brute-force replay of the definition."""
    edges = cooccurrence_edges(spark, sf_dir)
    adj = (
        edges.select(F.col("u").alias("nu"), F.col("v").alias("nv"))
        .unionAll(
            edges.select(F.col("v").alias("nu"), F.col("u").alias("nv"))
        )
        .persist()
    )
    labels = adj.select(F.col("nu").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w_top = W.partitionBy("node").orderBy(F.desc("tw"), "label")
    for _ in range(4):
        msgs = (
            adj.join(
                labels.withColumnRenamed("node", "nv"), "nv"
            )
            .groupBy(F.col("nu").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("tw"))
        )
        labels = (
            msgs.withColumn("rk", F.row_number().over(w_top))
            .filter(F.col("rk") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
    # Materialize the final labels (the per-round checkpoints are lazy,
    # so the whole 4-round chain still hangs off adj until first
    # evaluation), then release the adjacency — never-unpersisted
    # adjacency leaks executor storage across a full-registry sweep
    # (round-8 ADVICE). One job either way: the driver's collect would
    # have run the same chain.
    labels = labels.localCheckpoint(eager=True)
    adj.unpersist()
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("csize")
    )
    return (
        labels.join(sizes, "label")
        .select(
            "node",
            F.col("label").cast("long").alias("community"),
            "csize",
        )
    )


_WEDGES_SQL = """
      SELECT a.l_partkey AS u, b.l_partkey AS v,
             greatest(1, 8 - CAST(count(DISTINCT a.l_orderkey) AS BIGINT))
               AS w
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_orderkey % 4 = 0 AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
"""


@register(
    "graph_shortest_path",
    oracle=f"""
    WITH RECURSIVE edges AS ({_WEDGES_SQL}),
    und AS (SELECT u AS src, v AS dst, w FROM edges
            UNION ALL SELECT v, u, w FROM edges),
    seeds AS (
      SELECT DISTINCT CAST(p_partkey AS BIGINT) AS node
      FROM part WHERE p_partkey % 100 = 0
    ),
    walk AS (
      SELECT node, CAST(0 AS BIGINT) AS d, 0 AS hops FROM seeds
      UNION ALL
      SELECT e.dst, wk.d + e.w, wk.hops + 1
      FROM walk wk JOIN und e ON e.src = wk.node
      WHERE wk.hops < 4
    )
    SELECT node, min(d) AS dist
    FROM walk GROUP BY node
    """,
)
def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop weighted shortest path (single-source over a seed
    SET): minimum path cost from any seed part within ≤ 4 edges of
    the co-occurrence graph, edge weight = max(1, 8 − shared-order
    count) (strong ties are cheap) — the Bellman–Ford relaxation
    primitive behind 'how close is X to the known-bad set'.
    Spark-first: exactly 4 synchronous min-plus rounds, each ONE
    equi-join (dist ⋈ adjacency on the node key) + ONE min-aggregate
    — after round k, dist(n) is exact over all paths with ≤ k edges,
    which is precisely what the oracle's hop-bounded recursive-CTE
    walk computes; weights are integers so min() is exact.

    100 TB shape: the Pregel pattern — per-round cost is one shuffle
    on node id, no driver state beyond the loop counter, adjacency
    persisted once and released after the rounds (round-8 ADVICE
    discipline); each round's frame is eagerly localCheckpoint-ed so
    lineage never chains across rounds.  Frontier size is bounded by
    the node set; a 1000-executor run scales per-round linearly in
    edges."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 4 == 0
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.greatest(
                F.lit(1),
                F.lit(8) - F.countDistinct("l_orderkey"),
            )
            .cast("long")
            .alias("w")
        )
    )
    adj = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionAll(
            edges.select(
                F.col("v").alias("src"), F.col("u").alias("dst"), "w"
            )
        )
        .persist()
    )
    dist = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 100 == 0)
        .select(F.col("p_partkey").cast("long").alias("node"))
        .distinct()
        .withColumn("d", F.lit(0).cast("long"))
    )
    for _ in range(4):
        relaxed = (
            dist.join(adj, dist["node"] == adj["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("d") + F.col("w")).alias("d"),
            )
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )
    out = dist.select("node", F.col("d").alias("dist"))
    # materialize before releasing the adjacency (eager checkpoint of
    # the final frame), then free the cached partitions
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    return out
