"""Unbounded-diameter connected components: alternating large-star /
small-star (Kiveris et al., "Connected Components in MapReduce and Beyond",
MR-CC) as DataFrame joins — the production companion to the fixed-round
min-label propagation in queries/text.py::q_doc_dup_groups.

Why this algorithm at 100 TB: plain label propagation needs O(diameter)
rounds and a web-scale dup graph can chain arbitrarily deep; the
alternating star operations converge in O(log^2 n) rounds regardless of
diameter, and every round is the same shuffle shape — one groupBy-min on a
node key plus one equi-join of edges to per-node minima, each O(|E|) with
map-side partial aggregation.  No collect of neighbor lists ever happens
(no collect_list — a hub node's neighborhood never materializes on one
executor).

Invariants used:
- Edges are kept CANONICAL (hi > lo) and distinct between rounds; both star
  operations preserve the partition "component min is reachable".
- At the fixpoint the edge set is a union of stars whose centers are their
  components' minimum ids, so labels read directly off the edges: non-center
  nodes point at their center, centers (and isolated nodes) label themselves.
- Convergence is decided by edge-set equality (two counts + one anti-join
  count per round — driver-side scalars, the standard iterative-algorithm
  control loop, same pattern as GraphX/Pregel supersteps).
- Each round is materialized with localCheckpoint (eager): persist alone
  keeps the full logical lineage, which REFERENCES the previous round
  several times per star step and therefore grows exponentially — by ~10
  rounds Catalyst's plan alone OOMs the driver.  Checkpointing truncates
  lineage to the materialized result, keeping per-round planning O(1).
  On a real cluster swap in reliable checkpoint(dir) for executor-loss
  tolerance; the algorithm is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (hi, lo) pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star(u): connect every neighbor v > u to m(u) = min(N(u) + {u}).
    One symmetric expansion, one groupBy-min, one join — O(|E|).

    Output is canonically ORIENTED (hi, lo) with self-loops dropped but NOT
    deduplicated: the only consumer is small-star, whose groupBy-min and
    final distinct are insensitive to parallel edges, so the intermediate
    distinct was a pure extra shuffle per round (r12: one of six round
    shuffles removed; the dup mass small-star's map-side partial agg
    absorbs is bounded by 2|E|)."""
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.greatest("v", "m").alias("hi"), F.least("v", "m").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star(u): for each node u over its smaller neighbors N = {v < u},
    connect every v in N + {u} except the minimum to m = min(N).  Canonical
    input already orients each edge (hi, lo), so the group key is hi."""
    m = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    joined = edges.join(m, "hi")
    rewired = joined.filter(F.col("lo") != F.col("m")).select(
        F.col("lo").alias("src"), F.col("m").alias("dst")
    )
    to_center = m.select(F.col("hi").alias("src"), F.col("m").alias("dst"))
    return _canonical(rewired.unionByName(to_center))


def star_fixpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Iterate large-star/small-star to the edge-set fixpoint and return
    the final canonical star edges (hi, lo): the fixpoint edge set is a
    union of stars whose centers are their components' minimum ids, so
    `lo` is the component label and every NON-CENTER node appears as `hi`
    in EXACTLY one row (a node has one component, one minimum) — the
    invariant connected_components' left join relies on, and which lets
    per-component sizes be read off this table as count-per-center + 1
    without ever joining back to the node set (q_dup_group_stats).

    `max_rounds` is a runaway guard, not a semantic bound — hitting it
    raises instead of returning an unconverged edge set."""
    cur = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=True)
    # The edge count is carried across rounds instead of re-counted (one
    # job per round saved), and the exceptAll equality probe — the round's
    # most expensive control job — only runs when the counts ALREADY
    # match, which for a shrinking edge set means only the fixpoint round
    # pays it (r12; both distinct edge sets, so count + one-sided
    # exceptAll emptiness IS set equality).
    cur_cnt = cur.count()
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        nxt_cnt = nxt.count()
        changed = (
            cur_cnt != nxt_cnt
            or nxt.exceptAll(cur).limit(1).count() > 0
        )
        if not changed:
            break
        cur, cur_cnt = nxt, nxt_cnt
    else:
        raise RuntimeError(
            f"star_fixpoint did not converge in {max_rounds} rounds"
        )
    return cur


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Exact connected components over (nodes, edges); returns one row per
    node: (id_col, component) where component is the minimum node id in the
    node's component — isolated nodes get their own id.

    Iterates large-star/small-star to the edge-set fixpoint (<= O(log^2 n)
    rounds by the MR-CC bound; see star_fixpoint)."""
    cur = star_fixpoint(edges, src=src, dst=dst, max_rounds=max_rounds)
    # Fixpoint edges are stars centered at component minima.
    centers = cur.select(F.col("hi").alias(id_col), F.col("lo").alias("_comp"))
    return (
        nodes.select(id_col)
        .join(centers, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_comp"), F.col(id_col)).alias("component"),
        )
    )
