"""Distributed connected components — duplicate-cluster resolution.

Pair-wise dedup (MinHash, SimHash, embedding-cosine) emits EDGES; what
a corpus pipeline must act on is CLUSTERS: if A~B and B~C, then
{A,B,C} is one duplicate group even though A~C was never scored, and
exactly one representative per group survives.  That closure is
connected components over the candidate-pair graph.

Algorithm: iterative min-label propagation (the standard Pregel-style
CC — each node repeatedly adopts the smallest label among itself and
its neighbors), expressed as DataFrame joins:

- one iteration = join(labels ⋈ edges) + min-agg + compare — two
  shuffles on node id, all JVM;
- iterations needed = graph diameter (near-dup clusters are shallow —
  a handful of rounds);
- each round ends in ``localCheckpoint`` so the plan/lineage stays
  O(1) deep instead of growing per iteration (the classic iterative-
  DataFrame trap);
- the only driver-side value is the per-round convergence scalar
  (count of changed labels) — data never leaves the executors.

At 100 TB the same loop runs unchanged; the edge list (candidate
pairs) is orders of magnitude smaller than the corpus, and each round
is linear in |edges|.  (GraphFrames/GraphX implement the same
propagation; this stays in pure DataFrame ops to avoid the extra
dependency.)

The driver oracle is a recursive CTE computing the transitive closure
— exact same components, viable only at fixture scale (closure is
quadratic per component); the Spark side never materializes closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table
from .dedup import dedup_embedding_cosine

#: Safety cap: near-dup graphs converge in ≤ a handful of rounds; a
#: cap turns a pathological path-graph fixture into a loud error
#: instead of an unbounded loop.
_MAX_ITERS = 25

#: The edge generator's SQL twin (kept in lockstep with
#: dedup_embedding_cosine's oracle — same pair semantics).
_PAIR_SQL = """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM e a
    JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.emb, b.emb)
                / (sqrt(list_dot_product(a.emb, a.emb))
                   * sqrt(list_dot_product(b.emb, b.emb))), 5) >= 0.3
"""


def connected_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(node) × (src, dst) -> (node, component_id = min node id in the
    component).  Min-label propagation until fixpoint."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.localCheckpoint(eager=True)
    labels = nodes.select(F.col("node"), F.col("node").alias("label"))

    def propagate(lab):
        nbr_min = (
            sym.join(lab, sym.dst == lab.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        return lab.join(nbr_min, lab.node == nbr_min.src, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                "label"
            ),
            (F.col("nbr_label") < F.col("label")).alias("_changed"),
        )

    for _ in range(_MAX_ITERS):
        # FOUR propagation hops per materialization: a hop is two lazy
        # shuffles of the (small) label/edge tables, while a round pays
        # the fixed localCheckpoint + convergence-action cost — so the
        # fixed cost is amortized over a 4-hop advance and shallow
        # near-dup graphs converge in a single round (the final hop's
        # ``_changed`` flag still proves the fixpoint).
        stepped = propagate(
            propagate(propagate(propagate(labels).drop("_changed")).drop("_changed")).drop("_changed")
        )
        new_labels = stepped.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {_MAX_ITERS} rounds — "
        "graph diameter exceeds the cap (raise _MAX_ITERS or pre-contract "
        "long chains)"
    )


@query(
    "dedup_cluster_cc",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIR_SQL}),
    sym AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      UNION ALL
      SELECT vec_b, vec_a FROM pairs
    ),
    walk(node, reach) AS (
      SELECT a, b FROM sym
      UNION
      SELECT w.node, s.b FROM walk w JOIN sym s ON w.reach = s.a
    ),
    lab AS (
      SELECT v.vec_id AS node,
             least(v.vec_id, coalesce(min(w.reach), v.vec_id)) AS component_id
      FROM embeddings v LEFT JOIN walk w ON w.node = v.vec_id
      GROUP BY v.vec_id
    )
    SELECT node AS vec_id, component_id,
           count(*) OVER (PARTITION BY component_id) AS component_size
    FROM lab
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the embedding-cosine candidate pairs:
    every vector labeled with its component's smallest vec_id (the
    keeper), plus the component size.  Unpaired vectors are singleton
    components of themselves."""
    edges = dedup_embedding_cosine(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    nodes = table(spark, sf_dir, "embeddings").select(F.col("vec_id").alias("node"))
    comp = connected_components(nodes, edges)
    sizes = F.count(F.lit(1)).over(Window.partitionBy("label"))
    return comp.select(
        F.col("node").alias("vec_id"),
        F.col("label").alias("component_id"),
        sizes.alias("component_size"),
    )
