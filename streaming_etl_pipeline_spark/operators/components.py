"""Connected components over a pair graph — dedup cluster canonicalization.

A near-dedup pass (MinHash/LSH, SimHash, n-gram Jaccard —
``operators/dedup.py``) emits PAIRS; an actual corpus-curation pipeline
then needs the transitive closure of those pairs so every document maps
to ONE canonical representative (keep the min doc_id, drop the rest).
The reference has no such operator (its dedup is ranked keep-latest,
``src/transformations/bronze_to_silver.py:44-56``); at 100 TB this is the
step that turns "81 similar pairs" into "which rows do I delete".

Algorithm: distributed min-label propagation —

- labels start as each node's own id;
- each round, every node takes the min label over itself and its
  neighbors (one join edges⋈labels + one groupBy min);
- converged when no label changed (one count action per round).

Rounds needed = graph diameter. Near-dup graphs are unions of small
dense clusters (LSH buckets make them clique-ish), so diameter is small
and bounded in practice (2-4); ``max_iter`` guards the adversarial
long-chain case, and the star-contraction variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — O(log n)
rounds) is the documented upgrade path if chains ever dominate.

Scale notes:
- every round is ONE shuffle of the (small) edge list + label table —
  the corpus itself is never touched after pair generation;
- ``localCheckpoint`` truncates lineage each round, preventing the
  exponential plan growth that kills iterative DataFrame jobs;
- convergence is detected with a count on the CHANGED set only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve the pair graph to ``(node, component)`` — component is the
    min node id reachable from ``node``. Input needs only the two id
    columns; direction is ignored."""
    # Materialize the pair plan ONCE before symmetrizing — the union
    # references it twice, and upstream pair generation (LSH banding +
    # verify) is the expensive part of the whole job.
    p = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    edges = (
        p.union(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # candidate labels: my own + each neighbor's current label
        neighbor = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Canonicalization view of :func:`connected_components`:
    ``(doc_id, canonical_id, cluster_size)`` for every document that
    appears in at least one near-dup pair. Rows with
    ``doc_id != canonical_id`` are the deletion candidates."""
    cc = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    from pyspark.sql.window import Window

    w = Window.partitionBy("comp")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def connected_components_sql(pairs_sql: str, src: str = "id_a", dst: str = "id_b") -> str:
    """DuckDB oracle twin: recursive label reachability + min per node.

    Enumerates (node, reachable-label) pairs to a fixpoint — exponential
    in cluster size, so strictly a small-scale ORACLE, not the scale
    implementation."""
    return f"""
    WITH RECURSIVE pair_input AS MATERIALIZED ({pairs_sql}),
    edges AS MATERIALIZED (
      SELECT {src} AS u, {dst} AS v FROM pair_input
      UNION
      SELECT {dst} AS u, {src} AS v FROM pair_input
    ),
    reach(node, lab) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.lab FROM reach r JOIN edges e ON e.v = r.node
    ),
    cc AS (SELECT node, min(lab) AS comp FROM reach GROUP BY node)
    SELECT node AS doc_id, comp AS canonical_id,
           count(*) OVER (PARTITION BY comp) AS cluster_size
    FROM cc
    """
