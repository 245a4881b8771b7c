"""Connected components over near-duplicate pair graphs → dedup clusters.

After LSH candidate generation, near-dup pairs form an undirected graph;
keeping one document per CONNECTED COMPONENT (not per pair) is what a
training-data pipeline actually needs — pairwise keep-one decisions double-
drop chains like A~B, B~C.

Algorithm: iterative min-label propagation. Every vertex starts labeled
with itself; each round takes the min of its own and its neighbors' labels;
converged when no label changes. Rounds needed = component diameter, and
near-dup components are shallow (duplicates of a common source ⇒ diameter
≤ ~3), so propagation beats the O(log n)-round large-star/small-star
alternative (Kiveris et al., "Connected Components in MapReduce and
Beyond") in both simplicity and constant factors here; swap it in if the
edge graph ever has long chains.

Scale notes:
- each round is one shuffle (groupBy dst) + one broadcast-able join back;
  the label frame is 2 longs per vertex — tiny relative to the corpus;
- ``localCheckpoint`` per round truncates the exponentially-growing lineage
  (standard practice for iterative DataFrame algorithms);
- the convergence probe is a ``limit(1).count()`` — it short-circuits at the
  first changed label instead of counting all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component): component = min vertex id reachable from ``id``
    through the undirected pair graph."""
    spark = pairs.sparkSession
    # Materialize the pair frame first: the two union branches below are two
    # CONSUMERS — without a barrier an expensive upstream (the LSH pipeline)
    # would run once per branch.
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    # Size every graph shuffle to the GRAPH, not the session: each round
    # pays per-partition task overhead on a frame of |V| rows, so a small
    # pair graph on a 96-partition session wastes ~all its time on empty
    # tasks. ~250k pairs per partition; restore the session conf at the end.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    target = max(8, min(int(prev_parts), n_pairs // 250_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        # No .distinct() here: min-label propagation is idempotent under
        # duplicate edges (min of a multiset), callers pass deduped pairs
        # (lsh_candidate_pairs dropDuplicates), and id_a < id_b rules out
        # self-loops — a distinct would add a full edge-set shuffle for
        # nothing.
        edges = (
            pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
            .union(
                pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # Round 1 fused into seeding: with identity labels, the propagated
        # label is just least(self, min neighbor) — one shuffle, no join.
        labels = edges.groupBy("src").agg(
            F.least(F.first("src"), F.min("dst")).alias("component")
        ).withColumnRenamed("src", "id")
        labels = labels.localCheckpoint(eager=True)
        for _ in range(max_iterations):
            nbr_min = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("component").alias("nbr_component"))
            )
            proposed = labels.join(nbr_min, labels.id == nbr_min.src, "left").select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", "component"),
                ).alias("component"),
                F.col("component").alias("_old"),
            )
            # Lazy checkpoint: the convergence count below is the action
            # that materializes it — one job per round, not two.
            proposed = proposed.localCheckpoint(eager=False)
            changed = (
                proposed.filter(F.col("component") != F.col("_old")).limit(1).count()
            )
            labels = proposed.drop("_old")
            if changed == 0:
                break
        edges.unpersist()
    finally:
        pairs.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return labels
