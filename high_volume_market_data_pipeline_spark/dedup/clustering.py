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
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        proposed = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", "component"),
                ).alias("component"),
                F.col("component").alias("_old"),
            )
        )
        proposed = proposed.localCheckpoint(eager=True)
        changed = (
            proposed.filter(F.col("component") != F.col("_old")).limit(1).count()
        )
        labels = proposed.drop("_old")
        if changed == 0:
            break
    edges.unpersist()
    return labels
