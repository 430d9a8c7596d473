"""Connected-components clustering over candidate/verified dup pairs.

Not in the reference (it has no graph ops); this is the step a real fuzzy-dedup
pipeline needs *after* pair generation (``operators.dedup``): collapse the
pairwise near-duplicate relation into groups so one representative per group
can be kept. The reference's consolidator (``pipeline/consolidator.py:30-43``)
only deduplicates on an exact key; grouping a *transitive* similarity relation
needs connected components.

Algorithm: iterative min-label propagation with pointer jumping.

- Each node starts labeled with its own id.
- Propagation step: ``label(v) = min(label(v), min over neighbors label(u))``
  — one shuffle join (edges ⋈ labels on the source id) + one hash aggregate.
- Pointer-jumping step: ``label(v) = label(label(v))`` — a self-join that
  halves the remaining path length each round, so convergence is
  O(log diameter) rounds instead of O(diameter).
- Lineage is truncated every round with ``localCheckpoint`` (iterative plans
  otherwise grow exponentially and stall Catalyst).

Scale: every round is two shuffles sized by |edges| + |nodes| — no step ever
materializes a component's cross product. Near-dup graphs at corpus scale are
overwhelmingly tiny star-shaped components (a document and its near-copies),
so rounds-to-convergence is small; the pointer jumping bounds the worst case
(long chains) logarithmically. The convergence check is one ``count`` action
per round on a changed-labels semi-join, which is the idiomatic Spark shape
for iterate-until-fixpoint (same structure GraphX/GraphFrames uses).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "doc_id",
    group_col: str = "group_id",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node appearing in ``pairs`` with the minimum node id of
    its connected component.

    Returns a DataFrame ``(out_id, group_col)`` — one row per distinct node,
    ``group_col`` = min id reachable through the pair relation (component
    representative). Deterministic for any pair ordering.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min over self + neighbors' current labels
        neighbor_labels = edges.join(
            labels.withColumnRenamed("id", "u"), "u"
        ).select(F.col("v").alias("id"), "label")
        stepped = (
            labels.select("id", "label")
            .union(neighbor_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: label(id) <- label(label(id))
        jump = stepped.select(
            F.col("id").alias("label"), F.col("label").alias("label2")
        )
        new_labels = (
            stepped.join(jump, "label", "left")
            .select("id", F.coalesce("label2", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels.select(
        F.col("id").alias(out_id), F.col("label").alias(group_col)
    )


def neardup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH → exact-Jaccard verify → connected components: every
    document that participates in a verified near-dup pair, labeled with its
    dup-group representative (min doc id in the component).

    Composes :func:`operators.dedup.minhash_lsh_candidates` and
    :func:`operators.dedup.jaccard_verify_pairs`; see those for the
    LSH-then-verify scale argument. The greedy survivor rule of
    ``minhash_dedup`` drops any doc paired with a lower id; this instead
    exposes the full group structure (needed when the keep-policy is not
    "lowest id" — e.g. keep longest, newest, or highest-quality member).
    """
    from . import dedup as dd

    candidates = dd.minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands
    )
    verified = dd.jaccard_verify_pairs(
        df, candidates, text_col, id_col, threshold=jaccard_threshold
    )
    return connected_components(
        verified, out_id=id_col, group_col="group_id"
    )
