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
from pyspark.sql import DataFrame, Window
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
    hash_fn: str = "md5",
    collapse_exact: bool = True,
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

    ``collapse_exact`` (default on, same equivalence argument as
    :func:`operators.dedup.minhash_dedup`): the sketch/verify/component
    machinery runs over one min-id representative per distinct content;
    exact-dup members are then re-attached to their rep's group, and an
    exact group of size ≥ 2 is a dup group even without a fuzzy pair
    (its members pair at Jaccard 1). Component labels are unchanged —
    the component's min doc id is always a representative, because every
    non-rep is larger than its own rep. Pair work drops from quadratic
    in duplicate multiplicity to linear (measured in BASELINE.md r4).
    """
    from . import dedup as dd
    from .dedup import _track_persist

    if not collapse_exact:
        candidates = dd.minhash_lsh_candidates(
            df, text_col, id_col, num_hashes, bands, hash_fn
        )
        verified = dd.jaccard_verify_pairs(
            df, candidates, text_col, id_col, threshold=jaccard_threshold,
            # hash_fn="xxhash64" selects the production lane END-TO-END:
            # the verify stage then intersects 8-byte shingle hashes
            # instead of shingle text (BASELINE.md round-4 verify-lane
            # table); md5 = oracle lane
            shingle_hash="xxhash64" if hash_fn == "xxhash64" else None,
        )
        return connected_components(
            verified, out_id=id_col, group_col="group_id"
        )

    _fps, rep_ids, members = dd._exact_collapse(
        df, text_col, id_col, hash_fn
    )
    # persisted: feeds both the LSH candidate build and the verify-stage
    # shingle projection (unpersisted, each job re-derives the semi-join)
    rep_df = _track_persist(
        df.join(rep_ids, id_col, "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    candidates = dd.minhash_lsh_candidates(
        rep_df, text_col, id_col, num_hashes, bands, hash_fn
    )
    verified = dd.jaccard_verify_pairs(
        rep_df, candidates, text_col, id_col, threshold=jaccard_threshold,
        shingle_hash="xxhash64" if hash_fn == "xxhash64" else None,
    )
    rep_groups = _track_persist(
        connected_components(verified, out_id=id_col, group_col="group_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # reps of multi-member exact groups form a dup group even with no
    # fuzzy pair: label = the rep itself (its group's min id)
    multi_reps = members.select(F.col("__rep").alias(id_col)).distinct()
    solo_exact = (
        multi_reps.join(rep_groups, id_col, "left_anti")
        .select(F.col(id_col), F.col(id_col).alias("group_id"))
    )
    all_rep_labels = rep_groups.unionByName(solo_exact)
    member_labels = (
        members.join(
            all_rep_labels.withColumnRenamed(id_col, "__rep"), "__rep"
        ).select(id_col, "group_id")
    )
    return all_rep_labels.unionByName(member_labels)


def neardup_keep_best(
    df: DataFrame,
    quality=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Canonical-document selection: cluster near-dups
    (:func:`neardup_groups`) and keep exactly one member per dup group —
    the highest-``quality`` one (ties broken by lowest id) — plus every
    ungrouped document unchanged. This is the corpus-curation keep-policy
    the greedy lowest-id rule of ``minhash_dedup`` can't express: keep the
    longest / newest / highest-scoring variant of each duplicate cluster.

    ``quality`` is any deterministic Column over ``df``'s columns; default
    is character length of ``text_col`` (keep-longest). NULL quality sorts
    last (coalesced to -1).

    Scale shape: the group labels are |clustered docs| rows (only docs in
    a verified pair) — the left join back to the corpus broadcasts when
    small; the keep-window partitions by group id, and ungrouped docs are
    their own singleton partitions, so no skew beyond the largest dup
    group (bounded by LSH candidate generation).
    """
    if quality is None:
        quality = F.length(F.col(text_col))
    groups = neardup_groups(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        bands=bands, jaccard_threshold=jaccard_threshold,
    )
    labeled = df.join(groups, id_col, "left")
    eff_group = F.coalesce(F.col("group_id"), F.col(id_col))
    w = Window.partitionBy(eff_group).orderBy(
        F.coalesce(quality, F.lit(-1)).desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("__keep_rank", F.row_number().over(w))
        .filter(F.col("__keep_rank") == 1)
        .drop("__keep_rank", "group_id")
    )


# --------------------------------------------------------------------------
# K-means over embedding columns (centroid assign / update / fit)
# --------------------------------------------------------------------------
#
# Not in the reference (no vector ops of any kind); this is the clustering
# primitive a training-data pipeline needs for corpus curation (topic
# balancing, SemDeDup-style pruning, IVF coarse quantizers). Spark-first
# shape: the centroid table is tiny (k rows) and is BROADCAST to every
# executor; assignment is then a map-side-only broadcast nested-loop over
# k candidates per row — no shuffle of the (huge) embedding table at all.
# The update step shuffles only (k × dim) partial sums thanks to map-side
# combine on the hash aggregate, and uses exact DECIMAL sums so centroid
# means are independent of partition/merge order (bit-reproducible across
# cluster sizes).


def _sq_l2(a, b):
    """Sequential-fold squared L2 distance between two array<double> cols —
    same evaluation order as DuckDB's list_sum(list_transform(...)), so
    results are bit-identical across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cluster_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared L2, ties broken
    by lowest centroid id).

    Returns ``(id_col, cluster_id, dist2)``. The centroid side is broadcast,
    so the big side is never shuffled: the plan is scan → broadcast NL join
    (k rows per vector) → hash agg on ``id_col`` with map-side combine. At
    100 TB the only shuffle is the final per-vector argmin agg, sized
    |vectors|, not |vectors| × k.
    """
    from .similarity import _dvec_sql

    # SQL parse lane (r12, VERDICT r11 #4): the per-centroid squared-L2
    # fold is the same expression the Column form built, parsed in one
    # call instead of per-HOF py4j construction trips
    c = centroids.selectExpr(
        f"`{centroid_id_col}` AS __cid",
        f"{_dvec_sql(f'`{centroid_vec_col}`')} AS __cvec",
    )
    scored = (
        emb.selectExpr(
            f"`{id_col}`", f"{_dvec_sql(f'`{vec_col}`')} AS __v"
        )
        .join(F.broadcast(c))
        .selectExpr(
            f"`{id_col}`",
            "__cid",
            "aggregate(zip_with(__v, __cvec, (x, y) -> (x - y) * (x - y)), "
            "0.0D, (acc, x) -> acc + x) AS __d2",
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct(F.col("__d2"), F.col("__cid"))).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__best.__cid").alias(centroid_id_col),
        F.col("__best.__d2").alias("dist2"),
    )


def kmeans_update(
    emb: DataFrame,
    assignment: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cluster_id",
) -> DataFrame:
    """One Lloyd update: per-cluster per-dimension mean of member vectors.

    Returns long-form ``(cluster_id, dim, centroid_val, n_members)`` — one
    row per (cluster, dimension). Sums are exact DECIMAL(28,15), so the
    result is independent of row/partition order (doubles would drift with
    partitioning). The explode produces |vectors| × dim rows but they feed
    straight into a partial (map-side) aggregate, so the shuffle carries
    only k × dim groups.
    """
    from .similarity import dvec

    member_vecs = (
        emb.select(F.col(id_col), dvec(F.col(vec_col)).alias("__v"))
        .join(assignment.select(id_col, centroid_id_col), id_col)
        .select(centroid_id_col, F.posexplode("__v").alias("dim", "__val"))
    )
    return member_vecs.groupBy(centroid_id_col, "dim").agg(
        (
            F.sum(F.col("__val").cast("decimal(28,15)")).cast("double")
            / F.count(F.lit(1))
        ).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_members"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
) -> DataFrame:
    """Iterative Lloyd's k-means: deterministic seeding (the k lowest-id
    vectors), assign → update until assignments stop changing or
    ``max_iter``. Returns the final assignment ``(id_col, cluster_id,
    dist2)``.

    Each iteration is one broadcast-assign pass over the data plus one
    k × dim-group aggregate; the centroid table is collected to the driver
    (k × dim doubles — bytes, not data-scale) and re-broadcast, which is the
    standard Spark iterative-ML shape (same as MLlib KMeans). Lineage is cut
    per round with localCheckpoint to keep Catalyst plans bounded.
    """
    from .similarity import dvec

    base = emb.select(F.col(id_col), dvec(F.col(vec_col)).alias("embedding"))
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    centroids = (
        base.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias(
                "cluster_id"
            ),
            F.col("embedding").alias("centroid"),
        )
    )
    prev = None
    for _ in range(max_iter):
        assignment = kmeans_assign(
            base, centroids, id_col=id_col, vec_col="embedding"
        ).localCheckpoint(eager=True)
        if prev is not None:
            changed = (
                assignment.alias("n")
                .join(prev.alias("o"), id_col)
                .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
        prev = assignment
        means = kmeans_update(
            base, assignment, id_col=id_col, vec_col="embedding"
        )
        rows = means.collect()
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], {})[r["dim"]] = r[
                "centroid_val"
            ]
        spark = emb.sparkSession
        centroids = spark.createDataFrame(
            [
                (cid, [vals[d] for d in sorted(vals)])
                for cid, vals in sorted(by_cluster.items())
            ],
            "cluster_id INT, centroid ARRAY<DOUBLE>",
        )
    base.unpersist()
    return prev if prev is not None else assignment
