"""Connected components over near-dup pair lists — the step that turns
pairwise dedup output (ngram_jaccard / minhash / simhash / embedding pairs)
into dedup CLUSTERS: every doc labeled with the min doc-id of its component,
so one survivor per cluster can be kept with a single groupBy.

Algorithm: iterative min-label propagation (the MapReduce-CC shape of
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
plus a per-round POINTER-JUMPING compression (label <- label(label), the
hash-to-min idea of Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE'13): each node starts labeled with
itself; every round each node takes the min of its own label and its
neighbors' labels, then relabels through its label's own label — so the
propagation distance roughly DOUBLES per round and convergence is
O(log diameter), not O(diameter). Near-dup clusters are dense and shallow
(a handful of rounds either way), but a pathological duplicate CHAIN of
length 1000 now converges in ~10 rounds instead of 1000 (pinned by the
diameter-stress test).

Scale notes (100 TB):
- Each round is one equi-join (edges ⋈ labels on src) + one groupBy(dst)
  min — both shuffle on node id; no collect, no driver state beyond the
  per-round changed-count aggregate.
- ``localCheckpoint`` truncates lineage every round: without it the plan
  doubles per iteration and Catalyst analysis time explodes long before
  the data does.
- Edges are held symmetric (a→b and b→a) so propagation needs no
  direction handling; self-loops carry each node's own label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 20,
    out_node: str = "doc",
    out_component: str = "component",
    compress: bool = True,
) -> DataFrame:
    """Label every node reachable through ``pairs`` with the minimum node id
    of its connected component. Only nodes appearing in at least one pair
    are returned (callers union singletons back if they need every row).

    Deterministic: min-label is order-independent, so the result does not
    depend on partitioning or iteration scheduling.

    ``compress`` enables the pointer-jumping step (one extra self-join per
    round) that makes convergence O(log diameter); disable it only for the
    convergence-behavior tests — every label is itself a node id of the same
    component and labels only decrease, so compression never changes the
    fixed point, just how fast it is reached.
    """
    labels, rounds = _cc_labels(pairs, src_col, dst_col, max_iters, compress)
    return labels.select(
        F.col("node").alias(out_node), F.col("label").alias(out_component)
    )


def cc_rounds(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 20,
    compress: bool = True,
) -> int:
    """Rounds to convergence (for scale probes / diameter stress tests)."""
    return _cc_labels(pairs, src_col, dst_col, max_iters, compress)[1]


def _cc_labels(
    pairs: DataFrame, src_col: str, dst_col: str, max_iters: int, compress: bool
) -> tuple[DataFrame, int]:
    edges = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
        .unionByName(pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("t")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for rounds in range(1, max_iters + 1):
        # neighbor-propagated candidate labels, then keep the per-node min
        # of (current label, best neighbor label)
        prop = (
            edges.join(labels, edges["s"] == labels["node"])
            .select(F.col("t").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(prop, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                "new_label"
            ),
            "label",
        )
        if compress:
            # pointer jump: relabel through the label's own (new) label.
            # Every label value is a node id, so the lookup always resolves;
            # the chase roughly doubles propagation distance per round.
            lookup = stepped.select(
                F.col("node").alias("__ln"), F.col("new_label").alias("__ll")
            )
            stepped = (
                stepped.join(lookup, stepped["new_label"] == lookup["__ln"], "left")
                .select(
                    "node",
                    F.coalesce("__ll", "new_label").alias("new_label"),
                    "label",
                )
            )
        new_labels = stepped.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("new_label") != F.col("label")).count()
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            return labels, rounds
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "component diameter exceeds 2^max_iters; raise max_iters"
    )


def _union_find_min_labels(edges) -> dict:
    """Union-find with path compression and union-by-MIN-id over an
    iterable of (a, b) edges: returns {node: min id of its component}.
    The min-root invariant (a merged set's root is the smaller of the two
    roots, inductively the set minimum) makes the output identical to the
    distributed min-label fixed point — property-tested against an
    independent BFS labeling in tests/test_graph.py."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in parent}


def connected_components_bounded(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 20,
    out_node: str = "doc",
    out_component: str = "component",
    collect_limit: int | None = 4096,
) -> DataFrame:
    """``connected_components`` with a DRIVER-SIDE union-find fast path for
    SMALL pair sets — the streaming micro-batch case, where the pair set is
    batch-neighborhood-sized by construction but the distributed iteration
    still costs ~2 localCheckpoint jobs per round plus a changed-count job
    (the round-11 per-batch fixed-cost floor: job scheduling, not data,
    dominates a 12 s batch). Up to ``collect_limit`` edges are collected
    (one bounded job, the same device as the 4096-literal index prune);
    if they fit, min-id labels come from a driver union-find and return as
    a local relation (downstream joins against it broadcast for free).
    Above the bound, falls back to the distributed iteration untouched.
    Output ≡ ``connected_components`` exactly — the min-label fixed point
    is unique and order-independent (pinned in tests/test_graph.py)."""
    if collect_limit is not None:
        rows = pairs.select(src_col, dst_col).limit(collect_limit + 1).collect()
        if len(rows) <= collect_limit:
            out = sorted(_union_find_min_labels((r[0], r[1]) for r in rows).items())
            schema = pairs.select(
                F.col(src_col).alias(out_node), F.col(src_col).alias(out_component)
            ).schema
            # broadcast hint (r15): createDataFrame arrives as an
            # ExistingRDD with UnknownPartitioning and no stats, so an
            # unhinted downstream join sort-merge-joins the corpus against
            # it — the hint is what actually converts those joins to
            # broadcast. Always safe: the relation is <= 2*collect_limit
            # rows by construction.
            return F.broadcast(pairs.sparkSession.createDataFrame(out, schema))
    return connected_components(
        pairs,
        src_col=src_col,
        dst_col=dst_col,
        max_iters=max_iters,
        out_node=out_node,
        out_component=out_component,
    )


def connected_components_incremental(
    prev_labels: DataFrame,
    new_pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 20,
    out_node: str = "doc",
    out_component: str = "component",
    collect_limit: int | None = None,
) -> DataFrame:
    """Merge a NEW batch of pairs into an existing component labeling
    without re-running CC over the full graph — the incremental-ingestion
    companion to minhash_lsh_pairs_incremental: each ingested batch yields
    cross/new pairs, and the cluster labels must absorb them.

    Correctness rests on star contraction: an old component is fully
    captured by its (member -> label) edges, so CC over
    ``star edges of AFFECTED components ∪ new pairs`` equals CC over the
    whole original edge set restricted to those components. Components
    untouched by any new pair pass through VERBATIM — no join, no
    iteration over them — so per-batch cost scales with the new batch and
    the components it touches, never the accumulated graph:

    1. nodes(new_pairs) -> their old components (one semi-joinable lookup);
    2. prev_labels splits into affected / unaffected by component;
    3. CC runs on (affected star edges ∪ new pairs) — old clusters are
       depth-1 stars, so the iteration count is driven by the NEW merge
       structure only;
    4. unaffected labels union back unchanged.

    Equals the full recompute exactly (min-id labels; pinned in tests).
    Returns (out_node, out_component) for every node in prev_labels or
    new_pairs.

    ``collect_limit``: when set, the merge CC over (affected stars ∪ new
    pairs) — batch-and-neighborhood-sized in the streaming ingest paths —
    runs through ``connected_components_bounded``'s driver union-find
    fast path instead of the iterative jobs (falls back above the bound;
    output identical either way).
    """
    prev = prev_labels.select(
        F.col(out_node).alias("node"), F.col(out_component).alias("label")
    )
    new_nodes = (
        new_pairs.select(F.col(src_col).alias("node"))
        .unionByName(new_pairs.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    touched = (
        prev.join(new_nodes, "node", "left_semi").select("label").distinct()
    )
    affected = prev.join(touched, "label", "left_semi")
    unaffected = prev.join(touched, "label", "left_anti")
    star = affected.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias(src_col), F.col("label").alias(dst_col)
    )
    merged = connected_components_bounded(
        star.unionByName(new_pairs.select(src_col, dst_col)),
        src_col=src_col,
        dst_col=dst_col,
        max_iters=max_iters,
        out_node=out_node,
        out_component=out_component,
        collect_limit=collect_limit,
    )
    # an affected single-member component whose node appears in new_pairs
    # is already in merged (via its new edges); one that does NOT appear in
    # new_pairs is by definition unaffected. No residue either way.
    return merged.unionByName(
        unaffected.select(
            F.col("node").alias(out_node), F.col("label").alias(out_component)
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 3,
    out_node: str = "node",
    out_hops: str = "hops",
) -> DataFrame:
    """Minimum hop distance from a SEED set over an undirected edge list,
    bounded at ``max_hops`` — the multi-hop reach primitive (related-item
    expansion, contamination blast radius, recall set growth).

    Level-synchronous frontier BFS: the frontier starts as the seeds at
    hop 0; each round joins the CURRENT frontier (not the full visited
    set) against the edges and anti-joins out already-visited nodes, so
    round cost is O(edges touching the frontier) and the loop stops early
    the moment a frontier comes back empty — on a 100 TB graph the work
    is proportional to the reached neighborhood, never the node count.
    Determinism: hop numbers are structural (min distance), independent
    of partitioning; min() over multiple discovery paths settles ties.
    ``localCheckpoint`` per round truncates the lineage exactly as in
    ``connected_components`` — iterative plans otherwise double in size
    per round and Catalyst analysis dominates long before the data does.

    ``seeds``: one-column DataFrame of node ids. Returns (out_node,
    out_hops) for every node within ``max_hops`` of any seed — ALL
    distinct seeds included at hop 0, even seeds with no incident edge
    (an isolated seed is within 0 hops of itself; for the blast-radius
    use the benchmark hit itself is always in the radius). The
    edges-semi-join is applied only to the EXPANSION frontier, where it
    is a pure optimization: isolated seeds cannot discover neighbors.
    """
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
        .unionByName(
            edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("t"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_seeds = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # The expansion frontier's seed semi-join folds into hop 1's job, and
    # ``visited`` is NEVER separately checkpointed: it is a union of
    # already-checkpointed frontiers (all_seeds + nxt_1..h), so its lineage
    # grows LINEARLY with the bounded hop count — the per-round doubling
    # that justifies checkpointing in connected_components does not occur.
    # Through r14 every hop paid 3 jobs (nxt checkpoint, isEmpty, visited
    # checkpoint) plus a frontier pre-checkpoint; now it pays 2.
    frontier = all_seeds.join(
        e.select(F.col("s").alias("node")).distinct(), "node", "left_semi"
    )
    visited = all_seeds.withColumn("hops", F.lit(0))
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "s"), "s")
            .select(F.col("t").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt.withColumn("hops", F.lit(hop)))
        frontier = nxt
    return visited.select(
        F.col("node").alias(out_node), F.col("hops").cast("int").alias(out_hops)
    )


def pagerank_fixed_point(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    scale: int = 10**12,
    damp_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank with INTEGER fixed-point arithmetic —
    (node, rank_scaled) after ``iters`` power steps, rank mass carried as
    BIGINT units of 1/``scale``.

    Why integers: float PageRank sums per-node contributions whose
    addition order differs across partitionings and engines, so no two
    runs (or a Spark run and a SQL oracle) agree bit-for-bit. BIGINT
    sums are exact and order-free and integer division floors
    identically everywhere, so the whole iteration is deterministic and
    cross-engine reproducible — the same device as the decimal money
    sums, applied to an iterative algorithm. The quantization error per
    step is < outdeg/scale of a unit, irrelevant at scale=1e12.

    Per step, each node sends floor(rank / outdeg) along every out-edge,
    and receives damp% of its incoming sum plus the constant teleport
    floor((100-damp)% of scale/N): one co-partitionable edge-rank join +
    one partial-aggregated sum per iteration — the canonical O(iters)
    shuffle loop; ``localCheckpoint`` truncates lineage each round like
    ``connected_components``. Overflow-safe by construction: total mass
    stays ~scale, so damp_pct x any incoming sum fits a BIGINT. Dangling
    nodes keep only the teleport term (their mass leaks — the standard
    simple variant; symmetrize the edges for the undirected walk, which
    has none).
    """
    par = edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(par, "node")
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar to the driver, like ivf_fit's N
    if n_nodes == 0:
        raise ValueError("empty edge set")
    init = scale // n_nodes
    tele = ((100 - damp_pct) * init) // 100
    # degree-annotated edges, built ONCE: through r14 the e ⋈ deg join (and
    # deg's own groupBy) sat INSIDE the loop and re-executed every power
    # step — one full edge shuffle per iteration carrying no new
    # information. Hoisting it out, hash-partitioned on src, makes each
    # step shuffle only node-sized relations (ranks out, contributions
    # back): localCheckpoint preserves the physical partitioning, so the
    # per-step join re-sorts but never re-exchanges the edge side.
    edeg = (
        e.join(e.groupBy("src").agg(F.count("*").alias("outdeg")), "src")
        .repartition(par, "src")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edeg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(tele)
                    + F.expr(f"({damp_pct} * coalesce(s, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("rank").alias("rank_scaled"))


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    out_node: str = "node",
    out_tri: str = "n_triangles",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list via
    degree-ordered orientation (the MapReduce node-iterator++ of Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
    WWW'11) — the clustering/cohesion primitive the co-purchase graph
    family (q48 pairs, q49 PageRank, q50 reach) lacked.

    Each edge is oriented from its lower endpoint to its higher endpoint
    under the total order (degree, id); every triangle then has exactly
    one node with out-edges to the other two, and the third edge is
    oriented between them consistently — so each triangle is found exactly
    once as a closed wedge, with no post-hoc 1/3 correction. The payoff is
    the wedge bound: orientation caps out-degree at O(sqrt(m)) for ANY
    degree distribution, so the wedge join generates O(m^{3/2}) candidates
    even when a celebrity node has degree 10^6 (whose naive open-wedge
    count would be 10^12). Plan shape: one groupBy for degrees, one
    self-equi-join on the wedge pivot u, one semi-join on (v, w) to close,
    one explode+groupBy for per-node counts — every shuffle is on node
    ids, every aggregate map-side combinable. No iteration, no driver
    state.

    Determinism: the (degree, id) order and the counts are integers;
    output is partitioning-independent. Self-loops are dropped; parallel
    edges collapse via distinct. Returns (out_node, out_tri) for nodes in
    >= 1 triangle.
    """
    a, b = F.col(src_col), F.col(dst_col)
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u"))
        & (
            (F.col("x.dv") < F.col("y.dv"))
            | ((F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v")))
        ),
    ).select(F.col("x.u").alias("u"), F.col("x.v").alias("v"), F.col("y.v").alias("w"))
    closing = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["v", "w"], "left_semi")
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias(out_node))
        .groupBy(out_node)
        .agg(F.count("*").cast("bigint").alias(out_tri))
    )
