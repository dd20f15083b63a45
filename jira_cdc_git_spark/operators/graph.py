"""Graph / hierarchy operators (SURVEY §2.3 J1, J2; pkg/epic).

The reference builds an epic→story→subtask hierarchy with an in-memory
parent map and recurses to max depth 5 (pkg/epic/jira_analyzer.go:250-311,
pkg/epic/analyzer.go:91,102). Spark has no recursive CTE, so the idiomatic
restatement is an iterative self-join to fixpoint, driven from the driver
with one persisted frontier per level — O(depth) shuffles, each a key-key
equi-join that AQE broadcasts when the frontier is small (epics are ≤ ~1000
issues in the reference's own benchmarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jira_cdc_git_spark.functions.text import round_half_up as _rhu
from jira_cdc_git_spark.sources.registry import load_table

from jira_cdc_git_spark.materialize import materialize, materialize_lazy

MAX_DEPTH = 5  # reference cap: pkg/epic/analyzer.go:91


def hierarchy_levels(
    nodes: DataFrame,
    key_col: str = "key",
    parent_col: str = "parent_key",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Assign a level to every node reachable from a root (parent IS NULL)
    within ``max_depth`` edges, via iterative self-join.

    Returns (key, parent, level). Nodes deeper than max_depth (or in cycles)
    are excluded — mirroring the reference's recursion cap
    (pkg/epic/jira_analyzer.go:250-311).

    Scale: each iteration joins the full edge set against the current
    frontier. The frontier is materialized per level (strategy from
    spark.jira_cdc_git.materialize — local/disk/checkpoint) — lineage stays
    flat (no O(depth²) recompute), storage is executor-local and freed on
    GC (no persist leak), and ONE materialization serves both the emptiness
    check and the next join. No forced broadcast: a level-1 frontier can be
    half the table (executor OOM if broadcast unconditionally) — AQE picks
    broadcast at runtime when the frontier really is small.
    """
    # the edge set is probed once per level — materialize it once instead of
    # re-reading the source max_depth+1 times
    edges = nodes.select(
        F.col(key_col).alias("key"), F.col(parent_col).alias("parent")
    ).transform(materialize_lazy)
    frontier = edges.filter(F.col("parent").isNull()).withColumn("level", F.lit(0))
    frontier = frontier.transform(materialize_lazy)
    levels = [frontier]
    for _ in range(max_depth):
        parents = frontier.select(
            F.col("key").alias("pk"), (F.col("level") + 1).alias("child_level")
        )
        frontier = (
            edges.join(parents, edges.parent == parents.pk)
            .select("key", "parent", F.col("child_level").alias("level"))
        )
        frontier = frontier.transform(materialize_lazy)
        if frontier.isEmpty():
            break
        levels.append(frontier)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def hierarchy_over_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 driver-facing parity query: impose a synthetic binary hierarchy on
    `orders` (node i's parent is i//2 over the 1-based key space) and
    compute levels 0..5. The DuckDB oracle is the equivalent WITH RECURSIVE
    query.

    o_orderkey is dense 0..N-1 in the test fixtures, so the 1-based key is
    derived arithmetically (`o_orderkey + 1`) — a narrow projection instead
    of the previous global row_number() window, whose single-partition sort
    was a scale-killer. Production hierarchies come with real parent keys
    and skip densification entirely.
    """
    orders = load_table(spark, "orders", sf_dir)
    nodes = orders.select(
        (F.col("o_orderkey") + 1).cast("int").alias("key")
    ).select(
        "key",
        F.when(F.col("key") >= 2, (F.col("key") / 2).cast("int")).alias("parent_key"),
    )
    out = hierarchy_levels(nodes, "key", "parent_key", MAX_DEPTH)
    return out.select("key", "parent", "level")


def broken_links(edges: DataFrame, issues: DataFrame, dst_col: str = "dst_key") -> DataFrame:
    """J2 — references whose target doesn't exist (reference:
    validateCompleteness pkg/epic/jira_analyzer.go:326-356 collects
    BrokenLinks). left_anti against the issue key set."""
    return edges.join(
        issues.select(F.col("key").alias("__k")),
        edges[dst_col] == F.col("__k"),
        "left_anti",
    )


#: Two-phase star round budget, mirrored by the link_components oracle
#: (which unrolls exactly this many rounds). Extra rounds past
#: convergence are no-ops, and because BOTH engines run the same
#: bounded computation, parity holds even at the cap — the
#: kcore/pagerank fixed-rounds discipline. Fixture graphs converge in
#: <= 6 rounds (asserted in tests); 12 leaves 2x headroom.
#: Round budget for the two-phase star loop. The sf0.1 issue-link graph
#: (one ~142k-node component) converges in 15-16 rounds — measured r8
#: after the 12-round budget fired the unconverged warning on the
#: headline bench — so 18 gives O(log^2 n) headroom; converging graphs
#: early-exit, so only genuinely deep graphs pay for the raise. The
#: link_components oracle unrolls this same constant, so extra rounds
#: past convergence stay no-ops on BOTH engines.
STAR_ROUNDS = 18

#: Edge-count cap under which connected_components solves the graph in
#: ONE Arrow-batched union-find task instead of driver-scheduled star
#: rounds — the "finish locally once the graph fits on one machine"
#: step of the MapReduce CC literature (Kiveris et al. 2014 run their
#: final rounds in memory; GraphX's CC does the same). 1M canonical
#: edges is ~100 MB of pandas strings — far under one executor thread's
#: share — while the graphs that reach this path after contraction are
#: thousands of edges. Above the cap the two-phase star loop runs
#: unchanged, so the bound never affects correctness, only the constant
#: factor.
LOCAL_FINISH_CAP = 1_000_000


def _unionfind_pdf(pdf):
    """Exact union-find over one in-memory edge batch (u, v) → one
    (node, root) row per incident node; root = lexicographic-min member,
    matching the star loop's label choice. Deterministic: the output is
    a pure function of the edge SET (union always attaches the larger
    root under the smaller), independent of row order."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(pdf["u"], pdf["v"]):
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    nodes = sorted(set(pdf["u"]).union(pdf["v"]))
    return pd.DataFrame({"node": nodes, "root": [find(n) for n in nodes]})


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = STAR_ROUNDS,
    local_finish_cap: int = LOCAL_FINISH_CAP,
    assume_canonical: bool = False,
) -> DataFrame:
    """Undirected connected components via the two-phase star algorithm
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond"): alternate LARGE-STAR (link every neighbor larger than the
    center to the neighborhood minimum) and SMALL-STAR (link the center
    and its not-larger neighbors to their minimum) until the edge set is
    stable. At the fixpoint every component is a star whose center is
    its minimum node id; labels read off as min(self, neighbors).
    Returns (node, component) where component = min node id in the
    component.

    WHY THIS ALGORITHM: plain min-label propagation converges in
    O(diameter) rounds and even pointer-jumping degenerates on long
    chains with adversarial id order — the issue-link graph at sf0.001
    is ONE 1425-node component on which neither finishes inside any
    sane round budget (measured: label churn was still oscillating at
    round 22). Two-phase star is the published O(log^2 n) MapReduce
    answer and converges here in a handful of rounds.

    This is the pairs->clusters step every near-dup pipeline needs: LSH
    emits PAIRS, retention decisions need GROUPS with one canonical
    member. Scale shape per round: two groupBy(center) partial-agg
    minimums + two adjacency joins over a monotonically SHRINKING edge
    set (stars collapse paths immediately); each round materializes
    (strategy-configurable) to keep lineage flat. Convergence is an
    exceptAll emptiness check on the canonical edge frame.

    ``assume_canonical``: the caller vouches that ``pairs`` is already
    the canonical (u < v, u != v), DISTINCT, materialized edge frame —
    link_components' contraction emits exactly that shape — so the
    canonicalization pass here (a full distinct shuffle + one more
    materialize boundary) is skipped. Idempotent either way: on
    canonical input the skipped pass is the identity."""
    if assume_canonical:
        edges = pairs.select(
            F.col(a_col).alias("u"), F.col(b_col).alias("v")
        )
    else:
        edges = (
            pairs.select(
                F.least(F.col(a_col), F.col(b_col)).alias("u"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .transform(materialize)
        )
    # Local finish: once the canonical edge set fits the cap, ONE
    # union-find task labels the whole graph exactly — no rounds, no
    # per-round shuffles. The star loop's value is getting a huge graph
    # DOWN to this size; paying ~15 driver-scheduled rounds on a
    # few-thousand-edge graph (measured: the sf0.1 boundary graph after
    # contraction, 7.5k edges, 14.7 s of round overhead) is pure
    # constant-factor waste. The count is one job over the already-
    # materialized frame.
    if local_finish_cap and edges.count() <= local_finish_cap:
        schema_t = dict(edges.dtypes)["u"]
        # the union-find output already carries EVERY node incident to
        # the edge set (node = u ∪ v of the single batch) — exactly the
        # all_nodes frame — so re-deriving all_nodes and left-joining it
        # back (one distinct shuffle + one join per consumer; the r12
        # plan audit showed the subtree TWICE in link_components'
        # final job) is pure redundancy. Return the labels directly.
        return (
            edges.withColumn("_g", F.lit(0))
            .groupBy("_g")
            .applyInPandas(
                lambda pdf: _unionfind_pdf(pdf),
                f"node {schema_t}, root {schema_t}",
            )
            .select("node", F.col("root").alias("component"))
        )
    all_nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
    )

    def _adj(e: DataFrame) -> DataFrame:
        return e.select(F.col("u").alias("c"), F.col("v").alias("n")).unionByName(
            e.select(F.col("v").alias("c"), F.col("u").alias("n"))
        )

    def _canon(e: DataFrame) -> DataFrame:
        return (
            e.select(
                F.least(F.col("a"), F.col("b")).alias("u"),
                F.greatest(F.col("a"), F.col("b")).alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    prev_count = None  # carried across rounds: saves one count job each
    converged = False
    for _ in range(max_iters):
        adj = _adj(edges)
        # LARGE-STAR: m = min(closed neighborhood); every neighbor n > c
        # re-links to m.
        mins_l = (
            adj.groupBy("c")
            .agg(F.min("n").alias("mn"))
            .select("c", F.least("mn", "c").alias("m"))
        )
        # materialized: the small-star phase consumes `large` through
        # three branches (two adjacency orientations + the relink); an
        # unmaterialized plan recomputes the large-star shuffle per
        # branch (measured +30% on the sf0.1 bench)
        large = _canon(
            adj.join(mins_l, "c")
            .filter(F.col("n") > F.col("c"))
            .select(F.col("n").alias("a"), F.col("m").alias("b"))
        ).transform(materialize_lazy)

        adj2 = _adj(large)
        # SMALL-STAR: m = min over {n <= c} + {c}; the center and each
        # not-larger neighbor re-link to m.
        small_nbrs = adj2.filter(F.col("n") <= F.col("c"))
        mins_s = (
            small_nbrs.groupBy("c")
            .agg(F.min("n").alias("mn"))
            .select("c", F.least("mn", "c").alias("m"))
        )
        relinked = small_nbrs.join(mins_s, "c").select(
            F.col("n").alias("a"), F.col("m").alias("b")
        )
        self_links = mins_s.select(F.col("c").alias("a"), F.col("m").alias("b"))
        new_edges = _canon(relinked.unionByName(self_links)).transform(materialize)

        # Both frames are distinct, so equal counts + one empty
        # one-sided EXCEPT imply set equality (half the shuffle of a
        # symmetric check; the cheap count compares first, and the
        # previous round's count is carried in the driver).
        if prev_count is None:
            prev_count = edges.count()
        new_count = new_edges.count()
        converged = (
            new_count == prev_count and new_edges.exceptAll(edges).isEmpty()
        )
        edges, prev_count = new_edges, new_count
        if converged:
            break
    if not converged:
        # Downstream exact-oracle consumers (neardup_clusters,
        # cluster_size_histogram) would otherwise fail parity with a
        # bare hash mismatch and no diagnostic; link_components parity
        # survives only because its oracle unrolls the same fixed
        # rounds. Fail loudly instead (r6 advice, graph.py:180).
        import warnings

        warnings.warn(
            f"connected_components: star loop exhausted {max_iters} "
            "rounds without converging — component labels may be "
            "non-final; raise max_iters/STAR_ROUNDS",
            RuntimeWarning,
            stacklevel=2,
        )

    comp = (
        _adj(edges)
        .groupBy(F.col("c").alias("node"))
        .agg(F.min("n").alias("mn"))
        .select("node", F.least("mn", "node").alias("component"))
    )
    # Nodes whose edges collapsed into the star still appear in the final
    # adjacency; any node somehow absent is its own singleton (defensive).
    return (
        all_nodes.join(comp, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters from the LSH pair list: connected
    components + canonical member (the component id IS the minimum
    doc_id, so `keep = doc_id == cluster_id` is the retention rule).
    Only docs that appear in some pair are emitted — every other doc is
    trivially its own cluster."""
    from jira_cdc_git_spark.operators.text import neardup_pairs_lsh

    pairs = neardup_pairs_lsh(spark, sf_dir).transform(materialize)
    cc = connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def pagerank_links(
    spark: SparkSession,
    sf_dir: str,
    iters: int = 3,
    alpha: float = 0.85,
) -> DataFrame:
    """PageRank over the issue-link graph — the iterative-algorithm shape
    (loop of join + groupBy with a materialized frontier) that recursive
    engines express as fixpoint recursion. Scores identify hub issues the
    same way domain authority identifies hub pages in a crawl corpus.

    Formulation: nodes = all issue keys; edges = every typed relationship
    (epic/parent/subtask/link) whose target exists; dangling-node mass is
    dropped (documented simple variant); PR_{t+1}(v) = (1-a)/N +
    a·Σ_{u→v} PR_t(u)/deg(u).

    CROSS-ENGINE DETERMINISM: ranks are carried as INTEGER NANO-UNITS
    (pr·1e9). Per-edge contributions floor-divide to integers, so the one
    order-dependent operation per iteration — the contribution SUM — adds
    exact integers and is identical under any execution order/engine;
    every remaining op is a per-row IEEE op with a fixed expression
    shape. (A plain double fixpoint drifts: at sf0.01, 68/15000 values
    landed on opposite sides of a 1e-9 rounding boundary between Spark
    and DuckDB.) The oracle runs the same `iters` iterations UNROLLED as
    stacked CTEs, so the iterative Spark loop is differential-tested
    end-to-end, floor-truncation variant and all.

    100 TB shape: per iteration one src-key join (rank → edges), one
    dst-key aggregation (map-side partial, exact integer), and a
    nodes-left-join. The rank frame is materialized every 4th iteration
    (not every one): each un-materialized iteration references its
    predecessor exactly once, so lineage grows linearly and a shallow
    stack compiles into ONE job — per-iteration checkpointing paid a
    full job's fixed cost per hop (4.4 s → this shape at 3 iterations on
    the sf0.1 bench) while only deep runs need the lineage cut. Degrees
    and N are computed once."""
    from jira_cdc_git_spark import fixtures as FX
    from jira_cdc_git_spark.operators.jira import link_edges

    nodes = materialize(
        FX.issues_flat(spark, sf_dir).select("key")
    )
    edges = materialize(
        link_edges(spark, sf_dir)
        .select("src_key", "dst_key")
        .join(
            nodes.select(F.col("key").alias("dst_key")), "dst_key", "left_semi"
        )
    )
    deg = materialize(
        edges.groupBy("src_key").agg(F.count("*").alias("d"))
    )
    n1 = nodes.agg(F.count("*").cast("double").alias("n"))
    unit = 1_000_000_000.0
    pr = nodes.crossJoin(F.broadcast(n1)).select(
        "key",
        F.floor(F.lit(unit) / F.col("n") + 0.5).cast("double").alias("pr_u"),
    )
    for i in range(iters):
        contrib = (
            edges.join(pr, edges.src_key == pr.key)
            .join(deg, "src_key")
            .select(
                F.col("dst_key").alias("key"),
                F.floor(F.col("pr_u") / F.col("d")).alias("c"),
            )
            .groupBy("key")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        pr = (
            nodes.join(contrib, "key", "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "key",
                F.floor(
                    (1 - alpha) * unit / F.col("n")
                    + alpha * F.coalesce(F.col("s"), F.lit(0.0))
                    + 0.5
                )
                .cast("double")
                .alias("pr_u"),
            )
        )
        if (i + 1) % 4 == 0 and (i + 1) < iters:
            pr = materialize(pr)
    return pr.select("key", (F.col("pr_u") / unit).alias("pr"))


#: co-occurrence edge threshold as a fraction of the corpus size —
#: scale-invariant graph density; mirrored by the oracle.
TRIANGLE_COOC_FRAC = 0.12


def _cooc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (a < b) token co-occurrence edges: adjacent-token pairs
    appearing in at least TRIANGLE_COOC_FRAC x n_docs bigrams. Shared by
    token_triangles and clustering_coefficient."""
    from jira_cdc_git_spark.operators.text import _bigram_frame

    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    bg = _bigram_frame(docs.select("doc_id", "text")).filter(
        F.col("w1") != F.col("w2")
    )
    return (
        bg.select(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("c") >= TRIANGLE_COOC_FRAC * F.col("n_docs"))
        .select("a", "b")
        .transform(materialize)
    )


def token_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the token co-occurrence graph — the
    graph-analytics primitive behind clustering coefficients and
    community strength, run here on a corpus-derived graph (nodes =
    tokens, edges = adjacent-token pairs co-occurring in at least
    TRIANGLE_COOC_FRAC x n_docs bigrams, so density is corpus-size
    invariant).

    Implementation is the DEGREE-ORIENTED wedge join (Schank & Wagner
    '05 / Cohen's MapReduce form — the standard distributed algorithm):
    orient every edge from its lower-(degree, id) endpoint to the
    higher, join wedges on the shared LOW corner, and close each wedge
    with one oriented-edge lookup. Every triangle is produced exactly
    once (at its minimum-degree corner), and the wedge count is
    sum(d_out²) with d_out bounded by sqrt(|E|)-ish — the reason this
    formulation survives power-law graphs where a naive 3-way self-join
    explodes on hub nodes.

    100 TB shape: edges are bounded by (observed vocabulary)², not
    corpus size, after one bigram-keyed partial agg; the wedge and
    closure joins shuffle edge-sized frames only."""
    edges = _cooc_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # orient low-(deg, id) -> high-(deg, id); carry the dst order key so
    # the wedge comparison needs no extra join
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    keyed = edges.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("da").alias("d"), F.col("a").alias("v")) < F.struct(
        F.col("db").alias("d"), F.col("b").alias("v")
    )
    oriented = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.struct(F.col("db").alias("d"), F.col("b").alias("v")))
        .otherwise(F.struct(F.col("da").alias("d"), F.col("a").alias("v")))
        .alias("dst_key"),
    ).transform(materialize)
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.src") == F.col("e2.src")).filter(
        F.col("e1.dst_key") < F.col("e2.dst_key")
    )
    closer = oriented.select(
        F.col("src").alias("v1"), F.col("dst").alias("v2")
    )
    tri = wedges.join(
        closer,
        (F.col("e1.dst") == F.col("v1")) & (F.col("e2.dst") == F.col("v2")),
    )
    sorted_tri = F.array_sort(
        F.array(F.col("e1.src"), F.col("e1.dst"), F.col("e2.dst"))
    )
    return tri.select(
        F.element_at(sorted_tri, 1).alias("a"),
        F.element_at(sorted_tri, 2).alias("b"),
        F.element_at(sorted_tri, 3).alias("c"),
    )


def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the co-occurrence
    graph: c(v) = 2·T(v) / (d(v)·(d(v)-1)), the fraction of a node's
    neighbor pairs that are themselves connected — the community-
    cohesion metric that distinguishes hub tokens bridging topics
    (low c) from tokens inside a tight collocation cluster (high c).

    Reuses the degree-oriented triangle enumeration (each triangle
    counted once, then exploded to its three corners — a 3× map, not a
    recount) and the shared edge builder; nodes with degree < 2 report
    coefficient 0. All frames are vocabulary-bounded."""
    edges = _cooc_edges(spark, sf_dir)
    tri = token_triangles(spark, sf_dir)
    per_node_tri = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("degree"))
    )
    from jira_cdc_git_spark.functions.text import round_half_up

    return (
        deg.join(per_node_tri, "v", "left")
        .select(
            "v",
            F.col("degree").cast("int").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("int").alias("n_triangles"),
            round_half_up(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("coefficient"),
        )
    )


#: k-core constants (mirrored by the oracle): core threshold and the
#: bounded number of peel rounds (the pagerank/kmeans fixed-iteration
#: discipline — extra rounds past convergence are no-ops).
KCORE_K = 3
KCORE_ROUNDS = 6


def _peel(
    e: DataFrame, k: int, rounds: int, prev_count: int | None
) -> tuple[DataFrame, int | None]:
    """Up to `rounds` k-core peel rounds over the canonical edge frame,
    with an EXACT early exit: a peel round only ever REMOVES edges, so
    an unchanged edge count after a round proves the edge set hit its
    fixpoint and every remaining round is a no-op — stopping there is
    result-identical to running the full budget at any scale (no data
    assumption; the oracle's fixed unroll agrees because extra rounds
    past the fixpoint change nothing). The count rides the job that
    materializes the round's lazily-checkpointed output, so the check
    costs no extra pass; `prev_count` carries across calls to save the
    initial count job when the caller already knows it. Measured on
    the sf0.1 bench: core_numbers spent ~2/3 of its rounds re-peeling
    converged edge sets (guide §1.2 — remove work you throw away)."""
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("v").transform(materialize_lazy)
        e = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            .transform(materialize_lazy)
        )
        n = e.count()
        if prev_count is not None and n == prev_count:
            return e, n
        prev_count = n
    return e, prev_count


def kcore_decomposition(
    spark: SparkSession, sf_dir: str, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """Bounded k-core peel over the token co-occurrence graph: repeat
    "drop every vertex with degree < k, drop edges touching it" for
    KCORE_ROUNDS rounds — the dense-cohesion filter of graph analytics
    (the k-core survives; hubs-with-thin-tails do not), complementing
    token_triangles' local density with a global one.

    100 TB shape: each round is one union-degree partial agg (bounded
    by |V|) plus two semi-joins of the shrinking edge set against the
    surviving-vertex frame; rounds materialize so lineage stays flat
    (the hierarchy_levels discipline). Fixed rounds keep the plan
    oracle-replayable; on this graph the peel converges in < 6."""
    e = _cooc_edges(spark, sf_dir)
    e, _ = _peel(e, k, rounds, prev_count=None)
    return (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("int").alias("core_degree"))
    )


#: highest core level probed by core_numbers.
KCORE_MAX_K = 4


def core_numbers(
    spark: SparkSession, sf_dir: str, max_k: int = KCORE_MAX_K
) -> DataFrame:
    """Full core-number decomposition: each vertex's core number = the
    largest k for which it survives the k-core peel — the standard
    cohesion ranking (Batagelj-Zaversnik semantics) built by running the
    bounded peel at k = 1..max_k and keeping each vertex's deepest
    survival. Round-6 registration backlog: parity-pinned against
    kcore_decomposition (the k=3 slice must agree exactly) in
    tests/test_operators.py.

    100 TB shape: max_k sequential peels, each the proven
    degree-agg + two-semi-join round over a monotonically shrinking
    edge set; results union to one |V|-bounded max-aggregation."""
    e0 = _cooc_edges(spark, sf_dir)
    n0 = e0.count()
    survivors = []
    for k in range(1, max_k + 1):
        e, _ = _peel(e0, k, KCORE_ROUNDS, prev_count=n0)
        survivors.append(
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .distinct()
            .withColumn("k", F.lit(k))
        )
    allk = survivors[0]
    for s in survivors[1:]:
        allk = allk.unionAll(s)
    return allk.groupBy("v").agg(F.max("k").cast("int").alias("core_number"))


HITS_UNIT = 1_000_000  # integer score units; max-normalized each half-step


def hits_scores(spark: SparkSession, sf_dir: str, iters: int = 3) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the issue-link
    graph — the second classic link-analysis fixpoint next to
    pagerank_links: authority(v) = Σ hub(u) over in-edges, hub(u) =
    Σ authority(v) over out-edges, max-normalized each half-step.
    On a curation corpus the same shape ranks crawl pages: authorities
    are heavily-referenced canonical docs, hubs are link farms/indexes.

    CROSS-ENGINE DETERMINISM (the pagerank_links discipline, upgraded
    to 64-bit integer arithmetic): scores live in HITS_UNIT integer
    units; the per-half-step normalization is an INTEGER division
    (Spark `div` == DuckDB `//`) of raw*UNIT by the max raw score, so
    every value every round is an exact integer on both engines —
    raw ≤ N·UNIT ≈ 1.5e12 at sf1 and raw*UNIT ≤ 1.5e18 stays inside
    int64. The DuckDB oracle unrolls the same rounds as stacked CTEs.

    100 TB shape: per half-step one key join (scores → edges) + one
    map-side-partial integer aggregation + one max() broadcast —
    identical shuffle structure to pagerank; nodes/edges/degrees are
    computed once and reused."""
    from jira_cdc_git_spark import fixtures as FX
    from jira_cdc_git_spark.operators.jira import link_edges

    nodes = materialize_lazy(
        FX.issues_flat(spark, sf_dir).select("key")
    )
    edges = materialize_lazy(
        link_edges(spark, sf_dir)
        .select("src_key", "dst_key")
        .join(
            nodes.select(F.col("key").alias("dst_key")), "dst_key", "left_semi"
        )
    )
    unit = F.lit(HITS_UNIT).cast("long")
    h = nodes.select("key", unit.alias("h"))

    def _half_step(scores: DataFrame, join_on: str, out_key: str, col: str) -> DataFrame:
        """One HITS half-step: push `scores[col]` across edges onto
        `out_key`, then max-normalize back to integer UNIT scale.

        `raw` is MATERIALIZED before fan-out (r7 verdict task 7): it
        feeds both the 1-row max and the nodes join, and without the
        cut each consumer re-evaluates the entire half-step lineage —
        doubling per half-step, ~2^k across k chained half-steps. The
        materialized frame is |touched nodes|-bounded, so the cut is
        cheap at any scale (sf0.1: 9.8 s -> ~5 s)."""
        raw = materialize_lazy(
            edges.join(scores, edges[join_on] == scores.key)
            .groupBy(F.col(out_key).alias("key"))
            .agg(F.sum(col).alias("raw"))
        )
        mx = raw.agg(F.max("raw").alias("mx"))
        # Only keys with a nonzero raw score flow to the next half-step:
        # zero-score nodes add nothing to the next join's sums and the
        # max is unaffected, so trimming them here (instead of a
        # |nodes| left-join per half-step) is value-identical — the
        # final projection re-adds absent nodes as 0.
        return raw.crossJoin(F.broadcast(mx)).select(
            "key",
            F.when(
                F.col("mx") > 0,
                F.expr(f"raw * {HITS_UNIT}L div mx"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias(col),
        )

    a = None
    for i in range(iters):
        a = _half_step(h.withColumnRenamed("h", "s"), "src_key", "dst_key", "s")
        a = a.withColumnRenamed("s", "a")
        h = _half_step(a.withColumnRenamed("a", "s"), "dst_key", "src_key", "s")
        h = h.withColumnRenamed("s", "h")
        # no periodic h/a materialization needed: each half-step's raw
        # cut already truncates the lineage
    return (
        nodes.join(h, "key", "left")
        .join(a, "key", "left")
        .select(
            "key",
            (F.coalesce("h", F.lit(0)) / F.lit(float(HITS_UNIT))).alias(
                "hub"
            ),
            (F.coalesce("a", F.lit(0)) / F.lit(float(HITS_UNIT))).alias(
                "authority"
            ),
        )
    )


#: top-k size for the link-prediction candidate board.
LINKPRED_K = 50

#: hub-degree cap for wedge enumeration in link_prediction_scores:
#: shared neighbors with degree > cap are dropped before the self-join
#: (mirrored by the oracle). Wedge work is sum(deg^2) over shared
#: neighbors — one 10k-link mega-epic alone yields 10^8 wedge rows from
#: a single join key. High-degree wedges carry ~zero Adamic-Adar weight
#: (1/ln d), so dropping them is standard in link prediction; the
#: containment_pairs DF-cap / user_coactivity bucket-cap discipline.
LINKPRED_HUB_CAP = 256
#: Adamic-Adar integer units — per-edge 1/ln(deg) is a fixed-shape IEEE
#: expression, floored to micro-units BEFORE the order-dependent SUM so
#: the aggregation adds exact integers on both engines (the pagerank
#: nano-unit discipline).
AA_UNIT = 1_000_000


def _undirected_link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected (u < v) issue-link edges among EXISTING
    issues — the shared vertex/edge base for the structural graph ops
    (link prediction, components, degree distribution). Mirrors the
    pagerank/hits node filter: an edge whose target was never synced is
    a broken link (J2), not graph structure."""
    from jira_cdc_git_spark import fixtures as FX
    from jira_cdc_git_spark.operators.jira import link_edges

    # issues_flat carries exactly one row per issue key (key embeds the
    # generating order key), so no distinct is needed on the node frame
    # (r12: the distinct was an Exchange + two HashAggregates in every
    # graph query)
    nodes = FX.issues_flat(spark, sf_dir).select("key")
    e = (
        link_edges(spark, sf_dir)
        .select("src_key", "dst_key")
        .join(nodes.select(F.col("key").alias("dst_key")), "dst_key", "left_semi")
        .select(
            F.least("src_key", "dst_key").alias("u"),
            F.greatest("src_key", "dst_key").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return e


def link_prediction_scores(
    spark: SparkSession, sf_dir: str, k: int = LINKPRED_K
) -> DataFrame:
    """Link prediction over the issue graph: for every NON-adjacent pair
    sharing >= 1 neighbor, the three classic neighborhood scores —
    common-neighbor count, Jaccard overlap, Adamic-Adar (Liben-Nowell &
    Kleinberg 2003) — top-k by common-neighbor count. On a Jira corpus
    this surfaces "issues that should probably be linked"; the identical
    shape powers related-document suggestions on a crawl corpus.

    CROSS-ENGINE DETERMINISM: Adamic-Adar terms floor to AA_UNIT integer
    units per wedge before summing (integer sum is order-independent);
    Jaccard is round_half_up over a single per-pair IEEE division of
    exact integers (F.round vs DuckDB round disagree one ulp from .5).
    Top-k ties break on the (u, v) key pair, so LIMIT content is unique.

    100 TB shape: one self-join of the adjacency list on the shared
    neighbor (the wedge enumeration also used by token_triangles) —
    work is sum(deg^2) over shared neighbors, so hubs above
    LINKPRED_HUB_CAP are dropped BEFORE the join (mirrored by the
    oracle; high-degree wedges carry ~zero 1/ln(d) Adamic-Adar weight,
    the user_coactivity_pairs bucket-cap discipline) — then an
    anti-join against the edge set, one partial-agg groupBy(pair),
    and a TakeOrderedAndProject for the k rows."""
    e = materialize_lazy(_undirected_link_edges(spark, sf_dir))
    nbrs = materialize_lazy(
        e.select(F.col("u").alias("n"), F.col("v").alias("x")).unionAll(
            e.select(F.col("v").alias("n"), F.col("u").alias("x"))
        )
    )
    deg = nbrs.groupBy(F.col("n").alias("x")).agg(F.count("*").alias("d"))
    # Hub cap: only wedges whose SHARED neighbor n has degree <= cap are
    # enumerated. The hub set (degree > cap) is tiny by construction —
    # broadcast anti-join, no shuffle of the adjacency list.
    hubs = deg.filter(F.col("d") > LINKPRED_HUB_CAP).select(
        F.col("x").alias("n")
    )
    nbrs_capped = nbrs.join(F.broadcast(hubs), "n", "left_anti")
    # Endpoint degrees da/db come from the CAPPED adjacency, so jaccard
    # is self-consistent — |capped shared| / |capped union| — rather
    # than a capped numerator over an uncapped denominator (r7 ADVICE:
    # a capped hub that was a shared neighbor silently shifted the
    # column's semantics). With cap headroom (the fixture) this equals
    # the exact Jaccard. Adamic-Adar keeps the TRUE shared-neighbor
    # degree dn — down-weighting hubs is the point of 1/ln(d).
    deg_c = nbrs_capped.groupBy(F.col("x")).agg(F.count("*").alias("d"))
    nd = materialize(nbrs_capped.join(deg_c, "x").select("n", "x", "d"))
    a = nd.select(F.col("n"), F.col("x").alias("a"), F.col("d").alias("da"))
    b = nd.select(
        F.col("n").alias("n2"), F.col("x").alias("b"), F.col("d").alias("db")
    )
    wedges = (
        a.join(b, (a.n == b.n2) & (a.a < b.b))
        .join(deg.select(F.col("x").alias("n"), F.col("d").alias("dn")), "n")
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            "da",
            "db",
            F.floor(F.lit(float(AA_UNIT)) / F.log(F.col("dn").cast("double")))
            .cast("long")
            .alias("aa_u"),
        )
    )
    scored = (
        wedges.join(e, ["u", "v"], "left_anti")
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.first("da").alias("da"),
            F.first("db").alias("db"),
            F.sum("aa_u").alias("aa_units"),
        )
        .select(
            "u",
            "v",
            "common_neighbors",
            _rhu(
                F.col("common_neighbors")
                / (F.col("da") + F.col("db") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
            (F.col("aa_units") / F.lit(float(AA_UNIT))).alias("adamic_adar"),
        )
    )
    return scored.orderBy(
        F.desc("common_neighbors"), F.asc("u"), F.asc("v")
    ).limit(k)


#: Key-block width for the link_components contraction pre-pass: issue
#: keys inside the same (project, ⌊num/width⌋) block union-find locally
#: before the star loop. Per-block memory is O(width) driver-free Python
#: state inside one Arrow batch — 65536 nodes is a few MB, safe at any
#: corpus scale; the sf0.1 graph has ~142k nodes so most projects fit in
#: one or two blocks.
CONTRACT_BLOCK = 65536


def _contract_link_edges(
    spark: SparkSession, edges: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Block-local union-find contraction — the 'local aggregation'
    optimization of the MapReduce CC literature (Kiveris et al. 2014 §6;
    Slota et al.'s Multistep takes the same shape): edges whose BOTH
    endpoints share a key block (same project, same ⌊num/CONTRACT_BLOCK⌋
    range; non-numeric keys hash into 4096 bounded buckets) collapse to
    their block-local component root (the lexicographic-MIN member,
    matching the star loop's label choice) in ONE Arrow-batched
    applyInPandas pass; only boundary edges (different blocks),
    rewritten onto the roots, survive into the global loop. Sound
    because a block-local merge only unions nodes that genuinely share
    a component, so the fixpoint over the contracted graph equals the
    fixpoint over the original.

    WHY: the issue-link graph is key-local chains (PROJ-100↔PROJ-102…),
    the adversarial deep-path topology for star algorithms — the plain
    two-phase star loop needed 15-16 live rounds at sf0.1 (32.5 s, 11%
    of the whole headline bench; r8 verdict task 5). Local contraction
    absorbs the chain interiors in one linear pass, leaving a boundary
    graph of a couple nodes per (project, block) that the star loop
    finishes in a handful of rounds.

    Returns (mapping(node, root) covering EVERY node, canonical
    boundary edges over roots). Determinism: the mapping is a pure
    function of the edge SET (union always attaches the larger root
    under the smaller), independent of batch order or partitioning."""
    key_re = r"^(.*)-([0-9]+)$"
    proj = F.regexp_extract(F.col("_k"), key_re, 1)
    num = F.regexp_extract(F.col("_k"), key_re, 2)
    blk = F.when(
        num != "",
        F.concat(
            proj,
            F.lit("#"),
            F.floor(num.cast("long") / CONTRACT_BLOCK).cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("~h"), (F.abs(F.xxhash64(F.col("_k"))) % 4096).cast("string")
        )
    )

    eb = (
        edges.withColumn("_k", F.col("u"))
        .withColumn("_bu", blk)
        .withColumn("_k", F.col("v"))
        .withColumn("_bv", blk)
        .drop("_k")
    )
    intra = eb.filter(F.col("_bu") == F.col("_bv")).select(
        F.col("_bu").alias("block"), "u", "v"
    )
    inter = eb.filter(F.col("_bu") != F.col("_bv")).select("u", "v")

    m_intra = materialize_lazy(
        intra.groupBy("block").applyInPandas(
            lambda pdf: _unionfind_pdf(pdf), "node string, root string"
        )
    )
    # mapping = union-find roots ∪ self-roots for the nodes that only
    # appear on inter-block edges. The r12 shape: the complement is an
    # anti-join of the (small) distinct inter-node set against m_intra,
    # instead of a distinct over the FULL edge node set + left join —
    # one corpus-scale distinct shuffle saved; values identical (every
    # intra-edge node is in m_intra by construction).
    inter_nodes = (
        inter.select(F.col("u").alias("node"))
        .unionByName(inter.select(F.col("v").alias("node")))
        .distinct()
    )
    mapping = m_intra.unionByName(
        inter_nodes.join(m_intra, "node", "left_anti").select(
            "node", F.col("node").alias("root")
        )
    )
    # boundary roots come straight off m_intra (left join + coalesce:
    # an inter-only endpoint is its own root) — the joins run against
    # the smaller union-find output instead of the full mapping, and
    # the mapping itself no longer needs its own materialize boundary
    # (its one consumer is the caller's final label join).
    ru = m_intra.select(
        F.col("node").alias("u"), F.col("root").alias("_ru")
    )
    rv = m_intra.select(
        F.col("node").alias("v"), F.col("root").alias("_rv")
    )
    boundary = materialize_lazy(
        inter.join(ru, "u", "left")
        .join(rv, "v", "left")
        .select(
            F.coalesce("_ru", "u").alias("ru"),
            F.coalesce("_rv", "v").alias("rv"),
        )
        .select(
            F.least("ru", "rv").alias("u"),
            F.greatest("ru", "rv").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return mapping, boundary


def link_components(
    spark: SparkSession, sf_dir: str, local_finish_cap: int = LOCAL_FINISH_CAP
) -> DataFrame:
    """Weakly-connected components over the issue-link graph: every
    linked issue labeled with its component id (= min issue key in the
    component) plus the component size — the global structure view that
    tells a reference user which issue clusters travel together in a
    sync (and, on a doc corpus, which near-dup families exist beyond
    pairwise LSH hits). Exact whole-graph CC: a block-local union-find
    contraction pass (see _contract_link_edges) absorbs the key-local
    chain interiors, then the proven two-phase star loop
    (connected_components) labels the boundary graph; labels compose
    back through the contraction mapping. The oracle unrolls the star
    rounds alone — valid because extra rounds past convergence are
    no-ops and BOTH engines converge to the same true fixpoint.

    100 TB shape: one Arrow-batched union-find pass over block-grouped
    edges (per-block memory bounded by CONTRACT_BLOCK), then star
    rounds over the ~|blocks|-sized boundary graph; the final label
    join is one broadcast-sized map-back."""
    e = materialize_lazy(_undirected_link_edges(spark, sf_dir))
    # local_finish_cap is a test seam (r12 advice): cap=0 forces the
    # contraction branch at fixture scale so the mapping∘boundary-cc
    # composition keeps an end-to-end label-equality test.
    if e.count() <= local_finish_cap:
        # The whole canonical edge set fits one union-find task: the
        # contraction pre-pass (block split + per-block union-find +
        # boundary rewrite — ~6 stages and 2 more materialize
        # boundaries) would only shrink a graph that already fits, so
        # hand it straight to cc's local finish (r12; the same
        # "finish locally once it fits" rule applied one level up).
        # e is canonical + materialized, so the re-canonicalize pass
        # is skipped too. Above the cap — the 100 TB path — the
        # contraction runs unchanged.
        labeled = materialize_lazy(
            connected_components(
                e, a_col="u", b_col="v", assume_canonical=True
            )
        )
    else:
        mapping, boundary = _contract_link_edges(spark, e)
        # boundary is canonical (least/greatest, u != v, distinct) and
        # materialized by _contract_link_edges — skip cc's
        # re-canonicalize (one full distinct shuffle saved)
        cc = connected_components(
            boundary, a_col="u", b_col="v", assume_canonical=True
        )
        # compose: node -> local root -> global component. Roots absent
        # from the boundary graph (fully interior blocks) are their own
        # component. Materialized (lazily): labeled feeds BOTH the
        # sizes aggregation and the final join — uncut, the whole label
        # subtree (mapping join + the boundary union-find) executed
        # once per side (r12 plan audit: two FlatMapGroupsInPandas
        # copies in the final job).
        root_comp = cc.withColumnRenamed("node", "root")
        labeled = materialize_lazy(
            mapping.join(root_comp, "root", "left")
            .select(
                F.col("node"),
                F.coalesce("component", "root").alias("component"),
            )
        )
    sizes = labeled.groupBy("component").agg(
        F.count("*").cast("long").alias("component_size")
    )
    return labeled.join(sizes, "component").select(
        F.col("node").alias("key"), "component", "component_size"
    )


def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the undirected issue-link graph: degree →
    node count + fraction — the first thing to look at before choosing
    a partitioning for any graph workload (a heavy tail means salting /
    hub-splitting; a flat histogram means plain hash partitioning is
    fine). Complements key_skew_report (which profiles JOIN keys) with
    the graph-native view.

    100 TB shape: two partial-agg aggregations (node degree, then
    histogram) — no joins, no windows over the full frame."""
    # e feeds both union legs and deg feeds both the total and the
    # histogram — uncut, the link parse + semi-join lineage executed up
    # to 4× inside one query (r12); two lazy cuts compute each once
    e = materialize_lazy(_undirected_link_edges(spark, sf_dir))
    deg = materialize_lazy(
        e.select(F.col("u").alias("key"))
        .unionAll(e.select(F.col("v").alias("key")))
        .groupBy("key")
        .agg(F.count("*").alias("degree"))
    )
    n = deg.agg(F.count("*").cast("double").alias("n_total"))
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("degree").cast("int").alias("degree"),
            "n_nodes",
            _rhu(F.col("n_nodes") / F.col("n_total"), 6).alias("frac"),
        )
    )


#: textrank top-k and iteration budget (mirrored by the oracle).
TEXTRANK_K = 25
TEXTRANK_ITERS = 3


def textrank_keywords(
    spark: SparkSession, sf_dir: str, k: int = TEXTRANK_K,
    iters: int = TEXTRANK_ITERS, alpha: float = 0.85,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the undirected token co-occurrence graph (the shared _cooc_edges
    base of token_triangles / clustering_coefficient), top-k tokens by
    rank. The unsupervised keyword ranker a curation pipeline runs next
    to chi2_keywords (which needs labels) and pmi_topk (pairwise only).

    CROSS-ENGINE DETERMINISM: the pagerank_links integer nano-unit
    discipline — per-edge contributions floor-divide before the exact
    integer SUM; the oracle unrolls the same iterations as stacked CTEs.
    Top-k ties break on the token itself.

    100 TB shape: identical per-iteration structure to pagerank_links
    (one key join + one partial-agg integer sum + a nodes left-join)
    over a vocabulary-bounded graph; the final top-k is
    TakeOrderedAndProject."""
    und = materialize(_cooc_edges(spark, sf_dir))
    edges = materialize(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
    )
    nodes = materialize(edges.select(F.col("src").alias("tok")).distinct())
    deg = materialize(edges.groupBy("src").agg(F.count("*").alias("d")))
    n1 = nodes.agg(F.count("*").cast("double").alias("n"))
    unit = 1_000_000_000.0
    pr = nodes.crossJoin(F.broadcast(n1)).select(
        "tok",
        F.floor(F.lit(unit) / F.col("n") + 0.5).cast("double").alias("pr_u"),
    )
    for i in range(iters):
        contrib = (
            edges.join(pr, edges.src == pr.tok)
            .join(deg, "src")
            .select(
                F.col("dst").alias("tok"),
                F.floor(F.col("pr_u") / F.col("d")).alias("c"),
            )
            .groupBy("tok")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        pr = (
            nodes.join(contrib, "tok", "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "tok",
                F.floor(
                    (1 - alpha) * unit / F.col("n")
                    + alpha * F.coalesce(F.col("s"), F.lit(0.0))
                    + 0.5
                )
                .cast("double")
                .alias("pr_u"),
            )
        )
        if (i + 1) % 4 == 0 and (i + 1) < iters:
            pr = materialize(pr)
    return (
        pr.select("tok", (F.col("pr_u") / unit).alias("textrank"))
        .orderBy(F.desc("textrank"), F.asc("tok"))
        .limit(k)
    )


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the issue-link graph: the
    Pearson correlation of endpoint degrees over all directed edge
    orientations — one row. Positive r = hubs link hubs (social-network
    shape); negative = hub-and-spoke (epic trees, and most crawl
    graphs). The single number that says whether hub-splitting or plain
    hash partitioning is the right layout for the graph ops above.

    CROSS-ENGINE DETERMINISM: every moment (sum of degree products) is
    an exact integer sum; the final correlation is one fixed-shape
    expression over those integers.

    100 TB shape: degree agg + two key joins + a 1-row moment rollup —
    no windows, no iteration."""
    # MATERIALIZED: the doubled-orientation union references e twice and
    # deg folds from that union again — unmaterialized, the link_edges
    # parse/explode lineage re-executes once per branch in one plan
    e = materialize(_undirected_link_edges(spark, sf_dir))
    both = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = both.groupBy(F.col("x").alias("n")).agg(F.count("*").alias("d"))
    dj = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    dk = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    pairs = both.join(dj, "x").join(dk, "y")
    m = pairs.agg(
        F.count("*").alias("m"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    # moments multiply in decimal(38,0): m*sxy overflows int64 once
    # degrees reach hub scale (DuckDB's HUGEINT is exact; this is the
    # Spark-side equivalent), then one double conversion at the end
    def _d(c: str):
        return F.col(c).cast("decimal(38,0)")

    num = (_d("m") * _d("sxy") - _d("sx") * _d("sy")).cast("double")
    den = F.sqrt(
        (_d("m") * _d("sxx") - _d("sx") * _d("sx")).cast("double")
        * (_d("m") * _d("syy") - _d("sy") * _d("sy")).cast("double")
    )
    from jira_cdc_git_spark.functions.text import round_half_up as TX_round

    return m.select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        TX_round(num / den, 6).alias("assortativity"),
    )


def cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster-size distribution: how many LSH components
    have 2, 3, ... members — the shape that decides dedup strategy
    (a long tail of giant clusters means boilerplate/template storms
    that per-pair dedup will thrash on; SemDeDup-style cluster caps
    exist for exactly that tail).

    100 TB shape: inherits neardup_clusters' banded-LSH + star-CC cost;
    the histogram itself is two vocab-bounded aggregations."""
    cc = neardup_clusters(spark, sf_dir)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("size"))
    return sizes.groupBy(F.col("size").cast("int").alias("cluster_size")).agg(
        F.count("*").cast("long").alias("n_clusters")
    )


#: personalized-pagerank iteration budget (mirrored by the oracle unroll)
PPR_ITERS = 3


def personalized_pagerank(
    spark: SparkSession,
    sf_dir: str,
    iters: int = PPR_ITERS,
    alpha: float = 0.85,
) -> DataFrame:
    """Personalized PageRank: the teleport mass restarts at the SEED set
    (epic issues) instead of uniformly — the standard related-content /
    recommendation ranker (scores = proximity to the seeds through the
    link graph). Same engine as pagerank_links, different base vector:
    base(v) = (1-a)·unit/|S| for v ∈ S, else 0.

    CROSS-ENGINE DETERMINISM: the pagerank_links integer nano-unit
    discipline — per-edge contributions floor-divide before the exact
    integer SUM; the oracle unrolls the same iterations as stacked CTEs.
    Zero-score nodes are filtered (score > 0) so the result is the
    reachable-from-seeds set, which also keeps the output small.

    100 TB shape: identical to pagerank_links — per iteration one
    src-key join, one exact-integer partial-agg by dst, a nodes-left
    join; seed base is a broadcast-joined flag column."""
    from jira_cdc_git_spark import fixtures as FX
    from jira_cdc_git_spark.operators.jira import link_edges

    flat = FX.issues_flat(spark, sf_dir)
    nodes = materialize(flat.select("key"))
    seeds = flat.filter(F.col("issuetype") == "Epic").select("key")
    edges = materialize(
        link_edges(spark, sf_dir)
        .select("src_key", "dst_key")
        .join(
            nodes.select(F.col("key").alias("dst_key")), "dst_key", "left_semi"
        )
    )
    deg = materialize(edges.groupBy("src_key").agg(F.count("*").alias("d")))
    ns = seeds.agg(F.count("*").cast("double").alias("ns"))
    unit = 1_000_000_000.0
    base = (
        nodes.join(
            seeds.withColumn("is_seed", F.lit(True)), "key", "left"
        )
        .crossJoin(F.broadcast(ns))
        .select(
            "key",
            F.when(
                F.col("is_seed"),
                F.floor(F.lit(unit) / F.col("ns") + 0.5),
            )
            .otherwise(F.lit(0))
            .cast("double")
            .alias("base_u"),
        )
        .transform(materialize)
    )
    pr = base.select("key", F.col("base_u").alias("pr_u"))
    for i in range(iters):
        contrib = (
            edges.join(pr, edges.src_key == pr.key)
            .join(deg, "src_key")
            .select(
                F.col("dst_key").alias("key"),
                F.floor(F.col("pr_u") / F.col("d")).alias("c"),
            )
            .groupBy("key")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        pr = base.join(contrib, "key", "left").select(
            "key",
            F.floor(
                (1 - alpha) * F.col("base_u")
                + alpha * F.coalesce(F.col("s"), F.lit(0.0))
                + 0.5
            )
            .cast("double")
            .alias("pr_u"),
        )
        if (i + 1) % 4 == 0 and (i + 1) < iters:
            pr = materialize(pr)
    return pr.filter(F.col("pr_u") > 0).select(
        "key", (F.col("pr_u") / unit).alias("ppr")
    )


def link_reciprocity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph reciprocity over the issue-link graph: the
    fraction of distinct directed edges whose reverse edge also exists
    ("A blocks B" answered by "B clones A", etc.). The classic directed
    health metric next to degree_distribution / graph_assortativity —
    on a citation or hyperlink corpus it separates mutual-reference
    communities from one-way broadcast structure. Single-row report.

    100 TB shape: one distinct over the edge projection, one self-join
    on the reversed key pair (equi-join, shuffle on the pair), two
    scalar counts.

    CROSS-ENGINE DETERMINISM: integer counts + one IEEE division."""
    from jira_cdc_git_spark import fixtures as FX
    from jira_cdc_git_spark.operators.jira import link_edges

    nodes = FX.issues_flat(spark, sf_dir).select("key")
    e = (
        link_edges(spark, sf_dir)
        .select("src_key", "dst_key")
        .join(
            nodes.select(F.col("key").alias("dst_key")), "dst_key", "left_semi"
        )
        .filter(F.col("src_key") != F.col("dst_key"))
        .distinct()
        .transform(materialize)
    )
    rev = e.select(
        F.col("dst_key").alias("src_key"), F.col("src_key").alias("dst_key")
    )
    n_rec = e.join(rev, ["src_key", "dst_key"], "left_semi").agg(
        F.count("*").cast("long").alias("n_reciprocal")
    )
    n_all = e.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        n_all.crossJoin(F.broadcast(n_rec))
        .select(
            "n_edges",
            "n_reciprocal",
            _rhu(F.col("n_reciprocal") / F.col("n_edges"), 6).alias(
                "reciprocity"
            ),
        )
    )


def cluster_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivorship: per near-duplicate cluster
    (connected components over the LSH pair list, as neardup_clusters)
    keep the HIGHEST-quality member instead of the lowest doc_id —
    argmax quality_score, doc_id as the deterministic tie-break. This is
    the survivorship rule production dedup actually ships (SemDeDup /
    CCNet keep the best exemplar, not the first-crawled one): min-id
    retention silently prefers the OLDEST copy, which for boilerplate
    families is often the most degraded. One row per cluster: the
    canonical pick, its quality, and the member/drop counts.

    100 TB shape: clusters come from the bounded CC pass
    (connected_components' local-finish/star machinery); quality is a
    narrow per-doc projection joined on doc_id; the survivor pick is one
    max_by-shaped reduction per cluster (groupBy partial agg via struct
    max — no window over the corpus)."""
    from jira_cdc_git_spark.operators.text import (
        neardup_pairs_lsh,
        quality_score,
    )

    pairs = neardup_pairs_lsh(spark, sf_dir).transform(materialize)
    cc = connected_components(pairs)
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    members = cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).join(q, "doc_id")
    # argmax(quality), min doc_id on ties: struct max over
    # (quality, -doc_id) is an abelian partial-agg — map-side combinable,
    # unlike a row_number window that must co-locate whole clusters in
    # one sorted partition.
    pick = F.max(
        F.struct(F.col("quality"), (-F.col("doc_id")).alias("neg_id"))
    ).alias("best")
    return (
        members.groupBy("cluster_id")
        .agg(
            pick,
            F.count("*").cast("long").alias("n_members"),
        )
        .select(
            "cluster_id",
            (-F.col("best.neg_id")).cast("long").alias("kept_doc_id"),
            F.col("best.quality").alias("kept_quality"),
            "n_members",
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


def label_propagation_communities(
    spark: SparkSession, sf_dir: str, rounds: int = 4
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation over the
    undirected issue-link graph (Raghavan et al. 2007, made
    deterministic): every node starts as its own label; each round every
    node adopts the most frequent label among its neighbors (edge
    multiplicity weighs), breaking frequency ties by MINIMUM label;
    nodes with no neighbors keep their label. A fixed `rounds` budget
    (default 4) replaces the usual until-stable loop so the DuckDB
    oracle can replay the exact same unrolled rounds — the pagerank
    discipline applied to communities. Differs from connected
    components: LPA splits a weakly-bridged component into dense cores.

    100 TB shape: per round one src-key join (labels -> edges), one
    (node, label) partial-agg count, and ONE struct-min argmax
    reduction — min over (-count, label) is (max count, min label) in
    a single map-side-combinable agg (the r9 rewrite; the earlier
    two-step max-count-then-min-label form paid an extra agg + join
    per round). Every step is a keyed shuffle of edge- or node-scale
    data, no windows over the corpus; the label frame is materialized
    every SECOND round — a 2-round lineage stack stays shallow (the
    doubly-consumed label frame dedupes through exchange reuse inside
    one adaptive plan) while halving the checkpoint boundaries, each
    of which costs driver-scheduled stage-jobs (A/B at sf0.1, min of
    4 alternating reps: every-round 5.87 s, every-2nd 5.07 s, never
    6.12 s)."""
    from jira_cdc_git_spark import fixtures as FX
    from jira_cdc_git_spark.operators.jira import link_edges

    nodes = materialize_lazy(
        FX.issues_flat(spark, sf_dir).select("key")
    )
    directed = (
        link_edges(spark, sf_dir)
        .select("src_key", "dst_key")
        .join(
            nodes.select(F.col("key").alias("dst_key")), "dst_key", "left_semi"
        )
    )
    und = materialize_lazy(
        directed.select("src_key", "dst_key").unionAll(
            directed.select(
                F.col("dst_key").alias("src_key"),
                F.col("src_key").alias("dst_key"),
            )
        )
    )
    labels = nodes.select("key", F.col("key").alias("lab"))
    for _r in range(rounds):
        cnt = (
            und.join(labels, und.src_key == labels.key)
            .groupBy(F.col("dst_key").alias("node"), "lab")
            .agg(F.count("*").alias("c"))
        )
        # min over (-c, lab) = (max count, then MIN label) in one agg
        pick = (
            cnt.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("negc"), F.col("lab"))
                ).alias("b")
            )
            .select("node", F.col("b.lab").alias("new_lab"))
        )
        labels = labels.join(
            pick, labels.key == pick.node, "left"
        ).select(
            "key", F.coalesce("new_lab", "lab").alias("lab")
        )
        if (_r + 1) % 2 == 0 and (_r + 1) < rounds:
            labels = materialize_lazy(labels)
    return labels.select("key", F.col("lab").alias("community"))
