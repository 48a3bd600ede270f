"""Distributed graph operators.

``connected_components``: min-label propagation over an edge Dataset —
the at-scale alternative to the driver-side union-find used in the LSH
regime (where candidate pairs are assumed small). When a dedup run
produces more pairs than a driver should hold, components come from
this: every iteration is two bucket-shuffled reduces (propagate min
label across edges, then fold per node), converging in O(graph
diameter) rounds; no node list, edge list, or label map ever
materializes on the driver (only the per-iteration change count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raydoc.functions._collect import collect_table
from raydoc.functions.agg import partial_groupby


def _min_by_node(ds: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """(node, label) → per-node min label: batch-local combiner, then a
    coarse-bucket shuffle reduce (never one group per node)."""
    import pandas as pd
    mask = num_buckets - 1

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["node"]).aggregate([("label", "min")])
        g = g.rename_columns(["node", "label"])
        return g.append_column(
            "bucket", pc.cast(pc.bit_wise_and(g["node"], mask), pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False)["label"].min().reset_index()
        return out[["node", "label"]]

    return (ds.map_batches(combine, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))


def connected_components(edges: rd.Dataset, num_buckets: int = 64,
                         max_iters: int = 50) -> rd.Dataset:
    """(node, label) for every node appearing in ``edges`` (columns a, b);
    label = the component's minimum node id.

    Min-label propagation: labels start as each node's own id; every
    round each node takes the min of its label and its neighbors'
    labels (one bucket join shaped as a symmetric edge map + per-node
    min fold). Terminates when a round changes nothing — O(diameter)
    rounds, two small shuffles each; only the scalar change count
    reaches the driver. ``max_iters`` guards pathological chains (raise
    for deliberately long path graphs)."""

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["a"].combine_chunks(),
                                      t["b"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["b"].combine_chunks(),
                                     t["a"].combine_chunks()]),
        })

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def self_label(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["node"]})

    labels = _min_by_node(
        sym_edges.map_batches(self_label, batch_format="pyarrow"),
        num_buckets).materialize()

    from raydoc.functions.joins import bucket_hash_join

    for _ in range(max_iters):
        # (1) propagate: every edge (node -> nbr) offers label(node) to nbr
        offered = bucket_hash_join(
            sym_edges, labels.map_batches(
                lambda t: pa.table({"node": t["node"],
                                    "offered": t["label"]}),
                batch_format="pyarrow"),
            key="node", num_buckets=num_buckets)

        def to_candidates(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["nbr"], "label": t["offered"]})

        candidates = offered.map_batches(to_candidates,
                                         batch_format="pyarrow")
        propagated = _min_by_node(candidates.union(labels), num_buckets)

        # (2) pointer jump: label <- label(label). Labels hold the
        # invariant label(x) <= x, so the jump only ever shrinks; it
        # halves chain depth each round -> O(log diameter) rounds
        # instead of O(diameter) for pure neighbor propagation.
        jumped = bucket_hash_join(
            propagated.map_batches(
                lambda t: pa.table({"node": t["node"], "via": t["label"]}),
                batch_format="pyarrow"),
            propagated.map_batches(
                lambda t: pa.table({"via": t["node"], "root": t["label"]}),
                batch_format="pyarrow"),
            key="via", num_buckets=num_buckets)
        # repartition caps the per-round block count: every sort shuffle
        # emits as many blocks as it consumes and the union sums both
        # sides, so without this the block count DOUBLES per round
        # (measured: 3 -> 853 blocks in 5 rounds for a 21-row table)
        new_labels = jumped.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["root"]}),
            batch_format="pyarrow").repartition(
            min(num_buckets, 16)).materialize()

        # (3) convergence: did any node's label change this round?
        check = bucket_hash_join(
            labels.map_batches(
                lambda t: pa.table({"node": t["node"], "old": t["label"]}),
                batch_format="pyarrow"),
            new_labels.map_batches(
                lambda t: pa.table({"node": t["node"], "new": t["label"]}),
                batch_format="pyarrow"),
            key="node", num_buckets=num_buckets)
        changed = check.map_batches(
            lambda t: pa.table({"c": pa.array(
                [pc.sum(pc.cast(pc.not_equal(t["old"], t["new"]),
                                pa.int64())).as_py() or 0], pa.int64())}),
            batch_format="pyarrow").sum("c")
        labels = new_labels
        if not changed:
            return labels
    raise RuntimeError(f"connected_components did not converge within "
                       f"{max_iters} iterations — raise max_iters")


def pagerank(edges: rd.Dataset, n_iter: int = 5,
             scale: int = 10 ** 12, damping_pct: int = 85,
             num_buckets: int = 64,
             ranks_in: str = "dataset") -> rd.Dataset:
    """(node, rank_fp): fixed-iteration PageRank in INTEGER fixed-point
    arithmetic — every quantity is an int64 multiple of 1/``scale``, so
    per-node contribution sums are order-independent and the result is
    bit-identical across runs, cluster sizes, and the DuckDB SQL twin
    (float PageRank can never hash-match a SQL oracle; fixed-point can).

    Update rule (all ``//`` floor divisions):
        base      = ((100-damping_pct) * (scale // n)) // 100
        r'[v]     = base + (damping_pct * Σ_{(u→v)} r[u] // outdeg[u]) // 100

    Distribution per iteration: one bucket hash join (edges ⋈ ranks on
    src), a combiner groupby summing contributions per dst, and a left
    join back onto the node list (sinks keep base rank). Ranks live as a
    Dataset throughout — no rank vector on the driver (the k-means
    broadcast pattern would cap n at driver memory; this one doesn't).
    Each round ends with repartition+materialize to cap lineage and block
    growth (see connected_components). Dangling nodes (outdeg 0) receive
    rank but contribute none in BOTH modes — their mass leaks each round
    (no dangling redistribution); add self-loops to conserve it.

    ``ranks_in`` picks where the rank vector lives: ``"dataset"`` (default)
    keeps it distributed — three exchanges per round, no driver state, the
    web-scale path; ``"broadcast"`` holds the O(nodes) rank map on the
    driver/object store and runs ZERO sort shuffles — per-batch grouped
    partials tree-fold in workers (the HLL/CMS fold shape) and only the
    already-reduced node-sized fold output reaches the driver. ~10× less
    per-round latency; correct whenever node count ≪ edge count
    (bit-identical outputs; both modes tested against each other)."""
    if ranks_in == "broadcast":
        return _pagerank_broadcast(edges, n_iter, scale, damping_pct)
    if ranks_in != "dataset":
        raise ValueError(f"ranks_in must be 'dataset' or 'broadcast', "
                         f"got {ranks_in!r}")

    from raydoc.functions.joins import bucket_hash_join

    def to_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()])})

    from raydoc.functions.agg import partial_groupby
    nodes = partial_groupby(
        edges.map_batches(to_nodes, batch_format="pyarrow"),
        ["node"], {"__n": ("node", "count")}).select_columns(
        ["node"]).materialize()
    n = nodes.count()

    outdeg = partial_groupby(edges, ["src"],
                             {"outdeg": ("src", "count")})
    edges_deg = bucket_hash_join(edges, outdeg, key="src",
                                 num_buckets=num_buckets) \
        .repartition(min(num_buckets, 16)).materialize()

    init = scale // n
    base = ((100 - damping_pct) * init) // 100
    ranks = nodes.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "rank_fp": pa.array([init] * t.num_rows,
                                                pa.int64())}),
        batch_format="pyarrow").repartition(
        min(num_buckets, 16)).materialize()

    for _ in range(n_iter):
        offered = bucket_hash_join(
            edges_deg,
            ranks.map_batches(
                lambda t: pa.table({"src": t["node"], "r": t["rank_fp"]}),
                batch_format="pyarrow"),
            key="src", num_buckets=num_buckets)

        def contrib(t: pa.Table) -> pa.Table:
            import numpy as np
            r = t.column("r").to_numpy(zero_copy_only=False)
            d = t.column("outdeg").to_numpy(zero_copy_only=False)
            return pa.table({"node": t["dst"],
                             "c": pa.array(r // d, pa.int64())})

        sums = partial_groupby(
            offered.map_batches(contrib, batch_format="pyarrow"),
            ["node"], {"s": ("c", "sum")})
        joined = bucket_hash_join(nodes, sums, key="node",
                                  num_buckets=num_buckets, how="left")

        def update(t: pa.Table) -> pa.Table:
            s = pc.coalesce(t["s"], pa.scalar(0, pa.int64()))
            import numpy as np
            sv = s.to_numpy(zero_copy_only=False)
            newr = base + (damping_pct * sv) // 100
            return pa.table({"node": t["node"],
                             "rank_fp": pa.array(newr, pa.int64())})

        ranks = joined.map_batches(update, batch_format="pyarrow") \
            .repartition(min(num_buckets, 16)).materialize()
    return ranks


def _grouped_sum_fold(parts: rd.Dataset, key: str, col: str,
                      levels: int = 2) -> pa.Table:
    """Fold per-batch (key, partial-sum) tables in worker-side map levels
    — no sort shuffle, no barrier; the driver re-groups only the
    already-reduced fold output. Grouped twin of the HLL/CMS blob fold."""

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by([key]).aggregate([(col, "sum")])
        return g.rename_columns([key, col])

    for _ in range(levels):
        parts = parts.map_batches(fold, batch_format="pyarrow",
                                  batch_size=64 * 1024)
    t = collect_table(parts)
    return t.group_by([key]).aggregate([(col, "sum")]) \
            .rename_columns([key, col])


def _pagerank_broadcast(edges: rd.Dataset, n_iter: int, scale: int,
                        damping_pct: int) -> rd.Dataset:
    """Broadcast-ranks iteration: the (node → rank) and (node → outdeg)
    maps go through ``ray.put`` once per round; every edge batch computes
    and group-folds its contributions locally, fold levels reduce in
    workers, and only node-sized fold outputs touch the driver. ZERO sort
    shuffles end to end (vs 3 barriers/round in dataset mode).
    Bit-identical to the join mode — same integer update rule (asserted in
    tests). Driver/object-store cost is O(nodes) — the IVF-centroid
    regime — while the edge stream can be any size."""
    import ray as _ray

    edges_m = edges.materialize()          # re-streamed once per round

    # one pass: node set AND outdeg together (outdeg = #src occurrences;
    # outdeg >= 1 is the operator contract, so dst-only nodes still get
    # a node row via their is_src=0 entries)
    def node_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        both = pa.table({
            "node": pa.concat_arrays([t["src"].combine_chunks(),
                                      t["dst"].combine_chunks()]),
            "is_src": pa.concat_arrays([
                pa.array(np.ones(n, dtype=np.int64)),
                pa.array(np.zeros(n, dtype=np.int64))]),
        })
        g = both.group_by(["node"]).aggregate([("is_src", "sum")])
        return g.rename_columns(["node", "is_src"])

    deg_t = _grouped_sum_fold(
        edges_m.map_batches(node_partial, batch_format="pyarrow"),
        "node", "is_src")
    node_list = sorted(deg_t.column("node").to_pylist())
    deg = dict(zip(deg_t.column("node").to_pylist(),
                   deg_t.column("is_src").to_pylist()))
    # sink nodes (outdeg 0) never appear as src, so contrib never looks
    # them up: they receive rank but contribute none — the SAME semantics
    # as dataset mode's left join (rank mass leaks; callers wanting
    # conservation add self-loops, see the pagerank docstring)

    n = len(node_list)
    init = scale // n
    base = ((100 - damping_pct) * init) // 100
    ranks = {v: init for v in node_list}

    for _ in range(n_iter):
        state_ref = _ray.put((ranks, deg))

        def contrib(t: pa.Table) -> pa.Table:
            import pandas as pd
            r, d = _ray.get(state_ref)
            src = pd.Series(t.column("src").to_pylist())
            c = (src.map(r) // src.map(d)).astype("int64")
            g = pa.table({"node": t["dst"],
                          "c": pa.array(c.to_numpy(), pa.int64())}) \
                .group_by(["node"]).aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])

        sums = _grouped_sum_fold(
            edges_m.map_batches(contrib, batch_format="pyarrow"),
            "node", "c")
        got = dict(zip(sums.column("node").to_pylist(),
                       sums.column("c").to_pylist()))
        ranks = {v: base + (damping_pct * got.get(v, 0)) // 100
                 for v in node_list}

    out = pa.table({
        "node": pa.array(node_list, pa.string()),
        "rank_fp": pa.array([ranks[v] for v in node_list], pa.int64()),
    })
    return rd.from_arrow(out)


def user_type_pagerank(sf_dir: str, n_iter: int = 5) -> pa.Table:
    """PageRank over the bipartite user↔event-type interaction graph:
    nodes 'u:<user_id>' and 't:<event_type>', one edge per DISTINCT
    (user, type) pair in each direction (so outdeg ≥ 1 everywhere).
    Heavily-used event types and broadly-active users rank high — the
    graph-centrality operator with a bit-exact chained-CTE SQL oracle."""
    from raydoc.functions.agg import partial_groupby

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    pairs = partial_groupby(ev, ["user_id", "event_type"],
                            {"__n": ("user_id", "count")})

    def to_edges(t: pa.Table) -> pa.Table:
        u = pc.binary_join_element_wise(
            pa.array(["u:"] * t.num_rows, pa.string()),
            pc.cast(t["user_id"], pa.string()), "")
        ty = pc.binary_join_element_wise(
            pa.array(["t:"] * t.num_rows, pa.string()),
            t["event_type"], "")
        return pa.table({
            "src": pa.concat_arrays([u.combine_chunks(),
                                     ty.combine_chunks()]),
            "dst": pa.concat_arrays([ty.combine_chunks(),
                                     u.combine_chunks()]),
        })

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    # broadcast mode: the node set (users + types) is dimension-sized
    # next to the events stream, exactly the regime it exists for
    ranks = pagerank(edges, n_iter=n_iter, num_buckets=16,
                     ranks_in="broadcast")
    return collect_table(ranks).sort_by("node")


def _union_find_min_labels(edges: list) -> dict:
    """Driver union-find over a small edge list → {node: min-node-of-
    component}. Always roots at the lesser root, so every component's
    final root is its minimum node (the CC label convention)."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for e in edges for x in e}


def label_components(pairs: rd.Dataset,
                     max_driver_pairs: int = 50_000) -> dict:
    """{node: component-min label} for the NON-TRIVIAL components of an
    (a, b) edge Dataset — THE adaptive labeling policy, shared by
    ``neardup_components`` and ``similarity.semantic_clusters`` so the
    regime can't drift: an edge set small enough to be driver-resident
    labels in microseconds with union-find (running ~20 distributed
    barriers for a hundred edges measured 37-51 s at sf0.1 for a <1 ms
    problem); larger sets run the distributed min-label
    ``connected_components`` and only the label MAP collects — the edge
    rows themselves never land on the driver. Materialize ``pairs``
    upstream when the edge scan is expensive (count() and the labeling
    pass both consume it)."""
    n_pairs = pairs.count()
    if n_pairs == 0:
        return {}
    if n_pairs <= max_driver_pairs:
        t = collect_table(pairs)
        return _union_find_min_labels(
            list(zip(t.column("a").to_pylist(),
                     t.column("b").to_pylist())))
    nb = 16 if n_pairs < 1_000_000 else 256
    labels = collect_table(connected_components(pairs, num_buckets=nb))
    return dict(zip(labels.column("node").to_pylist(),
                    labels.column("label").to_pylist()))


def neardup_components(sf_dir: str,
                       max_driver_pairs: int = 50_000) -> pa.Table:
    """(doc_id, component) for every document: connected components over
    the SimHash near-dup pair graph (hamming ≤ 3), labels = min doc id;
    docs with no near-dup edge are their own singleton component. Full
    SQL oracle (recursive transitive-closure CTE).

    Adaptive regime: the pair table arrives DRIVER-RESIDENT (the LSH
    small-candidate-set contract), so below ``max_driver_pairs`` a
    microsecond union-find labels it — running ~20 distributed barriers
    for a hundred edges measured 37-51 s at sf0.1 for a <1 ms problem.
    Above the threshold (pair sets that shouldn't be on a driver at all)
    it switches to the distributed min-label/pointer-jumping
    ``connected_components`` — identical labels (both converge to the
    component minimum; equality asserted in tests/test_graph.py)."""
    from raydoc.functions.dedup import simhash_neardups

    pairs = simhash_neardups(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    if pairs.num_rows == 0:
        t = collect_table(docs).sort_by("doc_id")
        return pa.table({"doc_id": t["doc_id"],
                         "component": t["doc_id"]})
    if pairs.num_rows <= max_driver_pairs:
        lab = _union_find_min_labels(
            list(zip(pairs.column("a").to_pylist(),
                     pairs.column("b").to_pylist())))
    else:
        # shared policy; 100 TB callers tune via connected_components
        lab = label_components(rd.from_arrow(pairs.select(["a", "b"])),
                               max_driver_pairs=max_driver_pairs)

    import ray
    lab_ref = ray.put(lab)

    def tag(t: pa.Table) -> pa.Table:
        m = ray.get(lab_ref)
        ids = t.column("doc_id").to_pylist()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "component": pa.array([m.get(i, i) for i in ids],
                                               pa.int64())})

    return collect_table(docs.map_batches(
        tag, batch_format="pyarrow")).sort_by("doc_id")


def triangle_count(edges: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """(a, b, c) with a<b<c: every triangle in an undirected edge set given
    as (a, b) rows with a<b — the graph-mining classic, as two bucketed
    exchanges: (1) wedge build, joining edges on the shared middle vertex
    (the a<b orientation means each triangle is built exactly once, as
    a<mid<c); (2) closure check, a semi-join of wedge (a, c) endpoints
    against the edge set on a fused composite key. No adjacency structure
    is ever collected; skew = high-degree vertices concentrates wedges —
    at web scale cap degree or salt the mid key."""
    from raydoc.functions.joins import bucket_hash_join, bucket_semi_join

    e1 = edges.map_batches(
        lambda t: pa.table({"a": t["a"], "mid": t["b"]}),
        batch_format="pyarrow")
    e2 = edges.map_batches(
        lambda t: pa.table({"mid": t["a"], "c": t["b"]}),
        batch_format="pyarrow")
    wedges = bucket_hash_join(e1, e2, key="mid", num_buckets=num_buckets)

    def fuse(col_a, col_c):
        # length-prefix the first part: "|" inside a STRING vertex id
        # would otherwise make ("1|2","3") collide with ("1","2|3")
        a = pc.cast(col_a, pa.string())
        c = pc.cast(col_c, pa.string())
        alen = pc.cast(pc.binary_length(a), pa.string())
        return pc.binary_join_element_wise(
            alen, pc.binary_join_element_wise(a, c, "|"), ":")

    keyed_wedges = wedges.map_batches(
        lambda t: pa.table({"ac": fuse(t["a"], t["c"]),
                            "a": t["a"], "b": t["mid"], "c": t["c"]}),
        batch_format="pyarrow")
    keyed_edges = edges.map_batches(
        lambda t: pa.table({"ac": fuse(t["a"], t["b"])}),
        batch_format="pyarrow")
    closed = bucket_semi_join(keyed_wedges, keyed_edges, key="ac",
                              num_buckets=num_buckets)
    return closed.map_batches(
        lambda t: t.select(["a", "b", "c"]), batch_format="pyarrow")


def neardup_triangles(sf_dir: str) -> pa.Table:
    """(a, b, c): triangles of mutually-near documents in the exact
    embedding-cosine near-dup graph (τ=0.4) — the clique-ish density
    signal a dedup pass uses to pick cluster representatives. Pairs come
    from the distributed block-pair matmul (dedup.embedding_neardups);
    triangles from two bucketed exchanges (triangle_count)."""
    from raydoc.functions.dedup import embedding_neardups

    pairs = embedding_neardups(sf_dir)
    if pairs.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    tri = triangle_count(
        rd.from_arrow(pairs.select(["a", "b"])), num_buckets=8)
    t = collect_table(tri)
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("c", pa.int64())])
    if t.num_rows == 0:            # empty collect loses the schema
        return schema.empty_table()
    return t.select(["a", "b", "c"]).cast(schema).sort_by(
        [("a", "ascending"), ("b", "ascending"), ("c", "ascending")])


def _bfs_hops_driver(edges: list, seeds: set, max_hops: int) -> dict:
    """Driver BFS over a small edge list: {node: min hops from any seed}
    (seeds map to 0). Used when the pair set honors the LSH
    small-candidate-set contract — ~20 distributed barriers for a
    hundred edges is the wrong regime (see label_components)."""
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    hops = {s: 0 for s in seeds}
    frontier, k = list(seeds), 0
    while frontier and k < max_hops:
        k += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in hops:
                    hops[v] = k
                    nxt.append(v)
        frontier = nxt
    return hops


def bfs_hops_distributed(edges: rd.Dataset, seeds: rd.Dataset,
                         max_hops: int,
                         num_buckets: int = 64) -> rd.Dataset:
    """(node, hops): round-synchronous multi-source BFS over an
    undirected (a, b) edge Dataset — min hop distance from any seed,
    capped at ``max_hops``. The at-scale regime: per round, the next
    frontier is ONE bucketed semi-join (edges whose source is in the
    frontier — right side deduped to keys before the exchange) plus one
    ``except_distinct`` against the visited set; no adjacency structure,
    frontier, or distance table ever lands on the driver (only the
    per-round frontier COUNT, the loop-termination scalar — BFS is
    inherently round-based, O(diameter) barriers). Edges materialize
    once up front (symmetrized), each round consumes them again."""
    from raydoc.functions.joins import bucket_semi_join, except_distinct

    def sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:        # empty Ray blocks carry an EMPTY schema
            return pa.table({"node": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({
            "node": pa.concat_arrays(
                [t.column("a").combine_chunks().cast(pa.int64()),
                 t.column("b").combine_chunks().cast(pa.int64())]),
            "dst": pa.concat_arrays(
                [t.column("b").combine_chunks().cast(pa.int64()),
                 t.column("a").combine_chunks().cast(pa.int64())])})

    edges_sym = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def seed0(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:        # empty Ray blocks carry an EMPTY schema
            return pa.table({"node": pa.array([], pa.int64()),
                             "hops": pa.array([], pa.int64())})
        n = t.column("node").combine_chunks().unique()
        return pa.table({"node": n,
                         "hops": pa.array([0] * len(n), pa.int64())})

    visited = seeds.map_batches(seed0, batch_format="pyarrow").materialize()
    frontier = visited            # (node, hops) — join uses node only
    levels = [visited]
    for k in range(1, max_hops + 1):
        reached = bucket_semi_join(edges_sym, frontier, key="node",
                                   num_buckets=num_buckets)
        cand = reached.map_batches(
            lambda t: pa.table({"node": t["dst"]}), batch_format="pyarrow")
        new_nodes = except_distinct(cand, _union_all(levels),
                                    key="node", num_buckets=num_buckets)
        frontier = new_nodes.map_batches(
            lambda t, _k=k: pa.table({
                "node": t["node"],
                "hops": pa.array([_k] * t.num_rows, pa.int64())}),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
        levels.append(frontier)
    return _union_all(levels)


def _union_all(parts: list) -> rd.Dataset:
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def neardup_hops(sf_dir: str, max_hops: int = 8, seed_mod: int = 50,
                 max_driver_pairs: int = 50_000) -> pa.Table:
    """(doc_id, hops): min hop distance from any SEED document
    (doc_id % ``seed_mod`` == 0) through the SimHash near-dup pair graph
    (hamming ≤ 3), capped at ``max_hops``; unreached documents are
    omitted (inner semantics, matching the recursive-CTE twin). The
    contamination-propagation primitive: "flag everything within k
    near-dup hops of a known-bad document".

    Adaptive regime (the label_components discipline): the pair table
    arrives driver-resident (LSH small-candidate-set contract), so below
    ``max_driver_pairs`` a microsecond driver BFS computes hop counts
    for GRAPH nodes only — driver state is bounded by the pair graph,
    never by the seed count — and the output assembles DISTRIBUTED: one
    map over documents tags each row from the broadcast hop map or the
    seed predicate (isolated seeds are hops-0 rows that never touch the
    driver). Above the threshold it switches to the round-synchronous
    ``bfs_hops_distributed`` (regime equality asserted in
    tests/test_graph.py)."""
    import ray

    from raydoc.functions.dedup import simhash_neardups

    pairs = simhash_neardups(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    out_schema = pa.schema([("doc_id", pa.int64()), ("hops", pa.int64())])

    if pairs.num_rows > max_driver_pairs:
        def seed_filter(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64())
            rem = pc.subtract(ids, pc.multiply(
                pc.divide(ids, pa.scalar(seed_mod, pa.int64())),
                pa.scalar(seed_mod, pa.int64())))
            return pa.table({"node": t.column("doc_id").filter(
                pc.equal(rem, pa.scalar(0, pa.int64())))})

        seeds = docs.map_batches(seed_filter, batch_format="pyarrow")
        got = collect_table(bfs_hops_distributed(
            rd.from_arrow(pairs.select(["a", "b"])), seeds, max_hops))
        if got.num_rows == 0:
            return out_schema.empty_table()
        return pa.table({"doc_id": got["node"],
                         "hops": got["hops"]}).cast(out_schema).sort_by(
            "doc_id")

    edge_list = list(zip(pairs.column("a").to_pylist(),
                         pairs.column("b").to_pylist()))
    graph_nodes = {x for e in edge_list for x in e}
    graph_seeds = {n for n in graph_nodes if n % seed_mod == 0}
    hops = _bfs_hops_driver(edge_list, graph_seeds, max_hops)
    hop_ref = ray.put(hops)

    def tag(t: pa.Table) -> pa.Table:
        m = ray.get(hop_ref)
        ids = t.column("doc_id").to_pylist()
        out_ids, out_hops = [], []
        for i in ids:
            if i % seed_mod == 0:
                out_ids.append(i)
                out_hops.append(0)
            elif i in m:
                out_ids.append(i)
                out_hops.append(m[i])
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "hops": pa.array(out_hops, pa.int64())})

    t = collect_table(docs.map_batches(tag, batch_format="pyarrow"))
    if t.num_rows == 0:
        return out_schema.empty_table()
    return t.cast(out_schema).sort_by("doc_id")


def embedding_dbscan(sf_dir: str, threshold: float = 0.4,
                     min_pts: int = 2,
                     max_driver_pairs: int = 50_000) -> pa.Table:
    """(vec_id, label, is_core): EXACT density-based clustering (DBSCAN)
    over the embedding corpus — ε-neighbors are the cosine ≥ τ pairs
    (dedup.embedding_neardups' distributed block-pair matmul), a CORE
    point has ≥ ``min_pts`` neighbors, clusters are the connected
    components of the core-core subgraph (label = min core id), BORDER
    points take the smallest label among their core neighbors, noise
    labels −1. Deterministic everywhere (min-label conventions), full
    recursive-CTE SQL twin.

    Adaptive regime (label_components discipline): the ε-pair set
    arrives driver-resident (the block-pair contract); degree counting,
    core selection and border attachment are dict passes over it, and
    component labels come from union-find below ``max_driver_pairs``,
    the distributed min-label ``connected_components`` above. The
    final per-vector tag is a distributed map over a broadcast label
    map (bounded by the pair graph, never the corpus)."""
    import ray

    from raydoc.functions.dedup import embedding_neardups

    pairs = embedding_neardups(sf_dir, threshold=threshold)
    adj: dict = {}
    for a, b in zip(pairs.column("a").to_pylist(),
                    pairs.column("b").to_pylist()):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    core = {v for v, nbrs in adj.items() if len(nbrs) >= min_pts}
    ce = [(a, b) for a, nbrs in adj.items() if a in core
          for b in nbrs if b in core and a < b]
    if len(ce) <= max_driver_pairs:
        lab = _union_find_min_labels(ce)
    else:
        lab = label_components(
            rd.from_arrow(pa.table({
                "a": pa.array([e[0] for e in ce], pa.int64()),
                "b": pa.array([e[1] for e in ce], pa.int64())})),
            max_driver_pairs=max_driver_pairs)
    corelab = {v: lab.get(v, v) for v in core}
    border = {}
    for v, nbrs in adj.items():
        if v in core:
            continue
        cl = [corelab[u] for u in nbrs if u in core]
        if cl:
            border[v] = min(cl)
    core_ref = ray.put(corelab)
    border_ref = ray.put(border)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:        # empty Ray blocks carry an EMPTY schema
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "is_core": pa.array([], pa.int64())})
        cl = ray.get(core_ref)
        bo = ray.get(border_ref)
        ids = t.column("vec_id").to_pylist()
        labels = [cl.get(i, bo.get(i, -1)) for i in ids]
        cores = [1 if i in cl else 0 for i in ids]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "label": pa.array(labels, pa.int64()),
                         "is_core": pa.array(cores, pa.int64())})

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id"])
    return collect_table(vecs.map_batches(
        tag, batch_format="pyarrow")).sort_by("vec_id")


def _k_core_driver(edges: list, k: int) -> set:
    """Local peeling over a small edge list → the k-core node set."""
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    stack = [n for n, nb in adj.items() if len(nb) < k]
    removed: set = set()
    while stack:
        n = stack.pop()
        if n in removed:
            continue
        removed.add(n)
        for m in adj[n]:
            if m not in removed:
                adj[m].discard(n)
                if len(adj[m]) < k:
                    stack.append(m)
    return {n for n in adj if n not in removed}


def k_core(edges: rd.Dataset, k: int = 2,
           num_buckets: int = 32) -> pa.Table:
    """(node,) membership of the k-core — the maximal subgraph where
    every node keeps degree ≥ k — by round-synchronous distributed
    peeling: each round, a combiner degree count finds the survivors
    (degree ≥ k) and two adaptive semi-joins (joins.bucket_semi_join —
    broadcast when the survivor set is small, bucketed exchange
    otherwise) prune edges touching eliminated nodes. No adjacency
    structure or per-round removal set ever lands on the driver; each
    round removes ≥ 1 node so the loop terminates. Rounds materialize
    their shrinking edge set (iterative algorithms re-consume it) —
    the same discipline as pagerank/bfs here.

    ``edges``: undirected unique (a, b) rows. Returns the sorted core
    node table (the driver-resident output IS the answer)."""
    from raydoc.functions.joins import bucket_semi_join

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"src": t["a"], "dst": t["b"]}),
            pa.table({"src": t["b"], "dst": t["a"]})])

    cur = edges.map_batches(both_dirs, batch_format="pyarrow") \
        .materialize()
    while True:
        deg = partial_groupby(cur, ["src"],
                              {"d": ("dst", "count")}).materialize()
        survivors = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t["d"], pa.scalar(k, pa.int64()))).select(["src"]),
            batch_format="pyarrow").materialize()
        n_nodes, n_surv = deg.count(), survivors.count()
        if n_surv == 0:
            return pa.table({"node": pa.array([], pa.int64())})
        if n_surv == n_nodes:
            out = collect_table(survivors)
            return pa.table({"node": pc.cast(out["src"], pa.int64())
                             }).sort_by("node")
        def swap(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["dst"], "dst": t["src"]})

        cur = bucket_semi_join(cur, survivors, key="src",
                               num_buckets=num_buckets)
        cur = bucket_semi_join(
            cur.map_batches(swap, batch_format="pyarrow"),
            survivors, key="src", num_buckets=num_buckets)
        cur = cur.map_batches(swap,
                              batch_format="pyarrow").materialize()


def neardup_kcore(sf_dir: str, k: int = 2,
                  max_driver_pairs: int = 50_000) -> pa.Table:
    """(vec_id,) members of the k-core of the exact embedding-cosine
    near-dup graph (τ=0.4) — the density screen that separates genuine
    duplicate CLUSTERS (mutually-close cores survive) from chains of
    borderline pairs (peeled away). Same adaptive regime as
    neardup_components: the LSH-contract-sized pair table peels on the
    driver in microseconds; larger edge sets run the distributed
    round-synchronous peel (identical output — asserted in
    tests/test_graph.py)."""
    from raydoc.functions.dedup import embedding_neardups

    pairs = embedding_neardups(sf_dir)
    if pairs.num_rows == 0:
        return pa.table({"vec_id": pa.array([], pa.int64())})
    if pairs.num_rows <= max_driver_pairs:
        core = sorted(_k_core_driver(
            list(zip(pairs.column("a").to_pylist(),
                     pairs.column("b").to_pylist())), k))
        return pa.table({"vec_id": pa.array(core, pa.int64())})
    t = k_core(rd.from_arrow(pairs.select(["a", "b"])), k=k)
    return pa.table({"vec_id": t["node"]})


def _sssp_driver(edges: list, seeds: set, rounds: int) -> dict:
    """Synchronous Bellman-Ford over a small directed (a, b, w) edge
    list: {node: min path cost from any seed over paths of ≤ ``rounds``
    edges}. Relaxations in round k read ONLY round k-1 distances, so
    the result matches the chained-CTE SQL twin exactly; converged
    rounds early-exit (identical output — distances are monotone)."""
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        changed = False
        for a, b, w in edges:
            da = dist.get(a)
            if da is None:
                continue
            cand = da + w
            old = nxt.get(b)
            if old is None or cand < old:
                nxt[b] = cand
                changed = True
        dist = nxt
        if not changed:
            break
    return dist


def sssp_distributed(edges: rd.Dataset, seeds: rd.Dataset, rounds: int,
                     num_buckets: int = 64) -> rd.Dataset:
    """(node, dist): round-synchronous multi-source weighted shortest
    paths (Bellman-Ford) over a DIRECTED (a, b, w) edge Dataset —
    min total cost from any seed over paths of ≤ ``rounds`` edges.
    Per round: ONE bucketed hash join (edges ⋈ current distances on the
    source node) relaxes every out-edge of a reached node, then one
    combiner-min exchange folds candidates with the standing distances;
    the driver sees only a (node-count, dist-sum) convergence scalar
    per round (distances are monotone non-increasing and the node set
    non-decreasing, so an unchanged pair ⇒ a fixed point and the loop
    exits early with the identical result). Edges materialize once;
    the per-round exchanges move node-sized tables, never the edge
    table."""
    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.joins import bucket_hash_join

    def prep_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({"node": pc.cast(t["a"], pa.int64()),
                         "dst": pc.cast(t["b"], pa.int64()),
                         "w": pc.cast(t["w"], pa.int64())})

    edges0 = edges.map_batches(prep_edges,
                               batch_format="pyarrow").materialize()

    def seed0(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        n = pc.cast(t["node"], pa.int64()).combine_chunks().unique()
        return pa.table({"node": n,
                         "label": pa.array([0] * len(n), pa.int64())})

    dist = seeds.map_batches(seed0, batch_format="pyarrow").materialize()
    prev_sig = None
    for _ in range(rounds):
        cand = bucket_hash_join(edges0, dist, key="node",
                                num_buckets=num_buckets)

        def relax(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "dst" not in t.schema.names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "label": pa.array([], pa.int64())})
            return pa.table({"node": t["dst"],
                             "label": pc.add(t["label"], t["w"])})

        new = _min_by_node(
            dist.union(cand.map_batches(relax, batch_format="pyarrow")),
            num_buckets).materialize()

        def m(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "label" not in t.schema.names:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64())})
            return pa.table({
                "k": pa.array([0] * t.num_rows, pa.int64()),
                "n": pa.array([1] * t.num_rows, pa.int64()),
                "s": pc.cast(t["label"], pa.int64())})

        g = collect_table(partial_groupby(
            new.map_batches(m, batch_format="pyarrow"), ["k"],
            {"n": ("n", "sum"), "s": ("s", "sum")}))
        sig = ((int(g.column("n")[0].as_py()),
                int(g.column("s")[0].as_py()))
               if g.num_rows else (0, 0))
        dist = new
        if sig == prev_sig:
            break
        prev_sig = sig
    return dist.map_batches(
        lambda t: (t.rename_columns(["node", "dist"])
                   if t.num_rows else pa.table(
                       {"node": pa.array([], pa.int64()),
                        "dist": pa.array([], pa.int64())})),
        batch_format="pyarrow")


def knn_geodesic(sf_dir: str, k: int = 5, rounds: int = 8,
                 seed_mod: int = 50,
                 max_driver_edges: int = 50_000) -> pa.Table:
    """(vec_id, dist): hop-bounded graph-geodesic distance from any SEED
    vector (vec_id % ``seed_mod`` == 0) through the symmetrized EXACT
    k-NN graph, edge cost = the integer-quantized squared-L2 ``d2``
    from ``similarity.knn_graph`` — min total cost over paths of ≤
    ``rounds`` edges (synchronous Bellman-Ford; the fixed round count
    ties the engine bit-for-bit to the chained-CTE DuckDB twin).
    Unreached vectors are omitted (inner semantics). This is the
    manifold-distance primitive (ISOMAP's first stage) over the corpus
    embedding space, and the weighted complement of ``neardup_hops``.

    Adaptive regime (the label_components discipline): the k-NN table
    is O(n·k) rows by construction — below ``max_driver_edges`` a
    driver Bellman-Ford over the symmetrized edge list; above, the
    round-synchronous ``sssp_distributed`` path. Regime equality is
    pinned in tests/test_graph.py."""
    from raydoc.functions.similarity import knn_graph

    kn = knn_graph(sf_dir, k=k)
    fwd = pa.table({"a": pc.cast(kn["vec_id"], pa.int64()),
                    "b": pc.cast(kn["neighbor_id"], pa.int64()),
                    "w": pc.cast(kn["d2"], pa.int64())})
    sym = pa.concat_tables([fwd, pa.table({
        "a": fwd["b"], "b": fwd["a"], "w": fwd["w"]})])
    out_schema = pa.schema([("vec_id", pa.int64()),
                            ("dist", pa.int64())])

    if sym.num_rows > max_driver_edges:
        vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id"])

        def seed_filter(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64())})
            ids = pc.cast(t["vec_id"], pa.int64())
            rem = pc.subtract(ids, pc.multiply(
                pc.divide(ids, pa.scalar(seed_mod, pa.int64())),
                pa.scalar(seed_mod, pa.int64())))
            return pa.table({"node": ids.filter(
                pc.equal(rem, pa.scalar(0, pa.int64())))})

        got = collect_table(sssp_distributed(
            rd.from_arrow(sym),
            vecs.map_batches(seed_filter, batch_format="pyarrow"),
            rounds))
        if got.num_rows == 0:
            return out_schema.empty_table()
        return pa.table({"vec_id": got["node"],
                         "dist": got["dist"]}).cast(
            out_schema).sort_by("vec_id")

    edge_list = list(zip(sym.column("a").to_pylist(),
                         sym.column("b").to_pylist(),
                         sym.column("w").to_pylist()))
    nodes = {x for e in edge_list for x in e[:2]}
    seeds = {n for n in nodes if n % seed_mod == 0}
    dist = _sssp_driver(edge_list, seeds, rounds)
    if not dist:
        return out_schema.empty_table()
    ks = sorted(dist)
    return pa.table({"vec_id": pa.array(ks, pa.int64()),
                     "dist": pa.array([dist[k_] for k_ in ks],
                                      pa.int64())})


def labelprop_distributed(edges: rd.Dataset, labels: rd.Dataset,
                          rounds: int,
                          num_buckets: int | None = None) -> rd.Dataset:
    """Synchronous label propagation: ``rounds`` iterations of
    label(v) <- mode of neighbor labels (ties -> smallest label) over a
    directed edge dataset (a, b) — pass both directions for an
    undirected graph. ``labels`` is (node, label); every node must
    appear as some edge's ``b`` to be updated. Per round: one bucketed
    hash join (edge source -> current label), one combiner count
    groupby, one coarse-bucket argmax — no whole-graph state on any
    single worker or the driver."""
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.joins import bucket_hash_join

    mask = (num_buckets or reduce_bucket_count()) - 1

    def lab_as_src(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.schema.names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        return pa.table({"a": pc.cast(t["node"], pa.int64()),
                         "label": pc.cast(t["label"], pa.int64())})

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "b" not in t.schema.names:
            return pa.table({"b": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        bv = t.column("b").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((bv & mask).astype("int32")))

    def pick_mode(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["b", "cnt", "label"],
                          ascending=[True, False, True],
                          ignore_index=True)
        top = g.groupby("b", sort=False).head(1)
        return pd.DataFrame({"node": top["b"].to_numpy(),
                             "label": top["label"].to_numpy()})

    cur = labels
    for _ in range(rounds):
        j = bucket_hash_join(
            edges, cur.map_batches(lab_as_src, batch_format="pyarrow"),
            "a")
        counts = partial_groupby(j, ["b", "label"],
                                 {"cnt": ("label", "count")})
        cur = (counts.map_batches(add_bucket, batch_format="pyarrow")
               .groupby("bucket").map_groups(pick_mode,
                                             batch_format="pandas"))
        cur = cur.materialize()
    return cur


def label_propagation(sf_dir: str, k: int = 5, rounds: int = 6,
                      max_driver_edges: int = 50_000) -> pa.Table:
    """(vec_id, community): community detection over the symmetrized
    exact k-NN embedding graph by SYNCHRONOUS label propagation —
    ``rounds`` iterations of label(v) <- most frequent neighbor label,
    ties to the smallest label, seeded with label(v) = v. The fixed
    round count and deterministic tiebreak tie the engine bit-for-bit
    to the unrolled chained-CTE DuckDB twin (the cheap Louvain stand-in
    for topic/duplicate neighborhoods in embedding space).

    Adaptive regime (the ``knn_geodesic`` discipline): the k-NN edge
    list is O(n*k) rows — below ``max_driver_edges`` the rounds run on
    the driver; above, ``labelprop_distributed`` runs them as
    join + combiner-count + coarse-bucket argmax per round. Regime
    equality is pinned in tests/test_graph.py."""
    from raydoc.functions.similarity import knn_graph

    kn = knn_graph(sf_dir, k=k)
    fwd = pa.table({"a": pc.cast(kn["vec_id"], pa.int64()),
                    "b": pc.cast(kn["neighbor_id"], pa.int64())})
    sym = pa.concat_tables([fwd, pa.table({"a": fwd["b"],
                                           "b": fwd["a"]})])
    out_schema = pa.schema([("vec_id", pa.int64()),
                            ("community", pa.int64())])
    if sym.num_rows == 0:
        return out_schema.empty_table()

    if sym.num_rows > max_driver_edges:
        nodes = pc.unique(sym["b"])
        labels = rd.from_arrow(pa.table({"node": nodes,
                                         "label": nodes}))
        got = collect_table(labelprop_distributed(
            rd.from_arrow(sym), labels, rounds))
        return pa.table({"vec_id": got["node"],
                         "community": got["label"]}).cast(
            out_schema).sort_by("vec_id")

    a = sym.column("a").to_pylist()
    b = sym.column("b").to_pylist()
    nbrs: dict = {}
    for s, d in zip(a, b):
        nbrs.setdefault(d, []).append(s)
    labels_d = {v: v for v in nbrs}
    for _ in range(rounds):
        nxt = {}
        for v, ns in nbrs.items():
            cnt: dict = {}
            for u in ns:
                lu = labels_d[u]
                cnt[lu] = cnt.get(lu, 0) + 1
            nxt[v] = min(cnt, key=lambda l: (-cnt[l], l))
        labels_d = nxt
    ks = sorted(labels_d)
    return pa.table({"vec_id": pa.array(ks, pa.int64()),
                     "community": pa.array([labels_d[x] for x in ks],
                                           pa.int64())})
