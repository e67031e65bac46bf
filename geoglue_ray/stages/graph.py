"""Graph stages over edge Datasets: distinct-edge extraction from baskets
and fixed-point PageRank.

PageRank is the representative ITERATIVE algorithm of the engine (the
class the correctness brief allows to skip SQL — here it doesn't have to):
all arithmetic is integer fixed-point (ranks scaled by ``2**32``, damping
85/100 applied as ``(85 * sum) // 100``), so every iteration is
order-independent integer sums + floor divisions that a DuckDB HUGEINT
oracle reproduces bit-for-bit (`geoglue_ray.oracles.pagerank_parts`).

Scale shape: the EDGE set stays distributed (materialized once, streamed
once per iteration); only the NODE-cardinality rank vector lives on the
driver and is re-broadcast each round via ``ray.put`` — the same bounded-
state contract as vocab_top / embed_centroids (nodes ~ catalog size,
edges ~ corpus size).  Per-batch partials collapse to distinct-dst rows
before the fixed-shard exact merge, so the shuffle payload per iteration
is node-bounded, never edge-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from geoglue_ray.functions.texthash import int_hash64
from geoglue_ray.stages.dedup import _run_pairs


def basket_edges(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    n_shards: int = 64,
) -> rd.Dataset:
    """Distinct DIRECTED co-occurrence edges: for every unordered pair of
    distinct items sharing a basket, both ``(a, b)`` and ``(b, a)`` —
    the symmetric item graph of a market-basket corpus.

    Baskets co-locate via ``hash(basket) % n_shards``; each shard task
    generates within-basket pairs in one lexsort + run-pair pass and
    collapses to its DISTINCT pairs (shuffle payload = per-shard distinct
    pair cardinality).  A second fixed-shard pass on ``hash(pair)``
    dedupes across basket shards — a pair's global identity lives in one
    pair shard, so the result is exactly DuckDB's ``SELECT DISTINCT``.
    """

    def shard(b: pa.Table) -> pa.Table:
        k = b[basket_col].to_numpy()
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(k) % np.uint64(n_shards)).astype(np.int64)
                ),
                basket_col: b[basket_col],
                item_col: b[item_col],
            }
        )

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "_ps": np.array([], np.int64),
                    "packed": np.array([], np.int64),
                }
            )
        bk = g[basket_col].to_numpy()
        it = g[item_col].to_numpy()
        o = np.lexsort((it, bk))
        bk, it = bk[o], it[o]
        uniq = np.r_[True, (bk[1:] != bk[:-1]) | (it[1:] != it[:-1])]
        bk, it = bk[uniq], it[uniq]
        ia, ib = _run_pairs(bk)
        if len(ia) == 0:
            return pd.DataFrame(
                {
                    "_ps": np.array([], np.int64),
                    "packed": np.array([], np.int64),
                }
            )
        packed = (it[ia].astype(np.int64) << np.int64(32)) | it[ib].astype(
            np.int64
        )
        pu = np.unique(packed)
        return pd.DataFrame(
            {
                "_ps": (int_hash64(pu) % np.uint64(n_shards)).astype(np.int64),
                "packed": pu,
            }
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        pu = np.unique(g["packed"].to_numpy())
        a = (pu >> np.int64(32)).astype(np.int64)
        b = (pu & np.int64(0xFFFFFFFF)).astype(np.int64)
        return pd.DataFrame(
            {
                "src": np.concatenate([a, b]),
                "dst": np.concatenate([b, a]),
            }
        )

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(gen, batch_format="pandas")
        .groupby("_ps")
        .map_groups(dedup, batch_format="pandas")
    )


def pagerank_fixedpoint(
    edges: rd.Dataset,
    iters: int = 3,
    scale: int = 1 << 32,
    damping_num: int = 85,
    damping_den: int = 100,
    n_merge: int = 32,
) -> pa.Table:
    """Fixed-point PageRank over distinct directed ``(src, dst)`` edges.

    ``rank_0 = scale`` for every node; each iteration computes
    ``rank'[v] = (15 * scale) // 100 + (85 * sum_in(rank[u] // deg[u])) // 100``
    in pure int64 — floor divisions and order-independent integer sums,
    bit-reproducible by an unrolled HUGEINT CTE.  Nodes are taken from the
    edge set itself (every node has out-degree >= 1 in a symmetric graph),
    so there is no dangling-mass term.

    The driver holds only the node-cardinality rank/degree vectors
    (asserted against int64 overflow: ``damping_num * n * scale < 2**63``)
    and re-broadcasts contributions per iteration; edges stream through
    ``map_batches`` with per-batch distinct-dst partial collapse and a
    fixed-shard exact merge.
    """
    edges = edges.materialize()  # consumed once per iteration + degrees

    def _empty_partial() -> pa.Table:
        return pa.table(
            {
                "_m": pa.array([], pa.int64()),
                "node": pa.array([], pa.int64()),
                "val": pa.array([], pa.int64()),
            }
        )

    def deg_partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _empty_partial()
        src = np.sort(b["src"].to_numpy().astype(np.int64))
        bnd = np.r_[True, src[1:] != src[:-1]]
        starts = np.nonzero(bnd)[0]
        cnt = np.diff(np.r_[starts, len(src)])
        return pa.table(
            {
                "_m": pa.array(
                    (int_hash64(src[starts]) % np.uint64(n_merge)).astype(
                        np.int64
                    )
                ),
                "node": pa.array(src[starts]),
                "val": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "node": np.array([], np.int64),
                    "val": np.array([], np.int64),
                }
            )
        node = g["node"].to_numpy().astype(np.int64)
        val = g["val"].to_numpy().astype(np.int64)
        o = np.argsort(node, kind="stable")
        node, val = node[o], val[o]
        bnd = np.r_[True, node[1:] != node[:-1]]
        starts = np.nonzero(bnd)[0]
        sums = np.add.reduceat(val, starts)
        return pd.DataFrame({"node": node[starts], "val": sums})

    def reduce_nodes(ds_part: rd.Dataset) -> pd.DataFrame:
        return (
            ds_part.groupby("_m")
            .map_groups(merge, batch_format="pandas")
            .to_pandas()
        )

    degs = reduce_nodes(edges.map_batches(deg_partial, batch_format="pyarrow"))
    nodes = degs["node"].to_numpy().astype(np.int64)
    o = np.argsort(nodes)
    nodes, deg = nodes[o], degs["val"].to_numpy().astype(np.int64)[o]
    n = len(nodes)
    assert damping_num * n * scale < (1 << 63), (
        "fixed-point overflow bound: shrink scale for this node count"
    )
    rank = np.full(n, scale, dtype=np.int64)
    base = (damping_den - damping_num) * scale // damping_den

    for _ in range(iters):
        contrib_ref = ray.put({"nodes": nodes, "contrib": rank // deg})

        def inc_partial(b: pa.Table, *, ref=contrib_ref) -> pa.Table:
            if len(b) == 0:
                return _empty_partial()
            state = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            src = b["src"].to_numpy().astype(np.int64)
            dst = b["dst"].to_numpy().astype(np.int64)
            c = state["contrib"][np.searchsorted(state["nodes"], src)]
            o2 = np.argsort(dst, kind="stable")
            dst_s, c_s = dst[o2], c[o2]
            bnd = np.r_[True, dst_s[1:] != dst_s[:-1]]
            starts = np.nonzero(bnd)[0]
            sums = np.add.reduceat(c_s, starts)
            du = dst_s[starts]
            return pa.table(
                {
                    "_m": pa.array(
                        (int_hash64(du) % np.uint64(n_merge)).astype(np.int64)
                    ),
                    "node": pa.array(du),
                    "val": pa.array(sums.astype(np.int64)),
                }
            )

        inc = reduce_nodes(
            edges.map_batches(inc_partial, batch_format="pyarrow")
        )
        incoming = np.zeros(n, dtype=np.int64)
        idx = np.searchsorted(nodes, inc["node"].to_numpy().astype(np.int64))
        incoming[idx] = inc["val"].to_numpy().astype(np.int64)
        rank = base + damping_num * incoming // damping_den

    return pa.table({"node": pa.array(nodes), "rank": pa.array(rank)})


def bfs_hops(
    edges: rd.Dataset,
    n_sources: int = 4,
    max_hops: int = 4,
    n_merge: int = 32,
    sources=None,
) -> pa.Table:
    """Multi-source BFS hop distances over distinct directed ``(src,
    dst)`` edges, capped at ``max_hops`` — the graph-TRAVERSAL operator
    (pagerank = iterative value propagation, triangle_counts = pattern
    counting; this is frontier expansion).  Sources are the ``n_sources``
    smallest node ids (deterministic, SQL-selectable).

    Per round the driver broadcasts the (sources x nodes) hop matrix
    (node-cardinality state, the pagerank rule) and the edge set streams
    once through ``map_batches``: each batch emits the distinct (source,
    dst) pairs newly reachable from its frontier rows, a fixed-shard
    merge dedupes, and the driver stamps still-unreached entries.  Rounds
    are BOUNDED by ``max_hops`` (never run BFS to convergence on an
    unknown graph at scale); edges are never collected.  Output: one row
    per (src_id, node) reached within the cap, hops = the true minimum
    (a node is stamped in the first round that reaches it)."""
    import pandas as pd

    edges = edges.materialize()  # one pass per round + the node scan

    def node_partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"_m": pa.array([], pa.int64()), "node": pa.array([], pa.int64())}
            )
        src = np.unique(b["src"].to_numpy().astype(np.int64))
        return pa.table(
            {
                "_m": pa.array(
                    (int_hash64(src) % np.uint64(n_merge)).astype(np.int64)
                ),
                "node": pa.array(src),
            }
        )

    def node_merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.unique(g["node"].to_numpy().astype(np.int64))}
        )

    nodes = np.sort(
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("_m")
        .map_groups(node_merge, batch_format="pandas")
        .to_pandas()["node"]
        .to_numpy()
        .astype(np.int64)
    )
    assert len(nodes) and 0 <= nodes[0] and nodes[-1] < (1 << 40), (
        "packed (source, node) dedup key assumes non-negative node ids < 2^40"
    )
    if sources is None:
        sources = nodes[:n_sources]
    else:
        sources = np.asarray(sources, dtype=np.int64)
        assert np.isin(sources, nodes).all(), "explicit sources must be graph nodes"
    hops = np.full((len(sources), len(nodes)), -1, dtype=np.int64)
    hops[np.arange(len(sources)), np.searchsorted(nodes, sources)] = 0

    def _empty_pairs() -> pa.Table:
        return pa.table(
            {
                "_m": pa.array([], pa.int64()),
                "si": pa.array([], pa.int64()),
                "node": pa.array([], pa.int64()),
            }
        )

    for r in range(max_hops):
        state_ref = ray.put({"nodes": nodes, "frontier": hops == r})

        def reach_partial(b: pa.Table, *, ref=state_ref) -> pa.Table:
            if len(b) == 0:
                return _empty_pairs()
            st = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            src = b["src"].to_numpy().astype(np.int64)
            dst = b["dst"].to_numpy().astype(np.int64)
            pos = np.searchsorted(st["nodes"], src)
            out_si, out_nd = [], []
            for si in range(st["frontier"].shape[0]):
                sel = st["frontier"][si][pos]
                if sel.any():
                    out_si.append(np.full(int(sel.sum()), si, dtype=np.int64))
                    out_nd.append(dst[sel])
            if not out_si:
                return _empty_pairs()
            si = np.concatenate(out_si)
            nd = np.concatenate(out_nd)
            key = si * np.int64(1 << 40) + nd  # distinct within batch
            key = np.unique(key)
            si, nd = key >> np.int64(40), key & np.int64((1 << 40) - 1)
            return pa.table(
                {
                    "_m": pa.array(
                        (int_hash64(nd) % np.uint64(n_merge)).astype(np.int64)
                    ),
                    "si": pa.array(si),
                    "node": pa.array(nd),
                }
            )

        def pair_merge(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return pd.DataFrame(
                    {"si": np.array([], np.int64), "node": np.array([], np.int64)}
                )
            key = g["si"].to_numpy().astype(np.int64) * np.int64(
                1 << 40
            ) + g["node"].to_numpy().astype(np.int64)
            key = np.unique(key)
            return pd.DataFrame(
                {"si": key >> np.int64(40), "node": key & np.int64((1 << 40) - 1)}
            )

        reached = (
            edges.map_batches(reach_partial, batch_format="pyarrow")
            .groupby("_m")
            .map_groups(pair_merge, batch_format="pandas")
            .to_pandas()
        )
        if len(reached) == 0:
            break
        si = reached["si"].to_numpy().astype(np.int64)
        ni = np.searchsorted(nodes, reached["node"].to_numpy().astype(np.int64))
        fresh = hops[si, ni] == -1
        hops[si[fresh], ni[fresh]] = r + 1

    sidx, nidx = np.nonzero(hops >= 0)
    return pa.table(
        {
            "src_id": pa.array(sources[sidx]),
            "node": pa.array(nodes[nidx]),
            "hops": pa.array(hops[sidx, nidx]),
        }
    )


def triangle_counts(
    edges: rd.Dataset,
    n_shards: int = 64,
    n_merge: int = 32,
    broadcast_edges_below: int = 4_000_000,
) -> pa.Table:
    """Per-node triangle counts over distinct directed ``(src, dst)``
    edges (both directions present, as :func:`basket_edges` emits) — the
    representative GRAPH-ANALYTICS aggregate beyond the iterative class
    (reference analogue: the co-occurrence family, cf. copurchase_pairs).

    Degree-ordered orientation (the standard wedge-bounding trick): keep
    ``u -> v`` only when ``(deg[u], u) < (deg[v], v)``, so every triangle
    has exactly ONE corner with two outgoing oriented edges and is
    enumerated exactly once as a wedge at that corner.  Wedges
    ``(v1, v2)`` are generated per source in one fixed-shard lexsort +
    run-pair pass.  Two byte-identical MATCH modes (the minhash
    broadcast/ship two-mode pattern):

    - **broadcast** (undirected edge count <= ``broadcast_edges_below``,
      known for free from the degree sum): the packed edge set is
      assembled OFF-driver in one Ray task, broadcast once (8 bytes per
      edge), and each wedge task resolves membership + corner counts
      locally — the wedge volume (the quadratic term) NEVER leaves its
      task; the only shuffled payload is node-bounded count partials.
      Measured at sf0.1: 125 s -> the shuffle of ~25M wedge rows was the
      whole cost.
    - **ship** (above the ceiling): wedges co-shuffle with edge keys on
      ``hash(packed) % n_shards`` and membership is a searchsorted per
      shard task — nothing is ever broadcast.

    Partitioning assumption (100 TB): orientation bounds out-degree by
    ~sqrt(|E|), so per-task wedge volume is ``sum C(outdeg, 2)`` over one
    shard's sources — raise ``n_shards`` (and salt a pathological
    super-hub upstream) to bound task memory.  Node ids must fit int32
    (packed pair keys), asserted.
    """
    edges = edges.materialize()  # consumed for degrees + two passes

    def deg_partial(b: pa.Table) -> pa.Table:
        src = np.sort(b["src"].to_numpy().astype(np.int64))
        if len(src) == 0:
            return pa.table(
                {
                    "_m": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                }
            )
        bnd = np.r_[True, src[1:] != src[:-1]]
        starts = np.nonzero(bnd)[0]
        cnt = np.diff(np.r_[starts, len(src)]).astype(np.int64)
        return pa.table(
            {
                "_m": pa.array(
                    (int_hash64(src[starts]) % np.uint64(n_merge)).astype(np.int64)
                ),
                "node": pa.array(src[starts]),
                "val": pa.array(cnt),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy().astype(np.int64)
        val = g["val"].to_numpy().astype(np.int64)
        o = np.argsort(node, kind="stable")
        node, val = node[o], val[o]
        if len(node) == 0:
            return pd.DataFrame(
                {"node": np.array([], np.int64), "val": np.array([], np.int64)}
            )
        bnd = np.r_[True, node[1:] != node[:-1]]
        starts = np.nonzero(bnd)[0]
        return pd.DataFrame(
            {"node": node[starts], "val": np.add.reduceat(val, starts)}
        )

    degs = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("_m")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    nodes = degs["node"].to_numpy().astype(np.int64)
    o = np.argsort(nodes)
    nodes, deg = nodes[o], degs["val"].to_numpy().astype(np.int64)[o]
    assert len(nodes) == 0 or nodes[-1] < (1 << 31), "node ids must fit int32"
    deg_ref = ray.put({"nodes": nodes, "deg": deg})

    def orient_wedges(b: pa.Table) -> pa.Table:
        """Oriented out-edges per batch -> wedge shard rows.  Wedge pairs
        need ALL of a source's out-edges together, so this stage only
        tags rows with the source shard; pair generation happens in the
        grouped pass below."""
        state = ray.get(deg_ref) if isinstance(deg_ref, ray.ObjectRef) else deg_ref
        src = b["src"].to_numpy().astype(np.int64)
        dst = b["dst"].to_numpy().astype(np.int64)
        du = state["deg"][np.searchsorted(state["nodes"], src)]
        dv = state["deg"][np.searchsorted(state["nodes"], dst)]
        keep = (du < dv) | ((du == dv) & (src < dst))
        src, dst = src[keep], dst[keep]
        return pa.table(
            {
                "_ws": pa.array(
                    (int_hash64(src) % np.uint64(n_shards)).astype(np.int64)
                ),
                "src": pa.array(src),
                "dst": pa.array(dst),
            }
        )

    def gen_wedges(g: pd.DataFrame) -> pa.Table:
        # returns Arrow so the union with edge_keys sees ONE block type
        src = g["src"].to_numpy().astype(np.int64)
        dst = g["dst"].to_numpy().astype(np.int64)
        o2 = np.lexsort((dst, src))
        src, dst = src[o2], dst[o2]
        ia, ib = _run_pairs(src)
        if len(ia) == 0:
            return pa.table(
                {
                    "_ps": pa.array([], pa.int64()),
                    "packed": pa.array([], pa.int64()),
                    "corner": pa.array([], pa.int64()),
                }
            )
        a = np.minimum(dst[ia], dst[ib])
        c = np.maximum(dst[ia], dst[ib])
        packed = (a << np.int64(32)) | c
        return pa.table(
            {
                "_ps": pa.array(
                    (int_hash64(packed) % np.uint64(n_shards)).astype(np.int64)
                ),
                "packed": pa.array(packed),
                "corner": pa.array(src[ia]),
            }
        )

    def edge_keys(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy().astype(np.int64)
        dst = b["dst"].to_numpy().astype(np.int64)
        keep = src < dst  # undirected edge exactly once
        packed = (src[keep] << np.int64(32)) | dst[keep]
        return pa.table(
            {
                "_ps": pa.array(
                    (int_hash64(packed) % np.uint64(n_shards)).astype(np.int64)
                ),
                "packed": pa.array(packed),
                "corner": pa.array(np.full(int(keep.sum()), -1, dtype=np.int64)),
            }
        )

    oriented = edges.map_batches(orient_wedges, batch_format="pyarrow")
    n_und_edges = int(deg.sum()) // 2  # free from the degree vector

    def match(g: pd.DataFrame) -> pd.DataFrame:
        corner = g["corner"].to_numpy().astype(np.int64)
        packed = g["packed"].to_numpy().astype(np.int64)
        is_edge = corner < 0
        q = np.sort(packed[is_edge])
        p, u = packed[~is_edge], corner[~is_edge]
        if len(q) == 0 or len(p) == 0:
            return pd.DataFrame(
                {"node": np.array([], np.int64), "val": np.array([], np.int64)}
            )
        idx = np.searchsorted(q, p)
        idx[idx == len(q)] = 0
        m = q[idx] == p
        pm = p[m]
        tri_nodes = np.concatenate(
            [u[m], pm >> np.int64(32), pm & np.int64(0xFFFFFFFF)]
        )
        tri_nodes.sort()
        if len(tri_nodes) == 0:
            return pd.DataFrame(
                {"node": np.array([], np.int64), "val": np.array([], np.int64)}
            )
        bnd = np.r_[True, tri_nodes[1:] != tri_nodes[:-1]]
        starts = np.nonzero(bnd)[0]
        cnt = np.diff(np.r_[starts, len(tri_nodes)]).astype(np.int64)
        return pd.DataFrame({"node": tri_nodes[starts], "val": cnt})

    def tag_merge(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "_m": pa.array(
                    (int_hash64(node) % np.uint64(n_merge)).astype(np.int64)
                ),
                "node": b["node"],
                "val": b["val"],
            }
        )

    if n_und_edges <= broadcast_edges_below:
        # broadcast mode: edge set assembled off-driver, wedges matched
        # in place — only node-bounded count partials ever shuffle
        from geoglue_ray.stages.text import _get_vocab_task, _vocab_lookup

        def edge_h(b: pa.Table) -> pa.Table:
            src = b["src"].to_numpy().astype(np.int64)
            dst = b["dst"].to_numpy().astype(np.int64)
            keep = src < dst
            packed = (src[keep] << np.int64(32)) | dst[keep]
            return pa.table({"_h": pa.array(packed)})

        blocks = edges.map_batches(edge_h, batch_format="pyarrow").materialize()
        eref = _get_vocab_task().remote(*blocks.to_arrow_refs())

        def gen_match(g: pd.DataFrame) -> pa.Table:
            empty = pa.table(
                {
                    "_m": pa.array([], pa.int64()),
                    "node": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                }
            )
            src = g["src"].to_numpy().astype(np.int64)
            dst = g["dst"].to_numpy().astype(np.int64)
            o2 = np.lexsort((dst, src))
            src, dst = src[o2], dst[o2]
            ia, ib = _run_pairs(src)
            if len(ia) == 0:
                return empty
            a = np.minimum(dst[ia], dst[ib])
            c = np.maximum(dst[ia], dst[ib])
            packed = ((a << np.int64(32)) | c).view(np.uint64)
            q = _vocab_lookup(eref)  # sorted distinct packed edges
            if len(q) == 0:
                return empty
            idx = np.searchsorted(q, packed)
            idx[idx == len(q)] = 0
            hit = q[idx] == packed
            pm = packed[hit].view(np.int64)
            tri_nodes = np.concatenate(
                [src[ia[hit]], pm >> np.int64(32), pm & np.int64(0xFFFFFFFF)]
            )
            if len(tri_nodes) == 0:
                return empty
            tri_nodes.sort()
            bnd = np.r_[True, tri_nodes[1:] != tri_nodes[:-1]]
            starts = np.nonzero(bnd)[0]
            cnt = np.diff(np.r_[starts, len(tri_nodes)]).astype(np.int64)
            nd = tri_nodes[starts]
            return pa.table(
                {
                    "_m": pa.array(
                        (int_hash64(nd) % np.uint64(n_merge)).astype(np.int64)
                    ),
                    "node": pa.array(nd),
                    "val": pa.array(cnt),
                }
            )

        parts_m = oriented.groupby("_ws").map_groups(
            gen_match, batch_format="pandas"
        )
    else:
        tagged = oriented.groupby("_ws").map_groups(
            gen_wedges, batch_format="pandas"
        ).union(edges.map_batches(edge_keys, batch_format="pyarrow"))
        # per-shard partials are node-bounded; one exact merge finishes
        parts_m = (
            tagged.groupby("_ps")
            .map_groups(match, batch_format="pandas")
            .map_batches(tag_merge, batch_format="pyarrow")
        )

    out = (
        parts_m.groupby("_m")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "node": pa.array(out["node"].to_numpy().astype(np.int64)),
            "n_triangles": pa.array(out["val"].to_numpy().astype(np.int64)),
        }
    )


def kcore_peel(
    edges: rd.Dataset,
    q: float = 0.05,
    rounds: int = 8,
    n_merge: int = 32,
) -> pa.Table:
    """k-core DECOMPOSITION by iterative peeling over distinct symmetric
    ``(src, dst)`` edges — the graph-robustness operator alongside
    pagerank (value propagation), BFS (traversal) and triangles (pattern
    counting): repeatedly delete every node whose degree among survivors
    is below k, a FIXED number of rounds (never to convergence on an
    unknown graph; extra rounds past the fixed point are exact no-ops on
    both sides).  k is data-relative — the initial degree at ascending
    rank ``ceil(q * n_nodes)`` — so the peel stays non-trivial at every
    corpus scale (an absolute k empties or saturates a density-scaling
    graph).

    Scale shape (the pagerank rule): the driver holds only the
    node-cardinality alive/degree vectors; per round the alive set
    broadcasts via ``ray.put`` and the edge set STREAMS once through
    ``map_batches`` (per-batch bincount of surviving-edge endpoints,
    fixed-shard exact merge) — edges are never collected.

    Returns survivors after ``rounds`` peels: (node, core_degree), the
    degree counted among the previous round's survivors (>= k by
    construction)."""
    import ray

    edges = edges.materialize()  # one streamed pass per round + degrees

    def deg_partial(b: pa.Table, *, ref=None) -> pa.Table:
        empty = pa.table(
            {
                "_m": pa.array([], pa.int64()),
                "node": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
            }
        )
        if len(b) == 0:
            return empty
        src = b["src"].to_numpy().astype(np.int64)
        dst = b["dst"].to_numpy().astype(np.int64)
        if ref is not None:
            alive = ray.get(ref)
            m = alive[src] & alive[dst]
            src = src[m]
            if len(src) == 0:
                return empty
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {
                "_m": pa.array((int_hash64(u) % np.uint64(n_merge)).astype(np.int64)),
                "node": pa.array(u),
                "d": pa.array(c.astype(np.int64)),
            }
        )

    def deg_merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", sort=False)["d"].sum().reset_index()
        return pd.DataFrame(
            {"node": s["node"].astype(np.int64), "d": s["d"].astype(np.int64)}
        )

    def sweep(ref) -> pd.DataFrame:
        fn = deg_partial if ref is None else (
            lambda b, *, _r=ref: deg_partial(b, ref=_r)
        )
        return (
            edges.map_batches(fn, batch_format="pyarrow")
            .groupby("_m")
            .map_groups(deg_merge, batch_format="pandas")
            .to_pandas()
        )

    d0 = sweep(None)
    nodes = d0["node"].to_numpy().astype(np.int64)
    deg0 = d0["d"].to_numpy().astype(np.int64)
    assert len(nodes) and nodes.min() >= 0 and nodes.max() < (1 << 26), (
        "dense alive vector assumes non-negative node ids < 2^26; "
        "re-key via factorize above that"
    )
    n = len(nodes)
    k = int(np.sort(deg0)[int(np.ceil(q * n)) - 1])

    size = int(nodes.max()) + 1
    alive = np.zeros(size, dtype=bool)
    alive[nodes] = True
    # cur holds d_r (degrees among a_{r-1}); a_r = cur filtered to d >= k.
    # After the loop cur = d_rounds, so the output is exactly a_rounds.
    cur = pd.DataFrame({"node": nodes, "d": deg0})  # d_1 (a_0 = all nodes)
    for _ in range(rounds - 1):
        new_alive = np.zeros(size, dtype=bool)
        keep = cur["d"].to_numpy() >= k
        new_alive[cur["node"].to_numpy()[keep]] = True
        if (new_alive == alive).all():
            break  # fixed point: remaining rounds are exact no-ops
        alive = new_alive
        cur = sweep(ray.put(alive))
        cur = cur[alive[cur["node"].to_numpy()]].reset_index(drop=True)

    out = cur[cur["d"].to_numpy() >= k].sort_values("node")
    return pa.table(
        {
            "part_key": pa.array(out["node"].to_numpy().astype(np.int64)),
            "core_degree": pa.array(out["d"].to_numpy().astype(np.int64)),
            "k": pa.array(np.full(len(out), k, dtype=np.int64)),
        }
    )


def temporal_reachability(
    contacts: rd.Dataset,
    seeds: np.ndarray,
    rounds: int = 6,
    n_merge: int = 16,
    big: int = 1 << 40,
) -> pa.Table:
    """SI-model TEMPORAL reachability over time-stamped contact edges
    ``(u, v, t)``: node v becomes infected at the earliest contact time
    t with an already-infected u where ``t >= T(u)`` — paths must
    respect time (the contact-tracing / influence-spread operator;
    static BFS overcounts by ignoring edge order).  Fixed ``rounds`` of
    min-propagation (one hop of the time-respecting closure each; extra
    rounds past the fixed point are exact no-ops), mirrored by the
    unrolled min-join CTE twin.

    Scale shape (the pagerank rule): the driver holds only the
    node-cardinality infection-time vector, re-broadcast per round via
    ``ray.put``; edges stream once per round through ``map_batches``
    with per-batch (v, min t) collapse and a fixed-shard exact min
    merge.  Node ids must be < 2^26 for the dense vector (re-key
    upstream otherwise).

    Returns (user_id, t_infect) for nodes reached within ``rounds``
    hops, seeds at t=0."""
    import ray

    contacts = contacts.materialize()  # one streamed pass per round

    def bounds(b: pa.Table) -> pa.Table:
        m = int(
            max(
                b["u"].to_numpy().max(initial=0),
                b["v"].to_numpy().max(initial=0),
            )
        )
        return pa.table({"mx": pa.array([m], pa.int64())})

    mx = max(
        int(r["mx"]) for r in contacts.map_batches(bounds, batch_format="pyarrow").take_all()
    )
    mx = max(mx, int(seeds.max(initial=0)))
    assert mx < (1 << 26), "dense infection vector assumes node ids < 2^26"
    T = np.full(mx + 1, big, dtype=np.int64)
    T[np.asarray(seeds, dtype=np.int64)] = 0

    def prop_partial(b: pa.Table, *, ref) -> pa.Table:
        empty = pa.table(
            {
                "_m": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "t": pa.array([], pa.int64()),
            }
        )
        if len(b) == 0:
            return empty
        t_vec = ray.get(ref)
        u = b["u"].to_numpy().astype(np.int64)
        v = b["v"].to_numpy().astype(np.int64)
        h = b["t"].to_numpy().astype(np.int64)
        ok = h >= t_vec[u]
        if not ok.any():
            return empty
        v, h = v[ok], h[ok]
        o = np.lexsort((h, v))
        v, h = v[o], h[o]
        first = np.r_[True, v[1:] != v[:-1]]
        return pa.table(
            {
                "_m": pa.array(
                    (int_hash64(v[first]) % np.uint64(n_merge)).astype(np.int64)
                ),
                "v": pa.array(v[first]),
                "t": pa.array(h[first]),  # per-batch min t per v
            }
        )

    def min_merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("v", sort=False)["t"].min().reset_index()
        return pd.DataFrame(
            {"v": s["v"].astype(np.int64), "t": s["t"].astype(np.int64)}
        )

    for _ in range(rounds):
        ref = ray.put(T)
        cand = (
            contacts.map_batches(
                lambda b, *, _r=ref: prop_partial(b, ref=_r),
                batch_format="pyarrow",
            )
            .groupby("_m")
            .map_groups(min_merge, batch_format="pandas")
            .to_pandas()
        )
        newT = T.copy()
        if len(cand):
            vv = cand["v"].to_numpy().astype(np.int64)
            tt = cand["t"].to_numpy().astype(np.int64)
            np.minimum.at(newT, vv, tt)
        if (newT == T).all():
            break  # fixed point: remaining rounds are exact no-ops
        T = newT

    inf = np.flatnonzero(T < big)
    return pa.table(
        {
            "user_id": pa.array(inf.astype(np.int64)),
            "t_infect": pa.array(T[inf]),
        }
    )


def weighted_cooccur_edges(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    n_shards: int = 64,
) -> rd.Dataset:
    """Symmetric weighted item graph from basket co-occurrence: edge
    weight ``w = 1 + 1000 // n_baskets`` (strong ties are CHEAP — the
    inverse-strength metric shortest-path queries want), exact pair
    counts via the cooccur_topk two-pass shape without the top-k cut."""
    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.dedup import _run_pairs

    def shard(b: pa.Table) -> pa.Table:
        k = b[basket_col].to_numpy()
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(k) % np.uint64(n_shards)).astype(np.int64)
                ),
                basket_col: b[basket_col],
                item_col: b[item_col],
            }
        )

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "packed": np.array([], np.int64),
                "n": np.array([], np.int64),
                "_ps": np.array([], np.int64),
            }
        )
        if len(g) == 0:
            return empty
        bk = g[basket_col].to_numpy()
        it = g[item_col].to_numpy()
        o = np.lexsort((it, bk))
        bk, it = bk[o], it[o]
        uniq = np.r_[True, (bk[1:] != bk[:-1]) | (it[1:] != it[:-1])]
        bk, it = bk[uniq], it[uniq]
        ia, ib = _run_pairs(bk)
        if len(ia) == 0:
            return empty
        packed = (it[ia].astype(np.int64) << np.int64(32)) | it[ib].astype(
            np.int64
        )
        pu, cnt = np.unique(packed, return_counts=True)
        return pd.DataFrame(
            {
                "packed": pu,
                "n": cnt.astype(np.int64),
                "_ps": (int_hash64(pu) % np.uint64(n_shards)).astype(np.int64),
            }
        )

    def to_edges(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "src": np.array([], np.int64),
                    "dst": np.array([], np.int64),
                    "w": np.array([], np.int64),
                }
            )
        pu, inv = np.unique(g["packed"].to_numpy(), return_inverse=True)
        n = np.bincount(inv, weights=g["n"].to_numpy()).astype(np.int64)
        i1 = (pu >> np.int64(32)).astype(np.int64)
        i2 = (pu & np.int64(0xFFFFFFFF)).astype(np.int64)
        w = np.int64(1) + np.int64(1000) // n
        return pd.DataFrame(
            {
                "src": np.concatenate([i1, i2]),
                "dst": np.concatenate([i2, i1]),
                "w": np.concatenate([w, w]),
            }
        )

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(gen_pairs, batch_format="pandas")
        .groupby("_ps")
        .map_groups(to_edges, batch_format="pandas")
    )


def sssp_fixed_rounds(
    edges: rd.Dataset,
    rounds: int = 4,
    n_merge: int = 32,
    source: int | None = None,
) -> pa.Table:
    """Single-source WEIGHTED shortest paths by ``rounds`` Bellman-Ford
    relaxations — the weighted companion of :func:`bfs_hops` (same
    bounded-round rule: never run to convergence on an unknown graph at
    scale; ``rounds`` caps the hop count of the reported paths).  Source
    defaults to the smallest node id (deterministic, SQL-selectable).

    Per round the driver broadcasts the REACHED (node, dist) table
    (node-cardinality — the pagerank rule) and the edge set streams once
    through ``map_batches``: each batch gathers dist[src] by binary
    search, emits per-batch min-collapsed (dst, dist+w) candidates, a
    fixed-shard min merge reduces them, and the driver folds the new
    minima in.  All arithmetic is int64 min/plus — bit-reproducible by
    the unrolled AS MATERIALIZED CTE twin (two refs per round: the
    raster_jacobi inlining lesson)."""
    edges = edges.materialize()  # one pass per round + the source scan

    if source is None:
        def src_min(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"m": pa.array([], pa.int64())})
            return pa.table(
                {"m": pa.array([int(b["src"].to_numpy().min())], pa.int64())}
            )

        source = int(
            edges.map_batches(src_min, batch_format="pyarrow").min("m")
        )

    from geoglue_ray.functions.texthash import int_hash64

    nodes = np.array([source], dtype=np.int64)
    dist = np.array([0], dtype=np.int64)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.array([], np.int64), "val": np.array([], np.int64)}
        )

    for _ in range(rounds):
        ref = ray.put((nodes, dist))

        def relax(b: pa.Table, ref=ref) -> pa.Table:
            nn, dd = ray.get(ref)
            s = b["src"].to_numpy().astype(np.int64)
            t = b["dst"].to_numpy().astype(np.int64)
            w = b["w"].to_numpy().astype(np.int64)
            idx = np.searchsorted(nn, s)
            idx_c = np.clip(idx, 0, len(nn) - 1)
            hit = nn[idx_c] == s
            t, cand = t[hit], dd[idx_c[hit]] + w[hit]
            if len(t) == 0:
                return pa.table(
                    {
                        "_m": pa.array([], pa.int64()),
                        "node": pa.array([], pa.int64()),
                        "val": pa.array([], pa.int64()),
                    }
                )
            o = np.lexsort((cand, t))
            t, cand = t[o], cand[o]
            first = np.r_[True, t[1:] != t[:-1]]
            t, cand = t[first], cand[first]  # per-batch min per dst
            return pa.table(
                {
                    "_m": pa.array(
                        (int_hash64(t) % np.uint64(n_merge)).astype(np.int64)
                    ),
                    "node": pa.array(t),
                    "val": pa.array(cand),
                }
            )

        def min_merge(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return _empty()
            t = g["node"].to_numpy().astype(np.int64)
            v = g["val"].to_numpy().astype(np.int64)
            o = np.lexsort((v, t))
            t, v = t[o], v[o]
            first = np.r_[True, t[1:] != t[:-1]]
            return pd.DataFrame({"node": t[first], "val": v[first]})

        upd = (
            edges.map_batches(relax, batch_format="pyarrow")
            .groupby("_m")
            .map_groups(min_merge, batch_format="pandas")
            .to_pandas()  # bounded: reached-node cardinality
        )
        # fold: min(existing, candidate), append newly reached
        all_nodes = np.union1d(nodes, upd["node"].to_numpy().astype(np.int64))
        new_dist = np.full(len(all_nodes), np.int64(1) << np.int64(60), np.int64)
        pos = np.searchsorted(all_nodes, nodes)
        new_dist[pos] = dist
        up = np.searchsorted(all_nodes, upd["node"].to_numpy().astype(np.int64))
        np.minimum.at(new_dist, up, upd["val"].to_numpy().astype(np.int64))
        nodes, dist = all_nodes, new_dist

    return pa.table({"node": pa.array(nodes), "dist": pa.array(dist)})
