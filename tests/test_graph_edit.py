"""Tests for the edit-distance near-dup stage and fixed-point PageRank."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geoglue_ray.stages.dedup import (
    _pad_codepoints,
    banded_levenshtein,
    edit_neardup,
)


def _brute_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), dtype=np.int64)
    D[:, 0] = np.arange(la + 1)
    D[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i, j] = min(
                D[i - 1, j] + 1,
                D[i, j - 1] + 1,
                D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
            )
    return int(D[la, lb])


def test_banded_levenshtein_matches_brute_force():
    rng = random.Random(7)
    alph = "abcde"
    pairs = []
    for _ in range(300):
        a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 30)))
        b = list(a)
        for _ in range(rng.randint(0, 10)):
            op = rng.choice("ids")
            if op == "i":
                b.insert(rng.randint(0, len(b)), rng.choice(alph))
            elif b:
                p = rng.randrange(len(b))
                if op == "d":
                    b.pop(p)
                else:
                    b[p] = rng.choice(alph)
        pairs.append((a, "".join(b)))
    for k in (1, 3, 8):
        ta = [a for a, b in pairs if abs(len(a) - len(b)) <= k]
        tb = [b for a, b in pairs if abs(len(a) - len(b)) <= k]
        Ma, La = _pad_codepoints(ta)
        Mb, Lb = _pad_codepoints(tb)
        got = banded_levenshtein(Ma, La, Mb, Lb, k)
        exp = np.array([min(_brute_lev(a, b), k + 1) for a, b in zip(ta, tb)])
        assert np.array_equal(got, exp), f"k={k}"


def test_banded_levenshtein_rejects_out_of_band_lengths():
    Ma, La = _pad_codepoints(["abcdef"])
    Mb, Lb = _pad_codepoints(["a"])
    with pytest.raises(ValueError):
        banded_levenshtein(Ma, La, Mb, Lb, 2)


def test_banded_levenshtein_unicode_codepoints():
    # non-ASCII pairs exercise the UTF-32 padding path
    pairs = [("héllo", "hallo"), ("日本語です", "日本語だよ"), ("", "ab")]
    Ma, La = _pad_codepoints([a for a, _ in pairs])
    Mb, Lb = _pad_codepoints([b for _, b in pairs])
    got = banded_levenshtein(Ma, La, Mb, Lb, 3)
    exp = [min(_brute_lev(a, b), 4) for a, b in pairs]
    assert got.tolist() == exp


def test_edit_neardup_finds_cross_bucket_pairs(ray_session):
    import ray.data as rd

    # k = 3 -> bucket width 4; lengths 7 ("abcdefg") and 8 land in buckets
    # 1 and 2 — the pair must still be found (adjacent-bucket emission)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                ["abcdefg", "abcdefgh", "zzzzzzzzzzzz", "zzzzzzzzzzzy", "qq"]
            ),
        }
    )
    out = (
        edit_neardup(rd.from_arrow(docs), max_edits=3, n_shards=8)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {
        "doc_a": [1, 3],
        "doc_b": [2, 4],
        "lev": [1, 1],
    }


def test_edit_neardup_blocks_are_exact(ray_session):
    import ray.data as rd

    # identical texts in different blocks must NOT pair
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["same text", "same text", "same text"]),
            "lang": pa.array(["en", "fr", "en"]),
        }
    )
    out = edit_neardup(
        rd.from_arrow(docs), max_edits=2, block_cols=["lang"], n_shards=4
    ).to_pandas()
    assert out.to_dict("list") == {"doc_a": [1], "doc_b": [3], "lev": [0]}


def test_pagerank_fixedpoint_matches_exact_python_ints(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.graph import pagerank_fixedpoint

    # triangle + pendant: 1-2, 2-3, 1-3, 3-4 (symmetric)
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = pa.table(
        {
            "src": pa.array([a for a, b in und] + [b for a, b in und], pa.int64()),
            "dst": pa.array([b for a, b in und] + [a for a, b in und], pa.int64()),
        }
    )
    got = pagerank_fixedpoint(rd.from_arrow(edges), iters=3).to_pandas()

    # exact reference with unbounded Python ints
    scale = 1 << 32
    adj = {1: [2, 3], 2: [1, 3], 3: [1, 2, 4], 4: [3]}
    rank = {n: scale for n in adj}
    for _ in range(3):
        contrib = {n: rank[n] // len(adj[n]) for n in adj}
        rank = {
            n: 15 * scale // 100
            + 85 * sum(contrib[m] for m in adj[n]) // 100
            for n in adj
        }
    exp = pd.DataFrame(
        {"node": sorted(adj), "rank": [rank[n] for n in sorted(adj)]}
    )
    assert got.to_dict("list") == exp.to_dict("list")


def test_basket_edges_distinct_and_symmetric(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.graph import basket_edges

    t = pa.table(
        {
            "basket": pa.array([10, 10, 10, 11, 11, 12], pa.int64()),
            # item 7 twice in basket 10 -> still one pair per partner;
            # pair (7, 8) occurs in baskets 10 and 11 -> one edge
            "item": pa.array([7, 7, 8, 7, 8, 9], pa.int64()),
        }
    )
    out = (
        basket_edges(rd.from_arrow(t), "basket", "item", n_shards=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {"src": [7, 8], "dst": [8, 7]}


def test_triangle_counts_matches_brute_force(ray_session):
    """Random graph: per-node triangle counts vs an O(n^3) numpy brute
    force over the adjacency matrix."""
    import ray.data as rd

    from geoglue_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(7)
    n = 40
    adj = np.triu(rng.random((n, n)) < 0.2, k=1)
    adj = adj | adj.T
    src, dst = np.nonzero(adj)  # both directions, distinct
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src.astype(np.int64)),
                  "dst": pa.array(dst.astype(np.int64))})
    ).repartition(5)
    out = triangle_counts(edges, n_shards=8, n_merge=4).to_pandas()
    a = adj.astype(np.int64)
    per_node = np.diag(a @ a @ a) // 2  # closed wedges at each node / 2
    exp = {i: int(per_node[i]) for i in range(n) if per_node[i] > 0}
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == exp


def test_triangle_counts_simple(ray_session):
    """4-cycle with one chord = exactly 2 triangles, corners counted."""
    import ray.data as rd

    from geoglue_ray.stages.graph import triangle_counts

    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    src = np.array([a for a, b in und] + [b for a, b in und], np.int64)
    dst = np.array([b for a, b in und] + [a for a, b in und], np.int64)
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    out = triangle_counts(edges, n_shards=4, n_merge=2).to_pandas()
    assert dict(zip(out["node"], out["n_triangles"])) == {0: 2, 1: 1, 2: 2, 3: 1}


def test_triangle_counts_modes_identical(ray_session):
    """Broadcast and ship match modes are byte-identical."""
    import ray.data as rd

    from geoglue_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(21)
    n = 60
    adj = np.triu(rng.random((n, n)) < 0.15, k=1)
    adj = adj | adj.T
    src, dst = np.nonzero(adj)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src.astype(np.int64)),
                  "dst": pa.array(dst.astype(np.int64))})
    ).repartition(4)
    bc = triangle_counts(edges, n_shards=8, n_merge=4).to_pandas()
    ship = triangle_counts(
        edges, n_shards=8, n_merge=4, broadcast_edges_below=0
    ).to_pandas()
    assert bc.equals(ship)


def test_bfs_hops_matches_brute_force(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.graph import bfs_hops

    rng = np.random.default_rng(13)
    n = 60
    und = set()
    while len(und) < 90:
        a, b = sorted(rng.integers(1, n + 1, 2))
        if a != b:
            und.add((int(a), int(b)))
    und = sorted(und)
    edges = pa.table(
        {
            "src": pa.array([a for a, b in und] + [b for a, b in und], pa.int64()),
            "dst": pa.array([b for a, b in und] + [a for a, b in und], pa.int64()),
        }
    )
    got = (
        bfs_hops(rd.from_arrow(edges).repartition(4), n_sources=3, max_hops=4)
        .to_pandas()
        .sort_values(["src_id", "node"])
        .reset_index(drop=True)
    )

    # brute reference: per-source frontier BFS over an adjacency dict
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    expect = []
    for s in nodes[:3]:
        dist = {s: 0}
        frontier = {s}
        for d in range(1, 5):
            frontier = {
                m for x in frontier for m in adj[x] if m not in dist
            }
            for m in frontier:
                dist[m] = d
        expect += [(s, m, d) for m, d in dist.items()]
    exp = (
        pd.DataFrame(expect, columns=["src_id", "node", "hops"])
        .sort_values(["src_id", "node"])
        .reset_index(drop=True)
    )
    assert got.to_dict("list") == exp.to_dict("list")
