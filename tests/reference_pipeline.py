"""Single-threaded pure-Python reference pipeline — the oracle the
BASELINE recall gate compares against (SURVEY.md §5 layer 3).

Independently implements the same shingle/num-perm/banding config as
the Spark engine using only the *scalar* hash implementation
(hashes.murmur3_x64_128) and python loops — no shared vectorized
kernels, no Spark — so agreement is evidence, not tautology.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from datasketches_rust_spark.config import DedupConfig
from datasketches_rust_spark.hashes import MASK64, murmur3_x64_128

EMPTY = (1 << 64) - 1


def _shingles(text: str | None, k: int, seed: int) -> list[int]:
    toks = text.lower().split() if text else []
    if not toks:
        return []
    th = [murmur3_x64_128(t.encode("utf-8"), seed)[0] >> 1 for t in toks]
    groups = [th] if len(toks) < k else [th[i : i + k] for i in range(len(toks) - k + 1)]
    out = []
    for g in groups:
        buf = b"".join(int(x).to_bytes(8, "little") for x in g)
        out.append(murmur3_x64_128(buf, seed)[0] >> 1)
    return out


def _signature(text: str | None, cfg) -> list[int]:
    sh = _shingles(text, cfg.shingle_k, cfg.seed)
    if not sh:
        return [EMPTY] * cfg.num_perm
    a, b = cfg.permutations()
    return [min((int(a[i]) * x + int(b[i])) & MASK64 for x in sh) for i in range(cfg.num_perm)]


def _band_keys(sig: list[int], cfg) -> list[int]:
    if all(s == EMPTY for s in sig):
        return [EMPTY] * cfg.bands
    r = cfg.rows_per_band
    keys = []
    for j in range(cfg.bands):
        buf = b"".join(int(x).to_bytes(8, "little") for x in sig[j * r : (j + 1) * r])
        keys.append(murmur3_x64_128(buf, cfg.seed + j)[0])
    return keys


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def reference_text_edges(ids: list, texts: list, cfg: DedupConfig) -> set[tuple]:
    mh = cfg.minhash
    sigs = {i: _signature(t, mh) for i, t in zip(ids, texts)}
    buckets: dict[tuple, list] = {}
    for i in ids:
        for band_id, key in enumerate(_band_keys(sigs[i], mh)):
            if key == EMPTY:
                continue
            buckets.setdefault((band_id, key), []).append(i)
    pairs: dict[tuple, int] = {}
    for members in buckets.values():
        ms = sorted(set(members))
        if len(ms) < 2:
            continue
        if len(ms) <= cfg.max_bucket_size:
            cand = [(ms[x], ms[y], 0) for x in range(len(ms)) for y in range(x + 1, len(ms))]
        else:
            cand = [(ms[x], ms[x + 1], 1) for x in range(len(ms) - 1)]
        for a, b, ch in cand:
            pairs[(a, b)] = min(pairs.get((a, b), 1), ch)
    edges = set()
    for (a, b), ch in pairs.items():
        if ch == 1:
            edges.add((a, b))
            continue
        sa, sb = sigs[a], sigs[b]
        jac = sum(1 for x, y in zip(sa, sb) if x == y) / mh.num_perm
        if jac >= mh.jaccard_threshold:
            edges.add((a, b))
    return edges


def reference_image_edges(ids: list, phashes: list, cfg: DedupConfig) -> set[tuple]:
    sh = cfg.simhash
    width = 64 // sh.num_chunks
    mask = (1 << width) - 1
    buckets: dict[tuple, list] = {}
    ph = {i: int(p) & MASK64 for i, p in zip(ids, phashes)}
    for i in ids:
        for j in range(sh.num_chunks):
            buckets.setdefault((j, (ph[i] >> (j * width)) & mask), []).append(i)
    edges = set()
    for members in buckets.values():
        ms = sorted(set(members))
        if len(ms) < 2:
            continue
        if len(ms) <= cfg.max_bucket_size:
            cand = [(ms[x], ms[y]) for x in range(len(ms)) for y in range(x + 1, len(ms))]
        else:
            cand = list(zip(ms[:-1], ms[1:]))
        for a, b in cand:
            if bin(ph[a] ^ ph[b]).count("1") <= sh.hamming_threshold:
                edges.add((a, b))
    return edges


def reference_clusters(edges: set[tuple], all_ids: list) -> pd.DataFrame:
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return pd.DataFrame(
        {"id": list(all_ids), "cluster_id": [uf.find(i) for i in all_ids]}
    )


def reference_multimodal_clusters(rows: pd.DataFrame, cfg: DedupConfig | None = None) -> pd.DataFrame:
    cfg = cfg or DedupConfig()
    ids = rows["image_id"].tolist()
    e1 = reference_text_edges(ids, rows["caption"].tolist(), cfg)
    e2 = reference_image_edges(ids, rows["phash"].tolist(), cfg)
    return reference_clusters(e1 | e2, ids)


def reference_text_clusters(ids: list, texts: list, cfg: DedupConfig | None = None) -> pd.DataFrame:
    cfg = cfg or DedupConfig()
    return reference_clusters(reference_text_edges(ids, texts, cfg), ids)


def cluster_pairs(df: pd.DataFrame) -> set[tuple]:
    out = set()
    for _, grp in df.groupby("cluster_id"):
        ids = sorted(grp["id"])
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                out.add((ids[i], ids[j]))
    return out
