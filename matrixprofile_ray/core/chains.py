"""Time-series chains (Matrix Profile VII, Zhu/Imamura/Keogh 2017).

A chain link i -> j exists when j is i's RIGHT nearest neighbor
(rpi[i] == j) AND i is j's LEFT nearest neighbor (lpi[j] == i) — the
bidirectional-consistency rule. Valid links form disjoint directed
paths (each node has at most one successor and one valid predecessor),
so the all-chain set partitions the index space and the unanchored
chain is simply the longest path (ties break to the smallest start
index, deterministic).

The reference library has no chains implementation (it stops at
motifs/discords/regimes/snippets); this engine feeds the kernels from
`core.stomp`'s left/right profile indices, or — for the oracle-gated
query — from the brute w=4 left/right argmin that mirrors the DuckDB
SQL bit-for-bit. Chain-following itself is pure integer arithmetic, so
once lpi/rpi agree the chains agree exactly.
"""
from __future__ import annotations

import numpy as np

__all__ = ["chain_links", "all_chain_set", "unanchored_chain"]


def chain_links(idx, lpi, rpi) -> dict[int, int]:
    """Valid bidirectional links {i: successor}. ``idx`` are the window
    indices (possibly non-contiguous when constant windows were
    dropped); ``lpi``/``rpi`` are parallel arrays with -1 for "none"."""
    idx = np.asarray(idx, dtype=np.int64)
    lp = {int(i): int(v) for i, v in zip(idx, np.asarray(lpi))}
    succ = {}
    for i, r in zip(idx, np.asarray(rpi)):
        i, r = int(i), int(r)
        if r != -1 and lp.get(r, -2) == i:
            succ[i] = r
    return succ


def all_chain_set(idx, lpi, rpi) -> list[list[int]]:
    """Every maximal chain (length >= 1), ordered by start index."""
    succ = chain_links(idx, lpi, rpi)
    targets = set(succ.values())
    chains = []
    for s in sorted(int(v) for v in np.asarray(idx)):
        if s in targets:
            continue
        chain = [s]
        while chain[-1] in succ:
            chain.append(succ[chain[-1]])
        chains.append(chain)
    return chains


def unanchored_chain(idx, lpi, rpi) -> list[int]:
    """The longest chain; ties break to the smallest start index."""
    best: list[int] = []
    for chain in all_chain_set(idx, lpi, rpi):
        if len(chain) > len(best):
            best = chain
    return best
