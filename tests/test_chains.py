"""Time-series chains (core/chains.py): link rule, all-chain set,
unanchored pick, and the production link to core.stomp's left/right
profile indices."""
from __future__ import annotations

import numpy as np
import pytest

from matrixprofile_ray.core.chains import (
    all_chain_set,
    chain_links,
    unanchored_chain,
)


class TestChainLogic:
    def test_hand_built_links(self):
        # 0 -> 2 -> 4 valid; 1 -> 3 broken (lpi[3] != 1)
        idx = np.arange(5)
        rpi = np.array([2, 3, 4, -1, -1])
        lpi = np.array([-1, -1, 0, 0, 2])
        assert chain_links(idx, lpi, rpi) == {0: 2, 2: 4}
        assert unanchored_chain(idx, lpi, rpi) == [0, 2, 4]

    def test_all_chain_set_partitions(self):
        idx = np.arange(6)
        rpi = np.array([1, 2, -1, 4, 5, -1])
        lpi = np.array([-1, 0, 1, -1, 3, 4])
        chains = all_chain_set(idx, lpi, rpi)
        # two chains of 3; every index appears exactly once
        assert sorted(sum(chains, [])) == list(range(6))
        assert [len(c) for c in chains] == [3, 3]
        # tie on length -> smallest start wins
        assert unanchored_chain(idx, lpi, rpi) == [0, 1, 2]

    def test_singletons(self):
        idx = np.arange(3)
        none = np.array([-1, -1, -1])
        assert all_chain_set(idx, none, none) == [[0], [1], [2]]
        assert unanchored_chain(idx, none, none) == [0]

    def test_noncontiguous_idx(self):
        # constant windows dropped -> gaps in idx
        idx = np.array([0, 2, 5])
        rpi = np.array([2, 5, -1])
        lpi = np.array([-1, 0, 2])
        assert unanchored_chain(idx, lpi, rpi) == [0, 2, 5]


class TestProductionStompLink:
    def test_chain_on_drifting_sine(self, sampledata):
        """Chains from core.stomp's left/right indices on the reference
        suite's real series: every consecutive pair must satisfy the
        bidirectional rule, and a drifting pattern yields a chain > 1."""
        import matrixprofile_ray.core as core

        p = core.stomp(sampledata, 32)
        lpi, rpi = np.asarray(p["lpi"]), np.asarray(p["rpi"])
        idx = np.arange(len(lpi))
        chain = unanchored_chain(idx, lpi, rpi)
        assert len(chain) > 1
        for a, b in zip(chain, chain[1:]):
            assert rpi[a] == b and lpi[b] == a

    def test_links_form_disjoint_paths(self, sampledata):
        import matrixprofile_ray.core as core

        p = core.stomp(sampledata, 32)
        succ = chain_links(np.arange(len(p["lpi"])),
                           p["lpi"], p["rpi"])
        # each node has at most one successor (dict) AND each target
        # is hit at most once (valid predecessor unique)
        targets = list(succ.values())
        assert len(targets) == len(set(targets))
