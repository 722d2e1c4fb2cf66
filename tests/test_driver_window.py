"""Rotation discipline for the driver CORRECTNESS window.

The driver certifies the FIRST 50 insertion-order registry entries each
round; rotation only grows cumulative coverage if the window never
re-spends a slot on an already-certified query.  This pins that
invariant against the recorded CORRECTNESS history, so a careless
reorder fails CI instead of wasting a round.
"""

from __future__ import annotations

import glob
import json
import os

from helium_arango_etl_spark.registry import ORACLE, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _certified() -> set[str]:
    out: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        d = json.load(open(f))
        out |= {
            k
            for k, v in d.items()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        }
    return out


def test_window_spends_no_slot_on_certified_queries():
    window = list(QUERIES)[:50]
    overlap = sorted(set(window) & _certified())
    assert not overlap, f"window wastes slots on already-certified: {overlap}"


def test_window_is_fully_oracled():
    window = list(QUERIES)[:50]
    missing = [k for k in window if k not in ORACLE]
    assert not missing, f"window entries without oracles: {missing}"


def test_simhash_regression_is_rewindowed():
    """simhash_near_pairs is the only historical red driver row (r1
    hash_match:false); it must stay in the window until a green row
    erases it."""
    certified = _certified()
    if "simhash_near_pairs" not in certified:
        assert "simhash_near_pairs" in list(QUERIES)[:50]
