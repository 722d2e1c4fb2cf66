"""Rotation discipline for the driver CORRECTNESS window.

The driver certifies the FIRST 50 insertion-order registry entries each
round; rotation only grows cumulative coverage if the window never
re-spends a slot on an already-certified query.  This pins that
invariant against the recorded CORRECTNESS history, so a careless
reorder fails CI instead of wasting a round.

Certification here deliberately mirrors registry._certification_state
with an INDEPENDENT implementation (same glob pattern, same
latest-round-verdict rule): a query is certified iff its most recent
driver row is fully green, so a later red row rotates it back in.
"""

from __future__ import annotations

import glob
import json
import os
import re

from helium_arango_etl_spark.registry import ORACLE, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _history() -> list[tuple[int, dict]]:
    out = []
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if m:
            out.append((int(m.group(1)), json.load(open(f))))
    return sorted(out, key=lambda t: t[0])


def _certified() -> set[str]:
    latest: dict[str, bool] = {}
    for _rnd, d in _history():
        for k, v in d.items():
            latest[k] = bool(
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            )
    return {k for k, green in latest.items() if green}


def test_window_spends_no_slot_on_certified_queries():
    window = list(QUERIES)[:50]
    certified = _certified()
    backlog = [k for k in QUERIES if k in ORACLE and k not in certified]
    if len(backlog) >= 50:
        overlap = sorted(set(window) & certified)
        assert not overlap, f"window wastes slots on already-certified: {overlap}"
    else:
        # backlog exhausted: every never-certified oracled query must be in
        # the window; the rest is certified padding (re-verification), which
        # is the designed behavior, not a wasted slot.
        missing = sorted(set(backlog) - set(window))
        assert not missing, f"never-certified queries left out of window: {missing}"


def test_window_is_fully_oracled():
    window = list(QUERIES)[:50]
    missing = [k for k in window if k not in ORACLE]
    assert not missing, f"window entries without oracles: {missing}"


def test_certified_uses_latest_round_verdict():
    """A name red in its LATEST round must not count as certified even if
    an earlier round was green (the simhash_near_pairs r1 precedent,
    reversed).  Synthesizes the check against the real history shape."""
    history = _history()
    assert history, "driver history should exist from round 1 on"
    # every certified name's last row is green by construction
    certified = _certified()
    last: dict[str, bool] = {}
    for _rnd, d in history:
        for k, v in d.items():
            last[k] = bool(
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            )
    for k, green in last.items():
        assert (k in certified) == green


def test_registry_and_test_glob_agree():
    """The registry derivation and this backstop must read the SAME
    history files, including two-digit rounds (CORRECTNESS_r10.json+)."""
    from helium_arango_etl_spark import registry as R

    reg_rounds = [rnd for rnd, _ in R._history_rounds(REPO)]
    test_rounds = [rnd for rnd, _ in _history()]
    assert reg_rounds == test_rounds


def test_certification_state_on_synthetic_history(tmp_path):
    """Unit-pin registry._certification_state on a synthetic history:
    two-digit round files sort numerically (r2 < r10), a red row in a
    LATER round drops a previously-green name, and a green row in a
    later round restores it."""
    import json as _json

    from helium_arango_etl_spark import registry as R

    g = {"rows_match": True, "schema_match": True, "hash_match": True}
    r = {"rows_match": True, "schema_match": True, "hash_match": False}
    (tmp_path / "CORRECTNESS_r2.json").write_text(
        _json.dumps({"a": g, "b": g, "c": r})
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        _json.dumps({"a": r, "c": g})
    )
    rounds = [rnd for rnd, _ in R._history_rounds(str(tmp_path))]
    assert rounds == [2, 10]  # numeric, not lexicographic (10 > 2)
    certified, last_green = R._certification_state(str(tmp_path))
    assert certified == {"b", "c"}  # a regressed in r10; c recovered
    assert last_green == {"a": 2, "b": 2, "c": 10}


def test_simhash_regression_is_rewindowed():
    """simhash_near_pairs is the only historical red driver row (r1
    hash_match:false); it must stay in the window until a green row
    erases it."""
    certified = _certified()
    if "simhash_near_pairs" not in certified:
        assert "simhash_near_pairs" in list(QUERIES)[:50]
