"""Re-emitted results dirs must be self-describing (VERDICT r4 weak #7).

A host-side re-emission (scripts/postprocess_declash.py) copies the source
run's summary.json, so its per-pocket timing entries are byte-identical to
the original's. The artifact itself — not only BASELINE.md prose — must
say where its SDFs came from and what post-processing produced them:
stamp_provenance appends a trailing ``reemitted_from`` entry that
evaluate_cli's denominator reader skips (it requires n_samples+index).
"""

import glob
import json
import os

import pytest

RESULTS = os.path.join(os.path.dirname(__file__), "..", "results")


def _pocket_entries(path):
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception:
        return None, None
    if not isinstance(data, list):
        return None, None
    pockets = [e for e in data if isinstance(e, dict) and "n_samples" in e
               and "index" in e]
    prov = [e for e in data if isinstance(e, dict) and "reemitted_from" in e]
    return pockets, prov


def test_duplicate_summaries_carry_provenance():
    """Group results dirs by their per-pocket timing payload; inside any
    group sharing identical timings (one sampler run, N dirs), at most
    one dir — the original — may lack a reemission stamp."""
    groups = {}
    for summ in sorted(glob.glob(os.path.join(RESULTS, "*", "summary.json"))):
        pockets, prov = _pocket_entries(summ)
        if not pockets:
            continue
        key = json.dumps(pockets, sort_keys=True)
        groups.setdefault(key, []).append((summ, bool(prov)))
    offenders = []
    for key, members in groups.items():
        if len(members) < 2:
            continue
        unstamped = [m for m, has_prov in members if not has_prov]
        if len(unstamped) > 1:
            offenders.append(unstamped)
    assert not offenders, (
        "results dirs share byte-identical sampler summaries but more than "
        f"one lacks a reemitted_from stamp: {offenders}")


def test_stamp_provenance_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from postprocess_declash import stamp_provenance

    d = tmp_path / "reemit"
    d.mkdir()
    with open(d / "summary.json", "w") as f:
        json.dump([{"index": 0, "n_samples": 4, "seconds": 1.0}], f)
    stamp_provenance(str(d), "results/q_src", "flagship")
    pockets, prov = _pocket_entries(str(d / "summary.json"))
    assert len(pockets) == 1 and len(prov) == 1
    assert prov[0]["reemitted_from"] == os.path.normpath("results/q_src")
    assert prov[0]["postprocess"] == "flagship"
    assert "reemitted_at" in prov[0]
    # idempotent: restamping replaces, not duplicates
    stamp_provenance(str(d), "results/q_src", "flagship")
    _, prov2 = _pocket_entries(str(d / "summary.json"))
    assert len(prov2) == 1


@pytest.mark.parametrize("dirname", ["q5_flagship"])
def test_known_reemissions_are_stamped(dirname):
    summ = os.path.join(RESULTS, dirname, "summary.json")
    if not os.path.exists(summ):
        pytest.skip(f"{dirname} not present")
    _, prov = _pocket_entries(summ)
    assert prov, f"{dirname} was re-emitted but carries no provenance entry"
