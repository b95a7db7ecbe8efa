

def test_eval_fg_type_on_fixtures():
    from cbgbench_tpu.chem import read_ligand
    from cbgbench_tpu.data.dataset import example_pairs
    from cbgbench_tpu.tools.substructure import eval_fg_type, fg_counts

    mols = [read_ligand(p[1])[0] for p in example_pairs()]
    counts = fg_counts(mols)
    assert counts["c1ccccc1"] >= 4        # benzene is everywhere
    out = eval_fg_type(mols)
    assert 0.0 < out["fg_type_jsd"] < 1.0
    assert out["fg_type_mae"] > 0.0


def test_eval_fg_type_perfect_match_is_zero_jsd():
    """Feeding the reference distribution itself must give ~0 JSD."""
    import collections

    import numpy as np

    from cbgbench_tpu.tools.substructure import (CROSSDOCKED_FG_FREQ,
                                                 _jsd_over_ref_keys)
    jsd = _jsd_over_ref_keys(dict(CROSSDOCKED_FG_FREQ), CROSSDOCKED_FG_FREQ)
    assert abs(jsd) < 1e-8
