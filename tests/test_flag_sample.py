

def test_push_clear_reaches_min_distance():
    import numpy as np
    from cbgbench_tpu.sampling.flag_sample import _push_clear

    rec = np.zeros((5, 3), np.float32)
    rec[:, 0] = np.arange(5) * 1.5
    pos = np.array([[0.5, 0.5, 0.0], [1.5, 0.5, 0.0]], np.float32)
    out = _push_clear(pos, rec, min_d=2.4)
    d = np.linalg.norm(out[:, None] - rec[None], axis=-1)
    assert d.min() >= 2.3, d.min()
    # rigid: intra-motif distances preserved
    d0 = np.linalg.norm(pos[0] - pos[1])
    d1 = np.linalg.norm(out[0] - out[1])
    assert abs(d0 - d1) < 1e-5


def test_push_clear_noop_when_clear():
    import numpy as np
    from cbgbench_tpu.sampling.flag_sample import _push_clear

    rec = np.zeros((3, 3), np.float32) + 10.0
    pos = np.zeros((2, 3), np.float32)
    out = _push_clear(pos, rec, min_d=2.4)
    assert np.allclose(out, pos)
