"""Device-traceback escape path: host replay fallback.

``device_backtrack`` returns ``None`` when the on-device walk escapes the
stored direction rows (``ops/traceback_device.py`` sets res[3]); the host
wrappers must then replay the walk on the host over the same fetched
direction bytes, never assign ``None`` into ``ez.cigar`` silently.

These tests force the escape by stubbing ``device_backtrack`` to return
``None`` and assert the host replay produces the exact spec CIGAR.
"""
import numpy as np
import pytest

from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import simple_mat
from ksw2_tpu.spec import diagdiff


def _pair(rng, lq, lt):
    q = rng.integers(0, 4, size=lq).astype(np.int32)
    t = q[:lt].copy() if lt <= lq else np.concatenate(
        [q, rng.integers(0, 4, size=lt - lq)]).astype(np.int32)
    mut = rng.random(lt) < 0.12
    t = np.where(mut, rng.integers(0, 4, size=lt), t).astype(np.int32)
    return q, t


@pytest.mark.parametrize("family", ["extz", "extd", "exts"])
def test_host_replay_on_escape(monkeypatch, family):
    rng = np.random.default_rng(7)
    q, t = _pair(rng, 96, 112)
    mat = simple_mat(5, 2, -4)

    import ksw2_tpu.ops.extz as extz_mod

    def _always_escape(*a, **k):
        return None

    monkeypatch.setattr(extz_mod, "device_backtrack", _always_escape)

    if family == "extz":
        ez, _ = extz_mod.extz2_device(q, t, 5, mat, 4, 2, w=32,
                                      interpret=True, device_tb=True)
        ezs, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=32)
    elif family == "extd":
        from ksw2_tpu.ops.extd import extd2_device
        ez, _ = extd2_device(q, t, 5, mat, 4, 2, 13, 1, w=32,
                             interpret=True, device_tb=True)
        ezs, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=32)
    else:
        from ksw2_tpu.ops.exts import exts2_device
        ez, _ = exts2_device(q, t, 5, mat, 4, 2, 24, 40,
                             interpret=True, device_tb=True)
        ezs, _ = diagdiff.exts2(q, t, 5, mat, 4, 2, 24, 40)

    assert ez.cigar is not None, "escape fallback must replay on the host"
    assert ez.cigar == ezs.cigar
    assert ez.score == ezs.score
