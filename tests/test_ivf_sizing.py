"""ivf_params measured-table sizing (VERDICT r11 item 4): the probed
fraction is inverted from the r12 nprobe->recall sweep
(tools/ivf_sweep.py) instead of a power-law fit that over-predicted
at small K (the 0.775 plateau). Pure-python — default tranche.
"""

import math

from datafusion_functions_financial_spark.operators.ivf import (
    IVF_TARGET_MARGIN, _RECALL_TABLE, _frac_for, _sizing_frac,
    ivf_params,
)


def test_table_levels_monotone():
    # within each K level, recall must rise with the probed fraction
    for _k, curve in _RECALL_TABLE:
        fracs = [f for f, _ in curve]
        recs = [r for _, r in curve]
        assert fracs == sorted(fracs)
        assert recs == sorted(recs)


def test_frac_for_inverts_the_table():
    _k, curve = _RECALL_TABLE[1]  # K=336
    # exactly at a measured point
    assert abs(_frac_for(curve, 0.8375) - 0.271) < 1e-9
    # between points: bracketed
    f = _frac_for(curve, 0.85)
    assert 0.271 < f < 0.351
    # K=336 measured 1.0 recall at frac 0.801 — target 1.0 resolves
    # to that point, not to probe-everything
    assert _frac_for(curve, 1.0) == 0.801
    # past the measured range (K=93 tops out at 0.9875): everything
    assert _frac_for(_RECALL_TABLE[0][1], 1.0) == 1.0


def test_sizing_frac_decreases_with_k():
    # more cells -> each probed cell is smaller but better targeted;
    # the measured fraction needed for a fixed target FALLS with K
    f100 = _sizing_frac(100, 0.75)
    f316 = _sizing_frac(316, 0.75)
    f1000 = _sizing_frac(1000, 0.75)
    assert f100 > f316 > f1000


def test_default_target_sits_on_085_contour():
    # margin 0.10 over the 0.75 default: the sized fracs must land on
    # the table's ~0.85 contour (measured delivered 0.8625/0.85/0.85
    # at 10K/100K/1M — r12 recall check)
    assert IVF_TARGET_MARGIN == 0.10
    sm, npb = ivf_params(10_000, 0.75)
    assert (sm, npb) == (100, 40)
    sm, npb = ivf_params(100_000, 0.75)
    assert (sm, npb) == (316, 96)
    sm, npb = ivf_params(1_000_000, 0.75)
    assert (sm, npb) == (1000, 188)


def test_scale_invariance_of_probed_fraction():
    # beyond the last measured level the FRACTION is held (cells grow
    # as sqrt(n), probed share stays bounded) — the 100 TB property
    k8 = max(4, int(round(math.sqrt(10 ** 8))))
    _sm, npb = ivf_params(10 ** 8, 0.75)
    assert abs(npb / k8 - _sizing_frac(1000, 0.75)) < 0.01


def test_nprobe_never_exceeds_cells():
    for n in (16, 100, 5000, 10 ** 6):
        k = max(4, int(round(math.sqrt(n))))
        _sm, npb = ivf_params(n, 0.99)
        assert npb <= k
