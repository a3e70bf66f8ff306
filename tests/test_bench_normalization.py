"""bench.py's host-speed normalization contract (r11 verdict #2): the
probe correction emits a number ONLY where it is honest — observed probe
inside the pinned host-family band AND a stable host across the suite.
Pure-function tests; no Spark session."""

import bench


def test_in_band_stable_host_emits_scaled_value():
    # observed median == the pin → no scaling
    v, flags = bench.normalize_warm(20.0, 0.20, 0.20)
    assert v == 20.0
    assert not flags["probe_out_of_band"] and not flags["probe_drifted"]
    assert flags["probe_ratio"] == 1.0
    # 25% slower host, stable → scaled down by the ratio
    v, flags = bench.normalize_warm(20.0, 0.25, 0.25)
    assert v == 16.0
    assert not flags["probe_out_of_band"] and not flags["probe_drifted"]


def test_band_covers_recorded_driver_hosts():
    # the r10/r11 driver hosts (0.164 / ~0.20 / 0.243) must all normalize
    # — the old r08-r09 pin left the field null on every recent host
    for probe in (0.164, 0.20, 0.243):
        v, flags = bench.normalize_warm(20.0, probe, probe)
        assert v is not None, probe
        assert not flags["probe_out_of_band"]


def test_out_of_band_nulls():
    for probe in (0.05, 0.45):  # beyond either band edge
        v, flags = bench.normalize_warm(20.0, probe, probe)
        assert v is None
        assert flags["probe_out_of_band"]


def test_intra_run_drift_nulls_even_when_median_in_band():
    # the r11 driver run: 0.164 → 0.243 (+48% mid-suite).  The median
    # (0.2035) is comfortably in-band — but a host that changed speed
    # mid-suite has no single honest correction factor
    v, flags = bench.normalize_warm(20.0, 0.164, 0.243)
    assert not flags["probe_out_of_band"]
    assert flags["probe_drifted"]
    assert v is None
    # the r11 judge's own run drifted 2.8× (0.37 → 0.133): also null
    v, flags = bench.normalize_warm(20.0, 0.37, 0.133)
    assert flags["probe_drifted"] and v is None
    # mild drift (under the gate) still normalizes off the median
    v, flags = bench.normalize_warm(20.0, 0.18, 0.22)
    assert not flags["probe_drifted"] and v is not None


def test_drift_ratio_reported():
    _, flags = bench.normalize_warm(10.0, 0.1, 0.3)
    assert flags["probe_intra_run_drift"] == 3.0
