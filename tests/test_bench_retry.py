"""bench.py steal-window retry logic, pinned without Spark: fake leg
walls and hardware probes drive scaling_section through both branches
(quiet host -> no retry; stolen window -> one extra symmetric pair,
bests kept)."""

import importlib.util
import sys


def load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _patch(mod, walls, hw_values, monkeypatch, bw_values=None):
    "walls/hw_values/bw_values are consumed in call order."
    walls = list(walls)
    hw_values = list(hw_values)
    # bandwidth probe order per section: high(pre), low, high(post)
    # [+ low, high on retry]; default = a flat quiet-bandwidth window
    bw_values = list(bw_values) if bw_values is not None else [100.0] * 8
    monkeypatch.setattr(mod, "ensure_scaling_corpus", lambda n: ("/tmp/fake", 100_000))
    monkeypatch.setattr(mod, "_run_leg_subprocess", lambda cpus, path, n: walls.pop(0))
    monkeypatch.setattr(mod, "hardware_throughput", lambda n, rounds=2: hw_values.pop(0))
    monkeypatch.setattr(mod, "bandwidth_throughput", lambda n: bw_values.pop(0))
    return walls, hw_values


def test_quiet_host_no_retry(monkeypatch):
    mod = load_bench()
    # order: high, low, high, low.  low=4 high=16; perfect scaling 4x
    walls, hw = _patch(mod, [25.0, 100.0, 26.0, 101.0], [1.0, 3.8], monkeypatch)
    out = mod.scaling_section(1000, 4, 16)
    assert walls == [] and hw == []  # exactly 4 legs, 2 probes — no retry
    assert out["scaling_efficiency"] == 1.0
    assert out["wall_high"] == 25.0 and out["wall_low"] == 100.0


def test_stolen_window_triggers_one_retry_pair(monkeypatch):
    mod = load_bench()
    # first 4 legs: high legs stolen (eff = (100/50)/4 = 0.5), control
    # also degraded (hw_eff = 2.8/4 = 0.7 < 0.9) -> retry pair runs and
    # recovers the high leg (25s -> eff 1.0); probes refresh to the best
    walls, hw = _patch(
        mod,
        [50.0, 100.0, 52.0, 101.0, 25.0, 100.0],  # +1 retry (high, low) pair
        [1.0, 2.8, 1.0, 3.9],  # low, high, then refreshed low, high
        monkeypatch,
    )
    out = mod.scaling_section(1000, 4, 16)
    assert walls == [] and hw == []  # retry pair + refreshed probes consumed
    assert out["wall_high"] == 25.0 and out["wall_low"] == 100.0
    assert out["scaling_efficiency"] == 1.0


def test_stolen_job_but_stable_quiet_window_does_not_retry(monkeypatch):
    """A slow JOB in a STABLE quiet window (legs agree within 15%, healthy
    CPU control) is a real result — no retry laundering."""
    mod = load_bench()
    walls, hw = _patch(mod, [50.0, 100.0, 52.0, 101.0], [1.0, 3.9], monkeypatch)
    out = mod.scaling_section(1000, 4, 16)
    assert walls == [] and hw == []
    assert out["scaling_efficiency"] == 0.5  # recorded honestly
    assert out["retried"] is False
    assert out["wall_spread_high"] == 1.04


def test_unstable_legs_with_quiet_control_retries(monkeypatch):
    """The CPU probe is blind to disk/memory-bandwidth interference
    (round-4: same code read 0.957 under an 0.846 control, then 0.692
    under a 0.991 control) — when the job's OWN repeated legs at one
    level disagree by > 15%, the window is proven unstable and one
    bounded symmetric retry runs even though the control looks quiet."""
    mod = load_bench()
    # high legs 70 vs 40 (spread 1.75): best-of eff = (100/40)/4 = 0.625
    # < 0.8, control healthy (3.9/4 ≈ 0.975) — old rule never retried here
    walls, hw = _patch(
        mod,
        [70.0, 100.0, 40.0, 101.0, 25.0, 100.0],  # +1 retry pair
        [1.0, 3.9, 1.0, 3.9],
        monkeypatch,
    )
    out = mod.scaling_section(1000, 4, 16)
    assert walls == [] and hw == []
    assert out["retried"] is True
    assert out["pre_retry_efficiency"] < 0.8
    assert out["wall_high"] == 25.0 and out["scaling_efficiency"] == 1.0
    assert out["wall_spread_high"] == 1.75  # the audit trail of WHY


def test_bandwidth_unstable_window_triggers_retry(monkeypatch):
    """Round-5: the bandwidth probe closes the round-4 attribution gap —
    a below-target reading whose before/after bandwidth measurements
    disagree (> 15%) is memory-contended even when the CPU control AND
    the job's own leg spreads look quiet, and becomes retry-eligible."""
    mod = load_bench()
    walls, hw = _patch(
        mod,
        [50.0, 100.0, 51.0, 101.0, 25.0, 100.0],  # legs stable; +retry pair
        [1.0, 3.9, 1.0, 3.9],                     # CPU control healthy
        monkeypatch,
        # high(pre)=160, low=60, high(post)=100 -> spread 1.6; retry
        # refreshes low/high to the best observation
        bw_values=[160.0, 60.0, 100.0, 62.0, 170.0],
    )
    out = mod.scaling_section(1000, 4, 16)
    assert walls == [] and hw == []
    assert out["retried"] is True and out["scaling_efficiency"] == 1.0
    assert out["bandwidth_spread_high"] == 1.6   # the audit trail of WHY
    assert out["bandwidth_high_gbs"] == 170.0 and out["bandwidth_low_gbs"] == 62.0


def test_bandwidth_quiet_slow_job_does_not_retry(monkeypatch):
    "Stable legs + healthy CPU + flat bandwidth: slow is slow, no retry."
    mod = load_bench()
    walls, hw = _patch(
        mod,
        [50.0, 100.0, 51.0, 101.0],
        [1.0, 3.9],
        monkeypatch,
        bw_values=[100.0, 40.0, 101.0],  # high spread 1.01 — flat window
    )
    out = mod.scaling_section(1000, 4, 16)
    assert out["retried"] is False and out["scaling_efficiency"] == 0.5
    assert out["bandwidth_spread_high"] == 1.01


def _patch_meta(mod, walls, hw_values, monkeypatch, bw_values):
    walls = list(walls)
    hw_values = list(hw_values)
    bw_values = list(bw_values)
    monkeypatch.setattr(mod, "ensure_scaling_corpus", lambda n: ("/tmp/fake", 100_000))
    monkeypatch.setattr(
        mod, "_run_leg_subprocess", lambda cpus, path, n, job="plain": walls.pop(0)
    )
    monkeypatch.setattr(mod, "hardware_throughput", lambda n, rounds=2: hw_values.pop(0))
    monkeypatch.setattr(mod, "bandwidth_throughput", lambda n: bw_values.pop(0))
    return walls


def test_uniformly_degraded_window_vs_plain_section_retries(monkeypatch):
    """Round-5 run-3 finding: a window can be UNIFORMLY bandwidth-degraded
    (flat spread, CPU control just above 0.9) and fool every relative
    signal.  The metadata section now compares its absolute bandwidth to
    the same-run plain section's: a >15% drop is retry-eligible."""
    mod = load_bench()
    walls = _patch_meta(
        mod,
        [105.0, 320.0, 106.0, 321.0, 80.0, 320.0],  # retry pair recovers high
        [1.0, 3.9, 1.0, 3.9],
        monkeypatch,
        # high(pre)=150, low=55, high(post)=152: flat spread BUT well
        # below the plain section's 65/205 reference -> unstable
        bw_values=[150.0, 55.0, 152.0, 60.0, 200.0],
    )
    out = mod.metadata_scaling_pair(1000, 4, 16, ref_bw=(65.0, 205.0))
    assert walls == []
    assert out["retried"] is True and out["scaling_efficiency"] == 1.0
    assert out["bandwidth_vs_plain_section"] is not None


def test_metadata_pair_without_reference_keeps_old_rule(monkeypatch):
    "No ref_bw (standalone invocation): the three relative signals govern."
    mod = load_bench()
    walls = _patch_meta(
        mod,
        [100.0, 320.0, 101.0, 321.0],
        [1.0, 3.9],
        monkeypatch,
        bw_values=[150.0, 55.0, 152.0],
    )
    out = mod.metadata_scaling_pair(1000, 4, 16)
    assert out["retried"] is False and out["bandwidth_vs_plain_section"] is None
