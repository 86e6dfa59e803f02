"""bench self-adjudication: the per-query dispersion flag names exactly
the cross-rep outliers (ratio > 2x AND spread > 0.3 s), and task-time
ratios ride along when the AppStatusStore deltas are present."""

from __future__ import annotations

from bench import dispersion_of


def test_flags_only_large_relative_and_absolute_spread():
    reps = {
        # the r11 phantom shape: one rep 7x the others, >0.3 s spread
        "phantom": [6.8, 1.0, 1.1, 1.05],
        # big ratio, tiny absolute spread (scheduler jitter) — not flagged
        "jitter": [0.01, 0.03, 0.012, 0.011],
        # big absolute spread, ratio under 2 — not flagged
        "steady_heavy": [10.0, 11.0, 10.5, 10.2],
        "stable": [0.5, 0.52, 0.51, 0.5],
    }
    disp, flags = dispersion_of(reps)
    assert flags == ["phantom"]
    assert disp["phantom"]["flag"] is True
    assert disp["phantom"]["wall_ratio"] == 6.8
    assert disp["jitter"]["flag"] is False
    assert disp["steady_heavy"]["flag"] is False
    assert disp["stable"]["flag"] is False


def test_task_ratio_present_only_with_valid_metrics():
    reps = {"q": [1.0, 2.5]}
    disp, _ = dispersion_of(reps, {"q": [4.0, 4.1]})
    # wall spread 2.5x but task time flat — the artifact carries both
    # so a reader sees "environment stall", not "plan regression"
    assert disp["q"]["wall_ratio"] == 2.5
    assert disp["q"]["task_ratio"] == 1.025
    # missing / sentinel task metrics (None, -1) drop the field, never die
    disp2, _ = dispersion_of(reps, {"q": [None, -1]})
    assert "task_ratio" not in disp2["q"]
    disp3, _ = dispersion_of(reps, None)
    assert "task_ratio" not in disp3["q"]


def test_empty_and_single_rep_safe():
    disp, flags = dispersion_of({"a": [], "b": [0.4]})
    assert flags == []
    assert "a" not in disp
    assert disp["b"]["wall_ratio"] == 1.0
