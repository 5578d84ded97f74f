"""Mechanical enforcement of the driver-sampling rotation (ADVICE r6):
the verification driver gives a CORRECTNESS row only to the first 50
registry entries each round, so without enforcement an entry could sit
past position 50 forever on comment discipline alone. This test fails
loudly instead: every entry must either have a driver row within the
last ROTATION_MAX_AGE rounds or be scheduled in the CURRENT window.

Since r15 the window is DERIVED at import time from the committed
CORRECTNESS_r*.json artifacts (entry_registry.derive_window), so a new
artifact landing rotates the window automatically; these tests check
the derivation's invariants rather than a hardcoded tuple, and the
fixture tests below prove the rotation advances with zero code edits
when a synthetic artifact is dropped in (judge VERDICT r14 task 2).
"""

from __future__ import annotations

import json
import os

import pytest

from mini_log_lakehouse_spark import entry_registry as er
from mini_log_lakehouse_spark.entry_registry import (
    NEW_ENTRY_MAX_WAIT,
    ROTATION_MAX_AGE,
    derive_window,
    scan_correctness_artifacts,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_entry_sampled_recently_or_scheduled():
    """No registry entry may be overdue (> ROTATION_MAX_AGE rounds since
    its newest driver row, with the documented new-entry grace) without
    being scheduled in the current window. With the derived window this
    holds by construction unless the forcing set overflows 50 — which
    derive_window raises on — but the end-to-end check stays as the
    contract statement."""
    next_round, last = scan_correctness_artifacts(REPO)
    window = set(er._FIRST_WINDOW)
    registered = er.ENTRY_REGISTERED

    def _effective_last(name: str) -> int:
        if name in last:
            return last[name]
        if name in registered:
            return registered[name] + NEW_ENTRY_MAX_WAIT - ROTATION_MAX_AGE
        return next_round - ROTATION_MAX_AGE - 1

    overdue = sorted(
        name
        for name in er.QUERIES
        if next_round - _effective_last(name) > ROTATION_MAX_AGE
        and name not in window
    )
    assert not overdue, (
        f"entries overdue for a driver CORRECTNESS row (> {ROTATION_MAX_AGE} "
        f"rounds since last sample) and not scheduled in _FIRST_WINDOW: "
        f"{overdue}"
    )


def test_registration_ledger_is_tidy():
    """ENTRY_REGISTERED must hold real entries registered in a real
    (non-future) round. A record whose entry has since received a driver
    row is INERT, not an error: derive_window's eff_last prefers the
    artifact row, so a stale record can never extend grace past the
    first sample — demanding its deletion would recreate the
    one-red-test-per-artifact pattern (the builder cannot edit code in
    the same commit the driver lands CORRECTNESS_rN.json in)."""
    next_round, last = scan_correctness_artifacts(REPO)
    for name, rnd in er.ENTRY_REGISTERED.items():
        assert name in er.QUERIES, f"ENTRY_REGISTERED names unknown query {name}"
        assert rnd <= next_round, (
            f"{name} registered in future round {rnd} (next is {next_round})"
        )
        if name in last:
            # inert record: the grace window can no longer apply, but
            # verify the derivation really does prefer the artifact row
            assert last[name] >= rnd, (
                f"{name}: driver row r{last[name]} predates its recorded "
                f"registration r{rnd} — the ledger is lying about history"
            )


def test_rewrite_forced_entry_reenters_window():
    """A rewrite recorded in REWRITE_RESAMPLE forces the entry back into
    the window from the round AFTER the rewrite until a post-rewrite
    driver row lands; a row AT the rewrite round vouches (the driver
    gathers CORRECTNESS at round end, after the round's commits)."""
    names = ("a", "b", "c", "d")
    last = {"a": 9, "b": 9, "c": 9, "d": 8}
    # d rewritten r9, newest row r8 -> forced at r10 despite age 2
    w = derive_window(names, last, 10, size=2, rewrites={"d": 9})
    assert w == ("d", "a")
    # a's newest row IS the rewrite round -> record inert, no forcing
    w2 = derive_window(names, last, 10, size=2, rewrites={"a": 9})
    assert w2 == ("d", "a")  # d leads by plain age, not by rewrite


def test_rewrite_ledger_is_tidy_and_scheduled():
    """REWRITE_RESAMPLE must name real entries in real rounds, and any
    entry whose newest driver row predates its recorded rewrite must be
    scheduled in the current window once the rewrite round has passed
    (the end-to-end statement of VERDICT r15 ask 3)."""
    next_round, last = scan_correctness_artifacts(REPO)
    window = set(er._FIRST_WINDOW)
    for name, rnd in er.REWRITE_RESAMPLE.items():
        assert name in er.QUERIES, f"REWRITE_RESAMPLE names unknown query {name}"
        assert rnd < next_round + 1, (
            f"{name} recorded as rewritten in future round {rnd}"
        )
    stale = sorted(
        name
        for name, rnd in er.REWRITE_RESAMPLE.items()
        if last.get(name, -1) < rnd and next_round > rnd and name not in window
    )
    assert not stale, (
        f"entries rewritten with no post-rewrite driver row and not "
        f"scheduled in _FIRST_WINDOW: {stale}"
    )


def test_window_is_exactly_the_driver_sample():
    """The registry must present _FIRST_WINDOW as the first 50 names in
    iteration order — the driver samples by position, not by name."""
    first50 = list(er.QUERIES)[:50]
    assert first50 == list(er._FIRST_WINDOW)


def test_deferrals_reference_known_queries_for_current_round():
    """A current-round deferral naming a retired query should have failed
    at import; assert the module-level state is consistent."""
    next_round, _ = scan_correctness_artifacts(REPO)
    for name in er.WINDOW_DEFERRALS.get(next_round, ()):
        assert name in er.QUERIES
        assert name not in er._FIRST_WINDOW


# ---------------------------------------------------------------------------
# Fixture tests: the derivation against synthetic artifact histories.


def _write_artifact(dirpath, rnd, names):
    with open(os.path.join(dirpath, f"CORRECTNESS_r{rnd}.json"), "w") as fh:
        json.dump({n: {"match": "hash"} for n in names}, fh)


def test_synthetic_artifact_rotates_window_with_zero_code_edits(tmp_path):
    """Judge r14 done-criterion: drop a synthetic next-round artifact into
    a fixture dir and the derived window advances by itself. 120 entries,
    50-slot window: r1 samples e000-e049; committing that artifact makes
    r2 fill with the never-sampled tail (oldest-first = still-never
    entries), and committing r2's makes r3 force the remaining never-
    sampled entries then re-fill with the r1 cohort."""
    names = tuple(f"e{i:03d}" for i in range(120))
    d = str(tmp_path)

    nr, last = scan_correctness_artifacts(d)
    assert (nr, last) == (1, {})
    # round 1: everything is never-sampled and undocumented -> all 120 are
    # overdue -> over-commit raises (the real repo never hits this state:
    # entries are either sampled or in ENTRY_REGISTERED). With a ledger
    # registering them this round, the grace holds and fill is by name.
    with pytest.raises(ValueError, match="over-committed"):
        derive_window(names, last, nr)
    reg = {n: 1 for n in names}
    w1 = derive_window(names, last, nr, registered=reg)
    assert w1 == names[:50]

    _write_artifact(d, 1, w1)
    nr, last = scan_correctness_artifacts(d)
    assert nr == 2
    w2 = derive_window(names, last, nr, registered=reg)
    assert w2 == names[50:100]

    _write_artifact(d, 2, w2)
    nr, last = scan_correctness_artifacts(d)
    assert nr == 3
    w3 = derive_window(names, last, nr, registered=reg)
    # never-sampled tail (overdue: registered r1 + WAIT expired by r3)
    # leads, then the oldest sampled cohort (r1) fills the rest
    assert w3[:20] == names[100:120]
    assert w3[20:] == names[:30]


def test_age_forced_entry_leads_window():
    names = ("a", "b", "c", "d")
    last = {"a": 5, "b": 9, "c": 9, "d": 9}
    # next_round=10: a is at age 5 > 4 -> forced to lead a 2-slot window
    w = derive_window(names, last, 10, size=2)
    assert w == ("a", "b")


def test_boundary_deferral_is_legal_and_beyond_boundary_is_not():
    names = ("a", "b", "c")
    last = {"a": 6, "b": 6, "c": 9}
    # next_round=10: a,b at age 4 (boundary) -> deferring a is legal
    w = derive_window(names, last, 10, deferrals={10: ("a",)}, size=2)
    assert w == ("b", "c")
    # next_round=11: a at age 5 (overdue) -> deferral must raise
    with pytest.raises(ValueError, match="already-overdue"):
        derive_window(names, last, 11, deferrals={11: ("a",)}, size=2)
    # deferring a fresh entry (age < boundary) is also an error
    with pytest.raises(ValueError, match="boundary"):
        derive_window(names, last, 10, deferrals={10: ("c",)}, size=3)


def test_overcommitted_forcing_set_raises():
    names = tuple(f"e{i}" for i in range(4))
    last = {n: 1 for n in names}
    with pytest.raises(ValueError, match="over-committed"):
        derive_window(names, last, 10, size=2)
    # import-survival mode: the most overdue entries are served instead
    # of crashing the package (the strict contract stays a test concern)
    assert derive_window(names, last, 10, size=2, strict=False) == ("e0", "e1")


def test_import_survives_artifactless_checkout(tmp_path):
    """A stripped checkout (no CORRECTNESS_r*.json beside the package)
    must still import: the derived rotation falls back to registry
    order instead of declaring all 201 entries overdue and crashing
    bench.py / __spark_entry__ with the package import."""
    import shutil
    import subprocess
    import sys

    shutil.copytree(
        os.path.join(REPO, "mini_log_lakehouse_spark"),
        tmp_path / "mini_log_lakehouse_spark",
        ignore=shutil.ignore_patterns("__pycache__"),
    )
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from mini_log_lakehouse_spark import entry_registry as er; "
            "print(len(er._FIRST_WINDOW))",
        ],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "50"


def test_r15_window_matches_preannounced_composition():
    """The real repo's derived r15 window must equal the composition
    pre-announced in r14: incremental_dedup_clusters leads (first-row
    deadline), the other 49 r11-latest entries fill, and
    nation_customer_counts is the documented deferral. Guarded on
    next_round so the test self-retires when CORRECTNESS_r15.json lands."""
    next_round, last = scan_correctness_artifacts(REPO)
    if next_round != 15:
        pytest.skip("r15 artifact landed; composition check retired")
    w = er._FIRST_WINDOW
    assert w[0] == "incremental_dedup_clusters"
    assert "nation_customer_counts" not in w
    r11_latest = {n for n, r in last.items() if r == 11 and n in er.QUERIES}
    assert set(w[1:]) == r11_latest - {"nation_customer_counts"}
