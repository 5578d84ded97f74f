"""Mechanical enforcement of the driver-sampling rotation (ADVICE r6):
the verification driver gives a CORRECTNESS row only to the first 50
registry entries each round, so without enforcement an entry could sit
past position 50 forever on comment discipline alone. This test fails
loudly instead: every entry must either have a driver row within the
last ROTATION_MAX_AGE rounds or be scheduled in the CURRENT window.

New entries (no row ever) are forced into the current window
immediately — exactly the gap the r6 ADVICE flagged (ten round-6
entries shipped with only local hash evidence).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: An entry's newest driver row may be at most this many rounds old
#: before it MUST re-enter the window. 164+ entries / 50 slots needs a
#: cycle of ceil(n/50) rounds; 4 gives one round of scheduling slack.
ROTATION_MAX_AGE = 4

#: A new entry recorded in entry_registry.ENTRY_REGISTERED may wait at
#: most this many build rounds after its registration round before it
#: MUST be scheduled for its first driver row. 1 = it may sit out the
#: registration round and the one after (both can be saturated by
#: max-age forcing sets), but is forced into the window two rounds
#: later. An entry NOT recorded there is forced immediately — the
#: strict r6 rule is unchanged for the undocumented case.
NEW_ENTRY_MAX_WAIT = 1


def _driver_rows() -> tuple[int, dict[str, int]]:
    """(next_round, latest sampled round per entry) from the committed
    CORRECTNESS_r*.json artifacts. A row counts as 'sampled' whether it
    was hash-green or rows-only — visibility is what rotation manages;
    red rows are caught by the gate itself."""
    last: dict[str, int] = {}
    rounds = [0]
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for name in json.load(fh):
                last[name] = max(last.get(name, 0), rnd)
    return max(rounds) + 1, last


def test_every_entry_sampled_recently_or_scheduled():
    from mini_log_lakehouse_spark import entry_registry as er

    next_round, last = _driver_rows()
    window = set(er._FIRST_WINDOW)
    registered = getattr(er, "ENTRY_REGISTERED", {})

    def _effective_last(name: str) -> int:
        if name in last:
            return last[name]
        if name in registered:
            # a documented new entry gets NEW_ENTRY_MAX_WAIT rounds of
            # grace from its registration round before its first row
            # is forced — the same bounded-staleness shape as re-sampling
            return registered[name] + NEW_ENTRY_MAX_WAIT - ROTATION_MAX_AGE
        # undocumented never-sampled entry: overdue immediately
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
        f"{overdue} — rotate them into the first 50"
    )


def test_registration_ledger_is_tidy():
    """ENTRY_REGISTERED must only hold real, still-unsampled entries
    registered in a real (non-future) round — once an entry has a driver
    row the record must be deleted, so the ledger can never mask a
    stale-entry problem behind a permanent grace."""
    from mini_log_lakehouse_spark import entry_registry as er

    next_round, last = _driver_rows()
    registered = getattr(er, "ENTRY_REGISTERED", {})
    for name, rnd in registered.items():
        assert name in er.QUERIES, f"ENTRY_REGISTERED names unknown query {name}"
        assert name not in last, (
            f"{name} has a driver row (r{last.get(name)}) — remove it from "
            f"ENTRY_REGISTERED; grace applies only before the first sample"
        )
        assert rnd <= next_round, (
            f"{name} registered in future round {rnd} (next is {next_round})"
        )


def test_window_is_exactly_the_driver_sample():
    """The registry must present _FIRST_WINDOW as the first 50 names in
    iteration order — the driver samples by position, not by name."""
    from mini_log_lakehouse_spark import entry_registry as er

    first50 = list(er.QUERIES)[:50]
    assert first50 == list(er._FIRST_WINDOW)
