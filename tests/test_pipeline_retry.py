"""Retry policy (reference orchestration/flow.py Prefect tasks)."""

from __future__ import annotations

import pytest

from mini_log_lakehouse_spark.plans.pipeline import with_retries


def test_retries_then_succeeds():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    slept = []
    assert with_retries(flaky, retries=2, backoff_s=0.1, sleep=slept.append)() == "ok"
    assert calls["n"] == 3
    assert slept == [0.1, 0.2]  # linear backoff


def test_exhausted_retries_reraise():
    def always_fails():
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        with_retries(always_fails, retries=2, sleep=lambda _: None)()
