"""Pin tools/verify_sample.py's selection contract (r9 verdict ask
#7, tightened r11): the seeded draw must exhaust queries that are
BOTH never-driver-sampled (absent from every CORRECTNESS_r*.json)
AND never locally audited (absent from tools/sample_audit_log.json)
first, then re-audit the remaining never-driver-sampled, then top up
from the driver-seen set — deterministically per round number. The
test imports the ACTUAL selection function (r10 ADVICE: a pinned
re-implementation would not catch a regression in the tool).
"""

from __future__ import annotations

import os
import sys

from lmo_data_catalog_spark.registry import REGISTRY

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from verify_sample import (  # noqa: E402
    audited_names,
    driver_seen_names,
    select_sample,
)


def test_bias_exhausts_fresh_blind_spot_first():
    """The fresh tier (never driver-sampled AND never audited) drains
    COMPLETELY before any stale or seen name is drawn — checked on
    the repo's real state, whatever size the fresh pool currently is
    (round 11 exhausted it to zero: three batches audited all 130
    never-driver-sampled queries, so the draw is all re-audits until
    the driver widens its sample)."""
    names = sorted(REGISTRY)
    seen = driver_seen_names()
    audited = audited_names()
    fresh_pool = [n for n in names if n not in seen and n not in audited]
    fresh, stale, topup = select_sample(11, 30, names, seen, audited)
    # every remaining fresh name is drawn before any other tier
    assert len(fresh) == min(30, len(fresh_pool))
    assert all(n not in seen and n not in audited for n in fresh)
    assert all(n not in seen and n in audited for n in stale)
    if len(fresh_pool) < 30:
        assert len(fresh) + len(stale) + len(topup) == 30
        # stale (never-driver-sampled) fills before driver-seen
        stale_pool = [n for n in names if n not in seen and n in audited]
        assert topup == [] or len(stale) == min(
            30 - len(fresh), len(stale_pool)
        )


def test_tier_order_fresh_then_stale_then_seen():
    names = [f"q{i}" for i in range(10)]
    seen = set(names[:5])          # q0-q4 driver-seen
    audited = {"q5", "q6"}         # q5,q6 audited before
    fresh, stale, topup = select_sample(3, 6, names, seen, audited)
    assert sorted(fresh) == ["q7", "q8", "q9"]   # all 3 fresh first
    assert sorted(stale) == ["q5", "q6"]          # then both stale
    assert len(topup) == 1 and topup[0] in seen   # then seen filler


def test_selection_is_deterministic_per_round():
    names = sorted(REGISTRY)
    seen = driver_seen_names()
    audited = audited_names()
    a = select_sample(11, 30, names, seen, audited)
    b = select_sample(11, 30, names, seen, audited)
    assert a == b
    c = select_sample(12, 30, names, seen, audited)
    assert a != c  # different round, different draw


def test_audit_log_names_are_registry_names():
    """The committed log must not drift from the registry (renamed or
    deleted queries would silently shrink the stale tier)."""
    unknown = audited_names() - set(REGISTRY)
    assert not unknown, f"audit log references unknown queries: {unknown}"
