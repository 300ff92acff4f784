"""Pin tools/verify_sample.py's selection contract (r9 verdict ask
#7): the seeded draw must exhaust NEVER-driver-sampled queries (those
absent from every CORRECTNESS_r*.json) before topping up from the
driver-seen set, deterministically per round number.
"""

from __future__ import annotations

import glob
import json
import random

from lmo_data_catalog_spark.registry import REGISTRY

ROOT = "/root/repo"


def select(round_no: int, n_sample: int, names, driver_seen):
    """The exact selection arithmetic of tools/verify_sample.py."""
    never = sorted(n for n in names if n not in driver_seen)
    seen = sorted(n for n in names if n in driver_seen)
    rng = random.Random(round_no)
    take = min(n_sample, len(names))
    from_never = rng.sample(never, min(take, len(never)))
    from_seen = rng.sample(seen, min(take - len(from_never), len(seen)))
    return from_never, from_seen


def _driver_seen():
    seen = set()
    for path in glob.glob(f"{ROOT}/CORRECTNESS_r*.json"):
        seen.update(json.load(open(path)))
    return seen


def test_bias_exhausts_never_sampled_first():
    names = sorted(REGISTRY)
    seen = _driver_seen()
    never = [n for n in names if n not in seen]
    from_never, from_seen = select(10, 30, names, seen)
    # while the never-sampled pool exceeds the draw, the draw is
    # 100% never-sampled
    assert len(never) > 30
    assert len(from_never) == 30 and not from_seen
    assert all(n not in seen for n in from_never)


def test_top_up_from_seen_when_never_pool_small():
    names = [f"q{i}" for i in range(10)]
    seen = set(names[:7])  # only 3 never-sampled
    from_never, from_seen = select(5, 5, names, seen)
    assert sorted(from_never) == ["q7", "q8", "q9"]
    assert len(from_seen) == 2 and all(n in seen for n in from_seen)


def test_selection_is_deterministic_per_round():
    names = sorted(REGISTRY)
    seen = _driver_seen()
    a = select(11, 30, names, seen)
    b = select(11, 30, names, seen)
    assert a == b
    c = select(12, 30, names, seen)
    assert a != c  # different round, different draw
