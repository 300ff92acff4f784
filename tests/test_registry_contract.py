"""Pin the registry/doc contract so counts can't drift again.

Round-4 verdict caught README.md claiming 105 queries while the
registry held 111 (doc edited before the last two additions). These
tests parse the documented count straight out of README.md and compare
it to ``len(REGISTRY)``, so any future registry growth without a README
update (or vice versa) fails CI instead of shipping stale docs.
"""

from __future__ import annotations

import re
from pathlib import Path

from lmo_data_catalog_spark.registry import REGISTRY

README = Path(__file__).resolve().parents[1] / "README.md"


def documented_count() -> int:
    m = re.search(r"(\d+) registry queries", README.read_text())
    assert m, "README.md no longer documents the registry query count"
    return int(m.group(1))


def test_readme_query_count_matches_registry():
    assert documented_count() == len(REGISTRY), (
        f"README.md says {documented_count()} registry queries but "
        f"len(REGISTRY) == {len(REGISTRY)} — update README.md"
    )


def test_every_registry_query_has_an_oracle_or_is_flagged():
    """README claims every query carries a value-exact DuckDB oracle.

    Keep that claim honest: a query may omit its oracle only by opting
    in to the weaker rows-only driver check via the 'no_oracle' tag.
    """
    missing = [
        name
        for name, spec in REGISTRY.items()
        if spec.oracle is None and "no_oracle" not in spec.tags
    ]
    assert not missing, f"queries without oracle or no_oracle tag: {missing}"


def test_entry_module_exposes_full_registry():
    import __spark_entry__ as entry

    q = entry.queries()
    assert set(q) == set(REGISTRY)
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(q)


def test_explain_archive_covers_every_query():
    """explains/<name>.txt must exist for every registry query — a new
    query isn't done until tools/make_bench_md.py regenerated the plan
    archive (the same regenerate-artifacts convention the README count
    pins for docs)."""
    explains = Path(__file__).resolve().parents[1] / "explains"
    missing = [
        n for n in REGISTRY if not (explains / f"{n}.txt").exists()
    ]
    assert not missing, f"run tools/make_bench_md.py — missing: {missing}"
