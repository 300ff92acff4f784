"""Family-A fixture generator: LMO-shaped synthetic raw inputs
(FIXTURES.md; schemas reconstructed from 01_source_me.R:87-97,101-103,
124,170,334-337).

Writes the four raw files the reference pipeline consumes, with the
real-world warts the ingest layer must handle: 3 banner rows before
the header, an ``x`` NA sentinel in the income column, an all-empty
row and column, and cluster NOCs in ``NNNNN: Title`` format without
the ``#`` prefix.

Deterministic (seeded ``random.Random``); driver-side file writes —
fixtures are test-sized by definition.
"""

from __future__ import annotations

import csv
import os
import random

BANNER = [
    ["British Columbia Labour Market Outlook"],
    ["Synthetic fixture — not real data"],
    [],
]

REGIONS = [
    "Cariboo",
    "Kootenay",
    "Mainland South West",
    "North Coast & Nechako",
    "Northeast",
    "Thompson Okanagan",
    "Vancouver Island Coast",
]
PSEUDO_REGIONS = ["North", "South East"]
AREAS = ["British Columbia", *REGIONS, *PSEUDO_REGIONS]

NOCS = [
    ("#T", "Total - all occupations"),
    ("#00011", "Legislators"),
    ("#11100", "Financial auditors and accountants"),
    ("#11101", "Financial and investment analysts"),
    ("#21231", "Software engineers and designers"),
    ("#21232", "Software developers and programmers"),
    ("#31102", "General practitioners and family physicians"),
    ("#32101", "Licensed practical nurses"),
    ("#41200", "University professors and lecturers"),
    ("#62020", "Food service supervisors"),
    ("#65200", "Food and beverage servers"),
    ("#73300", "Transport truck drivers"),
    ("#75110", "Construction trades helpers and labourers"),
]

INDUSTRIES = [
    "All industries",
    "Construction",
    "Health Care and Social Assistance",
    "Manufacturing",
    "Professional, Scientific and Technical Services",
]

JO_VARIABLES = ["Job Openings", "Expansion Demand", "Replacement Demand"]

CLUSTER_LABELS = [
    "Analysis",
    "Care",
    "Computation",
    "Hands-on",
    "Management",
]


def year_cols(fyod: int) -> list[str]:
    return [str(y) for y in range(fyod, fyod + 11)]


def _write_csv(path: str, header: list[str], rows: list[list], banner=True):
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        if banner:
            w.writerows(BANNER)
        w.writerow(header)
        w.writerows(rows)


def generate(out_dir: str, *, fyod: int = 2024, seed: int = 7) -> dict[str, str]:
    """Write employment.csv, job_openings.csv, occ_char.csv,
    clusters.csv into ``out_dir``; returns name → path."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    years = year_cols(fyod)
    paths = {}

    def series(base: float, drift: float) -> list[float]:
        vals, v = [], base
        for _ in years:
            v = v * (1 + rng.uniform(-drift, drift))
            vals.append(round(v, 1))
        return vals

    # employment.csv — Variable="Employment"; trailing all-empty column
    # and one all-empty row exercise janitor::remove_empty (SM:88).
    header = ["NOC", "Description", "Industry", "Variable",
              "Geographic Area", *years, ""]
    rows: list[list] = []
    for noc, desc in NOCS:
        for ind in INDUSTRIES:
            for area in AREAS:
                base = rng.uniform(500, 50000) * (10 if noc == "#T" else 1)
                rows.append([noc, desc, ind, "Employment", area,
                             *series(base, 0.04), ""])
    rows.insert(len(rows) // 2, [""] * len(header))
    p = os.path.join(out_dir, "employment.csv")
    _write_csv(p, header, rows)
    paths["employment"] = p

    # job_openings.csv — 3 demand variables; values may go negative.
    header = ["NOC", "Description", "Industry", "Variable",
              "Geographic Area", *years]
    rows = []
    for noc, desc in NOCS:
        for ind in INDUSTRIES:
            for area in AREAS:
                for var in JO_VARIABLES:
                    base = rng.uniform(-50, 800)
                    rows.append([noc, desc, ind, var, area,
                                 *series(base if base > 1 else 10, 0.15)])
    p = os.path.join(out_dir, "job_openings.csv")
    _write_csv(p, header, rows)
    paths["job_openings"] = p

    # occ_char.csv — stands in for the "Occupational Characteristics"
    # xlsx (SM:93-97): one HOO flag column per region + BC, income with
    # the "x" NA sentinel.
    hoo_cols = [f"Occ Group: HOO BC {fyod}E"] + [
        f"Occ Group: HOO {r} {fyod}E" for r in REGIONS
    ]
    header = ["NOC", "Description", *hoo_cols,
              "2021 Census Median Employment Income (Employed)"]
    rows = []
    for noc, desc in NOCS:
        if noc == "#T":
            continue
        flags = [rng.choice(["HOO", "Non-HOO"]) for _ in hoo_cols]
        income = "x" if rng.random() < 0.15 else round(rng.uniform(3e4, 1.2e5))
        rows.append([noc, desc, *flags, income])
    p = os.path.join(out_dir, "Occupational Characteristics 2024.csv")
    _write_csv(p, header, rows)
    paths["occ_char"] = p

    # clusters.csv — NOC as "NNNNN: Title" (no '#'), subset of NOCs so
    # the inner join (SM:339) actually filters.
    header = ["NOC", "new_cluster", "extra_col"]
    rows = []
    for noc, desc in NOCS[1:-2]:  # drop #T and last two → join is proper subset
        rows.append([f"{noc[1:]}: {desc}", rng.choice(CLUSTER_LABELS), "ignored"])
    p = os.path.join(out_dir, "clusters.csv")
    _write_csv(p, header, rows, banner=False)
    paths["clusters"] = p

    return paths
