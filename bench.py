"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "headline_query_median_total", "value": total_sec,
     "unit": "sec", "queries": {name: median_sec, ...},
     "queries_cold": {...}, "sf": ..., "baseline_total": ...,
     "scaled": {...}, "scaled_100": {...}, "detail": "BENCH_DETAIL.json"}

The driver captures a bounded tail of stdout (~2000 chars; round 3's
full-precision line outgrew it and the bench artifact recorded
``parsed: null``), so the printed line is a COMPACT summary: seconds at
2 decimals and per-query DuckDB baselines folded into per-leg
``baseline_total``. The full-precision payload — per-query baselines,
4-decimal timings, per-leg cold numbers — is written next to this file
as ``BENCH_DETAIL.json`` in the same structure prior rounds printed.

Method mirrors the reference's README harness shape (warm-ups + N timed
iterations; reference README.md:196-215) applied per query, reported as
the MEDIAN (a single GC pause in a low-iteration run would otherwise
dominate; see time_fn). The ``baseline`` key holds DuckDB timings of the
oracle SQL for the same queries on the same parquet — the BASELINE.md
"within 2×" target is checked as value vs baseline, per query.

Warm-cache scope: input tables are cached (SPARK_GRAFT_CACHE_TABLES),
and the MinHash pipeline's persisted signature table additionally
survives across iterations via Spark's canonicalized-plan cache lookup —
warm iterations of dedup_minhash_pairs time the banding join over
precomputed signatures, which is the production shape (signatures are
write-once artifacts; see dedup.minhash_candidate_pairs). So the scope
is visible in the artifact, ``queries_cold`` reports the same query
with the signature cache dropped first (cold pipeline, warm input
tables): the full hash→band→verify cost per leg. Its DuckDB baseline
is skipped anyway (BASELINE_SKIP), so no ratio is claimed against an
engine doing the hashing per run.

Two scaled legs (10× and 100× of the input, semantics-preserving — see
sources/scaleup.py) show how the Spark/DuckDB ratio behaves as the
per-job floor amortizes; a genuine plan defect would show as a query's
ratio RISING from the 10× to the 100× leg. At 100× the scale-up's
Caesar-shift alphabet wraps (26 letters), so cross-replica exact
duplicate documents appear — realistic for a dedup corpus (mirrors,
boilerplate). The MinHash pipeline collapses exact-duplicate classes to
one representative before LSH (see dedup.minhash_candidate_pairs), so
quadratic-size duplicate classes cost one signature each plus a cheap
pair expansion — measured 189 s → ~8 s warm on the 100× leg; noted so
the pair counts are not mistaken for drift.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mini_log_lakehouse_spark.entry_registry import ORACLES, QUERIES  # noqa: E402
from mini_log_lakehouse_spark.session import get_spark  # noqa: E402

#: Headline queries: the flagship serving shape, the scan-heavy aggregate,
#: the shuffle-heavy join, a window, text analysis, fuzzy dedup, ANN, and
#: the composed curation pipeline.
HEADLINE = (
    "errors_by_type",
    "fct_events_hourly",
    "tpch_q1_pricing_summary",
    "top_customers_by_revenue",
    "top3_customers_per_nation",
    "doc_token_stats",
    "dedup_minhash_pairs",
    "ann_knn_join",
    "doc_curation_summary",
)

#: Queries whose warm number reuses a persisted intermediate; each also
#: gets a cold measurement with that cache dropped first.
COLD_ALSO = ("dedup_minhash_pairs",)

#: Oracles that are deliberately quadratic (all-pairs in SQL) — correct
#: as a gate at sf0.01, but not a meaningful performance baseline: the
#: Spark side is banded LSH (near-linear), the SQL restatement is O(n²)
#: by design and would run for hours at the scaled legs.
BASELINE_SKIP = frozenset({"dedup_minhash_pairs", "dedup_simhash_pairs"})

WARMUP = 1
ITERS = int(os.environ.get("BENCH_ITERS", "5"))

#: Scaled legs: replicate the sf dir this many × and re-run the headline
#: set with fewer iters. Disable with BENCH_SCALED=0 / BENCH_SCALED_100=0.
SCALE_FACTOR = int(os.environ.get("BENCH_SCALED", "10"))
SCALE_FACTOR_100 = int(os.environ.get("BENCH_SCALED_100", "100"))
#: Third decade (sf30 from the sf0.1 base, ~5 GB on disk): VERDICT r7
#: ask 6 — one more relative decade for the three HEAVIEST queries only
#: (the floor-dominated sub-second rows prove nothing new at sf30, the
#: heavy rows are where a plan defect would finally dominate the
#: per-job floor). Fewer iterations: at this size a single run is
#: seconds, not floor-noise. Disable with BENCH_SCALED_300=0.
SCALE_FACTOR_300 = int(os.environ.get("BENCH_SCALED_300", "300"))
HEADLINE_HEAVY = (
    "tpch_q1_pricing_summary",
    "top_customers_by_revenue",
    "dedup_minhash_pairs",
    # the floor-flagged >2x rows ride along (sub-second cost): if their
    # ratios keep falling with the decade, the floor-row account is
    # confirmed with data rather than argued. top3 was confirmed at r8
    # (0.83x at sf30); errors_by_type is the last >2x row without a
    # largest-scale point (VERDICT r8 ask 2).
    "top3_customers_per_nation",
    "errors_by_type",
)
ITERS_300 = int(os.environ.get("BENCH_ITERS_300", "3"))
#: 5 timed iterations at the scaled legs (was 3): the sub-second rows
#: (top3, errors_by_type) wobbled 2-3.6x across rounds at 3 iters —
#: the median of 5 plus the isolation re-runs below pins them.
ITERS_SCALED = int(os.environ.get("BENCH_ITERS_SCALED", "5"))
#: The scaled legs need 2 warmups, not 1: whole-stage-codegen JIT takes a
#: couple of executions to reach steady state on the bigger plans
#: (measured: 2.6 → 1.7 → 1.45 → 1.23s on the same query), and with only
#: 3 measured iterations a half-warm first run drags the median. Both
#: engines are timed warm — this reports steady-state throughput, the
#: declared method.
WARMUP_SCALED = int(os.environ.get("BENCH_WARMUP_SCALED", "2"))


def time_fn(fn, warmup: int = WARMUP, iters: int = ITERS) -> float:
    """Median, not mean: a single GC pause / page-cache miss in a
    low-iteration run would otherwise dominate the reported number
    (observed: one 10s outlier in a 2-iter leg whose isolated warm
    time is 1.4s)."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def _drop_pipeline_caches() -> None:
    """Evict persisted intermediates (MinHash/SimHash signature tables)
    so the next run pays the full pipeline cost. Input-table caches stay
    — the cold number isolates the operator, not the scan."""
    from mini_log_lakehouse_spark.operators import dedup

    for key in list(dedup._SIG_CACHE):
        dedup._SIG_CACHE.pop(key).unpersist(True)


def _quiet_heap(spark) -> None:
    """Barrier between measurement blocks: evict pipeline caches the
    previous block planted, flush dirty pages (the dedup cold run
    writes GBs of shuffle/sig data whose writeback would otherwise land
    inside the NEXT block's timings), and ask for the full-GC wave NOW."""
    _drop_pipeline_caches()
    try:
        os.sync()
    except OSError:
        pass
    spark.sparkContext._jvm.System.gc()


def bench_comparable(spark, sf_dir: str, iters: int, warmup: int, names):
    """Settle + time the baseline-covered (comparable) queries. The
    settle pass — one execution of each — absorbs the leg's startup
    transient (scaled-corpus write residue in the page cache,
    input-cache fill, bucketed-CTAS materialization, JIT ramp, the
    first full-GC wave) so it lands here instead of inside the first
    timed query's median (r9's sf30 leg measured top_customers at
    20.7 s in-suite vs 4.8 s isolated for exactly that reason).

    Cache-bearing queries (COLD_ALSO) are deliberately NOT in this
    group: r10 and r12 both shipped graded sf30 artifacts where the
    comparable block ran slow (top_customers 2.16× in-suite vs 1.06×
    isolated in r12) after the settle pass had executed the MinHash
    pipeline — its multi-GB shuffle + persist churn degrades the
    environment beyond what a drop+GC recovers. The fix is structural:
    the comparable queries now settle AND time before any cache-bearing
    query executes at all (bench_cache_bearing runs strictly after)."""
    for name in names:
        QUERIES[name](spark, sf_dir).collect()
    spark.sparkContext._jvm.System.gc()
    results: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        results[name] = round(
            time_fn(lambda: fn(spark, sf_dir).collect(), warmup=warmup, iters=iters),
            4,
        )
    return results


def _noop_write(df) -> None:
    """The guide §1.4 timing sink: computes every column of every row
    and discards the result — no driver-side Row materialization."""
    df.write.format("noop").mode("overwrite").save()


def bench_cache_bearing(spark, sf_dir: str, iters: int, warmup: int, names):
    """Time the cache-bearing queries (persisted-intermediate reuse),
    strictly AFTER the comparable block: their warmups legitimately
    re-persist the signature tables (the warm number is the banding
    join over precomputed signatures — the production shape), but that
    working set must never sit resident under anyone else's median.

    MEASUREMENT CHANGE (r15, declared in OPTIMIZATION_r15.md): the
    timed action is the NOOP SINK (guide §1.4), not ``collect()``. The
    r1–r14 collect-timed numbers for dedup_minhash_pairs measured
    driver-side Python Row materialization of the multi-million-row
    pair table, not the operator: at the sf30 leg the pipeline computes
    in ~5.7 s (noop) while collect() reported ~31 s — 80% pickling.
    These queries are baseline-skipped (BASELINE_SKIP), so no ratio
    ever depended on the old numbers; for continuity each leg still
    records ONE legacy collect() run per query (``queries_collect`` in
    the artifact) beside the noop medians. The comparable block keeps
    collect() — its outputs are rows-sized and the DuckDB baseline
    times fetchall(), so collect-vs-fetchall stays apples-to-apples.

    Also records each query's OUTPUT ROW COUNT (from the legacy collect
    run) as the corpus-profile marker (VERDICT r13 ask 6): the driver
    regenerates the corpus per session and its near-dup mass can flip
    10× between rounds (822,588 vs 81,732 qualifying pairs at the 100×
    leg — the r12 'regression' that took a round to root-cause); with
    the count in the artifact, the next apparent dedup regression
    self-diagnoses as data or code at a glance."""
    results: dict[str, float] = {}
    cold: dict[str, float] = {}
    out_rows: dict[str, int] = {}
    collect_once: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        results[name] = round(
            time_fn(
                lambda: _noop_write(fn(spark, sf_dir)),
                warmup=warmup,
                iters=iters,
            ),
            4,
        )
        # one legacy-methodology run: the old collect() number for
        # cross-round continuity + the output row count for the
        # corpus-profile marker
        t0 = time.perf_counter()
        out_rows[name] = len(fn(spark, sf_dir).collect())
        collect_once[name] = round(time.perf_counter() - t0, 4)
        # Cold AFTER warm: the warm loop has JIT-compiled the whole
        # pipeline, so this single drop-caches run isolates the
        # signature recompute (hash→band→verify), not first-run JVM
        # codegen compilation — the number a production re-ingest
        # would actually pay.
        _drop_pipeline_caches()
        t0 = time.perf_counter()
        _noop_write(fn(spark, sf_dir))
        cold[name] = round(time.perf_counter() - t0, 4)
        # The cold run itself re-persisted the signatures; quiet the
        # heap so the isolation blocks run clean — r11 run-2 measured
        # the ISOLATED q1 at 3.85x (vs 1.16x in-suite) purely because
        # the re-persisted 4.6 GB working set was resident by then.
        _quiet_heap(spark)
    return results, cold, out_rows, collect_once


def bench_spark(spark, sf_dir: str, iters: int, warmup: int, names=HEADLINE):
    """Comparable block first, cache-bearing block second (see the two
    helpers for why the order is load-bearing); results re-emitted in
    declared ``names`` order so artifact diffs stay column-stable."""
    comparable = [n for n in names if n not in COLD_ALSO]
    bearing = [n for n in names if n in COLD_ALSO]
    results = bench_comparable(spark, sf_dir, iters, warmup, comparable)
    cold: dict[str, float] = {}
    if bearing:
        warm_b, cold, _rows, _legacy = bench_cache_bearing(
            spark, sf_dir, iters, warmup, bearing
        )
        results.update(warm_b)
    results = {n: results[n] for n in names}
    return results, cold


#: DuckDB gets the SAME steady-state discipline as Spark at every leg:
#: 2 warm-ups (page cache + its own plan cache) and median of >=5 timed
#: iterations. Round-3/4 artifacts showed sub-second baselines swinging
#: up to 16x between rounds (errors_by_type sf10: 0.350s vs 0.022s) when
#: the scaled legs timed DuckDB with 1 warmup / 3 iters while Spark got
#: 2 / 3 — the ratio columns oscillated for baseline reasons, not Spark
#: reasons.
BASELINE_WARMUP = 2
BASELINE_MIN_ITERS = 5


def bench_duckdb(sf_dir: str, names, iters: int = ITERS) -> dict[str, float]:
    import duckdb

    from mini_log_lakehouse_spark.sources.registry import TABLES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # scaled tables are parquet directories
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    out = {}
    for name in names:
        if name not in ORACLES or name in BASELINE_SKIP:
            continue
        sql = ORACLES[name]
        out[name] = round(
            time_fn(
                lambda: con.execute(sql).fetchall(),
                warmup=BASELINE_WARMUP,
                iters=max(BASELINE_MIN_ITERS, iters),
            ),
            4,
        )
    con.close()
    return out


def _with_ratios(leg: dict) -> dict:
    """Attach per-query spark/duckdb ratios + the total ratio over the
    baseline-covered subset, so the 2x check is direct in the artifact."""
    qs, base = leg["queries"], leg["baseline"]
    leg["ratios"] = {
        n: round(qs[n] / base[n], 2) for n in qs if base.get(n)
    }
    covered = [n for n in qs if base.get(n)]
    bt = sum(base[n] for n in covered)
    leg["ratio_total"] = round(sum(qs[n] for n in covered) / bt, 2) if bt else None
    return leg


#: Isolation re-runs at the LARGEST leg: each of these queries gets a
#: dedicated back-to-back block (ISO_ITERS medians for both engines,
#: nothing interleaved) appended to the leg as ``isolation`` — the
#: committed version of the "clean run" numbers that previously lived
#: only in SCALING.md prose. The named set is the rows whose in-suite
#: medians have historically been floor/noise-dominated (sub-second
#: absolutes) plus doc_curation_summary (its in-suite 100x warm time
#: doubled between rounds; the isolated number pins which measurement
#: is the outlier). Any row whose in-suite ratio exceeds the 2x bar is
#: added automatically so a new regression always ships with its
#: isolation evidence.
ISO_ALWAYS = (
    "tpch_q1_pricing_summary",
    "top3_customers_per_nation",
    "errors_by_type",
    "doc_curation_summary",
    # the heaviest real query rides every isolation block so the
    # largest leg's iso_ratio_total always covers the full
    # baseline-covered set (r10: its in-suite ratio fell to 0.97x —
    # below the >2x auto-add — leaving the iso total undefined)
    "top_customers_by_revenue",
)
ISO_ITERS = int(os.environ.get("BENCH_ITERS_ISO", "7"))


def isolation_runs(spark, con_dir: str, names, leg: dict) -> dict:
    """Back-to-back isolated medians for ``names``: per query, the
    DuckDB block runs IMMEDIATELY followed by the Spark block (truly
    adjacent — timing all of one engine first would reinsert the
    cross-query cache interference this measurement exists to remove),
    each the median of ISO_ITERS iterations on already-warm caches,
    with the in-suite numbers echoed for side-by-side comparison."""
    out = {}
    for name in names:
        duck = bench_duckdb(con_dir, [name], iters=ISO_ITERS)
        fn = QUERIES[name]
        s = round(
            time_fn(
                lambda: fn(spark, con_dir).collect(), warmup=1, iters=ISO_ITERS
            ),
            4,
        )
        d = duck.get(name)
        out[name] = {
            "spark_isolated": s,
            "duck_isolated": d,
            "ratio_isolated": round(s / d, 2) if d else None,
            "spark_in_suite": leg["queries"].get(name),
            "duck_in_suite": leg["baseline"].get(name),
            "ratio_in_suite": leg["ratios"].get(name),
            "iters": ISO_ITERS,
        }
    return out


def attach_isolation(spark, leg_dir: str, names, leg: dict) -> None:
    """Attach the isolation block + iso_ratio_total to a leg in place:
    ISO_ALWAYS rows plus any row whose in-suite ratio exceeds the 2x
    bar (a new regression always ships with its isolation evidence)."""
    iso_names = [n for n in names if n in ISO_ALWAYS] + [
        n for n, r in leg["ratios"].items() if r > 2.0 and n not in ISO_ALWAYS
    ]
    leg["isolation"] = isolation_runs(spark, leg_dir, iso_names, leg)
    # the comparable-total ratio over the ISOLATED medians — the
    # cleanest single number for the 2x bar at this leg (in-suite
    # totals carry cross-query cache interference the isolation
    # blocks exist to remove); only meaningful when every
    # baseline-covered query was isolated, so guard on that
    iso_pairs = [
        (d["spark_isolated"], d["duck_isolated"])
        for d in leg["isolation"].values()
        if d["duck_isolated"]
    ]
    if len(iso_pairs) == len(leg["ratios"]):
        leg["iso_ratio_total"] = round(
            sum(s for s, _ in iso_pairs) / sum(d for _, d in iso_pairs), 2
        )


def _bench_leg(spark, leg_dir: str, names, iters: int, warmup: int):
    """One leg's full measurement order — load-bearing (r12's graded
    sf30 artifact showed the contamination signature a third time):

    1. comparable Spark queries settle + time (no cache-bearing query
       has executed on this corpus yet);
    2. DuckDB baselines time (same pre-dedup environment — a baseline
       timed after the dedup block would read evicted page cache and
       flatter our ratios);
    3. cache-bearing Spark queries settle + time (warm + cold), then a
       quiet-heap barrier for whatever runs next."""
    comparable = [n for n in names if n not in COLD_ALSO]
    bearing = [n for n in names if n in COLD_ALSO]
    results = bench_comparable(spark, leg_dir, iters, warmup, comparable)
    baseline = bench_duckdb(leg_dir, names, iters=iters)
    cold: dict[str, float] = {}
    out_rows: dict[str, int] = {}
    collect_once: dict[str, float] = {}
    if bearing:
        warm_b, cold, out_rows, collect_once = bench_cache_bearing(
            spark, leg_dir, iters, warmup, bearing
        )
        results.update(warm_b)
    results = {n: results[n] for n in names}
    return results, cold, baseline, out_rows, collect_once


def scaled_leg(
    spark,
    sf_dir: str,
    sf: float,
    factor: int,
    names=HEADLINE,
    iters: int = ITERS_SCALED,
    iso: bool = False,
    incremental: bool = False,
) -> dict:
    from mini_log_lakehouse_spark.session import release_corpus_caches
    from mini_log_lakehouse_spark.sources.scaleup import materialize_scaled

    scaled_dir = os.environ.get(
        f"BENCH_SCALED_DIR_{factor}", f"/tmp/mini_log_lakehouse_sfx{factor}"
    )
    materialize_scaled(spark, sf_dir, scaled_dir, factor)
    # Each leg is a different corpus: drop the previous leg's pinned
    # tables/signatures before warming this one (accumulated pins
    # measurably pressure storage memory by the 100x leg).
    release_corpus_caches(spark)
    results, cold, baseline, out_rows, collect_once = _bench_leg(
        spark, scaled_dir, names, iters, WARMUP_SCALED
    )
    leg = _with_ratios(
        {
            "factor": factor,
            "sf": round(sf * factor, 4),
            "value": round(sum(results.values()), 4),
            "queries": results,
            "queries_cold": cold,
            "baseline": baseline,
            "iters": iters,
        }
    )
    if out_rows:
        # output row counts of the cache-bearing (dedup) queries: the
        # corpus-profile marker — see bench_cache_bearing's docstring
        leg["corpus_profile"] = out_rows
    if collect_once:
        # legacy collect()-timed numbers (pre-r15 methodology), one run
        # per query — see bench_cache_bearing's measurement-change note
        leg["queries_collect"] = collect_once
    if iso:
        attach_isolation(spark, scaled_dir, names, leg)
    if incremental:
        # Strictly after the graded blocks (in-suite + isolation): the
        # incremental entries build persisted warehouse indexes on first
        # call, and that churn must not sit under anyone's median.
        leg["incremental"] = incremental_block(spark, scaled_dir, leg)
    return leg


#: The pay-once-index entries (VERDICT r12 ask 4): measured at the
#: scaled legs against their natural full-recompute comparators, so the
#: incremental-index story carries the same artifact-backed treatment
#: as the bucketed warehouse. Comparators: near-dup increment vs the
#: full MinHash pipeline warm over the same corpus; ANN increment vs
#: the exact GEMM kNN join of a batch against the full corpus.
INCREMENTAL_ENTRIES = (
    ("incremental_minhash_pairs", "dedup_minhash_pairs"),
    ("incremental_ann_ivf_topk", "ann_knn_join"),
)
ITERS_INC = int(os.environ.get("BENCH_ITERS_INC", "3"))


def incremental_block(spark, leg_dir: str, leg: dict) -> dict:
    out = {}
    for name, comparator in INCREMENTAL_ENTRIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, leg_dir).collect()
        first = round(time.perf_counter() - t0, 4)  # includes index build
        warm = round(
            time_fn(lambda: fn(spark, leg_dir).collect(), warmup=0, iters=ITERS_INC),
            4,
        )
        comp = leg["queries"].get(comparator)
        if comp is None:
            cfn = QUERIES[comparator]
            comp = round(
                time_fn(
                    lambda: cfn(spark, leg_dir).collect(), warmup=1, iters=ITERS_INC
                ),
                4,
            )
        out[name] = {
            "increment_sec": warm,
            "first_call_sec": first,
            "comparator": comparator,
            "comparator_warm_sec": comp,
            "speedup": round(comp / warm, 2) if warm else None,
            # pay-once amortization: the first call on a fresh corpus
            # pays the index build — this is what an increment saves vs
            # rebuilding the index per batch
            "amortization": round(first / warm, 2) if warm else None,
        }
    _quiet_heap(spark)
    return out


#: Hard stdout budget: the driver keeps only the LAST ~2000 chars of
#: stdout, and an over-long line truncates at the FRONT, breaking the
#: JSON (round 3 lost its bench artifact exactly this way).
_LINE_BUDGET = 1950


def compact_line(payload: dict, budget: int = _LINE_BUDGET) -> str:
    """The single JSON line the driver parses, shed to fit ``budget``.

    Pure function of the full bench payload (unit-tested with oversized
    inputs — tests/test_bench_line.py): if the compact form outgrows the
    budget, shed per-query second dicts of the middle legs first (they
    are diagnostics; BENCH_DETAIL.json keeps all) — never the ratio/iso
    fields the 2x judgment reads. The last-resort shed (ADVICE r10)
    rebuilds the line from only those judged fields and, if even that
    overflows, drops iso_ratios then whole legs: a valid short line
    beats a front-truncated corrupt one (an assert would crash before
    ANY line prints, and vanish under python -O — strictly worse).
    """
    compact = _compact(payload)
    legs = [
        leg for leg in ("scaled", "scaled_100", "scaled_300") if leg in compact
    ]
    # per-query ratios ride the compact line only for the last leg (the
    # 2000-char stdout-tail budget: r7's line was already 1626 chars);
    # every leg keeps ratio_total + iso_ratios, BENCH_DETAIL has all
    for leg in legs:
        compact[leg] = _compact(
            compact[leg], keep_ratios=(leg == legs[-1]), keep_cold=False
        )
    compact["detail"] = "BENCH_DETAIL.json"
    line = json.dumps(compact, separators=(",", ":"))
    for leg_name, key in (
        ("scaled", "queries"),
        ("scaled_100", "queries"),
        (None, "queries_cold"),
        ("scaled_100", "inc_speedup"),
        ("scaled_300", "inc_speedup"),
    ):
        if len(line) <= budget:
            break
        target = compact.get(leg_name) if leg_name else compact
        if target is None:
            continue
        target.pop(key, None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > budget:
        keep = ("metric", "value", "unit", "sf", "iters", "ratio_total", "baseline_total", "detail")
        minimal = {k: compact[k] for k in keep if k in compact}
        for leg_name in ("scaled", "scaled_100", "scaled_300"):
            leg = compact.get(leg_name)
            if leg:
                minimal[leg_name] = {
                    k: leg[k]
                    for k in ("factor", "sf", "value", "ratio_total", "iso_ratio_total", "iso_ratios")
                    if k in leg
                }
        line = json.dumps(minimal, separators=(",", ":"))
        for leg_name in ("scaled", "scaled_100", "scaled_300"):
            if len(line) <= budget:
                break
            if leg_name in minimal:
                minimal[leg_name].pop("iso_ratios", None)
                line = json.dumps(minimal, separators=(",", ":"))
        for leg_name in ("scaled", "scaled_100", "scaled_300"):
            if len(line) <= budget:
                break
            minimal.pop(leg_name, None)
            line = json.dumps(minimal, separators=(",", ":"))
    return line


def _compact(full: dict, keep_ratios: bool = False, keep_cold: bool = True) -> dict:
    """2-decimal summary of a leg payload with per-query baselines folded
    to a total — the printed line must fit the driver's ~2000-char stdout
    tail (exceeding it cuts the FRONT of the JSON line and breaks
    parsing). Per-query ratios ride the compact line only for the leg the
    2x bar is judged on (the largest); scaled legs drop their cold dicts
    from the line (r9's line reached 1936 chars — ~64 of margin — and
    the cold numbers are no-baseline diagnostics, not the 2x evidence);
    every leg keeps ratio_total, and BENCH_DETAIL.json holds everything."""
    out = {}
    for k, v in full.items():
        if k == "queries_cold" and not keep_cold:
            continue
        if k == "isolation":
            # full isolation blocks live in BENCH_DETAIL.json; the
            # compact line carries only the isolated ratios (the number
            # the 2x judgment should read for floor/noise-flagged rows)
            out["iso_ratios"] = {
                q: d["ratio_isolated"] for q, d in v.items()
            }
        elif k == "incremental":
            # full increment-vs-recompute blocks live in
            # BENCH_DETAIL.json; the line carries only the speedups
            out["inc_speedup"] = {q: d["speedup"] for q, d in v.items()}
        elif k == "baseline":
            out["baseline_total"] = round(sum(v.values()), 2)
        elif k == "ratios":
            if keep_ratios:
                out[k] = v
        elif k in ("queries", "queries_cold"):
            out[k] = {q: round(t, 2) for q, t in v.items()}
        elif k == "value":
            out[k] = round(v, 2)
        else:
            out[k] = v
    return out


def main() -> None:
    # warm-cache mode, matching the reference's benchmark method
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    # the sf30 leg sorts/writes 180M-row bucketed fact copies; give the
    # single local-mode JVM headroom for 32 concurrent sort+write tasks
    # (box has 128 GiB; the 16g default OOM'd the bucketed write)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="mini-log-lakehouse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    results, cold, baseline, out_rows, collect_once = _bench_leg(
        spark, sf_dir, HEADLINE, ITERS, WARMUP
    )

    payload = _with_ratios(
        {
            "metric": "headline_query_median_total",
            "value": round(sum(results.values()), 4),
            "unit": "sec",
            "queries": results,
            "queries_cold": cold,
            "sf": sf,
            "baseline": baseline,
            "iters": ITERS,
        }
    )
    if out_rows:
        payload["corpus_profile"] = out_rows
    if collect_once:
        payload["queries_collect"] = collect_once
    # Isolation at the SMALL legs too (VERDICT r13 ask 5): the driver's
    # fresh-rebuild environment inflated the r13 sf0.1 leg ~2x uniformly
    # across all nine queries (7.90 s vs 2.9-3.1 s builder-pinned at
    # identical code) with no plan change to blame; per-query isolated
    # medians in the artifact make that floor attributable (environment
    # vs plan) instead of a per-round forensic exercise.
    attach_isolation(spark, sf_dir, HEADLINE, payload)

    if SCALE_FACTOR > 1:
        payload["scaled"] = scaled_leg(spark, sf_dir, sf, SCALE_FACTOR, iso=True)
    if SCALE_FACTOR_100 > 1:
        payload["scaled_100"] = scaled_leg(
            spark, sf_dir, sf, SCALE_FACTOR_100, iso=True, incremental=True
        )
    if SCALE_FACTOR_300 > 1:
        # heavy rows only; isolation auto-attaches to any >2x row, which
        # is exactly the "retire top_customers_by_revenue or expose a
        # real lever" experiment VERDICT r7 asked for
        payload["scaled_300"] = scaled_leg(
            spark,
            sf_dir,
            sf,
            SCALE_FACTOR_300,
            names=HEADLINE_HEAVY,
            iters=ITERS_300,
            iso=True,
            incremental=True,
        )

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(payload, fh, indent=1)

    print(compact_line(payload))
    spark.stop()


if __name__ == "__main__":
    main()
