"""CLI entry point: run the flagship pipeline resumably.

Designed for ``ray job submit -- python -m matrixprofile_ray --out /data/run1``
on a cluster (the driver owns the Ray session; on a cluster the job runner
has already initialised Ray and ``ray.init(address="auto")`` attaches).
Re-running the same command after a failure resumes from the lineage
checkpoints and skips completed shards.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="matrixprofile_ray",
        description="Ray-Data time-series rollup + matrix-profile engine",
    )
    ap.add_argument("--out", required=True, help="output root (resumable layout)")
    ap.add_argument("--corpus", default=None,
                    help="parquet corpus dir (url,warc_ts,html,text[,lang]); "
                         "default: deterministic synthetic corpus")
    ap.add_argument("--pages", type=int, default=200_000,
                    help="synthetic corpus size when --corpus is not given")
    ap.add_argument("--domains", type=int, default=200)
    ap.add_argument("--tiers", default="raw,1h,1d,7d")
    ap.add_argument("--window", type=int, default=24)
    ap.add_argument("--algorithm", default="mpx",
                    choices=["mpx", "stomp", "scrimp++"])
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--concurrency", type=int, default=8)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from matrixprofile_ray.util import ensure_hash_shuffle

    ensure_hash_shuffle()

    if args.corpus:
        import ray.data as rd

        pages = rd.read_parquet(
            args.corpus, columns=["url", "warc_ts", "html", "text"]
        )
    else:
        from matrixprofile_ray.sources.pages import pages_dataset

        pages = pages_dataset(args.pages, n_domains=args.domains)

    from matrixprofile_ray.pipelines.runner import run_resumable

    written = run_resumable(
        pages,
        args.out,
        tiers=tuple(args.tiers.split(",")),
        window=args.window,
        algorithm=args.algorithm,
        shards=args.shards,
        profile_concurrency=args.concurrency,
    )
    print(json.dumps({
        "out": args.out,
        "partitions_run": len(written),
        "rows": {r["partition_id"]: r["output_rows"] for r in written},
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
