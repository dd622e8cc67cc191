"""matrixprofile_ray — a Ray-Data-native time-series rollup + matrix-profile engine.

A from-scratch engine with the query/data-processing capabilities of
matrix-profile-foundation/matrixprofile, re-expressed Ray-Data-first:

- ``core``      pure-numpy per-series numerical kernels (MPX, STOMP, SCRIMP++,
                MASS2, MPDist, discovery, rolling stats, preprocessing, codecs)
- ``sources``   dataset readers + the deterministic synthetic `pages` corpus
- ``stages``    Ray Data batch transforms (map_batches fns / actor classes)
- ``pipelines`` end-to-end pipelines (rollup → gap-fill → profile → discover)
- ``state``     lineage / checkpoint-resume helpers

Nothing in this package calls ``ray.init()``; the session is owned by the
caller (bench.py, tests, or the driver).
"""

__version__ = "0.1.0"

# NOTE: hash-shuffle DataContext defaults are applied by the pipeline
# builders via util.ensure_hash_shuffle(), NOT at import: the knobs must be
# sized to the live cluster (a 64-aggregator default deadlocks a 4-CPU
# session), and at import time ray.init() may not have happened yet.
