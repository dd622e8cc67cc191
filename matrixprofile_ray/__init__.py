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

# Engine default: hash-based shuffling for all key-based exchanges (none of
# our wide ops needs a global sort; the sort shuffle costs tens of seconds of
# fixed latency per exchange). No-op on Ray versions without the strategy.
from matrixprofile_ray.util import ensure_hash_shuffle as _ensure_hash_shuffle

_ensure_hash_shuffle()
