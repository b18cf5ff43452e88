"""Driver-side job overlap for independent legs (guide §2.6).

Spark's scheduler happily runs several jobs at once; actions are only
sequential because driver code calls them sequentially. The composed
rows whose setup consists of independent driver-blocking chains
(curate capstone, streaming ANN serving, sync mirror materialization)
submit those legs through :func:`run_legs`.

Two r14-ADVICE hardenings over the plain per-call ThreadPoolExecutor
the r14 code used:

- every submitted callable is wrapped in ``pyspark.util
  .inheritable_thread_target`` so, under the default pinned-thread
  mode, the caller's JVM thread-local properties (job group/tags,
  scheduler pool, job description) are inherited by the worker
  thread — a leg's jobs are labeled like its caller's.
- ONE module-level pool is reused across invocations instead of a
  fresh pool (and fresh paired JVM threads) per query call, so a long
  bench session cannot accumulate JVM-side threads; the pool is
  deliberately small (2-3 legs in flight is what fills a tail — guide
  §2.6) and its threads live for the process.

The pool class is looked up through ``concurrent.futures`` at call
time, and a pool built from a patched class is NOT cached — the
overlap-neutrality tests and A/B harness monkeypatch
``concurrent.futures.ThreadPoolExecutor`` with a serial inline
executor to pin that threaded and sequential execution produce
bit-identical rows.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable

_POOL_WORKERS = 4

_pool = None


def _executor():
    """The shared pool, rebuilt only when the executor CLASS changed
    since the last call (i.e. a test swapped in the serial inline
    executor, or swapped it back out)."""
    global _pool
    cls = cf.ThreadPoolExecutor
    if _pool is None or type(_pool) is not cls:
        _pool = cls(max_workers=_POOL_WORKERS)
    return _pool


def run_legs(*fns: Callable):
    """Run the given zero-arg legs concurrently on the shared pool and
    return their results in argument order; the first leg exception
    propagates. Each leg is wrapped in ``inheritable_thread_target``
    so Spark job properties set by the caller apply to the legs'
    jobs (wrapping is a no-op when a test's serial executor runs the
    leg inline on the calling thread: it re-sets the thread's own
    properties)."""
    try:
        from pyspark.util import inheritable_thread_target as _itt
    except ImportError:  # pragma: no cover - pyspark always present
        def _itt(f):
            return f

    pool = _executor()
    futs = [pool.submit(_itt(fn)) for fn in fns]
    return [f.result() for f in futs]
