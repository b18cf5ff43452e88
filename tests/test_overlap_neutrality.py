"""The r14 §2.6 leg-overlap changes must be CONCURRENCY-NEUTRAL: a
plan whose independent driver-blocking legs run from a thread pool
must produce bit-identical rows to the same legs run inline, in the
pre-change sequential order. Pinned by monkeypatching
``concurrent.futures.ThreadPoolExecutor`` with a serial inline
executor (the plan functions import it at call time, so the patch
takes effect per invocation)."""

from __future__ import annotations

import concurrent.futures as cf

import pytest

import lms_erp_data_integration_spark.plans as plans
from lms_erp_data_integration_spark.caching import release_cached


class _SerialFuture:
    def __init__(self, fn, *a, **kw):
        try:
            self._res, self._exc = fn(*a, **kw), None
        except BaseException as e:  # noqa: BLE001
            self._res, self._exc = None, e

    def result(self):
        if self._exc is not None:
            raise self._exc
        return self._res


class _SerialExecutor:
    def __init__(self, *a, **kw):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def submit(self, fn, *a, **kw):
        return _SerialFuture(fn, *a, **kw)

    def map(self, fn, *iterables):
        return list(map(fn, *iterables))


@pytest.mark.parametrize(
    "name", ["sync_pipeline_run_report", "stream_sim_ivf_search"]
)
def test_threaded_legs_match_serial_rows(spark, sf_dir, name, monkeypatch):
    fn = plans.QUERIES[name]
    threaded = sorted(map(tuple, fn(spark, sf_dir).collect()))
    release_cached()
    monkeypatch.setattr(cf, "ThreadPoolExecutor", _SerialExecutor)
    serial = sorted(map(tuple, fn(spark, sf_dir).collect()))
    release_cached()
    assert threaded == serial
    assert threaded  # non-empty: the plan actually ran both arms
