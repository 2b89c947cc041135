"""Cooperative cancellation — parity with the reference's context.Context
plumbing (reference internal/workerpool/pool.go:77-79, 85-87, 127-129,
145-147, 188-193; internal/filecrawler/crawler.go:78-80, 144-147,
245-251: every blocking point checks ctx and drains cleanly).

Spark's equivalent is job-group cancellation: tag every action issued
inside the scope with a group id; ``cancel()`` (from any thread) asks the
scheduler to interrupt all running tasks of that group.  Like the
reference — which returns ``ctx.Err()`` alongside whatever had been
folded so far (crawler.go:245-251) — cancellation is cooperative: tasks
stop at the next record boundary, and the interrupted action raises.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


@contextmanager
def job_group(spark: SparkSession, group_id: str,
              description: str = "", interrupt_on_cancel: bool = True
              ) -> Iterator[str]:
    """Scope whose Spark actions are cancellable as a unit.

    ``interrupt_on_cancel=True`` sends a thread interrupt to running
    tasks (the analogue of the ctx check inside a blocked channel send);
    False only prevents new task launches.
    """
    sc = spark.sparkContext
    sc.setJobGroup(group_id, description or group_id, interrupt_on_cancel)
    try:
        yield group_id
    finally:
        # Clear the tag so later actions on this thread aren't swept up
        # by a stale cancel.
        sc.setJobGroup("", "", False)


def cancel(spark: SparkSession, group_id: str) -> None:
    """Cancel every active job in the group (callable from any thread)."""
    spark.sparkContext.cancelJobGroup(group_id)


def cancel_after(spark: SparkSession, group_id: str, seconds: float
                 ) -> threading.Timer:
    """Deadline analogue of context.WithTimeout: cancel the group after
    ``seconds``.  Returns the timer (``.cancel()`` it if the work wins)."""
    t = threading.Timer(seconds, cancel, args=(spark, group_id))
    t.daemon = True
    t.start()
    return t
