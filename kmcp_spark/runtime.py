"""Cached-block bookkeeping helpers.

``localCheckpoint`` materializes a DataFrame into storage-level blocks
that survive until the context dies — DataFrame.unpersist() does NOT
release them (it talks to the SQL cache manager, not the RDD block
store).  Iterative operators (connected components, EM reassignment)
create one checkpoint per round; without explicit release a long-lived
session accumulates every superseded round.  These helpers track block
ids through the JVM's persistent-RDD map so superseded checkpoints are
unpersisted the moment a newer one lands.
"""

from __future__ import annotations


def persistent_ids(sc) -> set[int]:
    """Ids of all currently persisted RDDs (cached + localCheckpointed)."""
    return set(sc._jsc.getPersistentRDDs().keySet().toArray())


def unpersist_ids(sc, ids: set[int]) -> None:
    """Release the given persisted RDDs (non-blocking), ignoring ids
    that have already been cleaned up."""
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


# ---------------------------------------------------------------- deferred
# Operator-internal persisted relations (shared gram tables, signature
# relations, multi-k levels) are only useful while the operator's
# returned LAZY plan is being consumed — but the operator cannot see
# when that happens.  Each such relation is registered here; the next
# operator call (or an explicit release_deferred()) unpersists the
# previous batch, so a long-lived session running many document queries
# holds at most one query's internal caches instead of accumulating
# every query's.  Unpersisting a .persist() cache is always safe: a
# consumer that runs afterwards simply recomputes.

_DEFERRED: list = []  # (tag, df) pairs


def widen_narrow_scan(df):
    """Repartition a relation UP to the cluster's default parallelism if
    (and only if) it arrives narrower — a small parquet fixture lands as
    one partition, which would run a whole mapInPandas kernel on one
    core.  A 100-TB scan already has >> defaultParallelism partitions
    and flows through untouched: no shuffle is ever added at scale.

    The partition-count probe (``df.rdd.getNumPartitions()``) costs one
    extra driver-side physical planning of the scan — no job runs.  For
    a leaf parquet scan that is single-digit milliseconds; accepted in
    exchange for keeping the decision correct for ANY input relation
    (paths, pre-shuffled upstreams, in-memory fixtures) instead of
    guessing from file listings."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if par > 1 and df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def defer_unpersist(df, tag: str = "doc"):
    """Register an operator-internal cached DataFrame for deferred
    release; returns ``df`` for chaining.  Only .persist() caches may be
    registered — never localCheckpoints (whose blocks are required for
    correctness once lineage is truncated).  ``tag`` namespaces the
    registry so unrelated operator families (document dedup vs the LSH
    pair stage) sweep only their own caches."""
    _DEFERRED.append((tag, df))
    return df


def release_deferred(tag: str | None = None) -> int:
    """Unpersist registered internal caches — all of them, or only those
    registered under ``tag``; returns how many were released."""
    global _DEFERRED
    if tag is None:
        pending, _DEFERRED = _DEFERRED, []
    else:
        pending = [e for e in _DEFERRED if e[0] == tag]
        _DEFERRED = [e for e in _DEFERRED if e[0] != tag]
    for _, df in pending:
        try:
            df.unpersist(False)
        except Exception:
            pass  # session already stopped
    return len(pending)
