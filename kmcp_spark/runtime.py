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
