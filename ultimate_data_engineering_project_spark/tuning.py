"""Scale-adaptive execution knobs shared by operators and plans.

Two decisions in this engine are SCALE-DEPENDENT — the right choice at
sf0.1 on one machine is the wrong one over a 100 TB corpus — and both
were hard-coded to the large-scale answer in r14, which the driver's
cold-sweep measurements punished (34/44 queries regressed; VERDICT.md
r14 "What's wrong" #1/#5):

* **Materializing a frame consumed by several plan branches** ("pin").
  Catalyst performs no cross-branch subtree reuse, so a frame feeding
  both sides of a self-join is recomputed per side.  Recomputing twice
  costs two passes over the input; pinning costs one pass PLUS a full
  materialization (a blocking job, executor storage, lost pipeline
  parallelism, and for eager pins a job at DataFrame-CONSTRUCTION
  time).  On a small input the double computation overlaps on idle
  cores and wins; over a 100 TB input the extra full pass dwarfs the
  materialization.  :func:`pin` makes the choice from the estimated
  input size, parameterized by conf.

* **Scoring candidate pairs in a vectorized Python kernel vs a JVM
  expression** (operators/similarity.scored_pairs): the Arrow kernel
  is ~100x cheaper per pair but pays Python-worker fan-out + Arrow
  (de)serialization per stage — a fixed multi-second cost on a fresh
  session that dominates small candidate sets (fresh-process A/B at
  sf0.1: kernel 8.5s vs expression <1s for brute-force cosine).  The
  dispatch there uses :func:`estimate_input_bytes` with its own
  threshold conf.

Both estimators are metadata-only (`inputFiles()` + local stat): they
never trigger jobs and never finalize the AQE plan.

Fault tolerance at scale (r14 ADVICE item): `localCheckpoint` stores
non-replicated executor-local blocks and TRUNCATES lineage — one lost
executor kills the query.  When :func:`pin` decides to materialize on
a non-local master it therefore uses `persist(DISK_ONLY)` (lineage
kept, recompute on loss) unless the conf forces the checkpoint form.
"""

from __future__ import annotations

import os
from urllib.parse import urlsplit

from pyspark.sql import DataFrame

#: conf keys (documented in OPTIMIZATION_r15.md)
PIN_MODE_CONF = "spark.udep.pin.mode"  # auto | always | never
PIN_MIN_BYTES_CONF = "spark.udep.pin.minInputBytes"
PIN_STORAGE_CONF = "spark.udep.pin.storage"  # auto | localCheckpoint | diskPersist

#: Pin when the pinned frame's SOURCE input exceeds this (auto mode).
#: Rationale: the loss from NOT pinning is bounded by one extra pass
#: over the input (the duplicated branch), which overlaps on idle
#: cores below full cluster utilization; the loss from pinning is a
#: blocking materialization job + storage churn, measured at 0.3-5s
#: per query at sf0.1 (driver r14: minhash_recall_audit +5.6s,
#: simhash +0.7s).  1 GiB per scan is the point where a duplicated
#: pass stops hiding behind idle cores on any practical executor
#: sizing and the one-materialization shape must win.
PIN_MIN_BYTES_DEFAULT = 1 << 30


def estimate_input_bytes(df: DataFrame) -> int | None:
    """Total size of the frame's source files, metadata-only.

    None when the frame has no file listing (in-memory/RDD-backed
    sources, e.g. an already-checkpointed batch), a remote scheme
    (sizes not cheaply listable driver-side), or the listing raced a
    rewrite — callers fall back to their documented default.  Never
    runs a job and never finalizes the AQE plan (probing
    ``.rdd.getNumPartitions()`` instead would execute upstream
    exchange stages)."""
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - sources without file listing
        return None
    if not files:
        return None
    total = 0
    for f in files:
        u = urlsplit(f)
        if u.scheme.lower() not in ("", "file"):
            return None
        try:
            total += os.path.getsize(u.path or f)
        except OSError:  # pragma: no cover - listing raced a rewrite
            return None
    return total


def _conf(df: DataFrame, key: str, default: str) -> str:
    try:
        return str(df.sparkSession.conf.get(key, default))
    except Exception:  # pragma: no cover - conf service unavailable
        return default


def pin(df: DataFrame, *, eager: bool = False, force: bool = False) -> DataFrame:
    """Materialize ``df`` once for multi-branch consumption — IF the
    input is big enough that recomputing the subtree per branch costs
    more than materializing it (see module docstring).

    Modes (``spark.udep.pin.mode``):
      * ``auto`` (default): pin iff the frame's source files total >=
        ``spark.udep.pin.minInputBytes`` (default 1 GiB).  Frames with
        no file listing (in-memory sources) are NOT pinned — such
        frames are either already materialized (checkpointed batches)
        or test-sized; a cluster feeding this engine from non-file
        sources should set the mode explicitly.
      * ``always`` / ``never``: force the choice (A/B and cluster
        overrides).

    Storage (``spark.udep.pin.storage``):
      * ``auto`` (default): ``localCheckpoint`` on a local[...] master
        (single machine — executor loss means the app is gone anyway);
        ``persist(DISK_ONLY)`` otherwise, keeping lineage so a lost
        executor recomputes instead of failing the query (ADVICE r14).
      * ``localCheckpoint`` / ``diskPersist``: force the form.

    ``eager`` controls localCheckpoint eagerness only; the default
    False avoids blocking jobs at DataFrame-construction time (the
    r14 cold-sweep cost: every ``explain``/plan build ran the jobs).

    ``force=True`` skips the size gate — for frames A/B-measured worth
    materializing even on small inputs (e.g. the recall audit's shared
    shingle frames: every no-pin variant was 1.5-3x slower AND
    unstable at sf0.1); only the storage mechanism stays
    scale/cluster-dependent.  ``spark.udep.pin.mode=never`` still
    wins, as the global escape hatch.
    """
    mode = _conf(df, PIN_MODE_CONF, "auto")
    if mode == "never":
        return df
    if mode != "always" and not force:
        size = estimate_input_bytes(df)
        try:
            thresh = int(_conf(df, PIN_MIN_BYTES_CONF, str(PIN_MIN_BYTES_DEFAULT)))
        except ValueError:
            thresh = PIN_MIN_BYTES_DEFAULT
        if size is None or size < thresh:
            return df

    storage = _conf(df, PIN_STORAGE_CONF, "auto")
    if storage == "auto":
        master = ""
        try:
            master = df.sparkSession.sparkContext.master or ""
        except Exception:  # pragma: no cover
            pass
        storage = "localCheckpoint" if master.startswith("local") else "diskPersist"
    if storage == "diskPersist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)
    return df.localCheckpoint(eager=eager)
