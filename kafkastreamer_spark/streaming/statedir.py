"""Crash-atomic persisted state for foreachBatch sinks.

Several sinks keep their state as a small parquet table that each
micro-batch reads, merges with the batch, and re-persists
(``merge_upsert_sink``, ``cms_merge_sink``, ``kll_merge_sink``,
``similarity.maintain_topk``). A plain ``mode("overwrite")`` on the
state dir is delete-then-write: a crash mid-job destroys the ONLY
record of prior arrivals, and replay then silently rebuilds from the
last delta alone. Even the tmp-dir + ``shutil.move`` variant has a
window (between removing the old dir and moving the new one in) where
the state does not exist on disk.

This module closes that window with the write-audit-publish pattern
the batch engine already uses (``io.write_audit_publish``): every
publish writes a FRESH versioned directory, then flips a pointer file
with ``os.rename`` — atomic on POSIX, and the same rename-based commit
HDFS/object-store committers rely on. The previously published
version directory is never touched until AFTER the flip succeeds, so
a crash at any instant leaves the pointer naming a complete, fully
written table:

- crash before/inside the version write  -> pointer still names the
  old version; the partial new dir is orphaned and GC'd later;
- crash between write and flip           -> same;
- crash after flip, before checkpoint    -> pointer names the new
  version; the replayed batch re-reads it and re-merges, which each
  sink makes idempotent (dedup / last-writer-wins / monotone merge);
- crash during GC                        -> pointer already correct,
  leftover dirs are GC'd on the next publish.

Version dirs are ``state_dir/v{batch_id}_{attempt}``; the attempt
counter guarantees a replayed batch never overwrites the directory the
pointer currently references while reading from it.

Durability scope: the guarantees above are against PROCESS crashes
(driver/executor death at any instant). Against OS crash / power loss
the pointer flip itself is made durable by fsyncing the tmp file and
the containing directory after the rename, but the parquet payload's
durability is the filesystem's business (local-FS writes are not
fsync'd by Spark); on HDFS/object stores the store's commit semantics
apply.

Concurrent readers: the flip retains the PREVIOUS published version
dir and GCs only older ones, so a reader (``read_state`` or a lazy
DataFrame planned over it) that resolved the pointer just before a
publish can still scan its version — one publish of slack. Readers
that lag more than one publish behind an active sink must coordinate
externally.

Checkpoint pairing: a state_dir and its streaming checkpoint live and
die TOGETHER. The applied-batch high-water mark records only the most
recent batch id, so re-pointing a fresh checkpoint (batch ids restart
at 0) at an existing state_dir would silently re-apply deltas on top
of stale totals in the non-idempotent sinks — ``publish_state`` now
detects the id regression and raises instead.

Reference parity note: the reference persists its per-key state via a
Kafka changelog topic (v1/src/main/java/Stream/Streamer.java:323-344),
whose durability comes from the broker's log append; this is the
filesystem equivalent for the engine's parquet-backed sinks.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

POINTER = "_CURRENT"


def current_version(state_dir: str) -> str | None:
    """Name of the currently published version dir, or None if no
    state has ever been published."""
    ptr = os.path.join(state_dir, POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        name = fh.read().strip()
    return name or None


def applied_batch(state_dir: str) -> int | None:
    """The batchId whose publish is currently pointed at, or None.

    Versioned dir names are ``v{batch_id}_{attempt}``, so the pointer
    doubles as a batchId high-water mark: a sink whose merge is NOT
    naturally idempotent (delta sums, sketch folds) skips a replayed
    batch when ``applied_batch(dir) == batch_id`` — the crash between
    pointer flip and checkpoint commit then re-delivers the batch but
    never re-applies it (exactly-once on the state table)."""
    name = current_version(state_dir)
    if name is None:
        return None
    try:
        return int(name[1:].split("_", 1)[0])
    except ValueError:
        return None


def state_exists(state_dir: str) -> bool:
    """True iff a complete published version exists."""
    name = current_version(state_dir)
    return name is not None and os.path.isdir(os.path.join(state_dir, name))


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The currently published state table, or None before the first
    publish. Always a complete table: the pointer only ever names a
    version whose parquet job committed."""
    name = current_version(state_dir)
    if name is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, name))


def _fresh_version_dir(state_dir: str, batch_id: int) -> str:
    attempt = 0
    while True:
        name = f"v{batch_id}_{attempt}"
        path = os.path.join(state_dir, name)
        if not os.path.exists(path):
            return name
        attempt += 1


def publish_state(
    df: DataFrame, state_dir: str, batch_id: int, pre_flip_hook=None
) -> None:
    """Persist ``df`` as the new current state, atomically.

    1. write the table into a fresh ``v{batch_id}_{attempt}`` dir
       (never the dir the pointer references — safe to plan lazily
       over the current state);
    2. flip the pointer: write ``_CURRENT.tmp`` then ``os.rename`` it
       over ``_CURRENT`` (atomic replace on POSIX), then fsync the
       state_dir so the rename survives OS crash/power loss;
    3. GC older version dirs, RETAINING the one the pointer named
       before this flip — a concurrent reader that resolved the
       pointer just before the flip can still scan it (best-effort;
       leftovers are retried on the next publish).

    Raises ``ValueError`` if ``batch_id`` is LOWER than the already
    applied batch: streaming batch ids only move forward within one
    checkpoint, so a regression means an existing state_dir was
    re-paired with a fresh checkpoint — continuing would re-apply
    deltas on top of stale totals in the non-idempotent sinks.

    ``pre_flip_hook(batch_id)``, if given, runs after the version
    write but BEFORE the pointer flip — the failure-injection point
    for the mid-write crash tests: a hook that raises simulates a
    driver death in the widest window the old overwrite-in-place
    design could not survive.
    """
    applied = applied_batch(state_dir)
    if applied is not None and batch_id < applied:
        raise ValueError(
            f"batch id regression on {state_dir!r}: batch {batch_id} "
            f"arrived but batch {applied} is already applied — a fresh "
            "checkpoint was re-paired with an existing state_dir "
            "(create and delete them together; see module docstring)"
        )
    os.makedirs(state_dir, exist_ok=True)
    prev = current_version(state_dir)
    name = _fresh_version_dir(state_dir, batch_id)
    df.write.mode("overwrite").parquet(os.path.join(state_dir, name))
    if pre_flip_hook is not None:
        pre_flip_hook(batch_id)
    ptr = os.path.join(state_dir, POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(name)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, ptr)  # the atomic commit point
    try:
        dir_fd = os.open(state_dir, os.O_RDONLY)
        try:
            os.fsync(dir_fd)  # make the rename durable, not just atomic
        finally:
            os.close(dir_fd)
    except OSError:
        pass  # platforms that can't fsync a directory keep atomicity only
    for entry in os.listdir(state_dir):
        if entry in (name, prev, POINTER) or not entry.startswith("v"):
            continue
        shutil.rmtree(os.path.join(state_dir, entry), ignore_errors=True)
