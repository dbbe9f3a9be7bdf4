"""The ONE versioned-directory store contract (VERDICT r7 #2).

Three index families persist incrementally and used to re-implement
the same four mechanics each: the MinHash band index
(``operators/dedup.py``: base/bands/remap/counts), the exact-dedup
hash index (``streaming/dedup.py``: hashes_base/hashes +
blooms_base/blooms), and the RP sketch / IVF code appends
(``streaming/ann.py``, ``ingest=`` partitions — those delegate the
same idempotence to Spark's dynamic partition overwrite and only
share the listing helper here). This module owns the mechanics; the
callers keep their fold semantics (what a "merge" means is
per-family).

Layout: ``<root>/<delta_sub>/v=<N>`` per-ingest deltas (N = the
monotone ingest/batch id; per-version overwrite makes a replayed
ingest idempotent) and ``<root>/<base_sub>/v=<B>`` compacted bases
(B = the newest version folded into the base).

The contract, shared verbatim by every family:

* **read**: newest committed base with B < ``below``, plus deltas
  B < v < ``below``. Deltas at or below the base are IGNORED even if
  still on disk — a crash between a base commit and delta cleanup
  must never double-count.
* **commit**: each new base materializes in a hidden temp dir and
  commits by ONE ``os.rename`` to a fresh ``v=<newv>`` name. With
  multiple families committing together (hash + bloom), renames run
  in a fixed order and ONLY the LAST is the commit point readers key
  off; a crash between renames leaves orphaned earlier-family dirs
  that are unreadable (no matching final-family base) and are swept
  by the retry before re-renaming (``os.rename`` cannot replace a
  non-empty dir — without the sweep an inline-at-trigger-start
  compaction would wedge its stream on every retry).
* **cleanup**: folded deltas (v <= newv) and superseded bases
  (v < newv) are removed only AFTER the commit point.

(On an object store without atomic rename, the commit point becomes a
manifest write — same pattern as the aggregate store's swap in
``store.py``.)
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"v=(\d+)")


def versions(path: str) -> list[int]:
    """Sorted committed version numbers under ``path`` (``v=<N>``
    dirs; anything else — temp dirs, stray files — is ignored)."""
    if not os.path.isdir(path):
        return []
    return sorted(
        int(m.group(1))
        for name in os.listdir(path)
        if (m := _VERSION_RE.fullmatch(name))
    )


def base_and_deltas(
    root: str,
    base_sub: str,
    delta_sub: str,
    below: int | None = None,
) -> tuple[int | None, list[int]]:
    """The versions a reader folds: the newest base with version <
    ``below`` (None when no base qualifies) and the delta versions
    strictly between it and ``below``. Deltas at or below the base
    are excluded even if still on disk (crash between base commit and
    delta cleanup)."""

    def _keep(v: int) -> bool:
        return below is None or v < below

    bases = [v for v in versions(f"{root}/{base_sub}") if _keep(v)]
    b = max(bases) if bases else None
    deltas = [
        v
        for v in versions(f"{root}/{delta_sub}")
        if _keep(v) and (b is None or v > b)
    ]
    return b, deltas


def read_family(
    spark: SparkSession,
    root: str,
    base_sub: str,
    delta_sub: str,
    base: int | None,
    deltas: list[int],
    schema: str | None = None,
) -> list[DataFrame]:
    """The fold inputs for ONE family at an explicit (base, deltas)
    selection — pass the AUTHORITATIVE family's selection to a slaved
    sidecar family (the bloom sidecar reads at the HASH family's
    versions) so the pair always folds consistently."""
    parts = []
    for sub, vs in ((base_sub, [base] if base is not None else []),
                    (delta_sub, deltas)):
        for v in vs:
            r = spark.read
            if schema is not None:
                r = r.schema(schema)
            parts.append(r.parquet(f"{root}/{sub}/v={v}"))
    return parts


def union_all(parts: list[DataFrame]) -> DataFrame | None:
    """unionByName fold of the parts (None for an empty list)."""
    if not parts:
        return None
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def commit_bases(
    root: str,
    frames: list[tuple[str, DataFrame]],
    newv: int,
    allow_replace: bool = False,
    overlap_after_first: bool = False,
) -> None:
    """Atomically commit ``frames`` — ``(base_sub, df)`` in COMMIT
    ORDER, the last being the commit point readers key off — as base
    version ``newv``. Every frame materializes fully in a temp dir
    BEFORE any rename; non-final targets are swept first (retry after
    a crash between renames re-finds its own orphan). ``allow_replace``
    permits replacing an existing FINAL target (only for compactions
    whose fold can change without a new version, e.g. quarantine
    re-admission relabeling clusters) — it trades the no-pre-existing-
    name guarantee for in-place replacement, so callers should skip
    the commit entirely when the fold is a no-op.

    ``overlap_after_first`` (r16, guide §2.6): materialize the FIRST
    frame's temp dir serially, then the remaining temps from a small
    thread pool — the renames below stay strictly serial in commit
    order, so crash-safety is unchanged (the commit point is the LAST
    rename, never a temp write). Only safe when the caller's frames
    share no UNMATERIALIZED lazy checkpoint beyond one the first
    frame materializes (the token-index families: dl's write
    materializes the shared tf checkpoint, then df/stats/tf are
    independent jobs over it); default off — several callers' frames
    have not been audited for that race."""

    def _write_tmp(sub: str, df) -> tuple[str, str]:
        tmp = f"{root}/.compact_{sub}_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        os.makedirs(f"{root}/{sub}", exist_ok=True)
        return (sub, tmp)

    if overlap_after_first and len(frames) > 2:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        tmps = [_write_tmp(*frames[0])]
        rest = frames[1:]
        with ThreadPoolExecutor(max_workers=len(rest)) as pool:
            futs = [
                pool.submit(
                    inheritable_thread_target(_write_tmp), sub, df
                )
                for sub, df in rest
            ]
            tmps.extend(f.result() for f in futs)
    else:
        tmps = [_write_tmp(sub, df) for sub, df in frames]
    for i, (sub, tmp) in enumerate(tmps):
        target = f"{root}/{sub}/v={newv}"
        if i < len(tmps) - 1 or allow_replace:
            shutil.rmtree(target, ignore_errors=True)
        os.rename(tmp, target)


def cleanup_after_compact(
    root: str,
    delta_subs: list[str],
    base_subs: list[str],
    newv: int,
) -> None:
    """Post-commit-point cleanup: folded deltas (v <= newv) and
    superseded bases (v < newv). Runs strictly AFTER ``commit_bases``
    — a crash in between leaves stale dirs readers already ignore."""
    for sub in delta_subs:
        for v in versions(f"{root}/{sub}"):
            if v <= newv:
                shutil.rmtree(f"{root}/{sub}/v={v}", ignore_errors=True)
    for sub in base_subs:
        for v in versions(f"{root}/{sub}"):
            if v < newv:
                shutil.rmtree(f"{root}/{sub}/v={v}", ignore_errors=True)
