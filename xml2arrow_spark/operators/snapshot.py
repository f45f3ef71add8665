"""Zero-copy dataset snapshots: frozen, readable versions of an encoded
dataset while curation keeps mutating it.

The reproducibility primitive a training pipeline needs: a run pins
``snapshots/<tag>`` and reads it forever; deletes, upserts, column-family
backfills, and compactions keep landing in the live tree without touching
the pinned bytes. This works because every write path in the engine is
**new-file-only** — the idempotent sinks (dynamic partition overwrite),
the manifest consolidate-swap, and the atomic sidecar writes all create
fresh inodes and at most DELETE old paths; nothing ever modifies a data
file in place. A snapshot therefore shares the current files by hard link
(one inode, two names): O(number of files) driver-side metadata
operations, zero payload copied — the local-filesystem realization of
Iceberg's snapshot model, where a snapshot is a manifest list referencing
immutable data files and deletes are deferred to GC (reference analog:
the config round-trip that freezes a resolved plan,
/root/reference/src/config.rs:296-300, widened to the whole dataset
state). On HDFS swap the link call for HDFS snapshots; on object stores,
for a manifest of object references.

Everything under the dataset root rides along — blocks, lineage manifest,
sidecar, column families, Bloom indexes — so ``read_encoded_dataset``,
``lookup_rows``, ``audit_dataset`` work on a snapshot unchanged (it IS a
complete dataset directory; it is even safely mutable, i.e. a writable
fork, since its writes are new-file-only too). Creation stages into a
dot-prefixed temp dir and renames: a crash mid-snapshot leaves ignorable
debris, never a half-readable tag.
"""

from __future__ import annotations

import os
import shutil

__all__ = [
    "snapshot_dataset",
    "snapshot_path",
    "list_snapshots",
    "drop_snapshot",
    "expire_snapshots",
    "vacuum",
    "SNAPSHOTS_DIR",
]

SNAPSHOTS_DIR = "snapshots"
_SNAP_SIDEVAR = "_snapshot.yaml"
# transient state never belongs in a frozen view
# _recluster_src (r06 / ADVICE r05): recluster's decoded staging copy of
# the whole corpus. Live only while the DEST dataset has no sidecar yet
# (pre-commit resume state); once the sidecar exists it is abandoned
# debris — excluded from snapshots always (a frozen view must never
# hardlink a staging copy) and vacuumed when the commit is provably done.
_EXCLUDE_DIRS = {SNAPSHOTS_DIR, ".rewrite_tmp", "_recluster_src"}


def snapshot_path(path: str, tag: str) -> str:
    return os.path.join(path, SNAPSHOTS_DIR, tag)


def _check_tag(tag: str) -> None:
    if not tag or tag.startswith(".") or "/" in tag or os.sep in tag:
        raise ValueError(f"invalid snapshot tag {tag!r}")


def _link_or_copy(src: str, dst: str) -> bool:
    """Hard link; fall back to a copy on filesystems without link support
    (the snapshot is then still correct, just not zero-copy). Returns
    whether a link was made."""
    try:
        os.link(src, dst)
        return True
    except OSError:
        shutil.copy2(src, dst)
        return False


def snapshot_dataset(path: str, tag: str) -> dict:
    """Freeze the dataset at ``path`` as ``snapshots/<tag>``.

    Refuses an existing tag (snapshots are immutable names; drop first to
    re-tag). Returns ``{files, linked, bytes}`` — ``bytes`` is the shared
    payload size, not new disk use."""
    import yaml

    _check_tag(tag)
    final = snapshot_path(path, tag)
    if os.path.exists(final):
        raise ValueError(f"snapshot {tag!r} already exists at {final!r}")
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    staging = os.path.join(path, SNAPSHOTS_DIR, f".tmp-{tag}")
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    n_files = n_linked = n_bytes = 0
    for root, dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        if rel == ".":
            dirs[:] = [d for d in dirs if d not in _EXCLUDE_DIRS]
        for f in files:
            # skip torn-write debris and the live writer lease; everything
            # durable is snapshot-worthy
            if f.endswith(".inprogress") or f == "_LEASE":
                continue
            src = os.path.join(root, f)
            dst_dir = staging if rel == "." else os.path.join(staging, rel)
            os.makedirs(dst_dir, exist_ok=True)
            if _link_or_copy(src, os.path.join(dst_dir, f)):
                n_linked += 1
            n_files += 1
            n_bytes += os.path.getsize(src)
    with open(os.path.join(staging, _SNAP_SIDEVAR), "w") as f:
        f.write(yaml.safe_dump({"tag": tag, "files": n_files, "bytes": n_bytes}))
    os.rename(staging, final)
    return {"files": n_files, "linked": n_linked, "bytes": n_bytes}


def list_snapshots(path: str) -> list[str]:
    root = os.path.join(path, SNAPSHOTS_DIR)
    if not os.path.isdir(root):
        return []
    return sorted(t for t in os.listdir(root) if not t.startswith("."))


def drop_snapshot(path: str, tag: str) -> bool:
    """Remove a snapshot. Hard-linked inodes still referenced by the live
    tree (or other snapshots) survive — this only drops references, the
    filesystem's link count is the GC."""
    _check_tag(tag)
    final = snapshot_path(path, tag)
    if not os.path.isdir(final):
        return False
    shutil.rmtree(final)
    return True


def expire_snapshots(
    path: str,
    keep: list[str] | None = None,
    retain_last: int | None = None,
) -> list[str]:
    """Retention policy for snapshots (Iceberg's ``expire_snapshots``):
    drop every tag NOT in ``keep``, except the ``retain_last`` most
    recently CREATED ones (directory mtime — tag names carry no time).
    Storage is reclaimed per inode by the filesystem link count, exactly
    as :func:`drop_snapshot`. Returns the dropped tags. With neither
    argument this is a no-op (never mass-delete by default)."""
    if keep is None and retain_last is None:
        return []
    keep_set = set(keep or [])
    tags = list_snapshots(path)
    if retain_last:
        by_age = sorted(
            tags, key=lambda t: os.path.getmtime(snapshot_path(path, t))
        )
        keep_set.update(by_age[-retain_last:])
    dropped = [t for t in tags if t not in keep_set]
    for t in dropped:
        drop_snapshot(path, t)
    return dropped


def vacuum(path: str) -> dict:
    """Remove crash debris from a dataset tree — the GC sweep every
    long-lived 10^12-sequence dataset needs: each crash-safe write in the
    engine stages under a temp name and renames (sidecars, metadata
    appends, Bloom partitions, compaction outputs, snapshot staging,
    mutation staging), so a kill can strand ``*.inprogress`` / ``*.tmp``
    files, ``.rewrite_tmp`` dirs, and ``snapshots/.tmp-<tag>`` staging
    dirs. All of them are ignorable by contract (readers never look at
    temp names) but cost bytes forever; vacuum deletes them and heals a
    torn manifest swap. CONTRACT: run with no active writer on the tree,
    like compaction — a live writer's in-flight temp file is
    indistinguishable from debris. Structured-streaming checkpoint dirs
    (``*_checkpoint``) are skipped: Spark owns their temp-file lifecycle.
    Unmanifested block partitions are NOT touched — they are the encode
    crash window that resume REPAIRS (deleting them would turn a resumable
    run into data loss); audit_dataset reports them.

    Returns ``{"files_removed", "dirs_removed", "bytes_reclaimed"}``."""
    from xml2arrow_spark.operators.checkpoint import _heal_torn_swap
    from xml2arrow_spark.operators.lease import dataset_lease

    with dataset_lease(path):
        return _vacuum_locked(path, _heal_torn_swap)


def _vacuum_locked(path: str, _heal_torn_swap) -> dict:
    n_files = n_dirs = n_bytes = 0
    for root, dirs, files in os.walk(path):
        pruned = []
        for d in list(dirs):
            full = os.path.join(root, d)
            if d.endswith("_checkpoint"):
                pruned.append(d)
            elif (
                d == ".rewrite_tmp"
                or (
                    d == "_recluster_src"
                    # staging is live resume state only PRE-commit: the
                    # sibling sidecar existing proves the recluster
                    # committed and the copy is abandoned (ADVICE r05)
                    and os.path.exists(os.path.join(root, "_manifest.yaml"))
                )
                or (
                    os.path.basename(root) == SNAPSHOTS_DIR
                    and d.startswith(".tmp-")
                )
            ):
                n_bytes += sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(full)
                    for f in fs
                )
                shutil.rmtree(full, ignore_errors=True)
                n_dirs += 1
                pruned.append(d)
        dirs[:] = [d for d in dirs if d not in pruned]
        for f in files:
            if f.endswith(".inprogress") or f.endswith(".tmp"):
                full = os.path.join(root, f)
                try:
                    n_bytes += os.path.getsize(full)
                    os.remove(full)
                    n_files += 1
                except OSError:
                    pass
    # heal LAST so the sweep above counted .rewrite_tmp itself (the heal
    # also removes it); the rename makes a torn manifest swap readable again
    _heal_torn_swap(path)
    return {
        "files_removed": n_files,
        "dirs_removed": n_dirs,
        "bytes_reclaimed": n_bytes,
    }
