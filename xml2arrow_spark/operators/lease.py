"""Advisory mutation lease: at most one WRITER mutates a dataset tree at
a time.

Every mutation in the engine is crash-safe against ITSELF (replay
repairs), but two CONCURRENT writers can interleave in ways replay cannot
repair — the documented out-of-contract cases (a resume during a delete,
two upserts racing one manifest swap), plus one subtle loss this module
closes: :func:`~xml2arrow_spark.operators.tombstones.tombstone_rows`
landing between a rewrite's tombstone FOLD (which read the pending set)
and its partition CLEAR would have its brand-new tombstone wiped without
ever being applied. Rather than documenting "don't run writers
concurrently", the lease enforces it.

Mechanism — the local-filesystem realization of a conditional put (an
object store uses if-none-match PUT, HDFS uses create-no-overwrite, an
Iceberg catalog uses its own optimistic commit):

- acquire = ``open(_LEASE, O_CREAT | O_EXCL)`` with
  ``{owner, pid, host, acquired_at, ttl_s}`` inside — atomic on POSIX.
- release = unlink (by the owner only).
- a holder that died leaves the file; a competing acquirer may STEAL it
  when it is provably stale: its pid is dead on the same host, or its
  TTL has expired (the cross-host signal). Stealing unlinks + retries
  the atomic create, so two stealers still race one O_EXCL create and
  exactly one wins.

READERS never take the lease: every read path works against the
consistent on-disk state machine (rename-committed manifests, pending
tombstones, new-file-only sinks), which is the whole point of those
contracts.
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid
from contextlib import contextmanager

__all__ = ["dataset_lease", "with_dataset_lease", "LeaseHeldError", "LEASE_NAME"]

LEASE_NAME = "_LEASE"
DEFAULT_TTL_S = 3600.0


class LeaseHeldError(RuntimeError):
    """Another live writer holds the dataset's mutation lease."""


def _lease_path(path: str) -> str:
    return os.path.join(path, LEASE_NAME)


def _read(lpath: str) -> dict | None:
    try:
        with open(lpath) as f:
            return json.loads(f.read())
    except (OSError, ValueError):
        # vanished between exists() and read, or torn mid-write by a dying
        # holder — treat a torn lease as stale (its writer never returned
        # from acquire, so it holds nothing)
        return None


def _is_stale(info: dict | None) -> bool:
    if info is None:
        return True
    if float(info.get("acquired_at", 0)) + float(
        info.get("ttl_s", DEFAULT_TTL_S)
    ) < time.time():
        return True  # expired — the cross-host staleness signal
    if info.get("host") == socket.gethostname():
        try:
            os.kill(int(info["pid"]), 0)
        except (ProcessLookupError, ValueError):
            return True  # same host, holder process is gone
        except PermissionError:
            pass  # EPERM: the holder is ALIVE under another uid (r06 /
            # ADVICE r05: treating any OSError as dead would steal a
            # live same-host lease held by a different user)
    return False


@contextmanager
def dataset_lease(path: str, ttl_s: float = DEFAULT_TTL_S, wait_s: float = 0.0):
    """Hold the dataset's writer lease for the duration of the block.

    Raises :class:`LeaseHeldError` if a LIVE writer holds it (after
    polling up to ``wait_s`` seconds); a stale lease (dead pid on this
    host, or expired TTL) is stolen. The lease releases on normal exit
    AND on exception (a failed mutation is replayable and must not brick
    the tree); only a hard kill leaves the file, which the pid/TTL
    staleness rules then clear."""
    lpath = _lease_path(path)
    mine = {
        "owner": uuid.uuid4().hex,
        "pid": os.getpid(),
        "host": socket.gethostname(),
        "acquired_at": time.time(),
        "ttl_s": float(ttl_s),
    }
    deadline = time.time() + wait_s
    while True:
        try:
            fd = os.open(lpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(json.dumps(mine))
            break
        except FileExistsError:
            info = _read(lpath)
            if _is_stale(info):
                # steal via atomic RENAME (r06 / ADVICE r05): a bare
                # unlink raced — between one stealer's read and unlink,
                # another stealer could already have unlinked the stale
                # file AND created its own fresh lease, which the first
                # stealer would then delete, leaving TWO live writers.
                # os.rename of the stale file has exactly one winner
                # (the loser gets FileNotFoundError and re-enters the
                # loop, where it sees the winner's fresh lease).
                steal = f"{lpath}.steal-{uuid.uuid4().hex}"
                try:
                    os.rename(lpath, steal)
                    os.unlink(steal)
                except FileNotFoundError:
                    pass
                continue
            if time.time() >= deadline:
                raise LeaseHeldError(
                    f"dataset at {path!r} is being mutated by "
                    f"{info.get('owner', '?')[:12]} (pid {info.get('pid')} on "
                    f"{info.get('host')}, ttl {info.get('ttl_s')}s); retry "
                    f"after it finishes or its lease goes stale"
                ) from None
            time.sleep(min(0.05, max(deadline - time.time(), 0.0)))
    try:
        yield mine["owner"]
    finally:
        # release only OUR lease — if someone stole it (we overran our
        # TTL), their file must survive. Same rename discipline as the
        # steal (r06): rename-away first (one winner), THEN inspect; a
        # plain read-then-unlink could delete a stealer's fresh lease
        # created between the read and the unlink. If the renamed file
        # turns out not to be ours, hard-link it back (refuses if a newer
        # lease already appeared) and drop the temp name either way.
        rel = f"{lpath}.release-{mine['owner'][:12]}"
        try:
            os.rename(lpath, rel)
        except FileNotFoundError:
            pass
        else:
            info = _read(rel)
            if info is not None and info.get("owner") != mine["owner"]:
                try:
                    os.link(rel, lpath)
                except (FileExistsError, OSError):
                    pass
            try:
                os.unlink(rel)
            except FileNotFoundError:
                pass


def with_dataset_lease(fn=None, *, arg: int = 1, kw: str = "path"):
    """Decorator for mutation entry points: the dataset root is positional
    argument ``arg`` (default: second — the shared signature of
    encode_dataset / delete_rows / upsert_rows / tombstone_rows) or the
    ``kw`` keyword (``out_path`` for the file-dataset sinks). The root is
    created if absent (a first encode holds the lease on the directory it
    is about to populate)."""
    import functools

    def deco(f):
        @functools.wraps(f)
        def inner(*args, **kwargs):
            path = kwargs[kw] if kw in kwargs else args[arg]
            os.makedirs(path, exist_ok=True)
            with dataset_lease(path):
                return f(*args, **kwargs)

        return inner

    return deco(fn) if fn is not None else deco
