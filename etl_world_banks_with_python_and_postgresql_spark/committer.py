"""Pluggable atomic commit seam for every JSON ledger / manifest in the
engine.

Every piece of metadata that makes state visible -- the IVM ledgers
(`operators/ivm.py`), the incremental-table manifest
(`sources/incremental.py`), the streaming epoch ledger and posting-index
stats (`streaming/pipeline.py`, `operators/text.py`) -- commits through
this module instead of hand-rolled ``tmp + os.replace``. That buys two
things the scattered call sites could not give:

1. **One documented durability contract** (below) instead of five
   implicit ones.
2. **A stale-read guard**: ``load_json`` returns a :class:`Token`
   (content etag) alongside the object; passing it back as
   ``commit_json(..., expect=token)`` turns the write into a
   compare-and-swap that raises :class:`ConcurrentCommitError` if the
   file changed since the load -- the read-modify-write race between
   two writers can no longer silently drop a ledger entry.

Durability / concurrency contract (the POSIX default)
------------------------------------------------------
* A commit is ONE ``os.replace`` of a fully-written, ``fsync``-ed,
  uniquely-named temp file, followed by an fsync of the parent
  directory: readers see the old bytes or the new bytes, never a mix
  (atomic rename on one POSIX filesystem), and a power loss can roll a
  commit back (stale but consistent) but never publish a torn or empty
  ledger -- rename durability requires syncing BOTH the file data and
  the directory entry, in that order.
* Guarded commits (``expect=``) serialize the check-and-swap through an
  ``flock``-ed sidecar ``<path>.lock`` file, so they are safe between
  cooperating processes ON ONE HOST / ONE POSIX FILESYSTEM. Across
  hosts on NFS-without-flock the guard degrades to best-effort; the
  engine's baseline contract there is SINGLE WRITER per ledger path
  (one driver owns a view/table; concurrent readers are always safe).
* Unguarded commits (no ``expect``) are last-writer-wins. They are used
  only where the payload is derived deterministically from an
  overwrite-idempotent data write (per-batch-dir bucket manifests): two
  racing writers write identical bytes, so order cannot matter.

Object-store mapping (the 100 TB deployment)
--------------------------------------------
Plain S3-style rename is copy+delete and NOT atomic; deploying the
ledgers on an object store requires swapping this seam, not the call
sites. Implement :class:`JsonCommitter` with the store's conditional
write and install it via :func:`set_default_committer`:

* ``load``    -> GET, etag from the response.
* guarded commit -> conditional PUT: ``If-Match: <etag>`` for an
  existing file, ``If-None-Match: *`` when ``expect is ABSENT``
  (S3 and GCS both support these as of 2024; on stores without
  conditional PUT, route commits through a log-store / DynamoDB-style
  lock table, the Delta-on-S3 pattern).
* unguarded commit -> plain PUT (whole-object PUT is atomic on every
  major object store).

The parquet DATA files never need this seam: they are written under
batch-/version-named directories that are invisible until the metadata
commit points at them, so eventually-consistent or non-atomic data
writes are already safe.
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import os
import tempfile
from contextlib import contextmanager
from dataclasses import dataclass


class ConcurrentCommitError(RuntimeError):
    """A guarded commit found the file changed since it was loaded:
    another writer committed in between. The caller's in-memory state
    is stale -- reload, re-derive, retry (or surface the single-writer
    contract violation)."""


@dataclass(frozen=True)
class Token:
    """Opaque version tag for compare-and-swap commits. ``etag=None``
    means the file did not exist at load time (commit then requires it
    still not to exist)."""

    etag: str | None


#: Token meaning "the file must not exist yet" (create-if-absent).
ABSENT = Token(etag=None)


def _etag(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


class JsonCommitter:
    """Interface + POSIX default. Subclass and
    :func:`set_default_committer` to deploy on an object store (module
    docstring has the GET/conditional-PUT mapping)."""

    def load(self, path: str) -> tuple[dict | list | None, Token]:
        """Read ``path`` -> ``(obj, token)``; ``(None, ABSENT)`` when
        the file does not exist. The token captures exactly the bytes
        the object was parsed from."""
        try:
            with open(path, "rb") as f:
                data = f.read()
        except FileNotFoundError:
            return None, ABSENT
        return json.loads(data), Token(_etag(data))

    def commit(self, path: str, obj, *, expect: Token | None = None) -> Token:
        """Atomically publish ``obj`` as the new contents of ``path``.

        ``expect=None``   -> unguarded, last-writer-wins.
        ``expect=token``  -> compare-and-swap: raises
        :class:`ConcurrentCommitError` unless the file's current etag
        still equals the token's (``ABSENT`` = must not exist).
        Returns the new file's token.
        """
        data = json.dumps(obj).encode()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if expect is None:
            self._replace(path, data)
            return Token(_etag(data))
        # guarded: serialize check-and-swap through the sidecar lock
        lock_path = path + ".lock"
        with open(lock_path, "a+") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                _, current = self.load(path)
                if current.etag != expect.etag:
                    raise ConcurrentCommitError(
                        f"{path} changed since load (expected etag "
                        f"{expect.etag!r}, found {current.etag!r}): "
                        "another writer committed; reload and retry, or "
                        "enforce the single-writer contract"
                    )
                self._replace(path, data)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
        return Token(_etag(data))

    @staticmethod
    def _replace(path: str, data: bytes) -> None:
        # Unique temp name: an unguarded writer racing a guarded one on
        # the same path must not interleave writes into a shared
        # staging file (a fixed "<path>.tmp" would).
        directory = os.path.dirname(path) or "."
        fd, tmp = tempfile.mkstemp(
            prefix=os.path.basename(path) + ".", suffix=".tmp", dir=directory
        )
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                # fsync BEFORE the rename: os.replace orders the name
                # change, not the data blocks -- without this a power
                # loss can persist the rename while the file is empty
                # or partial, publishing a torn ledger.
                os.fsync(f.fileno())
            os.replace(tmp, path)  # atomic on POSIX
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        # fsync the directory so the rename itself is durable; without
        # it a crash can roll back to the previous ledger (stale but
        # consistent -- acceptable), never to a torn one.
        dfd = os.open(directory, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)


#: The POSIX default; swap with :func:`set_default_committer`.
_default: JsonCommitter = JsonCommitter()


def get_default_committer() -> JsonCommitter:
    return _default


def set_default_committer(committer: JsonCommitter) -> None:
    """Install an alternative committer (e.g. an object-store
    conditional-PUT implementation) engine-wide. All ledger/manifest
    commit points resolve the committer at call time, so this takes
    effect immediately."""
    global _default
    _default = committer


@contextmanager
def maintenance_lock(path: str, *, exclusive: bool):
    """Advisory reader/maintainer barrier for an ON-DISK index layout,
    via ``flock`` on a dedicated ``<path>/_maintenance.lock`` sidecar
    (NOT a ledger's ``.lock`` CAS sidecar, so holding this never
    deadlocks a guarded ``commit_json`` issued while it is held).

    Protocol: **appenders take the SHARED lock** for the whole
    data-write + stats-commit span (concurrent appends still proceed in
    parallel; their stats CAS serializes only the ledger swap, as
    before); **destructive maintenance (compaction / rebuild) takes the
    EXCLUSIVE lock** for its whole read → rewrite → swap → commit span.
    That makes the ADVICE-r9 race impossible: a part file written by an
    in-flight append can no longer land between compaction's dedup read
    and its directory swap (and so can no longer be silently deleted).

    Same scope/limits as the CAS sidecar above: one host / one POSIX
    filesystem. On an object store, swap this for the store's lease or
    lock-table primitive along with :class:`JsonCommitter`.
    """
    os.makedirs(path, exist_ok=True)
    lock_path = os.path.join(path, "_maintenance.lock")
    with open(lock_path, "a+") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX if exclusive else fcntl.LOCK_SH)
        try:
            yield
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def load_json(path: str, committer: JsonCommitter | None = None):
    """``(obj, token)`` -- see :meth:`JsonCommitter.load`."""
    return (committer or _default).load(path)


def commit_json(
    path: str,
    obj,
    *,
    expect: Token | None = None,
    committer: JsonCommitter | None = None,
) -> Token:
    """Atomic publish -- see :meth:`JsonCommitter.commit`."""
    return (committer or _default).commit(path, obj, expect=expect)
