"""The commit-protocol seam: every primitive the artifact tier's
durability story stands on, behind one interface.

The generations/matview/index tier needs exactly four storage
primitives (and nothing else):

1. `writer_lock(path)` — mutual exclusion among WRITERS of one store
   (appends, compactions, deletes, matview refreshes serialize; readers
   never enter).
2. `publish_swap(live, staging)` — atomically replace a store
   directory with its staged rewrite, such that a crash at any point
   leaves a complete copy recoverable.
3. `recover(path)` — heal the crash window `publish_swap` leaves, if
   any (idempotent; called by readers and on writer entry).
4. `link_or_copy(src, dst)` — cheap relocation of an immutable file
   (generation snapshots, carried support tables); correctness needs
   only "dst has src's bytes", cheapness wants metadata-only.
5. `save_json_atomic(path, obj)` — all-or-nothing manifest/sidecar
   replacement (readers see the old or the new JSON, never a torn one).

`PosixStoreIO` is the single-host / shared-POSIX-filesystem backend —
flock, hardlink, `os.replace` — which is also exactly the reference's
deployment shape (its ./index appends weren't even locked, SURVEY.md
§2.12). On real 100 TB object storage (S3/GCS) neither flock nor
hardlink nor atomic directory rename exists; SCALING.md ("commit
protocol at object-storage scale", round 10) records what an
`ObjectStoreIO` backend substitutes for each primitive — optimistic
manifest compare-and-swap for 1/2/3 (Iceberg's commit protocol:
immutable files + a pointer CAS make the lock and the directory swap
unnecessary), server-side copy (or manifest-level reference, since
generation files are immutable-from-birth) for 4, and
put-if-absent/versioned-put for 5. The interface is deliberately this
small so that backend is a drop-in; no second backend ships here —
the seam is the deliverable, and the POSIX fault-injection tests
(tests/test_commitio.py) pin the contract any backend must satisfy.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil


class PosixStoreIO:
    """flock + hardlink + rename: the single-host backend."""

    @contextlib.contextmanager
    def writer_lock(self, path: str):
        """Blocking exclusive flock on a sibling `<path>.lock` file
        (sibling, not inside — publish_swap replaces the directory
        itself). Each entry opens its own fd, so the lock also
        serializes threads within one process."""
        import fcntl

        fd = os.open(path.rstrip("/") + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def publish_swap(self, live: str, staging: str) -> None:
        """Rename the live directory ASIDE, move staging into place,
        delete the old copy. POSIX rename gives no two-directory
        atomic swap, so there is a two-rename instant with the live
        path absent; `recover` heals a crash inside it, and readers
        re-resolve once. Caller holds the writer lock."""
        old = live + ".old"
        shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
        if os.path.isdir(live):
            os.replace(live, old)
        os.replace(staging, live)
        shutil.rmtree(old, ignore_errors=True)

    def recover(self, path: str) -> None:
        """If the live path is missing but the renamed-aside copy
        exists, restore it (idempotent). Caller holds the writer
        lock."""
        old = path + ".old"
        if not os.path.exists(path) and os.path.isdir(old):
            os.replace(old, path)

    def link_or_copy(self, src: str, dst: str) -> None:
        """Hardlink (metadata-only, shares the inode of an immutable
        file); fall back to a full copy across filesystems."""
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)

    def save_json_atomic(self, path: str, obj) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
        os.replace(tmp, path)


# The process-wide backend. Swapping in an object-store implementation
# is a one-line assignment (or monkeypatch in tests); every artifact
# code path routes through this name.
IO = PosixStoreIO()
