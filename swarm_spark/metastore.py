"""Pluggable snapshot-metadata stores for icepack tables.

The commit protocol in `tablestore.IcepackTable._commit` is a loop of
three primitives — CLAIM a snapshot id exclusively, ADVANCE the
CURRENT pointer, VERIFY ownership — plus reads (current id, snapshot
payloads) and single-actor maintenance writes (rollback, expire).
This module puts those primitives behind an interface with two
implementations:

* `PosixMetaStore` — today's default: files under `<table>/_meta`,
  exclusive claim via `os.link` (EEXIST), pointer advance via
  `os.replace`, and dead-writer adoption fenced by an advisory
  `flock` held on the claim inode for the whole
  claim→advance→verify window. Correct on a local/POSIX filesystem.

* `CASMetaStore` — an in-memory object store with CONDITIONAL-PUT
  semantics only: every object is (payload, etag); the write
  primitives are create-if-absent and replace-if-etag-matches, and
  the pointer advance is a compare-and-swap on CURRENT's value. No
  locks, no inodes, no atomic rename — exactly the primitive set S3
  (conditional PUT via If-None-Match/If-Match, 2024+) and GCS
  (x-goog-if-generation-match) expose, so a commit protocol that is
  correct against this store maps 1:1 onto a real object-store
  deployment (SCALE.md §commit-protocol documents the mapping).
  Reference analogue for the atomicity contract: the all-or-nothing
  batch finalize in /root/reference/pkg/infra/bq/client.go:240-263.

Liveness nuance: POSIX adoption can PROVE a claim's owner is dead
(its flock evaporates with the process). An object store cannot —
adoption there is time-based (claim age beyond a grace period), the
same assumption every object-store table format makes (Iceberg
catalog locks, Delta on S3 with a coordination table). The
post-advance VERIFY step makes even a mistaken adoption safe: the
displaced writer sees a foreign token and rebases, so its rows land
in a later snapshot instead of silently vanishing.

`try_commit` outcomes:
  "committed" — CURRENT now points at `sid` and the payload is ours.
  "contended" — another writer holds the claim for `sid`; caller
                backs off and retries (same CURRENT).
  "lost"      — CURRENT moved, or our claim changed hands; caller
                re-reads CURRENT and rebases.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid

__all__ = ["PosixMetaStore", "CASMetaStore"]


class PosixMetaStore:
    """File-per-snapshot metadata under a `_meta` directory (default)."""

    def __init__(self, meta_dir: str):
        self.meta = meta_dir
        os.makedirs(meta_dir, exist_ok=True)

    # -- paths -------------------------------------------------------
    def _snap_path(self, sid: int) -> str:
        return os.path.join(self.meta, f"snap-{sid:012d}.json")

    # -- reads -------------------------------------------------------
    def current_id(self) -> int | None:
        try:
            with open(os.path.join(self.meta, "CURRENT")) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def read_snap(self, sid: int) -> dict | None:
        try:
            with open(self._snap_path(sid)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def list_sids(self) -> list[int]:
        out = []
        for fn in os.listdir(self.meta):
            if fn.startswith("snap-") and fn.endswith(".json"):
                out.append(int(fn[5:-5]))
        return sorted(out)

    def claim_age(self, sid: int) -> float | None:
        try:
            return time.time() - os.path.getmtime(self._snap_path(sid))
        except OSError:
            return None

    # -- maintenance writes (single-actor: rollback / expire) --------
    def set_current(self, sid: int | None) -> None:
        cur_file = os.path.join(self.meta, "CURRENT")
        if sid is None:
            try:
                os.remove(cur_file)
            except FileNotFoundError:
                pass
            return
        tmp = cur_file + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(sid))
        os.replace(tmp, cur_file)

    def delete_snap(self, sid: int) -> bool:
        try:
            os.remove(self._snap_path(sid))
            return True
        except FileNotFoundError:
            return False

    # -- tags (named snapshot pins) ----------------------------------
    def _tag_path(self, name: str) -> str:
        return os.path.join(self.meta, f"tag-{name}.json")

    def set_tag(self, name: str, sid: int) -> None:
        tmp = self._tag_path(name) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(sid))
        os.replace(tmp, self._tag_path(name))

    def get_tag(self, name: str) -> int | None:
        try:
            with open(self._tag_path(name)) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def delete_tag(self, name: str) -> bool:
        try:
            os.remove(self._tag_path(name))
            return True
        except FileNotFoundError:
            return False

    def list_tags(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for fn in os.listdir(self.meta):
            if fn.startswith("tag-") and fn.endswith(".json"):
                with open(os.path.join(self.meta, fn)) as fh:
                    out[fn[4:-5]] = int(fh.read().strip())
        return out

    # -- test/tooling helper ----------------------------------------
    def plant_claim(self, sid: int, payload: dict, age_sec: float = 0.0) -> None:
        """Simulate a writer that claimed `sid` and died before
        advancing CURRENT (test harness for adoption); `age_sec`
        backdates the claim past the adoption grace window."""
        path = self._snap_path(sid)
        with open(path, "w") as fh:
            json.dump(payload, fh)
        if age_sec:
            past = time.time() - age_sec
            os.utime(path, (past, past))

    # -- the commit primitive ---------------------------------------
    def try_commit(self, sid: int, payload: dict,
                   expected_cur: int | None, adopt: bool) -> str:
        """Claim `sid` exclusively, advance CURRENT, verify ownership.

        The snapshot FILE is claimed with os.link (EEXIST if a
        concurrent writer already claimed the same sid), so two
        writers that both read the same CURRENT can never silently
        clobber each other's snap-<sid>.json. CURRENT then advances
        via os.replace (atomic on POSIX). An exclusive flock is held
        on OUR inode for the whole claim→advance→verify window;
        contenders test this lock before adopting, so a
        stalled-but-LIVE owner can never be mistaken for a dead one.
        """
        import fcntl

        spath = self._snap_path(sid)
        tmp = spath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        my_fd = os.open(tmp, os.O_RDONLY)
        fcntl.flock(my_fd, fcntl.LOCK_EX)  # uncontended: private inode
        try:
            try:
                os.link(tmp, spath)  # exclusive claim
                os.remove(tmp)
            except FileExistsError:
                if not (adopt and self._adopt_orphan(sid, tmp, expected_cur)):
                    os.remove(tmp)
                    return "contended"
                # adopted: `tmp`'s inode (still flocked by us) now
                # owns the claim name
            tmp2 = os.path.join(self.meta, f"CURRENT.tmp-{uuid.uuid4().hex}")
            with open(tmp2, "w") as fh:
                fh.write(str(sid))
            os.replace(tmp2, os.path.join(self.meta, "CURRENT"))
            # Post-advance verification (defense in depth): if the
            # claim name no longer carries OUR token, the commit is
            # someone else's — the caller rebases and re-adds its dirs.
            try:
                with open(spath) as fh:
                    committed = json.load(fh)
            except (OSError, ValueError):
                committed = {}
            if committed.get("_writer") == payload.get("_writer"):
                return "committed"
            return "lost"
        finally:
            os.close(my_fd)  # releases the flock

    def _adopt_orphan(self, sid: int, tmp: str, cur: int | None) -> bool:
        """Take over a claimed-but-unadvanced snap file whose owner
        died mid-commit. Safe because of three checks done while
        HOLDING the claim inode's flock:

          1. the non-blocking flock itself succeeded — a LIVE owner
             holds its lock from before the claim is published until
             after it verifies its advance, so acquirable ⇒ owner dead
             or finished;
          2. finished owners have advanced CURRENT ⇒ the
             current_id() == cur re-check fails ⇒ no adoption;
          3. the claim NAME still refers to the inode we locked
             (fstat/stat ino match) — a previous adopter's replacement
             cannot be clobbered, and nobody else can replace it while
             we hold its lock (adoption requires this same lock).

        On True, `tmp` (the caller's flocked inode) has been renamed
        over the claim path and the caller proceeds as owner."""
        import fcntl

        path = self._snap_path(sid)
        try:
            fd = os.open(path, os.O_RDONLY)
        except OSError:
            return False  # vanished underneath us — retry loop handles it
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                return False  # live owner mid-commit — back off
            if self.current_id() != cur:
                return False  # its owner finished; we must rebase
            try:
                if os.fstat(fd).st_ino != os.stat(path).st_ino:
                    return False  # name changed hands since we opened it
            except OSError:
                return False
            os.replace(tmp, path)
            return True
        finally:
            os.close(fd)


class CASMetaStore:
    """In-memory object store exposing ONLY conditional-put primitives
    (create-if-absent, replace-if-etag-matches, value-CAS on CURRENT).
    One store instance per table metadata path, shared across table
    handles via `for_dir` — the in-process stand-in for a bucket."""

    _registry: dict[str, "CASMetaStore"] = {}
    _registry_lock = threading.Lock()

    @classmethod
    def for_dir(cls, meta_dir: str) -> "CASMetaStore":
        key = os.path.abspath(meta_dir)
        with cls._registry_lock:
            st = cls._registry.get(key)
            if st is None:
                st = cls._registry[key] = cls()
            return st

    def __init__(self):
        # key -> [payload_json: str, etag: int, created_at: float]
        self._objects: dict[str, list] = {}
        self._lock = threading.Lock()

    # -- raw conditional-put primitives (the S3/GCS surface) ---------
    def _get(self, key: str) -> tuple[str, int] | None:
        with self._lock:
            obj = self._objects.get(key)
            return (obj[0], obj[1]) if obj is not None else None

    def _put_if_absent(self, key: str, blob: str) -> bool:
        with self._lock:
            if key in self._objects:
                return False
            self._objects[key] = [blob, 1, time.time()]
            return True

    def _replace_if_match(self, key: str, blob: str, etag: int) -> bool:
        with self._lock:
            obj = self._objects.get(key)
            if obj is None or obj[1] != etag:
                return False
            obj[0] = blob
            obj[1] += 1
            return True

    def _delete(self, key: str) -> bool:
        with self._lock:
            return self._objects.pop(key, None) is not None

    # -- reads -------------------------------------------------------
    def current_id(self) -> int | None:
        got = self._get("CURRENT")
        return int(got[0]) if got is not None else None

    def read_snap(self, sid: int) -> dict | None:
        got = self._get(f"snap-{sid}")
        return json.loads(got[0]) if got is not None else None

    def list_sids(self) -> list[int]:
        with self._lock:
            return sorted(
                int(k[5:]) for k in self._objects if k.startswith("snap-")
            )

    def claim_age(self, sid: int) -> float | None:
        with self._lock:
            obj = self._objects.get(f"snap-{sid}")
            return time.time() - obj[2] if obj is not None else None

    # -- maintenance writes ------------------------------------------
    def set_current(self, sid: int | None) -> None:
        with self._lock:
            if sid is None:
                self._objects.pop("CURRENT", None)
            else:
                obj = self._objects.get("CURRENT")
                if obj is None:
                    self._objects["CURRENT"] = [str(sid), 1, time.time()]
                else:
                    obj[0] = str(sid)
                    obj[1] += 1

    def delete_snap(self, sid: int) -> bool:
        return self._delete(f"snap-{sid}")

    # -- tags (named snapshot pins) ----------------------------------
    def set_tag(self, name: str, sid: int) -> None:
        with self._lock:
            obj = self._objects.get(f"tag-{name}")
            if obj is None:
                self._objects[f"tag-{name}"] = [str(sid), 1, time.time()]
            else:
                obj[0] = str(sid)
                obj[1] += 1

    def get_tag(self, name: str) -> int | None:
        got = self._get(f"tag-{name}")
        return int(got[0]) if got is not None else None

    def delete_tag(self, name: str) -> bool:
        return self._delete(f"tag-{name}")

    def list_tags(self) -> dict[str, int]:
        with self._lock:
            return {k[4:]: int(v[0]) for k, v in self._objects.items()
                    if k.startswith("tag-")}

    # -- test/tooling helper ----------------------------------------
    def plant_claim(self, sid: int, payload: dict, age_sec: float = 0.0) -> None:
        self._put_if_absent(f"snap-{sid}", json.dumps(payload))
        if age_sec:
            with self._lock:
                obj = self._objects.get(f"snap-{sid}")
                if obj is not None:
                    obj[2] = time.time() - age_sec

    # -- the commit primitive ---------------------------------------
    def _cas_current(self, expected: int | None, new: int) -> bool:
        """Value compare-and-swap on CURRENT (missing key ≙ None) —
        If-Match/If-None-Match on the pointer object."""
        with self._lock:
            obj = self._objects.get("CURRENT")
            have = int(obj[0]) if obj is not None else None
            if have != expected:
                return False
            if obj is None:
                self._objects["CURRENT"] = [str(new), 1, time.time()]
            else:
                obj[0] = str(new)
                obj[1] += 1
            return True

    def try_commit(self, sid: int, payload: dict,
                   expected_cur: int | None, adopt: bool) -> str:
        """Claim via create-if-absent, advance via value-CAS, verify by
        re-reading the claim. Adoption (dead-writer takeover) is
        TIME-GATED only — the caller passes adopt=True after the grace
        period — and fenced by the etag replace: two adopters cannot
        both take the same claim, and a finished owner is detected by
        the CURRENT re-check. A LIVE-but-stalled owner displaced here
        detects the foreign token at its own verify step and rebases
        (nothing lost) — the standard object-store tradeoff."""
        key = f"snap-{sid}"
        token = payload.get("_writer")
        blob = json.dumps(payload)
        if not self._put_if_absent(key, blob):
            if not adopt:
                return "contended"
            got = self._get(key)
            if got is None:
                return "lost"  # vanished underneath us — re-read CURRENT
            _, etag = got
            if self.current_id() != expected_cur:
                return "lost"  # claim owner finished; rebase
            if not self._replace_if_match(key, blob, etag):
                return "contended"  # changed hands since we looked
        if not self._cas_current(expected_cur, sid):
            # Adoption race closeout: the displaced owner's advance may
            # have landed with OUR payload already in the claim (its
            # CAS won, but the claim carried our replacement). If the
            # committed payload at sid is ours, our commit IS live —
            # returning "lost" here would rebase and double-add dirs.
            if self.current_id() == sid:
                got = self._get(key)
                committed = json.loads(got[0]) if got is not None else {}
                if committed.get("_writer") == token:
                    return "committed"
            return "lost"  # someone advanced first with a foreign payload
        got = self._get(key)
        committed = json.loads(got[0]) if got is not None else {}
        return "committed" if committed.get("_writer") == token else "lost"
