"""Index control-plane stores — the object-store seam for the
generational index (``streaming/genindex.py``), turned into code per
docs/SCALING.md "Known local-vs-cluster deltas" (VERDICT r13 item 7 /
r14 item 3).

``GenIndex``'s DATA plane (parquet reads/writes, the bucketed
generation tables) is already object-store-native through Spark's
Hadoop FS layer. Its CONTROL plane — what dirs exist, which
generation is current, sidecar writes, GC — historically ran on raw
POSIX calls (``os.scandir``, ``os.replace``, ``shutil.rmtree``),
which is correct for any index root all sessions see through a POSIX
mount but not for a native object store (s3://...): no atomic dir
rename, list-after-write visibility, per-object PUTs. This module
names that seam as a small interface and ships BOTH sides of it:

* :class:`PosixIndexStore` — the default; byte-for-byte the calls
  ``genindex.py`` made inline before the seam existed (same scandir
  walks, same ``_SUCCESS`` completeness check, same temp+``os.replace``
  sidecar write, same best-effort rmtree GC). Plugging it in changes
  NO plan and NO value — the r12 discipline (plans proven identical,
  pins re-run) applies to this refactor too.
* :class:`ManifestIndexStore` — the Iceberg/Delta-style commit
  pattern the SCALING.md seam paragraph promised: every mutation
  publishes a new immutable ``manifest-v{N}`` object mapping logical
  entry names (``b3``/``c8``/``d5``) to physical prefixes, installed
  by compare-and-swap on the version number. Listing = one GET of
  the newest manifest (replaces the LIST/scandir walk); the
  generation swap = the manifest pointer flip (replaces the atomic
  dir-rename an object store cannot do); superseded generations stay
  physically present until :meth:`ManifestIndexStore.vacuum`, which
  is what makes SNAPSHOT READS (time travel) of any retained version
  possible — see ``streaming/manifestindex.py``.

Mapping to a real object store (public S3/GCS semantics; this repo
tests the protocol on local disk, where the SAME code runs):

* ``list_entries``        -> one GET of the newest manifest object
  (the Posix store's scandir becomes a LIST only for recovery/vacuum).
* ``write_sidecar``       -> a plain PUT (all-or-nothing by the
  object-store contract; the local temp+``os.replace`` dance below
  emulates exactly that atomicity).
* ``commit``/CAS          -> conditional PUT of ``manifest-v{N+1}``
  (``If-None-Match: *``) with the body attached, or a consistent-KV
  commit log (the DynamoDB pattern Delta uses) where conditional PUT
  is unavailable. Locally: write the full JSON to a hidden temp
  file, then ``os.link`` it to the versioned name — link(2) is
  atomic AND create-exclusive, so the manifest appears fully formed
  or not at all, the same all-or-nothing contract as the PUT.
* ``vacuum``              -> delete objects under prefixes no
  retained manifest references (the Delta VACUUM story, including
  its retention trade-off: vacuuming a version forfeits time travel
  to it).

Engine constraint: manifest mode requires every index mutation to go
through the ``GenIndex`` API (``append`` / ``append_tombstones`` /
``compact``), which calls the commit hooks. A direct write into the
index root (the LSH family's stamped b-dir write in
``streaming/core.py`` — a POSIX-path shortcut) is invisible until
committed, by design: uncommitted data is exactly what crash safety
discards.

Reference parity: the reference (Server/main.go) has no index or
storage-format concepts; this extends the beyond-reference curation
surface (SURVEY.md, GenIndex family) toward its 100 TB deployment
story.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

_MANIFEST_DIR = "_manifests"
_MANIFEST_RE = re.compile(r"manifest-v(\d{12})\.json")
_OBJECTS_DIR = "objects"
# Bounded CAS retry budget: each loss means ANOTHER writer committed
# (progress happened somewhere); 64 consecutive losses on a
# single-digit-writer index is a stuck-claim bug, not contention.
_CAS_MAX_RETRIES = 64


class PosixIndexStore:
    """The POSIX control plane ``genindex.py`` always had, behind the
    seam interface. Every method body is the call its GenIndex call
    site made inline before the refactor — the seam must not move a
    single syscall, or the r12 "plans and values untouched" discipline
    would need re-proving from scratch."""

    #: Compaction physically removes superseded entries right away
    #: (numbering makes them invisible first); there is no manifest
    #: history, so there is nothing to time-travel to.
    retains_history = False

    # -- listing (object-store LIST) --------------------------------

    def root_exists(self, root: str) -> bool:
        return os.path.isdir(root)

    def list_entries(self, root: str) -> list[tuple[str, str]]:
        """(name, path) for every child DIRECTORY of the index root.
        Matches the pre-seam scandir walks: ``visible_dirs`` and
        ``_tombstone_dirs`` always filtered to dirs; the GC loop did
        not, but a regex-named FILE in the root produced the same net
        state anyway (rmtree with ``ignore_errors`` was a no-op on
        it), so dirs-only is behavior-identical where behavior is
        defined."""
        return [
            (e.name, e.path) for e in os.scandir(root) if e.is_dir()
        ]

    def is_complete(self, root: str, name: str, path: str) -> bool:
        """A generation is complete when its ``_SUCCESS`` landed (the
        write's own commit marker — the pre-seam check verbatim)."""
        return os.path.exists(os.path.join(path, "_SUCCESS"))

    def dir_has_data(self, path: str) -> bool:
        """Whether a dir holds any data files (underscore- and
        dot-prefixed entries are Spark metadata, not data)."""
        return any(
            e.is_file() and not e.name.startswith(("_", "."))
            for e in os.scandir(path)
        )

    def data_bytes(self, path: str) -> int:
        """Total bytes of the dir's data files (the tombstone
        broadcast-gate input; one LIST returns sizes on an object
        store)."""
        return sum(
            e.stat().st_size
            for e in os.scandir(path)
            if e.is_file() and not e.name.startswith(("_", "."))
        )

    # -- placement ---------------------------------------------------

    def child(self, root: str, name: str) -> str:
        """Physical path for a logical entry: name == path suffix (the
        numbering convention IS the Posix store's manifest)."""
        return os.path.join(root, name)

    # -- sidecar (object-store PUT) ----------------------------------

    def read_sidecar(self, path: str, filename: str) -> str | None:
        """Sidecar text, or None when missing/unreadable (an
        unreadable sidecar can only be pre-rename debris from a
        crashed fold — absent degrades row-correctly)."""
        sc = os.path.join(path, filename)
        if not os.path.isfile(sc):
            return None
        try:
            with open(sc, encoding="utf-8") as f:
                return f.read()
        except OSError:
            return None

    def write_sidecar(self, path: str, filename: str, text: str) -> None:
        """Atomic sidecar write: temp + ``os.replace`` — a crash
        mid-write must not leave a half-file that poisons every later
        read. (A real object store's PUT is already all-or-nothing;
        this emulates that contract on a POSIX dir.)"""
        tmp = os.path.join(path, f".{filename}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, os.path.join(path, filename))

    # -- commits (object-store manifest swap) ------------------------

    def commit_entry(self, root: str, name: str, path: str) -> None:
        """No-op: a b/d dir is visible the moment it exists — the
        numbering convention plus the high-water mark already provide
        the replay/visibility semantics."""

    def commit_generation(
        self,
        root: str,
        name: str,
        path: str,
        superseded: list[tuple[str, str]],
    ) -> list[tuple[str, str]]:
        """No-op commit (the generation became visible when its
        ``_SUCCESS`` landed); returns the superseded entries unchanged
        — the caller GCs them physically NOW, exactly the pre-seam
        compact tail."""
        return superseded

    def remove_entry(self, root: str, name: str, path: str) -> None:
        """Best-effort, self-healing GC (a failed delete is retried by
        the next fold)."""
        shutil.rmtree(path, ignore_errors=True)


class ManifestIndexStore(PosixIndexStore):
    """Manifest-pointer control plane: the index root's truth is the
    newest ``_manifests/manifest-v{N}.json`` object; entry dirs live
    under unique ``objects/{name}-{token}/`` prefixes so a replayed
    writer can never collide with a committed prefix. Inherits the
    LEAF operations (data-file checks, byte sums, sidecar I/O,
    physical removal) from :class:`PosixIndexStore` — locally those
    run on the same dirs; on a real object store they are the LIST /
    PUT / DELETE calls the module docstring maps them to.

    Two properties the Posix store cannot offer fall out:

    * **Commit without rename**: a fold writes its generation under a
      fresh prefix, then CAS-installs one manifest that adds the
      generation AND drops everything it superseded — readers see the
      old view or the new one, never a mix, with no atomic-dir-rename
      requirement.
    * **Snapshot reads**: superseded prefixes stay put (GC is
      deferred to :meth:`vacuum`), so any retained manifest version
      is a complete, readable view — ``streaming/manifestindex.py``
      drives the time-travel twin through :meth:`entries_at`.
    """

    retains_history = True

    # -- manifest plumbing -------------------------------------------

    def _mdir(self, root: str) -> str:
        return os.path.join(root, _MANIFEST_DIR)

    def _mpath(self, root: str, version: int) -> str:
        return os.path.join(self._mdir(root), f"manifest-v{version:012d}.json")

    def _versions(self, root: str) -> list[int]:
        mdir = self._mdir(root)
        if not os.path.isdir(mdir):
            return []
        return sorted(
            int(m.group(1))
            for e in os.scandir(mdir)
            if e.is_file() and (m := _MANIFEST_RE.fullmatch(e.name))
        )

    def _read_manifest(self, root: str, version: int) -> dict | None:
        """Parsed manifest v, or None when missing/unparseable. This
        writer's commits land atomically (link-with-content), so an
        unparseable manifest can only be external debris (tampering,
        partial copy); defensively its version number is burned
        (commits target max-name+1) and readers fall back to the
        newest parseable version, which is by construction the
        newest COMMITTED one."""
        try:
            with open(self._mpath(root, version), encoding="utf-8") as f:
                data = json.load(f)
        except (OSError, ValueError):
            return None
        if not isinstance(data, dict) or "entries" not in data:
            return None
        return data

    def current_version(self, root: str) -> int:
        """Newest COMMITTED (parseable) manifest version; 0 = empty
        index (versions start at 1)."""
        for v in reversed(self._versions(root)):
            if self._read_manifest(root, v) is not None:
                return v
        return 0

    def entries_at(self, root: str, version: int) -> list[tuple[str, str]]:
        """The (name, path) view AT a retained manifest version — the
        snapshot-read seam. Raises on a vacuumed/unknown version: a
        time-travel read past retention must fail loudly, not return
        a silently partial view."""
        data = self._read_manifest(root, version)
        if data is None:
            raise ValueError(
                f"manifest v{version} is not retained at {root!r} "
                "(vacuumed, never committed, or a dead claim)"
            )
        return [
            (name, os.path.join(root, rel))
            for name, rel in sorted(data["entries"].items())
        ]

    def _commit(self, root: str, mutate) -> int:
        """Install ``mutate(entries)`` as the next manifest version by
        compare-and-swap; returns the committed version. Loop: read
        the newest version, build the FULL next manifest in a hidden
        temp object, then ``os.link`` it to the versioned name —
        link(2) is atomic and create-exclusive, so the manifest
        appears fully formed or not at all (on a real object store,
        the whole dance is one conditional PUT with the body
        attached). A lost link means another writer committed first:
        reload and re-apply ``mutate`` to ITS entries, so no
        committed mutation is ever silently dropped. Content rides
        IN the CAS — an earlier claim-then-write-content design had a
        window where a concurrent writer could lawfully treat the
        empty claim as dead and commit past it, shadowing the
        claimer's update (caught by
        tests/test_manifestindex.py::test_lost_cas_claim_reapplies_on_winner).
        """
        os.makedirs(self._mdir(root), exist_ok=True)
        for _ in range(_CAS_MAX_RETRIES):
            versions = self._versions(root)
            head = versions[-1] if versions else 0
            cur = self._read_manifest(root, head) if head else None
            if head and cur is None:
                # Newest name is unparseable (external debris — this
                # writer can no longer produce one): rebuild the view
                # from the newest parseable version, but still target
                # head+1 (the dead name's number stays burned).
                committed = self.current_version(root)
                cur = (
                    self._read_manifest(root, committed)
                    if committed
                    else None
                )
            entries = dict(cur["entries"]) if cur else {}
            target = head + 1
            body = json.dumps(
                {"version": target, "entries": mutate(entries)},
                sort_keys=True,
            )
            final = self._mpath(root, target)
            tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(body)
            try:
                os.link(tmp, final)
            except FileExistsError:
                os.remove(tmp)
                continue  # lost the race — reload and re-apply
            os.remove(tmp)
            return target
        raise RuntimeError(
            f"manifest CAS at {root!r}: lost {_CAS_MAX_RETRIES} "
            "consecutive claims — stuck head or writer storm"
        )

    # -- seam overrides ----------------------------------------------

    def root_exists(self, root: str) -> bool:
        return self.current_version(root) > 0

    def list_entries(self, root: str) -> list[tuple[str, str]]:
        v = self.current_version(root)
        return self.entries_at(root, v) if v else []

    def is_complete(self, root: str, name: str, path: str) -> bool:
        """Manifest membership IS completeness: an entry is committed
        into the manifest only after its data is fully written, and a
        crashed writer's uncommitted prefix never appears."""
        return True

    def child(self, root: str, name: str) -> str:
        """A FRESH physical prefix per placement: a replayed batch
        writes a new prefix and its commit re-points the logical name,
        so an overwrite never races a committed object (object stores
        have no atomic overwrite-of-many-objects). The orphaned old
        prefix stays referenced by older manifests until vacuum."""
        return os.path.join(
            root, _OBJECTS_DIR, f"{name}-{uuid.uuid4().hex[:8]}"
        )

    def commit_entry(self, root: str, name: str, path: str) -> None:
        rel = os.path.relpath(path, root)
        self._commit(root, lambda e: {**e, name: rel})

    def commit_generation(
        self,
        root: str,
        name: str,
        path: str,
        superseded: list[tuple[str, str]],
    ) -> list[tuple[str, str]]:
        """THE swap: one CAS installs the generation and drops every
        superseded entry — the manifest-pointer flip that replaces the
        atomic dir rename object stores lack. Returns [] — nothing is
        physically removed now; superseded prefixes stay readable
        through retained manifests until :meth:`vacuum`."""
        rel = os.path.relpath(path, root)
        dead = {n for n, _ in superseded}

        def mutate(entries: dict) -> dict:
            return {
                **{k: v for k, v in entries.items() if k not in dead},
                name: rel,
            }

        self._commit(root, mutate)
        return []

    # -- retention ---------------------------------------------------

    def vacuum(self, root: str, keep_from_version: int) -> list[str]:
        """Drop manifests with version < ``keep_from_version`` and
        delete every ``objects/`` prefix no RETAINED manifest
        references (committed-but-superseded generations past
        retention, plus orphans from crashed/replayed writers that
        never committed). Returns the deleted prefix paths. Time
        travel to a vacuumed version then fails loudly in
        :meth:`entries_at` — the documented retention trade-off."""
        mdir = self._mdir(root)
        if os.path.isdir(mdir):
            # Stray commit temps (a writer that crashed between the
            # temp write and the link) are invisible to listings but
            # still bytes; vacuum is their janitor.
            for e in os.scandir(mdir):
                if e.is_file() and ".tmp-" in e.name:
                    os.remove(e.path)
        referenced: set[str] = set()
        for v in self._versions(root):
            data = self._read_manifest(root, v)
            if v < keep_from_version:
                # Below the retention cut, parseable and dead-name
                # manifests alike are dropped (a dead name references
                # nothing, so removing it frees only its number).
                os.remove(self._mpath(root, v))
                continue
            if data is None:
                continue
            referenced |= {
                os.path.normpath(os.path.join(root, rel))
                for rel in data["entries"].values()
            }
        deleted = []
        odir = os.path.join(root, _OBJECTS_DIR)
        if os.path.isdir(odir):
            for e in os.scandir(odir):
                if e.is_dir() and os.path.normpath(e.path) not in referenced:
                    shutil.rmtree(e.path, ignore_errors=True)
                    deleted.append(e.path)
        return sorted(deleted)
