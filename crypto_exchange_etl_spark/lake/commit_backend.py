"""CommitBackend — the lake's commit-atomicity primitive, made pluggable.

Every LakeTable commit reduces to ONE linearization point: publish the
bytes of ``metadata/v{N}.json`` *iff no object with that name exists yet*
(optimistic-concurrency CAS).  Reads, data-file writes and listings are
plain filesystem I/O that Spark already virtualizes across local disk /
HDFS / object stores (s3a, gcs); the piece Spark does NOT give you is an
atomic fail-if-exists publish — which is exactly what this interface
abstracts, mirroring how Iceberg splits ``FileIO`` (byte transport) from
``TableOperations.commit`` (the atomic metadata swap).

Two implementations ship:

- :class:`LocalFSBackend` — POSIX hardlink CAS (``os.link`` is atomic and
  fails with EEXIST iff the name is taken) + ``os.replace`` for atomic
  overwrites.  This is the historical behavior and the default.
- :class:`ConditionalPutBackend` — emulates an object store's
  *conditional PUT* (``If-None-Match: *`` on S3/GCS/R2/Azure): a single
  create-exclusive whole-object write, no hardlinks, no rename-onto
  anywhere in the commit path, because object stores have neither.  The
  emulation runs over a plain directory so the whole test suite can
  exercise it; injectable latency and race hooks let tests hold a writer
  inside the window between the conditional check and the body upload.

At 100 TB the lake lives on object storage: a real ``S3Backend`` would
implement :meth:`put_if_absent` with ``PutObject`` +
``If-None-Match: *`` (natively supported by S3 since 2024, GCS
``x-goog-if-generation-match: 0``, Azure ``If-None-Match: *``) — the
contract here is deliberately exactly that call's semantics: the object
becomes visible whole-or-not-at-all, and exactly one concurrent writer
of a given name wins.  Reference analogue: the atomicity the reference
delegates to BigQuery's managed WRITE_TRUNCATE partition replace
(/root/reference/fintick/bqloader/base.py:79-112), re-created here as a
primitive the engine owns.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Any, Callable

__all__ = [
    "CommitBackend",
    "LocalFSBackend",
    "ConditionalPutBackend",
    "resolve_backend",
    "BACKEND_ENV",
]

#: environment override for the default backend name — lets the full test
#: suite run unmodified over either implementation
#: (``SPARK_CDC_COMMIT_BACKEND=conditional_put python -m pytest``).
BACKEND_ENV = "SPARK_CDC_COMMIT_BACKEND"


class CommitBackend:
    """Atomic metadata-publish primitive for one lake table.

    Contract (all paths are absolute, content is always a complete
    serialized document — never appended to):

    - :meth:`put_if_absent` publishes ``payload`` at ``path`` iff nothing
      exists there, atomically with respect to every other writer using
      the same backend class against the same store.  Returns ``True`` on
      win, ``False`` if the name was already taken (the CAS loss).
      Readers must never observe a partially-visible object.
    - :meth:`put` atomically overwrites (last writer wins) — used only
      where single-writer discipline is documented (branch advance,
      cursor files, content-equivalent manifest rewrites).
    - :meth:`delete` removes an object (idempotent when
      ``missing_ok``).
    """

    name = "abstract"

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        raise NotImplementedError

    def put(self, path: str, payload: bytes) -> None:
        raise NotImplementedError

    def delete(self, path: str, missing_ok: bool = True) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            if not missing_ok:
                raise

    def describe(self) -> dict[str, Any]:
        return {"backend": self.name}


class LocalFSBackend(CommitBackend):
    """POSIX primitives: write-aside + ``os.link`` hardlink CAS.

    ``os.link(tmp, final)`` is the linearization point — the kernel
    guarantees exactly one linker of ``final`` succeeds, and because the
    bytes were fully written to ``tmp`` first, ``final`` is never
    partially visible.  ``put`` is write-aside + ``os.replace`` (atomic
    rename-onto on POSIX)."""

    name = "localfs"

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        d = os.path.dirname(path)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4()}.json")
        with open(tmp, "wb") as fh:
            fh.write(payload)
        try:
            os.link(tmp, path)  # atomic; fails iff path already exists
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def put(self, path: str, payload: bytes) -> None:
        d = os.path.dirname(path)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4()}.json")
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, path)


class ConditionalPutBackend(CommitBackend):
    """Emulated object-store conditional PUT over a plain directory.

    The commit path uses NO hardlinks and NO rename-onto-target — only
    the operations an object store offers:

    - ``put_if_absent`` = one create-exclusive whole-object write
      (``O_CREAT|O_EXCL`` claim, then the body, then fsync) — the local
      stand-in for ``PutObject`` + ``If-None-Match: *``.  The O_EXCL
      claim is the linearization point; a real store additionally makes
      the *body* visible atomically server-side, which the local
      emulation approximates with a single ``os.write`` of the complete
      payload (the claim→body window is an emulation artifact, not part
      of the contract — see ``after_claim`` below, which tests use to
      hold a writer inside it and prove the CAS still serializes).
    - ``put`` = unconditional PUT: same single-shot write to a staging
      key then one ``os.replace`` (object stores give atomic overwrite
      natively; locally the replace supplies the reader-atomicity the
      store would).

    ``latency`` (seconds, applied before every operation) and the
    ``before_claim`` / ``after_claim`` hooks inject the slow-network /
    interleaved-writer schedules that object storage actually exhibits,
    so ``tests/test_commit_conflict.py`` can race two writers through a
    deterministically-widened conflict window."""

    name = "conditional_put"

    def __init__(
        self,
        latency: float = 0.0,
        before_claim: Callable[[str], None] | None = None,
        after_claim: Callable[[str], None] | None = None,
    ):
        self.latency = latency
        self.before_claim = before_claim
        self.after_claim = after_claim

    def _lag(self) -> None:
        if self.latency:
            time.sleep(self.latency)

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        self._lag()
        if self.before_claim is not None:
            self.before_claim(path)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            return False  # 412 Precondition Failed
        try:
            if self.after_claim is not None:
                self.after_claim(path)
            os.write(fd, payload)
            os.fsync(fd)
        finally:
            os.close(fd)
        return True

    def put(self, path: str, payload: bytes) -> None:
        self._lag()
        d = os.path.dirname(path)
        staging = os.path.join(d, f".put-{uuid.uuid4()}")
        with open(staging, "wb") as fh:
            fh.write(payload)
        os.replace(staging, path)

    def delete(self, path: str, missing_ok: bool = True) -> None:
        self._lag()
        super().delete(path, missing_ok=missing_ok)


_REGISTRY: dict[str, type[CommitBackend]] = {
    LocalFSBackend.name: LocalFSBackend,
    ConditionalPutBackend.name: ConditionalPutBackend,
}


def resolve_backend(
    spec: "str | CommitBackend | None", default: str = LocalFSBackend.name
) -> CommitBackend:
    """Resolve a backend from an instance, a registry name, the
    ``SPARK_CDC_COMMIT_BACKEND`` env override, or the default — in that
    precedence order.  Instances pass through untouched so tests can
    inject hooked/latencied backends."""
    if isinstance(spec, CommitBackend):
        return spec
    name = spec or os.environ.get(BACKEND_ENV) or default
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(
            f"unknown commit backend {name!r} (have {sorted(_REGISTRY)})"
        ) from None
