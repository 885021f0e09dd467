"""Filesystem abstraction for the FITS datasource (scan / stream / write).

The reference reads through the Hadoop FileSystem API, so ``hdfs://`` and
``s3://`` paths work transparently (``FitsSourceRelation.scala:133-177``,
and the S3 ``seek``-past-EOF regression it pins, ``FitsLib.scala:319-323``,
``:458-462``). This module is the PySpark-native equivalent: a small
scheme-dispatched filesystem interface with

- a **local fast path** (plain paths / ``file://``) using ``os`` + builtin
  ``open`` — byte-identical behavior to the pre-VFS datasource;
- an **fsspec backend** when fsspec is importable (``s3://``, ``gs://``,
  ``hdfs://``, ... — whatever protocols the deployment installs);
- a **pyarrow.fs backend** as fallback for ``s3://``/``hdfs://``/``gs://``
  when fsspec is absent (pyarrow is a hard dependency already);
- an in-process ``memory://`` filesystem for tests, so the whole remote
  code path (URI parsing, FS-object reads, ranged seeks, listing, glob,
  write + commit) is exercised hermetically without network access.

Executor-process semantics
--------------------------
Filesystem handles are resolved ONCE, at plan time, and pickled into
every ``InputPartition`` (``scoped_for(path)``). Remote backends
(fsspec / pyarrow) are picklable by design and reconnect lazily in the
executor.

Two test backends (no network in CI):

- ``mock://`` — object-store-shaped URIs backed by a shared temp
  directory (root from ``$SPARK_FITS_MOCKFS_ROOT``). Every process can
  see it, so it exercises the WHOLE non-local path end to end through
  Spark: URI parsing, FS-object ranged reads, walk/glob/listdir via the
  FS API, streaming mtimes, writer output — the HCFS-on-RawLocal
  testing pattern.
- ``memory://`` — a pure in-process dict. **Same-process only**: with
  PySpark's python-worker architecture even DataSource planning runs
  out-of-process, so memory:// cannot round-trip through a real Spark
  job; it unit-tests the FS interface (snapshot pickling, the writer's
  payload-commit path) hermetically. ``scoped_for`` snapshots carry the
  file's bytes by value; writer tasks ship part-file payloads back in
  their ``WriterCommitMessage`` for the commit phase to land — the
  task-attempt → commit shape of a real object-store committer.

Random access on object stores: ``open_input`` always returns a seekable
reader (fsspec caches ranges; pyarrow ``open_input_file`` is positional),
so the scan's row-aligned ``seek`` + bounded ``read`` pattern issues one
ranged GET per batch — there is no S3 ``seek(EOF)`` hazard to work around
because we never seek past ``data_stop``.
"""

from __future__ import annotations

import fnmatch
import glob as globmod
import io
import os
import posixpath
import re
import time
from typing import BinaryIO, Iterator

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")


def split_scheme(path: str) -> tuple[str, str]:
    """``("s3", "bucket/key")`` for ``s3://bucket/key``; ``("", path)``
    for plain local paths (a Windows drive letter is not a scheme)."""
    m = _SCHEME_RE.match(path)
    if not m:
        return "", path
    return m.group(1).lower(), path[m.end():]


class FitsFileSystem:
    """Minimal FS interface the datasource needs. All paths are the full
    URI as the user wrote them (scheme included); the backend strips or
    keeps the scheme as its library requires."""

    #: writer tasks must ship bytes back via commit messages (memory://)
    needs_commit_payload = False

    def open_input(self, path: str) -> BinaryIO:  # seekable, binary
        raise NotImplementedError

    def open_output(self, path: str) -> BinaryIO:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    def stat(self, path: str) -> tuple[int, float]:
        """(size, mtime) in ONE backend round trip where the backend
        allows — the plan cache keys on both, and separate size()+
        mtime() calls double object-store HEAD requests."""
        return self.size(path), self.mtime(path)

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def isfile(self, path: str) -> bool:
        raise NotImplementedError

    def walk_files(self, directory: str) -> list[str]:
        """All files (recursive) under ``directory``, full URIs."""
        raise NotImplementedError

    def glob(self, pattern: str) -> list[str]:
        """Files matching a glob pattern (no directories)."""
        raise NotImplementedError

    def listdir(self, directory: str) -> list[str]:
        """Immediate child *names* (not full paths)."""
        raise NotImplementedError

    def makedirs(self, directory: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def join(self, directory: str, name: str) -> str:
        return directory.rstrip("/") + "/" + name

    def scoped_for(self, path: str) -> "FitsFileSystem":
        """A picklable handle sufficient to read ``path`` inside an
        executor task. Shared-state backends return ``self``."""
        return self


class LocalFileSystem(FitsFileSystem):
    """Plain paths and ``file://`` URIs — the original fast path."""

    @staticmethod
    def _strip(path: str) -> str:
        scheme, rest = split_scheme(path)
        if scheme != "file":
            return path
        if rest.startswith("/"):       # file:///abs/path
            return rest
        if "/" in rest:                # file://host/abs/path → drop host
            return "/" + rest.split("/", 1)[1]
        return rest

    def open_input(self, path: str) -> BinaryIO:
        return open(self._strip(path), "rb")

    def open_output(self, path: str) -> BinaryIO:
        return open(self._strip(path), "wb")

    def size(self, path: str) -> int:
        return os.path.getsize(self._strip(path))

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._strip(path))

    def stat(self, path: str) -> tuple[int, float]:
        st = os.stat(self._strip(path))
        return st.st_size, st.st_mtime

    def exists(self, path: str) -> bool:
        return os.path.exists(self._strip(path))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(self._strip(path))

    def isfile(self, path: str) -> bool:
        return os.path.isfile(self._strip(path))

    def walk_files(self, directory: str) -> list[str]:
        d = self._strip(directory)
        out = []
        for root, _dirs, files in os.walk(d):
            out.extend(os.path.join(root, f) for f in files)
        return out

    def glob(self, pattern: str) -> list[str]:
        return [p for p in globmod.glob(self._strip(pattern)) if os.path.isfile(p)]

    def listdir(self, directory: str) -> list[str]:
        return os.listdir(self._strip(directory))

    def makedirs(self, directory: str) -> None:
        os.makedirs(self._strip(directory), exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(self._strip(path))

    def join(self, directory: str, name: str) -> str:
        return os.path.join(directory, name)


LOCAL = LocalFileSystem()

#: process-global memory:// store — {full URI: (bytes, mtime)}
_MEMORY_STORE: dict[str, tuple[bytes, float]] = {}


def memory_store() -> dict[str, tuple[bytes, float]]:
    """The current process's memory:// store (tests use this to seed and
    inspect files; ``clear()`` it between tests)."""
    return _MEMORY_STORE


class _MemoryWriteBuffer(io.BytesIO):
    def __init__(self, store: dict, path: str):
        super().__init__()
        self._store = store
        self._path = path

    def close(self) -> None:
        if not self.closed:
            self._store[self._path] = (self.getvalue(), time.time())
        super().close()


class MemoryFileSystem(FitsFileSystem):
    """Test-only in-process filesystem under ``memory://``.

    A plain handle reads/writes the process-global store. A *scoped*
    handle (what plan time pickles into partitions) additionally carries
    a by-value snapshot of the named file, so executor worker processes
    — which do not share the driver's memory — can still serve reads.
    """

    needs_commit_payload = True

    def __init__(self, snapshot: dict[str, tuple[bytes, float]] | None = None):
        self._snapshot = dict(snapshot or {})

    def _entry(self, path: str) -> tuple[bytes, float]:
        path = _norm_mem(path)
        if path in self._snapshot:
            return self._snapshot[path]
        if path in _MEMORY_STORE:
            return _MEMORY_STORE[path]
        raise FileNotFoundError(path)

    def open_input(self, path: str) -> BinaryIO:
        return io.BytesIO(self._entry(path)[0])

    def open_output(self, path: str) -> BinaryIO:
        return _MemoryWriteBuffer(_MEMORY_STORE, _norm_mem(path))

    def size(self, path: str) -> int:
        return len(self._entry(path)[0])

    def mtime(self, path: str) -> float:
        return self._entry(path)[1]

    def _keys(self) -> set[str]:
        return set(_MEMORY_STORE) | set(self._snapshot)

    def exists(self, path: str) -> bool:
        path = _norm_mem(path)
        return self.isfile(path) or self.isdir(path)

    def isfile(self, path: str) -> bool:
        path = _norm_mem(path)
        return path in self._snapshot or path in _MEMORY_STORE

    def isdir(self, path: str) -> bool:
        prefix = _norm_mem(path).rstrip("/") + "/"
        return any(k.startswith(prefix) for k in self._keys())

    def walk_files(self, directory: str) -> list[str]:
        prefix = _norm_mem(directory).rstrip("/") + "/"
        return sorted(k for k in self._keys() if k.startswith(prefix))

    def glob(self, pattern: str) -> list[str]:
        # segment-wise match: like local glob (and fsspec), `*` must not
        # cross `/` boundaries
        pp = _norm_mem(pattern).split("/")
        return sorted(
            k for k in self._keys()
            if len(k.split("/")) == len(pp)
            and all(fnmatch.fnmatchcase(a, b)
                    for a, b in zip(k.split("/"), pp)))

    def listdir(self, directory: str) -> list[str]:
        prefix = _norm_mem(directory).rstrip("/") + "/"
        names = {k[len(prefix):].split("/", 1)[0]
                 for k in self._keys() if k.startswith(prefix)}
        return sorted(names)

    def makedirs(self, directory: str) -> None:
        pass  # directories are implicit

    def remove(self, path: str) -> None:
        _MEMORY_STORE.pop(_norm_mem(path), None)
        self._snapshot.pop(_norm_mem(path), None)

    def scoped_for(self, path: str) -> "MemoryFileSystem":
        path = _norm_mem(path)
        return MemoryFileSystem(snapshot={path: self._entry(path)})


def _norm_mem(path: str) -> str:
    scheme, rest = split_scheme(path)
    return "memory://" + rest.lstrip("/") if scheme == "memory" else path


class MockRemoteFileSystem(FitsFileSystem):
    """``mock://bucket/key`` → ``<root>/bucket/key`` on shared local
    disk. Unlike :class:`LocalFileSystem` this is reached through the
    *non-local* scheme-dispatch branch everywhere (search, plan, scan,
    stream, write), so tests drive the exact code path an ``s3://`` URI
    takes — minus the network. Root: ``$SPARK_FITS_MOCKFS_ROOT`` (read
    per call so driver and executor workers agree via the Spark-
    propagated environment), else ``<tmpdir>/spark-fits-mockfs``."""

    @staticmethod
    def _root() -> str:
        import tempfile

        return os.environ.get(
            "SPARK_FITS_MOCKFS_ROOT",
            os.path.join(tempfile.gettempdir(), "spark-fits-mockfs"))

    def _local(self, path: str) -> str:
        return os.path.join(self._root(), split_scheme(path)[1].lstrip("/"))

    def _uri(self, local: str) -> str:
        rel = os.path.relpath(local, self._root()).replace(os.sep, "/")
        return "mock://" + rel

    def open_input(self, path: str) -> BinaryIO:
        return open(self._local(path), "rb")

    def open_output(self, path: str) -> BinaryIO:
        os.makedirs(os.path.dirname(self._local(path)), exist_ok=True)
        return open(self._local(path), "wb")

    def size(self, path: str) -> int:
        return os.path.getsize(self._local(path))

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._local(path))

    def exists(self, path: str) -> bool:
        return os.path.exists(self._local(path))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(self._local(path))

    def isfile(self, path: str) -> bool:
        return os.path.isfile(self._local(path))

    def walk_files(self, directory: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(self._local(directory)):
            out.extend(self._uri(os.path.join(root, f)) for f in files)
        return sorted(out)

    def glob(self, pattern: str) -> list[str]:
        return sorted(self._uri(p) for p in globmod.glob(self._local(pattern))
                      if os.path.isfile(p))

    def listdir(self, directory: str) -> list[str]:
        return sorted(os.listdir(self._local(directory)))

    def makedirs(self, directory: str) -> None:
        os.makedirs(self._local(directory), exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(self._local(path))


class FsspecFileSystem(FitsFileSystem):
    """fsspec-backed remote access (``s3://``, ``gs://``, ``hdfs://``,
    ``abfs://``, ...). fsspec AbstractFileSystem objects are picklable
    and reconnect lazily in executors. Only constructed when fsspec is
    importable — resolved per scheme in :func:`resolve_fs`."""

    def __init__(self, scheme: str):
        import fsspec

        self._scheme = scheme
        self._fs = fsspec.filesystem(scheme)

    def _strip(self, path: str) -> str:
        return split_scheme(path)[1]

    def _uri(self, raw: str) -> str:
        return raw if split_scheme(raw)[0] else f"{self._scheme}://{raw}"

    def open_input(self, path: str) -> BinaryIO:
        return self._fs.open(self._strip(path), "rb")

    def open_output(self, path: str) -> BinaryIO:
        return self._fs.open(self._strip(path), "wb")

    def size(self, path: str) -> int:
        return self._fs.size(self._strip(path))

    def mtime(self, path: str) -> float:
        m = self._fs.modified(self._strip(path))
        return m.timestamp() if hasattr(m, "timestamp") else float(m)

    def stat(self, path: str) -> tuple[int, float]:
        # one info() call instead of size()+modified() (2 HEADs)
        info = self._fs.info(self._strip(path))
        m = info.get("mtime") or info.get("LastModified") or 0.0
        if hasattr(m, "timestamp"):
            m = m.timestamp()
        return int(info.get("size") or 0), float(m or 0.0)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._strip(path))

    def isdir(self, path: str) -> bool:
        return self._fs.isdir(self._strip(path))

    def isfile(self, path: str) -> bool:
        return self._fs.isfile(self._strip(path))

    def walk_files(self, directory: str) -> list[str]:
        return sorted(self._uri(p) for p in
                      self._fs.find(self._strip(directory)))

    def glob(self, pattern: str) -> list[str]:
        hits = self._fs.glob(self._strip(pattern))
        return sorted(self._uri(p) for p in hits if self._fs.isfile(p))

    def listdir(self, directory: str) -> list[str]:
        base = self._strip(directory).rstrip("/")
        return sorted(p.rstrip("/").rsplit("/", 1)[-1]
                      for p in self._fs.ls(base, detail=False))

    def makedirs(self, directory: str) -> None:
        self._fs.makedirs(self._strip(directory), exist_ok=True)

    def remove(self, path: str) -> None:
        self._fs.rm(self._strip(path))


#: Hadoop-convention URI schemes mapped to the filesystem pyarrow
#: actually implements. The reference reads S3 through Hadoop's
#: FileSystem API, so its users' paths are ``s3a://`` (occasionally the
#: legacy ``s3n://``) — pyarrow's from_uri recognizes neither. Alias
#: them for FS construction; the ORIGINAL scheme is preserved when
#: re-prefixing result URIs, so paths round-trip exactly as written.
_SCHEME_ALIASES = {"s3a": "s3", "s3n": "s3"}


class ArrowFileSystem(FitsFileSystem):
    """pyarrow.fs fallback for ``s3://`` / ``hdfs://`` / ``gs://`` when
    fsspec is not installed (pyarrow already ships with the package).
    pyarrow FileSystem objects pickle by reconstruction. Glob support is
    emulated (recursive list + fnmatch) since pyarrow.fs has none."""

    def __init__(self, scheme: str, sample_uri: str):
        from pyarrow import fs as pafs

        self._scheme = scheme
        # from_uri resolves the concrete FS (region, host, ...) once;
        # Hadoop-style schemes (s3a/s3n) construct the s3 filesystem
        resolved = _SCHEME_ALIASES.get(scheme, scheme)
        raw = split_scheme(sample_uri)[1]
        self._fs, _ = pafs.FileSystem.from_uri(f"{resolved}://{raw}")

    def __getstate__(self):
        return {"scheme": self._scheme, "fs": self._fs}

    def __setstate__(self, state):
        self._scheme = state["scheme"]
        self._fs = state["fs"]

    def _strip(self, path: str) -> str:
        return split_scheme(path)[1]

    def _uri(self, raw: str) -> str:
        return f"{self._scheme}://{raw}"

    def _info(self, path: str):
        from pyarrow import fs as pafs

        info = self._fs.get_file_info([self._strip(path)])[0]
        if info.type == pafs.FileType.NotFound:
            raise FileNotFoundError(path)
        return info

    def open_input(self, path: str) -> BinaryIO:
        return self._fs.open_input_file(self._strip(path))

    def open_output(self, path: str) -> BinaryIO:
        return self._fs.open_output_stream(self._strip(path))

    def size(self, path: str) -> int:
        return self._info(path).size

    def mtime(self, path: str) -> float:
        m = self._info(path).mtime
        return m.timestamp() if m is not None else 0.0

    def stat(self, path: str) -> tuple[int, float]:
        info = self._info(path)  # one get_file_info round trip
        m = info.mtime
        return info.size, (m.timestamp() if m is not None else 0.0)

    def exists(self, path: str) -> bool:
        from pyarrow import fs as pafs

        info = self._fs.get_file_info([self._strip(path)])[0]
        return info.type != pafs.FileType.NotFound

    def isdir(self, path: str) -> bool:
        from pyarrow import fs as pafs

        info = self._fs.get_file_info([self._strip(path)])[0]
        return info.type == pafs.FileType.Directory

    def isfile(self, path: str) -> bool:
        from pyarrow import fs as pafs

        info = self._fs.get_file_info([self._strip(path)])[0]
        return info.type == pafs.FileType.File

    def walk_files(self, directory: str) -> list[str]:
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(self._strip(directory), recursive=True)
        return sorted(self._uri(i.path) for i in self._fs.get_file_info(sel)
                      if i.type == pafs.FileType.File)

    def glob(self, pattern: str) -> list[str]:
        raw = self._strip(pattern)
        # list from the deepest glob-free parent, then fnmatch
        parts = raw.split("/")
        base = []
        for p in parts:
            if any(ch in p for ch in "*?["):
                break
            base.append(p)
        if not base:
            # pyarrow.fs cannot enumerate buckets, so a wildcard in the
            # root segment has no listable parent — fail loud instead
            # of walking the literal pattern string as a directory
            raise ValueError(
                f"glob with a wildcard in the bucket/root segment is not "
                f"supported by the pyarrow.fs backend: {pattern!r} "
                "(install fsspec for bucket-level globbing)")
        root = "/".join(base[:-1]) if base and base[-1] == parts[-1] else "/".join(base)
        hits = self.walk_files(self._uri(root or raw))
        # segment-wise: `*` must not cross `/` (local-glob/fsspec parity)
        pp = self._uri(raw).split("/")
        return sorted(
            h for h in hits
            if len(h.split("/")) == len(pp)
            and all(fnmatch.fnmatchcase(a, b)
                    for a, b in zip(h.split("/"), pp)))

    def listdir(self, directory: str) -> list[str]:
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(self._strip(directory), recursive=False)
        return sorted(i.path.rsplit("/", 1)[-1]
                      for i in self._fs.get_file_info(sel))

    def makedirs(self, directory: str) -> None:
        self._fs.create_dir(self._strip(directory), recursive=True)

    def remove(self, path: str) -> None:
        self._fs.delete_file(self._strip(path))


#: test hook: scheme -> factory(scheme, sample_uri) -> FitsFileSystem
_REGISTRY: dict[str, object] = {}


def register_filesystem(scheme: str, factory) -> None:
    """Register/override a backend for ``scheme`` (tests, deployments)."""
    _REGISTRY[scheme.lower()] = factory


def resolve_fs(path: str) -> FitsFileSystem:
    """Scheme-dispatch a filesystem for ``path``. Resolution order:
    local fast path → memory:// → explicit registry → fsspec (if
    importable) → pyarrow.fs. Driver-side only for memory:// (see module
    docstring); remote backends are safe to resolve anywhere."""
    scheme, _ = split_scheme(path)
    if scheme in ("", "file"):
        return LOCAL
    if scheme == "memory":
        return MemoryFileSystem()
    if scheme == "mock":
        return MockRemoteFileSystem()
    if scheme in _REGISTRY:
        return _REGISTRY[scheme](scheme, path)
    try:
        import fsspec  # noqa: F401

        return FsspecFileSystem(scheme)
    except ImportError:
        pass
    except (ValueError, KeyError):
        # fsspec is importable but has no implementation for this
        # protocol (fsspec.filesystem raises ValueError/KeyError for
        # unknown schemes — e.g. the legacy ``s3n``, which fsspec does
        # NOT alias the way it aliases ``s3a``). Fall through to
        # pyarrow, whose branch applies _SCHEME_ALIASES.
        pass
    try:
        return ArrowFileSystem(scheme, path)
    except (ImportError, OSError, ValueError) as e:
        raise ValueError(
            f"No filesystem backend for scheme {scheme!r} ({path}): "
            f"install fsspec (plus its {scheme} protocol package) or use a "
            f"pyarrow.fs-supported scheme (s3/hdfs/gs). Cause: {e}"
        )


def iter_path_specs(path: str) -> Iterator[tuple[str, FitsFileSystem]]:
    """Split a comma-list path option into (spec, filesystem) pairs.
    Mixed schemes in one list are allowed (each spec resolves its own)."""
    cache: dict[str, FitsFileSystem] = {}
    for spec in (s.strip() for s in path.split(",")):
        if not spec:
            continue
        scheme, _ = split_scheme(spec)
        if scheme not in cache:
            cache[scheme] = resolve_fs(spec)
        yield spec, cache[scheme]
