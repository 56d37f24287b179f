"""File-backend abstraction (disk / lmdb / memcached).

Port of Train/basicsr/utils/file_client.py:150-186: datasets address
storage through one ``get(filepath, key) -> bytes`` interface so corpora
can live on disk, in LMDB shards, or behind memcached. The lmdb/memcached
backends activate only when their client libraries are importable (this
image ships neither; disk is the default everywhere).
"""

from __future__ import annotations

from typing import Any


class DiskBackend:
    def get(self, filepath: str) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()


class LmdbBackend:
    """One LMDB env per key; filepath is the key inside the db
    (file_client.py:74-147). Uses the ``lmdb`` package when importable;
    otherwise reads the same on-disk format through the bundled
    dependency-free codec (data/lmdb_codec.py), so LMDB corpora work in
    this offline TPU image too."""

    def __init__(self, db_paths, client_keys="default", readonly=True,
                 lock=False, readahead=False):
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, (str, bytes)):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {}
        try:
            import lmdb

            self._native = True
            for key, path in zip(client_keys, db_paths):
                self._client[key] = lmdb.open(str(path), readonly=readonly,
                                              lock=lock, readahead=readahead)
        except ImportError:
            from .lmdb_codec import LmdbReader

            self._native = False
            for key, path in zip(client_keys, db_paths):
                self._client[key] = LmdbReader(str(path))

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        client = self._client[client_key]
        if self._native:
            with client.begin(write=False) as txn:
                return txn.get(str(filepath).encode("ascii"))
        return client.get(str(filepath))


class MemcachedBackend:
    """`mc`-protocol backend (file_client.py:20-60). No deployment exists
    in this image; the protocol is covered by tests/test_memcached_backend
    through a fake `mc` module injected via ``sys_path``."""

    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        if sys_path is not None:
            import sys

            sys.path.append(sys_path)
        try:
            import mc
        except ImportError as e:
            raise ImportError("memcached backend needs the 'mc' package") from e
        self._client = mc.MemcachedClient.GetInstance(server_list_cfg,
                                                      client_cfg)
        self._mc_buffer = mc.pyvector()
        self._mc = mc

    def get(self, filepath: str) -> bytes:
        self._client.Get(str(filepath), self._mc_buffer)
        return self._mc.ConvertBuffer(self._mc_buffer)


class FileClient:
    """Dispatching client (file_client.py:150-186)."""

    _backends = {
        "disk": DiskBackend,
        "lmdb": LmdbBackend,
        "memcached": MemcachedBackend,
    }

    def __init__(self, backend: str = "disk", **kwargs: Any):
        if backend not in self._backends:
            raise ValueError(
                f"backend {backend!r} not supported; choose from "
                f"{sorted(self._backends)}")
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)
