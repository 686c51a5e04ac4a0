"""File IO backends — equivalent of `basicsr/utils/file_client.py`.

Disk backend is always available; the lmdb backend mirrors BasicSR's
(env per db, keys are image stems), using the optional `lmdb` package
when present and the pure-Python `gsasr_tpu.utils.mini_lmdb` reader of
the same on-disk format otherwise. Memcached is intentionally
unsupported.
"""

from __future__ import annotations

from pathlib import Path


class DiskBackend:
    def get(self, filepath) -> bytes:
        return Path(filepath).read_bytes()


class LmdbBackend:
    """Read from one or more lmdb envs (`file_client.py` lmdb paths)."""

    def __init__(self, db_paths, client_keys="default", readonly=True,
                 lock=False, readahead=False):
        try:
            import lmdb
        except ImportError:
            from gsasr_tpu.utils import mini_lmdb as lmdb
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, (str, Path)):
            db_paths = [db_paths]
        self._envs = {
            k: lmdb.open(str(p), readonly=readonly, lock=lock,
                         readahead=readahead)
            for k, p in zip(client_keys, db_paths)
        }

    def get(self, filepath, client_key="default") -> bytes:
        env = self._envs[client_key]
        with env.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class FileClient:
    """Dispatcher with BasicSR-compatible surface: FileClient(backend).get."""

    _backends = {"disk": DiskBackend, "lmdb": LmdbBackend}

    def __init__(self, backend: str = "disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"backend {backend!r} not supported "
                f"(available: {sorted(self._backends)})")
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key="default") -> bytes:
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)


def imfrombytes(content: bytes, flag: str = "color", float32: bool = False):
    """Decode an image buffer (`basicsr/utils/img_util.py` imfrombytes)."""
    import cv2
    import numpy as np

    flags = {"color": cv2.IMREAD_COLOR, "grayscale": cv2.IMREAD_GRAYSCALE,
             "unchanged": cv2.IMREAD_UNCHANGED}[flag]
    img = cv2.imdecode(np.frombuffer(content, np.uint8), flags)
    if float32:
        img = img.astype(np.float32) / 255.0
    return img
