"""Indexed binary region-feature store (writer + readers).

Production replacement for the reference's load-the-whole-pickle feature
dict (Data/VCRChunkAlign.py:778-781) and the orphaned UNITER LMDB reader
(Data/data.py:49-129).  Format documented in native/feature_store.cpp.

- :func:`write_pack` — offline packer (numpy → .mcrpack).
- :class:`FeatureStore` — reader.  Uses the C++ mmap library
  (native/libmcr_feature_store.so, built by ``make -C native``) for
  zero-copy O(log n) lookups; falls back to a pure-python mmap reader of
  the same format when the library isn't built.  Implements the mapping
  protocol `PMRDataset` consumes (``key in store``, ``store[key]``).
"""

from __future__ import annotations

import ctypes
import mmap
import os
import struct
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures

MAGIC = 0x4652434D  # 'MCRF'
VERSION = 1
_HEADER = struct.Struct("<IIQII")          # magic, version, n, dim, pad
_ENTRY = struct.Struct("<QQIIQ")           # hash, key_off, key_len, n_regions, data_off
_ALIGN = 64


def _fnv1a(data: bytes) -> int:
    h = 1469598103934665603
    for b in data:
        h ^= b
        h = (h * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def write_pack(features: Dict[str, np.ndarray], path: str) -> None:
    """Pack {key: [n_regions, dim] float32} into an .mcrpack file."""
    items = [(k.encode(), np.ascontiguousarray(v, np.float32))
             for k, v in features.items()]
    if not items:
        raise ValueError("empty feature dict")
    dim = items[0][1].shape[1]
    for k, v in items:
        if v.ndim != 2 or v.shape[1] != dim:
            raise ValueError(f"{k!r}: inconsistent shape {v.shape}")

    entries = sorted(
        ((_fnv1a(k), k, v) for k, v in items), key=lambda e: e[0]
    )
    n = len(entries)
    keys_off = _HEADER.size + n * _ENTRY.size
    key_offsets = []
    off = keys_off
    for _, k, _v in entries:
        key_offsets.append(off)
        off += len(k)
    data_start = (off + _ALIGN - 1) // _ALIGN * _ALIGN
    data_offsets = []
    off = data_start
    for _, _k, v in entries:
        data_offsets.append(off)
        off += v.nbytes
        off = (off + _ALIGN - 1) // _ALIGN * _ALIGN

    with open(path, "wb") as f:
        f.write(_HEADER.pack(MAGIC, VERSION, n, dim, 0))
        for (h, k, v), ko, do in zip(entries, key_offsets, data_offsets):
            f.write(_ENTRY.pack(h, ko, len(k), v.shape[0], do))
        for _, k, _v in entries:
            f.write(k)
        for (_, _k, v), do in zip(entries, data_offsets):
            f.seek(do)
            f.write(v.tobytes())


def _find_native_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libmcr_feature_store.so")
    return cand if os.path.exists(cand) else None


class _MappedView(np.ndarray):
    """ndarray view subclass carrying a reference to its mmap owner."""

    _mcr_reader = None


class _NativeReader:
    def __init__(self, path: str, lib_path: str):
        lib = ctypes.CDLL(lib_path)
        lib.mcr_open.restype = ctypes.c_void_p
        lib.mcr_open.argtypes = [ctypes.c_char_p]
        lib.mcr_close.argtypes = [ctypes.c_void_p]
        lib.mcr_count.restype = ctypes.c_uint64
        lib.mcr_count.argtypes = [ctypes.c_void_p]
        lib.mcr_dim.restype = ctypes.c_uint32
        lib.mcr_dim.argtypes = [ctypes.c_void_p]
        lib.mcr_lookup.restype = ctypes.POINTER(ctypes.c_float)
        lib.mcr_lookup.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.mcr_key_at.restype = ctypes.c_void_p
        lib.mcr_key_at.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
        ]
        self._lib = lib
        self._h = lib.mcr_open(path.encode())
        if not self._h:
            raise IOError(f"mcr_open failed for {path}")
        self.dim = int(lib.mcr_dim(self._h))
        self.count = int(lib.mcr_count(self._h))

    def lookup(self, key: str) -> Optional[np.ndarray]:
        n = ctypes.c_uint32(0)
        ptr = self._lib.mcr_lookup(
            self._h, key.encode(), len(key.encode()), ctypes.byref(n)
        )
        if not ptr:
            return None
        # Zero-copy view into the PROT_READ mapping: mark it read-only (an
        # in-place write would SIGSEGV) and pin this reader on the array so
        # a GC'd reader can never unmap memory a live view still points at.
        # An EXPLICIT FeatureStore.close() still invalidates outstanding
        # views — copy before closing if they must outlive the store.
        arr = np.ctypeslib.as_array(
            ptr, shape=(int(n.value), self.dim)
        ).view(_MappedView)
        arr._mcr_reader = self
        arr.flags.writeable = False
        return arr

    def keys(self):
        ln = ctypes.c_uint32(0)
        for i in range(self.count):
            ptr = self._lib.mcr_key_at(self._h, i, ctypes.byref(ln))
            if ptr:
                yield ctypes.string_at(ptr, ln.value).decode()

    def close(self):
        if self._h:
            self._lib.mcr_close(self._h)
            self._h = None


class _PyReader:
    """Same format, pure python (mmap + struct); used when the native
    library isn't built."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        magic, version, n, dim, _ = _HEADER.unpack_from(self._mm, 0)
        if magic != MAGIC or version != VERSION:
            raise IOError(f"bad pack file {path}")
        self.count, self.dim = n, dim
        self._index = {}
        off = _HEADER.size
        for _ in range(n):
            h, ko, kl, nr, do = _ENTRY.unpack_from(self._mm, off)
            key = self._mm[ko:ko + kl].decode()
            self._index[key] = (nr, do)
            off += _ENTRY.size

    def keys(self):
        return iter(self._index)

    def lookup(self, key: str) -> Optional[np.ndarray]:
        hit = self._index.get(key)
        if hit is None:
            return None
        nr, do = hit
        # copy: a zero-copy view would pin the mmap open past close()
        # (the native reader is the zero-copy path)
        return np.frombuffer(
            self._mm, np.float32, count=nr * self.dim, offset=do
        ).reshape(nr, self.dim).copy()

    def close(self):
        self._mm.close()
        self._f.close()


class FeatureStore:
    """Mapping-protocol reader over an .mcrpack file."""

    def __init__(self, path: str, *, prefer_native: bool = True):
        lib = _find_native_lib() if prefer_native else None
        self._reader = _NativeReader(path, lib) if lib else _PyReader(path)
        self.native = isinstance(self._reader, _NativeReader)

    @property
    def dim(self) -> int:
        return self._reader.dim

    def keys(self):
        return self._reader.keys()

    def __len__(self) -> int:
        return self._reader.count

    def __contains__(self, key: str) -> bool:
        return self._reader.lookup(key) is not None

    def __getitem__(self, key: str) -> ImageFeatures:
        feats = self._reader.lookup(key)
        if feats is None:
            raise KeyError(key)
        return ImageFeatures(features=feats, num_regions=feats.shape[0])

    def close(self) -> None:
        self._reader.close()
