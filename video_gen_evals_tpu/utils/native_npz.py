"""ctypes binding for the native npz reader (``native/npz_reader.cc``).

The framework's data-loader core: mmap + zlib inflate in C++ with a thread
pool for multi-file loads, replacing Python zipfile overhead in the feature
bank builder. Falls back to ``numpy.load`` transparently when the shared
library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import typing as T

import numpy as np

_DTYPES = {
    0: np.float32,
    1: np.float64,
    2: np.float16,
    3: np.int32,
    4: np.int64,
    5: np.int16,
    6: np.int8,
    7: np.uint32,
    8: np.uint64,
    9: np.uint16,
    10: np.uint8,
    11: np.bool_,
}

_LIB: T.Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libvge_native.so",
    )


def load_library() -> T.Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.npz_open.restype = ctypes.c_void_p
    lib.npz_open.argtypes = [ctypes.c_char_p]
    lib.npz_num_arrays.restype = ctypes.c_int
    lib.npz_num_arrays.argtypes = [ctypes.c_void_p]
    lib.npz_get_info.restype = ctypes.c_int
    lib.npz_get_info.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.npz_nbytes.restype = ctypes.c_int64
    lib.npz_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.npz_read.restype = ctypes.c_int
    lib.npz_read.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.npz_close.restype = None
    lib.npz_close.argtypes = [ctypes.c_void_p]
    lib.npz_open_many.restype = ctypes.c_int
    lib.npz_open_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


def load_npz(path: str) -> T.Dict[str, np.ndarray]:
    """Load all arrays of an npz via the native reader (numpy fallback)."""
    lib = load_library()
    if lib is None:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files if z[k].dtype != object}

    handle = lib.npz_open(path.encode())
    if not handle:
        raise IOError(f"native npz reader could not open {path}")
    try:
        out: T.Dict[str, np.ndarray] = {}
        n = lib.npz_num_arrays(handle)
        for i in range(n):
            info = (ctypes.c_int64 * 10)()
            name = ctypes.create_string_buffer(256)
            rc = lib.npz_get_info(handle, i, info, name, 256)
            if rc != 0:
                continue  # unsupported member (e.g. pickled "meta" strings)
            dtype = _DTYPES[int(info[0])]
            ndim = int(info[1])
            shape = tuple(int(info[2 + d]) for d in range(ndim))
            arr = np.empty(shape, dtype)
            rc = lib.npz_read(handle, i, arr.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise IOError(f"native npz read failed for {path}:{name.value!r} rc={rc}")
            out[name.value.decode()] = arr
        return out
    finally:
        lib.npz_close(handle)


def npz_shapes(path: str) -> T.Dict[str, T.Tuple[int, ...]]:
    """Name -> shape for every (non-pickled) member, WITHOUT decompressing
    payloads: the native reader parses just the npy header from a small
    inflated prefix; the numpy fallback streams only the header bytes
    through zipfile. Makes manifest scans O(#files) instead of O(dataset
    bytes) — ``np.load(mmap_mode='r')`` on a compressed npz inflates the
    whole member for a ``.shape`` access."""
    lib = load_library()
    if lib is None:
        import zipfile

        out: T.Dict[str, T.Tuple[int, ...]] = {}
        with zipfile.ZipFile(path) as zf:
            for nm in zf.namelist():
                if not nm.endswith(".npy"):
                    continue
                with zf.open(nm) as f:
                    version = np.lib.format.read_magic(f)
                    if version == (1, 0):
                        shape, _c, _dt = np.lib.format.read_array_header_1_0(f)
                    else:
                        shape, _c, _dt = np.lib.format.read_array_header_2_0(f)
                    out[nm[:-4]] = tuple(int(d) for d in shape)
        return out

    handle = lib.npz_open(path.encode())
    if not handle:
        raise IOError(f"native npz reader could not open {path}")
    try:
        out = {}
        for i in range(lib.npz_num_arrays(handle)):
            info = (ctypes.c_int64 * 10)()
            name = ctypes.create_string_buffer(256)
            if lib.npz_get_info(handle, i, info, name, 256) != 0:
                continue  # unsupported member (e.g. pickled "meta" strings)
            ndim = int(info[1])
            out[name.value.decode()] = tuple(
                int(info[2 + d]) for d in range(ndim)
            )
        return out
    finally:
        lib.npz_close(handle)


def load_npz_many(
    paths: T.Sequence[str], n_threads: int = 4
) -> T.List[T.Optional[T.Dict[str, np.ndarray]]]:
    """Open + read many npz files with the native thread pool."""
    lib = load_library()
    if lib is None:
        return [load_npz(p) for p in paths]

    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    handles = (ctypes.c_void_p * n)()
    lib.npz_open_many(c_paths, n, handles, n_threads)
    results: T.List[T.Optional[T.Dict[str, np.ndarray]]] = []
    for i in range(n):
        h = handles[i]
        if not h:
            results.append(None)
            continue
        try:
            out: T.Dict[str, np.ndarray] = {}
            cnt = lib.npz_num_arrays(h)
            for j in range(cnt):
                info = (ctypes.c_int64 * 10)()
                name = ctypes.create_string_buffer(256)
                if lib.npz_get_info(h, j, info, name, 256) != 0:
                    continue
                dtype = _DTYPES[int(info[0])]
                ndim = int(info[1])
                shape = tuple(int(info[2 + d]) for d in range(ndim))
                arr = np.empty(shape, dtype)
                if lib.npz_read(h, j, arr.ctypes.data_as(ctypes.c_void_p)) == 0:
                    out[name.value.decode()] = arr
            results.append(out)
        finally:
            lib.npz_close(h)
    return results
