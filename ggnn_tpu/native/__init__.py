"""Native (C++) host-pipeline kernels: build + ctypes bindings.

The library is compiled on first use with g++ (-O3, shared) and cached
next to the source keyed by a source hash; no pybind11 — plain C ABI +
ctypes. Set GGNN_TPU_NO_NATIVE=1 (or "true"/"yes") to force the
pure-python pipeline.
"""

import ctypes
import hashlib
import os
import platform
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cpp")
_LIB: Optional[ctypes.CDLL] = None
_LOAD_ERROR: Optional[str] = None
_BUILD_LOCK = threading.Lock()


def _no_native_env() -> bool:
    """GGNN_TPU_NO_NATIVE parsed as a boolean: '0'/'false'/'' mean
    native stays ON (a launcher exporting =0 to mean 'enabled' must not
    silently disable the 20-60x faster pipeline — round-5 review)."""
    return os.environ.get("GGNN_TPU_NO_NATIVE", "").strip().lower() in (
        "1", "true", "yes", "on")


def _host_salt() -> str:
    """CPU-identity salt for the build cache: the artifact is compiled
    with -march=native, so a checkout shared between heterogeneous
    machines (NFS, baked container images) must not reuse it. x86
    /proc/cpuinfo names the part in 'model name'; aarch64 uses
    'CPU implementer'/'CPU part' (and has no 'model name'), so both
    families are collected — a salt that degenerates to
    platform.machine() would reuse a Neoverse-V2 build on an N1 and
    SIGILL mid-serving."""
    parts = [platform.machine(), platform.processor() or ""]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "Model", "CPU implementer",
                           "CPU part", "CPU variant", "CPU revision",
                           "cpu", "machine") and key not in seen:
                    seen.add(key)
                    parts.append(line.split(":", 1)[1].strip())
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:8]


def _build_and_load() -> ctypes.CDLL:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    salt = _host_salt()
    lib_path = os.path.join(_HERE, f"libpacker_{digest}_{salt}.so")
    if not os.path.exists(lib_path):
        # Thread-ident in the tmp name + the build lock: two threads of
        # one process share the pid, and a pid-only tmp raced g++ vs
        # os.replace (one thread could dlopen a half-written ELF and
        # permanently disable native packing — round-5 review).
        tmp = f"{lib_path}.{os.getpid()}.{threading.get_ident()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", tmp, _SRC],
            check=True, capture_output=True)
        os.replace(tmp, lib_path)  # atomic vs concurrent builders
        # Prune artifacts of superseded source digests for this host
        # (each source edit would otherwise leak a ~30KB .so forever).
        import glob
        for old in glob.glob(os.path.join(_HERE, f"libpacker_*_{salt}.so")):
            if old != lib_path:
                try:
                    os.unlink(old)
                except OSError:
                    pass
    lib = ctypes.CDLL(lib_path)

    i32 = ctypes.c_int32
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.pack_dense_batch.restype = None
    lib.pack_dense_batch.argtypes = [
        p_i32, p_i64, p_f32, p_i64, p_i32,
        i32, i32, i32, i32, i32, i32,
        p_f32, p_f32, p_f32,
    ]
    lib.pack_gcn_dense_batch.restype = None
    lib.pack_gcn_dense_batch.argtypes = [
        p_i32, p_i64, p_f32, p_i64, p_i32,
        i32, i32, i32, i32,
        p_f32, p_f32, p_f32,
    ]
    lib.pack_sparse_batch.restype = i32
    lib.pack_sparse_batch.argtypes = [
        p_i32, p_i64, p_f32, p_i64, p_i32,
        i32, i32, i32, i32, i32, i32,
        p_i32, p_i32, p_f32, p_f32, p_f32, p_i32, p_i64,
    ]
    i64 = ctypes.c_int64
    lib.pack_gcn_batch.restype = i64
    lib.pack_gcn_batch.argtypes = [
        p_i32, p_i64, p_f32, p_i64, p_i32,
        i32, i64, i32, i32,
        p_i32, p_i32, p_f32, p_f32, p_i32,
    ]
    # Raw-pointer ABI (c_void_p + arr.ctypes.data), NOT ndpointer: this
    # is the serving latency path and ndpointer's per-argument
    # validation costs ~5us x 12 arrays per call — more than the kernel
    # itself. The sole caller (serving._pack_single_sparse_native)
    # allocates every array C-contiguous with the right dtype.
    vp = ctypes.c_void_p
    lib.pack_single_sparse.restype = i32
    lib.pack_single_sparse.argtypes = [
        vp, i64, vp, i32, i32, i32, i32, i32, i32, i64, i32, i32,
        vp, vp, vp, vp, vp, vp, vp,
        vp, vp, vp,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (disabled or build failed)."""
    global _LIB, _LOAD_ERROR
    if _no_native_env():
        return None
    if _LIB is None and _LOAD_ERROR is None:
        with _BUILD_LOCK:
            if _LIB is None and _LOAD_ERROR is None:
                try:
                    _LIB = _build_and_load()
                except (OSError, subprocess.CalledProcessError) as e:
                    detail = str(e)
                    stderr = getattr(e, "stderr", None)
                    if stderr:
                        # The compiler's actual message, not just the
                        # exit status — require_lib's diagnostic is
                        # useless without it.
                        detail += "\n" + stderr.decode(errors="replace")
                    _LOAD_ERROR = detail
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def require_lib() -> ctypes.CDLL:
    """Like get_lib(), but raises a descriptive error instead of
    returning None — for entry points that hard-require the native
    pipeline (native_pack.*)."""
    lib = get_lib()
    if lib is None:
        reason = ("disabled via GGNN_TPU_NO_NATIVE"
                  if _no_native_env()
                  else f"build/load failed: {_LOAD_ERROR}")
        raise RuntimeError(
            "native packer library unavailable (%s); use the pure-python "
            "packers in ggnn_tpu.data.packing instead" % reason)
    return lib
