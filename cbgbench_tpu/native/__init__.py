"""Native host data plane: ctypes bindings for csrc/fastparse.cpp.

Compiled on first use with the system toolchain (g++/cc) into a cached
shared object; every entry point has a pure-python fallback so the
framework runs without a compiler. The native layer accelerates the
text-heavy host pipeline (PDB/SDF parsing, bond perception) — the
reference relies on RDKit/OpenBabel/Biopython C++ for the same work.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "fastparse.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cache = os.environ.get("CBGBENCH_NATIVE_CACHE",
                           os.path.join(tempfile.gettempdir(),
                                        "cbgbench_native"))
    os.makedirs(cache, exist_ok=True)
    stamp = str(int(os.path.getmtime(src)))
    so = os.path.join(cache, f"fastparse_{stamp}.so")
    if not os.path.exists(so):
        for cc in ("g++", "c++", "clang++"):
            try:
                subprocess.run(
                    [cc, "-O3", "-fPIC", "-shared", "-std=c++14", src,
                     "-o", so + ".tmp"],
                    check=True, capture_output=True, timeout=120)
                os.replace(so + ".tmp", so)
                break
            except Exception:
                continue
        else:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    c_int_p = ctypes.POINTER(ctypes.c_int)
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_ubyte_p = ctypes.POINTER(ctypes.c_ubyte)
    lib.parse_pdb_atoms.restype = ctypes.c_int
    lib.parse_pdb_atoms.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, c_int_p, c_float_p,
        c_ubyte_p, ctypes.c_char_p, ctypes.c_char_p, c_int_p,
        ctypes.c_char_p, c_int_p]
    lib.parse_sdf_v2000.restype = ctypes.c_int
    lib.parse_sdf_v2000.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        c_int_p, c_float_p, c_int_p, c_int_p, c_int_p]
    lib.perceive_bonds_c.restype = ctypes.c_int
    lib.perceive_bonds_c.argtypes = [
        ctypes.c_int, c_int_p, c_double_p, ctypes.c_double, ctypes.c_int,
        c_int_p, c_int_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


def parse_pdb_atoms(text: str, max_atoms: int = 100000):
    """-> dict(z, pos, is_backbone, names, resnames, res_id) or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    raw = text.encode()
    z = np.zeros(max_atoms, np.int32)
    pos = np.zeros((max_atoms, 3), np.float32)
    bb = np.zeros(max_atoms, np.uint8)
    names = ctypes.create_string_buffer(4 * max_atoms)
    resnames = ctypes.create_string_buffer(4 * max_atoms)
    chains = ctypes.create_string_buffer(max_atoms)
    rid = np.zeros(max_atoms, np.int32)
    resseq = np.zeros(max_atoms, np.int32)
    n = lib.parse_pdb_atoms(
        raw, len(raw), max_atoms,
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        names, resnames,
        rid.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        chains, resseq.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if n < 0:
        return None
    # slice the raw buffers ONCE (`.raw` copies the whole buffer per access)
    nb = names.raw[:4 * n].decode("ascii", errors="replace")
    rb = resnames.raw[:4 * n].decode("ascii", errors="replace")
    name_list = [nb[4 * i:4 * i + 4].strip() for i in range(n)]
    res_list = [rb[4 * i:4 * i + 4].strip() for i in range(n)]
    ch = chains.raw[:n].decode("ascii", errors="replace")
    return {"z": z[:n].copy(), "pos": pos[:n].astype(float),
            "is_backbone": bb[:n].astype(bool), "names": name_list,
            "resnames": res_list, "res_id": rid[:n].copy(),
            "chains": list(ch), "resseq": resseq[:n].copy()}


def parse_sdf_v2000(text: str, max_atoms: int = 4096,
                    max_bonds: int = 8192):
    """-> (z [N], pos [N,3], bonds [E,3] 0-based (i,j,order)) or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    raw = text.encode()
    z = np.zeros(max_atoms, np.int32)
    pos = np.zeros((max_atoms, 3), np.float32)
    bonds = np.zeros((max_bonds, 3), np.int32)
    na = ctypes.c_int(0)
    nb = ctypes.c_int(0)
    rc = lib.parse_sdf_v2000(
        raw, len(raw), max_atoms, max_bonds,
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(na), ctypes.byref(nb))
    if rc != 0:
        return None
    return (z[:na.value].copy(), pos[:na.value].astype(float),
            bonds[:nb.value].copy())


def perceive_bonds_native(z: np.ndarray, pos: np.ndarray,
                          tol: float = 0.45):
    """-> (i [E], j [E]) candidate single bonds, or None. Mirrors
    chem/bonds.py perceive_bonds steps 1-3 (order assignment stays in
    python)."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = len(z)
    z32 = np.ascontiguousarray(z, np.int32)
    p64 = np.ascontiguousarray(pos, np.float64)
    cap = max(8 * n, 64)
    bi = np.zeros(cap, np.int32)
    bj = np.zeros(cap, np.int32)
    nb = lib.perceive_bonds_c(
        n, z32.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        p64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(tol), cap,
        bi.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        bj.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if nb < 0:
        return None
    return bi[:nb].copy(), bj[:nb].copy()
