"""Morton block-table layer: the host-side AMR bookkeeping runtime.

TPU-native replacement for the reference's pointer tree bookkeeping
(reference: src/ftt.c neighbor/refine/coarsen machinery + the
gfs_domain_reshape 2:1 grading fixpoint, src/adaptive.c:998-1022).  The
heavy per-block loops run in the C++ library native/block_table.cpp
(compiled on first use); a pure-Python fallback implements the same ABI
for toolchain-free environments.

A block key packs (level << 56 | morton).  Device-side per-level field
arrays index blocks by the sorted key order (Morton order doubles as the
static device-layout curve, the analogue of the reference's -s/-p box
partitioning, src/gerris.c:334-426).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


@lru_cache(maxsize=1)
def _lib():
    """Compile+load the native library; None if no toolchain."""
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "block_table.cpp"))
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libblocktable.so"))
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
    except Exception:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.morton_encode_2d.argtypes = [i64p, i64p, ctypes.c_int64, i64p]
    lib.morton_decode_2d.argtypes = [i64p, ctypes.c_int64, i64p, i64p]
    lib.morton_encode_3d.argtypes = [i64p, i64p, i64p, ctypes.c_int64, i64p]
    lib.morton_decode_3d.argtypes = [i64p, ctypes.c_int64, i64p, i64p, i64p]
    lib.grade_2to1_2d.restype = ctypes.c_int64
    lib.grade_2to1_2d.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64, i64p]
    lib.apply_marks_2d.restype = ctypes.c_int64
    lib.apply_marks_2d.argtypes = [i64p, i8p, ctypes.c_int64,
                                   ctypes.c_int64, i64p]
    lib.neighbors_2d.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, i64p, i8p]
    return lib


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _p8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


# -- pure-python reference implementations (fallback + test oracle) ---------

def _part1by1(x):
    x = np.asarray(x, np.uint64) & np.uint64(0xffffffff)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000ffff0000ffff)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00ff00ff00ff00ff)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0f0f0f0f0f0f0f0f)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _unpart1by1(x):
    x = np.asarray(x, np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0f0f0f0f0f0f0f0f)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00ff00ff00ff00ff)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000ffff0000ffff)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000ffffffff)
    return x


def morton_encode_2d(ix, iy, native: bool = True):
    ix = np.ascontiguousarray(ix, np.int64)
    iy = np.ascontiguousarray(iy, np.int64)
    lib = _lib() if native else None
    if lib is not None:
        out = np.empty_like(ix)
        lib.morton_encode_2d(_p64(ix), _p64(iy), len(ix), _p64(out))
        return out
    return (_part1by1(ix) | (_part1by1(iy) << np.uint64(1))).astype(np.int64)


def morton_decode_2d(code, native: bool = True):
    code = np.ascontiguousarray(code, np.int64)
    lib = _lib() if native else None
    if lib is not None:
        ix = np.empty_like(code)
        iy = np.empty_like(code)
        lib.morton_decode_2d(_p64(code), len(code), _p64(ix), _p64(iy))
        return ix, iy
    c = code.astype(np.uint64)
    return (_unpart1by1(c).astype(np.int64),
            _unpart1by1(c >> np.uint64(1)).astype(np.int64))


def make_key(level, morton):
    return (np.asarray(level, np.int64) << np.int64(56)) | \
        np.asarray(morton, np.int64)


def key_level(keys):
    return (np.asarray(keys, np.int64) >> np.int64(56)).astype(np.int32)


def key_morton(keys):
    return np.asarray(keys, np.int64) & np.int64(0xffffffffffffff)


class BlockLayout:
    """A set of leaf blocks (keys sorted in (level, Morton) order).

    root: number of root blocks per axis (the box stack).
    """

    def __init__(self, keys, root=(1, 1)):
        self.keys = np.sort(np.asarray(keys, np.int64))
        self.root = tuple(root)

    @staticmethod
    def uniform(level: int, root=(1, 1)) -> "BlockLayout":
        nx = root[0] << level
        ny = root[1] << level
        ix, iy = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        m = morton_encode_2d(ix.ravel(), iy.ravel())
        return BlockLayout(make_key(level, m), root)

    def __len__(self):
        return len(self.keys)

    def coords(self):
        lev = key_level(self.keys)
        ix, iy = morton_decode_2d(key_morton(self.keys))
        return lev, ix, iy

    def apply_marks(self, marks) -> "BlockLayout":
        """+1 refine, -1 coarsen candidate (all 4 siblings must agree), 0
        keep.  Reference: adapt_local refine/coarsen, src/adaptive.c:1402."""
        marks = np.ascontiguousarray(marks, np.int8)
        lib = _lib()
        cap = 4 * len(self.keys) + 16
        if lib is not None:
            out = np.empty(cap, np.int64)
            n = lib.apply_marks_2d(_p64(self.keys), _p8(marks),
                                   len(self.keys), cap, _p64(out))
            assert n >= 0
            return BlockLayout(out[:n], self.root)
        return BlockLayout(self._apply_marks_py(marks), self.root)

    def _apply_marks_py(self, marks):
        lev, ix, iy = self.coords()
        out = []
        votes = {}
        for i in range(len(self.keys)):
            if marks[i] < 0 and lev[i] > 0:
                pk = int(make_key(lev[i] - 1,
                                  morton_encode_2d([ix[i] >> 1],
                                                   [iy[i] >> 1])[0]))
                votes[pk] = votes.get(pk, 0) + 1
        for i in range(len(self.keys)):
            l, x, y = int(lev[i]), int(ix[i]), int(iy[i])
            if marks[i] > 0:
                for cc in range(4):
                    fx, fy = 2 * x + (cc & 1), 2 * y + (cc >> 1)
                    out.append(int(make_key(
                        l + 1, morton_encode_2d([fx], [fy])[0])))
            elif marks[i] < 0 and l > 0:
                pk = int(make_key(l - 1, morton_encode_2d([x >> 1],
                                                          [y >> 1])[0]))
                if votes.get(pk) == 4:
                    if (x & 1) == 0 and (y & 1) == 0:
                        out.append(pk)
                else:
                    out.append(int(self.keys[i]))
            else:
                out.append(int(self.keys[i]))
        return np.asarray(out, np.int64)

    def grade(self) -> "BlockLayout":
        """Enforce 2:1 balance incl. corners (gfs_domain_reshape fixpoint,
        src/adaptive.c:998-1022)."""
        lib = _lib()
        if lib is not None:
            cap = 16 * len(self.keys) + 64
            out = np.empty(cap, np.int64)
            n = lib.grade_2to1_2d(_p64(self.keys), len(self.keys),
                                  self.root[0], self.root[1], cap, _p64(out))
            assert n >= 0
            return BlockLayout(out[:n], self.root)
        return BlockLayout(self._grade_py(), self.root)

    def _grade_py(self):
        leaves = set(int(k) for k in self.keys)

        def cover(l, x, y):
            while l >= 0:
                k = int(make_key(l, morton_encode_2d([x], [y],
                                                     native=False)[0]))
                if k in leaves:
                    return l, x, y, k
                x >>= 1
                y >>= 1
                l -= 1
            return None

        changed = True
        while changed:
            changed = False
            for k in list(leaves):
                l = int(key_level([k])[0])
                if l == 0:
                    continue
                x, y = (int(v[0]) for v in
                        morton_decode_2d(key_morton([k])))
                nx, ny = self.root[0] << l, self.root[1] << l
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        qx, qy = x + dx, y + dy
                        if not (0 <= qx < nx and 0 <= qy < ny):
                            continue
                        c = cover(l, qx, qy)
                        if c is not None and c[0] >= l - 1:
                            continue
                        finer = any(int(make_key(
                            l + 1, morton_encode_2d([2 * qx + (cc & 1)],
                                                    [2 * qy + (cc >> 1)],
                                                    native=False)[0]))
                            in leaves for cc in range(4))
                        if finer:
                            continue
                        if c is None:
                            continue
                        cl, cx2, cy2, ck = c
                        leaves.remove(ck)
                        for cc in range(4):
                            fx, fy = 2 * cx2 + (cc & 1), 2 * cy2 + (cc >> 1)
                            leaves.add(int(make_key(
                                cl + 1, morton_encode_2d(
                                    [fx], [fy], native=False)[0])))
                        changed = True
        return np.asarray(sorted(leaves), np.int64)

    def neighbors(self):
        """(idx, delta) arrays of shape (n, 4) for directions -x,+x,-y,+y:
        covering-leaf slot index (-1 = domain boundary) and level delta.
        Reference: ftt_cell_neighbor (src/ftt.h:432-530)."""
        lib = _lib()
        n = len(self.keys)
        if lib is not None:
            idx = np.zeros((n, 4), np.int64)
            delta = np.zeros((n, 4), np.int8)
            lib.neighbors_2d(_p64(self.keys), n, self.root[0], self.root[1],
                             _p64(idx), _p8(delta))
            return idx, delta
        return self._neighbors_py()

    def _neighbors_py(self):
        slot = {int(k): i for i, k in enumerate(self.keys)}
        lev, ix, iy = self.coords()
        n = len(self.keys)
        idx = np.full((n, 4), -1, np.int64)
        delta = np.zeros((n, 4), np.int8)
        dirs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        for i in range(n):
            l, x, y = int(lev[i]), int(ix[i]), int(iy[i])
            nx, ny = self.root[0] << l, self.root[1] << l
            for d, (dx, dy) in enumerate(dirs):
                qx, qy = x + dx, y + dy
                if not (0 <= qx < nx and 0 <= qy < ny):
                    continue
                k = int(make_key(l, morton_encode_2d([qx], [qy],
                                                     native=False)[0]))
                if k in slot:
                    idx[i, d] = slot[k]
                    continue
                if l > 0:
                    k = int(make_key(l - 1, morton_encode_2d(
                        [qx >> 1], [qy >> 1], native=False)[0]))
                    if k in slot:
                        idx[i, d] = slot[k]
                        delta[i, d] = -1
                        continue
                fx = 2 * qx + (1 if dx < 0 else 0)
                fy = 2 * qy + (1 if dy < 0 else 0)
                k = int(make_key(l + 1, morton_encode_2d([fx], [fy],
                                                         native=False)[0]))
                if k in slot:
                    idx[i, d] = slot[k]
                    delta[i, d] = 1
        return idx, delta
