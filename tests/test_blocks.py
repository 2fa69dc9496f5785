"""Native block-table runtime (C++ via ctypes) vs the pure-Python oracle
(reference: src/ftt.c tree bookkeeping + src/adaptive.c:998 reshape)."""
import numpy as np
import pytest

from gerris_tpu.core import blocks as B


def test_native_library_builds():
    assert B._lib() is not None, "native toolchain expected in this image"


def test_morton_roundtrip_native_vs_python():
    rng = np.random.default_rng(0)
    ix = rng.integers(0, 1 << 20, 1000)
    iy = rng.integers(0, 1 << 20, 1000)
    m_nat = B.morton_encode_2d(ix, iy)
    m_py = B.morton_encode_2d(ix, iy, native=False)
    assert np.array_equal(m_nat, m_py)
    dx, dy = B.morton_decode_2d(m_nat)
    assert np.array_equal(dx, ix) and np.array_equal(dy, iy)


def test_refine_coarsen_roundtrip():
    lay = B.BlockLayout.uniform(2)          # 4x4 blocks
    assert len(lay) == 16
    marks = np.zeros(16, np.int8)
    marks[0] = 1                            # refine one block
    lay2 = lay.apply_marks(marks)
    assert len(lay2) == 19                  # 16 - 1 + 4
    levs = B.key_level(lay2.keys)
    assert (levs == 3).sum() == 4
    # coarsen the 4 children back
    marks2 = np.where(levs == 3, -1, 0).astype(np.int8)
    lay3 = lay2.apply_marks(marks2)
    assert len(lay3) == 16
    assert np.array_equal(np.sort(lay3.keys), np.sort(lay.keys))


def test_partial_sibling_coarsen_keeps_blocks():
    lay = B.BlockLayout.uniform(2)
    marks = np.zeros(16, np.int8)
    marks[0] = 1
    lay2 = lay.apply_marks(marks)
    levs = B.key_level(lay2.keys)
    fine = np.where(levs == 3)[0]
    marks2 = np.zeros(len(lay2), np.int8)
    marks2[fine[0]] = -1                    # only ONE sibling wants out
    lay3 = lay2.apply_marks(marks2)
    assert len(lay3) == len(lay2)           # vetoed: nothing changes


def test_grading_fixpoint():
    """A deeply refined block forces intermediate levels on its neighbors
    (the reference's 2:1 corner grading, adaptive.c:1003-1009)."""
    lay = B.BlockLayout.uniform(1)          # 2x2
    # refine block 0 twice (level 1 -> 3)
    for _ in range(2):
        levs = B.key_level(lay.keys)
        ix, iy = B.morton_decode_2d(B.key_morton(lay.keys))
        marks = ((levs == levs.max()) & (ix == ix.min()) &
                 (iy == iy.min())).astype(np.int8)
        lay = lay.apply_marks(marks)
    graded = lay.grade()
    levs = B.key_level(graded.keys)
    # every neighbor pair differs by at most one level
    idx, delta = graded.neighbors()
    assert np.all(np.abs(delta) <= 1)
    # and grading is idempotent
    again = graded.grade()
    assert np.array_equal(again.keys, graded.keys)
    # python fallback agrees with the native library
    py = B.BlockLayout(lay.keys, lay.root)._grade_py()
    assert np.array_equal(np.sort(py), graded.keys)


def test_neighbors_uniform():
    lay = B.BlockLayout.uniform(2)
    idx, delta = lay.neighbors()
    assert np.all(delta == 0)
    levs, ix, iy = lay.coords()
    # -x neighbor of the leftmost column is the boundary
    assert np.all(idx[ix == 0, 0] == -1)
    # +x neighbor coordinates are correct
    inner = np.where(ix < 3)[0]
    for i in inner[:8]:
        j = idx[i, 1]
        assert ix[j] == ix[i] + 1 and iy[j] == iy[i]
    # native matches python oracle
    idx_py, delta_py = lay._neighbors_py()
    assert np.array_equal(idx, idx_py) and np.array_equal(delta, delta_py)
