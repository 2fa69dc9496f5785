"""tools/ layer (reference: tools/gfscompare.c, SURVEY.md §2.4)."""
import subprocess
import sys

import numpy as np


def test_gfscompare(tmp_path):
    a = {"U": np.ones((8, 8)), "P": np.zeros((8, 8))}
    b = {"U": np.ones((8, 8)) * 1.5, "P": np.zeros((8, 8)) + 3.0}
    np.savez(tmp_path / "a.npz", __meta__="{}", **a)
    np.savez(tmp_path / "b.npz", __meta__="{}", **b)
    sys.path.insert(0, "tools")
    import gfscompare

    res = gfscompare.compare(str(tmp_path / "a.npz"), str(tmp_path / "b.npz"))
    assert abs(res["U"]["infty"] - 0.5) < 1e-14
    assert abs(res["P"]["second"] - 3.0) < 1e-14
    # -C constant adjustment zeroes a uniform offset
    res = gfscompare.compare(str(tmp_path / "a.npz"), str(tmp_path / "b.npz"),
                             adjust=True)
    assert res["P"]["infty"] < 1e-14
    # CLI entry
    out = subprocess.run([sys.executable, "tools/gfscompare.py",
                          str(tmp_path / "a.npz"), str(tmp_path / "b.npz"),
                          "--json"], capture_output=True, text=True)
    assert out.returncode == 0 and '"U"' in out.stdout
