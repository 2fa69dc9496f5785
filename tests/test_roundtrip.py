"""Config-layer round-trip: parse -> run -> write .gfs -> parse ->
resume (VERDICT r4 weak #7 / next #9).

The reference's OutputSimulation dumps are themselves runnable .gfs
files (src/output.c:1354-1564; every test case's end.gfs can be fed
back to gerris).  Our dump format: the original config text with an
``InitCheckpoint <sidecar.npz>`` directive injected — so every
directive goes through the parser twice and the state resumes
bit-exactly.
"""
import numpy as np
import pytest

from gerris_tpu.utils import gfs_config as G

SRC = """
1 0 GfsSimulation GfsBox GfsGEdge {} {
    Refine 5
    SourceViscosity 1e-2
    Init {} {
        U = 0.1*sin(2.*M_PI*x)*cos(2.*M_PI*y)
        V = -0.1*cos(2.*M_PI*x)*sin(2.*M_PI*y)
    }
    Time { iend = IEND }
    OutputSimulation { start = end } DUMP
}
GfsBox {}
"""


def test_gfs_text_roundtrip(tmp_path):
    dump = str(tmp_path / "end.gfs")
    sim = G.build_simulation(G.parse_gfs(
        SRC, {"IEND": "3", "DUMP": dump}, strict=True))
    sim.run()
    assert sim.time.i == 3

    text = open(dump).read()
    assert "InitCheckpoint" in text
    assert "SourceViscosity 1e-2" in text   # config survives verbatim

    # parse the dump back: every directive re-parses, state resumes
    sim2 = G.build_simulation(G.parse_gfs(text, {}, strict=True))
    assert sim2.errors == []
    assert sim2.time.i == 3
    for k in ("U", "V", "P"):
        np.testing.assert_array_equal(np.asarray(sim.state[k]),
                                      np.asarray(sim2.state[k]))

    # resumed run == uninterrupted run
    simc = G.build_simulation(G.parse_gfs(
        SRC, {"IEND": "5", "DUMP": str(tmp_path / "e2.gfs")},
        strict=True))
    simc.run()
    sim2.time.iend = 5
    sim2.run()
    for k in ("U", "V"):
        a, b = np.asarray(simc.state[k]), np.asarray(sim2.state[k])
        assert np.max(np.abs(a - b)) < 1e-12, k


def test_roundtrip_twice_idempotent(tmp_path):
    """A dump of a dump parses too (InitCheckpoint is replaced, not
    accumulated)."""
    d1 = str(tmp_path / "d1.gfs")
    sim = G.build_simulation(G.parse_gfs(
        SRC, {"IEND": "1", "DUMP": d1}, strict=True))
    sim.run()
    text1 = open(d1).read()
    sim2 = G.build_simulation(G.parse_gfs(text1, {}, strict=True))
    d2 = str(tmp_path / "d2.gfs")
    from gerris_tpu.events.outputs import save_checkpoint
    save_checkpoint(d2, sim2)
    text2 = open(d2).read()
    assert text2.count("InitCheckpoint") == 1
    sim3 = G.build_simulation(G.parse_gfs(text2, {}, strict=True))
    np.testing.assert_array_equal(np.asarray(sim2.state["U"]),
                                  np.asarray(sim3.state["U"]))
