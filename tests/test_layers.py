"""Multilayer Saint-Venant (GfsLayers) gates — reference: src/river.c
multilayer machinery + GfsLayers (:1401)."""
import numpy as np
import jax.numpy as jnp

from gerris_tpu.models import layers, river


def _per(n=32, nl=3, **kw):
    return layers.LayersConfig(shape=(n, n), nlayers=nl,
                               bcs=(("periodic", "periodic"),
                                    ("periodic", "periodic")), **kw)


def test_multilayer_lake_at_rest():
    n, nl = 32, 3
    cfg = layers.LayersConfig(shape=(n, n), nlayers=nl, g=9.81)
    x = (np.arange(n) + 0.5) / n - 0.5
    X, Y = np.meshgrid(x, x, indexing="ij")
    zb = 0.3 * np.exp(-((X / 0.15) ** 2 + (Y / 0.15) ** 2))
    P = np.maximum(0.0, 0.5 - zb)
    s = {"P": jnp.asarray(P), "U": jnp.zeros((nl, n, n)),
         "V": jnp.zeros((nl, n, n)), "Zb": jnp.asarray(zb)}
    dt = jnp.asarray(0.3 * cfg.dx / np.sqrt(9.81 * 0.5))
    for _ in range(10):
        s = layers.layers_step(s, dt, cfg)
    assert float(jnp.max(jnp.abs(s["U"]))) < 1e-12
    assert float(jnp.max(jnp.abs(s["P"] - P))) < 1e-12


def test_two_layer_matches_single_layer():
    """nu=0, identical per-layer initialization: the layer sum must
    evolve exactly like the single-layer solver (dam break)."""
    n, nl = 64, 2
    bcs = (("symmetry", "symmetry"), ("periodic", "periodic"))
    cfgM = layers.LayersConfig(shape=(n, 4), nlayers=nl, g=9.81, bcs=bcs)
    cfg1 = river.RiverConfig(shape=(n, 4), g=9.81, bcs=bcs)
    x = (np.arange(n) + 0.5) / n - 0.5
    P0 = np.where(x < 0.0, 1.0, 0.3)[:, None] * np.ones((1, 4))
    sM = {"P": jnp.asarray(P0), "U": jnp.zeros((nl, n, 4)),
          "V": jnp.zeros((nl, n, 4)), "Zb": jnp.zeros((n, 4))}
    s1 = {"P": jnp.asarray(P0), "U": jnp.zeros((n, 4)),
          "V": jnp.zeros((n, 4)), "Zb": jnp.zeros((n, 4))}
    dt = jnp.asarray(0.3 * cfg1.dx / np.sqrt(9.81))
    for _ in range(20):
        sM = layers.layers_step(sM, dt, cfgM)
        s1 = river.river_step(s1, dt, cfg1)
    assert float(jnp.max(jnp.abs(sM["P"] - s1["P"]))) < 1e-10
    assert float(jnp.max(jnp.abs(jnp.sum(sM["U"], 0) - s1["U"]))) < 1e-10
    # equal layers stay equal
    assert float(jnp.max(jnp.abs(sM["U"][0] - sM["U"][1]))) < 1e-12


def test_wind_driven_profile():
    """Steady wind-driven column: nu u'' = 0 with nu du/dz = nu*dut at
    the top and the Navier condition nu du/dz = k u at the bottom gives
    the linear profile u(z) = nu dut / k + dut z — the multilayer
    vertical diffusion must reproduce it per layer (reference:
    vertical_diffusion src/river.c:663-707)."""
    n, nl = 8, 4
    nu, k, dut, h0 = 0.02, 0.5, 1.0, 1.0
    cfg = _per(n=n, nl=nl, nu=nu, kbot=k, dut=dut)
    s = {"P": jnp.full((n, n), h0), "U": jnp.zeros((nl, n, n)),
         "V": jnp.zeros((nl, n, n)), "Zb": jnp.zeros((n, n))}
    dt = jnp.asarray(0.05)
    for _ in range(4000):
        s = layers.layers_step(s, dt, cfg)
    dz = np.asarray(cfg.dz)
    zc = (np.cumsum(dz) - dz / 2.0) * h0
    u_exact = nu * dut / k + dut * zc
    u_num = np.asarray(s["U"][:, n // 2, n // 2]) / (dz * h0)
    err = np.abs(u_num - u_exact) / np.abs(u_exact).max()
    assert err.max() < 0.05, (u_num, u_exact)
    # flow stays horizontally uniform
    assert float(jnp.std(s["U"][0])) < 1e-8 * float(jnp.max(
        jnp.abs(s["U"][0])) + 1e-30)
