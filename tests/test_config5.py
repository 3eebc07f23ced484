"""Config 5 shape (BASELINE.json:11): flux-tempered MTD on a block-copolymer
melt with the packed engine + distance-triggered repack (small CPU slice;
the 1M-particle scale run is exercised on TPU — see bench notes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_system
from metadyn_tpu.core.packed_engine import PackedEngine
from metadyn_tpu.ops.packed import PackedSpec, bond_partner_attrs
from metadyn_tpu.cv.packed import PackedMesh
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.flux_sampler import FluxTemperedSampler
from metadyn_tpu.integrate.packed import make_packed_langevin_step

from tests.test_packed_bonds import _relaxed_melt
from tests.test_config2 import _diblock_types


def test_config5_flux_tempered_packed_melt():
    n_chains, chain_len = 20, 10  # shared cached fixture
    pos, bonds, _ = _relaxed_melt(n_chains=n_chains, chain_len=chain_len,
                                  L=12.0, seed=0)
    n = pos.shape[0]
    L = 12.0
    box = Box.cubic(L)
    types = _diblock_types(n_chains, chain_len)
    coef = np.asarray([1.0, -1.0], np.float32)[types]
    system = make_system(n, types=types, bonds=bonds)
    spec = PackedSpec.create(L, n, r_cut=2 ** (1 / 6), skin=0.5, cap=16,
                             fene_k=30.0, fene_r0=1.5)
    engine = PackedEngine(spec, use_pallas=False)
    cv = PackedMesh.create((12, 12, 12), L, n_real=n, k0=2 * np.pi / L,
                           width=0.3)
    st, ovf = engine.pack_state(
        pos, box, jnp.asarray(types), eps_i=jnp.ones(n), sigma_i=jnp.ones(n),
        extra_attrs={**bond_partner_attrs(bonds, n), cv.attr_name: coef})
    assert not bool(ovf)
    s0 = float(cv.value(st, system))
    s = FluxTemperedSampler(
        system, st, engine, cvs=[cv],
        grid_spec=GridSpec.create([0.0], [max(6.0 * s0, 10.0)], [51],
                                  [max(6.0 * s0, 10.0) / 25]),
        integrator_factory=lambda f: make_packed_langevin_step(
            f, dt=0.003, kT=1.0, gamma=1.0),
        kT=1.0, stride=25, update_period=4, seed=0,
    )
    out = s.run(100)  # 1 bias update
    assert s.n_updates == 1
    assert np.all(np.isfinite(np.asarray(s.bias.grid.V)))
    assert np.asarray(s.bias.grid.V).max() > 0  # histogram → bias happened
    m = out[-1]
    assert np.all(np.isfinite(np.asarray(m["cv"])))
    assert not np.any(np.asarray(m["nlist_overflow"]))
