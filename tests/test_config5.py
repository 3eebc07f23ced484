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


@pytest.mark.smoke
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
        min_round_trips=0,   # scale smoke: ungated legacy cadence
    )
    out = s.run(100)  # 1 bias update
    assert s.n_updates == 1
    assert np.all(np.isfinite(np.asarray(s.bias.grid.V)))
    assert np.asarray(s.bias.grid.V).max() > 0  # histogram → bias happened
    m = out[-1]
    assert np.all(np.isfinite(np.asarray(m["cv"])))
    assert not np.any(np.asarray(m["nlist_overflow"]))


@pytest.mark.slow
def test_config5_sharded_million_particle_smoke():
    """Config 5 at SCALE on the multi-chip axis (VERDICT r2 missing #3):
    flux-tempered MTD on a 1,048,576-bead diblock melt, spatially sharded
    over the 8-device mesh — SpatialPackedEngine (ghost-plane LJ+FENE,
    sharded migration) + ShardedPackedMesh S(k) CV (halo CIC, slab FFT
    with all-to-all transpose) under the unmodified FluxTemperedSampler.

    The initial melt is a rod lattice (straight FENE chains at the bond
    minimum, no overlaps), so WCA+FENE is stable from step 0 with no
    push-off phase — this is a SCALE/integration smoke, not a physics
    oracle (tests/test_config5.py above covers the physics at small N).
    """
    from jax.sharding import Mesh
    from metadyn_tpu.parallel.spatial import SpatialPackedEngine
    from metadyn_tpu.parallel.mesh import ShardedPackedMesh

    assert jax.device_count() == 8
    # 8 x 128 x 128 rods of 8 beads = 1,048,576 beads; L chosen so the
    # cell grid (floor(L/1.6225) = 80) is divisible by the 8 shards
    L = 130.0
    chain_len = 8
    nx_r, nyz = 8, 128
    b0 = 0.97
    xs = (np.arange(nx_r) + 0.1) * (L / nx_r)
    ys = (np.arange(nyz) + 0.5) * (L / nyz)
    ox, oy, oz = np.meshgrid(xs, ys, ys, indexing="ij")
    origins = np.stack([ox, oy, oz], -1).reshape(-1, 3)       # (131072, 3)
    beads = origins[:, None, :] + np.stack(
        [np.arange(chain_len) * b0, np.zeros(chain_len),
         np.zeros(chain_len)], -1)
    pos = (beads.reshape(-1, 3) - L / 2).astype(np.float32)
    n = pos.shape[0]
    assert n == 1_048_576
    base = np.arange(0, n, chain_len)[:, None] + np.arange(chain_len - 1)
    bonds = np.stack([base.reshape(-1), base.reshape(-1) + 1], 1)
    types = np.where(np.arange(n) % chain_len < chain_len // 2, 0, 1)
    coef = np.asarray([1.0, -1.0], np.float32)[types]

    box = Box.cubic(L)
    system = make_system(n)
    spec = PackedSpec.create(L, n, r_cut=2 ** (1 / 6), skin=0.5, cap=10,
                             fene_k=30.0, fene_r0=1.5)
    assert spec.cells_per_dim[0] % 8 == 0
    mesh = Mesh(np.asarray(jax.devices()), ("space",))
    engine = SpatialPackedEngine(spec, mesh, rebuild_every=5)
    cv = ShardedPackedMesh.create((32, 32, 32), spec, mesh, n_real=n,
                                  k0=2 * np.pi * 4 / L, width=0.4, box_L=L)
    rng = np.random.default_rng(0)
    vel = rng.normal(0.0, 1.0, (n, 3)).astype(np.float32)
    vel -= vel.mean(0)
    st, ovf = engine.pack_state(
        pos, box, jnp.asarray(types), eps_i=jnp.ones(n), sigma_i=jnp.ones(n),
        vel=jnp.asarray(vel),
        extra_attrs={**bond_partner_attrs(bonds, n), cv.attr_name: coef})
    assert not bool(ovf)

    s0 = float(jax.jit(lambda s: cv.value(s, system))(st))
    hi = max(8.0 * s0, 20.0)
    s = FluxTemperedSampler(
        system, st, engine, cvs=[cv],
        grid_spec=GridSpec.create([0.0], [hi], [41], [hi / 20]),
        integrator_factory=lambda f: make_packed_langevin_step(
            f, dt=0.003, kT=1.0, gamma=1.0),
        kT=1.0, stride=10, update_period=2, seed=0,
        min_round_trips=0,   # scale smoke: ungated legacy cadence
    )
    out = s.run(40)  # 2 flux bias updates over the full sharded step loop
    assert s.n_updates == 2
    V = np.asarray(s.bias.grid.V)
    assert np.all(np.isfinite(V)) and V.max() > 0.0
    m = out[-1]
    assert np.all(np.isfinite(np.asarray(m["cv"])))
    assert not np.any(np.asarray(m["nlist_overflow"]))
    assert np.all(np.isfinite(np.asarray(m["potential_energy"])))
