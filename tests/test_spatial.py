"""Spatial domain decomposition tests (SURVEY.md §2b Communicator row):
the sharded cell-grid force with ppermute ghost planes must reproduce the
single-device packed force exactly, on the multi-device CPU mesh; the
mesh CV's FFT pipeline must give identical values under GSPMD sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metadyn_tpu.core.box import Box
from metadyn_tpu.ops.packed import PackedSpec, pack, packed_lj_force
from metadyn_tpu.parallel.spatial import make_sharded_lj_force


def _liquid(n, L, seed):
    rng = np.random.default_rng(seed)
    # blue-noise-ish: jittered grid avoids catastrophic overlaps
    g = int(np.ceil(n ** (1 / 3)))
    pts = np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"),
                   -1).reshape(-1, 3)[:n]
    pos = (pts + rng.uniform(0.2, 0.8, (n, 3))) * (L / g) - L / 2
    return pos.astype(np.float32)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_force_matches_single_device(n_dev):
    """2- and 4-device sharded forces == single-device forces, energy and
    virial to f32 exactness (the reference's DD ghost-exchange parity,
    SURVEY.md §4.5 fake-backend strategy)."""
    L = 8 * 3.0                      # cx = 8 divides 2 and 4
    n = 3000
    pos = _liquid(n, L, 0)
    box = Box.cubic(L)
    spec = PackedSpec.create(L, n, r_cut=2.5, skin=0.5, cap=24,
                             shift_energy=False)
    assert spec.cells_per_dim[0] % n_dev == 0
    st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n))
    assert not bool(ovf)

    ref = packed_lj_force(st, spec)

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("space",))
    force = make_sharded_lj_force(spec, mesh)
    out = jax.jit(force)(st)

    np.testing.assert_allclose(np.asarray(out.f), np.asarray(ref.f),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(out.potential_energy),
                               float(ref.potential_energy), rtol=1e-5)
    np.testing.assert_allclose(float(out.virial), float(ref.virial),
                               rtol=1e-5)


def test_sharded_force_seam_pairs():
    """Adversarial: particles straddling the periodic x seam and every
    shard boundary must see their cross-boundary neighbors."""
    L = 8 * 3.0
    box = Box.cubic(L)
    # pairs at x boundaries: one particle each side, 1.0 apart
    xs = []
    for b in range(8):
        xb = -L / 2 + b * 3.0       # cell boundary position
        xs += [[xb - 0.5, 0.0, 0.0], [xb + 0.5, 0.0, 0.0]]
    pos = np.asarray(xs, np.float32)
    # spread y so pairs don't interact with each other
    pos[:, 1] = np.repeat(np.linspace(-L / 2 + 1, L / 2 - 1, 8), 2)
    n = pos.shape[0]
    spec = PackedSpec.create(L, n, r_cut=2.5, skin=0.5, cap=8,
                             shift_energy=False)
    st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n))
    assert not bool(ovf)
    ref = packed_lj_force(st, spec)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("space",))
    out = jax.jit(make_sharded_lj_force(spec, mesh))(st)
    # every particle feels its partner (|F| > 0 for LJ at r=1)
    f_mag = np.linalg.norm(np.asarray(ref.f), axis=0)
    valid = np.asarray(st.pid) < n
    assert f_mag[valid].min() > 1.0
    np.testing.assert_allclose(np.asarray(out.f), np.asarray(ref.f),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(out.potential_energy),
                               float(ref.potential_energy), rtol=1e-5)


def test_mesh_cv_sharded_fft_matches():
    """The S(k) mesh CV under GSPMD sharding (particles sharded over
    devices, fftn parallelized by XLA-inserted collectives) == the
    single-device value (SURVEY.md §2b 'sharded FFT' row)."""
    from metadyn_tpu.cv.mesh import MeshOrderParameter
    from metadyn_tpu.core.state import make_state, make_system

    rng = np.random.default_rng(1)
    n, L = 4096, 20.0
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)
    system = make_system(n)
    cv = MeshOrderParameter.create((32, 32, 32), L, mode=[1.0],
                                   k0=2.0 * np.pi * 4 / L, width=0.5)
    state = make_state(pos, Box.cubic(L))
    v_ref = float(cv.value(state, system))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("space",))
    sh = NamedSharding(mesh, P("space"))
    pos_sharded = jax.device_put(jnp.asarray(pos), sh)
    state_sh = state.replace(pos=pos_sharded)
    v_sh = float(jax.jit(lambda st: cv.value(st, system))(state_sh))
    np.testing.assert_allclose(v_sh, v_ref, rtol=1e-5)
