"""Bias-grid unit tests: deposit math, interpolation, derivative fidelity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.bias.grid import (
    GridSpec, BiasGrid, deposit_hill, interp, value_and_grad, grad_fd,
)
from metadyn_tpu.bias.metad import (
    HillSpec, BiasState, deposit, hill_height, free_energy,
    STANDARD, WELL_TEMPERED,
)
from metadyn_tpu.io.grid_file import dump_grid, load_grid
from metadyn_tpu.io.hill_log import read_hills, fes_from_hills


def _analytic_V(centers, heights, sigma, x):
    """Direct hill sum at points x — grid-free ground truth."""
    V = np.zeros_like(x)
    for c, h in zip(centers, heights):
        V += h * np.exp(-0.5 * ((x - c) / sigma) ** 2)
    return V


def test_deposit_matches_analytic_1d():
    spec = GridSpec.create([-2.0], [2.0], [201], [0.25])
    grid = BiasGrid.zeros(spec)
    centers = [0.3, -0.7, 0.31]
    for c in centers:
        grid = deposit_hill(grid, jnp.asarray([c]), jnp.float32(1.0))
    x = np.asarray(spec.axis_coords(0))
    np.testing.assert_allclose(
        np.asarray(grid.V), _analytic_V(centers, [1.0] * 3, 0.25, x), rtol=1e-5, atol=1e-6)


def test_interp_and_grad_vs_analytic():
    spec = GridSpec.create([-2.0], [2.0], [401], [0.3])
    grid = BiasGrid.zeros(spec)
    grid = deposit_hill(grid, jnp.asarray([0.2]), jnp.float32(1.5))
    for s in [-1.234, 0.0, 0.777, 1.99]:
        V, dV = value_and_grad(
            BiasGrid(spec=spec, V=grid.V, dV=grid.dV), jnp.asarray([s]))
        V_true = 1.5 * np.exp(-0.5 * ((s - 0.2) / 0.3) ** 2)
        dV_true = V_true * -(s - 0.2) / 0.3**2
        np.testing.assert_allclose(V, V_true, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(dV[0], dV_true, rtol=1e-3, atol=1e-3)
        # analytic-derivative grids vs FD-of-interpolant cross-check
        fd = grad_fd(grid, jnp.asarray([s]))
        np.testing.assert_allclose(dV[0], fd[0], rtol=0.05, atol=5e-3)


def test_deposit_2d_separable():
    spec = GridSpec.create([-1.0, 0.0], [1.0, 2.0], [41, 81], [0.2, 0.4])
    grid = deposit_hill(BiasGrid.zeros(spec), jnp.asarray([0.1, 1.3]), jnp.float32(2.0))
    x = np.asarray(spec.axis_coords(0))
    y = np.asarray(spec.axis_coords(1))
    expect = 2.0 * np.exp(-0.5 * ((x[:, None] - 0.1) / 0.2) ** 2) \
                 * np.exp(-0.5 * ((y[None, :] - 1.3) / 0.4) ** 2)
    np.testing.assert_allclose(np.asarray(grid.V), expect, rtol=1e-5, atol=1e-6)
    # interpolate at an off-grid point
    V, dV = value_and_grad(grid, jnp.asarray([0.05, 0.95]))
    Vt = 2.0 * np.exp(-0.5 * ((0.05 - 0.1) / 0.2) ** 2) * np.exp(-0.5 * ((0.95 - 1.3) / 0.4) ** 2)
    np.testing.assert_allclose(V, Vt, rtol=2e-3)


def test_periodic_dimension_wraps():
    spec = GridSpec.create([-np.pi], [np.pi], [120], [0.4], periodic=[True])
    grid = deposit_hill(BiasGrid.zeros(spec), jnp.asarray([np.pi - 0.05]), jnp.float32(1.0))
    # hill mass must wrap around to the other end of the axis
    V_left, _ = value_and_grad(grid, jnp.asarray([-np.pi + 0.05]))
    assert float(V_left) > 0.9, float(V_left)
    # interpolation across the seam is continuous
    V_a, _ = value_and_grad(grid, jnp.asarray([np.pi - 1e-4]))
    V_b, _ = value_and_grad(grid, jnp.asarray([-np.pi + 1e-4]))
    np.testing.assert_allclose(V_a, V_b, rtol=1e-3)


def test_out_of_range_clamps_not_nan():
    spec = GridSpec.create([0.0], [1.0], [11], [0.1])
    grid = deposit_hill(BiasGrid.zeros(spec), jnp.asarray([0.5]), jnp.float32(1.0))
    for s in [-5.0, 7.7]:
        V, dV = value_and_grad(grid, jnp.asarray([s]))
        assert np.isfinite(float(V)) and np.isfinite(float(dV[0]))


def test_well_tempered_height_decays():
    spec = GridSpec.create([-1.0], [1.0], [101], [0.2])
    hills = HillSpec.create(W=1.0, stride=10, mode=WELL_TEMPERED, deltaT=2.0)
    bias = BiasState.zeros(spec)
    s = jnp.asarray([0.0])
    h0 = float(hill_height(hills, bias, s))
    bias, rec = deposit(hills, bias, s, jnp.int32(10))
    h1 = float(hill_height(hills, bias, s))
    assert h0 == pytest.approx(1.0)
    assert h1 == pytest.approx(np.exp(-1.0 / 2.0), rel=1e-3)  # V(0)=1 after 1 hill
    assert int(bias.n_hills) == 1


def test_wt_fes_estimator_scaling():
    spec = GridSpec.create([-1.0], [1.0], [101], [0.2])
    hills = HillSpec.create(W=0.5, stride=10, mode=WELL_TEMPERED, deltaT=3.0)
    bias = BiasState.zeros(spec)
    bias, _ = deposit(hills, bias, jnp.asarray([0.0]), jnp.int32(0))
    F = free_energy(hills, bias, kT=jnp.float32(1.0))
    # F = -(T+dT)/dT V, min-shifted; peak-to-valley = (4/3)*0.5
    np.testing.assert_allclose(float(jnp.max(F)), (1.0 + 3.0) / 3.0 * 0.5, rtol=1e-3)


def test_grid_dump_load_roundtrip(tmp_path):
    spec = GridSpec.create([-1.0, -2.0], [1.0, 2.0], [21, 31], [0.1, 0.2],
                           periodic=[False, True])
    bias = BiasState.zeros(spec)
    bias, _ = deposit(HillSpec.create(W=1.0, stride=1), bias,
                      jnp.asarray([0.3, 0.5]), jnp.int32(5))
    p = str(tmp_path / "grid.npz")
    dump_grid(p, bias, mode="well_tempered", deltaT=4.0)
    loaded, meta = load_grid(p)
    np.testing.assert_array_equal(np.asarray(loaded.grid.V), np.asarray(bias.grid.V))
    np.testing.assert_array_equal(np.asarray(loaded.grid.dV), np.asarray(bias.grid.dV))
    assert loaded.grid.spec.shape == (21, 31)
    assert loaded.grid.spec.periodic == (False, True)
    assert int(loaded.n_hills) == 1
    assert meta == {"mode": "well_tempered", "deltaT": 4.0}
