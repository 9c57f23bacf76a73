"""Ports of the reference's grid/DDA unit tests — exact cell walks.

The four traceRay tests (src/linalg.zig:583-681) are the conformance spec for
the traversal kernel: exact cell sequences and crossing t's, including the
tie-break behavior on diagonal rays and the inf at grid exit.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zig_raytracing_contest_tpu.ops import dda

INF = float("inf")


def make_grid_5():
    return dda.make_grid([0, 0, 0], [5, 5, 5], [5, 5, 5])


def setup_single(grid, orig, direction):
    orig = jnp.asarray([orig], jnp.float32)
    d = jnp.asarray([direction], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    entered, state = dda.dda_setup(grid, orig, d)
    assert bool(entered[0])
    return state


def walk(grid, orig, direction, n):
    """Return (cells_visited, crossing_ts) for n next() calls."""
    state = setup_single(grid, orig, direction)
    cells = [tuple(np.asarray(state.cell[0]))]
    ts = []
    for _ in range(n):
        t, state = dda.dda_next(state)
        ts.append(float(t[0]))
        cells.append(tuple(np.asarray(state.cell[0])))
    return cells, ts


def test_grid_cell_bbox_math():
    # reference: "grid getCellBbox" src/linalg.zig:571-581
    grid = make_grid_5()
    cell = jnp.asarray([0, 1, 4], jnp.int32)
    lo = grid.bbox_min + grid.cell_size * cell.astype(jnp.float32)
    hi = lo + grid.cell_size
    np.testing.assert_allclose(np.asarray(lo), [0, 1, 4])
    np.testing.assert_allclose(np.asarray(hi), [1, 2, 5])


def test_linearize_is_x_fastest_z_major():
    # src/linalg.zig:429-431
    grid = make_grid_5()
    c = jnp.asarray([[1, 2, 3]], jnp.int32)
    assert int(dda.linearize_cell_idx(grid, c)[0]) == 3 * 25 + 2 * 5 + 1


def test_trace_ray_1_oblique():
    # reference: "grid traceRay 1" src/linalg.zig:583-607
    cells, ts = walk(make_grid_5(), (0.5, 0.5, 0.5), (2, 1, 0), 7)
    assert cells[0] == (0, 0, 0)
    expected = [
        ((1, 0, 0), 0.559017002),
        ((1, 1, 0), 1.11803400),
        ((2, 1, 0), 1.67705106),
        ((3, 1, 0), 2.79508495),
        ((3, 2, 0), 3.35410213),
        ((4, 2, 0), 3.91311883),
    ]
    for i, (cell, t) in enumerate(expected):
        assert ts[i] == pytest.approx(t, abs=1e-4)
        assert cells[i + 1] == cell
    assert ts[6] == INF


def test_trace_ray_2_entering_from_outside_negative_dir():
    # reference: "grid traceRay 2" src/linalg.zig:609-629
    cells, ts = walk(make_grid_5(), (0.5, 10.0, 0.5), (0, -1, 0), 5)
    assert cells[0] == (0, 4, 0)
    for i, (y, t) in enumerate([(3, 6), (2, 7), (1, 8), (0, 9)]):
        assert ts[i] == pytest.approx(t, abs=1e-4)
        assert cells[i + 1] == (0, y, 0)
    assert ts[4] == INF
    # once finished, stays finished
    state = setup_single(make_grid_5(), (0.5, 10.0, 0.5), (0, -1, 0))
    for _ in range(6):
        t, state = dda.dda_next(state)
    assert float(t[0]) == INF


def test_trace_ray_3_entering_from_outside_positive_dir():
    # reference: "grid traceRay 3" src/linalg.zig:631-651
    cells, ts = walk(make_grid_5(), (0.5, -5.0, 0.5), (0, 1, 0), 5)
    assert cells[0] == (0, 0, 0)
    for i, (y, t) in enumerate([(1, 6), (2, 7), (3, 8), (4, 9)]):
        assert ts[i] == pytest.approx(t, abs=1e-4)
        assert cells[i + 1] == (0, y, 0)
    assert ts[4] == INF


def test_trace_ray_4_diagonal_tie_break():
    # reference: "grid traceRay 4" src/linalg.zig:653-681
    # Ray exactly on cell diagonals: ties must resolve y-axis first, then x,
    # per the comparison-mask lookup table (src/linalg.zig:483).
    cells, ts = walk(make_grid_5(), (0.5, 0.5, 0.5), (1, 1, 0), 9)
    assert cells[0] == (0, 0, 0)
    expected = [
        ((0, 1, 0), 0.707106769),
        ((1, 1, 0), 0.707106769),
        ((1, 2, 0), 2.12132024),
        ((2, 2, 0), 2.12132024),
        ((2, 3, 0), 3.53553390),
        ((3, 3, 0), 3.53553390),
        ((3, 4, 0), 4.94974756),
        ((4, 4, 0), 4.94974756),
    ]
    for i, (cell, t) in enumerate(expected):
        assert ts[i] == pytest.approx(t, abs=1e-4)
        assert cells[i + 1] == cell
    assert ts[8] == INF


def test_setup_miss():
    grid = make_grid_5()
    entered, _ = dda.dda_setup(
        grid,
        jnp.asarray([[10.0, 10.0, 10.0]], jnp.float32),
        jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
    )
    assert not bool(entered[0])


def test_inactive_rays_hold_state():
    grid = make_grid_5()
    orig = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]], jnp.float32)
    d = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]], jnp.float32)
    _, state = dda.dda_setup(grid, orig, d)
    t, new_state = dda.dda_next(state, active=jnp.asarray([True, False]))
    assert float(t[1]) == INF
    np.testing.assert_array_equal(
        np.asarray(new_state.cell[1]), np.asarray(state.cell[1])
    )
    assert float(t[0]) == pytest.approx(0.5, abs=1e-5)
    assert tuple(np.asarray(new_state.cell[0])) == (1, 0, 0)
