"""Native C++ grid builder vs the NumPy oracle: identical binning."""

import numpy as np
import pytest

from zig_raytracing_contest_tpu.grid.builder import build_grid
from zig_raytracing_contest_tpu.grid.native import build_grid_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native builder"
)


def random_soup(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, size=(n, 1, 3))
    offsets = rng.uniform(-0.5, 0.5, size=(n, 3, 3))
    return (centers + offsets).astype(np.float32)


@pytest.mark.parametrize("n,res", [(50, (6, 6, 6)), (400, (16, 16, 16)), (1, (4, 4, 4))])
def test_native_matches_numpy(n, res):
    positions = random_soup(n, seed=n)
    a = build_grid(positions, res)
    b = build_grid_native(positions, res)
    np.testing.assert_array_equal(a.bbox_min, b.bbox_min)
    np.testing.assert_array_equal(a.bbox_max, b.bbox_max)
    np.testing.assert_allclose(a.cell_size, b.cell_size, rtol=1e-7)
    np.testing.assert_array_equal(a.cell_begin, b.cell_begin)
    np.testing.assert_array_equal(a.cell_end, b.cell_end)
    np.testing.assert_array_equal(a.dup_to_tri, b.dup_to_tri)
    assert a.stats["total_refs"] == b.stats["total_refs"]


def test_degenerate_triangles():
    # Zero-area triangles: NaN SAT axes must bin (never separate) in both.
    positions = random_soup(10, seed=3)
    positions[4] = positions[4, 0]  # collapse to a point
    positions[7, 1] = positions[7, 0]  # collapse an edge
    a = build_grid(positions, (5, 5, 5))
    b = build_grid_native(positions, (5, 5, 5))
    np.testing.assert_array_equal(a.dup_to_tri, b.dup_to_tri)
    np.testing.assert_array_equal(a.cell_begin, b.cell_begin)
