"""Grid builder conformance: SAT binning, counting sort, bake ordering."""

import numpy as np

from zig_raytracing_contest_tpu.grid.builder import build_grid, sat_triangle_aabb


def random_soup(n, seed=0, lo=-2.0, hi=2.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(lo, hi, size=(n, 1, 3))
    offsets = rng.uniform(-0.4, 0.4, size=(n, 3, 3))
    return (centers + offsets).astype(np.float32)


def brute_force_cells(positions, grid):
    """Reference-style scalar binning: for every (cell, tri) pair run SAT."""
    res = grid.resolution
    cells = {}
    for ti, tri in enumerate(positions):
        lo = np.clip(
            ((tri.min(0) - grid.bbox_min) / grid.cell_size).astype(int), 0, res - 1
        )
        hi = np.clip(
            ((tri.max(0) - grid.bbox_min) / grid.cell_size).astype(int), 0, res - 1
        )
        for z in range(lo[2], hi[2] + 1):
            for y in range(lo[1], hi[1] + 1):
                for x in range(lo[0], hi[0] + 1):
                    cmin = grid.bbox_min + grid.cell_size * np.asarray([x, y, z], np.float32)
                    center = (cmin + grid.cell_size * 0.5).reshape(1, 3)
                    ext = (grid.cell_size * 0.5).reshape(1, 3)
                    if sat_triangle_aabb(tri[None], center, ext)[0]:
                        cells.setdefault((z * res[1] + y) * res[0] + x, []).append(ti)
    return cells


def test_matches_scalar_reference_binning():
    positions = random_soup(40)
    grid = build_grid(positions, (6, 6, 6))
    expected = brute_force_cells(positions, grid)
    num_cells = int(np.prod(grid.resolution))
    for c in range(num_cells):
        got = list(grid.dup_to_tri[grid.cell_begin[c] : grid.cell_end[c]])
        want = expected.get(c, [])
        assert got == want, f"cell {c}: {got} != {want}"


def test_per_cell_lists_in_triangle_order():
    positions = random_soup(60, seed=3)
    grid = build_grid(positions, (4, 4, 4))
    for c in range(int(np.prod(grid.resolution))):
        tris = grid.dup_to_tri[grid.cell_begin[c] : grid.cell_end[c]]
        assert np.all(np.diff(tris) > 0), "per-cell list must be tri-index sorted"


def test_bbox_covers_all_vertices():
    positions = random_soup(25, seed=7)
    grid = build_grid(positions, (5, 5, 5))
    verts = positions.reshape(-1, 3)
    np.testing.assert_allclose(grid.bbox_min, verts.min(0))
    np.testing.assert_allclose(grid.bbox_max, verts.max(0))


def test_stats_consistency():
    positions = random_soup(30, seed=11)
    grid = build_grid(positions, (4, 4, 4))
    counts = grid.cell_end - grid.cell_begin
    assert grid.stats["total_refs"] == int(counts.sum()) == len(grid.dup_to_tri)
    assert grid.stats["empty_cells"] == int((counts == 0).sum())
    assert grid.stats["max_tris"] == int(counts.max())
    # every triangle lands in at least one cell (it's inside the bbox)
    assert set(range(len(positions))) == set(grid.dup_to_tri.tolist())


def test_degenerate_triangle_does_not_separate():
    # Zero-area triangle: normalized edges are NaN; the reference's SAT
    # treats NaN projections as non-separating (src/linalg.zig:513).
    tri = np.zeros((1, 3, 3), np.float32)
    tri[0] = [[0.5, 0.5, 0.5]] * 3
    center = np.asarray([[0.5, 0.5, 0.5]], np.float32)
    ext = np.asarray([[0.5, 0.5, 0.5]], np.float32)
    assert bool(sat_triangle_aabb(tri, center, ext)[0])


def test_sat_rejects_separated_triangle():
    tri = np.asarray([[[5, 5, 5], [6, 5, 5], [5, 6, 5]]], np.float32)
    center = np.zeros((1, 3), np.float32)
    ext = np.full((1, 3), 0.5, np.float32)
    assert not bool(sat_triangle_aabb(tri, center, ext)[0])
