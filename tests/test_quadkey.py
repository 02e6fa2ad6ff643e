import numpy as np

from pythongis_spark.index import quadkey as Q


def test_morton_roundtrip():
    tx = np.array([0, 1, 2, 1023, 12345], dtype=np.int64)
    ty = np.array([0, 2, 1, 511, 54321], dtype=np.int64)
    code = Q.morton_encode(tx, ty)
    rx, ry = Q.morton_decode(code)
    assert rx.tolist() == tx.tolist()
    assert ry.tolist() == ty.tolist()


def test_morton_order():
    # (0,0)->0 (1,0)->1 (0,1)->2 (1,1)->3
    assert Q.morton_encode(np.array([0, 1, 0, 1]), np.array([0, 0, 1, 1])).tolist() == [
        0,
        1,
        2,
        3,
    ]


def test_cell_of_points_corners():
    z = 3
    n = 1 << z
    # lon near -180, lat near +90 -> cell 0
    assert Q.cell_of_points(np.array([-179.9]), np.array([89.9]), z)[0] == 0
    # lon near +180, lat near -90 -> last cell
    last = Q.cell_of_points(np.array([179.9]), np.array([-89.9]), z)[0]
    assert last == Q.morton_encode(np.array([n - 1]), np.array([n - 1]))[0]


def test_cell_bounds_contains_point():
    z = 6
    lon, lat = np.array([12.34]), np.array([45.67])
    cell = Q.cell_of_points(lon, lat, z)[0]
    xmin, ymin, xmax, ymax = Q.cell_bounds(int(cell), z)
    assert xmin <= lon[0] < xmax
    assert ymin < lat[0] <= ymax


def test_cells_of_bbox_cover():
    z = 4
    cells = Q.cells_of_bbox(-10.0, -10.0, 10.0, 10.0, z)
    # every point cell inside the bbox must be in the cover set
    pts_lon = np.linspace(-9.9, 9.9, 25)
    pts_lat = np.linspace(-9.9, 9.9, 25)
    gx, gy = np.meshgrid(pts_lon, pts_lat)
    pc = Q.cell_of_points(gx.ravel(), gy.ravel(), z)
    assert set(pc.tolist()) <= set(cells.tolist())


def test_quadkey_str_matches_cell():
    z = 5
    cells = Q.cell_of_points(np.array([10.0, -120.0]), np.array([50.0, -30.0]), z)
    qks = Q.quadkey_str(cells, z)
    assert [int(q, 4) for q in qks] == cells.tolist()
    assert all(len(q) == z for q in qks)


def test_parent_cell_is_prefix():
    z = 8
    cell = Q.cell_of_points(np.array([33.3]), np.array([44.4]), z)
    parent = Q.parent_cell(cell, z, z - 2)
    qk = Q.quadkey_str(cell, z)[0]
    qkp = Q.quadkey_str(parent, z - 2)[0]
    assert qk.startswith(qkp)


def test_neighbors_and_rings():
    z = 5
    cell = int(Q.cell_of_points(np.array([0.1]), np.array([0.1]), z)[0])
    nb = Q.neighbors(cell, z, 1)
    assert len(nb) == 9 and cell in nb.tolist()
    r1 = Q.ring_cells(cell, z, 1)
    assert len(r1) == 8 and cell not in r1.tolist()
    assert set(r1.tolist()) | {cell} == set(nb.tolist())


def test_pick_level():
    # huge bboxes -> coarse level; tiny -> fine
    z_big = Q.pick_level_for_bbox(np.array([90.0]), np.array([45.0]))
    z_small = Q.pick_level_for_bbox(np.array([0.01]), np.array([0.01]))
    assert z_big < z_small
    assert 0 <= z_big <= Q.MAX_LEVEL and z_small <= Q.MAX_LEVEL
