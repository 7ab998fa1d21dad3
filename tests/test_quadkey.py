"""Adaptive quadtree (S2-style) cell index — tiling/quadkey.py."""

import numpy as np

from geofileops_ray.tiling.quadkey import (
    pack_quadkey,
    quadkey_ancestors,
    quadkey_of_bbox,
)

WORLD = (0.0, 0.0, 1024.0, 1024.0)


def test_point_like_bbox_is_leaf():
    b = np.array([[3.0, 5.0, 3.1, 5.1]])
    level, qx, qy = quadkey_of_bbox(b, WORLD, max_level=10)
    assert level[0] == 10  # finest
    assert qx[0] == 3 and qy[0] == 5  # 1024/2**10 = 1 unit per leaf


def test_world_spanning_bbox_is_root():
    b = np.array([[1.0, 1.0, 1023.0, 1023.0]])
    level, qx, qy = quadkey_of_bbox(b, WORLD, max_level=10)
    assert level[0] == 0 and qx[0] == 0 and qy[0] == 0


def test_smallest_containing_cell():
    # bbox inside [256,512)x[0,256) quadrant but straddling its children
    b = np.array([[300.0, 100.0, 400.0, 200.0]])
    level, qx, qy = quadkey_of_bbox(b, WORLD, max_level=10)
    size = 1024.0 / (1 << level[0])
    assert qx[0] * size <= 300.0 and (qx[0] + 1) * size >= 400.0
    assert qy[0] * size <= 100.0 and (qy[0] + 1) * size >= 200.0
    # and the child cell at level+1 would NOT contain it (minimality)
    csize = size / 2
    cx0, cy0 = 300.0 // csize, 100.0 // csize
    assert 400.0 // csize != cx0 or 200.0 // csize != cy0


def test_straddling_center_is_coarse():
    # tiny bbox straddling the world center -> root cell
    b = np.array([[511.9, 511.9, 512.1, 512.1]])
    level, _, _ = quadkey_of_bbox(b, WORLD, max_level=10)
    assert level[0] == 0


def test_pack_is_injective_across_levels():
    rng = np.random.default_rng(7)
    n = 5000
    level = rng.integers(0, 13, n)
    qx = np.array([rng.integers(0, 1 << l) for l in level], dtype=np.int64)
    qy = np.array([rng.integers(0, 1 << l) for l in level], dtype=np.int64)
    keys = pack_quadkey(level.astype(np.int64), qx, qy)
    seen = {}
    for k, t in zip(keys, zip(level, qx, qy)):
        if k in seen:
            assert seen[k] == t
        seen[k] = t


def test_ancestor_chain():
    b = np.array([[3.0, 5.0, 3.5, 5.5]])
    level, qx, qy = quadkey_of_bbox(b, WORLD, max_level=4)
    chain = quadkey_ancestors(level, qx, qy)
    assert chain[0][0][0] == level[0]
    assert chain[-1][0][0] == 0 and chain[-1][1][0] == 0
    for (l1, x1, y1), (l0, x0, y0) in zip(chain[1:], chain[:-1]):
        if l0[0] > 0:
            assert l1[0] == l0[0] - 1
            assert x1[0] == x0[0] >> 1 and y1[0] == y0[0] >> 1
