#!/usr/bin/env python3
"""Golden-fixture harness for the reference kernels (see FIXTURES.md §A).

Runs /root/reference's pure-numpy kernels WITHOUT dask by stubbing the
dask modules and simulating map_blocks / map_overlap(depth, boundary=0,
trim=False) semantics. Verified facts it reproduces (SURVEY.md):
  - stitch input-chunk contract: blocksize + 2*overlap per axis
  - stitch output chunks: exactly blocksize; constant-1 tiles -> 1.0 (exact)
  - merge_neighbors seam weight-sums (4/3)^d (1.333/1.778/2.370), asymmetric
Usage: python3 tools/reference_probe.py  (prints PASS/FAIL summary)
"""
import sys, types
import numpy as np
from itertools import product

# --- stub dask so the reference modules import (kernels don't use it) ---
dask = types.ModuleType('dask'); sys.modules['dask'] = dask
arr = types.ModuleType('dask.array'); sys.modules['dask.array'] = arr
dly = types.ModuleType('dask.delayed'); dly.delayed = lambda x: x
sys.modules['dask.delayed'] = dly
for name in ('map_blocks', 'map_overlap', 'meshgrid', 'stack', 'rechunk'):
    setattr(arr, name, lambda *a, **k: (_ for _ in ()).throw(NotImplementedError))
sys.path.insert(0, '/root/reference')
from dask_stitch.stitch import weight_block, merge_overlaps  # noqa: E402
from dask_stitch.local_affine import merge_neighbors  # noqa: E402


def simulate_stitch(tiles, grid, blocksize, overlap):
    """tiles: {idx: ndarray of shape blocksize+2*overlap}. Returns stitched full array."""
    bs, o = np.asarray(blocksize), np.asarray(overlap)
    cs = bs + 2 * o
    weighted = {}
    for idx in product(*[range(g) for g in grid]):
        bi = {0: {'chunk-location': idx, 'num-chunks': grid}}
        weighted[idx] = weight_block(tiles[idx].astype(np.float32),
                                     tuple(bs), tuple(o), block_info=bi)
    full = np.zeros(tuple(bs * np.asarray(grid)), dtype=np.float32)
    for idx in product(*[range(g) for g in grid]):
        ext = np.zeros(tuple(cs + 2 * o), dtype=np.float32)  # boundary=0.
        for noff in product([-1, 0, 1], repeat=3):
            nidx = tuple(np.asarray(idx) + noff)
            if any(n < 0 or n >= g for n, g in zip(nidx, grid)):
                continue
            src, dst = [], []
            for ax in range(3):
                if noff[ax] == -1:
                    src.append(slice(cs[ax] - o[ax], cs[ax])); dst.append(slice(0, o[ax]))
                elif noff[ax] == 1:
                    src.append(slice(0, o[ax])); dst.append(slice(cs[ax] + o[ax], cs[ax] + 2 * o[ax]))
                else:
                    src.append(slice(0, cs[ax])); dst.append(slice(o[ax], o[ax] + cs[ax]))
            ext[tuple(dst)] = weighted[nidx][tuple(src)]
        out = merge_overlaps(ext, tuple(o))
        full[tuple(slice(i * s, (i + 1) * s) for i, s in zip(idx, bs))] = out
    return full


def simulate_affine_field(affines, spacing, blocksize, overlap, displacement):
    """Returns full (padded-domain) field; crop to `shape` is a plain slice."""
    bs = np.asarray(blocksize)
    grid_dims = affines.shape[:3]
    full = np.zeros(tuple(bs * np.asarray(grid_dims)) + (3,), dtype=np.float32)
    for idx in product(*[range(g) for g in grid_dims]):
        start = np.asarray(idx) * bs
        gridc = np.stack(np.meshgrid(*[np.arange(s, s + b) for s, b in zip(start, bs)],
                                     indexing='ij'), axis=-1).astype(np.float32)
        gridc *= spacing.astype(np.float32)
        bi = {0: {'chunk-location': idx, 'num-chunks': grid_dims}}
        r = merge_neighbors(gridc, affines, tuple(overlap), displacement, block_info=bi)
        full[tuple(slice(i * s, (i + 1) * s) for i, s in zip(idx, bs))] = r
    return full


if __name__ == '__main__':
    ok = True
    bs, o, grid = np.array([8, 9, 10]), np.array([2, 3, 2]), (3, 2, 3)
    cs = tuple(bs + 2 * o)
    tiles = {i: np.ones(cs, np.float32) for i in product(*[range(g) for g in grid])}
    f = simulate_stitch(tiles, grid, bs, o)
    p = np.allclose(f, 1.0, atol=1e-4); ok &= p
    print('partition-of-unity (stitch):', 'PASS' if p else 'FAIL', f.min(), f.max())

    affines = np.tile(np.eye(4)[None, None, None], (2, 2, 2, 1, 1))
    d = simulate_affine_field(affines, np.array([1., 2., .5]), (6, 6, 6), (2, 2, 2), True)
    p = np.allclose(d, 0.0, atol=1e-4); ok &= p
    print('identity-affine zero displacement:', 'PASS' if p else 'FAIL')

    A = np.eye(4); A[0, 3] = 1.0
    affines = np.tile(A[None, None, None], (2, 2, 2, 1, 1))
    d = simulate_affine_field(affines, np.ones(3), (6, 6, 6), (2, 2, 2), True)[..., 0]
    p = abs(d.max() - 64 / 27) < 1e-3; ok &= p  # corner seam inflation (4/3)^3
    print('seam quirk (4/3)^3 = %.4f:' % d.max(), 'PASS' if p else 'FAIL')
    sys.exit(0 if ok else 1)
