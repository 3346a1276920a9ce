#!/usr/bin/env python3
"""Generate golden fixtures (FIXTURES.md A) from the reference kernels.

Writes to src/test/resources/golden/: per fixture a <name>.json sidecar
(shapes/params) plus little-endian float32 .raw payloads for inputs and
expected outputs. Uses the same dask-stubbing harness as
tools/reference_probe.py (the reference kernels are pure numpy).

Run: python3 tools/gen_goldens.py
"""
import json
import os
import sys
import types

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

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'golden')
os.makedirs(OUT, exist_ok=True)


def simulate_stitch(tiles, grid, blocksize, overlap, components=0):
    """tiles: {idx: ndarray of shape blocksize+2*overlap (+ (c,))}. Full stitched array."""
    bs, o = np.asarray(blocksize), np.asarray(overlap)
    cs = bs + 2 * o
    comp = (components,) if components else ()
    weighted = {}
    for idx in product(*[range(g) for g in grid]):
        bi = {0: {'chunk-location': idx, 'num-chunks': grid}}
        weighted[idx] = weight_block(tiles[idx].astype(np.float32),
                                     tuple(bs), tuple(o), block_info=bi)
    full = np.zeros(tuple(bs * np.asarray(grid)) + comp, dtype=np.float32)
    for idx in product(*[range(g) for g in grid]):
        ext = np.zeros(tuple(cs + 2 * o) + comp, dtype=np.float32)  # boundary=0.
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


def dump(name, meta, arrays):
    for key, a in arrays.items():
        # affine matrices stay float64 (the reference's einsum runs in f64);
        # everything else is the engine's float32.
        dt = '<f8' if key == 'affines' else '<f4'
        a = np.ascontiguousarray(a.astype(dt))
        a.tofile(os.path.join(OUT, f'{name}.{key}.raw'))
        meta[f'{key}_shape'] = list(a.shape)
    with open(os.path.join(OUT, f'{name}.json'), 'w') as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print(f'wrote {name}: ' + ', '.join(f'{k}{list(v.shape)}' for k, v in arrays.items()))


def tile_set(grid, cs, fill):
    return {i: fill(i) for i in product(*[range(g) for g in grid])}


def stitch_fixture(name, grid, bs, o, fill, components=0):
    bs, o = np.asarray(bs), np.asarray(o)
    cs = tuple(bs + 2 * o) + ((components,) if components else ())
    tiles = tile_set(grid, cs, fill)
    full = simulate_stitch(tiles, grid, bs, o, components)
    arrays = {'out': full}
    for idx, t in tiles.items():
        arrays['in_' + '_'.join(map(str, idx))] = t
    dump(name, {'kind': 'stitch', 'grid': list(grid), 'blocksize': bs.tolist(),
                'overlap': o.tolist(), 'components': components}, arrays)


def affine_fixture(name, affines, spacing, bs, o, displacement, shape=None):
    full = simulate_affine_field(affines, spacing, bs, o, displacement)
    if shape is not None:
        full = full[:shape[0], :shape[1], :shape[2]]
    dump(name, {'kind': 'affine', 'grid': list(affines.shape[:3]),
                'blocksize': list(bs), 'overlap': list(o),
                'spacing': list(map(float, spacing)),
                'displacement': bool(displacement),
                'matshape': list(affines.shape[3:]),
                'shape': list(shape) if shape is not None else
                         [b * g for b, g in zip(bs, affines.shape[:3])]},
         {'out': full, 'affines': affines.astype(np.float64)})


rng = np.random.default_rng(42)

# stitch_const: partition of unity
stitch_fixture('stitch_const', (3, 3, 3), (8, 8, 8), (2, 2, 2),
               lambda i: np.ones((12, 12, 12), np.float32))

# stitch_aniso: global linear gradient over voxel coords, anisotropic geometry
bs_a, o_a, grid_a = np.array([8, 9, 10]), np.array([2, 3, 2]), (3, 2, 3)


def grad_tile(idx):
    start = np.asarray(idx) * bs_a - o_a  # tile origin in global coords
    cs = bs_a + 2 * o_a
    g = np.meshgrid(*[np.arange(s, s + c) for s, c in zip(start, cs)], indexing='ij')
    return (g[0] * 1.0 + g[1] * 0.1 + g[2] * 0.01).astype(np.float32)


stitch_fixture('stitch_aniso', grid_a, bs_a, o_a, grad_tile)

# stitch_rand: seeded uniform noise
stitch_fixture('stitch_rand', (2, 2, 2), (6, 6, 6), (2, 2, 2),
               lambda i: rng.uniform(0, 1, (10, 10, 10)).astype(np.float32))

# stitch_vec: vector field, component axis
stitch_fixture('stitch_vec', (2, 2, 2), (6, 6, 6), (2, 2, 2),
               lambda i: rng.uniform(-1, 1, (10, 10, 10, 3)).astype(np.float32),
               components=3)

# affine_identity (both displacement flags)
eye = np.tile(np.eye(4)[None, None, None], (2, 2, 2, 1, 1))
sp = np.array([1.0, 2.0, 0.5])
affine_fixture('affine_identity_disp', eye, sp, (6, 6, 6), (2, 2, 2), True)
affine_fixture('affine_identity_pos', eye, sp, (6, 6, 6), (2, 2, 2), False)

# affine_translate: uniform translation -> seam inflation (4/3)^d quirk lock
tr = np.eye(4); tr[:3, 3] = (1.0, 0.0, 0.0)
affine_fixture('affine_translate', np.tile(tr[None, None, None], (2, 2, 2, 1, 1)),
               np.ones(3), (6, 6, 6), (2, 2, 2), True)

# affine_rand: seeded small perturbations, 3x2x2 grid, 3x4 matrices
pert = np.tile(np.eye(4)[:3][None, None, None], (3, 2, 2, 1, 1)).copy()
pert[..., :3, :3] += rng.uniform(-0.05, 0.05, (3, 2, 2, 3, 3))
pert[..., :3, 3] += rng.uniform(-0.5, 0.5, (3, 2, 2, 3))
affine_fixture('affine_rand_disp', pert, np.array([1.0, 0.5, 2.0]),
               (8, 9, 10), (2, 3, 2), True)
affine_fixture('affine_rand_pos', pert, np.array([1.0, 0.5, 2.0]),
               (8, 9, 10), (2, 3, 2), False)

# affine_o1: degenerate overlap=1, 2x1x1 grid
affine_fixture('affine_o1', np.tile(tr[None, None, None], (2, 1, 1, 1, 1)),
               np.ones(3), (4, 4, 4), (1, 1, 1), True)

# crop_shape: shape smaller than padded domain
affine_fixture('crop_shape', pert[:2, :2, :2], np.ones(3), (6, 6, 6), (2, 2, 2),
               True, shape=(10, 11, 9))

print('all golden fixtures written to', os.path.abspath(OUT))
