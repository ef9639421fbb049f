"""Device-mesh construction and sharding layouts.

The scaling dimension of this framework is the horizontal grid: every
physics component is embarrassingly parallel over columns, and the dycore
couples columns only through the spectral transforms (SURVEY.md §2.5/§5).
The production decomposition is therefore:

- grid-space fields (nz, nlat, nlon): sharded over latitude bands (and
  optionally longitude) on a ('lat', 'lon') mesh — the climate-model analog
  of data/sequence parallelism;
- the zonal transform is kept device-local by sharding latitude only (or by
  an all_to_all transpose between lat-local Legendre and m-local FFT stages
  at large scale — planned);
- spectral coefficients are replicated this round (they are tiny: O(T^2)
  per level), with XLA inserting the latitude-sum reductions of the
  Legendre analysis automatically.

Multi-host runs initialize with ``jax.distributed.initialize()`` before
building the mesh.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices=None, mesh_shape=None, axis_names=('lat', 'lon')):
    """Build a 2-D device mesh over the horizontal decomposition axes."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if mesh_shape is None:
        # favor latitude sharding (keeps the FFT axis local)
        lon_factor = 2 if n % 2 == 0 and n > 2 else 1
        mesh_shape = (n // lon_factor, lon_factor)
    return Mesh(np.array(devices).reshape(mesh_shape), axis_names)


def grid_sharding(mesh, ndim=3, shard_lon=False):
    """NamedSharding for a grid field: (nz, nlat, nlon) or (nlat, nlon)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    lon = 'lon' if shard_lon else None
    if ndim == 3:
        return NamedSharding(mesh, P(None, 'lat', lon))
    return NamedSharding(mesh, P('lat', lon))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def shard_model_state(mesh, prev, now, grids, aux=None, step_idx=None,
                      shard_lon=False):
    """Place a compiled-model carry onto the mesh with the production
    layout: spectral states replicated, grid/aux fields domain-decomposed
    ((nz, nlat, nlon) and (nlat, nlon) shapes), step counters replicated."""
    import jax
    rep = replicated(mesh)
    prev = {k: jax.device_put(v, rep) for k, v in prev.items()}
    now = {k: jax.device_put(v, rep) for k, v in now.items()}
    grids = {k: jax.device_put(
        v, grid_sharding(mesh, v.ndim, shard_lon))
        for k, v in grids.items()}
    out = (prev, now, grids)
    if aux is not None:
        aux = {k: jax.device_put(
            v, grid_sharding(mesh, v.ndim, shard_lon) if v.ndim >= 2
            else rep) for k, v in aux.items()}
        out = out + (aux,)
    if step_idx is not None:
        out = out + (jax.device_put(step_idx, rep),)
    return out
