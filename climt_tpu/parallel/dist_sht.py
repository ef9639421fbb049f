"""Distributed spherical-harmonic transform: lat-local FFT <-> m-local
Legendre with an all_to_all transpose.

This is the climate-model analog of Ulysses-style sequence parallelism
(SURVEY.md §2.5/§5): the horizontal grid is sharded over latitude bands,
so the zonal FFT is device-local; the Legendre transform needs ALL
latitudes per zonal wavenumber m, so the Fourier coefficients are
transposed with one ``all_to_all`` per direction — after which each
device owns a block of m and performs its Legendre matmuls locally, and
the spectral state is SHARDED over m (not replicated).

Collective volume per transform over an L-device 'lat' axis:
  all_to_all moves (L-1)/L of the Fourier tensor
  = (batch x nlat x ceil(M+1, L) x 16 bytes) per device pair direction —
  e.g. T85, nz=28: 28 x 128 x 88 complex64 ≈ 2.5 MB/device/transform,
  riding ICI.  Compute per device drops by L for both the FFT (nlat/L
  rows) and the Legendre matmuls (M/L block), and the spectral state
  memory by L.

Numerics are identical to the single-device SphericalHarmonicTransform
(the same precomputed tensors, sliced per device); equivalence is
asserted in tests/test_dist_sht.py on the forced 8-device CPU mesh.

Multi-host: call ``climt_tpu.parallel.initialize_distributed()`` first
(jax.distributed), then build the mesh over ``jax.devices()`` spanning
all hosts; the all_to_all rides ICI within a slice and DCN across.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.sht import SphericalHarmonicTransform


class DistributedSHT:
    """m-parallel spherical harmonic transform over a mesh 'lat' axis.

    Wraps a single-device ``SphericalHarmonicTransform`` (same
    truncation, tensors, conventions); ``analyze``/``synthesize`` take
    lat-sharded grid fields and return/accept m-sharded spectral fields.
    """

    def __init__(self, sht: SphericalHarmonicTransform, mesh,
                 axis='lat'):
        self.sht = sht
        self.mesh = mesh
        self.axis = axis
        self.L = mesh.shape[axis]
        if sht.nlat % self.L:
            raise ValueError('nlat %d not divisible by %d lat-devices'
                             % (sht.nlat, self.L))
        M = sht.truncation + 1
        self.m_pad = (-M) % self.L          # pad m so blocks are even
        self.M_padded = M + self.m_pad
        self.m_block = self.M_padded // self.L

        # per-device m-blocks of the Legendre tensors, padded with zeros:
        # (L, m_block, N+1, nlat)
        def blocks(tensor):
            t = np.asarray(tensor)
            t = np.pad(t, ((0, self.m_pad), (0, 0), (0, 0)))
            return jnp.asarray(
                t.reshape(self.L, self.m_block, *t.shape[1:]))

        self._P_blocks = blocks(sht.P)
        self._Pw_blocks = blocks(sht.Pw)

        self.grid_spec = P(None, axis, None)
        self.spec_spec = P(None, axis, None)

    def grid_sharding(self):
        return NamedSharding(self.mesh, self.grid_spec)

    def spec_sharding(self):
        return NamedSharding(self.mesh, self.spec_spec)

    # -- shard_map bodies --------------------------------------------------
    def _analyze_body(self, grid_block):
        """grid_block: (nz, nlat/L, nlon) -> spec block (nz, m_block, N+1)."""
        sht = self.sht
        fm = sht._fft(grid_block)                    # (nz, nlat/L, M)
        if self.m_pad:
            fm = jnp.pad(fm, ((0, 0), (0, 0), (0, self.m_pad)))
        # transpose: split m across devices, gather latitude
        fm = lax.all_to_all(fm, self.axis, split_axis=2, concat_axis=1,
                            tiled=True)              # (nz, nlat, m_block)
        idx = lax.axis_index(self.axis)
        Pw = self._Pw_blocks[idx]                    # (m_block, N+1, nlat)
        re = jnp.einsum('mnl,zlm->zmn', Pw, fm.real)
        im = jnp.einsum('mnl,zlm->zmn', Pw, fm.imag)
        spec = lax.complex(re, im)
        # triangular mask for the local m block
        m_local = idx * self.m_block + jnp.arange(self.m_block)
        n = jnp.arange(sht.truncation + 1)
        mask = (n[None, :] >= m_local[:, None]) & (
            m_local[:, None] <= sht.truncation)
        return spec * mask.astype(spec.real.dtype)

    def _synthesize_body(self, spec_block):
        """spec block (nz, m_block, N+1) -> grid block (nz, nlat/L, nlon)."""
        sht = self.sht
        idx = lax.axis_index(self.axis)
        Pm = self._P_blocks[idx]                     # (m_block, N+1, nlat)
        re = jnp.einsum('mnl,zmn->zlm', Pm, spec_block.real)
        im = jnp.einsum('mnl,zmn->zlm', Pm, spec_block.imag)
        fm = lax.complex(re, im)                     # (nz, nlat, m_block)
        # transpose back: split latitude, gather m
        fm = lax.all_to_all(fm, self.axis, split_axis=1, concat_axis=2,
                            tiled=True)              # (nz, nlat/L, M_pad)
        if self.m_pad:
            fm = fm[..., :sht.truncation + 1]
        return sht._ifft(fm)

    # -- public API ----------------------------------------------------------
    @functools.cached_property
    def analyze(self):
        """(nz, nlat, nlon) lat-sharded -> (nz, M_padded, N+1) m-sharded."""
        return jax.jit(jax.shard_map(
            self._analyze_body, mesh=self.mesh,
            in_specs=(self.grid_spec,), out_specs=self.spec_spec,
            check_vma=False))

    @functools.cached_property
    def synthesize(self):
        return jax.jit(jax.shard_map(
            self._synthesize_body, mesh=self.mesh,
            in_specs=(self.spec_spec,), out_specs=self.grid_spec,
            check_vma=False))

    def pad_spec(self, spec):
        """Pad a replicated (nz, M, N+1) spectral array to M_padded (the
        sharded layout's m extent)."""
        if self.m_pad:
            return jnp.pad(spec, ((0, 0), (0, self.m_pad), (0, 0)))
        return spec

    def unpad_spec(self, spec):
        M = self.sht.truncation + 1
        return spec[:, :M, :]
