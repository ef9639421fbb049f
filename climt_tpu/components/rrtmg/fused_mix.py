"""Fused per-band table-row interpolation for the RRTMG gas optics.

The correlated-k hot loop is a sum of table-row interpolation terms

    taug[z, c, :] = sum_t  w_t[z, c] * table_t[idx_t[z, c], :]

(key-species 2x2x2 pressure/temperature/eta interpolation, water-vapor
self/foreign continuum, minor absorbers, CFC cross-sections — reference
rrtmg_lw_taumol.f90 / rrtmg_sw_taumol.f90).  Round 4's XLA formulation
contracts a sparse one-hot weight matrix W[cell, row] against the table
on the MXU (interp.mix_rows), but W materializes through HBM: ~2x
cells x rows x 4 B per band (~26 GB per 8192-column batch summed over
bands, docs/RADIATION_ROOFLINE.md "W-matrices"), the measured bound on
taumol.

This module fuses one whole band — every term, all tables concatenated
row-wise — into ONE Pallas kernel: W tiles are built in VMEM, contracted
there, and never touch HBM.  HBM traffic drops to the irreducible
(idx, w) inputs and the (cells, ng) output.

Numerics: identical contraction (one-hot weights, f32 MXU at HIGHEST
equivalent — jnp.dot with preferred_element_type=f32) with the addition
order changed from per-term-group to a single sum; f64 callers keep the
exact sequential-gather path in interp.mix_rows (BandAccum falls back).

Enable/disable with CLIMT_TPU_PALLAS=1/0/interpret (default: on when
the JAX backend is TPU, interpreter never used implicitly).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .interp import mix_rows

_TILE = 256


def _pallas_mode():
    """'on' | 'off' | 'interpret' — resolved once per process."""
    env = os.environ.get('CLIMT_TPU_PALLAS', '').lower()
    if env in ('0', 'off', 'false'):
        return 'off'
    if env == 'interpret':
        return 'interpret'
    if env in ('1', 'on', 'true'):
        return 'on'
    return 'on' if jax.default_backend() == 'tpu' else 'off'


def _mix_kernel(idx_ref, w_ref, tbl_ref, out_ref):
    """out[tile, ng] = sum_t w[tile, t] * tbl[idx[tile, t], :].

    One-hot rows are built and summed in VMEM (T compare+select passes
    over a (tile, R) block on the VPU), then contracted on the MXU.
    Out-of-range indices contribute nothing (callers pre-clip to match
    the XLA path's clip semantics).
    """
    tile = out_ref.shape[0]
    rows = tbl_ref.shape[0]
    nterms = idx_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, rows), 1)
    acc = jnp.zeros((tile, rows), jnp.float32)
    for t in range(nterms):
        idx_t = idx_ref[:, t].reshape(tile, 1)
        w_t = w_ref[:, t].reshape(tile, 1)
        acc = acc + jnp.where(col == idx_t, w_t, 0.0)
    out_ref[:] = jnp.dot(
        acc, tbl_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def fused_mix_rows(table, idx, w, interpret=False):
    """Pallas evaluation of sum_t w[t] * table[idx[t]] over stacked terms.

    Args:
      table: (R, ng) float table.
      idx: (T, *S) int32 row indices (already clipped to [0, R-1] where
        the weight is nonzero; out-of-range rows are dropped).
      w: (T, *S) weights, float32.
    Returns:
      (*S, ng) array, dtype of w.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nterms = idx.shape[0]
    s_shape = idx.shape[1:]
    size = 1
    for d in s_shape:
        size *= d
    rows, ng = table.shape
    # (T, S) -> (S, T): term index on lanes so per-term columns slice
    # without a transpose inside the kernel
    idx2 = jnp.moveaxis(idx.reshape(nterms, size), 0, 1)
    w2 = jnp.moveaxis(w.reshape(nterms, size).astype(jnp.float32), 0, 1)
    pad = (-size) % _TILE
    if pad:
        idx2 = jnp.pad(idx2, ((0, pad), (0, 0)), constant_values=-1)
        w2 = jnp.pad(w2, ((0, pad), (0, 0)))
    n_tiles = (size + pad) // _TILE

    out = pl.pallas_call(
        _mix_kernel,
        out_shape=jax.ShapeDtypeStruct((size + pad, ng), w.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE, nterms), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, nterms), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, ng), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, ng), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * (size + pad) * rows * (nterms + ng),
            bytes_accessed=(size + pad) * (8 * nterms + 4 * ng)
            + 4 * rows * ng,
            transcendentals=0),
        interpret=interpret,
    )(idx2, w2, table)
    return out[:size].reshape(*s_shape, ng)


class BandAccum:
    """Accumulates one band's interpolation terms, evaluates them fused.

    Replaces chains of ``taug = taug + mix_rows(...) + lin_rows(...)``
    in the band loops: terms collect here, tables concatenate row-wise,
    and a single fused contraction (Pallas on TPU, one MXU one-hot
    contraction elsewhere) produces the band's (nz, ncol, ng).  float64
    callers get the exact per-part sequential-gather evaluation of
    interp.mix_rows, preserving golden-parity numerics.
    """

    def __init__(self, dtype):
        self.dtype = dtype
        self.parts = []        # (table, [(idx, w), ...])
        self.dense = None

    def mix(self, table, terms):
        terms = list(terms)
        if self.dtype == jnp.float64:
            self.add(mix_rows(table, terms))
        else:
            self.parts.append((table, terms))

    def lin(self, table, idx, frac, weight=None):
        """weight * two-point interpolation at (idx, frac); see
        interp.lin_rows."""
        if self.dtype == jnp.float64:
            from .interp import lin_rows
            self.add(lin_rows(table, idx, frac, weight))
            return
        w_hi = frac if weight is None else weight * frac
        w_lo = (1.0 - frac) if weight is None else weight * (1.0 - frac)
        self.mix(table, [(idx, w_lo), (idx + 1, w_hi)])

    def row(self, row_values, weight):
        """weight[cell] * row_values[ng] (CFC cross-sections, flat minor
        continua): a one-row table with constant index 0."""
        if self.dtype == jnp.float64:
            self.add(weight[..., None] * row_values)
        else:
            zero = jnp.zeros(weight.shape, jnp.int32)
            self.mix(row_values[None, :], [(zero, weight)])

    def add(self, dense):
        self.dense = dense if self.dense is None else self.dense + dense

    def total(self, shape_ngl):
        """Evaluate: (nz, ncol, ng) sum of all accumulated terms."""
        if not self.parts:
            if self.dense is not None:
                return self.dense
            return jnp.zeros(shape_ngl, self.dtype)
        rows_off = 0
        tables, idxs, ws = [], [], []
        for table, terms in self.parts:
            r = table.shape[0]
            for idx, w in terms:
                safe = jnp.clip(idx, 0, r - 1) + rows_off
                # preserve clip semantics of interp.mix_rows, then keep
                # rows out of this part's range from ever matching
                idxs.append(safe)
                ws.append(w.astype(jnp.float32))
            tables.append(table.astype(jnp.float32))
            rows_off += r
        tbl = tables[0] if len(tables) == 1 else jnp.concatenate(tables, 0)
        idx = jnp.stack(idxs)
        w = jnp.stack(ws)
        mode = _pallas_mode()
        if mode == 'off':
            out = mix_rows(tbl, list(zip(idx, w))).astype(self.dtype)
        else:
            out = fused_mix_rows(
                tbl, idx, w, interpret=(mode == 'interpret'))
            out = out.astype(self.dtype)
        if self.dense is not None:
            out = out + self.dense
        return out
