"""Micro-benchmark: per-element table gathers vs analytic exp vs one-hot
matmul on the TPU, at radiation-solver shapes.  Informs the taumol/spcvrt
optimization strategy (VERDICT r3 item 1)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, repeats=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    nz, ncol, ngpt = 60, 8192, 112
    key = jax.random.PRNGKey(0)
    tau = jax.random.uniform(key, (nz, ncol, ngpt), jnp.float32, 0.0, 5.0)
    tbl = jnp.asarray(np.random.rand(10002), jnp.float32)

    @jax.jit
    def table_lookup(tau):
        tblind = tau / (1.0 / 0.278 + tau)
        it = jnp.trunc(10000 * tblind + 0.5).astype(jnp.int32)
        return tbl[it]

    @jax.jit
    def analytic(tau):
        return jnp.exp(-tau)

    print('exp-table gather (60,8192,112): %7.2f ms'
          % (bench(table_lookup, tau) * 1e3))
    print('analytic exp     (60,8192,112): %7.2f ms'
          % (bench(analytic, tau) * 1e3))

    # taumol-style row gather: table (585, 16), idx (nz, ncol)
    ktab = jnp.asarray(np.random.rand(585, 16), jnp.float32)
    idx = jax.random.randint(key, (nz, ncol), 0, 585)
    w = jax.random.uniform(key, (nz, ncol), jnp.float32)

    @jax.jit
    def row_gather(idx, w):
        acc = 0.0
        for off in range(8):
            i = jnp.clip(idx + off, 0, 584)
            acc = acc + w[..., None] * ktab[i]
        return acc

    @jax.jit
    def onehot_matmul(idx, w):
        acc = jnp.zeros((nz, ncol, 585), jnp.float32)
        iota = jnp.arange(585, dtype=jnp.int32)
        for off in range(8):
            i = jnp.clip(idx + off, 0, 584)
            acc = acc + w[..., None] * (i[..., None] == iota)
        return acc @ ktab

    @jax.jit
    def onehot_matmul_bf16(idx, w):
        acc = jnp.zeros((nz, ncol, 585), jnp.bfloat16)
        iota = jnp.arange(585, dtype=jnp.int32)
        for off in range(8):
            i = jnp.clip(idx + off, 0, 584)
            acc = acc + (w[..., None] * (i[..., None] == iota)).astype(
                jnp.bfloat16)
        return jax.lax.dot_general(
            acc, ktab.astype(jnp.bfloat16), ((((2,), (0,))), ((), ())),
            preferred_element_type=jnp.float32)

    print('8x row gather  (585,16)-table : %7.2f ms'
          % (bench(row_gather, idx, w) * 1e3))
    print('8x onehot matmul f32          : %7.2f ms'
          % (bench(onehot_matmul, idx, w) * 1e3))
    print('8x onehot matmul bf16         : %7.2f ms'
          % (bench(onehot_matmul_bf16, idx, w) * 1e3))

    # scan overhead probe: 60-step scan over (ncol, ngpt) slices
    xs = jax.random.uniform(key, (nz, ncol, ngpt), jnp.float32)

    @jax.jit
    def scan_sweep(xs):
        def step(c, x):
            c = c * (1.0 - x) + x * 0.5
            return c, c
        return jax.lax.scan(step, jnp.zeros((ncol, ngpt)), xs)[1]

    print('60-step scan (ncol,112) slices: %7.2f ms'
          % (bench(scan_sweep, xs) * 1e3))


if __name__ == '__main__':
    main()
