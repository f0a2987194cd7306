"""Probe: per-ray dynamic row-gather bandwidth, Pallas DMA vs XLA gather.

The per-ray sweep (ops/perray.py) is bandwidth-bound: it gathers each
ray's next visit-chunk row ([K, F*C] fused table, ~5.6 KB/row) with an
XLA gather measured at ~110-140 GB/s — 1/6 of the v5e's 819 GB/s HBM —
for 34 ms of the colonnade's 60 ms/bounce (tools/perray_profile.py).
A Pallas sweep kernel would replace that gather with per-ray async DMAs
issued by the scalar core from an HBM-resident table. Whether that wins
hinges on two unknowns this probe measures:

  1. effective bandwidth of R scattered row DMAs per slot (HBM -> VMEM,
     one row per ray, double-buffered across slots);
  2. the scalar-core DMA issue rate (R*V issues per bounce; at ~1 us per
     issue the kernel would LOSE to XLA's gather).

Run on the chip:  python tools/dma_gather_probe.py [R] [K] [V] [ROWF]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = int(sys.argv[1]) if len(sys.argv) > 1 else 40_960
K = int(sys.argv[2]) if len(sys.argv) > 2 else 2_048
V = int(sys.argv[3]) if len(sys.argv) > 3 else 16
ROWF = int(sys.argv[4]) if len(sys.argv) > 4 else 1_408  # floats/row (11*128)
RB = int(sys.argv[5]) if len(sys.argv) > 5 else 256


import os
NSEM = int(os.environ.get("NSEM", "8"))  # DMA semaphore stripes


def _kernel(ids_vref, table_ref, out_ref, ids_smem, buf, done_sem, sems):
    """Per slot: issue RB row DMAs into buf[par] (striped over NSEM
    semaphores so the hardware can service them on parallel queues), wait
    the previous slot's buffer, reduce it into the accumulator — classic
    double buffer. Table is [K, F, C]: a row DMA slices only the untiled
    leading dim (Mosaic rejects unaligned tiled-dim slices)."""
    # ids block VMEM -> SMEM so the scalar core can address rows with them
    cp = pltpu.make_async_copy(ids_vref, ids_smem, done_sem)
    cp.start()
    cp.wait()

    def issue(par, s):
        def one(r, _):
            idx = ids_smem[r, s]
            pltpu.make_async_copy(table_ref.at[idx],
                                  buf.at[par, r],
                                  sems.at[par, r % NSEM]).start()
            return 0

        jax.lax.fori_loop(0, RB, one, 0)

    def wait(par, s):
        def one(r, _):
            idx = ids_smem[r, s]
            pltpu.make_async_copy(table_ref.at[idx],
                                  buf.at[par, r],
                                  sems.at[par, r % NSEM]).wait()
            return 0

        jax.lax.fori_loop(0, RB, one, 0)

    issue(0, 0)
    acc = jnp.zeros((RB, 1), jnp.float32)
    for s in range(V):
        par = s % 2
        if s + 1 < V:
            issue(1 - par, s + 1)
        wait(par, s)
        acc = acc + jnp.sum(buf[par].reshape(RB, -1), axis=1, keepdims=True)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=())
def pallas_gather_sum(ids, table):
    grid = (R // RB,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((RB, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((RB, V), jnp.int32),
            pltpu.VMEM((2, RB, ROWF // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, NSEM)),
        ],
    )(ids, table.reshape(K, ROWF // 128, 128))


@jax.jit
def xla_gather_sum(ids, table):
    def slot(acc, s):
        rows = table[ids[:, s]]
        return acc + jnp.sum(rows, axis=1, keepdims=True), None

    acc, _ = jax.lax.scan(slot, jnp.zeros((R, 1), jnp.float32),
                          jnp.arange(V))
    return acc


def best_of(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    key = jax.random.key(0)
    table = jax.random.normal(key, (K, ROWF), jnp.float32)
    # visit-list-like ids: sorted-ish per ray (ascending blocks of locality)
    ids = jax.random.randint(jax.random.key(1), (R, V), 0, K, jnp.int32)

    gb = R * V * ROWF * 4 / 1e9
    print(f"gather: {R} rays x {V} slots x {ROWF * 4} B/row = {gb:.2f} GB")

    t_x = best_of(xla_gather_sum, ids, table)
    print(f"XLA    gather: {t_x * 1e3:7.2f} ms  {gb / t_x:6.1f} GB/s")

    a = np.asarray(pallas_gather_sum(ids, table))
    b = np.asarray(xla_gather_sum(ids, table))
    err = np.max(np.abs(a - b) / (np.abs(b) + 1))
    print(f"pallas vs xla max rel err: {err:.2e}")

    t_p = best_of(pallas_gather_sum, ids, table)
    print(f"Pallas DMA   : {t_p * 1e3:7.2f} ms  {gb / t_p:6.1f} GB/s  "
          f"({R * V / t_p / 1e6:.1f} M DMA issues/s)")


if __name__ == "__main__":
    main()
