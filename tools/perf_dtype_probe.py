"""Microbenchmark: int16 vs int32 column-loop structure in Pallas on TPU.

Isolates which construct makes the int16 kernel pathological: the full
column-body mix, the sublane concatenate, or the dynamic-slice row read.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M1, B, L = 34, 1024, 104
GRID = 16


def body_full(reads_ref, out_ref, *, dt, use_concat, use_dyn):
    m = M1 - 1

    def column(j, carry):
        pack, pay = carry
        if use_dyn:
            qc = reads_ref[pl.ds(j - 1, 1), :]
        else:
            qc = reads_ref[0:1, :]
        eq = reads_ref[0:m, :] == qc  # int32 compare plane
        del_p = pack[1:M1, :] + dt(3)
        diag = pack[0:m, :] + dt(1)
        pick = diag <= del_p
        loc = jnp.where(pick, diag, del_p)
        elem = jnp.where(eq, pack[0:m, :], loc)
        pay_e = jnp.where(eq, pay[0:m, :] + dt(1), pay[1:M1, :])
        if use_concat:
            pack2 = jnp.concatenate([pack[0:1, :], elem], axis=0)
            pay2 = jnp.concatenate([pay[0:1, :], pay_e], axis=0)
        else:
            pack2 = jnp.where(
                lax.broadcasted_iota(jnp.int32, (M1, B), 0) == 0,
                pack,
                jnp.pad(elem, ((1, 0), (0, 0))),
            )
            pay2 = jnp.where(
                lax.broadcasted_iota(jnp.int32, (M1, B), 0) == 0,
                pay,
                jnp.pad(pay_e, ((1, 0), (0, 0))),
            )
        for _ in range(3):
            cand = pack2[0:m, :] + dt(2)
            tail = pack2[1:M1, :]
            take = (cand < tail) & (~eq)
            pack2 = jnp.concatenate(
                [pack2[0:1, :], jnp.where(take, cand, tail)], axis=0
            )
            pay2 = jnp.concatenate(
                [pay2[0:1, :], jnp.where(take, pay2[0:m, :], pay2[1:M1, :])],
                axis=0,
            )
        pack2 = jnp.minimum(pack2 & ~dt(127), dt(512))
        return (pack2, pay2)

    pack0 = jnp.zeros((M1, B), dt)
    pay0 = jnp.zeros((M1, B), dt)
    pack, pay = lax.fori_loop(1, L + 1, column, (pack0, pay0))
    out_ref[:] = (pack[:8, :] + pay[:8, :]).astype(jnp.int32)


def run(name, dt, use_concat=True, use_dyn=True):
    kern = functools.partial(body_full, dt=dt, use_concat=use_concat, use_dyn=use_dyn)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, B * GRID), jnp.int32),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((L, B), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, B), lambda i: (0, i), memory_space=pltpu.VMEM),
    )
    f = jax.jit(lambda r: call(r.astype(jnp.int32)))
    reads = jax.device_put(jnp.zeros((L, B * GRID), jnp.uint8))
    np.asarray(f(reads))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(reads))
        best = min(best, time.time() - t0)
    print("%-28s %8.2f ms  (%.2fM reads/s)" % (name, best * 1e3, B * GRID / best / 1e6))


run("int32 full", jnp.int32)
run("int16 full", jnp.int16)
run("int16 no-dynslice", jnp.int16, use_dyn=False)
run("int32 no-dynslice", jnp.int32, use_dyn=False)
