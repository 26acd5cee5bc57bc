"""Bisect the pallas_mbconv fwd-kernel Mosaic crash (lower_to_llo
Check failed: d >> 32 == 0) by compiling stripped-down kernel variants.
Usage: python scripts/diag_mbconv_bisect.py <level>
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEVEL = int(sys.argv[1]) if len(sys.argv) > 1 else 0

N, H, W, CIN, CE = 8, 64, 128, 64, 384
TO = 8
T = H // TO


def _shift_w(v, delta):
    w = v.shape[0]
    if delta == 0:
        return v
    if delta > 0:
        return jnp.pad(v, [(0, delta), (0, 0)])[delta:delta + w]
    return jnp.pad(v, [(-delta, 0), (0, 0)])[:w]


def kernel(x_prev_ref, x_main_ref, x_next_ref, w_ref, b_ref, k_ref, out_ref):
    j = pl.program_id(1)
    xm = x_main_ref[0]
    e_main = jax.nn.relu(
        jnp.dot(xm.reshape(TO * W, CIN), w_ref[:],
                preferred_element_type=jnp.float32)
        + b_ref[0:1, :]).astype(jnp.bfloat16).reshape(TO, W, CE)
    if LEVEL == 0:      # plain expand + write
        for r in range(TO):
            out_ref[0, r] = e_main[r]
        return
    e_top = jax.nn.relu(
        jnp.dot(x_prev_ref[0, TO - 1], w_ref[:],
                preferred_element_type=jnp.float32)
        + b_ref[0:1, :]).astype(jnp.bfloat16)
    e_top = jnp.where(j > 0, e_top, 0).astype(jnp.bfloat16)
    e_bot = jax.nn.relu(
        jnp.dot(x_next_ref[0, 0], w_ref[:],
                preferred_element_type=jnp.float32)
        + b_ref[0:1, :]).astype(jnp.bfloat16)
    e_bot = jnp.where(j < pl.num_programs(1) - 1, e_bot, 0).astype(jnp.bfloat16)

    def e_row(i):
        if i == -1:
            return e_top
        if i == TO:
            return e_bot
        return e_main[i]

    if LEVEL == 1:      # halo rows, no W shifts
        for r in range(TO):
            acc = jnp.zeros((W, CE), jnp.float32)
            for dh in range(3):
                row = e_row(r + dh - 1)
                tap = k_ref[3 * dh + 1:3 * dh + 2, :].astype(jnp.float32)
                acc += row.astype(jnp.float32) * tap
            out_ref[0, r] = acc.astype(jnp.bfloat16)
        return
    if LEVEL == 2:      # full taps with W shifts
        for r in range(TO):
            acc = jnp.zeros((W, CE), jnp.float32)
            for dh in range(3):
                row = e_row(r + dh - 1)
                for dw in range(3):
                    tap = k_ref[3 * dh + dw:3 * dh + dw + 1, :].astype(jnp.float32)
                    acc += _shift_w(row, dw - 1).astype(jnp.float32) * tap
            out_ref[0, r] = acc.astype(jnp.bfloat16)
        return


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H, W, CIN)), jnp.bfloat16)
    wts = jnp.asarray(rng.normal(size=(CIN, CE)) * 0.2, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(1, CE)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(9, CE)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[
            pl.BlockSpec((1, TO, W, CIN),
                         lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO, W, CIN), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO, W, CIN),
                         lambda i, j: (i, jnp.minimum(j + 1, T - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CIN, CE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, CE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TO, W, CE), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, CE), jnp.bfloat16),
    )(x, x, x, wts, b, k)
    print(f"LEVEL {LEVEL}: compiled+ran ok,", float(out.astype(jnp.float32).mean()))


if __name__ == "__main__":
    main()
