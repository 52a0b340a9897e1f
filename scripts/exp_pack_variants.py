#!/usr/bin/env python3
"""Attribute + optimize stage A's download-packaging cost (real chip).

The dissect run put the maps_and_pack packaging at ~8.7 ms per 8-page
batch — more than the morphology postproc itself.  Isolate the three
pieces (2-bit mask pack, quarter-res heights quantize, half-res 4-bit
separator quantize) and try layout-friendlier variants:

  mask pack: the current W-minor reshape(pb,h,w//4,4) forces a relayout
  of the u8 minor axis; candidates pack along H (major axis, sublane
  friendly) or use strided minor slices.

Protocol: (t_16 - t_4)/12 chained dispatches, median of 5, interleaved.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pero_ocr_tpu.utils.jax_setup import configure

configure()

import jax
import jax.numpy as jnp

PB, H, W = 8, 640, 448
K1, K2 = 4, 16


def med_chained_ms(fns, reps=5):
    for f in fns.values():
        np.asarray(f())
    samples = {n: [] for n in fns}
    for _ in range(reps):
        for name, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(K1):
                out = f()
            np.asarray(out)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(K2):
                out = f()
            np.asarray(out)
            t2 = time.perf_counter() - t0
            samples[name].append((t2 - t1) / (K2 - K1) * 1000.0)
    return {n: sorted(v)[len(v) // 2] for n, v in samples.items()}


def main():
    rng = np.random.default_rng(0)
    bl = jnp.asarray(rng.random((PB, H, W)) > 0.9)
    conn = jnp.asarray(rng.random((PB, H, W)) > 0.8)
    hh = jnp.asarray(rng.random((PB, H, W, 2)).astype(np.float32) * 30)
    sep = jnp.asarray(rng.random((PB, H, W)).astype(np.float32))

    @jax.jit
    def mask_pack_w(bl, conn):
        two = bl.astype(jnp.uint8) + 2 * conn.astype(jnp.uint8)
        p = two.reshape(PB, H, W // 4, 4)
        return (p[..., 0] + (p[..., 1] << 2) + (p[..., 2] << 4)
                + (p[..., 3] << 6)).astype(jnp.int32).sum()

    @jax.jit
    def mask_pack_w_strided(bl, conn):
        two = bl.astype(jnp.uint8) + 2 * conn.astype(jnp.uint8)
        return (two[:, :, 0::4] + (two[:, :, 1::4] << 2)
                + (two[:, :, 2::4] << 4)
                + (two[:, :, 3::4] << 6)).astype(jnp.int32).sum()

    @jax.jit
    def mask_pack_h(bl, conn):
        two = bl.astype(jnp.uint8) + 2 * conn.astype(jnp.uint8)
        p = two.reshape(PB, H // 4, 4, W)
        return (p[:, :, 0] + (p[:, :, 1] << 2) + (p[:, :, 2] << 4)
                + (p[:, :, 3] << 6)).astype(jnp.int32).sum()

    @jax.jit
    def mask_pack_h_i32(bl, conn):
        two = bl.astype(jnp.int32) + 2 * conn.astype(jnp.int32)
        p = two.reshape(PB, H // 4, 4, W)
        out = (p[:, :, 0] + (p[:, :, 1] << 2) + (p[:, :, 2] << 4)
               + (p[:, :, 3] << 6)).astype(jnp.uint8)
        return out.astype(jnp.int32).sum()

    @jax.jit
    def heights_q(hh):
        hq = jax.lax.reduce_window(hh, 0.0, jax.lax.max,
                                   (1, 4, 4, 1), (1, 4, 4, 1), "VALID")
        return jnp.clip(jnp.round(hq * 4.0), 0, 255).astype(
            jnp.uint8).astype(jnp.int32).sum()

    @jax.jit
    def heights_q_bf16(hh):
        hq = jax.lax.reduce_window(hh.astype(jnp.bfloat16),
                                   jnp.bfloat16(0.0), jax.lax.max,
                                   (1, 4, 4, 1), (1, 4, 4, 1), "VALID")
        return jnp.clip(jnp.round(hq.astype(jnp.float32) * 4.0), 0,
                        255).astype(jnp.uint8).astype(jnp.int32).sum()

    @jax.jit
    def sep_q(sep):
        sp = jax.lax.reduce_window(sep, 0.0, jax.lax.max,
                                   (1, 2, 2), (1, 2, 2), "VALID")
        sn = jnp.clip(jnp.round(sp * 15.0), 0, 15).astype(jnp.uint8)
        return ((sn[:, :, 0::2] << 4) | sn[:, :, 1::2]).astype(
            jnp.int32).sum()

    @jax.jit
    def sep_q_h(sep):
        sp = jax.lax.reduce_window(sep, 0.0, jax.lax.max,
                                   (1, 2, 2), (1, 2, 2), "VALID")
        sn = jnp.clip(jnp.round(sp * 15.0), 0, 15).astype(jnp.uint8)
        h2 = sn.shape[1]
        p = sn.reshape(PB, h2 // 2, 2, sn.shape[2])
        return ((p[:, :, 0] << 4) | p[:, :, 1]).astype(jnp.int32).sum()

    fns = {
        "mask_pack_w(cur)": lambda: mask_pack_w(bl, conn),
        "mask_pack_w_str": lambda: mask_pack_w_strided(bl, conn),
        "mask_pack_h": lambda: mask_pack_h(bl, conn),
        "mask_pack_h_i32": lambda: mask_pack_h_i32(bl, conn),
        "heights_q(cur)": lambda: heights_q(hh),
        "heights_q_bf16": lambda: heights_q_bf16(hh),
        "sep_q(cur)": lambda: sep_q(sep),
        "sep_q_h": lambda: sep_q_h(sep),
    }
    res = med_chained_ms(fns)
    for name, ms in res.items():
        print(f"{name:18s} {ms:7.2f} ms/batch")


if __name__ == "__main__":
    main()
