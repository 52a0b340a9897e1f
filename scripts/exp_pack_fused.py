#!/usr/bin/env python3
"""Fused postproc+pack variants (real chip): find where the +8.7 ms
goes when the download packaging is appended to the morphology postproc
(isolated pieces cost ~1.4 ms — the rest is fusion/layout churn).

Variants (all after the SAME ParseNet fwd + _postprocess_maps):
  cur        the shipped maps_and_pack packaging
  nopack     postproc outputs cast to u8/downloadable dtypes, NO bitpack
  i32ْpack    pack arithmetic in int32 lanes, one final u8 cast
  convpack   W-minor 4:1 pack as a strided depthwise conv with kernel
             [1,4,16,64] in f32, then u8 cast (layout-friendly gather)
  f32mask    masks kept f32 0/1 through the pack math, cast at end
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

import bench
from pero_ocr_tpu.layout_engines.cnn_engine import _postprocess_maps
from pero_ocr_tpu.models.parsenet import ParseNet
from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

PB = 8
K1, K2 = 4, 16
DET_T, LEW = 0.2, 1.0


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
    pages = [bench.make_page(rng) for _ in range(3)]
    pipe = bench.build_pipeline(TPUPagePipeline)
    canvas = np.stack([pipe._canvas(pipe._gray(p), 4)
                       for p in (pages * 3)[:PB]])
    canvas_dev = jnp.asarray(canvas.astype(np.uint8))

    net = ParseNet(stem="s2d")
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))

    def fwd_post(small_u8):
        x = small_u8.astype(jnp.float32)[..., None]
        images = jnp.broadcast_to(x / 255.0, x.shape[:3] + (3,))
        maps = net.apply(params, images)
        return jax.vmap(lambda m: _postprocess_maps(m, DET_T, LEW))(maps)

    def hq_sq(hh, sep):
        hq = jax.lax.reduce_window(hh, 0.0, jax.lax.max,
                                   (1, 4, 4, 1), (1, 4, 4, 1), "VALID")
        hq = jnp.clip(jnp.round(hq * 4.0), 0, 255).astype(jnp.uint8)
        sp = jax.lax.reduce_window(sep, 0.0, jax.lax.max,
                                   (1, 2, 2), (1, 2, 2), "VALID")
        sn = jnp.clip(jnp.round(sp * 15.0), 0, 15).astype(jnp.uint8)
        sq = (sn[:, :, 0::2] << 4) | sn[:, :, 1::2]
        return hq, sq

    @jax.jit
    def cur(small_u8):
        bl, conn, hh, sep = fwd_post(small_u8)
        two = bl.astype(jnp.uint8) + 2 * conn.astype(jnp.uint8)
        p, h, w = two.shape
        pk = two.reshape(p, h, w // 4, 4)
        pk = (pk[..., 0] + (pk[..., 1] << 2) + (pk[..., 2] << 4)
              + (pk[..., 3] << 6))
        hq, sq = hq_sq(hh, sep)
        return (pk.astype(jnp.int32).sum() + hq.astype(jnp.int32).sum()
                + sq.astype(jnp.int32).sum())

    @jax.jit
    def nopack(small_u8):
        bl, conn, hh, sep = fwd_post(small_u8)
        two = bl.astype(jnp.uint8) + 2 * conn.astype(jnp.uint8)
        hq, sq = hq_sq(hh, sep)
        return (two.astype(jnp.int32).sum() + hq.astype(jnp.int32).sum()
                + sq.astype(jnp.int32).sum())

    @jax.jit
    def i32pack(small_u8):
        bl, conn, hh, sep = fwd_post(small_u8)
        two = bl.astype(jnp.int32) + 2 * conn.astype(jnp.int32)
        p, h, w = two.shape
        pk = two.reshape(p, h, w // 4, 4)
        pk = (pk[..., 0] + (pk[..., 1] << 2) + (pk[..., 2] << 4)
              + (pk[..., 3] << 6)).astype(jnp.uint8)
        hq, sq = hq_sq(hh, sep)
        return (pk.astype(jnp.int32).sum() + hq.astype(jnp.int32).sum()
                + sq.astype(jnp.int32).sum())

    @jax.jit
    def convpack(small_u8):
        bl, conn, hh, sep = fwd_post(small_u8)
        two = bl.astype(jnp.float32) + 2.0 * conn.astype(jnp.float32)
        p, h, w = two.shape
        x2 = two.reshape(p * h, 1, w)[:, :, :]  # (N, C=1, W)
        kern = jnp.array([1.0, 4.0, 16.0, 64.0], jnp.float32)
        kern = kern[None, None, :]  # (out=1, in=1, 4)
        y = jax.lax.conv_general_dilated(
            x2, kern, window_strides=(4,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        pk = y.reshape(p, h, w // 4).astype(jnp.uint8)
        hq, sq = hq_sq(hh, sep)
        return (pk.astype(jnp.int32).sum() + hq.astype(jnp.int32).sum()
                + sq.astype(jnp.int32).sum())

    @jax.jit
    def f32mask(small_u8):
        bl, conn, hh, sep = fwd_post(small_u8)
        two = bl.astype(jnp.float32) + 2.0 * conn.astype(jnp.float32)
        p, h, w = two.shape
        pk = two.reshape(p, h, w // 4, 4)
        pk = (pk[..., 0] + pk[..., 1] * 4.0 + pk[..., 2] * 16.0
              + pk[..., 3] * 64.0).astype(jnp.uint8)
        hq, sq = hq_sq(hh, sep)
        return (pk.astype(jnp.int32).sum() + hq.astype(jnp.int32).sum()
                + sq.astype(jnp.int32).sum())

    fns = {
        "cur": lambda: cur(canvas_dev),
        "nopack": lambda: nopack(canvas_dev),
        "i32pack": lambda: i32pack(canvas_dev),
        "convpack": lambda: convpack(canvas_dev),
        "f32mask": lambda: f32mask(canvas_dev),
    }
    res = med_chained_ms(fns)
    for name, ms in res.items():
        print(f"{name:10s} {ms:7.2f} ms/batch ({ms / PB:5.2f} ms/page)")


if __name__ == "__main__":
    main()
