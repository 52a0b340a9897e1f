#!/usr/bin/env python3
"""Dissect stage A's device time (real chip, one process).

The r3 device split showed combined ~49 ms per 8-page batch while the
strip recognize alone is ~19 — stage A (ParseNet fwd + map postproc +
download packing) is the dominant device cost.  This experiment
attributes it:

  fwd          ParseNet forward only (raw maps, consumed by a sum)
  fwd+post     + _postprocess_maps (dilation/NMS/smooth)
  fwd+post+pk  + the bit-pack/quantize download packaging
  strip        stage-B strip rebuild + recognize (reference point)
  fwd[h4]      forward with head_features=4 (full-res head is the
               bandwidth-bound suspect: 2 convs at 640x448)
  fwd[nohead]  forward with the full-res refinement head removed
               (upsample to half-res only — measures the head's cost
               ceiling; NOT a semantics-preserving variant)

Protocol: per = (t_K2 - t_K1)/(K2 - K1) with K1=4, K2=16 so BOTH
samples amortize the fetch RTT; median of 5, programs interleaved.
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
from pero_ocr_tpu.models.recognizer import CTCRecognizer, RecognizerSpec
from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

PB = 8
K1, K2 = 4, 16
DET_T, LEW = 0.2, 1.0


def med_chained_ms(fns, reps=5):
    """fns: {name: dispatch()} returning a fetchable scalar-ish array.
    Interleaves all programs inside each rep."""
    for f in fns.values():
        np.asarray(f())  # compile + warm
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
    small, payload = pipe._one_batch_payload(pages, bench.page_lines, PB)

    # The override loop ships the canvas 4-bit packed; stage A sees the
    # unpacked (PB, 640, 448) uint8.  Use the unpacked canvas directly
    # so fwd variants measure the net, not the nibble unpack.
    canvas = np.stack([pipe._canvas(pipe._gray(p), 4)
                       for p in (pages * 3)[:PB]])
    canvas_dev = jnp.asarray(canvas.astype(np.uint8))
    strip_dev, offs_dev, wid_dev = (jnp.asarray(p) for p in payload)

    def build_pn(**kw):
        net = ParseNet(stem="s2d", **kw)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
        return net, params

    pn, pn_p = build_pn()
    pn_h4, pn_h4_p = build_pn(head_features=4)

    def fwd_only(net, params):
        @jax.jit
        def f(small_u8):
            x = small_u8.astype(jnp.float32)[..., None]
            images = jnp.broadcast_to(x / 255.0, x.shape[:3] + (3,))
            maps = net.apply(params, images)
            return maps.astype(jnp.float32).sum()
        return lambda: f(canvas_dev)

    @jax.jit
    def f_post(small_u8):
        x = small_u8.astype(jnp.float32)[..., None]
        images = jnp.broadcast_to(x / 255.0, x.shape[:3] + (3,))
        maps = pn.apply(pn_p, images)
        bl, conn, hh, sep = jax.vmap(
            lambda m: _postprocess_maps(m, DET_T, LEW)
        )(maps)
        return (bl.sum() + conn.sum() + hh.sum() + sep.sum())

    @jax.jit
    def f_pack(small_u8):
        outs = None
        x = small_u8.astype(jnp.float32)[..., None]
        # full maps_and_pack clone: postproc + 2-bit mask pack +
        # quarter-res uint8 heights + half-res 4-bit separator.
        images = jnp.broadcast_to(x / 255.0, x.shape[:3] + (3,))
        maps = pn.apply(pn_p, images)
        bl, conn, hh, sep = jax.vmap(
            lambda m: _postprocess_maps(m, DET_T, LEW)
        )(maps)
        two_bit = bl.astype(jnp.uint8) + 2 * conn.astype(jnp.uint8)
        p, h, w = two_bit.shape
        packed = two_bit.reshape(p, h, w // 4, 4)
        packed = (packed[..., 0] + (packed[..., 1] << 2)
                  + (packed[..., 2] << 4) + (packed[..., 3] << 6))
        hq = jax.lax.reduce_window(hh, 0.0, jax.lax.max,
                                   (1, 4, 4, 1), (1, 4, 4, 1), "VALID")
        hq = jnp.clip(jnp.round(hq * 4.0), 0, 255).astype(jnp.uint8)
        sp = jax.lax.reduce_window(sep, 0.0, jax.lax.max,
                                   (1, 2, 2), (1, 2, 2), "VALID")
        sn = jnp.clip(jnp.round(sp * 15.0), 0, 15).astype(jnp.uint8)
        sq = (sn[:, :, 0::2] << 4) | sn[:, :, 1::2]
        return (packed.astype(jnp.int32).sum() + hq.astype(jnp.int32).sum()
                + sq.astype(jnp.int32).sum())

    fns = {
        "fwd": fwd_only(pn, pn_p),
        "fwd+post": lambda: f_post(canvas_dev),
        "fwd+post+pk": lambda: f_pack(canvas_dev),
        "strip": lambda: pipe._stage_b_strip(
            strip_dev, offs_dev, wid_dev, PB, pipe.crop_bucket)[0],
        "fwd[h4]": fwd_only(pn_h4, pn_h4_p),
    }
    res = med_chained_ms(fns)
    for name, ms in res.items():
        print(f"{name:12s} {ms:7.2f} ms/batch ({ms / PB:5.2f} ms/page)")


if __name__ == "__main__":
    main()
