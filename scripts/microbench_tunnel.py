#!/usr/bin/env python3
"""Tunnel + host microbenchmarks backing the serving-pipeline transport
design (run alone on the real TPU chip; see CLAUDE.md for the protocol:
single dispatch+fetch measures the ~26ms RTT, so device timings use K
chained dispatches per forced fetch and interleave variants).

Measures:
1. UPLOAD rate vs payload size (zeros vs random bytes — detects
   transport-level compression);
2. HOST per-page costs of a crop-transport scheme: cv2.resize 1/4
   INTER_AREA, cv2.remap of 40 line crops, 4-bit packing;
3. DEVICE stage costs via chained dispatches.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pero_ocr_tpu.utils.jax_setup import configure

configure()

import cv2
import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    return np.asarray(x)


def bench_upload(reps=5):
    print("== upload rate (payload -> device -> 1-byte checksum fetch)")
    sizes_mb = [0.25, 0.5, 1, 2, 4, 8]

    @jax.jit
    def checksum(x):
        return x[::4096].astype(jnp.int32).sum()

    rng = np.random.default_rng(0)
    results = {}
    for kind in ("zeros", "random", "page4bit"):
        per_size = []
        for mb in sizes_mb:
            n = int(mb * 1e6)
            if kind == "zeros":
                buf = np.zeros(n, np.uint8)
            elif kind == "random":
                buf = rng.integers(0, 256, n, dtype=np.uint8)
            else:
                # nibble-packed synthetic newspaper page bytes (what the
                # pipeline actually ships): mostly background value.
                buf = np.full(n, 0xEE, np.uint8)
                ink = rng.random(n) < 0.15
                buf[ink] = rng.integers(0, 64, ink.sum(), dtype=np.uint8)
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                fetch(checksum(jnp.asarray(buf)))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            per_size.append((mb, best))
        # slope between largest two sizes ~ 1/rate
        (m1, t1), (m2, t2) = per_size[-2], per_size[-1]
        rate = (m2 - m1) / max(t2 - t1, 1e-9)
        results[kind] = (per_size, rate)
        str_sizes = ", ".join(f"{mb}MB:{t*1000:.0f}ms" for mb, t in per_size)
        print(f"  {kind:9s} {str_sizes}  -> ~{rate:.1f} MB/s marginal")
    return results


def bench_host_page():
    print("== host per-page costs (2560x1792 page, 40 lines)")
    rng = np.random.default_rng(0)
    page = rng.integers(0, 256, (2560, 1792), dtype=np.uint8)

    def timeit(f, reps=20):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best * 1000

    t_resize = timeit(lambda: cv2.resize(page, (448, 640), interpolation=cv2.INTER_AREA))
    print(f"  resize 1/4 INTER_AREA: {t_resize:.1f} ms")

    q = ((page.astype(np.uint16) + 8) // 17).astype(np.uint8)
    t_pack = timeit(lambda: (q[:, 0::2] << 4) | q[:, 1::2])
    print(f"  4-bit pack full page:  {t_pack:.1f} ms")

    # 40 line crops 32x896 via cv2.remap (bilinear), like crop_engine
    map_x = np.tile(np.linspace(40, 850, 896, dtype=np.float32), (32, 1))
    map_y = np.tile(np.linspace(100, 131.7, 32, dtype=np.float32)[:, None], (1, 896))

    def remap40():
        for i in range(40):
            cv2.remap(page, map_x, map_y + i * 56, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_CONSTANT)

    t_remap = timeit(remap40, reps=10)
    print(f"  cv2.remap 40 crops 32x896: {t_remap:.1f} ms")

    crops = np.zeros((40, 32, 896), np.uint8)
    qq = crops.astype(np.uint16)
    t_packc = timeit(lambda: (((qq + 8) // 17)[..., 0::2].astype(np.uint8) << 4))
    print(f"  4-bit pack 40 crops:   {t_packc:.1f} ms")
    return dict(resize=t_resize, pack=t_pack, remap=t_remap)


def bench_device_chain(K=8, reps=3):
    print(f"== device costs via {K}-chained dispatches")
    from pero_ocr_tpu.models.parsenet import ParseNet
    from pero_ocr_tpu.models.recognizer import CTCRecognizer, RecognizerSpec
    from pero_ocr_tpu.ops import ctc as ctc_ops

    parsenet = ParseNet()
    pn_params = parsenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    spec = RecognizerSpec(num_classes=80, line_height=32,
                          conv_features=(48, 96, 192, 384), subsampling=4,
                          lstm_layers=2, lstm_features=256)
    rec = CTCRecognizer(spec)
    rec_params = rec.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)))

    @jax.jit
    def pn_fwd(x):
        return parsenet.apply(pn_params, x).sum()

    @jax.jit
    def rec_fwd(x):
        logits = rec.apply(rec_params, x / 255.0)
        valid = jnp.full((x.shape[0],), logits.shape[1], jnp.int32)
        labels, lengths = ctc_ops.greedy_ctc_labels(logits, valid)
        return lengths.sum()

    pn_in = jnp.zeros((4, 640, 448, 3), jnp.float32)   # 4 pages @ 1/4 res
    rec_in = jnp.zeros((160, 32, 1024, 3), jnp.float32)  # 4 pages x 40 lines

    for name, fn, x in (("parsenet(4pg)", pn_fwd, pn_in),
                        ("recognize(160 lines)", rec_fwd, rec_in)):
        fetch(fn(x))  # compile + warm
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            y = fn(x)
            for _ in range(K - 1):
                y = fn(x + y.astype(x.dtype))  # chain dependency
            fetch(y)
            tK = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(fn(x))
            t1 = time.perf_counter() - t0
            per = (tK - t1) / (K - 1) * 1000
            best = per if best is None else min(best, per)
        print(f"  {name}: {best:.1f} ms/dispatch ({best/4:.1f} ms/page)")


def bench_transport_floor(reps=6):
    """The crop-transport pipeline's LINK FLOOR: move exactly its
    per-batch bytes (4-bit small pages + 4-bit crops up; packed masks +
    quantized heights + uint8 labels down) through a TRIVIAL device
    program — no model compute.  If end-to-end pages/s ~= this floor,
    the tunnel is saturated and device compute is fully hidden."""
    print("== crop-transport link floor (pb=4, 40 lines/page)")
    rng = np.random.default_rng(1)
    small = rng.integers(0, 256, (4, 640, 224), np.uint8)      # 4-bit pages
    crops = np.full((160, 32, 512), 0xEE, np.uint8)            # 4-bit crops
    ink = rng.random(crops.shape) < 0.15
    crops[ink] = rng.integers(0, 64, ink.sum())

    @jax.jit
    def move(small_u8, crops_u8):
        packed = small_u8[:, :, :112] ^ jnp.uint8(1)           # (4,640,112)
        heights = jnp.repeat(
            small_u8[:, ::2, :], 2, axis=2
        )[:, :320, :448].reshape(4, 320, 224, 2)               # (4,320,224,2)
        labels = crops_u8[:, 0, :256].reshape(4, 40, 256)      # (4,40,256)
        return packed, heights, labels

    fetch_all = lambda outs: [np.asarray(o) for o in outs]
    fetch_all(move(jnp.asarray(small), jnp.asarray(crops)))    # warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_all(move(jnp.asarray(small), jnp.asarray(crops)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    up_mb = (small.nbytes + crops.nbytes) / 1e6
    down_mb = (4 * 640 * 112 + 4 * 320 * 224 * 2 + 4 * 40 * 256) / 1e6
    print(
        f"  {up_mb:.2f}MB up + {down_mb:.2f}MB down per 4-page batch: "
        f"{best*1000:.0f} ms -> floor {4/best:.1f} pages/s"
    )
    return 4 / best


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    bench_upload()
    bench_host_page()
    bench_device_chain()
    bench_transport_floor()
