#!/usr/bin/env python3
"""Split the combined program's device time (K-chained, one process).

Measures on the real chip, per 8-page batch of the bench shape:
  a) combined strip program (stage A + strip rebuild + recognize)
  b) stage A alone (ParseNet on the packed canvases)
  c) stage B strip alone (rebuild + recognize at crop_bucket=1024)
  d) stage B strip alone at a narrower rebuild bucket (768) — the bench
     lines are ~730 px wide, so the tail of the 1024 bucket is pure
     masked-zero MXU work.

All chained dispatches share one forced fetch ((t_K - t_1)/(K - 1),
CLAUDE.md protocol) so the tunnel RTT and upload cancel.
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
from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

PB = 8
K = 8


def chained_ms(dispatch, fetch_out, reps=3):
    def chain(kk):
        t0 = time.perf_counter()
        out = None
        for _ in range(kk):
            out = dispatch()
        np.asarray(fetch_out(out))
        return time.perf_counter() - t0

    chain(1)  # compile + warm
    best = None
    for _ in range(reps):
        t1 = chain(1)
        tk = chain(K)
        per = (tk - t1) / (K - 1)
        best = per if best is None else min(best, per)
    return best * 1000.0


def main():
    rng = np.random.default_rng(0)
    pages = [bench.make_page(rng) for _ in range(3)]
    pipe = bench.build_pipeline(TPUPagePipeline)

    small, payload = pipe._one_batch_payload(pages, bench.page_lines, PB)
    small_dev = jnp.asarray(small)
    strip_dev, offs_dev, wid_dev = (jnp.asarray(p) for p in payload)
    print(f"# strip shape {payload[0].shape}, widths max "
          f"{int(np.asarray(payload[2]).max())}", file=sys.stderr)

    combined = chained_ms(
        lambda: pipe._combined_strip(
            small_dev, strip_dev, offs_dev, wid_dev, PB, pipe.crop_bucket
        ),
        lambda o: o[3],
    )
    print(f"combined:      {combined:7.2f} ms/batch "
          f"({combined / PB:5.2f} ms/page)")

    a_only = chained_ms(
        lambda: pipe._stage_a(small_dev, pipe.downsample),
        lambda o: o[0],
    )
    print(f"stage A only:  {a_only:7.2f} ms/batch ({a_only / PB:5.2f})")

    b_only = chained_ms(
        lambda: pipe._stage_b_strip(
            strip_dev, offs_dev, wid_dev, PB, pipe.crop_bucket
        ),
        lambda o: o[0],
    )
    print(f"stage B @1024: {b_only:7.2f} ms/batch ({b_only / PB:5.2f})")

    # crop_bucket is baked into the jitted closures at __init__, so build
    # a fresh pipeline with the narrower bucket.
    from pero_ocr_tpu.models.parsenet import ParseNet
    from pero_ocr_tpu.models.recognizer import CTCRecognizer, RecognizerSpec

    parsenet = ParseNet(stem="s2d")
    pn_params = parsenet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    rec_spec = RecognizerSpec(
        num_classes=80, line_height=32,
        conv_features=(48, 96, 192, 384), subsampling=4,
        lstm_layers=2, lstm_features=256, stem="s2d",
    )
    recognizer = CTCRecognizer(rec_spec)
    rec_params = recognizer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3), jnp.float32)
    )
    pipe768 = TPUPagePipeline(
        parsenet, pn_params, recognizer, rec_params,
        downsample=4, crop_bucket=768, line_slot=bench.N_TEXT_ROWS,
        transport="crops", transport_bits=4,
    )
    small7, payload7 = pipe768._one_batch_payload(pages, bench.page_lines, PB)
    s7, o7, w7 = (jnp.asarray(p) for p in payload7)
    b_768 = chained_ms(
        lambda: pipe768._stage_b_strip(s7, o7, w7, PB, 768),
        lambda o: o[0],
    )
    print(f"stage B @768:  {b_768:7.2f} ms/batch ({b_768 / PB:5.2f})")

    c_768 = chained_ms(
        lambda: pipe768._combined_strip(
            jnp.asarray(small7), s7, o7, w7, PB, 768
        ),
        lambda o: o[3],
    )
    print(f"combined @768: {c_768:7.2f} ms/batch ({c_768 / PB:5.2f})")


if __name__ == "__main__":
    main()
