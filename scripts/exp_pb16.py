#!/usr/bin/env python3
"""One-process A/B: page_batch {8, 16} for BOTH the honest-CNN loop and
the headline override loop, interleaved across the same link weather.
With a ~200ms fixed per-round link charge, 16 pages in one batch cuts
the round count (honest: 4 -> 3, override: 3 -> 2).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pero_ocr_tpu.utils.jax_setup import configure

configure()

import bench
from pero_ocr_tpu.models.parsenet import ParseNet
from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

N_PAGES = 16


def run_once(pipeline, pages, pb, override):
    page_list = [pages[i % len(pages)] for i in range(N_PAGES)]
    kw = {}
    if override:
        kw["lines_override"] = [bench.page_lines(p) for p in page_list]
    t0 = time.perf_counter()
    for result in pipeline.run(page_list, page_batch=pb, **kw):
        if result.label_lengths is not None:
            int(result.label_lengths.sum())
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    pages = [bench.make_page(rng) for _ in range(3)]
    pn_vars = bench.trained_parsenet_variables(ParseNet(stem="s2d"), pages)
    honest = bench.build_pipeline(TPUPagePipeline, pn_variables=pn_vars)
    headline = bench.build_pipeline(TPUPagePipeline)

    variants = [
        ("honest", honest, 8, False),
        ("honest", honest, 16, False),
        ("headline", headline, 8, True),
        ("headline", headline, 16, True),
    ]
    results = {(n, pb): [] for n, _, pb, _ in variants}
    for name, pipe, pb, ov in variants:
        print(f"# warm {name} pb={pb}", file=sys.stderr, flush=True)
        run_once(pipe, pages, pb, ov)

    for trial in range(5):
        for name, pipe, pb, ov in variants:
            dt = run_once(pipe, pages, pb, ov)
            results[(name, pb)].append(dt)
            print(f"# trial {trial} {name} pb={pb}: "
                  f"{N_PAGES / dt:.2f} pages/s", file=sys.stderr, flush=True)

    for (name, pb), ts in results.items():
        ts = sorted(ts)
        print(f"{name} pb={pb}: best {N_PAGES / ts[0]:.2f} pages/s "
              f"(median {N_PAGES / ts[2]:.2f})")


if __name__ == "__main__":
    main()
