#!/usr/bin/env python3
"""One-process A/B: override-mode crop loop (no mask fetch, no lag
flushes, deferred label fetch) vs the legacy lagged loop, at page_batch
4 and 8.  Interleaves trials so variants sample the same link weather
(CLAUDE.md protocol).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pero_ocr_tpu.utils.jax_setup import configure

configure()

import bench
from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline
from pero_ocr_tpu.utils.timing import GLOBAL_TIMING, timing_report

N_PAGES = 16


def run_once(pipeline, pages, pb, loop):
    page_list = [pages[i % len(pages)] for i in range(N_PAGES)]
    fn = (pipeline._run_crops_override if loop == "new"
          else pipeline._run_crops)
    t0 = time.perf_counter()
    for result in fn(page_list, bench.page_lines, pb):
        if result.label_lengths is not None:
            int(result.label_lengths.sum())
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    pages = [bench.make_page(rng) for _ in range(3)]
    pipeline = bench.build_pipeline(TPUPagePipeline)

    variants = [("old", 4), ("new", 4), ("old", 8), ("new", 8)]
    results = {v: [] for v in variants}
    for loop, pb in variants:
        print(f"# warm {loop} pb={pb}", file=sys.stderr, flush=True)
        run_once(pipeline, pages, pb, loop)

    GLOBAL_TIMING.reset()
    for trial in range(5):
        for loop, pb in variants:
            dt = run_once(pipeline, pages, pb, loop)
            results[(loop, pb)].append(dt)
            print(f"# trial {trial} {loop} pb={pb}: "
                  f"{N_PAGES / dt:.2f} pages/s", file=sys.stderr, flush=True)

    for v in variants:
        ts = sorted(results[v])
        print(f"{v[0]} pb={v[1]}: best {N_PAGES / ts[0]:.2f} pages/s "
              f"(median {N_PAGES / ts[2]:.2f})")
    print(timing_report())


if __name__ == "__main__":
    main()
