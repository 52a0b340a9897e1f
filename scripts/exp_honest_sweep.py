#!/usr/bin/env python3
"""One-process A/B for the honest-CNN loop (real trained detector, CC
parse + clustering in the measured loop): crop_lag {1,2} x page_batch
{4,8}, interleaved across the same link weather.
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


def run_once(pipeline, pages, pb, lag):
    pipeline.crop_lag = lag
    page_list = [pages[i % len(pages)] for i in range(N_PAGES)]
    t0 = time.perf_counter()
    for result in pipeline.run(page_list, page_batch=pb):
        if result.label_lengths is not None:
            int(result.label_lengths.sum())
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    pages = [bench.make_page(rng) for _ in range(3)]
    pn_vars = bench.trained_parsenet_variables(bench.bench_parsenet(), pages)
    pipeline = bench.build_pipeline(TPUPagePipeline, pn_variables=pn_vars)

    variants = [(4, 2), (4, 1), (8, 2), (8, 1)]
    results = {v: [] for v in variants}
    for pb, lag in variants:
        print(f"# warm pb={pb} lag={lag}", file=sys.stderr, flush=True)
        run_once(pipeline, pages, pb, lag)

    GLOBAL_TIMING.reset()
    for trial in range(5):
        for pb, lag in variants:
            dt = run_once(pipeline, pages, pb, lag)
            results[(pb, lag)].append(dt)
            print(f"# trial {trial} pb={pb} lag={lag}: "
                  f"{N_PAGES / dt:.2f} pages/s", file=sys.stderr, flush=True)

    for v in variants:
        ts = sorted(results[v])
        print(f"pb={v[0]} lag={v[1]}: best {N_PAGES / ts[0]:.2f} pages/s "
              f"(median {N_PAGES / ts[2]:.2f})")
    print(timing_report())


if __name__ == "__main__":
    main()
