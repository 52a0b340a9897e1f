#!/usr/bin/env python3
"""Interleaved A/B: how much wall does the full loop's consumer work
(PageLayout assembly + Page XML) really add, same process/same weather?

A = honest loop, results discarded (labels touched only).
B = full loop, assemble+xml INLINE per page as results stream.
C = full loop, results buffered; assemble+xml AFTER the stream ends
    (same total consumer work, zero overlap with the wire).
D = full loop, assemble+xml in ONE worker thread overlapped DURING
    streaming — the exact ThreadPoolExecutor shape bench.timed_run_full
    and FastPagePipeline.process_pages ship (ADVICE r4: B and C alone
    never measured the shipped variant).

Uncontended assemble+xml is 7.4 ms/page on these shapes; the r4 profile
saw B cost ~50 ms/page over A (sequential rows, so weather drift was a
confound).  Interleaving removes the confound.

Run alone on the chip (CLAUDE.md: one TPU process at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pero_ocr_tpu.utils.jax_setup import configure

configure()

import bench
from pero_ocr_tpu.document.fast_pipeline import assemble_page_layout
from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

PB = bench.HONEST_PAGE_BATCH


def consume(r):
    layout = assemble_page_layout(
        r, f"p{r.page_index:04d}", (bench.PAGE_H, bench.PAGE_W),
        bench.BENCH_CHARS,
    )
    layout.to_pagexml_string()


def run(pages, pipe, mode):
    from concurrent.futures import ThreadPoolExecutor

    page_list = [pages[i % len(pages)] for i in range(bench.BENCH_PAGES)]
    buffered = []
    if mode == "D":
        with ThreadPoolExecutor(max_workers=1) as pool:
            t0 = time.perf_counter()
            futures = [
                pool.submit(consume, r)
                for r in pipe.run(page_list, page_batch=PB)
            ]
            for f in futures:
                f.result()
            return time.perf_counter() - t0
    t0 = time.perf_counter()
    for r in pipe.run(page_list, page_batch=PB):
        if mode == "A":
            if r.label_lengths is not None:
                int(r.label_lengths.sum())
        elif mode == "B":
            consume(r)
        else:
            buffered.append(r)
    for r in buffered:
        consume(r)
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    pages = [bench.make_page(rng) for _ in range(3)]
    noisy = bench.make_noisy(pages, np.random.default_rng(7))
    pn_vars = bench.trained_parsenet_variables(
        bench.bench_parsenet(), pages, noisy
    )
    pipe = bench.build_pipeline(TPUPagePipeline, pn_variables=pn_vars)
    bench.warm(pages, pipe, None, PB, n_pages=3 * PB)
    print(f"# steady ds={pipe._last_ds}", file=sys.stderr)

    walls = {m: [] for m in "ABCD"}
    for trial in range(4):
        for m in "ABCD":
            walls[m].append(run(pages, pipe, m))
            print(f"trial {trial} {m}: {walls[m][-1] * 1000:.0f} ms",
                  flush=True)
    for m in "ABCD":
        best = min(walls[m])
        print(f"{m}: best {best * 1000:.0f} ms "
              f"({bench.BENCH_PAGES / best:.1f} pages/s) "
              f"all={[f'{w * 1000:.0f}' for w in walls[m]]}")


if __name__ == "__main__":
    main()
