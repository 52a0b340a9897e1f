#!/usr/bin/env python3
"""Per-stage wall-time attribution of the honest-CNN loop (real chip).

The r3 honest number (20.7 pages/s = 386 ms per 8-page batch) sits at
52% of the override headline (201 ms/batch).  This runs BOTH loops over
the bench stream with the timing registry active and prints the
per-stage tables side by side, so the extra 185 ms/batch is attributed
to mask sync / host geometry / warp wait / flush rounds instead of
guessed at.

Run alone on the chip (CLAUDE.md: one TPU process at a time).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pero_ocr_tpu.utils.jax_setup import configure

configure()

import bench
from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline
from pero_ocr_tpu.utils.timing import GLOBAL_TIMING


def run_once(pages, pipe, override, pb):
    page_list = [pages[i % len(pages)] for i in range(bench.BENCH_PAGES)]
    t0 = time.perf_counter()
    for r in pipe.run(page_list, lines_override=override, page_batch=pb):
        if r.label_lengths is not None:
            int(r.label_lengths.sum())
    return time.perf_counter() - t0


def run_once_full(pages, pipe, pb):
    """The r4 headline loop: detection + recognition + PageLayout
    assembly + Page XML bytes (bench.timed_run_full semantics), with
    the consumer-side work stage-attributed."""
    from pero_ocr_tpu.document.fast_pipeline import assemble_page_layout
    from pero_ocr_tpu.utils.timing import stage_timer

    page_list = [pages[i % len(pages)] for i in range(bench.BENCH_PAGES)]
    t0 = time.perf_counter()
    for r in pipe.run(page_list, page_batch=pb):
        with stage_timer("consume/assemble"):
            layout = assemble_page_layout(
                r, f"p{r.page_index:04d}",
                (bench.PAGE_H, bench.PAGE_W), bench.BENCH_CHARS,
            )
        with stage_timer("consume/xml"):
            layout.to_pagexml_string()
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    pages = [bench.make_page(rng) for _ in range(3)]

    head = bench.build_pipeline(TPUPagePipeline)
    # Same detector (and ckpt cache entry) as bench.py main: trained on
    # clean + noisy variants at every ladder scale.
    noisy = bench.make_noisy(pages, np.random.default_rng(7))
    pn_vars = bench.trained_parsenet_variables(
        bench.bench_parsenet(), pages, noisy
    )
    honest = bench.build_pipeline(TPUPagePipeline, pn_variables=pn_vars)

    bench.warm(pages, head, bench.page_lines)
    bench.warm(pages, honest, None, bench.HONEST_PAGE_BATCH,
               n_pages=3 * bench.HONEST_PAGE_BATCH)

    for name, pipe, override in (
        ("override", head, bench.page_lines),
        ("honest", honest, None),
        ("full(+assembly+xml)", honest, "FULL"),
    ):
        best = None
        for _ in range(3):
            GLOBAL_TIMING.reset()
            if override == "FULL":
                t = run_once_full(pages, pipe, bench.HONEST_PAGE_BATCH)
            else:
                t = run_once(pages, pipe, override,
                             bench.HONEST_PAGE_BATCH)
            if best is None or t < best:
                best = t
                report = GLOBAL_TIMING.report()
        pps = bench.BENCH_PAGES / best
        print(f"\n=== {name}: {best * 1000:.0f} ms total "
              f"({pps:.1f} pages/s) ===")
        print(report)


if __name__ == "__main__":
    main()
