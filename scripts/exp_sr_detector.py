"""Train + evaluate the SR-head bench detector at every adaptation stop.

Backs the BASELINE.md round-5 detector-quality records.  Trains the
bench ParseNet (bench.trained_parsenet_variables — cached under
~/.cache/pero_test_ckpt, delete the bench_pn_* file to retrain) and
then, for each ladder scale the adaptive downsample can visit on the
bench pages, measures against bench.page_lines ground truth:

  - line recall (GT lines with a detected baseline within 12 px
    vertically and >= 50% horizontal overlap) and phantom count,
  - the native CC parse's median ascender height (what
    _adapt_from_stats feeds the band decision),
  - the adaptation decision itself (expected: ds 4 -> 2, ds 2 stays).

Run on the real chip (training is device-bound); the eval side is the
host CC parse on fetched artifacts, identical to the pipeline's.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pero_ocr_tpu.utils.jax_setup import configure

configure(cpu=os.environ.get("SR_PROBE_CPU", "") == "1")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline  # noqa: E402


def eval_scale(pipe, pages, map_ds, label):
    gt_bl, gt_hh = bench.page_lines(pages[0])
    small = np.stack(
        [pipe._canvas(pipe._gray(p), map_ds) for p in pages]
    )
    dev = pipe._unpack_canvas_dev(jnp.asarray(pipe._pack_canvas(small)))
    outs = pipe._stage_a_small(dev)
    packed, heights_q, sep_q = jax.tree_util.tree_map(np.asarray, outs)
    arts = TPUPagePipeline._StageAArtifacts(packed, heights_q, sep_q, pipe)

    hit_total = gt_total = phantom = det_total = 0
    asc_err = []
    for s in range(len(pages)):
        out = pipe._lines_from_packed(packed[s], heights_q[s], map_ds)
        if out is None:
            print("  native kernel unavailable"); return
        b_list, h_list, _, _ = out
        det_total += len(b_list)
        used = [False] * len(b_list)
        for gb, (gasc, gdesc) in zip(gt_bl, gt_hh):
            gy, gx0, gx1 = gb[0][1], gb[0][0], gb[1][0]
            gt_total += 1
            best = None
            for j, (db, dh) in enumerate(zip(b_list, h_list)):
                if used[j]:
                    continue
                dy = float(np.median(db[:, 1]))
                dx0, dx1 = float(db[:, 0].min()), float(db[:, 0].max())
                ov = min(dx1, gx1) - max(dx0, gx0)
                if abs(dy - gy) <= 12 and ov >= 0.5 * (gx1 - gx0):
                    best = j
                    break
            if best is not None:
                used[best] = True
                hit_total += 1
                asc_err.append(h_list[best][0] - gasc)
        phantom += sum(1 for u in used if not u)
    pipe._last_ds = map_ds
    decision = pipe._adapt_artifacts(arts, map_ds)
    sticky = pipe._last_ds
    asc_err = np.array(asc_err) if asc_err else np.array([np.nan])
    print(
        f"{label} map_ds={map_ds}: recall {hit_total}/{gt_total}"
        f" ({hit_total / max(gt_total, 1):.3f}), phantoms {phantom},"
        f" det {det_total}; asc err med {np.median(asc_err):+.1f} px;"
        f" adapt -> {decision} (sticky {sticky})"
    )
    return hit_total / max(gt_total, 1), phantom, sticky


def main():
    rng = np.random.default_rng(0)
    pages = [bench.make_page(rng) for _ in range(3)]
    noisy = bench.make_noisy(pages, np.random.default_rng(7))

    t0 = time.time()
    pn_vars = bench.trained_parsenet_variables(
        bench.bench_parsenet(), pages, noisy
    )
    print(f"train(+cache load): {time.time() - t0:.1f}s")

    pipe = bench.build_pipeline(TPUPagePipeline, 4, pn_variables=pn_vars)
    for map_ds in (4, 2, 3):
        pipe._last_ds = map_ds
        eval_scale(pipe, pages, map_ds, "clean")
    for map_ds in (4, 2):
        pipe._last_ds = map_ds
        eval_scale(pipe, noisy, map_ds, "noisy")

    # The ladder walk the honest loop actually takes from the default.
    pipe._last_ds = 4
    r4, _, s4 = eval_scale(pipe, pages, 4, "walk")
    if s4 != 4:
        eval_scale(pipe, pages, s4, "walk")


if __name__ == "__main__":
    main()
