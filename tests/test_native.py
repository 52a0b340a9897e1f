"""Native C++ runtime kernels vs Python/scipy references (skipped when the
library can't be built)."""

import numpy as np
import pytest

from pero_ocr_tpu.utils import native


pytestmark = pytest.mark.skipif(
    native.get_library() is None, reason="native library unavailable"
)


def _canonical(labels):
    seen = {}
    out = np.zeros_like(labels)
    for idx in zip(*np.nonzero(labels)):
        out[idx] = seen.setdefault(labels[idx], len(seen) + 1)
    return out


class TestConnectedComponents:
    def test_matches_scipy_partition(self):
        from scipy import ndimage

        rng = np.random.default_rng(1)
        mask = (rng.random((120, 180)) > 0.7).astype(np.uint8)
        labels_n, n_n = native.native_label(mask)
        labels_s, n_s = ndimage.label(mask, structure=np.ones((3, 3)))
        assert n_n == n_s
        np.testing.assert_array_equal(_canonical(labels_n), _canonical(labels_s))

    def test_empty_mask(self):
        labels, n = native.native_label(np.zeros((5, 5), np.uint8))
        assert n == 0
        assert not labels.any()

    def test_full_mask(self):
        labels, n = native.native_label(np.ones((5, 5), np.uint8))
        assert n == 1


class TestLevenshtein:
    @pytest.mark.parametrize(
        "a,b,d",
        [([1, 2, 3], [1, 2, 3], 0), ([1, 2], [2, 1], 2), ([], [1, 2], 2),
         ([1, 2, 3], [1, 3], 1)],
    )
    def test_cases(self, a, b, d):
        assert native.native_levenshtein(a, b) == d

    def test_batch(self):
        out = native.native_levenshtein_batch(
            [[1, 2, 3], [4]], [[1, 3], [4]]
        )
        assert out.tolist() == [1, 0]

    def test_integrated_into_sequence_alignment(self):
        from pero_ocr_tpu.sequence_alignment import levenshtein_distance

        assert levenshtein_distance(list("kitten"), list("sitting")) == 3
        # Works for arbitrary hashables through the id-mapping path.
        assert levenshtein_distance(["ab", "cd"], ["ab", "xy"]) == 1


class TestNativeViterbi:
    def test_matches_python(self):
        from pero_ocr_tpu.core.force_alignment import (
            _skip_allowed,
            complete_state_seq,
            viterbi_ctc,
        )

        rng = np.random.default_rng(2)
        costs = rng.uniform(0.1, 4.0, size=(30, 7)).astype(np.float32)
        states, _ = complete_state_seq([1, 2, 2, 3], 0)
        skip = _skip_allowed(states)
        gathered = costs[:, states]
        p_native = native.native_viterbi_ctc(gathered, skip)
        p_python = viterbi_ctc(gathered.astype(np.float64), skip)
        idx = np.arange(len(p_native))
        assert gathered[idx, p_native].sum() == pytest.approx(
            gathered[idx, p_python].sum(), abs=1e-3
        )

    def test_impossible_raises(self):
        from pero_ocr_tpu.core.force_alignment import (
            _skip_allowed,
            complete_state_seq,
        )

        states, _ = complete_state_seq([1, 1], 0)  # needs >= 3 frames
        skip = _skip_allowed(states)
        costs = np.full((2, len(states)), 1.0, np.float32)
        # make unreachable states infinite as force_align would
        gathered = costs.copy()
        with pytest.raises(ValueError):
            # T=2 < needed 3; final states unreachable only through the
            # (stay/advance) chain — emulate force_align's call.
            from pero_ocr_tpu.core.force_alignment import force_align

            force_align(np.full((2, 3), 1.0), [1, 1], 0)


class TestWarpAffineLines:
    """The batched native line warp must match cv2.warpAffine
    (INTER_LINEAR + WARP_INVERSE_MAP + BORDER_CONSTANT) within the
    float-vs-fixed-point interpolation gap, in both output layouts the
    pipeline ships (dense row-major and width-major strip)."""

    def _case(self):
        rng = np.random.default_rng(7)
        gray = rng.integers(0, 256, (64, 96), np.uint8)
        m = np.array([[0.55, 0.02, 3.2], [0.004, 0.93, 10.1]])
        return gray, m, 40, 16

    def test_matches_cv2_dense_layout(self):
        import cv2

        gray, m, w, hc = self._case()
        out = np.zeros((hc, w), np.uint8)
        ok = native.native_warp_affine_lines(
            gray, m[None], np.asarray([w], np.int32), hc, out,
            np.zeros(1, np.int64), stride_col=1, stride_row=w,
        )
        assert ok
        ref = cv2.warpAffine(
            gray, m, (w, hc),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_CONSTANT,
        )
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 2, diff.max()

    def test_strip_layout_is_transposed_dense(self):
        gray, m, w, hc = self._case()
        dense = np.zeros((hc, w), np.uint8)
        native.native_warp_affine_lines(
            gray, m[None], np.asarray([w], np.int32), hc, dense,
            np.zeros(1, np.int64), stride_col=1, stride_row=w,
        )
        strip = np.zeros((w, hc), np.uint8)
        native.native_warp_affine_lines(
            gray, m[None], np.asarray([w], np.int32), hc, strip,
            np.zeros(1, np.int64), stride_col=hc, stride_row=1,
        )
        np.testing.assert_array_equal(strip.T, dense)

    def test_multi_line_offsets(self):
        gray, m, w, hc = self._case()
        m2 = m.copy()
        m2[:, 2] += 5.0
        buf = np.zeros((2 * w, hc), np.uint8)
        native.native_warp_affine_lines(
            gray, np.stack([m, m2]), np.asarray([w, w], np.int32), hc,
            buf, np.asarray([0, w * hc], np.int64),
            stride_col=hc, stride_row=1,
        )
        one = np.zeros((w, hc), np.uint8)
        native.native_warp_affine_lines(
            gray, m2[None], np.asarray([w], np.int32), hc, one,
            np.zeros(1, np.int64), stride_col=hc, stride_row=1,
        )
        np.testing.assert_array_equal(buf[w:], one)

    def test_border_constant_zero(self):
        gray, _, w, hc = self._case()
        # Matrix mapping everything far outside the page.
        m = np.array([[1.0, 0.0, 500.0], [0.0, 1.0, 500.0]])
        out = np.full((hc, w), 99, np.uint8)
        native.native_warp_affine_lines(
            gray, m[None], np.asarray([w], np.int32), hc, out,
            np.zeros(1, np.int64), stride_col=1, stride_row=w,
        )
        assert (out == 0).all()


class TestSeparatorPenalties:
    """The batched native clustering penalties must match the python
    get_penalty/get_pair_penalty pair exactly (same rounding, span
    clipping, and denominator)."""

    def _setup(self):
        from pero_ocr_tpu.layout_engines.cnn_engine import ParagraphClusterer

        rng = np.random.default_rng(3)
        sep = rng.random((80, 120)).astype(np.float32)
        b_list, h_list = [], []
        for i in range(8):
            xs = np.sort(rng.uniform(0, 460, 6))
            ys = 30 + 40 * i + rng.normal(0, 3, 6)
            b_list.append(np.stack([xs, ys], 1))
            h_list.append([12.0 + rng.uniform(0, 4), 4.0])
        return ParagraphClusterer(), b_list, h_list, sep

    def test_matches_python_pairs(self):
        eng, b_list, h_list, sep = self._setup()
        pairs = np.array(
            [(i, j) for i in range(8) for j in range(i + 1, 8)]
        )
        pen = eng._pair_penalties_batch(b_list, h_list, pairs, sep, 4.0)
        assert pen is not None
        for (i, j), p in zip(pairs, pen):
            ref = eng.get_pair_penalty(
                b_list[i], b_list[j], h_list[i], h_list[j], sep, 4.0
            )
            # f32 map mass accumulates in a different order (double
            # accumulator vs numpy's pairwise f32) — bit differences
            # stay ~1e-9; anything near the 0.3 clustering threshold is
            # unaffected.
            assert p == pytest.approx(ref, abs=1e-6), (i, j)

    def test_clusters_unchanged(self):
        """make_clusters with and without the native path must agree."""
        from pero_ocr_tpu.layout_engines import helpers

        eng, b_list, h_list, sep = self._setup()
        t_list = [
            helpers.baseline_to_textline(b, h)
            for b, h in zip(b_list, h_list)
        ]
        native_clusters = eng.make_clusters(b_list, h_list, t_list, sep, 4.0)
        orig = eng._pair_penalties_batch
        eng._pair_penalties_batch = lambda *a, **k: None
        python_clusters = eng.make_clusters(b_list, h_list, t_list, sep, 4.0)
        eng._pair_penalties_batch = orig
        np.testing.assert_array_equal(native_clusters, python_clusters)

    @pytest.mark.parametrize("native_path", [True, False])
    def test_pooled_sep_map_equals_upsampled(self, native_path):
        """sep_pool > 1 (the pipeline ships the separator at pooled
        transport resolution) must reproduce the repeat-upsampled map's
        penalties and clusters exactly — in BOTH the native kernel and
        the python get_penalty fallback."""
        from pero_ocr_tpu.layout_engines import helpers

        eng, b_list, h_list, _ = self._setup()
        rng = np.random.default_rng(7)
        sf = 4
        pooled = rng.random((20, 30)).astype(np.float32)
        up = pooled.repeat(sf, 0).repeat(sf, 1)
        t_list = [
            helpers.baseline_to_textline(b, h)
            for b, h in zip(b_list, h_list)
        ]
        orig = eng._pair_penalties_batch
        if not native_path:
            eng._pair_penalties_batch = lambda *a, **k: None
        try:
            c_up = eng.make_clusters(b_list, h_list, t_list, up, 4.0)
            c_po = eng.make_clusters(
                b_list, h_list, t_list, pooled, 4.0, sep_pool=sf
            )
        finally:
            eng._pair_penalties_batch = orig
        np.testing.assert_array_equal(c_up, c_po)
        pairs = np.array([(0, 1), (2, 3), (4, 5)])
        pen_up = orig(b_list, h_list, pairs, up, 4.0)
        pen_po = orig(b_list, h_list, pairs, pooled, 4.0, pool=sf)
        if pen_up is not None:
            np.testing.assert_allclose(pen_up, pen_po, atol=1e-9)


class TestCCBaselines:
    """The one-pass C++ component-baseline extraction must match the
    python loop in _lines_from_masks exactly (unique-x first-y points,
    linspace decimation incl. endpoint pinning, +-2 x adjustments,
    percentile-50 heights)."""

    def _pipeline(self):
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        import jax.numpy as jnp

        from pero_ocr_tpu.models.parsenet import ParseNet
        from pero_ocr_tpu.models.recognizer import (
            CTCRecognizer,
            RecognizerSpec,
        )
        from pero_ocr_tpu.parallel.pipeline import TPUPagePipeline

        parsenet = ParseNet(base_features=4, depth=2)
        pn = parsenet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        spec = RecognizerSpec(
            num_classes=8, line_height=16, conv_features=(4, 8),
            subsampling=2, lstm_layers=1, lstm_features=8,
        )
        rec = CTCRecognizer(spec)
        rp = rec.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 3), jnp.float32)
        )
        return TPUPagePipeline(
            parsenet, pn, rec, rp, downsample=4, crop_height=16,
            crop_bucket=256, line_slot=8,
        )

    def test_matches_python_loop(self):
        import pero_ocr_tpu.utils.native as native_mod

        p = self._pipeline()
        rng = np.random.default_rng(9)
        # Random blobby masks: several horizontal runs + noise specks
        # (specks exercise the <=5 px skip).
        bmask = np.zeros((96, 160), np.uint8)
        for r in range(6):
            y = 8 + 14 * r
            x0 = int(rng.integers(0, 20))
            x1 = int(rng.integers(100, 158))
            bmask[y, x0:x1] = 1
            bmask[y + 1, x0 + 5 : x1 - 5] = rng.random(x1 - x0 - 10) > 0.5
        for _ in range(20):
            bmask[rng.integers(0, 96), rng.integers(0, 160)] = 1
        connected = bmask.copy()
        heights = rng.uniform(0, 9, (96, 160, 2)).astype(np.float32) - 1.0

        b_nat, h_nat = p._lines_from_masks(bmask, connected, heights)

        orig = native_mod.native_cc_baselines
        native_mod.native_cc_baselines = lambda *a, **k: None
        try:
            b_py, h_py = p._lines_from_masks(bmask, connected, heights)
        finally:
            native_mod.native_cc_baselines = orig

        assert len(b_nat) == len(b_py)
        for a, b in zip(b_nat, b_py):
            np.testing.assert_allclose(a, b)
        for a, b in zip(h_nat, h_py):
            np.testing.assert_allclose(a, b, rtol=1e-6)
