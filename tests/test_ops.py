"""Device-op tests (run on CPU backend): warp parity vs cv2.remap, greedy
CTC vs a straightforward host oracle, batched Viterbi vs the host
implementation."""

import cv2
import numpy as np
import pytest

from pero_ocr_tpu.core import line_geometry
from pero_ocr_tpu.core.force_alignment import force_align
from pero_ocr_tpu.ops import ctc, morphology, warp


@pytest.fixture(scope="module")
def page_image():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 255, size=(200, 300, 3)).astype(np.float32)


class TestWarp:
    def _field(self):
        baseline = np.array([[20, 100], [280, 110]], dtype=float)
        return line_geometry.warp_field(baseline, [20, 6], 32)

    def test_matches_cv2_remap(self, page_image):
        field = self._field()
        ours = np.asarray(
            warp.warp_lines_xla(page_image, field[None])
        )[0]
        ref = cv2.remap(
            page_image,
            field[:, :, 0],
            field[:, :, 1],
            interpolation=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
        )
        # cv2 uses fixed-point arithmetic; allow ~1 intensity step.
        assert np.abs(ours - ref).max() < 1.5

    def test_out_of_bounds_zero(self, page_image):
        field = self._field() + 1000.0  # entirely outside
        out = np.asarray(warp.warp_lines_xla(page_image, field[None]))[0]
        assert np.all(out == 0)

    def test_batched_lines(self, page_image):
        f1 = self._field()
        f2 = line_geometry.warp_field(
            np.array([[30, 50], [270, 48]], dtype=float), [18, 5], 32
        )
        stacked, widths = warp.pad_fields([f1, f2], 512)
        out = np.asarray(warp.warp_lines_xla(page_image, stacked))
        assert out.shape == (2, 32, 512, 3)
        # Padded columns are zero.
        assert np.all(out[0, :, widths[0] :] == 0)
        assert np.abs(out[0, :, : widths[0]]).max() > 0

    def test_width_buckets(self):
        groups = warp.width_buckets([100, 500, 900, 5000], [128, 512, 1024])
        assert groups[0] == [0]
        assert groups[1] == [1]
        assert groups[2] == [2, 3]  # oversized line lands in largest bucket


class TestGreedyCTC:
    def test_collapse(self):
        # T=6, C=4 (blank=3): frames argmax = [1, 1, 3, 2, 2, 1] -> "1,2,1"
        logits = np.full((1, 6, 4), -5.0, np.float32)
        for t, k in enumerate([1, 1, 3, 2, 2, 1]):
            logits[0, t, k] = 5.0
        packed, lengths = ctc.greedy_ctc_labels(logits, np.array([6]))
        assert int(lengths[0]) == 3
        assert np.asarray(packed)[0, :3].tolist() == [1, 2, 1]

    def test_valid_frames_truncation(self):
        logits = np.full((1, 6, 4), -5.0, np.float32)
        for t, k in enumerate([1, 3, 2, 0, 0, 0]):
            logits[0, t, k] = 5.0
        packed, lengths = ctc.greedy_ctc_labels(logits, np.array([3]))
        assert int(lengths[0]) == 2
        assert np.asarray(packed)[0, :2].tolist() == [1, 2]

    def test_labels_to_strings(self):
        packed = np.array([[0, 1, -1], [2, -1, -1]])
        lengths = np.array([2, 1])
        out = ctc.labels_to_strings(packed, lengths, ["a", "b", "c", "​"])
        assert out == ["ab", "c"]

    def test_batch_against_oracle(self):
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(8, 40, 10)).astype(np.float32)
        valid = rng.integers(10, 41, size=8)
        packed, lengths = ctc.greedy_ctc_labels(logits, valid)
        packed, lengths = np.asarray(packed), np.asarray(lengths)
        for i in range(8):
            best = logits[i, : valid[i]].argmax(-1)
            oracle = []
            prev = None
            for s in best:
                if s != prev and s != 9:
                    oracle.append(int(s))
                prev = s
            assert packed[i, : lengths[i]].tolist() == oracle


class TestBatchedViterbi:
    def test_matches_host_viterbi(self):
        rng = np.random.default_rng(7)
        b, t, c, lmax = 5, 30, 8, 6
        blank = c - 1
        logprobs = np.log(
            rng.dirichlet(np.ones(c), size=(b, t)).astype(np.float64)
        ).astype(np.float32)
        labels = np.zeros((b, lmax), dtype=np.int32)
        label_lengths = rng.integers(1, lmax + 1, size=b)
        frame_lengths = rng.integers(15, t + 1, size=b)
        for i in range(b):
            labels[i, : label_lengths[i]] = rng.integers(
                0, blank, size=label_lengths[i]
            )

        state_path, char_path, valid = ctc.viterbi_align_batch(
            logprobs, labels, label_lengths, frame_lengths
        )
        state_path = np.asarray(state_path)
        valid = np.asarray(valid)

        for i in range(b):
            assert valid[i]
            host_path = force_align(
                -logprobs[i, : frame_lengths[i]],
                labels[i, : label_lengths[i]].tolist(),
                blank,
                return_seq_positions=False,
            )
            # Compare path costs (ties can differ; cost must match).
            states = np.zeros(2 * label_lengths[i] + 1, dtype=int)
            states[1::2] = labels[i, : label_lengths[i]]
            states[::2] = blank
            dev_syms = states[state_path[i, : frame_lengths[i]]]
            dev_cost = logprobs[
                i, np.arange(frame_lengths[i]), dev_syms
            ].sum()
            host_cost = logprobs[
                i, np.arange(frame_lengths[i]), host_path
            ].sum()
            assert dev_cost == pytest.approx(host_cost, abs=1e-3)

    def test_impossible_alignment_flagged(self):
        logprobs = np.full((1, 2, 3), -1.0, np.float32)
        labels = np.array([[0, 0]], dtype=np.int32)  # 'aa' needs 3 frames
        _, _, valid = ctc.viterbi_align_batch(
            logprobs, labels, np.array([2]), np.array([2])
        )
        assert not bool(np.asarray(valid)[0])

    def test_align_text_batch(self):
        low, high = 10.0, 0.1  # neg logprob style built as logprobs
        lp = np.log(
            np.array(
                [
                    [[0.9, 0.05, 0.05], [0.05, 0.9, 0.05], [0.05, 0.05, 0.9]],
                ]
            )
        ).astype(np.float32)
        # labels [0, 1], blank=2: path should be 0,1,blank -> char frames [0, 1]
        pos, valid = ctc.align_text_batch(
            lp, np.array([[0, 1]], dtype=np.int32), np.array([2]), np.array([3])
        )
        assert valid[0]
        assert pos[0].tolist() == [0, 1]


class TestMorphology:
    def test_grey_dilation(self):
        x = np.zeros((10, 10), np.float32)
        x[5, 5] = 1.0
        out = np.asarray(morphology.grey_dilation(x, 3, 3))
        assert out[4:7, 4:7].min() == 1.0
        assert out[0, 0] == 0.0

    def test_vertical_nms(self):
        x = np.zeros((10, 3), np.float32)
        x[4, 1] = 0.5
        x[5, 1] = 1.0
        out = np.asarray(morphology.vertical_nonmaxima_suppression(x, 3))
        assert out[5, 1] == 1.0
        assert out[4, 1] == 0.0

    def test_box_smooth_preserves_mean(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(32, 32)).astype(np.float32)
        out = np.asarray(morphology.box_smooth(x, 3))
        assert out.mean() == pytest.approx(x.mean(), rel=0.05)

    def test_connected_components(self):
        mask = np.zeros((10, 10), np.uint8)
        mask[1:3, 1:3] = 1
        mask[7:9, 7:9] = 1
        labels, num = morphology.connected_components(mask)
        assert num == 2
        assert labels[1, 1] != labels[7, 7]


class TestGreedyWorstRunConfidence:
    def test_matches_host_get_prob(self):
        """In-graph confidence equals the host get_prob on softmaxed
        greedy runs (reference: page_parser.py:437-450)."""
        import jax.numpy as jnp

        from pero_ocr_tpu.document.page_parser import get_prob
        from pero_ocr_tpu.ops.ctc import greedy_worst_run_confidence
        from pero_ocr_tpu.ocr.softmax import softmax

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(3, 17, 6)).astype(np.float32) * 3
        valid = np.array([17, 11, 5], np.int32)

        got = np.asarray(greedy_worst_run_confidence(
            jnp.asarray(logits), jnp.asarray(valid)
        ))
        for i in range(3):
            probs = softmax(logits[i, : valid[i]], axis=-1)
            best_ids = probs.argmax(-1)
            best_probs = probs.max(-1)
            ref = get_prob(best_ids, best_probs)
            assert got[i] == pytest.approx(ref, abs=1e-5), i

    def test_empty_line_is_confident(self):
        import jax.numpy as jnp

        from pero_ocr_tpu.ops.ctc import greedy_worst_run_confidence

        logits = np.zeros((1, 8, 4), np.float32)
        out = np.asarray(greedy_worst_run_confidence(
            jnp.asarray(logits), jnp.asarray([0], np.int32)
        ))
        assert out[0] == 1.0
