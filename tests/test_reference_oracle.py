"""Differential tests against the reference implementation as oracle.

The reference tree (/root/reference) ships pure-numpy modules that import
and run in this environment; these tests execute them side by side with
this repo's re-implementations on randomized fixtures and assert
bit/field equality, converting "semantics-compatible" docstring claims
into measured parity:

- pero_ocr/decoding/decoders.py:42-299  (greedy + prefix beam, LM, EOS,
  carry-h, prefix joining, insertion bonus)
- pero_ocr/core/force_alignment.py:13-165 (force_align / align_text)
- pero_ocr/sequence_alignment.py:4-161  (Levenshtein family)
- pero_ocr/error_summary.py:101-166     (ErrorsSummary)
- pero_ocr/decoding/confusion_networks.py:13-129
- pero_ocr/decoding/multisort.py, pero_ocr/ocr_engine/softmax.py

The reference package is imported from its own tree under its own name
(`pero_ocr` does not collide with `pero_ocr_tpu`).  Its numba-less
``jit`` fallback is broken for ``@jit(nopython=True)`` usage
(pero_ocr/utils.py:6-19), so a no-op decorator is shimmed in before
``core.force_alignment`` is imported.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest
from scipy.special import log_softmax

REFERENCE_ROOT = "/root/reference"

from pero_ocr_tpu.core import force_alignment as my_fa
from pero_ocr_tpu.decoding import confusion_networks as my_cn
from pero_ocr_tpu.decoding import decoders as my_decoders
from pero_ocr_tpu.decoding import multisort as my_ms
from pero_ocr_tpu import error_summary as my_es
from pero_ocr_tpu import sequence_alignment as my_sa
from pero_ocr_tpu.ocr import softmax as my_sm


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "pero_ocr")):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import pero_ocr.utils as ref_utils

        def _jit(*args, **kwargs):
            if args and callable(args[0]) and not kwargs:
                return args[0]
            return lambda fn: fn

        ref_utils.jit = _jit

        import pero_ocr.core.force_alignment as fa
        import pero_ocr.decoding.confusion_networks as cn
        import pero_ocr.decoding.decoders as decoders
        import pero_ocr.decoding.multisort as ms
        import pero_ocr.error_summary as es
        import pero_ocr.ocr_engine.softmax as sm
        import pero_ocr.sequence_alignment as sa

        yield SimpleNamespace(
            decoders=decoders, cn=cn, fa=fa, sa=sa, es=es, ms=ms, sm=sm
        )
    finally:
        sys.path.remove(REFERENCE_ROOT)


LETTERS = list("abcd ") + ["<BLANK>"]


def make_logprobs(rng, t, vocab, spread=4.0):
    """Normalized log-probs with occasional hard-pruned frames: some
    frames are near-pure blank so that select_relevant_logits (> -10)
    returns an empty set, exercising the skip branch in both decoders."""
    raw = rng.normal(size=(t, vocab)) * spread
    blankish = rng.random(t) < 0.25
    raw[blankish, :] = -30.0
    raw[blankish, -1] = 5.0
    return log_softmax(raw.astype(np.float64), axis=1)


def bag_items(bag):
    return [(h.transcript, h.vis_sc, h.lm_sc) for h in bag]


def assert_bags_equal(mine, theirs):
    a, b = bag_items(mine), bag_items(theirs)
    assert [x[0] for x in a] == [x[0] for x in b]
    np.testing.assert_allclose(
        [x[1] for x in a], [x[1] for x in b], rtol=0, atol=1e-9
    )
    lm_a = [x[2] for x in a]
    lm_b = [x[2] for x in b]
    if any(x is not None for x in lm_a) or any(x is not None for x in lm_b):
        np.testing.assert_allclose(lm_a, lm_b, rtol=0, atol=1e-9)


class FakeLM:
    """Deterministic numpy char LM over the non-blank vocabulary with the
    reference LMWrapper's interface (initial_h / log_probs / advance_h0 /
    eos_scores, ndarray hidden state that supports fancy indexing).
    Shared verbatim by both decoders, so any output difference is the
    decoder's."""

    def __init__(self, vocab, dim=6, seed=11):
        rng = np.random.default_rng(seed)
        self.emb = rng.normal(size=(vocab, dim))
        self.out = rng.normal(size=(dim, vocab))
        self.eos_w = rng.normal(size=(dim,))
        self.dim = dim

    def initial_h(self, batch):
        return np.zeros((batch, self.dim))

    def log_probs(self, h):
        return log_softmax(h @ self.out, axis=1)

    def advance_h0(self, char_inds, h):
        return np.tanh(0.9 * h + self.emb[np.asarray(char_inds, int)])

    def eos_scores(self, h):
        return h @ self.eos_w


class TestGreedyOracle:
    def test_greedy_matches_reference(self, ref):
        rng = np.random.default_rng(0)
        for trial in range(20):
            logits = make_logprobs(rng, int(rng.integers(3, 40)), len(LETTERS))
            mine = my_decoders.GreedyDecoder(LETTERS)(logits)
            theirs = ref.decoders.GreedyDecoder(LETTERS)(logits)
            assert_bags_equal(mine, theirs)

    def test_greedy_rejects_unnormalized(self, ref):
        bad = np.zeros((4, len(LETTERS)))
        with pytest.raises(ValueError):
            my_decoders.GreedyDecoder(LETTERS)(bad)
        with pytest.raises(ValueError):
            ref.decoders.GreedyDecoder(LETTERS)(bad)


class TestBeamOracle:
    @pytest.mark.parametrize("k", [1, 2, 8])
    def test_beam_no_lm(self, ref, k):
        rng = np.random.default_rng(100 + k)
        for trial in range(12):
            logits = make_logprobs(rng, int(rng.integers(4, 30)), len(LETTERS))
            mine = my_decoders.CTCPrefixLogRawNumpyDecoder(LETTERS, k=k)(logits)
            theirs = ref.decoders.CTCPrefixLogRawNumpyDecoder(LETTERS, k=k)(
                logits
            )
            assert_bags_equal(mine, theirs)

    @pytest.mark.parametrize("bonus", [0.0, 0.8])
    def test_beam_with_lm_and_insertion_bonus(self, ref, bonus):
        rng = np.random.default_rng(7 + int(bonus * 10))
        lm = FakeLM(len(LETTERS) - 1)
        for trial in range(8):
            logits = make_logprobs(rng, int(rng.integers(4, 25)), len(LETTERS))
            mine = my_decoders.CTCPrefixLogRawNumpyDecoder(
                LETTERS, k=4, lm=lm, lm_scale=0.7, insertion_bonus=bonus
            )(logits)
            theirs = ref.decoders.CTCPrefixLogRawNumpyDecoder(
                LETTERS, k=4, lm=lm, lm_scale=0.7, insertion_bonus=bonus
            )(logits)
            assert_bags_equal(mine, theirs)

    def test_beam_model_eos(self, ref):
        rng = np.random.default_rng(21)
        lm = FakeLM(len(LETTERS) - 1)
        logits = make_logprobs(rng, 18, len(LETTERS))
        mine = my_decoders.CTCPrefixLogRawNumpyDecoder(
            LETTERS, k=4, lm=lm, lm_scale=0.5
        )(logits, model_eos=True)
        theirs = ref.decoders.CTCPrefixLogRawNumpyDecoder(
            LETTERS, k=4, lm=lm, lm_scale=0.5
        )(logits, model_eos=True)
        assert_bags_equal(mine, theirs)

    def test_beam_carry_h_over(self, ref):
        """Two-segment decode with return_h / init_h (CARRY_H_OVER)."""
        rng = np.random.default_rng(33)
        lm = FakeLM(len(LETTERS) - 1)
        seg1 = make_logprobs(rng, 14, len(LETTERS))
        seg2 = make_logprobs(rng, 14, len(LETTERS))

        mine_dec = my_decoders.CTCPrefixLogRawNumpyDecoder(
            LETTERS, k=4, lm=lm, lm_scale=0.6
        )
        ref_dec = ref.decoders.CTCPrefixLogRawNumpyDecoder(
            LETTERS, k=4, lm=lm, lm_scale=0.6
        )
        mine1, mine_h = mine_dec(seg1, return_h=True)
        theirs1, ref_h = ref_dec(seg1, return_h=True)
        assert_bags_equal(mine1, theirs1)
        np.testing.assert_allclose(
            np.asarray(mine_h), np.asarray(ref_h), atol=1e-9
        )
        mine2 = mine_dec(seg2, init_h=mine_h)
        theirs2 = ref_dec(seg2, init_h=ref_h)
        assert_bags_equal(mine2, theirs2)

    def test_prefix_joining_fixture(self, ref):
        """A hand-built sequence where 'a' and 'a·a' style prefixes must
        join (the adjust_for_prefix_joining path)."""
        t, v = 7, len(LETTERS)
        raw = np.full((t, v), -14.0)
        a = LETTERS.index("a")
        b = LETTERS.index("b")
        blank = len(LETTERS) - 1
        for row, (i, j) in enumerate(
            [(a, blank), (a, blank), (blank, a), (a, b), (a, blank),
             (b, a), (blank, a)]
        ):
            raw[row, i] = 2.4
            raw[row, j] = 2.0
        logits = log_softmax(raw, axis=1)
        for k in (2, 4, 8):
            mine = my_decoders.CTCPrefixLogRawNumpyDecoder(LETTERS, k=k)(
                logits
            )
            theirs = ref.decoders.CTCPrefixLogRawNumpyDecoder(LETTERS, k=k)(
                logits
            )
            assert_bags_equal(mine, theirs)


class TestForceAlignOracle:
    def test_force_align_paths_equal(self, ref):
        rng = np.random.default_rng(5)
        blank = 7
        for trial in range(15):
            n_chars = int(rng.integers(1, 6))
            seq = rng.integers(0, 7, size=n_chars).tolist()
            t = int(2 * n_chars + 1 + rng.integers(1, 12))
            neg_logprobs = -log_softmax(rng.normal(size=(t, 8)) * 3, axis=1)
            mine = my_fa.force_align(neg_logprobs, seq, blank)
            theirs = ref.fa.force_align(neg_logprobs, seq, blank)
            assert mine == list(theirs)
            mine_pos = my_fa.force_align(
                neg_logprobs, seq, blank, return_seq_positions=True
            )
            theirs_pos = ref.fa.force_align(
                neg_logprobs, seq, blank, return_seq_positions=True
            )
            assert mine_pos == list(theirs_pos)

    def test_align_text_equal(self, ref):
        rng = np.random.default_rng(6)
        blank = 7
        for trial in range(10):
            n_chars = int(rng.integers(1, 6))
            seq = np.asarray(rng.integers(0, 7, size=n_chars))
            t = int(2 * n_chars + 1 + rng.integers(1, 10))
            neg_logprobs = -log_softmax(rng.normal(size=(t, 8)) * 3, axis=1)
            mine = my_fa.align_text(neg_logprobs, seq, blank)
            theirs = ref.fa.align_text(neg_logprobs, seq, blank)
            np.testing.assert_array_equal(np.asarray(mine), np.asarray(theirs))


class TestSequenceAlignmentOracle:
    def cases(self):
        rng = np.random.default_rng(9)
        out = []
        for trial in range(25):
            src = rng.integers(0, 5, size=int(rng.integers(0, 12))).tolist()
            tgt = rng.integers(0, 5, size=int(rng.integers(0, 12))).tolist()
            out.append((src, tgt))
        out.append((list("kitten"), list("sitting")))
        out.append(([], []))
        return out

    def test_distance(self, ref):
        for src, tgt in self.cases():
            assert my_sa.levenshtein_distance(src, tgt) == (
                ref.sa.levenshtein_distance(src, tgt)
            )

    def test_weighted_distance(self, ref):
        for src, tgt in self.cases():
            mine = my_sa.levenshtein_distance(
                src, tgt, sub_cost=3, ins_cost=2, del_cost=5
            )
            theirs = ref.sa.levenshtein_distance(
                src, tgt, sub_cost=3, ins_cost=2, del_cost=5
            )
            assert mine == theirs

    def test_alignment_and_path(self, ref):
        for src, tgt in self.cases():
            assert my_sa.levenshtein_alignment(src, tgt) == (
                ref.sa.levenshtein_alignment(src, tgt)
            )
            assert my_sa.levenshtein_alignment_path(src, tgt) == (
                list(ref.sa.levenshtein_alignment_path(src, tgt))
            )

    def test_edit_stats(self, ref):
        for src, tgt in self.cases():
            alig = ref.sa.levenshtein_alignment(src, tgt)
            assert tuple(my_sa.edit_stats_for_alignment(alig)) == (
                tuple(ref.sa.edit_stats_for_alignment(alig))
            )

    def test_substring_variants(self, ref):
        rng = np.random.default_rng(12)
        for trial in range(15):
            tgt = rng.integers(0, 4, size=int(rng.integers(1, 14))).tolist()
            src = rng.integers(0, 4, size=int(rng.integers(1, 8))).tolist()
            assert my_sa.levenshtein_distance_substring(src, tgt) == (
                ref.sa.levenshtein_distance_substring(src, tgt)
            )
            assert my_sa.levenshtein_alignment_substring(src, tgt) == (
                ref.sa.levenshtein_alignment_substring(src, tgt)
            )


class TestErrorSummaryOracle:
    def test_from_lists_and_aggregate(self, ref):
        rng = np.random.default_rng(15)
        pairs = []
        for trial in range(12):
            n = int(rng.integers(0, 15))
            m = int(rng.integers(0, 15))
            r = "".join(rng.choice(list("abcde "), size=n))
            h = "".join(rng.choice(list("abcde "), size=m))
            pairs.append((list(r), list(h)))

        mine_all, theirs_all = [], []
        for r, h in pairs:
            mine = my_es.ErrorsSummary.from_lists(r, h)
            theirs = ref.es.ErrorsSummary.from_lists(r, h)
            self.assert_field_equal(mine, theirs)
            mine_all.append(mine)
            theirs_all.append(theirs)
        self.assert_field_equal(
            my_es.ErrorsSummary.aggregate(mine_all),
            ref.es.ErrorsSummary.aggregate(theirs_all),
        )

    @staticmethod
    def assert_field_equal(mine, theirs):
        for field in ("nb_lines_summarized", "ref_len", "nb_errors",
                      "nb_subs", "nb_inss", "nb_dels"):
            assert getattr(mine, field) == getattr(theirs, field), field
        if theirs.ref_len > 0:
            assert mine.error_rate == pytest.approx(theirs.error_rate)
        mine_conf = {k: dict(v) for k, v in mine.confusions.items()}
        theirs_conf = {k: dict(v) for k, v in theirs.confusions.items()}
        assert mine_conf == theirs_conf
        for field in ("correct", "sub", "ins", "dele", "nb_errors"):
            m = getattr(mine.ending_errors, field, None)
            t = getattr(theirs.ending_errors, field, None)
            if t is not None:
                assert m == t, f"ending_errors.{field}"


class TestConfusionNetworkOracle:
    def bags(self):
        rng = np.random.default_rng(18)
        out = []
        for trial in range(6):
            mine_bag = my_decoders.BagOfHypotheses()
            ref_mod = None  # filled by caller
            hyps = []
            for _ in range(int(rng.integers(2, 7))):
                n = int(rng.integers(0, 8))
                txt = "".join(rng.choice(list("abc "), size=n))
                hyps.append((txt, float(rng.normal() * 3),
                             float(rng.normal())))
            out.append(hyps)
        return out

    def test_cn_paths_equal(self, ref):
        from pero_ocr_tpu.decoding.bag_of_hypotheses import (
            BagOfHypotheses as MyBag,
        )
        import pero_ocr.decoding.bag_of_hypotheses as ref_boh

        for hyps in self.bags():
            mine_bag, theirs_bag = MyBag(), ref_boh.BagOfHypotheses()
            for txt, vis, lm in hyps:
                mine_bag.add(txt, vis, lm)
                theirs_bag.add(txt, vis, lm)
            mine_cn = my_cn.produce_cn_from_boh(mine_bag)
            theirs_cn = ref.cn.produce_cn_from_boh(theirs_bag)
            assert len(mine_cn) == len(theirs_cn)
            for mine_slot, theirs_slot in zip(mine_cn, theirs_cn):
                assert set(mine_slot) == set(theirs_slot)
                for key in theirs_slot:
                    assert mine_slot[key] == pytest.approx(theirs_slot[key])
            assert my_cn.best_cn_path(mine_cn) == (
                ref.cn.best_cn_path(theirs_cn)
            )
            mine_paths = my_cn.sorted_cn_paths(mine_cn)
            theirs_paths = ref.cn.sorted_cn_paths(theirs_cn)
            assert [p for p, _ in mine_paths] == [p for p, _ in theirs_paths]
            np.testing.assert_allclose(
                [s for _, s in mine_paths], [s for _, s in theirs_paths],
                atol=1e-9,
            )


class TestChunkMergeOracle:
    """Differential evidence for the chunk-merge semantics
    (PARITY.md §2.5) against the reference's
    merge_transcriptions_and_logits
    (pero_ocr/ocr_engine/line_ocr_engine.py:180-193): identical for any
    overlap > 0 (even AND odd), with exactly one deliberate divergence
    at overlap == 0, all verified against the reference code itself."""

    @pytest.fixture()
    def ref_merge(self, ref):
        import pero_ocr.ocr_engine.line_ocr_engine as ref_eng

        return ref_eng

    def test_find_best_overlap_identical(self, ref_merge):
        from pero_ocr_tpu.ocr.line_ocr_engine import find_best_overlap

        rng = np.random.default_rng(41)
        for trial in range(20):
            n = int(rng.integers(1, 15))
            t1 = "".join(rng.choice(list("abcd"), size=n))
            t2 = "".join(rng.choice(list("abcd"), size=int(rng.integers(1, 15))))
            assert find_best_overlap(t1, t2) == (
                ref_merge.find_best_overlap(t1, t2)
            )

    def test_even_overlap_merge_identical(self, ref_merge):
        from pero_ocr_tpu.ocr.line_ocr_engine import (
            merge_transcriptions_and_logits,
        )

        parts = ["hello wording", "ding dong end"]  # overlap 'ding' = 4, even
        logits = [np.arange(len(p) * 2.0).reshape(len(p), 2) for p in parts]
        mine_t, mine_l = merge_transcriptions_and_logits(parts, logits)
        ref_t, ref_l = ref_merge.merge_transcriptions_and_logits(parts, logits)
        assert ref_merge.find_best_overlap(parts[0], parts[1]) == 4
        assert mine_t == ref_t
        np.testing.assert_array_equal(mine_l, ref_l)

    def test_odd_overlap_merge_identical(self, ref_merge):
        """Odd overlaps too: the reference's `[:-overlap // 2]` parses as
        `[:(-overlap)//2]` — floor of a negative, i.e. it drops
        ceil(overlap/2) from the left and overlap//2 from the right,
        exactly `overlap` characters total.  (An earlier PARITY.md claim
        that the reference duplicated one character on odd overlaps was
        wrong; this test pins the measured agreement.)"""
        from pero_ocr_tpu.ocr.line_ocr_engine import (
            merge_transcriptions_and_logits,
        )

        parts = ["abcdexyz won", "xyz wonqrstu"]  # overlap 'xyz won' = 7, odd
        logits = [np.arange(len(p) * 2.0).reshape(len(p), 2) for p in parts]
        assert ref_merge.find_best_overlap(parts[0], parts[1]) == 7
        ref_t, ref_l = ref_merge.merge_transcriptions_and_logits(parts, logits)
        mine_t, mine_l = merge_transcriptions_and_logits(parts, logits)
        assert ref_t == mine_t == "abcdexyz wonqrstu"
        np.testing.assert_array_equal(mine_l, ref_l)

    def test_zero_overlap_divergence(self, ref_merge):
        """DELIBERATE DIVERGENCE: when no overlap scores CER<1 the
        reference slices result[:-0], which is the EMPTY string — the
        whole accumulated transcription is wiped.  This repo keeps it."""
        from pero_ocr_tpu.ocr.line_ocr_engine import (
            merge_transcriptions_and_logits,
        )

        parts = ["aaaa", "bbbb"]  # disjoint: every overlap CER >= 1
        logits = [np.zeros((4, 2)), np.ones((4, 2))]
        assert ref_merge.find_best_overlap(parts[0], parts[1]) == 0
        ref_t, _ = ref_merge.merge_transcriptions_and_logits(parts, logits)
        mine_t, _ = merge_transcriptions_and_logits(parts, logits)
        assert ref_t == "bbbb"  # reference drops 'aaaa' entirely
        assert mine_t == "aaaabbbb"


class TestSmallUtilOracle:
    def test_top_k(self, ref):
        rng = np.random.default_rng(23)
        for trial in range(12):
            a = rng.normal(size=(int(rng.integers(1, 6)),
                                 int(rng.integers(1, 9))))
            if a.size < 2:
                continue
            k = int(rng.integers(1, a.size))  # k < size: both defined
            for reverse in (False, True):
                mine = my_ms.top_k(a, k, reverse=reverse)
                theirs = ref.ms.top_k(a, k, reverse=reverse)
                np.testing.assert_array_equal(mine[0], theirs[0])
                np.testing.assert_array_equal(mine[1], theirs[1])

    def test_top_k_all_entries_divergence(self, ref):
        """DELIBERATE DIVERGENCE: for k >= a.size the reference returns a
        bare np.arange(len(a)) (multisort.py:8-9) — len of the FIRST axis,
        which is not a valid (rows, cols) index set for 2-D input.  This
        repo returns the correctly unraveled all-indices tuple.  The
        reference branch is unreachable from its own beam decoder (k is
        clamped to the finite count, and Pnb starts at -inf), so the beam
        oracle tests above are unaffected."""
        a = np.asarray([[3.0, 1.0], [2.0, 4.0]])
        theirs = ref.ms.top_k(a, k=4)
        np.testing.assert_array_equal(theirs, np.arange(2))  # ref quirk
        rows, cols = my_ms.top_k(a, k=4)
        got = sorted(zip(rows.tolist(), cols.tolist()))
        assert got == [(0, 0), (0, 1), (1, 0), (1, 1)]

    def test_softmax(self, ref):
        rng = np.random.default_rng(29)
        x = rng.normal(size=(5, 7)) * 4
        for axis in (None, 0, 1):
            np.testing.assert_allclose(
                my_sm.softmax(x, axis=axis), ref.sm.softmax(x, axis=axis),
                atol=1e-12,
            )
