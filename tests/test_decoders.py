"""Decoder tests modeled on the reference's mixin-template strategy
(reference: test/test_decoding/test_decoders.py): hand-written 2-char +
blank log-prob fixtures applied to both the greedy decoder and the beam
decoder at beam 1 and wider, regression cases for prefix joining, and a
deterministic fake LM for analytically checkable LM fusion."""

import numpy as np
import pytest

from pero_ocr_tpu.decoding.bag_of_hypotheses import BagOfHypotheses
from pero_ocr_tpu.decoding.decoders import (
    BLANK_SYMBOL,
    CTCPrefixLogRawNumpyDecoder,
    GreedyDecoder,
)

LETTERS = ["a", "b", BLANK_SYMBOL]


def lp(rows):
    """Normalize rows of probabilities into log-probs."""
    arr = np.asarray(rows, dtype=np.float64)
    arr = arr / arr.sum(axis=1, keepdims=True)
    return np.log(arr)


class _Beam1Cases:
    """Shared decode cases every beam-1-capable decoder must pass."""

    def make(self, **kwargs):
        raise NotImplementedError

    def test_single_frame(self):
        decoder = self.make()
        bag = decoder(lp([[0.7, 0.2, 0.1]]))
        assert bag.best_hyp() == "a"

    def test_blank_only(self):
        decoder = self.make()
        bag = decoder(lp([[0.1, 0.1, 0.8]]))
        assert bag.best_hyp() == ""

    def test_repeat_collapsed(self):
        decoder = self.make()
        bag = decoder(lp([[0.9, 0.05, 0.05], [0.9, 0.05, 0.05]]))
        assert bag.best_hyp() == "a"

    def test_blank_separates_repeats(self):
        decoder = self.make()
        bag = decoder(
            lp([[0.9, 0.05, 0.05], [0.05, 0.05, 0.9], [0.9, 0.05, 0.05]])
        )
        assert bag.best_hyp() == "aa"

    def test_two_distinct_chars(self):
        decoder = self.make()
        bag = decoder(lp([[0.9, 0.05, 0.05], [0.05, 0.9, 0.05]]))
        assert bag.best_hyp() == "ab"

    def test_unnormalized_rejected(self):
        decoder = self.make()
        with pytest.raises(ValueError):
            decoder(np.zeros((2, 3)))


class TestGreedy(_Beam1Cases):
    def make(self):
        return GreedyDecoder(LETTERS)


class TestBeam1(_Beam1Cases):
    def make(self):
        return CTCPrefixLogRawNumpyDecoder(LETTERS, k=1)


class TestBeam4(_Beam1Cases):
    def make(self):
        return CTCPrefixLogRawNumpyDecoder(LETTERS, k=4)


class TestLetterValidation:
    def test_blank_must_be_last(self):
        with pytest.raises(ValueError):
            GreedyDecoder([BLANK_SYMBOL, "a"])

    def test_duplicates_rejected(self):
        with pytest.raises(ValueError):
            GreedyDecoder(["a", "a", BLANK_SYMBOL])

    def test_beam_size_type(self):
        with pytest.raises(TypeError):
            CTCPrefixLogRawNumpyDecoder(LETTERS, k=1.5)
        with pytest.raises(ValueError):
            CTCPrefixLogRawNumpyDecoder(LETTERS, k=0)


class TestPrefixJoining:
    def test_joined_mass_beats_distinct_path(self):
        """Classic CTC beam-search case: 'a' reachable two ways (frame1-a +
        frame2-a-repeat, or blank+a etc.) must accumulate its mass."""
        decoder = CTCPrefixLogRawNumpyDecoder(LETTERS, k=4)
        # Frame probs chosen so naive path-max would pick 'ab' but summed
        # prefix mass favors 'a'.
        logits = lp(
            [
                [0.6, 0.0001, 0.3999],
                [0.6, 0.3999, 0.0001],
            ]
        )
        bag = decoder(logits)
        scores = {h.transcript: h.vis_sc for h in bag}
        # P('a') must include: a@1(a@2|repeat), a@1 blank@2, blank@1 a@2.
        p_a = (0.6 / 1.0) * 0.6 + 0.6 * 0.0001 + 0.3999 * 0.6
        assert scores["a"] == pytest.approx(np.log(p_a), abs=1e-6)

    def test_beam_exact_posterior_on_tiny_problem(self):
        """With a beam wide enough to be exhaustive, prefix probabilities
        must match brute-force enumeration over all paths."""
        rng = np.random.default_rng(5)
        T, C = 4, 3
        probs = rng.dirichlet(np.ones(C), size=T)
        logits = np.log(probs)
        decoder = CTCPrefixLogRawNumpyDecoder(LETTERS, k=16)
        bag = decoder(logits)
        got = {h.transcript: np.exp(h.vis_sc) for h in bag}

        # Brute force: every path of length T over {a, b, blank}.
        import itertools

        brute = {}
        for path in itertools.product(range(C), repeat=T):
            p = np.prod(probs[np.arange(T), list(path)])
            # collapse
            out = []
            prev = None
            for s in path:
                if s != prev and s != C - 1:
                    out.append(LETTERS[s])
                prev = s
            key = "".join(out)
            brute[key] = brute.get(key, 0.0) + p

        for transcript, p in got.items():
            assert p == pytest.approx(brute[transcript], rel=1e-6), transcript

    def test_no_relevant_chars_frame(self):
        """A frame with overwhelming blank (all chars pruned at -10) only
        rescales the blank mass."""
        decoder = CTCPrefixLogRawNumpyDecoder(LETTERS, k=2)
        frame_strong_blank = np.array([1e-6, 1e-6, 1.0 - 2e-6])
        logits = lp([[0.9, 0.05, 0.05], frame_strong_blank])
        bag = decoder(logits)
        assert bag.best_hyp() == "a"


class FakeLM:
    """Deterministic fake LM over decoder chars ['a', 'b'] implementing the
    LMWrapper contract — the analog of the reference's DummyLm
    (reference: test/test_decoding/test_lm_wrapper.py:9-100).

    State = the count of chars consumed so far (per batch row).  log_probs
    prefers 'a' after even counts and 'b' after odd counts."""

    def __init__(self):
        self.even = np.log(np.array([0.8, 0.2]))
        self.odd = np.log(np.array([0.3, 0.7]))

    class State:
        def __init__(self, counts):
            self.counts = np.asarray(counts)

        def __getitem__(self, idx):
            return FakeLM.State(self.counts[np.asarray(idx)])

        def __setitem__(self, idx, other):
            self.counts[np.asarray(idx)] = other.counts

    def initial_h(self, batch_size):
        return FakeLM.State(np.zeros(batch_size, dtype=np.int64))

    def advance_h0(self, chars, h):
        return FakeLM.State(h.counts + 1)

    def log_probs(self, h):
        return np.where(
            (h.counts % 2 == 0)[:, None], self.even[None, :], self.odd[None, :]
        )

    def eos_scores(self, h):
        return np.full(h.counts.shape, np.log(0.5))


class TestLMFusion:
    def test_lm_scores_exact(self):
        lm = FakeLM()
        decoder = CTCPrefixLogRawNumpyDecoder(LETTERS, k=8, lm=lm, lm_scale=1.0)
        logits = lp([[0.45, 0.45, 0.1], [0.1, 0.1, 0.8]])
        bag = decoder(logits)
        lm_scores = {h.transcript: h.lm_sc for h in bag}
        # 'a' after 0 chars: log 0.8; 'b': log 0.2.
        assert lm_scores["a"] == pytest.approx(np.log(0.8), abs=1e-9)
        assert lm_scores["b"] == pytest.approx(np.log(0.2), abs=1e-9)
        # LM tips the balance: visual scores are equal, 'a' must win.
        assert bag.best_hyp() == "a"

    def test_insertion_bonus(self):
        lm = FakeLM()
        no_bonus = CTCPrefixLogRawNumpyDecoder(LETTERS, k=8, lm=lm)
        with_bonus = CTCPrefixLogRawNumpyDecoder(
            LETTERS, k=8, lm=lm, insertion_bonus=2.0
        )
        logits = lp([[0.45, 0.45, 0.1], [0.1, 0.1, 0.8]])
        b0 = {h.transcript: h.lm_sc for h in no_bonus(logits)}
        b1 = {h.transcript: h.lm_sc for h in with_bonus(logits)}
        assert b1["a"] == pytest.approx(b0["a"] + 2.0, abs=1e-9)
        assert b1[""] == pytest.approx(b0[""], abs=1e-9)  # no chars, no bonus

    def test_eos_scoring(self):
        lm = FakeLM()
        decoder = CTCPrefixLogRawNumpyDecoder(LETTERS, k=4, lm=lm)
        logits = lp([[0.9, 0.05, 0.05]])
        bag_plain = decoder(logits)
        bag_eos = decoder(logits, model_eos=True)
        s0 = {h.transcript: h.lm_sc for h in bag_plain}
        s1 = {h.transcript: h.lm_sc for h in bag_eos}
        assert s1["a"] == pytest.approx(s0["a"] + np.log(0.5), abs=1e-9)

    def test_hidden_state_carry(self):
        lm = FakeLM()
        decoder = CTCPrefixLogRawNumpyDecoder(LETTERS, k=4, lm=lm)
        logits = lp([[0.9, 0.05, 0.05]])
        bag, h = decoder(logits, return_h=True)
        # After decoding 'a', the carried state consumed one char.
        assert h.counts.shape == (1,)
        assert h.counts[0] == 1
        # Feeding it back works.
        bag2 = decoder(logits, init_h=h)
        lm_scores = {hh.transcript: hh.lm_sc for hh in bag2}
        # Now 'a' is scored with the odd-count distribution: log 0.3.
        assert lm_scores["a"] == pytest.approx(np.log(0.3), abs=1e-9)


class TestBagOfHypotheses:
    def test_posteriors_sum_to_one(self):
        bag = BagOfHypotheses()
        bag.add("x", np.log(0.5), 0)
        bag.add("y", np.log(0.3), 0)
        bag.add("z", np.log(0.2), 0)
        assert np.exp(bag.posteriors()).sum() == pytest.approx(1.0, abs=1e-9)
        assert bag.confidence() == pytest.approx(0.5, abs=1e-9)
        assert bag.transcript_confidence("y") == pytest.approx(0.3, abs=1e-9)
        assert bag.transcript_confidence("nope") == 0.0

    def test_lm_weight_in_totals(self):
        bag = BagOfHypotheses(lm_weight=0.5)
        bag.add("x", -1.0, -2.0)
        assert bag.total_scores() == [-2.0]
