"""Parity tests: the on-TPU vectorized beam search must reproduce the host
decoder (configured without relevant-logit pruning) on the same inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_ocr_tpu.decoding.decoders import (
    BLANK_SYMBOL,
    CTCPrefixLogRawNumpyDecoder,
)
from pero_ocr_tpu.decoding.tpu_decoder import TPUBeamSearchDecoder

LETTERS = ["a", "b", "c", BLANK_SYMBOL]


def no_prune(logits):
    return (np.arange(len(logits)),)


def lp(rng, t, c):
    probs = rng.dirichlet(np.ones(c), size=t)
    return np.log(probs).astype(np.float32)


class TestVisualOnlyParity:
    @pytest.mark.parametrize("beam", [2, 4, 8])
    def test_matches_host_decoder(self, beam):
        rng = np.random.default_rng(0)
        logits = lp(rng, 12, len(LETTERS))

        host = CTCPrefixLogRawNumpyDecoder(
            LETTERS, k=beam, relevant_logits_selector=no_prune
        )
        host_bag = host(logits.astype(np.float64))
        host_scores = {h.transcript: h.vis_sc for h in host_bag}

        tpu = TPUBeamSearchDecoder(LETTERS, k=beam, max_len=16)
        tpu_bag = tpu.decode_batch(logits[None])[0]
        tpu_scores = {h.transcript: h.vis_sc for h in tpu_bag}

        assert host_bag.best_hyp() == tpu_bag.best_hyp()
        for text, score in tpu_scores.items():
            if text in host_scores:
                assert score == pytest.approx(host_scores[text], abs=1e-3), text
        # The top hypotheses must agree.
        shared = set(host_scores) & set(tpu_scores)
        assert len(shared) >= min(beam, len(tpu_scores)) - 1

    def test_batched_lines_with_lengths(self):
        rng = np.random.default_rng(1)
        t = 15
        batch = np.stack([lp(rng, t, 4), lp(rng, t, 4)])
        lengths = np.array([15, 9])

        tpu = TPUBeamSearchDecoder(LETTERS, k=4, max_len=16)
        bags = tpu.decode_batch(batch, lengths)

        host = CTCPrefixLogRawNumpyDecoder(
            LETTERS, k=4, relevant_logits_selector=no_prune
        )
        for i, bag in enumerate(bags):
            ref = host(batch[i, : lengths[i]].astype(np.float64))
            assert bag.best_hyp() == ref.best_hyp()
            assert bag.confidence() == pytest.approx(ref.confidence(), abs=1e-3)

    def test_prefix_joining_mass(self):
        """The brute-force exactness test from the host decoder suite,
        run through the TPU path."""
        import itertools

        rng = np.random.default_rng(5)
        t, c = 4, 4
        probs = rng.dirichlet(np.ones(c), size=t)
        logits = np.log(probs).astype(np.float32)

        tpu = TPUBeamSearchDecoder(LETTERS, k=16, max_len=8)
        bag = tpu.decode_batch(logits[None])[0]
        got = {h.transcript: np.exp(h.vis_sc) for h in bag}

        brute = {}
        for path in itertools.product(range(c), repeat=t):
            p = np.prod(probs[np.arange(t), list(path)])
            out, prev = [], None
            for s in path:
                if s != prev and s != c - 1:
                    out.append(LETTERS[s])
                prev = s
            key = "".join(out)
            brute[key] = brute.get(key, 0.0) + p

        for transcript, p in got.items():
            assert p == pytest.approx(brute[transcript], rel=1e-3), transcript


class TestLMFusionParity:
    @pytest.fixture(scope="class")
    def charlm(self):
        from pero_ocr_tpu.models.charlm import CharLM, CharLMSpec

        spec = CharLMSpec(
            vocab_size=len(LETTERS),  # 3 chars + </s>
            embed_dim=4, hidden_dim=8, num_layers=1,
        )
        model = CharLM(spec)
        variables = model.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 1), jnp.int32)
        )
        return model, variables

    def test_matches_host_lm_decoder(self, charlm):
        from pero_ocr_tpu.decoding.lm_wrapper import JAXLMWrapper

        model, variables = charlm
        rng = np.random.default_rng(2)
        logits = lp(rng, 10, len(LETTERS))

        host_lm = JAXLMWrapper(model, variables, LETTERS[:-1])
        host = CTCPrefixLogRawNumpyDecoder(
            LETTERS, k=4, lm=host_lm, lm_scale=0.7, insertion_bonus=0.4,
            relevant_logits_selector=no_prune,
        )
        host_bag = host(logits.astype(np.float64))

        tpu = TPUBeamSearchDecoder(
            LETTERS, k=4, lm=(model, variables),
            lm_scale=0.7, insertion_bonus=0.4, max_len=16,
        )
        tpu_bag = tpu.decode_batch(logits[None])[0]

        assert tpu_bag.best_hyp() == host_bag.best_hyp()
        host_lm_scores = {h.transcript: h.lm_sc for h in host_bag}
        for h in tpu_bag:
            if h.transcript in host_lm_scores:
                assert h.lm_sc == pytest.approx(
                    host_lm_scores[h.transcript], abs=1e-3
                ), h.transcript

    def test_eos_scoring(self, charlm):
        model, variables = charlm
        rng = np.random.default_rng(4)
        logits = lp(rng, 6, len(LETTERS))
        tpu = TPUBeamSearchDecoder(
            LETTERS, k=4, lm=(model, variables), lm_scale=1.0, max_len=8
        )
        bag_plain = tpu.decode_batch(logits[None])[0]
        bag_eos = tpu.decode_batch(logits[None], model_eos=True)[0]
        plain = {h.transcript: h.lm_sc for h in bag_plain}
        with_eos = {h.transcript: h.lm_sc for h in bag_eos}
        for text in set(plain) & set(with_eos):
            assert with_eos[text] < plain[text]  # eos log-prob < 0
