"""Train a tiny char-LM in-framework and prove it improves beam decoding
of ambiguous CTC logits — the LM-value loop the reference delegates to an
external brnolm model."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_ocr_tpu.decoding.decoders import BLANK_SYMBOL
from pero_ocr_tpu.models.charlm import CharLM, CharLMSpec
from pero_ocr_tpu.parallel import train as train_lib

CHARS = ["a", "b", "c"]
VOCAB = len(CHARS) + 1  # + </s>
EOS = VOCAB - 1


@pytest.fixture(scope="module", params=["lstm", "gru"])
def trained_lm(tmp_path_factory, request):
    """LM trained on sequences of the language (abc)* — after 'a' comes
    'b', after 'b' comes 'c', after 'c' comes 'a'.  Runs for both cell
    types: the GRU is the light-step beam-throughput option and must
    train, export, and reload identically."""
    d = tmp_path_factory.mktemp("lm")
    spec = CharLMSpec(vocab_size=VOCAB, embed_dim=8, hidden_dim=32,
                      num_layers=1, cell_type=request.param)
    model = CharLM(spec)
    optimizer = train_lib.make_optimizer(1e-2)
    state = train_lib.init_lm_train_state(model, optimizer, jax.random.PRNGKey(0))
    step = jax.jit(train_lib.make_lm_train_step(model, optimizer))

    # Batch of </s> a b c a b c ... sequences.
    seq = [EOS] + [0, 1, 2] * 5
    tokens = jnp.asarray(np.tile(seq, (16, 1)), jnp.int32)

    loss = None
    for _ in range(150):
        state, loss = step(state, tokens)
    assert float(loss) < 0.1, f"LM failed to learn (abc)*: {float(loss)}"

    path = d / "charlm.lm"
    train_lib.export_lm_checkpoint(model, state.params, str(path))
    return model, state.params, str(path)


class TestLMTraining:
    def test_lm_learns_cycle(self, trained_lm):
        model, params, _ = trained_lm
        state = model.apply(params, 1, method=CharLM.initial_state)
        # After </s> a -> next should be 'b'.
        for tok in [EOS, 0]:
            state = model.apply(
                params, jnp.asarray([tok]), state, method=CharLM.advance
            )
        lp = np.asarray(model.apply(params, state, method=CharLM.log_probs))
        assert lp[0].argmax() == 1  # 'b'

    def test_lm_improves_ambiguous_decode(self, trained_lm):
        """Visually ambiguous frame ('b' vs 'c' equal) after a clear 'a':
        the LM must tip the beam toward 'ab'."""
        model, params, _ = trained_lm
        from pero_ocr_tpu.decoding.tpu_decoder import TPUBeamSearchDecoder

        letters = CHARS + [BLANK_SYMBOL]

        def lp(rows):
            arr = np.asarray(rows, np.float64)
            arr /= arr.sum(axis=1, keepdims=True)
            return np.log(arr).astype(np.float32)

        logits = lp([
            [0.9, 0.02, 0.02, 0.06],   # clear 'a'
            [0.02, 0.46, 0.46, 0.06],  # 'b' and 'c' tied
        ])

        no_lm = TPUBeamSearchDecoder(letters, k=4, max_len=8)
        with_lm = TPUBeamSearchDecoder(
            letters, k=4, lm=(model, params), lm_scale=1.0, max_len=8
        )
        bag_lm = with_lm.decode_batch(logits[None])[0]
        assert bag_lm.best_hyp() == "ab"
        # And the LM-scored 'ab' beats 'ac' by a clear margin.
        scores = {h.transcript: h.lm_sc for h in bag_lm}
        assert scores["ab"] > scores["ac"] + 1.0

    def test_checkpoint_loads_through_itf(self, trained_lm, tmp_path):
        """The exported LM loads via the decoding interface factory and
        drives the HOST decoder identically."""
        import configparser

        from pero_ocr_tpu.decoding import itf

        model, params, path = trained_lm
        config = configparser.ConfigParser()
        config["DECODER"] = {
            "TYPE": "FAST-LOG-RAW",
            "BEAM_SIZE": "4",
            "LM_SCALE": "1.0",
            "LM": path,
        }
        decoder = itf.decoder_factory(config["DECODER"], CHARS)
        assert decoder._lm is not None

        def lp(rows):
            arr = np.asarray(rows, np.float64)
            arr /= arr.sum(axis=1, keepdims=True)
            return np.log(arr)

        logits = lp([
            [0.9, 0.02, 0.02, 0.06],
            [0.02, 0.46, 0.46, 0.06],
        ])
        assert decoder(logits).best_hyp() == "ab"
