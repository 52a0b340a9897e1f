"""Model smoke + contract tests (tiny shapes, CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_ocr_tpu.models.charlm import CharLM, CharLMSpec, sequence_logprobs, state_select
from pero_ocr_tpu.models.parsenet import OrientationNet, ParseNet
from pero_ocr_tpu.models.recognizer import CTCRecognizer, RecognizerSpec
from pero_ocr_tpu.models.transformer import (
    TransformerOCR,
    TransformerSpec,
    greedy_decode,
)

TINY_PARSENET = dict(base_features=4, depth=2)
TINY_REC = RecognizerSpec(
    num_classes=10, line_height=16, conv_features=(4, 8),
    subsampling=2, lstm_layers=1, lstm_features=8,
)
TINY_TRANS = TransformerSpec(
    num_classes=10, line_height=16, conv_features=(4, 8), subsampling=2,
    d_model=16, num_heads=2, encoder_layers=1, decoder_layers=1,
    mlp_dim=32, max_decode_len=8,
)


class TestParseNet:
    def test_output_shape_and_ranges(self):
        model = ParseNet(**TINY_PARSENET)
        x = jnp.zeros((1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 32, 32, 5)
        out = np.asarray(out)
        assert np.all(out[..., :2] >= 0)          # heights nonneg
        assert np.all((out[..., 2:] >= 0) & (out[..., 2:] <= 1))  # probs

    def test_s2d_stem_same_output_contract(self):
        """The fast space-to-depth stem keeps the (H, W, 5) full-res
        output contract and value ranges."""
        model = ParseNet(base_features=4, depth=2, stem="s2d")
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = np.asarray(model.apply(params, x))
        assert out.shape == (1, 32, 32, 5)
        assert np.all(out[..., :2] >= 0)
        assert np.all((out[..., 2:] >= 0) & (out[..., 2:] <= 1))

    def test_s2d_stem_trains(self):
        from pero_ocr_tpu.parallel import train as train_lib

        model = ParseNet(base_features=4, depth=2, stem="s2d")
        optimizer = train_lib.make_optimizer(3e-3)
        state = train_lib.init_parsenet_train_state(
            model, optimizer, jax.random.PRNGKey(0), size=32
        )
        step = jax.jit(train_lib.make_parsenet_train_step(model, optimizer))
        images = jnp.zeros((1, 32, 32, 3), jnp.float32)
        maps = np.zeros((1, 32, 32, 5), np.float32)
        maps[:, 10, 4:28, 2] = 1.0
        maps = jnp.asarray(maps)
        losses = []
        for _ in range(6):
            state, loss = step(state, images, maps)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_space_to_depth_exact(self):
        from pero_ocr_tpu.models.parsenet import space_to_depth

        x = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(jnp.float32)
        y = np.asarray(space_to_depth(x, 2))
        assert y.shape == (2, 2, 2, 12)
        # Block (0,0) of image 0 = pixels (0,0),(0,1),(1,0),(1,1).
        np.testing.assert_array_equal(
            y[0, 0, 0],
            np.concatenate([
                np.asarray(x)[0, 0, 0], np.asarray(x)[0, 0, 1],
                np.asarray(x)[0, 1, 0], np.asarray(x)[0, 1, 1],
            ]),
        )

    def test_orientation_net_direction_map(self):
        model = OrientationNet(base_features=4, depth=2)
        x = jax.random.uniform(jax.random.PRNGKey(42), (1, 16, 16, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = np.asarray(model.apply(params, x))
        assert out.shape == (1, 16, 16, 2)
        assert np.isfinite(out).all()


class TestCTCRecognizer:
    def test_subsampling_and_classes(self):
        model = CTCRecognizer(TINY_REC)
        x = jnp.zeros((2, 16, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(params, x)
        assert logits.shape == (2, 32, 10)  # width / subsampling, classes

    def test_s2d_stem_same_frame_rate(self):
        """The fast stem must keep W' = W / subsampling (CTC frame-rate
        contract) and train end-to-end."""
        from pero_ocr_tpu.parallel import train as train_lib

        for stem in ("conv", "s2d"):
            spec = RecognizerSpec(
                num_classes=8, line_height=16, conv_features=(4, 8),
                subsampling=4, lstm_layers=1, lstm_features=8, stem=stem,
            )
            model = CTCRecognizer(spec)
            x = jnp.zeros((2, 16, 64, 3), jnp.float32)
            params = model.init(jax.random.PRNGKey(0), x)
            out = model.apply(params, x)
            assert out.shape == (2, 16, 8), (stem, out.shape)

        spec = RecognizerSpec(
            num_classes=8, line_height=16, conv_features=(4, 8),
            subsampling=4, lstm_layers=1, lstm_features=8, stem="s2d",
        )
        model = CTCRecognizer(spec)
        optimizer = train_lib.make_optimizer(3e-3)
        state = train_lib.init_train_state(
            model, optimizer, jax.random.PRNGKey(0), 16, width=64
        )
        step = jax.jit(train_lib.make_train_step(model, optimizer))
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(size=(4, 16, 64, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 7, (4, 3)), jnp.int32)
        lengths = jnp.full((4,), 3, jnp.int32)
        losses = []
        for _ in range(5):
            state, loss = step(state, images, labels, lengths)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_writer_embedding(self):
        spec = RecognizerSpec(
            num_classes=10, line_height=16, conv_features=(4, 8),
            subsampling=2, lstm_layers=1, lstm_features=8,
            embed_num=4, embed_dim=4,
        )
        model = CTCRecognizer(spec)
        x = jnp.zeros((2, 16, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
        l0 = model.apply(params, x, jnp.array([0, 0]))
        l1 = model.apply(params, x, jnp.array([1, 1]))
        assert not np.allclose(np.asarray(l0), np.asarray(l1))

    def test_spec_from_json(self):
        cfg = {"line_px_height": 40, "embed_num": 3,
               "net_spec": {"lstm_layers": 3, "subsampling": 8}}
        spec = RecognizerSpec.from_json_dict(cfg, num_classes=50)
        assert spec.line_height == 40
        assert spec.lstm_layers == 3
        assert spec.subsampling == 8
        assert spec.embed_num == 3
        assert spec.num_classes == 50
        assert spec.norm == "none"  # old JSONs keep the norm-free tree

    def test_group_norm_encoder(self):
        """norm="group" keeps the frame-rate contract, loads from JSON,
        and trains (the deep norm-free encoder collapses CTC training
        to the input-independent marginal at (48..384)x2x256 scale —
        measured in the round-5 bench-recognizer experiments)."""
        from pero_ocr_tpu.parallel import train as train_lib

        cfg = {"net_spec": {"conv_features": [4, 8], "subsampling": 4,
                            "lstm_layers": 1, "lstm_features": 8,
                            "stem": "s2d", "norm": "group"},
               "line_px_height": 16}
        spec = RecognizerSpec.from_json_dict(cfg, num_classes=8)
        assert spec.norm == "group"
        model = CTCRecognizer(spec)
        x = jnp.zeros((2, 16, 64, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 16, 8)

        optimizer = train_lib.make_optimizer(3e-3)
        state = train_lib.init_train_state(
            model, optimizer, jax.random.PRNGKey(0), 16, width=64
        )
        step = jax.jit(train_lib.make_train_step(model, optimizer))
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(size=(4, 16, 64, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 7, (4, 3)), jnp.int32)
        lengths = jnp.full((4,), 3, jnp.int32)
        losses = []
        for _ in range(5):
            state, loss = step(state, images, labels, lengths)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestTransformerOCR:
    def test_train_forward(self):
        model = TransformerOCR(TINY_TRANS)
        x = jnp.zeros((2, 16, 32, 3))
        targets = jnp.zeros((2, 5), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, targets)
        logits = model.apply(params, x, targets)
        assert logits.shape == (2, 5, TINY_TRANS.vocab)

    def test_greedy_decode_matches_teacher_forcing(self):
        """Cached step-decode must reproduce the teacher-forced argmax path."""
        model = TransformerOCR(TINY_TRANS)
        rng = jax.random.PRNGKey(1)
        x = jax.random.uniform(rng, (2, 16, 32, 3))
        targets = jnp.zeros((2, 5), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, targets)

        tokens, lengths, confs = greedy_decode(model, params, x, max_len=6)
        tokens = np.asarray(tokens)
        assert tokens.shape == (2, 6)
        confs = np.asarray(confs)
        assert confs.shape == (2,)
        assert np.all((confs >= 0) & (confs <= 1))

        # Replay through teacher forcing: feeding BOS + decoded tokens must
        # produce the same argmax sequence (up to EOS).
        sp = TINY_TRANS
        bos_prefixed = np.concatenate(
            [np.full((2, 1), sp.bos_id), tokens[:, :-1]], axis=1
        )
        memory = model.apply(params, x, method=TransformerOCR.encode)
        tf_logits = model.apply(
            params, memory, jnp.asarray(bos_prefixed),
            method=TransformerOCR.decode_train,
        )
        tf_argmax = np.asarray(jnp.argmax(tf_logits, -1))
        for i in range(2):
            n = int(np.asarray(lengths)[i])
            np.testing.assert_array_equal(tf_argmax[i, :n], tokens[i, :n])


class TestCharLM:
    def test_advance_and_logprobs(self):
        spec = CharLMSpec(vocab_size=12, embed_dim=4, hidden_dim=8, num_layers=2)
        model = CharLM(spec)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32))
        state = model.apply(variables, 3, method=CharLM.initial_state)
        state = model.apply(variables, jnp.array([1, 2, 3]), state, method=CharLM.advance)
        lp = model.apply(variables, state, method=CharLM.log_probs)
        assert lp.shape == (3, 12)
        np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, atol=1e-4)

    def test_sequence_logprobs(self):
        spec = CharLMSpec(vocab_size=12, embed_dim=4, hidden_dim=8, num_layers=1)
        model = CharLM(spec)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32))
        tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
        out = sequence_logprobs(model, variables, tokens)
        assert out.shape == (1, 4, 12)

        # Must agree with stepwise advance.
        state = model.apply(variables, 1, method=CharLM.initial_state)
        state = model.apply(variables, jnp.array([1]), state, method=CharLM.advance)
        lp0 = model.apply(variables, state, method=CharLM.log_probs)
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(lp0[0]), atol=1e-5)

    def test_state_select(self):
        spec = CharLMSpec(vocab_size=5, embed_dim=2, hidden_dim=4, num_layers=1)
        model = CharLM(spec)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32))
        state = model.apply(variables, 4, method=CharLM.initial_state)
        state = model.apply(variables, jnp.array([0, 1, 2, 3]), state, method=CharLM.advance)
        sub = state_select(state, jnp.array([2, 0]))
        np.testing.assert_allclose(
            np.asarray(sub[0][1][0]), np.asarray(state[0][1][2])
        )


class TestBeamDecode:
    """AR beam search (beyond the reference — its engine only decodes
    greedily): k=1 must equal greedy exactly, and the k>1 winner's
    JOINT teacher-forced log-probability must never be worse than the
    greedy sequence's."""

    def _setup(self):
        from pero_ocr_tpu.models.transformer import beam_decode

        model = TransformerOCR(TINY_TRANS)
        rng = jax.random.PRNGKey(3)
        x = jax.random.uniform(rng, (3, 16, 32, 3))
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((3, 5), jnp.int32)
        )
        return beam_decode, model, params, x

    @staticmethod
    def _seq_logprob(model, params, x, tokens, lengths):
        sp = TINY_TRANS
        tokens = np.asarray(tokens)
        bos_prefixed = np.concatenate(
            [np.full((tokens.shape[0], 1), sp.bos_id), tokens[:, :-1]],
            axis=1,
        )
        memory = model.apply(params, x, method=TransformerOCR.encode)
        lp = jax.nn.log_softmax(model.apply(
            params, memory, jnp.asarray(bos_prefixed),
            method=TransformerOCR.decode_train,
        ), axis=-1)
        lp = np.asarray(lp)
        out = []
        for i in range(tokens.shape[0]):
            # Include the terminating EOS step like the beam's score.
            n = min(int(lengths[i]) + 1, tokens.shape[1])
            out.append(
                sum(lp[i, t, tokens[i, t]] for t in range(n))
            )
        return np.asarray(out)

    def test_k1_equals_greedy(self):
        beam_decode, model, params, x = self._setup()
        gt, gl, gc = greedy_decode(model, params, x, max_len=6)
        bt, blens, bc = beam_decode(model, params, x, max_len=6, k=1)
        np.testing.assert_array_equal(np.asarray(bt), np.asarray(gt))
        np.testing.assert_array_equal(np.asarray(blens), np.asarray(gl))
        np.testing.assert_allclose(
            np.asarray(bc), np.asarray(gc), rtol=1e-5
        )

    def test_beam_never_worse_than_greedy(self):
        beam_decode, model, params, x = self._setup()
        gt, gl, _ = greedy_decode(model, params, x, max_len=6)
        bt, bl, _ = beam_decode(model, params, x, max_len=6, k=4)
        g_lp = self._seq_logprob(model, params, x, gt, np.asarray(gl))
        b_lp = self._seq_logprob(model, params, x, bt, np.asarray(bl))
        assert np.all(b_lp >= g_lp - 1e-4), (b_lp, g_lp)

    def test_engine_beam_size(self, tmp_path):
        import json

        from pero_ocr_tpu.ocr.transformer_engine import (
            TransformerEngineLineOCR,
        )

        cfg = {
            "characters": list("abcd"),
            "line_px_height": 16,
            "line_vertical_scale": 1,
            "checkpoint": "none.ckpt",
            "beam_size": 3,
            "net_spec": {"conv_features": [4], "subsampling": 2,
                         "d_model": 8, "num_heads": 2,
                         "encoder_layers": 1, "decoder_layers": 1,
                         "mlp_dim": 16, "max_decode_len": 12},
        }
        p = tmp_path / "ocr.json"
        p.write_text(json.dumps(cfg))
        engine = TransformerEngineLineOCR(str(p), batch_size=2)
        assert engine.beam_size == 3
        batch = np.random.default_rng(5).integers(
            0, 255, (2, 16, 64, 3), np.uint8
        )
        texts, logits = engine.run_ocr(batch, np.array([64, 64]))
        assert len(texts) == 2
        for t in texts:
            assert all(ch in "abcd" for ch in t)
