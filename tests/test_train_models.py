"""In-framework training steps for the layout net and the transformer
(the reference consumes externally trained binaries for both —
torch_parsenet.py:15, transformer_ocr_engine.py:28; this framework
closes the loop with jittable train steps, parallel/train.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pero_ocr_tpu.models.parsenet import ParseNet
from pero_ocr_tpu.models.transformer import TransformerOCR, TransformerSpec
from pero_ocr_tpu.parallel import train as train_lib


class TestParseNetTraining:
    def test_loss_decreases_on_synthetic_maps(self):
        model = ParseNet(base_features=4, depth=2)
        optimizer = train_lib.make_optimizer(3e-3)
        state = train_lib.init_parsenet_train_state(
            model, optimizer, jax.random.PRNGKey(0), size=64
        )
        step = jax.jit(train_lib.make_parsenet_train_step(model, optimizer))

        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
        )
        maps = np.zeros((2, 64, 64, 5), np.float32)
        maps[:, 20, 8:56, 2] = 1.0          # baseline row
        maps[:, 20, [8, 55], 3] = 1.0       # endpoints
        maps[:, :, 32, 4] = 1.0             # separator column
        maps[:, 20, 8:56, 0] = 6.0          # asc height on baseline
        maps[:, 20, 8:56, 1] = 2.0          # desc height
        maps = jnp.asarray(maps)

        losses = []
        for _ in range(8):
            state, loss = step(state, images, maps)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_height_supervision_masked_to_baseline(self):
        """Height error off the baseline mask must not contribute."""
        model = ParseNet(base_features=4, depth=2)
        params = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        images = jnp.zeros((1, 64, 64, 3), jnp.float32)
        maps_off = np.zeros((1, 64, 64, 5), np.float32)
        maps_off[..., 0:2] = 50.0           # huge heights, NO baseline on
        loss_off = float(train_lib.parsenet_loss_fn(
            model, params, images, jnp.asarray(maps_off)
        ))
        maps_on = maps_off.copy()
        maps_on[:, 20, :, 2] = 1.0          # switch the baseline mask on
        loss_on = float(train_lib.parsenet_loss_fn(
            model, params, images, jnp.asarray(maps_on)
        ))
        assert loss_on > loss_off           # heights now count (+ mask BCE)


class TestTransformerTraining:
    def test_memorizes_tiny_batch(self):
        spec = TransformerSpec(
            num_classes=5, line_height=16, conv_features=(4, 8),
            subsampling=2, d_model=16, num_heads=2, encoder_layers=1,
            decoder_layers=1, mlp_dim=32, max_decode_len=8,
            dtype=jnp.float32,
        )
        model = TransformerOCR(spec)
        optimizer = train_lib.make_optimizer(3e-3)
        state = train_lib.init_transformer_train_state(
            model, optimizer, jax.random.PRNGKey(0), 16, width=32
        )
        step = jax.jit(
            train_lib.make_transformer_train_step(model, optimizer)
        )

        rng = np.random.default_rng(1)
        images = jnp.asarray(
            rng.uniform(size=(2, 16, 32, 3)).astype(np.float32)
        )
        targets = jnp.asarray([[1, 2, 3, 0], [4, 0, 0, 0]], jnp.int32)
        lengths = jnp.asarray([3, 1], jnp.int32)

        losses = []
        for _ in range(12):
            state, loss = step(state, images, targets, lengths)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_padding_positions_do_not_leak(self):
        """Changing PAD content beyond target_lengths must not change the
        loss (masking correctness)."""
        spec = TransformerSpec(
            num_classes=5, line_height=16, conv_features=(4,),
            subsampling=2, d_model=8, num_heads=2, encoder_layers=1,
            decoder_layers=1, mlp_dim=16, max_decode_len=8,
            dtype=jnp.float32,
        )
        model = TransformerOCR(spec)
        params = model.init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, 16, 32, 3), jnp.float32),
            jnp.zeros((1, 4), jnp.int32),
        )
        images = jnp.zeros((1, 16, 32, 3), jnp.float32)
        a = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
        lengths = jnp.asarray([2], jnp.int32)
        la = float(train_lib.transformer_loss_fn(
            model, params, images, a, lengths
        ))
        # Pad slots differ, but only AFTER position target_lengths+1;
        # note pad content feeds causal inputs at masked positions only.
        b = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        lb = float(train_lib.transformer_loss_fn(
            model, params, images, b, lengths
        ))
        assert abs(la - lb) < 1e-5


class TestOrientationTraining:
    def test_loss_decreases_and_mask_gates(self):
        from pero_ocr_tpu.models.parsenet import OrientationNet

        model = OrientationNet(base_features=4, depth=2)
        optimizer = train_lib.make_optimizer(3e-3)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        state = train_lib.TrainState(
            params, optimizer.init(params), jnp.zeros((), jnp.int32)
        )
        step = jax.jit(
            train_lib.make_orientation_train_step(model, optimizer)
        )

        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        )
        dirs = np.zeros((2, 32, 32, 2), np.float32)
        dirs[..., 0] = 1.0                   # horizontal text everywhere
        mask = np.zeros((2, 32, 32), np.float32)
        mask[:, 8:24, 4:28] = 1.0
        dirs = jnp.asarray(dirs)
        mask = jnp.asarray(mask)

        losses = []
        for _ in range(8):
            state, loss = step(state, images, dirs, mask)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        # Empty mask -> zero loss (nothing supervised).
        zero = float(train_lib.orientation_loss_fn(
            model, state.params, images, dirs, jnp.zeros_like(mask)
        ))
        assert zero == 0.0


class TestTransformerEndToEnd:
    def test_trained_model_greedy_decodes_targets(self):
        """Train-to-memorize then greedy-decode: the scan-based KV-cached
        decode must emit the training targets (closes the transformer
        loop the reference can't test hermetically)."""
        from pero_ocr_tpu.models.transformer import greedy_decode

        spec = TransformerSpec(
            num_classes=5, line_height=16, conv_features=(8,),
            subsampling=2, d_model=32, num_heads=2, encoder_layers=1,
            decoder_layers=1, mlp_dim=64, max_decode_len=8,
            dtype=jnp.float32,
        )
        model = TransformerOCR(spec)
        optimizer = train_lib.make_optimizer(3e-3)
        state = train_lib.init_transformer_train_state(
            model, optimizer, jax.random.PRNGKey(0), 16, width=32
        )
        step = jax.jit(
            train_lib.make_transformer_train_step(model, optimizer)
        )

        # Two visually distinct images with distinct target strings.
        images = np.zeros((2, 16, 32, 3), np.float32)
        images[0, :, :16] = 1.0      # left-bright
        images[1, :, 16:] = 1.0      # right-bright
        images = jnp.asarray(images)
        targets = jnp.asarray([[1, 2, 3], [4, 3, 1]], jnp.int32)
        lengths = jnp.asarray([3, 3], jnp.int32)

        loss = None
        for i in range(400):
            state, loss = step(state, images, targets, lengths)
            if i % 25 == 0 and float(loss) < 0.01:
                break
        assert float(loss) < 0.5, float(loss)

        tokens, out_lengths, confs = greedy_decode(
            model, state.params, images, max_len=8
        )
        tokens = np.asarray(tokens)
        out_lengths = np.asarray(out_lengths)
        for i in range(2):
            got = tokens[i, : out_lengths[i]].tolist()
            assert got == np.asarray(targets)[i].tolist(), (i, got)
