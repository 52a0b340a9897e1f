"""Numerical verification of torch -> flax checkpoint conversion: torch
and flax forward passes must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pero_ocr_tpu.models.charlm import CharLM, CharLMSpec
from pero_ocr_tpu.utils.convert_torch import (
    convert_conv2d,
    convert_linear,
    convert_torch_lm,
)


class TorchLM(torch.nn.Module):
    def __init__(self, vocab, embed, hidden, layers):
        super().__init__()
        self.embed = torch.nn.Embedding(vocab, embed)
        self.lstm = torch.nn.LSTM(embed, hidden, num_layers=layers,
                                  batch_first=True)
        self.head = torch.nn.Linear(hidden, vocab)

    def forward(self, tokens):
        x = self.embed(tokens)
        out, _ = self.lstm(x)
        return self.head(out)


class TestLMConversion:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_forward_parity(self, layers):
        vocab, embed, hidden = 11, 6, 10
        torch.manual_seed(0)
        tm = TorchLM(vocab, embed, hidden, layers).eval()

        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_torch_lm(
                tm.state_dict(), num_layers=layers
            )
        )
        spec = CharLMSpec(
            vocab_size=vocab, embed_dim=embed, hidden_dim=hidden,
            num_layers=layers,
        )
        model = CharLM(spec)

        tokens = np.array([[1, 4, 2, 7, 0, 9]], dtype=np.int64)
        with torch.no_grad():
            torch_logits = tm(torch.from_numpy(tokens)).numpy()

        # flax: step through and collect head logits (log_probs applies a
        # softmax, so recompute logits from the state).
        state = model.apply(variables, 1, method=CharLM.initial_state)
        flax_logits = []
        for t in range(tokens.shape[1]):
            state = model.apply(
                variables, jnp.asarray(tokens[:, t], jnp.int32), state,
                method=CharLM.advance,
            )
            lp = model.apply(variables, state, method=CharLM.log_probs)
            flax_logits.append(np.asarray(lp))
        flax_lp = np.stack(flax_logits, axis=1)  # (1, T, V) log-probs

        torch_lp = torch.log_softmax(
            torch.from_numpy(torch_logits), dim=-1
        ).numpy()
        np.testing.assert_allclose(flax_lp, torch_lp, atol=2e-5)

    def test_converted_lm_exports_for_decoding(self, tmp_path):
        """Converted weights flow through export + itf loading."""
        from pero_ocr_tpu.parallel.train import export_lm_checkpoint

        torch.manual_seed(1)
        tm = TorchLM(7, 4, 8, 1).eval()
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_torch_lm(tm.state_dict(), num_layers=1)
        )
        spec = CharLMSpec(vocab_size=7, embed_dim=4, hidden_dim=8, num_layers=1)
        model = CharLM(spec)
        path = tmp_path / "conv.lm"
        export_lm_checkpoint(model, variables, str(path))

        import configparser

        from pero_ocr_tpu.decoding import itf

        config = configparser.ConfigParser()
        config["DECODER"] = {
            "TYPE": "FAST-LOG-RAW", "BEAM_SIZE": "2",
            "LM_SCALE": "1.0", "LM": str(path),
        }
        decoder = itf.decoder_factory(
            config["DECODER"], list("abcdef")  # 6 chars + blank; LM vocab 7
        )
        logits = np.log(
            np.full((3, 7), 1.0 / 7)
        )
        bag = decoder(logits)
        assert len(bag) >= 1


class TestPrimitiveConversions:
    def test_linear(self):
        torch.manual_seed(0)
        lin = torch.nn.Linear(5, 3)
        sd = {"fc.weight": lin.weight, "fc.bias": lin.bias}
        params = convert_linear(sd, "fc")
        x = np.random.default_rng(0).normal(size=(2, 5)).astype(np.float32)
        torch_out = lin(torch.from_numpy(x)).detach().numpy()
        flax_out = x @ params["kernel"] + params["bias"]
        np.testing.assert_allclose(flax_out, torch_out, atol=1e-6)

    def test_conv2d(self):
        torch.manual_seed(0)
        conv = torch.nn.Conv2d(3, 4, 3, padding=1)
        sd = {"c.weight": conv.weight, "c.bias": conv.bias}
        params = convert_conv2d(sd, "c")

        import flax.linen as nn

        fconv = nn.Conv(4, (3, 3), padding="SAME")
        x = np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32)
        variables = {"params": {"kernel": jnp.asarray(params["kernel"]),
                                 "bias": jnp.asarray(params["bias"])}}
        flax_out = np.asarray(fconv.apply(variables, jnp.asarray(x)))
        torch_out = (
            conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .detach().numpy().transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(flax_out, torch_out, atol=1e-5)
