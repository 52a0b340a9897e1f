"""Torch checkpoint conversion to the framework's flax formats.

The reference ecosystem's models live as torch state dicts / TorchScript
(its transformer engine loads a plain state dict,
reference: pero_ocr/ocr_engine/transformer_ocr_engine.py:21-30, and the
brnolm LM is a torch LSTM, reference: decoding_itf.py:27-38).  This
module maps torch parameterizations onto the framework's flax modules so
existing trained weights can be carried over:

- ``nn.Linear (out, in)``            -> Dense kernel (in, out)
- ``nn.Embedding``                   -> Embed
- ``nn.LSTM`` layer k                -> OptimizedLSTMCell split gates
  (torch packs [i, f, g, o] rows into weight_ih/hh; flax keeps separate
  ii/if/ig/io input kernels and hi/hf/hg/ho hidden kernels with the
  bias folded into the hidden side)
- ``nn.Conv2d (out, in, kh, kw)``    -> Conv kernel (kh, kw, in, out)

Conversions are verified numerically in tests/test_convert_torch.py by
comparing torch and flax forward passes.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _np(tensor) -> np.ndarray:
    try:
        return tensor.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(tensor)


def convert_linear(state_dict: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(state_dict[prefix + ".weight"]).T}
    bias_key = prefix + ".bias"
    if bias_key in state_dict:
        out["bias"] = _np(state_dict[bias_key])
    return out


def convert_embedding(state_dict: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": _np(state_dict[prefix + ".weight"])}


def convert_conv2d(state_dict: Dict, prefix: str) -> Dict[str, np.ndarray]:
    kernel = _np(state_dict[prefix + ".weight"])  # (out, in, kh, kw)
    out = {"kernel": np.transpose(kernel, (2, 3, 1, 0))}
    bias_key = prefix + ".bias"
    if bias_key in state_dict:
        out["bias"] = _np(state_dict[bias_key])
    return out


def convert_lstm_layer(
    state_dict: Dict, prefix: str, layer: int
) -> Dict[str, Dict[str, np.ndarray]]:
    """One torch nn.LSTM layer -> flax OptimizedLSTMCell params."""
    w_ih = _np(state_dict[f"{prefix}.weight_ih_l{layer}"])  # (4H, in)
    w_hh = _np(state_dict[f"{prefix}.weight_hh_l{layer}"])  # (4H, H)
    b_ih = _np(
        state_dict.get(f"{prefix}.bias_ih_l{layer}", np.zeros(w_ih.shape[0]))
    )
    b_hh = _np(
        state_dict.get(f"{prefix}.bias_hh_l{layer}", np.zeros(w_hh.shape[0]))
    )
    hidden = w_hh.shape[1]

    def gate(idx):
        lo, hi = idx * hidden, (idx + 1) * hidden
        return w_ih[lo:hi].T, w_hh[lo:hi].T, b_ih[lo:hi] + b_hh[lo:hi]

    gates = {}
    for name, idx in (("i", 0), ("f", 1), ("g", 2), ("o", 3)):
        wi, wh, bias = gate(idx)
        gates["i" + name] = {"kernel": wi}
        gates["h" + name] = {"kernel": wh, "bias": bias}
    return gates


def convert_torch_lm(
    state_dict: Dict,
    embed_prefix: str = "embed",
    lstm_prefix: str = "lstm",
    head_prefix: str = "head",
    num_layers: Optional[int] = None,
) -> Dict:
    """Torch char-LSTM LM -> CharLM flax variables.

    Expects an embedding, an nn.LSTM stack, and an output Linear; the
    prefixes parameterize the source module's attribute names (brnolm
    uses e.g. ``model``/``decoder``)."""
    if num_layers is None:
        num_layers = 0
        while f"{lstm_prefix}.weight_ih_l{num_layers}" in state_dict:
            num_layers += 1
    params = {
        "embed": convert_embedding(state_dict, embed_prefix),
        "head": convert_linear(state_dict, head_prefix),
    }
    for k in range(num_layers):
        params[f"cells_{k}"] = convert_lstm_layer(state_dict, lstm_prefix, k)
    return {"params": params}
