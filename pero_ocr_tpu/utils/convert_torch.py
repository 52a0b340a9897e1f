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


def convert_gru_layer(
    state_dict: Dict, prefix: str, layer: int
) -> Dict[str, Dict[str, np.ndarray]]:
    """One torch nn.GRU layer -> flax GRUCell params.

    Both share r = sigma(W_ir x + W_hr h + b), z likewise, and
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn)); flax keeps no bias on
    hr/hz, so those torch biases fold into ir/iz."""
    w_ih = _np(state_dict[f"{prefix}.weight_ih_l{layer}"])  # (3H, in)
    w_hh = _np(state_dict[f"{prefix}.weight_hh_l{layer}"])  # (3H, H)
    b_ih = _np(
        state_dict.get(f"{prefix}.bias_ih_l{layer}", np.zeros(w_ih.shape[0]))
    )
    b_hh = _np(
        state_dict.get(f"{prefix}.bias_hh_l{layer}", np.zeros(w_hh.shape[0]))
    )
    hidden = w_hh.shape[1]

    def gate(idx):
        lo, hi = idx * hidden, (idx + 1) * hidden
        return w_ih[lo:hi].T, w_hh[lo:hi].T, b_ih[lo:hi], b_hh[lo:hi]

    # Torch gate order: r, z, n.
    wi_r, wh_r, bi_r, bh_r = gate(0)
    wi_z, wh_z, bi_z, bh_z = gate(1)
    wi_n, wh_n, bi_n, bh_n = gate(2)
    return {
        "ir": {"kernel": wi_r, "bias": bi_r + bh_r},
        "iz": {"kernel": wi_z, "bias": bi_z + bh_z},
        "in": {"kernel": wi_n, "bias": bi_n},
        "hr": {"kernel": wh_r},
        "hz": {"kernel": wh_z},
        "hn": {"kernel": wh_n, "bias": bh_n},
    }


def convert_layernorm(state_dict: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(state_dict[prefix + ".weight"]),
        "bias": _np(state_dict[prefix + ".bias"]),
    }


def convert_mha(state_dict: Dict, prefix: str, num_heads: int) -> Dict:
    """torch ``nn.MultiheadAttention`` (packed (3E, E) in_proj) -> flax
    ``MultiHeadDotProductAttention`` params (per-head DenseGeneral
    kernels (E, H, hd) and out kernel (H, hd, E))."""
    w = _np(state_dict[prefix + ".in_proj_weight"])  # (3E, E)
    b = _np(state_dict[prefix + ".in_proj_bias"])
    e = w.shape[1]
    hd = e // num_heads

    def proj(wm, bm):
        return {
            "kernel": wm.T.reshape(e, num_heads, hd),
            "bias": bm.reshape(num_heads, hd),
        }

    out_w = _np(state_dict[prefix + ".out_proj.weight"])  # (E, E)
    out_b = _np(state_dict[prefix + ".out_proj.bias"])
    return {
        "query": proj(w[:e], b[:e]),
        "key": proj(w[e : 2 * e], b[e : 2 * e]),
        "value": proj(w[2 * e :], b[2 * e :]),
        "out": {
            "kernel": out_w.T.reshape(num_heads, hd, e),
            "bias": out_b,
        },
    }


def convert_batchnorm_affine(
    state_dict: Dict, prefix: str, eps: float = 1e-5
) -> Dict[str, np.ndarray]:
    """Eval-mode BatchNorm2d -> (scale, shift) pair:
    y = x * gamma/sqrt(var+eps) + (beta - mean*gamma/sqrt(var+eps))."""
    gamma = _np(state_dict[prefix + ".weight"])
    beta = _np(state_dict[prefix + ".bias"])
    mean = _np(state_dict[prefix + ".running_mean"])
    var = _np(state_dict[prefix + ".running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "shift": beta - mean * scale}


def _frontend_conv_keys(state_dict: Dict, prefix: str):
    """Conv-weight keys under ``<prefix>.blocks_2d`` in traversal order
    (top-level convs of the pretrained VGG slice, then nested convs of
    the appended blocks), plus top-level BatchNorm indices."""
    import re

    convs, bns = [], []
    pat = re.compile(
        rf"^{re.escape(prefix)}\.blocks_2d\.(\d+)(?:\.(\d+))?\.weight$"
    )
    bn_pat = re.compile(
        rf"^{re.escape(prefix)}\.blocks_2d\.(\d+)\.running_mean$"
    )
    for key in state_dict:
        m = pat.match(key)
        if m and _np(state_dict[key]).ndim == 4:
            convs.append((int(m.group(1)), int(m.group(2) or 0), key))
        m = bn_pat.match(key)
        if m:
            bns.append((int(m.group(1)), f"{prefix}.blocks_2d.{m.group(1)}"))
    convs.sort()
    bns.sort()
    return [k for _, _, k in convs], [p for _, p in bns]


def convert_torch_transformer(
    state_dict: Dict,
    heads: int,
    encoder_layers: int,
    decoder_layers: int,
) -> Dict:
    """Reference ``TransformerOCR`` torch state dict -> flax variables for
    :class:`pero_ocr_tpu.models.transformer_ref.RefTransformerOCR`
    (reference structure: pero_ocr/ocr_engine/transformer.py:334-363
    frontend, :365-386 encoder, :388-470 decoder, :511-533 heads)."""
    conv_keys, bn_prefixes = _frontend_conv_keys(
        state_dict, "encoder_frontend"
    )
    frontend: Dict = {}
    for i, key in enumerate(conv_keys):
        frontend[f"conv{i}"] = convert_conv2d(
            state_dict, key[: -len(".weight")]
        )
    for i, bn_prefix in enumerate(bn_prefixes):
        affine = convert_batchnorm_affine(state_dict, bn_prefix)
        frontend[f"affine{i}_scale"] = affine["scale"]
        frontend[f"affine{i}_shift"] = affine["shift"]
    frontend["agg"] = convert_conv2d(
        state_dict, "encoder_frontend.aggregation_conv.0"
    )

    params: Dict = {
        "encoder_frontend": frontend,
        "input_norm": convert_layernorm(state_dict, "encoder.input_norm"),
        "dec_embeder": convert_embedding(state_dict, "dec_embeder"),
        "dec_out_proj": convert_linear(state_dict, "dec_out_proj"),
    }
    for i in range(encoder_layers):
        p = f"encoder.trans_encoder.layers.{i}"
        params[f"enc{i}"] = {
            "self_attn": convert_mha(state_dict, p + ".self_attn", heads),
            "linear1": convert_linear(state_dict, p + ".linear1"),
            "linear2": convert_linear(state_dict, p + ".linear2"),
            "norm1": convert_layernorm(state_dict, p + ".norm1"),
            "norm2": convert_layernorm(state_dict, p + ".norm2"),
        }
    for i in range(decoder_layers):
        p = f"trans_decoder.layers.{i}"
        params[f"dec{i}"] = {
            "self_attn": convert_mha(state_dict, p + ".self_attn", heads),
            "multihead_attn": convert_mha(
                state_dict, p + ".multihead_attn", heads
            ),
            "linear1": convert_linear(state_dict, p + ".linear1"),
            "linear2": convert_linear(state_dict, p + ".linear2"),
            "norm1": convert_layernorm(state_dict, p + ".norm1"),
            "norm2": convert_layernorm(state_dict, p + ".norm2"),
            "norm3": convert_layernorm(state_dict, p + ".norm3"),
        }
    return {"params": params}


def detect_lm_prefixes(state_dict: Dict) -> Dict[str, str]:
    """Auto-detect the (embed, lstm, head) attribute prefixes of a torch
    char-RNN LM state dict.

    The recurrent stack is unambiguous (``<p>.weight_ih_l0``).  The head
    is the 2-D ``.weight`` whose input dim equals the recurrent hidden
    size; the embedding is the 2-D ``.weight`` whose output dim equals
    the recurrent input size.  Covers torch conventions incl. brnolm's
    ``model``/``decoder`` naming (reference contract:
    pero_ocr/decoding/decoding_itf.py:27-46 torch.loads the LM file
    directly)."""
    rnn_prefix = None
    for key in state_dict:
        if key.endswith(".weight_ih_l0"):
            rnn_prefix = key[: -len(".weight_ih_l0")]
            break
    if rnn_prefix is None:
        raise ValueError(
            "no recurrent stack (*.weight_ih_l0) in the LM state dict; "
            f"keys: {sorted(state_dict)[:10]}"
        )
    w_ih = _np(state_dict[f"{rnn_prefix}.weight_ih_l0"])
    w_hh = _np(state_dict[f"{rnn_prefix}.weight_hh_l0"])
    in_dim, hidden = w_ih.shape[1], w_hh.shape[1]
    candidates = []  # (prefix, shape, has_bias) of 2-D .weight tensors
    for key, value in state_dict.items():
        if not key.endswith(".weight") or key.startswith(rnn_prefix + "."):
            continue
        arr = _np(value)
        if arr.ndim != 2:
            continue
        prefix = key[: -len(".weight")]
        candidates.append((prefix, arr.shape, prefix + ".bias" in state_dict))
    embed_prefix = head_prefix = None
    for prefix, shape, has_bias in candidates:
        # nn.Embedding has no bias; nn.Linear heads usually do — use that
        # first, since embed_dim == hidden makes the shapes ambiguous.
        if shape[1] == hidden and has_bias and head_prefix is None:
            head_prefix = prefix
        elif shape[1] == in_dim and not has_bias and embed_prefix is None:
            embed_prefix = prefix
    for prefix, shape, _ in candidates:
        if prefix in (embed_prefix, head_prefix):
            continue
        if embed_prefix is None and shape[1] == in_dim:
            embed_prefix = prefix
        elif head_prefix is None and shape[1] == hidden:
            head_prefix = prefix
    if embed_prefix is None or head_prefix is None:
        raise ValueError(
            "could not identify embedding/head Linear in the LM state "
            f"dict (rnn={rnn_prefix}, in={in_dim}, hidden={hidden})"
        )
    return {
        "embed_prefix": embed_prefix,
        "lstm_prefix": rnn_prefix,
        "head_prefix": head_prefix,
    }


def lm_spec_from_variables(variables: Dict) -> Dict:
    """Derive the CharLM sidecar spec dict from converted flax variables
    (shared by scripts/convert_torch_lm.py and the [DECODER] LM
    auto-conversion in decoding/itf.py)."""
    params = variables["params"]
    vocab_size, embed_dim = params["embed"]["embedding"].shape
    cell0 = params["cells_0"]
    cell_type = "lstm" if "hi" in cell0 else "gru"
    hidden_dim = cell0["hi" if cell_type == "lstm" else "hr"][
        "kernel"
    ].shape[0]
    num_layers = sum(1 for k in params if k.startswith("cells_"))
    return {
        "vocab_size": int(vocab_size),
        "embed_dim": int(embed_dim),
        "hidden_dim": int(hidden_dim),
        "num_layers": int(num_layers),
        "cell_type": cell_type,
    }


def load_torch_lm_file(path: str):
    """Load a torch LM artifact (state dict, pickled module, or
    TorchScript) and convert to (CharLM flax variables, sidecar spec)
    with auto-detected prefixes."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        obj = torch.jit.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        state_dict = obj.state_dict()
    else:
        state_dict = obj
    if isinstance(state_dict, dict):
        # Unwrap common {-checkpoint-key-: state_dict} containers.
        for container_key in ("state_dict", "model_state_dict", "model"):
            inner = state_dict.get(container_key)
            if isinstance(inner, dict) and inner:
                state_dict = inner
                break
    prefixes = detect_lm_prefixes(state_dict)
    variables = convert_torch_lm(state_dict, **prefixes)
    return variables, lm_spec_from_variables(variables)


def convert_torch_lm(
    state_dict: Dict,
    embed_prefix: str = "embed",
    lstm_prefix: str = "lstm",
    head_prefix: str = "head",
    num_layers: Optional[int] = None,
) -> Dict:
    """Torch char-RNN LM -> CharLM flax variables.

    Expects an embedding, an nn.LSTM or nn.GRU stack, and an output
    Linear; the prefixes parameterize the source module's attribute
    names (brnolm uses e.g. ``model``/``decoder``).  The cell type is
    detected from the gate-row count (4H rows = LSTM, 3H = GRU)."""
    if num_layers is None:
        num_layers = 0
        while f"{lstm_prefix}.weight_ih_l{num_layers}" in state_dict:
            num_layers += 1
    params = {
        "embed": convert_embedding(state_dict, embed_prefix),
        "head": convert_linear(state_dict, head_prefix),
    }
    w_ih = _np(state_dict[f"{lstm_prefix}.weight_ih_l0"])
    w_hh = _np(state_dict[f"{lstm_prefix}.weight_hh_l0"])
    gates = w_ih.shape[0] // w_hh.shape[1]
    if gates == 3:
        convert_layer = convert_gru_layer
    elif gates == 4:
        convert_layer = convert_lstm_layer
    else:
        raise ValueError(
            f"unrecognized recurrent layer: {w_ih.shape[0]} gate rows for "
            f"hidden size {w_hh.shape[1]}"
        )
    for k in range(num_layers):
        params[f"cells_{k}"] = convert_layer(state_dict, lstm_prefix, k)
    return {"params": params}
