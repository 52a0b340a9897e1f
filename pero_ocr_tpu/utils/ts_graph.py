"""TorchScript graph -> JAX: faithful conversion of opaque model binaries.

The reference distributes its ParseNet and CTC recognizer ONLY as
TorchScript binaries loaded with ``torch.jit.load`` (reference:
pero_ocr/layout_engines/torch_parsenet.py:15,
pero_ocr/ocr_engine/pytorch_ocr_engine.py:52-57); their architecture
source lives outside the repo.  A TorchScript artifact nonetheless
serializes its full computation graph and named parameters, so no
architecture source is needed: this module walks the inlined graph and
re-executes it with ``jax.numpy`` ops, yielding

- a flat ``{attribute.path: np.ndarray}`` parameter dict, and
- a pure ``fn(params, *inputs)`` that is ``jax.jit``-compatible
  (the graph walk happens at trace time; all ints/lists in the graph are
  trace-time constants, so XLA sees only static shapes).

Supported op set covers the model families the reference ships: conv /
batch-norm / pooling / upsampling CNNs (ParseNet-style U-Nets) and
conv + (bi)LSTM CTC recognizers, plus the usual shape plumbing.  Ops are
implemented against NCHW tensors exactly as torch computes them; the
adapters in :mod:`pero_ocr_tpu.utils.ts_adapters` translate to the
framework's NHWC conventions.

Numerical parity is verified in tests/test_ts_graph.py by tracing torch
modules of both families, saving REAL ``.pt`` artifacts, and comparing
torch vs converted-JAX forward passes.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# torch dtype enum (aten::to / aten::zeros dtype args) -> numpy dtype.
_TORCH_DTYPE_ENUM = {
    0: np.uint8, 1: np.int8, 2: np.int16, 3: np.int32, 4: np.int64,
    5: np.float16, 6: np.float32, 7: np.float64, 11: np.bool_,
    15: "bfloat16",
}


class _Ref:
    """A ``prim::GetAttr`` chain rooted at the module ``self``."""

    __slots__ = ("obj", "path")

    def __init__(self, obj, path: Tuple[str, ...]):
        self.obj = obj
        self.path = path


class _Param:
    """A tensor attribute, resolved from the params dict at run time."""

    __slots__ = ("key",)

    def __init__(self, key: str):
        self.key = key


def _iv(value):
    """Constant value of a ``prim::Constant`` output."""
    return value.toIValue()


def load_torchscript(path: str):
    """``torch.jit.load`` onto CPU, eval mode."""
    import torch

    module = torch.jit.load(path, map_location="cpu")
    module.eval()
    return module


def extract_params(ts_module) -> Dict[str, np.ndarray]:
    """Flat {dotted.path: array} of every parameter/buffer the graph
    touches (resolved the same way the interpreter resolves GetAttr)."""
    _, params = ts_to_jax(ts_module)
    return params


def inspect_torchscript(ts_module) -> str:
    """Human-readable report: op histogram + parameter table.  The first
    step of any conversion attempt (scripts/convert_torchscript.py
    --inspect)."""
    from collections import Counter

    graph = ts_module.inlined_graph
    ops = Counter(n.kind() for n in graph.nodes())
    lines = ["== op histogram =="]
    for kind, cnt in sorted(ops.items(), key=lambda kv: -kv[1]):
        mark = "" if kind in _SUPPORTED or not kind.startswith("aten::") \
            else "   <-- NOT SUPPORTED by the JAX interpreter"
        lines.append(f"  {cnt:4d}  {kind}{mark}")
    lines.append("== parameters ==")
    total = 0
    for name, p in ts_module.named_parameters():
        lines.append(f"  {name}  {tuple(p.shape)} {p.dtype}")
        total += p.numel()
    for name, b in ts_module.named_buffers():
        lines.append(f"  {name}  {tuple(b.shape)} {b.dtype} (buffer)")
    lines.append(f"== total parameters: {total} ==")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# aten op implementations (NCHW, torch semantics)
# ---------------------------------------------------------------------------

def _conv(x, w, b, stride, padding, dilation, transposed, output_padding,
          groups):
    import jax.numpy as jnp
    from jax import lax

    nd = w.ndim - 2  # spatial dims
    stride = tuple(stride)[:nd]
    padding = tuple(padding)[:nd]
    dilation = tuple(dilation)[:nd]
    if transposed:
        # torch weight: (in, out/groups, *k) -> OIHW with O=out.
        w = jnp.swapaxes(w, 0, 1)
        w = jnp.flip(w, axis=tuple(range(2, 2 + nd)))
        if groups != 1:
            # (out/groups, in, *k) regrouped: torch's in axis carries the
            # groups; split and restack so OIHW grouping matches lax's
            # feature_group_count convention.
            o_g, i_full = w.shape[0], w.shape[1]
            w = w.reshape((o_g, groups, i_full // groups) + w.shape[2:])
            w = jnp.moveaxis(w, 1, 0).reshape(
                (groups * o_g, i_full // groups) + w.shape[3:]
            )
        op = tuple(output_padding)[:nd]
        pads = tuple(
            (dilation[i] * (w.shape[2 + i] - 1) - padding[i],
             dilation[i] * (w.shape[2 + i] - 1) - padding[i] + op[i])
            for i in range(nd)
        )
        out = lax.conv_general_dilated(
            x, w, window_strides=(1,) * nd, padding=pads,
            lhs_dilation=stride, rhs_dilation=dilation,
            dimension_numbers=_dim_numbers(nd),
            feature_group_count=groups,
        )
    else:
        out = lax.conv_general_dilated(
            x, w, window_strides=stride,
            padding=tuple((p, p) for p in padding),
            rhs_dilation=dilation, dimension_numbers=_dim_numbers(nd),
            feature_group_count=groups,
        )
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * nd)
    return out


def _dim_numbers(nd: int):
    spatial = "DHW"[-nd:]
    return (f"NC{spatial}", f"OI{spatial}", f"NC{spatial}")


def _pool2d(x, kernel, stride, padding, dilation, ceil_mode, op):
    import jax.numpy as jnp
    from jax import lax

    kernel = tuple(kernel)
    stride = tuple(stride) if stride else kernel
    padding = tuple(padding)
    if dilation is not None and tuple(dilation) != (1, 1):
        raise NotImplementedError("dilated pooling")
    h, w = x.shape[2], x.shape[3]
    pads = []
    for size, k, s, p in ((h, kernel[0], stride[0], padding[0]),
                          (w, kernel[1], stride[1], padding[1])):
        if ceil_mode:
            out = -(-(size + 2 * p - k) // s) + 1
            # torch: the last window must start inside input+left pad.
            if (out - 1) * s >= size + p:
                out -= 1
        else:
            out = (size + 2 * p - k) // s + 1
        extra = max((out - 1) * s + k - (size + 2 * p), 0)
        pads.append((p, p + extra))
    window = (1, 1) + kernel
    strides = (1, 1) + stride
    pad4 = ((0, 0), (0, 0)) + tuple(pads)
    if op == "max":
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
            jnp.iinfo(x.dtype).min
        )
        return lax.reduce_window(x, init, lax.max, window, strides, pad4)
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pad4)
    return summed, pads, kernel, strides


def _avg_pool2d(x, kernel, stride, padding, ceil_mode, count_include_pad,
                divisor_override):
    import jax.numpy as jnp
    from jax import lax

    summed, pads, kernel, strides = _pool2d(
        x, kernel, stride, padding, None, ceil_mode, "avg"
    )
    if divisor_override:
        return summed / divisor_override
    if count_include_pad and not any(p[1] != p[0] for p in pads):
        return summed / (kernel[0] * kernel[1])
    if count_include_pad:
        # torch counts the symmetric (p, p) padding as real pixels and
        # excludes ONLY the ceil-mode extra: count over a ones array
        # grown by the symmetric pads, padding only the ceil extra.
        extra = tuple((0, p[1] - p[0]) for p in pads)
        ones = jnp.ones(
            tuple(s + 2 * p[0] for s, p in zip(x.shape[2:], pads)), x.dtype
        )
        counts = lax.reduce_window(
            ones, 0.0, lax.add, kernel, strides[2:], extra
        )
        return summed / counts[None, None]
    ones = jnp.ones(x.shape[2:], x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, kernel, strides[2:], tuple(pads)
    )
    return summed / counts[None, None]


def _upsample_nearest2d(x, output_size, scales):
    import jax.numpy as jnp

    n, c, h, w = x.shape
    if output_size is not None:
        oh, ow = output_size
    else:
        sh, sw = (scales, scales) if np.isscalar(scales) else scales
        oh, ow = int(h * sh), int(w * sw)
    if oh % h == 0 and ow % w == 0:
        return jnp.repeat(jnp.repeat(x, oh // h, axis=2), ow // w, axis=3)
    # torch nearest uses the asymmetric rule idx = floor(dst * in / out)
    # (NOT half-pixel centers, which jax.image.resize would apply).
    rows = (np.arange(oh) * h // oh).astype(np.int32)
    cols = (np.arange(ow) * w // ow).astype(np.int32)
    return jnp.take(jnp.take(x, rows, axis=2), cols, axis=3)


def _upsample_bilinear2d(x, output_size, align_corners, scales):
    import jax
    import jax.numpy as jnp

    n, c, h, w = x.shape
    if output_size is not None:
        oh, ow = output_size
    else:
        sh, sw = (scales, scales) if np.isscalar(scales) else scales
        oh, ow = int(h * sh), int(w * sw)
    if not align_corners:
        # torch align_corners=False == half-pixel centers == jax.image.
        return jax.image.resize(x, (n, c, oh, ow), method="linear")

    def axis_interp(arr, out_len, axis):
        in_len = arr.shape[axis]
        if in_len == 1 or out_len == 1:
            idx = jnp.zeros((out_len,), jnp.int32)
            return jnp.take(arr, idx, axis=axis)
        pos = jnp.linspace(0.0, in_len - 1.0, out_len)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_len - 2)
        frac = pos - lo
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, lo + 1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_len
        frac = frac.reshape(shape)
        return a * (1 - frac) + b * frac

    x = axis_interp(x, oh, 2)
    return axis_interp(x, ow, 3)


def _batch_norm(x, weight, bias, running_mean, running_var, training,
                momentum, eps):
    import jax.numpy as jnp

    nd = x.ndim
    shape = (1, -1) + (1,) * (nd - 2)
    if training or running_mean is None:
        axes = (0,) + tuple(range(2, nd))
        mean = x.mean(axis=axes)
        var = x.var(axis=axes)
    else:
        mean, var = running_mean, running_var
    inv = 1.0 / jnp.sqrt(var + eps)
    if weight is not None:
        inv = inv * weight
    out = (x - mean.reshape(shape)) * inv.reshape(shape)
    if bias is not None:
        out = out + bias.reshape(shape)
    return out


def _layer_norm(x, normalized_shape, weight, bias, eps):
    import jax.numpy as jnp

    axes = tuple(range(x.ndim - len(normalized_shape), x.ndim))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    out = (x - mean) / jnp.sqrt(var + eps)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out


def _lstm_cell_scan(xs, w_ih, w_hh, b, hidden, reverse, h0=None, c0=None):
    """One direction of one LSTM layer over (T, B, C) inputs."""
    import jax.numpy as jnp
    from jax import lax

    t_axis = 0
    if reverse:
        xs = jnp.flip(xs, axis=t_axis)
    # Hoist the input projection out of the scan: one big MXU matmul.
    gates_x = jnp.einsum("tbc,gc->tbg", xs, w_ih) + b

    def step(carry, gx):
        h, c = carry
        gates = gx + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = 1 / (1 + jnp.exp(-i))
        f = 1 / (1 + jnp.exp(-f))
        o = 1 / (1 + jnp.exp(-o))
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    b_sz = xs.shape[1]
    if h0 is None:
        h0 = jnp.zeros((b_sz, hidden), xs.dtype)
    if c0 is None:
        c0 = jnp.zeros((b_sz, hidden), xs.dtype)
    (h_f, c_f), ys = lax.scan(step, (h0, c0), gates_x)
    if reverse:
        ys = jnp.flip(ys, axis=t_axis)
    return ys, h_f, c_f


def _lstm(x, hx, flat_weights, has_biases, num_layers, dropout, train,
          bidirectional, batch_first):
    import jax.numpy as jnp

    if batch_first:
        x = jnp.swapaxes(x, 0, 1)  # (T, B, C)
    dirs = 2 if bidirectional else 1
    per_layer = (4 if has_biases else 2) * dirs
    # torch hx is [h_0, c_0], each (num_layers*dirs, B, H); None == zeros.
    h_init = c_init = None
    if hx is not None:
        h_init, c_init = hx[0], hx[1]
    h_outs, c_outs = [], []
    for layer in range(num_layers):
        base = layer * per_layer
        outs = []
        for d in range(dirs):
            off = base + d * (4 if has_biases else 2)
            w_ih = flat_weights[off]
            w_hh = flat_weights[off + 1]
            if has_biases:
                bias = flat_weights[off + 2] + flat_weights[off + 3]
            else:
                bias = jnp.zeros((w_ih.shape[0],), x.dtype)
            hidden = w_hh.shape[1]
            state = layer * dirs + d
            ys, h_f, c_f = _lstm_cell_scan(
                x, w_ih, w_hh, bias, hidden, reverse=(d == 1),
                h0=None if h_init is None else h_init[state],
                c0=None if c_init is None else c_init[state],
            )
            outs.append(ys)
            h_outs.append(h_f)
            c_outs.append(c_f)
        x = outs[0] if dirs == 1 else jnp.concatenate(outs, axis=-1)
    h_n = jnp.stack(h_outs)
    c_n = jnp.stack(c_outs)
    if batch_first:
        x = jnp.swapaxes(x, 0, 1)
    return x, h_n, c_n


def _gru(x, hx, flat_weights, has_biases, num_layers, dropout, train,
         bidirectional, batch_first):
    import jax.numpy as jnp
    from jax import lax

    if batch_first:
        x = jnp.swapaxes(x, 0, 1)
    dirs = 2 if bidirectional else 1
    per_layer = (4 if has_biases else 2) * dirs
    h_outs = []
    for layer in range(num_layers):
        base = layer * per_layer
        outs = []
        for d in range(dirs):
            off = base + d * (4 if has_biases else 2)
            w_ih, w_hh = flat_weights[off], flat_weights[off + 1]
            state = layer * dirs + d
            if has_biases:
                b_ih, b_hh = flat_weights[off + 2], flat_weights[off + 3]
            else:
                b_ih = b_hh = jnp.zeros((w_ih.shape[0],), x.dtype)
            hidden = w_hh.shape[1]
            xs = jnp.flip(x, 0) if d == 1 else x
            gates_x = jnp.einsum("tbc,gc->tbg", xs, w_ih) + b_ih

            def step(h, gx, w_hh=w_hh, b_hh=b_hh, hidden=hidden):
                gh = h @ w_hh.T + b_hh
                xr, xz, xn = jnp.split(gx, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = 1 / (1 + jnp.exp(-(xr + hr)))
                z = 1 / (1 + jnp.exp(-(xz + hz)))
                n = jnp.tanh(xn + r * hn)
                h = (1 - z) * n + z * h
                return h, h

            # torch hx is a (num_layers*dirs, B, H) tensor; None == zeros.
            if hx is not None:
                h0 = hx[state]
            else:
                h0 = jnp.zeros((xs.shape[1], hidden), x.dtype)
            h_f, ys = lax.scan(step, h0, gates_x)
            if d == 1:
                ys = jnp.flip(ys, 0)
            outs.append(ys)
            h_outs.append(h_f)
        x = outs[0] if dirs == 1 else jnp.concatenate(outs, axis=-1)
    h_n = jnp.stack(h_outs)
    if batch_first:
        x = jnp.swapaxes(x, 0, 1)
    return x, h_n


# ---------------------------------------------------------------------------
# The interpreter
# ---------------------------------------------------------------------------

def ts_to_jax(
    ts_module,
) -> Tuple[Callable[..., Any], Dict[str, np.ndarray]]:
    """Convert a TorchScript module to ``(fn, params)``.

    ``fn(params, *inputs)`` re-executes the module's inlined forward
    graph with jnp ops; ``params`` is the flat numpy parameter dict.
    ``fn`` is pure and jit-compatible.  Raises ``NotImplementedError``
    naming the op for graphs outside the supported families (run
    :func:`inspect_torchscript` first)."""
    graph = ts_module.inlined_graph
    params: Dict[str, np.ndarray] = {}

    # Pre-resolve every GetAttr chain once (also fills `params`).
    const_env: Dict[str, Any] = {}
    attr_env: Dict[str, Any] = {}
    graph_inputs = list(graph.inputs())
    self_name = graph_inputs[0].debugName()
    attr_env[self_name] = _Ref(ts_module, ())
    node_list = list(graph.nodes())
    for node in node_list:
        kind = node.kind()
        if kind == "prim::Constant":
            out = node.output()
            try:
                val = _iv(out)
            except RuntimeError:
                val = None
            if hasattr(val, "detach"):  # constant tensor baked in graph
                key = f"__const__{out.debugName()}"
                params[key] = val.detach().cpu().numpy()
                const_env[out.debugName()] = _Param(key)
            else:
                const_env[out.debugName()] = _ts_clean_const(val)
        elif kind == "prim::GetAttr":
            parent = attr_env[node.input().debugName()]
            name = node.s("name")
            obj = getattr(parent.obj, name)
            path = parent.path + (name,)
            out = node.output()
            if hasattr(obj, "detach"):  # Parameter or buffer tensor
                key = ".".join(path)
                params[key] = obj.detach().cpu().numpy()
                attr_env[out.debugName()] = _Param(key)
            else:
                attr_env[out.debugName()] = _Ref(obj, path)

    output_names = [o.debugName() for o in graph.outputs()]
    input_names = [v.debugName() for v in graph_inputs[1:]]

    def fn(run_params: Dict[str, Any], *inputs):
        if len(inputs) != len(input_names):
            raise ValueError(
                f"graph expects {len(input_names)} inputs, got {len(inputs)}"
            )
        env: Dict[str, Any] = {}
        env.update(const_env)
        for name, val in zip(input_names, inputs):
            env[name] = val

        def resolve(value):
            v = env.get(value.debugName(), _MISSING)
            if v is _MISSING:
                v = attr_env.get(value.debugName(), _MISSING)
            if v is _MISSING:
                raise KeyError(f"unresolved graph value {value.debugName()}")
            if isinstance(v, _Param):
                return run_params[v.key]
            return v

        for node in node_list:
            kind = node.kind()
            if kind in ("prim::Constant", "prim::GetAttr"):
                continue  # pre-resolved
            ins = [resolve(v) for v in node.inputs()]
            outs = _exec_node(kind, node, ins)
            node_outputs = list(node.outputs())
            if len(node_outputs) == 1:
                env[node_outputs[0].debugName()] = outs
            else:
                for ov, o in zip(node_outputs, outs):
                    env[ov.debugName()] = o

        results = []
        for name in output_names:
            v = env.get(name, _MISSING)
            if v is _MISSING:
                v = attr_env.get(name)
                if isinstance(v, _Param):
                    v = run_params[v.key]
            results.append(v)
        return results[0] if len(results) == 1 else tuple(results)

    return fn, params


_MISSING = object()


def _ts_clean_const(val):
    """Normalize IValue constants: torch.device / dtype objects are only
    consumed by ops we ignore them in."""
    tname = type(val).__name__
    if tname in ("device", "dtype", "layout", "memory_format"):
        return None
    return val


def _shape_of(x) -> Tuple[int, ...]:
    return tuple(int(d) for d in x.shape)


def _exec_node(kind: str, node, ins: List[Any]):
    import jax.numpy as jnp

    fn = _OPS.get(kind)
    if fn is None:
        raise NotImplementedError(
            f"TorchScript op {kind} is not supported by the JAX "
            f"interpreter (node: {node})"
        )
    return fn(ins, node)


def _normalize_dim(dim, ndim):
    return dim + ndim if dim < 0 else dim


def _op_to(ins, node):
    # aten::to has many overloads; find a dtype enum among the args.
    x = ins[0]
    for a in ins[1:]:
        # NB bool is an int subclass: non_blocking/copy flags must not
        # be read as dtype enums (False would mean uint8).
        if isinstance(a, int) and not isinstance(a, bool) \
                and a in _TORCH_DTYPE_ENUM:
            import jax.numpy as jnp

            return x.astype(_TORCH_DTYPE_ENUM[a])
        if hasattr(a, "dtype"):  # to(other) overload
            return x.astype(a.dtype)
    return x


def _op_slice(ins, node):
    x, dim, start, end, step = ins
    if not hasattr(x, "ndim"):  # list slice
        return x[start:end:step]
    dim = _normalize_dim(dim, x.ndim)
    idx = [slice(None)] * x.ndim
    end = None if end in (None, 9223372036854775807) else end
    idx[dim] = slice(start, end, step)
    return x[tuple(idx)]


def _make_ops() -> Dict[str, Callable]:
    import jax
    import jax.numpy as jnp

    def ew(f):  # elementwise, first arg tensor
        return lambda ins, node: f(*ins)

    def alpha_add(x, y, alpha=1):
        return x + alpha * y

    def alpha_sub(x, y, alpha=1):
        return x - alpha * y

    def alpha_rsub(x, y, alpha=1):
        return y - alpha * x

    ops: Dict[str, Callable] = {
        # --- structure ---
        "prim::ListConstruct": lambda ins, node: list(ins),
        "prim::TupleConstruct": lambda ins, node: tuple(ins),
        "prim::ListUnpack": lambda ins, node: tuple(ins[0]),
        "prim::TupleUnpack": lambda ins, node: tuple(ins[0]),
        "prim::NumToTensor": lambda ins, node: ins[0],
        "prim::dtype": lambda ins, node: None,
        "prim::device": lambda ins, node: None,
        "prim::unchecked_cast": lambda ins, node: ins[0],
        "aten::Int": lambda ins, node: int(ins[0]),
        "aten::ScalarImplicit": lambda ins, node: ins[0],
        "aten::item": lambda ins, node: ins[0],
        "aten::size": lambda ins, node: (
            _shape_of(ins[0])[_normalize_dim(ins[1], ins[0].ndim)]
            if len(ins) > 1 else list(_shape_of(ins[0]))
        ),
        "aten::len": lambda ins, node: len(ins[0]),
        "aten::__getitem__": lambda ins, node: ins[0][ins[1]],
        "aten::warn": lambda ins, node: None,
        "aten::contiguous": lambda ins, node: ins[0],
        "aten::clone": lambda ins, node: ins[0],
        "aten::detach": lambda ins, node: ins[0],
        "aten::alias": lambda ins, node: ins[0],
        "aten::to": _op_to,
        "aten::type_as": lambda ins, node: ins[0].astype(ins[1].dtype),
        "aten::cpu": lambda ins, node: ins[0],
        "aten::numel": lambda ins, node: int(np.prod(_shape_of(ins[0]))),
        # --- creation ---
        "aten::zeros": lambda ins, node: jnp.zeros(
            tuple(ins[0]),
            _TORCH_DTYPE_ENUM.get(ins[1], np.float32)
            if isinstance(ins[1], int) else np.float32,
        ),
        "aten::ones": lambda ins, node: jnp.ones(
            tuple(ins[0]),
            _TORCH_DTYPE_ENUM.get(ins[1], np.float32)
            if isinstance(ins[1], int) else np.float32,
        ),
        "aten::zeros_like": lambda ins, node: jnp.zeros_like(ins[0]),
        "aten::ones_like": lambda ins, node: jnp.ones_like(ins[0]),
        "aten::full_like": lambda ins, node: jnp.full_like(ins[0], ins[1]),
        "aten::arange": lambda ins, node: jnp.arange(
            *[a for a in ins[:-4] if a is not None]
        ),
        # --- shape ---
        "aten::view": lambda ins, node: ins[0].reshape(tuple(ins[1])),
        "aten::reshape": lambda ins, node: ins[0].reshape(tuple(ins[1])),
        "aten::flatten": lambda ins, node: _flatten(ins),
        "aten::permute": lambda ins, node: jnp.transpose(
            ins[0], tuple(ins[1])
        ),
        "aten::transpose": lambda ins, node: jnp.swapaxes(
            ins[0], ins[1], ins[2]
        ),
        "aten::t": lambda ins, node: ins[0].T,
        "aten::unsqueeze": lambda ins, node: jnp.expand_dims(
            ins[0], ins[1]
        ),
        "aten::squeeze": lambda ins, node: (
            jnp.squeeze(ins[0]) if len(ins) == 1
            else jnp.squeeze(ins[0], _normalize_dim(ins[1], ins[0].ndim))
        ),
        "aten::slice": _op_slice,
        "aten::select": lambda ins, node: jnp.take(
            ins[0], ins[2], axis=_normalize_dim(ins[1], ins[0].ndim)
        ),
        "aten::index_select": lambda ins, node: jnp.take(
            ins[0], ins[2], axis=_normalize_dim(ins[1], ins[0].ndim)
        ),
        "aten::cat": lambda ins, node: jnp.concatenate(ins[0], axis=ins[1]),
        "aten::stack": lambda ins, node: jnp.stack(ins[0], axis=ins[1]),
        "aten::chunk": lambda ins, node: tuple(
            jnp.array_split(ins[0], ins[1], axis=ins[2])
        ),
        "aten::split": lambda ins, node: tuple(
            _split_sizes(ins[0], ins[1], ins[2])
        ),
        "aten::expand": lambda ins, node: jnp.broadcast_to(
            ins[0], _expand_shape(ins[0], ins[1])
        ),
        "aten::expand_as": lambda ins, node: jnp.broadcast_to(
            ins[0], ins[1].shape
        ),
        "aten::repeat": lambda ins, node: jnp.tile(ins[0], tuple(ins[1])),
        "aten::constant_pad_nd": lambda ins, node: _const_pad(ins),
        "aten::reflection_pad2d": lambda ins, node: _pad2d(
            ins, "reflect"
        ),
        "aten::replication_pad2d": lambda ins, node: _pad2d(ins, "edge"),
        "aten::pixel_shuffle": lambda ins, node: _pixel_shuffle(ins),
        # --- math ---
        "aten::add": ew(alpha_add), "aten::add_": ew(alpha_add),
        "aten::sub": ew(alpha_sub), "aten::sub_": ew(alpha_sub),
        "aten::rsub": ew(alpha_rsub),
        "aten::mul": ew(lambda x, y: x * y),
        "aten::mul_": ew(lambda x, y: x * y),
        "aten::div": ew(lambda x, y: x / y),
        "aten::div_": ew(lambda x, y: x / y),
        "aten::floor_divide": ew(lambda x, y: x // y),
        "aten::pow": ew(lambda x, y: x ** y),
        "aten::neg": ew(lambda x: -x),
        "aten::exp": ew(jnp.exp), "aten::log": ew(jnp.log),
        "aten::sqrt": ew(jnp.sqrt),
        "aten::rsqrt": ew(lambda x: 1.0 / jnp.sqrt(x)),
        "aten::abs": ew(jnp.abs),
        "aten::floor": ew(jnp.floor), "aten::ceil": ew(jnp.ceil),
        "aten::clamp": lambda ins, node: jnp.clip(ins[0], ins[1], ins[2]),
        "aten::clamp_": lambda ins, node: jnp.clip(ins[0], ins[1], ins[2]),
        "aten::clamp_min": lambda ins, node: jnp.maximum(ins[0], ins[1]),
        "aten::clamp_max": lambda ins, node: jnp.minimum(ins[0], ins[1]),
        "aten::mean": lambda ins, node: _reduce(ins, jnp.mean),
        "aten::sum": lambda ins, node: _reduce(ins, jnp.sum),
        "aten::max": lambda ins, node: _minmax(ins, jnp.max, jnp.argmax,
                                               jnp.maximum),
        "aten::min": lambda ins, node: _minmax(ins, jnp.min, jnp.argmin,
                                               jnp.minimum),
        "aten::amax": lambda ins, node: jnp.max(
            ins[0], axis=tuple(ins[1]), keepdims=ins[2]
        ),
        "aten::argmax": lambda ins, node: jnp.argmax(
            ins[0], axis=ins[1], keepdims=bool(ins[2])
        ),
        "aten::softmax": lambda ins, node: jax.nn.softmax(
            ins[0], axis=ins[1]
        ),
        "aten::log_softmax": lambda ins, node: jax.nn.log_softmax(
            ins[0], axis=ins[1]
        ),
        # --- activations ---
        "aten::relu": ew(jax.nn.relu), "aten::relu_": ew(jax.nn.relu),
        "aten::leaky_relu": lambda ins, node: jax.nn.leaky_relu(
            ins[0], ins[1]
        ),
        "aten::leaky_relu_": lambda ins, node: jax.nn.leaky_relu(
            ins[0], ins[1]
        ),
        "aten::elu": lambda ins, node: jax.nn.elu(ins[0], ins[1]),
        "aten::gelu": lambda ins, node: jax.nn.gelu(
            ins[0], approximate=(len(ins) > 1 and ins[1] == "tanh")
        ),
        "aten::silu": ew(jax.nn.silu), "aten::silu_": ew(jax.nn.silu),
        "aten::hardswish": ew(jax.nn.hard_swish),
        "aten::sigmoid": ew(jax.nn.sigmoid),
        "aten::tanh": ew(jnp.tanh),
        "aten::hardtanh": lambda ins, node: jnp.clip(ins[0], ins[1], ins[2]),
        "aten::hardtanh_": lambda ins, node: jnp.clip(
            ins[0], ins[1], ins[2]
        ),
        "aten::dropout": lambda ins, node: ins[0],
        "aten::dropout_": lambda ins, node: ins[0],
        "aten::feature_dropout": lambda ins, node: ins[0],
        # --- linear algebra ---
        "aten::linear": lambda ins, node: (
            ins[0] @ ins[1].T + (ins[2] if ins[2] is not None else 0)
        ),
        # torch.addmm(input, mat1, mat2, *, beta, alpha)
        #   = beta*input + alpha*(mat1 @ mat2)
        "aten::addmm": lambda ins, node: (
            ins[0] * (ins[3] if len(ins) > 3 else 1)
            + (ins[4] if len(ins) > 4 else 1) * (ins[1] @ ins[2])
        ),
        "aten::matmul": ew(jnp.matmul),
        "aten::bmm": ew(jnp.matmul),
        "aten::einsum": lambda ins, node: jnp.einsum(ins[0], *ins[1]),
        "aten::embedding": lambda ins, node: jnp.take(
            ins[0], ins[1], axis=0
        ),
        # --- NN layers ---
        "aten::_convolution": lambda ins, node: _conv(
            ins[0], ins[1], ins[2], ins[3], ins[4], ins[5], ins[6],
            ins[7], ins[8],
        ),
        "aten::conv1d": lambda ins, node: _conv(
            ins[0], ins[1], ins[2], ins[3], ins[4], ins[5], False,
            [0], ins[6],
        ),
        "aten::conv2d": lambda ins, node: _conv(
            ins[0], ins[1], ins[2], ins[3], ins[4], ins[5], False,
            [0, 0], ins[6],
        ),
        "aten::conv_transpose2d": lambda ins, node: _conv(
            ins[0], ins[1], ins[2], ins[3], ins[4], ins[7], True,
            ins[5], ins[6],
        ),
        "aten::batch_norm": lambda ins, node: _batch_norm(
            ins[0], ins[1], ins[2], ins[3], ins[4], ins[5], ins[6], ins[7]
        ),
        "aten::instance_norm": lambda ins, node: _batch_norm(
            ins[0], ins[1], ins[2], None, None, True, 0.0, ins[7]
        ),
        "aten::layer_norm": lambda ins, node: _layer_norm(
            ins[0], ins[1], ins[2], ins[3], ins[4]
        ),
        "aten::group_norm": lambda ins, node: _group_norm(ins),
        "aten::max_pool2d": lambda ins, node: _pool2d(
            ins[0], ins[1], ins[2], ins[3], ins[4], ins[5], "max"
        ),
        "aten::avg_pool2d": lambda ins, node: _avg_pool2d(
            ins[0], ins[1], ins[2], ins[3], ins[4], ins[5],
            ins[6] if len(ins) > 6 else None,
        ),
        "aten::adaptive_avg_pool2d": lambda ins, node: _adaptive_avg(ins),
        "aten::upsample_nearest2d": lambda ins, node: _upsample_nearest2d(
            ins[0], ins[1], ins[2] if len(ins) > 2 else None
        ),
        "aten::upsample_bilinear2d": lambda ins, node: _upsample_bilinear2d(
            ins[0], ins[1], ins[2], ins[3] if len(ins) > 3 else None
        ),
        "aten::lstm": lambda ins, node: _lstm(*ins),
        "aten::gru": lambda ins, node: _gru(*ins),
    }
    return ops


def _flatten(ins):
    import jax.numpy as jnp

    x = ins[0]
    start = _normalize_dim(ins[1] if len(ins) > 1 else 0, x.ndim)
    end = _normalize_dim(ins[2] if len(ins) > 2 else -1, x.ndim)
    shape = x.shape[:start] + (-1,) + x.shape[end + 1:]
    return x.reshape(shape)


def _split_sizes(x, sizes, dim):
    import jax.numpy as jnp

    dim = _normalize_dim(dim, x.ndim)
    if isinstance(sizes, int):
        n = x.shape[dim]
        sizes = [sizes] * (n // sizes) + ([n % sizes] if n % sizes else [])
    pieces, off = [], 0
    for s in sizes:
        idx = [slice(None)] * x.ndim
        idx[dim] = slice(off, off + s)
        pieces.append(x[tuple(idx)])
        off += s
    return pieces


def _expand_shape(x, target):
    return tuple(
        x.shape[i - (len(target) - x.ndim)] if t == -1 else t
        for i, t in enumerate(target)
    )


def _const_pad(ins):
    import jax.numpy as jnp

    x, pad, value = ins
    # torch pad order: last dim first, (left, right) pairs.
    pairs = [(0, 0)] * x.ndim
    for i in range(len(pad) // 2):
        pairs[x.ndim - 1 - i] = (pad[2 * i], pad[2 * i + 1])
    return jnp.pad(x, pairs, constant_values=value)


def _pad2d(ins, mode):
    import jax.numpy as jnp

    x, pad = ins[0], ins[1]
    pairs = [(0, 0)] * (x.ndim - 2) + [
        (pad[2], pad[3]), (pad[0], pad[1])
    ]
    return jnp.pad(x, pairs, mode=mode)


def _pixel_shuffle(ins):
    import jax.numpy as jnp

    x, r = ins
    n, c, h, w = x.shape
    x = x.reshape(n, c // (r * r), r, r, h, w)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(n, c // (r * r), h * r, w * r)


def _group_norm(ins):
    import jax.numpy as jnp

    x, groups, weight, bias, eps = ins[0], ins[1], ins[2], ins[3], ins[4]
    n, c = x.shape[:2]
    xg = x.reshape((n, groups, c // groups) + x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    mean = xg.mean(axis=axes, keepdims=True)
    var = xg.var(axis=axes, keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    out = xg.reshape(x.shape)
    shape = (1, c) + (1,) * (x.ndim - 2)
    if weight is not None:
        out = out * weight.reshape(shape)
    if bias is not None:
        out = out + bias.reshape(shape)
    return out


def _adaptive_avg(ins):
    import jax.numpy as jnp

    x, out_size = ins
    oh, ow = out_size
    n, c, h, w = x.shape
    if h % oh or w % ow:
        raise NotImplementedError(
            "adaptive_avg_pool2d with non-divisible sizes"
        )
    x = x.reshape(n, c, oh, h // oh, ow, w // ow)
    return x.mean(axis=(3, 5))


def _reduce(ins, f):
    x = ins[0]
    if len(ins) == 1 or ins[1] is None or (
        isinstance(ins[1], int) and ins[1] in _TORCH_DTYPE_ENUM
        and len(ins) == 2
    ):
        return f(x)
    dim = ins[1]
    keepdim = bool(ins[2]) if len(ins) > 2 and isinstance(
        ins[2], (bool, int)
    ) else False
    axis = tuple(dim) if isinstance(dim, (list, tuple)) else dim
    return f(x, axis=axis, keepdims=keepdim)


def _minmax(ins, freduce, farg, fbinary):
    if len(ins) == 1:
        return freduce(ins[0])
    if hasattr(ins[1], "ndim") or hasattr(ins[1], "shape"):
        return fbinary(ins[0], ins[1])
    dim, keepdim = ins[1], bool(ins[2]) if len(ins) > 2 else False
    return (
        freduce(ins[0], axis=dim, keepdims=keepdim),
        farg(ins[0], axis=dim, keepdims=keepdim),
    )


_OPS: Dict[str, Callable] = {}
_SUPPORTED: set = set()


def _ensure_ops():
    global _OPS, _SUPPORTED
    if not _OPS:
        _OPS.update(_make_ops())
        _SUPPORTED.update(_OPS)
        _SUPPORTED.update({
            "prim::Constant", "prim::GetAttr",
        })


_ensure_ops()
