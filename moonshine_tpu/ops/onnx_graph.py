"""Execute small ONNX CNN graphs as jitted JAX functions.

Used to run the reference's in-tree real weights (reference:
micro/models/spelling_cnn_mel.onnx — 51-way MobileNetV2-style spelling
classifier; micro/models/tinyvad_cnn_speech_mel.onnx — TinyVadCNN speech
classifier; see micro/models/README.md for the contracts) on TPU without
any ONNX runtime: the graph is interpreted once at trace time into a pure
jnp program, so XLA sees a single fused convnet.

Design notes (TPU-first):
- Shape/constant plumbing (Constant/Reshape-of-constants/Concat/Slice/...)
  is folded eagerly with numpy at trace time; only the data path becomes
  XLA ops, so `Pad` amounts computed by a little int64 subgraph never
  appear as dynamic shapes.
- Convs run via lax.conv_general_dilated in NCHW/OIHW exactly as exported;
  XLA lays them out for the MXU itself.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.onnx_io import OnnxGraph


def _is_const(x) -> bool:
    return isinstance(x, np.ndarray) or np.isscalar(x)


def _conv_dims(nd: int) -> tuple[str, str, str]:
    sp = "DHW"[-nd:] if nd <= 3 else "".join(chr(ord("a") + i) for i in range(nd))
    return ("NC" + sp, "OI" + sp, "NC" + sp)


def _conv(x, w, b, attrs):
    """ONNX Conv, any spatial rank (1-D for vocoders, 2-D for CNNs)."""
    w = jnp.asarray(w)
    nd = w.ndim - 2
    group = int(attrs.get("group", 1))
    strides = tuple(attrs.get("strides", [1] * nd))
    dil = tuple(attrs.get("dilations", [1] * nd))
    pads = attrs.get("pads", [0] * 2 * nd)  # [begin..., end...]
    padding = [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dil,
        feature_group_count=group,
        dimension_numbers=_conv_dims(nd),
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
    return out


def _conv_transpose(x, w, b, attrs):
    """ONNX ConvTranspose as a fractionally-strided conv: dilate the input
    by `strides`, flip the kernel, and convolve with adjusted padding
    (out = (in-1)*s - pad_b - pad_e + k + output_padding)."""
    w = np.asarray(w)  # ONNX layout [Cin, Cout/g, *k]
    nd = w.ndim - 2
    group = int(attrs.get("group", 1))
    strides = tuple(int(s) for s in attrs.get("strides", [1] * nd))
    dil = tuple(int(d) for d in attrs.get("dilations", [1] * nd))
    pads = [int(p) for p in attrs.get("pads", [0] * 2 * nd)]
    opad = [int(p) for p in attrs.get("output_padding", [0] * nd)]
    if "output_shape" in attrs:
        raise NotImplementedError("ConvTranspose output_shape attribute")
    cin = w.shape[0]
    coutg = w.shape[1]
    k = w.shape[2:]
    # [Cin, Cout/g, *k] -> [g, Cin/g, Cout/g, *k] -> [Cout, Cin/g, *k], then
    # flip every spatial axis.
    wg = w.reshape((group, cin // group, coutg) + k)
    wg = np.moveaxis(wg, 2, 1).reshape((group * coutg, cin // group) + k)
    wg = np.flip(wg, axis=tuple(range(2, 2 + nd)))
    eff_k = [dil[i] * (k[i] - 1) + 1 for i in range(nd)]
    padding = [
        (eff_k[i] - 1 - pads[i], eff_k[i] - 1 - pads[nd + i] + opad[i])
        for i in range(nd)
    ]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(wg),
        window_strides=(1,) * nd,
        padding=padding,
        lhs_dilation=strides,
        rhs_dilation=dil,
        feature_group_count=group,
        dimension_numbers=_conv_dims(nd),
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
    return out


def _gemm(a, b, c, attrs):
    alpha = float(attrs.get("alpha", 1.0))
    beta = float(attrs.get("beta", 1.0))
    if int(attrs.get("transA", 0)):
        a = a.T
    if int(attrs.get("transB", 0)):
        b = np.asarray(b).T if _is_const(b) else b.T
    out = alpha * (a @ jnp.asarray(b))
    if c is not None:
        out = out + beta * jnp.asarray(c)
    return out


def _pad(x, pads, value, attrs):
    pads = np.asarray(pads).reshape(-1)
    rank = x.ndim
    cfg = [(int(pads[i]), int(pads[i + rank]), 0) for i in range(rank)]
    mode = attrs.get("mode", b"constant")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    if mode != "constant":
        return jnp.pad(x, [(lo, hi) for lo, hi, _ in cfg], mode=mode)
    v = 0.0 if value is None else float(np.asarray(value).reshape(()))
    return jax.lax.pad(x, jnp.asarray(v, x.dtype), cfg)


def _slice(data, starts, ends, axes=None, steps=None):
    starts = np.asarray(starts).reshape(-1)
    ends = np.asarray(ends).reshape(-1)
    axes = np.arange(len(starts)) if axes is None else np.asarray(axes).reshape(-1)
    steps = np.ones(len(starts), np.int64) if steps is None else np.asarray(steps).reshape(-1)
    slices = [slice(None)] * data.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        dim = data.shape[int(a)]
        s, e, st = int(s), int(e), int(st)
        if st > 0:
            s = max(s + dim, 0) if s < 0 else min(s, dim)
            e = max(e + dim, 0) if e < 0 else min(e, dim)
            slices[int(a)] = slice(s, e, st)
        else:
            # Negative step: ONNX clamps start to [0, dim-1]; an end below
            # -dim means "through the first element" (Python end=None).
            s = min(max(s + dim if s < 0 else s, 0), dim - 1)
            end = None if e < -dim else (e + dim if e < 0 else min(e, dim))
            slices[int(a)] = slice(s, end, st)
    return data[tuple(slices)]


_ONNX_DT_TO_NP = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_, 11: np.float64}


def _run_node(node, vals):
    """Compute one node given resolved input values. Returns output value(s)."""
    ins = [vals[n] if n else None for n in node.inputs]
    op = node.op_type
    a = node.attrs
    if op == "Constant":
        return a.get("value")
    if op == "ConstantOfShape":
        shape = tuple(int(v) for v in np.asarray(ins[0]).reshape(-1))
        fill = a.get("value")
        fill = np.zeros(1, np.float32) if fill is None else np.asarray(fill).reshape(-1)
        return np.full(shape, fill[0], dtype=fill.dtype)
    if op == "Conv":
        return _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
    if op == "Clip":
        lo = ins[1] if len(ins) > 1 else a.get("min")
        hi = ins[2] if len(ins) > 2 else a.get("max")
        x = ins[0]
        if lo is not None:
            x = jnp.maximum(x, jnp.asarray(lo, x.dtype))
        if hi is not None:
            x = jnp.minimum(x, jnp.asarray(hi, x.dtype))
        return x
    if op == "Relu":
        return jnp.maximum(ins[0], 0)
    if op == "Sigmoid":
        return jax.nn.sigmoid(ins[0])
    if op == "Softmax":
        return jax.nn.softmax(ins[0], axis=int(a.get("axis", -1)))
    if op == "Add":
        return ins[0] + ins[1]
    if op == "Sub":
        return ins[0] - ins[1]
    if op == "Mul":
        return ins[0] * ins[1]
    if op == "Div":
        return ins[0] / ins[1]
    if op == "GlobalAveragePool":
        return jnp.mean(ins[0], axis=(2, 3), keepdims=True)
    if op == "AveragePool":
        k = tuple(a["kernel_shape"])
        s = tuple(a.get("strides", k))
        x = ins[0]
        out = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1) + k, (1, 1) + s, "VALID"
        )
        return out / float(np.prod(k))
    if op == "MaxPool":
        k = tuple(a["kernel_shape"])
        s = tuple(a.get("strides", k))
        pads = a.get("pads", [0] * 2 * len(k))
        pad_cfg = [(0, 0), (0, 0)] + [
            (int(pads[i]), int(pads[i + len(k)])) for i in range(len(k))
        ]
        return jax.lax.reduce_window(
            ins[0], -jnp.inf, jax.lax.max, (1, 1) + k, (1, 1) + s, pad_cfg
        )
    if op == "Flatten":
        ax = int(a.get("axis", 1))
        lead = int(np.prod(ins[0].shape[:ax])) if ax else 1
        return ins[0].reshape(lead, -1)
    if op == "Reshape":
        shape = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
        if _is_const(ins[0]):
            return np.asarray(ins[0]).reshape(shape)
        return ins[0].reshape(shape)
    if op == "Transpose":
        perm = a.get("perm")
        if _is_const(ins[0]):
            return np.transpose(np.asarray(ins[0]), perm)
        return jnp.transpose(ins[0], perm)
    if op == "Concat":
        axis = int(a.get("axis", 0))
        if all(_is_const(x) for x in ins):
            return np.concatenate([np.asarray(x) for x in ins], axis=axis)
        return jnp.concatenate(ins, axis=axis)
    if op == "Cast":
        to = _ONNX_DT_TO_NP[int(a["to"])]
        if _is_const(ins[0]):
            return np.asarray(ins[0]).astype(to)
        return ins[0].astype(to)
    if op == "Slice":
        return _slice(*ins)
    if op == "Shape":
        return np.asarray(ins[0].shape, np.int64)
    if op == "Gemm":
        return _gemm(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
    if op == "MatMul":
        return ins[0] @ jnp.asarray(ins[1])
    if op == "Pad":
        return _pad(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
    if op == "Unsqueeze":
        axes = [int(v) for v in np.asarray(ins[1] if len(ins) > 1 else a["axes"]).reshape(-1)]
        x = ins[0]
        for ax in sorted(axes):
            x = np.expand_dims(x, ax) if _is_const(x) else jnp.expand_dims(x, ax)
        return x
    if op == "Squeeze":
        axes = [int(v) for v in np.asarray(ins[1] if len(ins) > 1 else a.get("axes", [])).reshape(-1)]
        if _is_const(ins[0]):
            return np.squeeze(np.asarray(ins[0]), axis=tuple(axes) or None)
        return jnp.squeeze(ins[0], axis=tuple(axes) or None)
    if op == "Identity":
        return ins[0]
    if op == "BatchNormalization":
        x, scale, bias, mean, var = ins[:5]
        eps = float(a.get("epsilon", 1e-5))
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = jnp.asarray(scale) / jnp.sqrt(jnp.asarray(var) + eps)
        return x * inv.reshape(shape) + (
            jnp.asarray(bias) - jnp.asarray(mean) * inv
        ).reshape(shape)
    # -- vocoder/transformer-class ops (HiFiGAN/Vocos-style graphs) --------
    if op == "ConvTranspose":
        return _conv_transpose(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
    if op == "LeakyRelu":
        alpha = float(a.get("alpha", 0.01))
        return jnp.where(ins[0] >= 0, ins[0], alpha * ins[0])
    if op == "PRelu":
        slope = jnp.asarray(ins[1])
        return jnp.where(ins[0] >= 0, ins[0], slope * ins[0])
    if op == "Elu":
        alpha = float(a.get("alpha", 1.0))
        return jnp.where(ins[0] >= 0, ins[0], alpha * (jnp.exp(ins[0]) - 1.0))
    if op == "Tanh":
        return jnp.tanh(ins[0])
    if op == "Softplus":
        return jax.nn.softplus(ins[0])
    if op == "Exp":
        return jnp.exp(ins[0])
    if op == "Log":
        return jnp.log(ins[0])
    if op == "Neg":
        return -ins[0]
    if op == "Abs":
        return jnp.abs(ins[0])
    if op == "Ceil":
        return jnp.ceil(ins[0])
    if op == "Floor":
        return jnp.floor(ins[0])
    if op == "Sin":
        return jnp.sin(ins[0])
    if op == "Cos":
        return jnp.cos(ins[0])
    if op == "Pow":
        return ins[0] ** jnp.asarray(ins[1], getattr(ins[0], "dtype", None))
    if op == "Sqrt":
        return jnp.sqrt(ins[0])
    if op == "Erf":
        return jax.lax.erf(ins[0]) if not _is_const(ins[0]) else jax.lax.erf(jnp.asarray(ins[0]))
    if op == "Gelu":
        approx = a.get("approximate", b"none")
        approx = approx.decode() if isinstance(approx, bytes) else approx
        return jax.nn.gelu(ins[0], approximate=(approx == "tanh"))
    if op == "Gather":
        axis = int(a.get("axis", 0))
        idx = ins[1]
        if _is_const(ins[0]) and _is_const(idx):
            return np.take(np.asarray(ins[0]), np.asarray(idx, np.int64), axis=axis)
        return jnp.take(ins[0], jnp.asarray(idx), axis=axis)
    if op == "Split":
        axis = int(a.get("axis", 0))
        x = ins[0]
        if len(ins) > 1 and ins[1] is not None:
            sizes = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
        elif "split" in a:
            sizes = [int(v) for v in a["split"]]
        else:
            n = int(a["num_outputs"])
            sizes = [x.shape[axis] // n] * n
        bounds = np.cumsum(sizes)[:-1]
        return jnp.split(x, bounds, axis=axis)
    if op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin"):
        axes = a.get("axes")
        if axes is None and len(ins) > 1 and ins[1] is not None:
            axes = np.asarray(ins[1]).reshape(-1)
        axes = None if axes is None else tuple(int(v) for v in axes)
        keep = bool(int(a.get("keepdims", 1)))
        fn = {
            "ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
            "ReduceMax": jnp.max, "ReduceMin": jnp.min,
        }[op]
        return fn(ins[0], axis=axes, keepdims=keep)
    if op == "Where":
        if all(_is_const(x) for x in ins):
            return np.where(np.asarray(ins[0]), np.asarray(ins[1]), np.asarray(ins[2]))
        return jnp.where(ins[0], ins[1], ins[2])
    if op in ("Equal", "Less", "Greater", "LessOrEqual", "GreaterOrEqual"):
        fn = {
            "Equal": jnp.equal, "Less": jnp.less, "Greater": jnp.greater,
            "LessOrEqual": jnp.less_equal, "GreaterOrEqual": jnp.greater_equal,
        }[op]
        if all(_is_const(x) for x in ins[:2]):
            return np.asarray(fn(np.asarray(ins[0]), np.asarray(ins[1])))
        return fn(ins[0], ins[1])
    if op == "Not":
        return ~ins[0] if not _is_const(ins[0]) else ~np.asarray(ins[0])
    if op == "Expand":
        shape = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
        # ONNX Expand is bidirectional broadcast.
        target = np.broadcast_shapes(tuple(np.shape(ins[0])), tuple(shape))
        if _is_const(ins[0]):
            return np.broadcast_to(np.asarray(ins[0]), target)
        return jnp.broadcast_to(ins[0], target)
    if op == "Range":
        start, limit, delta = (np.asarray(v).reshape(()) for v in ins[:3])
        return np.arange(start, limit, delta)
    if op == "CumSum":
        axis = int(np.asarray(ins[1]).reshape(()))
        if _is_const(ins[0]):
            return np.cumsum(np.asarray(ins[0]), axis=axis)
        return jnp.cumsum(ins[0], axis=axis)
    if op == "LayerNormalization":
        x, scale = ins[0], jnp.asarray(ins[1])
        axis = int(a.get("axis", -1))
        eps = float(a.get("epsilon", 1e-5))
        axes = tuple(range(axis % x.ndim, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + eps) * scale
        if len(ins) > 2 and ins[2] is not None:
            y = y + jnp.asarray(ins[2])
        return y
    if op == "InstanceNormalization":
        x, scale, bias = ins[0], jnp.asarray(ins[1]), jnp.asarray(ins[2])
        eps = float(a.get("epsilon", 1e-5))
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return (x - mean) / jnp.sqrt(var + eps) * scale.reshape(shape) + bias.reshape(shape)
    if op == "ReduceL2":
        axes = a.get("axes")
        if axes is None and len(ins) > 1 and ins[1] is not None:
            axes = np.asarray(ins[1]).reshape(-1)
        axes = None if axes is None else tuple(int(v) for v in axes)
        keep = bool(int(a.get("keepdims", 1)))
        return jnp.sqrt(jnp.sum(jnp.square(ins[0]), axis=axes, keepdims=keep))
    raise NotImplementedError(f"ONNX op {op} not supported by onnx_graph executor")


def execute(graph: OnnxGraph, feeds: dict[str, jnp.ndarray]) -> list[jnp.ndarray]:
    """Run `graph` on `feeds` (name -> array). Returns graph outputs in order.

    Trace-time interpretation: call under jax.jit for a fused XLA program.
    """
    vals: dict[str, object] = dict(graph.initializers)
    vals.update(feeds)
    for node in graph.nodes:
        outs = _run_node(node, vals)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        for name, v in zip(node.outputs, outs):
            vals[name] = v
    return [jnp.asarray(vals[name]) for name, _ in graph.outputs]


def compile_graph(graph: OnnxGraph):
    """Return a jitted fn(feed_array) -> output array for single-input graphs."""
    (input_name, _), = graph.inputs

    @partial(jax.jit)
    def fn(x):
        return execute(graph, {input_name: x})[0]

    return fn
