"""Execute a parsed TFLite graph as float JAX ops.

Counterpart of ``ops/onnx_graph.py`` for the ``.tflite`` graphs embedded
in the reference's voice packs (reference: micro/neural-tts/src/
pb_decoder.cc runs them with TFLM in s16x8).  TPU-native stance: the
quantized graph is DEQUANTIZED once at load — int8 weights × per-channel
scales, int64 biases × bias scales, int16 constants × their scales — and
executed in float on the MXU.  Float is closer to the original trained
model than the MCU's int16 arithmetic; parity with the s16x8 reference
is bounded by its own quantization error (tests pin agreement on the
shipped decoder at int16-quantization tolerance).

Supported ops: TRANSPOSE, RESHAPE, CONV_2D (dilated, SAME/VALID), ADD,
MUL, GELU (exact + tanh-approximate), TRANSPOSE_CONV, FULLY_CONNECTED —
the s16x8 decoder op set pb_decoder.cc registers, plus FC for future
packs.
"""

from __future__ import annotations

import numpy as np

from ..core.tflite_io import TfliteModel, TfliteTensor

__all__ = ["TfliteExecutor"]


def _dequant(t: TfliteTensor) -> np.ndarray:
    """Constant tensor -> float32 (or raw ints for shape/perm operands)."""
    a = t.data
    if a is None:
        raise ValueError(f"tensor {t.name} has no constant data")
    if a.dtype in (np.int32,) and t.scale is None:
        return a  # shape / permutation operand
    if t.scale is None:
        return a.astype(np.float32)
    scale = t.scale.astype(np.float32)
    if a.dtype == np.int8 and len(scale) > 1:
        # per-channel (quantized_dimension is the output-channel axis 0
        # for conv weights in the packs we load)
        shape = [1] * a.ndim
        shape[t.quantized_dimension] = len(scale)
        return a.astype(np.float32) * scale.reshape(shape)
    return a.astype(np.float32) * scale[0]


class TfliteExecutor:
    """Float executor: ``run(x)`` maps the graph's single input to its
    single output, both as float arrays in DEQUANTIZED units (the caller
    never sees the int16 wire scales)."""

    def __init__(self, model: TfliteModel):
        if len(model.inputs) != 1 or len(model.outputs) != 1:
            raise ValueError("expected a single-input single-output graph")
        self.model = model
        self.consts: dict[int, np.ndarray] = {}
        for i, t in enumerate(model.tensors):
            if t.data is not None:
                self.consts[i] = _dequant(t)
        tin = model.tensors[model.inputs[0]]
        tout = model.tensors[model.outputs[0]]
        self.input_shape = tin.shape
        self.input_scale = float(tin.scale[0]) if tin.scale is not None else 1.0
        self.output_scale = float(tout.scale[0]) if tout.scale is not None else 1.0

    # -- the jittable forward -------------------------------------------------

    def run(self, x):
        """x: float array shaped like the graph input (dequantized units),
        optionally with a LARGER leading batch than the graph declares.
        Returns the float output (dequantized units).  Pure jnp — jit me.

        Batch support: the graphs we load declare batch 1 and every
        TRANSPOSE keeps axis 0 in place while every RESHAPE target keeps
        a leading 1; substituting the actual batch into those reshape
        targets batches the whole graph (asserted per-op below).
        """
        import jax.numpy as jnp
        from jax import lax

        batch = int(x.shape[0])
        env: dict[int, object] = {self.model.inputs[0]: x}

        def val(i):
            if i in env:
                return env[i]
            return self.consts[i]

        for op in self.model.ops:
            ins = op.inputs
            o = op.outputs[0]
            if op.name == "TRANSPOSE":
                perm = tuple(int(p) for p in np.asarray(val(ins[1])))
                if batch > 1 and perm[0] != 0:
                    raise NotImplementedError("batched transpose moves axis 0")
                env[o] = jnp.transpose(val(ins[0]), perm)
            elif op.name == "RESHAPE":
                if len(ins) > 1 and ins[1] >= 0:
                    shape = [int(s) for s in np.asarray(val(ins[1]))]
                else:
                    shape = list(op.options["new_shape"])
                if batch > 1:
                    if shape[0] != 1:
                        raise NotImplementedError("batched reshape folds axis 0")
                    shape[0] = batch
                env[o] = jnp.reshape(val(ins[0]), shape)
            elif op.name == "ADD":
                env[o] = val(ins[0]) + val(ins[1])
            elif op.name == "MUL":
                env[o] = val(ins[0]) * val(ins[1])
            elif op.name == "GELU":
                import jax

                env[o] = jax.nn.gelu(
                    val(ins[0]), approximate=bool(op.options.get("approximate"))
                )
            elif op.name == "CONV_2D":
                xa = val(ins[0])  # [N, H, W, Cin] (TFLite NHWC)
                w = jnp.asarray(val(ins[1]))  # [Cout, KH, KW, Cin] (OHWI)
                pad = "SAME" if op.options.get("padding", 0) == 0 else "VALID"
                out = lax.conv_general_dilated(
                    xa, w,
                    window_strides=(
                        op.options.get("stride_h", 1), op.options.get("stride_w", 1),
                    ),
                    padding=pad,
                    rhs_dilation=(
                        op.options.get("dilation_h", 1), op.options.get("dilation_w", 1),
                    ),
                    dimension_numbers=("NHWC", "OHWI", "NHWC"),
                )
                if len(ins) > 2 and ins[2] >= 0:
                    out = out + jnp.asarray(val(ins[2]))
                env[o] = _fused_act(out, op.options.get("fused_activation", 0))
            elif op.name == "TRANSPOSE_CONV":
                # inputs: output_shape, weights [Cout, KH, KW, Cin], x, (bias)
                w = jnp.asarray(val(ins[1]))
                xa = val(ins[2])
                pad = "SAME" if op.options.get("padding", 0) == 0 else "VALID"
                out = lax.conv_transpose(
                    xa, w,
                    strides=(
                        op.options.get("stride_h", 1), op.options.get("stride_w", 1),
                    ),
                    padding=pad,
                    dimension_numbers=("NHWC", "OHWI", "NHWC"),
                    transpose_kernel=True,
                )
                if len(ins) > 3 and ins[3] >= 0:
                    out = out + jnp.asarray(val(ins[3]))
                env[o] = _fused_act(out, op.options.get("fused_activation", 0))
            elif op.name == "FULLY_CONNECTED":
                xa = val(ins[0])
                w = jnp.asarray(val(ins[1]))  # [out, in]
                out = jnp.matmul(xa, w.T)
                if len(ins) > 2 and ins[2] >= 0:
                    out = out + jnp.asarray(val(ins[2]))
                env[o] = _fused_act(out, op.options.get("fused_activation", 0))
            else:
                raise NotImplementedError(f"tflite op {op.name}")
        return env[self.model.outputs[0]]


def _fused_act(x, code: int):
    import jax.numpy as jnp

    if code == 0:
        return x
    if code == 1:  # RELU
        return jnp.maximum(x, 0)
    if code == 3:  # RELU6
        return jnp.clip(x, 0, 6)
    raise NotImplementedError(f"fused activation {code}")
