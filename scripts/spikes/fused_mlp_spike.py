"""Fused MLP (fc1 → gelu → fc2) Pallas kernel for the encoder.

The XLA path materializes the [B·T, ffn] intermediate to HBM between
the two GEMMs (655 MB at Base bench shapes — a ~1.6 ms round trip per
layer) and runs the erf gelu as a separate fusion.  This kernel blocks
over rows of the flattened [B·T, D] activations and keeps the
intermediate in VMEM: x-block → fc1 GEMM → erf gelu (fp32) → fc2 GEMM →
out-block, with both weight matrices resident across grid steps.

Exactness: identical contraction order per output element; gelu
computed in fp32 exactly like models.layers.gelu.  Output matches the
XLA path within bf16 accumulation noise (pinned in
tests/test_fused_mlp.py).

Reference analog: the reference's ORT runtime fuses the MLP epilogues
the same way on CPU (MatMul+FastGelu fusion); this is the TPU-native
equivalent (reference: core/transformer layers in the .ort graphs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(z: jnp.ndarray) -> jnp.ndarray:
    """fp32 erf via Abramowitz–Stegun 7.1.26 (|err| < 1.5e-7 — an order
    below bf16 resolution, so gelu output rounds identically to the
    exact-erf XLA path for practical inputs).  Needed because Mosaic has
    no erf/erfc lowering inside kernels."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + p * za)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-za * za))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]                     # [R, D] bf16
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = h * 0.5 * (1.0 + _erf(h * (2.0 ** -0.5)))  # exact-form gelu, fp32
    h = h.astype(x.dtype)
    o = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("rows", "interpret"))
def fused_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray, rows: int = 512,
              interpret: bool = False) -> jnp.ndarray:
    """[..., D] @ w1[D,F] -> gelu -> @ w2[F,D], VMEM-resident intermediate.

    Leading dims flatten to rows; ``rows`` is the per-grid-step row
    block (the flattened row count must divide by it — encoder shapes
    B·T always do for rows=512 after 128-frame bucketing; callers fall
    back to the XLA path otherwise).
    """
    orig_shape = x.shape
    d = x.shape[-1]
    f = w1.shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    if n % rows:
        raise ValueError(f"rows {n} not divisible by block {rows}")
    grid = (n // rows,)
    out = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * d * f,
            bytes_accessed=2 * n * d * x.dtype.itemsize
            + 2 * d * f * w1.dtype.itemsize,
            transcendentals=n * f,
        ),
        interpret=interpret,
    )(xf, w1, b1, w2, b2)
    return out.reshape(orig_shape)
