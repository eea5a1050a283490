import sys, time
from functools import partial
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, HD = 512, 384, 8, 52
D = H * HD
NEG_INF = -1e30

def make_kernel(mode):
    def kernel(q_ref, kt_ref, v_ref, mask_ref, o_ref):
        mask = mask_ref[0]
        scale = float(HD) ** -0.5
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            q = q_ref[0][:, sl]; kt = kt_ref[0][sl, :]
            logits = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if mode == "qk_only":
                o_ref[0, :, sl] = logits[:, :HD].astype(o_ref.dtype)
                continue
            if mode != "no_softmax":
                logits = jnp.where(mask != 0, logits, NEG_INF)
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
                w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            else:
                w = logits.astype(jnp.bfloat16)
            v = v_ref[0][:, sl]
            o_ref[0, :, sl] = jnp.dot(w, v,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
    return kernel

def run(mode, q, kt, v, mask):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, D, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask_blk = pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        grid=(B,), in_specs=[blk, ktblk, blk, mask_blk], out_specs=blk,
        cost_estimate=pl.CostEstimate(flops=2*2*B*H*T*T*HD,
            bytes_accessed=4*B*T*D*2, transcendentals=B*H*T*T),
    )(q, kt, v, mask)

rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (B, T, D), jnp.bfloat16)
kt = jax.random.normal(jax.random.PRNGKey(1), (B, D, T), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), jnp.bfloat16)
mask = jnp.ones((B, 1, T), jnp.int32)
for mode in ("full", "no_softmax", "qk_only"):
    fn = jax.jit(partial(run, mode))
    out = fn(q, kt, v, mask); np.asarray(out[0,0,0])
    t0 = time.perf_counter()
    for _ in range(8): out = fn(q, kt, v, mask)
    np.asarray(out[0,0,0])
    print(f"{mode:10} {(time.perf_counter()-t0)/8*1000:7.2f} ms")
