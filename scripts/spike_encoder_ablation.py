"""Spike: where do the encoder's non-GEMM milliseconds go at B=512?

docs/PERF.md (achievable-rate refinement) sums the Base encoder layer's
parts to ~20 ms at B=512×10 s shapes, yet the layer measures ~30.8 ms.
This ablation removes one component at a time from an otherwise-identical
scanned 8-layer encoder (same discipline as the decode-step ablation):
every variant keeps the residual chain so nothing dead-codes, and timing
is amortized over host-chained iterations so the ~20 ms axon dispatch
floor divides out.

Run on the chip: python scripts/spike_encoder_ablation.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from moonshine_tpu.core.config import BASE
from moonshine_tpu.models import moonshine as mm
from moonshine_tpu.models.layers import layer_norm, dense, ACTIVATIONS
from moonshine_tpu.ops.rotary import rotary_tables, apply_rotary

B, T = 512, 415
CFG = BASE


def bench(fn, x, iters=8):
    out = fn(x)
    np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    np.asarray(out[0, 0, 0])
    return (time.perf_counter() - t0) / iters


def make_encoder(p, variant: str, attn_impl: str = "pallas"):
    cfg = CFG
    positions = jnp.arange(T)
    cos, sin = rotary_tables(positions, cfg.rotary_dim, cfg.rope_theta)
    eps = cfg.layer_norm_eps

    from moonshine_tpu.ops.rotary import (
        apply_rotary_fullwidth, pair_swap_perm, swap_dense_params,
    )
    hd = cfg.head_dim
    half = cos.shape[-1]

    def layer(h, lp):
        x = h if variant == "no_ln" else layer_norm(lp["ln1"], h, eps)
        a = lp["attn"]
        if variant == "no_rotary":
            q = mm._split_heads(dense(a["q"], x), cfg.encoder_heads)
            k = mm._split_heads(dense(a["k"], x), cfg.encoder_kv_heads)
        else:
            qf = dense(a["q"], x)
            kf = dense(a["k"], x)
            qsf = dense(swap_dense_params(a["q"], pair_swap_perm(hd, half, cfg.encoder_heads)), x)
            ksf = dense(swap_dense_params(a["k"], pair_swap_perm(hd, half, cfg.encoder_kv_heads)), x)
            q = mm._split_heads(apply_rotary_fullwidth(qf, qsf, cos, sin, hd, cfg.encoder_heads), cfg.encoder_heads)
            k = mm._split_heads(apply_rotary_fullwidth(kf, ksf, cos, sin, hd, cfg.encoder_kv_heads), cfg.encoder_kv_heads)
        v = mm._split_heads(dense(a["v"], x), cfg.encoder_kv_heads)
        if variant == "no_attn":
            o = q + k + v  # keep deps, skip the attention math
        elif attn_impl == "pallas":
            from moonshine_tpu.ops.encoder_attention import encoder_attention

            o = encoder_attention(q, k, v, None)
        else:
            o = mm._attention(q, k, v, None)
        h = h + dense(a["o"], o.reshape(o.shape[0], o.shape[1], -1))
        if variant != "no_mlp":
            x = h if variant == "no_ln" else layer_norm(lp["ln2"], h, eps)
            act = ACTIVATIONS[cfg.encoder_hidden_act]
            h = h + dense(lp["mlp"]["fc2"], act(dense(lp["mlp"]["fc1"], x)))
        return h, None

    @jax.jit
    def run(feats):
        h, _ = jax.lax.scan(layer, feats, p["layers"])
        return layer_norm(p["norm"], h, eps)

    return run


def main():
    rng = jax.random.PRNGKey(0)
    params = mm.init_params(CFG, rng)
    enc = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["encoder"])
    feats = jax.device_put(
        jax.random.normal(rng, (B, T, CFG.hidden_size), jnp.bfloat16)
    )

    results = {}
    for variant in ["full", "no_rotary", "no_ln", "no_attn", "no_mlp"]:
        t = bench(make_encoder(enc, variant), feats)
        results[variant] = t
        print(f"{variant:12s} {t*1000:8.1f} ms  ({t*1000/CFG.encoder_layers:.2f} ms/layer)", flush=True)
    t = bench(make_encoder(enc, "full", attn_impl="xla"), feats)
    results["full_xla"] = t
    print(f"{'full_xla':12s} {t*1000:8.1f} ms  ({t*1000/CFG.encoder_layers:.2f} ms/layer)", flush=True)

    full = results["full"]
    for k in ["no_rotary", "no_ln", "no_attn", "no_mlp"]:
        print(f"  {k[3:]:8s} costs {1000*(full-results[k]):6.1f} ms "
              f"({(full-results[k])/CFG.encoder_layers*1000:.2f} ms/layer)")


if __name__ == "__main__":
    main()
