"""Spike: offline frontend phase split at B=512 (bench shapes).

The frontend is ~53 ms of the ~250 ms encode (docs/PERF.md); accounted
pieces (stage-1 GEMM 9.3, group-norm 6.1, conv2 ~10, conv3 ~2) leave
~20 ms unexplained.  Times each stage cumulatively (prefixes of the real
frontend_apply pipeline) so differences give per-stage cost in-graph.

Run on the chip: python scripts/spike_frontend_split.py
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
from moonshine_tpu.models.layers import ACTIVATIONS, conv1d, group_norm_all

B = 512
N = 16000 * 9 + 4160  # lane-aligned 9.26 s (T=384)
CFG = BASE


def bench(fn, args, iters=8):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / iters


def make_prefix(p, upto: str):
    cfg = CFG
    s1, s2, s3 = cfg.conv_strides
    k1 = cfg.conv_kernels[0]

    @jax.jit
    def run(audio, lengths):
        n_frames1 = (audio.shape[-1] - k1) // s1 + 1
        w1 = p["conv1"]["w"]
        pad = (-audio.shape[-1]) % s1 + s1
        a = jnp.pad(audio.astype(w1.dtype), ((0, 0), (0, pad)))
        blocks = a.reshape(a.shape[0], -1, s1)
        pairs = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=-1)
        windows = pairs[:, :n_frames1]
        w1_full = jnp.concatenate(
            [w1[:, 0, :], jnp.zeros((2 * s1 - k1, w1.shape[-1]), w1.dtype)], axis=0)
        h = jnp.tanh(jnp.dot(windows, w1_full, preferred_element_type=jnp.float32)).astype(w1.dtype)
        if "b" in p["conv1"]:
            h = h + p["conv1"]["b"].astype(h.dtype)
        if upto == "stage1":
            return h
        l1 = jnp.maximum((lengths - k1) // s1 + 1, 0)
        m1 = jnp.arange(h.shape[1])[None, :] < l1[:, None]
        h = group_norm_all(p["gn"], h, m1)
        if upto == "gn":
            return h
        h = conv1d(p["conv2"], h, s2)
        if upto == "conv2":
            return h
        h = ACTIVATIONS["gelu"](h)
        if upto == "gelu2":
            return h
        h = ACTIVATIONS["gelu"](conv1d(p["conv3"], h, s3))
        return h

    return run


def main():
    params = mm.init_params(CFG, jax.random.PRNGKey(0))
    fe = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["frontend"])
    audio = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, N), jnp.float32) * 0.1)
    lengths = jax.device_put(jnp.full((B,), N, jnp.int32))

    prev = 0.0
    for stage in ["stage1", "gn", "conv2", "gelu2", "all"]:
        t = bench(make_prefix(fe, stage), (audio, lengths))
        print(f"{stage:8s} cum {t*1000:7.2f} ms   (+{(t-prev)*1000:6.2f})", flush=True)
        prev = t

    # reference: the real frontend_apply
    @jax.jit
    def real(audio, lengths):
        return mm.frontend_apply(fe, CFG, audio, lengths)[0]

    t = bench(real, (audio, lengths))
    print(f"frontend_apply total {t*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
