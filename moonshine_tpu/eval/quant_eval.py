"""Quantization accuracy harness: fp32 vs bf16 vs int8 round trip.

Mirror of the reference's quantization protocol (reference:
scripts/quantize-streaming-model.sh + README.md:1262-1266 — LibriSpeech
WER measured on the shipped per-channel int8 .ort files): quantize the
weights, run the SAME decode pipeline, compare outputs.

With real checkpoints the comparison is corpus WER (eval/librispeech.py
accepts any params); in this zero-egress environment the harness runs on
random weights and reports token-level agreement + model-size table —
the mechanics the real-WER run reuses unchanged.
"""

from __future__ import annotations

import json

import numpy as np


def compare_decodes(
    arch: str = "tiny",
    n_clips: int = 8,
    seconds: float = 4.0,
    per_channel: bool = True,
    seed: int = 0,
    w8a8: bool = False,
) -> dict:
    """``w8a8=True`` additionally decodes with the TRUE deployed int8
    execution (quant.quantize_tree_exec: dynamic int8 activations × int8
    weights on the MXU — the reference's MatMulInteger arithmetic), not
    just the fake-quant float simulation of the weights."""
    import jax
    import jax.numpy as jnp

    from ..core.config import ARCHS
    from ..decoding.greedy import greedy_decode
    from ..models import moonshine as mm
    from ..quant import (
        fake_quantize_tree,
        quantize_tree,
        quantize_tree_exec,
        tree_nbytes,
    )

    cfg = ARCHS[arch]
    params = mm.init_params(cfg, jax.random.PRNGKey(seed))
    params_q = fake_quantize_tree(params, per_channel=per_channel)

    rng = np.random.RandomState(seed)
    audio = jnp.asarray(rng.randn(n_clips, int(16000 * seconds)).astype(np.float32) * 0.1)
    max_tokens = int(seconds * cfg.max_tokens_per_second)

    def decode(p):
        memory, mask = jax.jit(lambda pp, a: mm.encode(pp, cfg, a))(p, audio)
        res = greedy_decode(p, cfg, memory, mask, max_tokens=max_tokens)
        return np.asarray(res.tokens), np.asarray(res.lengths)

    def agreement(a, la, b, lb):
        exact = float(np.mean([
            np.array_equal(a[i, : la[i]], b[i, : lb[i]]) for i in range(n_clips)
        ]))
        return exact, float((a == b).mean())

    t_f, l_f = decode(params)
    t_q, l_q = decode(params_q)
    agree, tok_agree = agreement(t_f, l_f, t_q, l_q)
    packed = quantize_tree(params)
    out = {
        "arch": arch,
        "per_channel": per_channel,
        "clips": n_clips,
        "exact_sequence_agreement": agree,
        "token_agreement": tok_agree,
        "fp32_bytes": tree_nbytes(params),
        "int8_bytes": tree_nbytes(packed),
        "size_ratio": round(tree_nbytes(packed) / tree_nbytes(params), 3),
    }
    if w8a8:
        t_x, l_x = decode(quantize_tree_exec(params))
        exact_x, tok_x = agreement(t_f, l_f, t_x, l_x)
        out["w8a8_exact_sequence_agreement"] = exact_x
        out["w8a8_token_agreement"] = tok_x
    return out


def main() -> None:  # pragma: no cover - CLI
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="tiny")
    p.add_argument("--per-tensor", action="store_true")
    p.add_argument("--w8a8", action="store_true",
                   help="also decode with true int8 execution (MXU path)")
    args = p.parse_args()
    print(json.dumps(compare_decodes(
        args.arch, per_channel=not args.per_tensor, w8a8=args.w8a8)))


if __name__ == "__main__":  # pragma: no cover
    main()
