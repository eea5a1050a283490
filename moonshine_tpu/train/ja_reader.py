"""Train the Japanese kanji-reading neural tier from in-tree data.

The reference reads kanji with an ONNX LUW tokenizer-POS model plus a
CDN dictionary (reference: core/moonshine-tts/src/lang-specific/
japanese-tok-pos-onnx.h, japanese-onnx-g2p.cpp) — neither artifact is
available in this zero-egress environment.  What IS in-tree is the
reference's own 100-line wiki corpus with full-pipeline IPA goldens;
kana-anchored alignment over it (tts/ja_align.py) yields
(surface, reading) pairs.

This module distills those pairs — kanji/okurigana spans AND the
deterministic kana spans — into the small char->IPA transformer
(tts/g2p_transformer.py) with a kana+kanji input alphabet.  The result
is the lexicon's neural backstop: unseen kanji compounds get a composed
reading instead of being dropped, which is exactly what the reference's
neural helper does for its dictionary misses.

Honest-split protocol: train on lines 1..N (default 80), score on the
held-out remainder with eval/g2p_reference_agreement.py.

Usage:
    python -m moonshine_tpu.train.ja_reader --out ja_reader.safetensors
"""

from __future__ import annotations

import argparse
from collections import Counter

import jax
import numpy as np
import optax

from ..tts import ja_align
from ..tts.g2p_transformer import (
    G2PModelConfig,
    G2PTransformer,
    init_params,
)
from .g2p import make_train_step

DEFAULT_CFG = G2PModelConfig(dim=128, layers=2, heads=4, max_word=10, max_ipa=32)


def build_ja_dataset(train_lines: int = 80):
    """-> (pairs [(surface, ipa)], readings dict) from the first
    *train_lines* corpus lines only (the held-out tail never leaks).

    Pairs mix the EM-harvested kanji/okurigana readings with the
    corpus's kana runs (whose kana-table IPA is exact supervision) so
    the model learns both the kanji readings and the deterministic kana
    map it must not disturb in mixed spans.
    """
    corpus = ja_align.load_corpus()[:train_lines]
    readings, _ = ja_align.em_harvest(corpus)
    pairs: Counter = Counter()
    for span, ipa in readings.items():
        if len(span) < DEFAULT_CFG.max_word - 1 and len(ipa) < DEFAULT_CFG.max_ipa - 1:
            pairs[(span, ipa)] += 3  # weight real kanji pairs up
    for (span, ipa), n in ja_align.kana_spans(corpus).items():
        if len(span) < DEFAULT_CFG.max_word - 1 and len(ipa) < DEFAULT_CFG.max_ipa - 1:
            pairs[(span, ipa)] += 1
    return list(pairs.elements()), readings


def train_ja_reader(
    train_lines: int = 80,
    cfg: G2PModelConfig = DEFAULT_CFG,
    steps: int = 1200,
    batch_size: int = 128,
    seed: int = 0,
    log_every: int = 0,
) -> G2PTransformer:
    """Train and return the reading model (deterministic given args)."""
    data, _ = build_ja_dataset(train_lines)
    surfaces = [s for s, _ in data]
    ipas = [p for _, p in data]
    in_vocab = G2PTransformer.build_in_vocab(surfaces)
    out_vocab = G2PTransformer.build_out_vocab(ipas)
    model = G2PTransformer(
        cfg,
        init_params(cfg, jax.random.PRNGKey(seed), len(out_vocab), len(in_vocab) + 4),
        out_vocab,
        in_vocab,
    )
    src = np.stack([model.encode_src(s) for s in surfaces])
    tgt = np.stack([model.encode_ipa(p) for p in ipas])

    tx = optax.adamw(optax.warmup_cosine_decay_schedule(0.0, 3e-3, 100, steps))
    step = make_train_step(tx)
    params = model.params
    opt_state = tx.init(params)
    rng = np.random.RandomState(seed)
    n = len(src)
    for i in range(steps):
        idx = rng.randint(0, n, size=min(batch_size, n))
        params, opt_state, loss = step(params, opt_state, (src[idx], tgt[idx]), cfg)
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i+1}/{steps} loss {float(loss):.4f}", flush=True)
    model.params = params
    return model


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--train-lines", type=int, default=80)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--out", default="ja_reader.safetensors")
    args = ap.parse_args(argv)
    model = train_ja_reader(args.train_lines, steps=args.steps, log_every=200)
    # training-fit diagnostic
    data, readings = build_ja_dataset(args.train_lines)
    uniq = sorted(set(data))
    preds = model.predict_batch([s for s, _ in uniq])
    acc = sum(p == ipa for p, (_, ipa) in zip(preds, uniq)) / len(uniq)
    print(f"fit exact-match on {len(uniq)} training spans: {acc:.2%}")
    model.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
