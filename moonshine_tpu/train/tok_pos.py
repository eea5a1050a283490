"""Train the zh/ja tokenizer-POS tagger on the reference's own corpora.

Mirrors VERDICT r2 task 5: the reference's zh/ja text frontends run ONNX
tokenizer-POS helpers (chinese-tok-pos-onnx.h, japanese-tok-pos-onnx.h)
whose CDN weights are absent here; its shipped test corpora
(tests/data/{zh_hans,ja}/tok_pos_wiki*.txt) carry per-word UPOS
annotations from those very models — exact supervision for a distilled
in-repo tier.

Honest-split protocol: train on the first 80% of lines, report
word-boundary F1 / word+POS F1 on the held-out 20%.

Usage:
    python -m moonshine_tpu.train.tok_pos --lang zh
    python -m moonshine_tpu.train.tok_pos --lang ja
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import numpy as np
import optax

from ..tts.tok_pos import TokPosConfig, TokPosTagger, forward, init_params, PAD

# override with MOONSHINE_REFERENCE_ROOT for other host layouts
# (ADVICE r3: the default matches this environment's mount point)
REF_DATA = Path(os.environ.get(
    "MOONSHINE_REFERENCE_ROOT",
    "/root/reference")) / "core" / "moonshine-tts" / "tests" / "data"
CORPORA = {
    "zh": REF_DATA / "zh_hans" / "tok_pos_wiki_filtered.txt",
    "ja": REF_DATA / "ja" / "tok_pos_wiki_100.txt",
}


def load_corpus(lang: str):
    """-> [(source_text, [(surface, upos), ...])]"""
    rows = []
    for line in CORPORA[lang].read_text(encoding="utf-8").splitlines():
        toks = []
        for t in line.split(" "):
            if not t:
                continue
            surf, _, tag = t.rpartition("/")
            if surf:
                toks.append((surf, tag))
        if toks:
            rows.append(("".join(s for s, _ in toks), toks))
    return rows


def make_labels(rows, cfg: TokPosConfig, tagger: TokPosTagger):
    """-> (src [N, L], bio [N, L], pos [N, L], mask [N, L])"""
    tag_id = {t: i for i, t in enumerate(tagger.tags)}
    src = np.stack([tagger.encode(text) for text, _ in rows])
    bio = np.zeros_like(src)
    pos = np.zeros_like(src)
    mask = np.zeros(src.shape, np.float32)
    for r, (text, toks) in enumerate(rows):
        i = 0
        for surf, tag in toks:
            for j, _ in enumerate(surf):
                if i >= cfg.max_len:
                    break
                bio[r, i] = 1 if j == 0 else 0
                pos[r, i] = tag_id.get(tag, 0)
                mask[r, i] = 1.0
                i += 1
    return src, bio, pos, mask


def _loss(params, cfg, batch):
    src, bio, pos, mask = batch
    lb, lp = forward(params, cfg, src)
    ce_b = optax.softmax_cross_entropy_with_integer_labels(lb, bio)
    ce_p = optax.softmax_cross_entropy_with_integer_labels(lp, pos)
    import jax.numpy as jnp

    return (((ce_b + ce_p) * mask).sum()) / jnp.maximum(mask.sum(), 1.0)


def train_tok_pos(lang: str, cfg: TokPosConfig = TokPosConfig(),
                  train_frac: float = 0.8, steps: int = 800,
                  batch_size: int = 16, seed: int = 0, log_every: int = 0):
    """-> (tagger trained on the first train_frac lines, train_rows, held_rows)"""
    rows = load_corpus(lang)
    n_train = int(len(rows) * train_frac)
    train_rows, held_rows = rows[:n_train], rows[n_train:]
    chars = sorted({c for text, _ in train_rows for c in text})
    tags = sorted({t for _, toks in train_rows for _, t in toks})
    params = init_params(cfg, jax.random.PRNGKey(seed), len(chars) + 2, len(tags))
    tagger = TokPosTagger(cfg, params, chars, tags)
    src, bio, pos, mask = make_labels(train_rows, cfg, tagger)

    tx = optax.adamw(optax.warmup_cosine_decay_schedule(0.0, 2e-3, 80, steps))
    opt_state = tx.init(params)

    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def step(params, opt_state, cfg, batch):
        loss, grads = jax.value_and_grad(_loss)(params, cfg, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    n = len(src)
    for i in range(steps):
        idx = rng.randint(0, n, size=min(batch_size, n))
        params, opt_state, loss = step(
            params, opt_state, cfg,
            (jnp.asarray(src[idx]), jnp.asarray(bio[idx]),
             jnp.asarray(pos[idx]), jnp.asarray(mask[idx])))
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i+1}/{steps} loss {float(loss):.4f}", flush=True)
    tagger.params = params
    return tagger, train_rows, held_rows


def word_f1(tagger: TokPosTagger, rows, with_pos: bool = False):
    """Word-span F1 vs the annotated tokens (span = (start, end[, tag]))."""
    tp = fp = fn = 0
    for text, toks in rows:
        gold = set()
        i = 0
        for surf, tag in toks:
            span = (i, i + len(surf), tag) if with_pos else (i, i + len(surf))
            if i + len(surf) <= tagger.cfg.max_len:
                gold.add(span)
            i += len(surf)
        pred = set()
        i = 0
        for surf, tag in tagger.annotate(text):
            span = (i, i + len(surf), tag) if with_pos else (i, i + len(surf))
            pred.add(span)
            i += len(surf)
        tp += len(gold & pred)
        fp += len(pred - gold)
        fn += len(gold - pred)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return 2 * prec * rec / max(prec + rec, 1e-9)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--lang", choices=("zh", "ja"), default="zh")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    tagger, train_rows, held_rows = train_tok_pos(
        args.lang, steps=args.steps, log_every=100)
    f1_train = word_f1(tagger, train_rows)
    f1_seg = word_f1(tagger, held_rows)
    f1_pos = word_f1(tagger, held_rows, with_pos=True)
    print(f"{args.lang}: train-fit seg F1 {f1_train:.3f} | "
          f"held-out seg F1 {f1_seg:.3f} | held-out seg+UPOS F1 {f1_pos:.3f}")
    if args.out:
        tagger.save(args.out)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
