"""Domain-customization finetuning: (wav, text) pairs → adapted weights.

The reference offers domain customization only as a commercial
retraining service (reference: README.md:1256-1258 "Domain
Customization" — "we do hope to support free lighter-weight approaches
in the future").  On TPU the lighter-weight approach is just the
training stack this repo already has: teacher-forced ASR loss
(train/step.py), pjit-shardable over a device mesh, reading the same
LibriSpeech-style layouts the eval harness reads.

    python -m moonshine_tpu.train.finetune \
        --data /path/to/wav+txt --model tiny --steps 200 \
        --init hf_checkpoint_dir --out adapted.safetensors

Data layout: LibriSpeech (``*.trans.txt`` + flac/wav) or flat
``name.wav`` + ``name.txt`` pairs — anything ``eval.librispeech.
iter_librispeech`` accepts.  Batches are lane-aligned-bucketed like the
eval path (docs/PERF.md).  The adapted params drop into
``Transcriber(...).with_params(...)`` or export to safetensors.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

from ..core.tokenizer import BinTokenizer


def jnp_copy(x):
    import jax.numpy as jnp

    return jnp.array(x)


@dataclass
class FinetuneResult:
    params: object
    losses: list[float]
    steps: int
    examples: int


def _batches(cfg, examples, tokenizer, batch_size: int):
    """Yield train Batches, lane-aligned-bucketed by audio length."""
    import jax.numpy as jnp

    from ..eval.librispeech import _buckets
    from ..train.step import Batch

    utts = [((text,), audio) for audio, text in examples]
    for n, items in _buckets(cfg, utts, batch_size):
        b = len(items)
        toks = [tokenizer.text_to_tokens(u[0]) for u, _ in items]
        s_max = max(len(t) for t in toks) + 1
        audio = np.zeros((b, n), np.float32)
        lengths = np.zeros((b,), np.int32)
        for i, (_, a) in enumerate(items):
            k = min(len(a), n)
            audio[i, :k] = a[:k]
            lengths[i] = k
        yield Batch(
            audio=jnp.asarray(audio),
            audio_lengths=jnp.asarray(lengths),
            tokens_in=jnp.asarray(np.stack([
                np.pad([cfg.decoder_start_token_id] + list(t),
                       (0, s_max - len(t) - 1)) for t in toks
            ]), jnp.int32),
            tokens_out=jnp.asarray(np.stack([
                np.pad(list(t) + [cfg.eos_token_id], (0, s_max - len(t) - 1))
                for t in toks
            ]), jnp.int32),
            token_mask=jnp.asarray(np.stack([
                np.arange(s_max) <= len(t) for t in toks
            ])),
        )


def finetune(
    cfg,
    tokenizer: BinTokenizer,
    examples,  # iterable of (audio float32 @16k, text)
    init_params=None,  # adapt these (e.g. an imported HF checkpoint);
    # None = train from random init (the overfit-test mode)
    steps: int = 200,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    mesh=None,  # jax.sharding.Mesh for multi-chip pjit finetuning
    seed: int = 0,
    log_every: int = 25,
) -> FinetuneResult:
    import jax
    import optax

    from ..train import step as ts

    examples = list(examples)
    if not examples:
        raise ValueError("no training examples")
    opt = optax.adamw(learning_rate)
    state = ts.init_train_state(cfg, opt, jax.random.PRNGKey(seed))
    if init_params is not None:
        # Copy: the train step donates its state buffers; adapting must
        # not delete the caller's arrays out from under them.
        init_params = jax.tree_util.tree_map(jnp_copy, init_params)
        state = state._replace(params=init_params,
                               opt_state=opt.init(init_params))
    if mesh is not None:
        state = ts.shard_train_state(mesh, state)
    train_step = ts.make_train_step(cfg, opt, mesh)

    batches = list(_batches(cfg, examples, tokenizer, batch_size))
    losses: list[float] = []
    i = 0
    while i < steps:
        for batch in batches:
            if mesh is not None:
                from ..parallel.sharding import shard_batch

                batch = shard_batch(mesh, batch)
            state, metrics = train_step(state, batch)
            i += 1
            if i % log_every == 0 or i >= steps:
                losses.append(float(metrics["loss"]))
            if i >= steps:
                break
    return FinetuneResult(
        params=state.params, losses=losses, steps=i, examples=len(examples)
    )


def main() -> None:  # pragma: no cover - CLI
    import argparse

    import jax

    from ..core.config import ARCHS
    from ..eval.librispeech import iter_librispeech
    from ..train.checkpoint import export_safetensors

    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="LibriSpeech-style dir")
    p.add_argument("--model", default="tiny")
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--init", default=None,
                   help="HF checkpoint dir to adapt (default: random init)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", default="adapted.safetensors")
    args = p.parse_args()

    cfg = ARCHS[args.model]
    tok = BinTokenizer.from_file(args.tokenizer)
    init = None
    if args.init:
        from ..weights import import_hf_moonshine

        init = import_hf_moonshine(args.init, cfg)
    examples = (
        (u.load_audio(), u.text)
        for u in iter_librispeech(args.data, limit=args.limit)
    )
    res = finetune(cfg, tok, examples, init_params=init, steps=args.steps,
                   batch_size=args.batch_size, learning_rate=args.lr)
    export_safetensors(args.out, res.params)
    print(json.dumps({
        "steps": res.steps, "examples": res.examples,
        "final_loss": res.losses[-1] if res.losses else None,
        "out": args.out,
    }))


if __name__ == "__main__":  # pragma: no cover
    main()
