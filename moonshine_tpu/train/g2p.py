"""G2P transformer training: distill a lexicon+rules engine into the
neural OOV helper.

The reference ships neural G2P helper models as ONNX artifacts trained
offline (reference: core/moonshine-tts/src/lang-specific/
g2p-transformer-model.{h,cpp}; scripts export them from published
checkpoints).  With zero egress, the in-repo equivalent trains the
char->IPA transformer (tts/g2p_transformer.py) against the language's
own lexicon+rules engine: lexicon entries provide the irregular forms,
and the rules engine labels any extra word list, so the network learns
both and generalizes to unseen words the way the reference's helper
does.  ``python -m moonshine_tpu.train.g2p --language en --out en_oov.safetensors``

Word sources: the engine's lexicon keys, plus ``--wordlist`` files, plus
a built-in set of common English forms exercising the rule engine.
"""

from __future__ import annotations

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..tts.g2p import _make_engine
from ..tts.g2p_transformer import (
    G2PModelConfig,
    G2PTransformer,
    encode_word,
    decoder_logits,
    encode,
    init_params,
    PAD,
)

# A compact generalization set: regular forms that exercise the English
# rule engine's pattern families (digraphs, vowel teams, magic-e, soft
# c/g, r-colored vowels).  Targets come from the engine, so this list is
# training *input* coverage, not pronunciation data.
_EN_RULE_WORDS = """
cat dog fish bird tree stone plate grape smile flute cube theme
chat chip shop ship thin thick that bath path moth cloth
rain paint play stay see keep team beach food moon book look cook
house mouse cloud shout now cow show snow boat coat road soap
coin join toy enjoy law saw cause autumn
car card start far for north corn her term first burn turn hurt
face race city cycle ice mice page gem giant magic
make take time line home bone tune mute note gate kite
back deck kick lock duck sock quick queen quiet
king ring song long bring think thank bank
jump just land hand stand plant print strong
batch catch match pitch watch fetch
knife knee knock wrote wrap wrist
dodge badge bridge judge fudge
nation station motion action section vision mission
nature picture future capture
able table little middle simple puzzle
happy funny silly berry carry penny
farmer winter summer corner number under
sister brother mister doctor actor mirror
window yellow pillow borrow narrow
train brain chain plain spain drain
sleep sweep green three wheel steel
dream clean speak treat cream steam
light fight sight tight bright flight
found round ground sound count mount
point voice noise choice avoid
burst church hurry purple turtle
"""


def build_dataset(
    language: str,
    extra_words=(),
    use_baked_dict: bool = True,
    exclude: frozenset[str] | set[str] = frozenset(),
):
    """-> (engine, [(word, ipa)]).

    Labels, in priority order: REAL pronunciations from the shipped
    10,855-word baked dictionary (tts/g2p_dict.py; English only — the
    reference's helpers train on CMUdict the same way), then the engine's
    lexicon+rules outputs for everything else.  With the dictionary
    present the English model trains mostly on real data rather than
    pure self-distillation.
    """
    engine = _make_engine(language)
    words = set(engine.lexicon)
    # English's dict-first engine keeps its irregulars in the baked
    # dictionary rather than a hand lexicon; seed from there.
    words.update(getattr(engine, "baked_dict", {}))
    real: dict[str, str] = {}
    if language.split("_")[0] == "en":
        words.update(_EN_RULE_WORDS.split())
        if use_baked_dict:
            from ..tts.g2p_dict import load_baked_dict

            real = load_baked_dict()
            if hasattr(engine, "baked_dict"):
                engine.baked_dict = real
    words.update(extra_words)
    pairs = []
    for w in sorted((words | set(real)) - set(exclude)):
        ipa = real.get(w) or engine.word_to_ipa(w)
        if ipa:
            pairs.append((w, ipa))
    return engine, pairs


def _loss_fn(params, cfg, src, tgt_in, tgt_out, mask):
    memory, mem_valid = encode(params, cfg, src)
    logits = decoder_logits(params, cfg, memory, mem_valid, tgt_in)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, tgt_out)
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)


# jit can't take the optax transform as a traced arg; bind it statically.
def make_train_step(tx):
    @partial(jax.jit, static_argnums=(3,))
    def step(params, opt_state, batch, cfg):
        src, tgt = batch
        tgt_in = tgt[:, :-1]
        tgt_out = tgt[:, 1:]
        mask = (tgt_out != PAD).astype(jnp.float32)
        loss, grads = jax.value_and_grad(_loss_fn)(
            params, cfg, src, tgt_in, tgt_out, mask
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def distill(
    language: str = "en",
    cfg: G2PModelConfig | None = None,
    steps: int = 2000,
    batch_size: int = 64,
    lr: float = 3e-3,
    seed: int = 0,
    extra_words=(),
    log_every: int = 0,
    limit: int | None = None,
    exclude: frozenset[str] | set[str] = frozenset(),
) -> tuple[G2PTransformer, float]:
    """Train the OOV model on the engine's outputs.

    Returns (model, exact-match accuracy over the training pairs) — the
    accuracy is the distillation fidelity, the number the reference's
    helper models report as "agreement with the dictionary".
    """
    cfg = cfg or G2PModelConfig()
    engine, pairs = build_dataset(language, extra_words, exclude=exclude)
    if limit is not None:
        pairs = pairs[:limit]
    vocab = G2PTransformer.build_out_vocab(ipa for _, ipa in pairs)
    model = G2PTransformer(cfg, init_params(cfg, jax.random.PRNGKey(seed), len(vocab)), vocab)

    src = np.stack([encode_word(w, cfg.max_word) for w, _ in pairs])
    tgt = np.stack([model.encode_ipa(ipa) for _, ipa in pairs])

    # Warmup + cosine decay: the late-training LR drop is what converts
    # "mostly right" into exact-match on the long irregular tail.
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, max(steps // 20, 1), steps)
    tx = optax.adamw(sched)
    opt_state = tx.init(model.params)
    step = make_train_step(tx)
    rng = np.random.default_rng(seed)
    params = model.params
    n = len(pairs)
    for i in range(steps):
        idx = rng.integers(0, n, size=min(batch_size, n))
        batch = (jnp.asarray(src[idx]), jnp.asarray(tgt[idx]))
        params, opt_state, loss = step(params, opt_state, batch, cfg)
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}/{steps} loss {float(loss):.4f}")
    model.params = params

    preds = []
    for i in range(0, n, 256):
        preds.extend(model.predict_batch([w for w, _ in pairs[i : i + 256]]))
    acc = float(np.mean([p == ipa for p, (_, ipa) in zip(preds, pairs)]))
    return model, acc


def main(argv=None):
    ap = argparse.ArgumentParser(description="Distill a G2P engine into the OOV transformer")
    ap.add_argument("--language", default="en")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--wordlist", action="append", default=[],
                    help="extra newline-separated word files labeled by the rules engine")
    args = ap.parse_args(argv)
    extra = []
    for path in args.wordlist:
        with open(path, encoding="utf-8") as f:
            extra.extend(w.strip() for w in f if w.strip())
    cfg = G2PModelConfig(dim=args.dim, layers=args.layers)
    model, acc = distill(args.language, cfg, steps=args.steps, extra_words=extra, log_every=200)
    model.save(args.out)
    print(f"saved {args.out}; distillation exact-match {acc:.2%}")


if __name__ == "__main__":
    main()
