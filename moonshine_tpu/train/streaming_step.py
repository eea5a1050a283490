"""Teacher-forced training for the STREAMING model family.

The reference ships the streaming family inference-only (its sessions are
exported from an internal trainer, reference: README.md:1272-1274 points
at the float sources); a TPU pod framework should be able to fine-tune the
exact parameterization it serves.  The loss below runs the REAL streaming
forward — stateful frontend (`frontend_step`), windowed re-encode
(`encode_step` over ENC_STEP blocks, final semantics: every frame emitted),
incremental adapter/cross-KV — then one teacher-forced decoder pass, so
gradients flow through precisely the code path `StreamingService` executes
at inference.  Chunking invariance (tested) makes the trained mapping hold
for any chunk schedule at serving time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.config import StreamingConfig
from ..models import streaming as ms


def streaming_forward(params, cfg: StreamingConfig, audio: jnp.ndarray, n_frames: int,
                      remat: bool = True):
    """Run frontend + final-semantics encode over a whole utterance.

    audio: [n_frames * frame_len] float32 (trim to a frame multiple — the
    host buffers sub-frame remainders and a final flush drops them, so
    training must see exactly the frames inference will).
    Returns the StreamingState with memory/cross-KV filled.

    ``remat``: rematerialize each encode block in the backward pass
    (jax.checkpoint) — the vmapped batched overfit step at the medium
    arch otherwise holds every block's activations simultaneously and
    RESOURCE_EXHAUSTs one chip (bench train-weights phase, round 4).
    """
    fe = jax.checkpoint(ms.frontend_step, static_argnums=(1,)) if remat \
        else ms.frontend_step
    enc = jax.checkpoint(ms.encode_step, static_argnums=(1,)) if remat \
        else ms.encode_step
    state = ms.init_state(cfg)
    state = fe(params, cfg, audio, state)
    for off in range(0, n_frames, ms.ENC_STEP):
        step = min(n_frames - off, ms.ENC_STEP)
        state = enc(params, cfg, state, jnp.asarray(step, jnp.int32))
    return state


@partial(jax.jit, static_argnames=("cfg", "n_frames", "mem_bucket"))
def streaming_asr_loss(
    params,
    cfg: StreamingConfig,
    audio: jnp.ndarray,  # [n_frames * frame_len]
    tokens_in: jnp.ndarray,  # [s] BOS-prefixed
    tokens_out: jnp.ndarray,  # [s] EOS-suffixed targets
    token_mask: jnp.ndarray,  # [s]
    n_frames: int,
    mem_bucket: int = 512,
) -> jnp.ndarray:
    state = streaming_forward(params, cfg, audio, n_frames)
    state = ms.decoder_reset(state)
    logits, _, _ = ms.decode_tokens(params, cfg, tokens_in, state, mem_bucket=mem_bucket)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens_out[:, None], axis=-1)[:, 0]
    mask = token_mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_overfit_step(cfg: StreamingConfig, optimizer, examples, mem_bucket: int = 512):
    """Jitted full-batch step over a fixed example list (grad accumulation
    across clips of different lengths — each length is its own XLA program).

    examples: list of (audio [n*frame_len], tokens_in, tokens_out, mask).
    Returns (step_fn(params, opt_state) -> (params, opt_state, loss)).
    """
    import optax

    grad_fns = [
        jax.jit(
            jax.value_and_grad(
                lambda p, a=a, ti=ti, to=to, m=m, nf=len(a) // cfg.frame_len: (
                    streaming_asr_loss(p, cfg, a, ti, to, m, nf, mem_bucket)
                )
            )
        )
        for a, ti, to, m in examples
    ]

    def step(params, opt_state):
        total = 0.0
        grads = None
        for fn in grad_fns:
            loss, g = fn(params)
            total += loss
            grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
        grads = jax.tree.map(lambda x: x / len(grad_fns), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total / len(grad_fns)

    return step


def make_batched_overfit_step(cfg: StreamingConfig, optimizer, examples,
                              mem_bucket: int = 512):
    """Single-program variant of :func:`make_overfit_step` for same-length
    clips: tokens pad to one width and the whole example set runs as ONE
    jitted vmapped grad step (the per-example version compiles one XLA
    program per clip, which is minutes of relay compile at bench archs).
    """
    import optax

    n_frames = len(examples[0][0]) // cfg.frame_len
    assert all(len(a) == n_frames * cfg.frame_len for a, *_ in examples)
    L = max(len(ti) for _, ti, _, _ in examples)

    import numpy as np

    def pad(x, fill):
        out = np.full((L,), fill, dtype=np.int32)
        out[: len(x)] = np.asarray(x)
        return out

    audio = jnp.stack([jnp.asarray(a, jnp.float32) for a, *_ in examples])
    ti = jnp.asarray(np.stack([pad(t, 0) for _, t, _, _ in examples]))
    to = jnp.asarray(np.stack([pad(t, 0) for _, _, t, _ in examples]))
    mask = jnp.asarray(np.stack(
        [pad(np.asarray(m, np.int32), 0) for _, _, _, m in examples]
    ).astype(bool))

    def mean_loss(params):
        losses = jax.vmap(
            lambda a, x, y, m: streaming_asr_loss(
                params, cfg, a, x, y, m, n_frames, mem_bucket)
        )(audio, ti, to, mask)
        return jnp.mean(losses)

    grad_fn = jax.value_and_grad(mean_loss)

    @jax.jit
    def step(params, opt_state):
        loss, grads = grad_fn(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
