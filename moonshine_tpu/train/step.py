"""Training/fine-tuning step for the Moonshine family.

The reference ships inference only (its sole training code is the micro
stack's torch pipeline, reference: micro/stt-training/), but a TPU pod
framework must scale fine-tuning too: this module provides the
teacher-forced ASR loss and a pjit-sharded train step (DP over utterances,
TP over the model axis) that the driver's multi-chip dry-run compiles.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MoonshineArchConfig
from ..models import moonshine as mm
from ..parallel.sharding import batch_pspec, param_pspecs


class Batch(NamedTuple):
    """One teacher-forced ASR batch (padded, masked)."""

    audio: jnp.ndarray  # [B, N] float32
    audio_lengths: jnp.ndarray  # [B] int32
    tokens_in: jnp.ndarray  # [B, S] int32, BOS-prefixed
    tokens_out: jnp.ndarray  # [B, S] int32, EOS-suffixed targets
    token_mask: jnp.ndarray  # [B, S] bool


def asr_loss(
    params: Any, cfg: MoonshineArchConfig, batch: Batch
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Mean masked cross-entropy of teacher-forced decoding."""
    memory, frame_mask = mm.encode(params, cfg, batch.audio, batch.audio_lengths)
    dec = params["decoder"]
    b, s = batch.tokens_in.shape
    k_cross, v_cross = mm.compute_cross_kv(dec, cfg, memory)
    cache = mm.init_cache(cfg, b, s, k_cross, v_cross, frame_mask, dtype=memory.dtype)
    logits, _, _ = mm.decoder_apply(dec, cfg, batch.tokens_in, cache, token_mask=batch.token_mask)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, batch.tokens_out[..., None], axis=-1)[..., 0]
    mask = batch.token_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(nll * mask) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == batch.tokens_out) * mask) / denom
    return loss, {"loss": loss, "token_accuracy": acc}


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(cfg: MoonshineArchConfig, optimizer, rng: jax.Array) -> TrainState:
    params = mm.init_params(cfg, rng)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def state_pspecs(state: TrainState) -> TrainState:
    """PartitionSpec pytree for a TrainState.

    Optimizer moment buffers share their parameter's sharding (matched by
    array shape — optax states mirror the param tree); scalars replicate.
    """
    pspec = param_pspecs(state.params)
    by_shape: dict[tuple, P] = {}
    for p_leaf, spec in zip(jax.tree.leaves(state.params), jax.tree.leaves(pspec)):
        by_shape.setdefault(tuple(p_leaf.shape), spec)

    def leaf_spec(leaf):
        if leaf is None or jnp.ndim(leaf) == 0:
            return P()
        return by_shape.get(tuple(leaf.shape), P())

    opt_spec = jax.tree.map(leaf_spec, state.opt_state)
    return TrainState(pspec, opt_spec, P())


def batch_pspecs() -> Batch:
    return Batch(
        audio=batch_pspec(2),
        audio_lengths=batch_pspec(1),
        tokens_in=batch_pspec(2),
        tokens_out=batch_pspec(2),
        token_mask=batch_pspec(2),
    )


def shard_train_state(mesh: Mesh, state: TrainState) -> TrainState:
    specs = state_pspecs(state)
    return jax.device_put(
        state, jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    )


def make_train_step(cfg: MoonshineArchConfig, optimizer, mesh: Mesh | None = None):
    """Build a jitted (optionally mesh-sharded) train step.

    With a mesh, params/opt-state follow the TP rules from
    parallel.sharding and batches shard over the data axis; XLA derives the
    gradient psums from the sharding annotations alone.
    """

    def step(state: TrainState, batch: Batch):
        (_, metrics), grads = jax.value_and_grad(asr_loss, has_aux=True)(
            state.params, cfg, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=0)

    def jitted(state: TrainState, batch: Batch):
        sp = jax.tree.map(lambda s: NamedSharding(mesh, s), state_pspecs(state))
        bp = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_pspecs())
        # Pin the OUTPUT state to the same shardings as the input: without
        # this, GSPMD may emit an equivalent-but-different sharding for
        # some leaf and the NEXT step's strict in_shardings reject it
        # (multi-step mesh training; metrics stay replicated).
        return jax.jit(
            step,
            in_shardings=(sp, bp),
            out_shardings=(sp, NamedSharding(mesh, P())),
            donate_argnums=0,
        )(state, batch)

    return jitted
