"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from moonshine_tpu.core.config import MoonshineArchConfig
from moonshine_tpu.models import moonshine as mm
from moonshine_tpu.parallel.mesh import make_mesh
from moonshine_tpu.parallel.sharding import param_pspecs, shard_batch, shard_params

CFG = MoonshineArchConfig(
    name="shardtest",
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    encoder_layers=2,
    decoder_layers=2,
)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_param_pspec_rules():
    params = mm.init_params(CFG, jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    enc = specs["encoder"]["layers"]
    assert enc["attn"]["q"]["w"] == P(None, None, "model")
    assert enc["attn"]["o"]["w"] == P(None, "model", None)
    assert enc["mlp"]["fc1"]["w"] == P(None, None, "model")
    assert enc["mlp"]["fc2"]["w"] == P(None, "model", None)
    assert enc["ln1"]["scale"] == P()
    assert specs["decoder"]["embed"] == P("model", None)
    assert specs["frontend"]["conv1"]["w"] == P()


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 4)])
def test_sharded_forward_matches_single_device(data, model):
    mesh = make_mesh(data=data, model=model)
    params = mm.init_params(CFG, jax.random.PRNGKey(0))
    audio = np.random.default_rng(0).standard_normal((8, 4000)).astype(np.float32) * 0.1

    ref_mem, _ = mm.encode(params, CFG, jnp.asarray(audio))

    sharded_params = shard_params(mesh, params)
    sharded_audio = shard_batch(mesh, jnp.asarray(audio))
    mem, _ = jax.jit(lambda p, a: mm.encode(p, CFG, a))(sharded_params, sharded_audio)
    np.testing.assert_allclose(np.asarray(mem), np.asarray(ref_mem), atol=2e-4, rtol=1e-3)


def test_sharded_train_step_runs_and_matches():
    from moonshine_tpu.train.step import (
        Batch,
        init_train_state,
        make_train_step,
        shard_train_state,
    )

    optimizer = optax.adamw(1e-3)
    rng = np.random.default_rng(1)
    b, n, s = 8, 4000, 8
    batch = Batch(
        audio=jnp.asarray(rng.standard_normal((b, n)).astype(np.float32) * 0.1),
        audio_lengths=jnp.full((b,), n, jnp.int32),
        tokens_in=jnp.asarray(rng.integers(0, 512, (b, s)), jnp.int32),
        tokens_out=jnp.asarray(rng.integers(0, 512, (b, s)), jnp.int32),
        token_mask=jnp.ones((b, s), bool),
    )

    # Single-device reference
    state0 = init_train_state(CFG, optimizer, jax.random.PRNGKey(0))
    step0 = make_train_step(CFG, optimizer)
    _, metrics0 = step0(state0, batch)

    # 4x2 mesh
    mesh = make_mesh(data=4, model=2)
    state1 = init_train_state(CFG, optimizer, jax.random.PRNGKey(0))
    state1 = shard_train_state(mesh, state1)
    step1 = make_train_step(CFG, optimizer, mesh)
    new_state, metrics1 = step1(state1, shard_batch(mesh, batch))

    np.testing.assert_allclose(
        float(metrics0["loss"]), float(metrics1["loss"]), rtol=1e-4
    )
    assert int(new_state.step) == 1


def test_greedy_decode_data_parallel():
    mesh = make_mesh(data=8, model=1)
    params = mm.init_params(CFG, jax.random.PRNGKey(0))
    audio = np.random.default_rng(2).standard_normal((8, 4000)).astype(np.float32) * 0.1

    from moonshine_tpu.decoding.greedy import greedy_decode

    mem_ref, mask_ref = mm.encode(params, CFG, jnp.asarray(audio))
    ref = greedy_decode(params, CFG, mem_ref, mask_ref, max_tokens=8)

    sp = shard_params(mesh, params)
    sa = shard_batch(mesh, jnp.asarray(audio))
    mem, mask = jax.jit(lambda p, a: mm.encode(p, CFG, a))(sp, sa)
    res = greedy_decode(sp, CFG, mem, mask, max_tokens=8)
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref.tokens))
