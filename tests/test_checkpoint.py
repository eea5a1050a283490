"""Checkpoint + distributed-helper tests."""

import jax
import numpy as np
import pytest

from moonshine_tpu.core.config import MoonshineArchConfig
from moonshine_tpu.models import moonshine as mm
from moonshine_tpu.train.checkpoint import (
    export_safetensors,
    import_safetensors,
    restore_checkpoint,
    save_checkpoint,
)

CFG = MoonshineArchConfig(
    name="ckpt", vocab_size=64, hidden_size=32, intermediate_size=64,
    encoder_layers=1, decoder_layers=1, encoder_heads=4, decoder_heads=4,
    encoder_kv_heads=4, decoder_kv_heads=4,
)


def test_safetensors_roundtrip(tmp_path):
    params = mm.init_params(CFG, jax.random.PRNGKey(0))
    path = tmp_path / "m.safetensors"
    export_safetensors(path, params)
    zeros = jax.tree.map(lambda x: jax.numpy.zeros_like(x), params)
    restored = import_safetensors(path, zeros)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_safetensors_noncontiguous_leaves(tmp_path):
    """Regression: on the TPU backend ``np.asarray(device_array)`` can be
    a zero-copy view with the accelerator's transposed layout
    (F-strided); safetensors then serialized the raw buffer as if
    C-order and silently permuted 5/35 Base leaves (found round 5 —
    reloaded overfit loss 0.02 -> 10.6).  export_safetensors must
    force C-order for ANY stride pattern."""
    rng = np.random.RandomState(0)
    params = {
        "f_order": np.asfortranarray(rng.randn(33, 17).astype(np.float32)),
        "transposed": rng.randn(5, 65, 9).astype(np.float32).transpose(2, 1, 0),
        "sliced": rng.randn(40, 40).astype(np.float32)[::2, ::2],
        "c_order": rng.randn(8, 8).astype(np.float32),
    }
    assert not params["f_order"].flags["C_CONTIGUOUS"]
    path = tmp_path / "nc.safetensors"
    export_safetensors(path, params)
    zeros = jax.tree.map(lambda x: np.zeros_like(x), params)
    restored = import_safetensors(path, zeros)
    for k in params:
        np.testing.assert_array_equal(np.asarray(restored[k]), params[k]), k


def test_safetensors_shape_mismatch(tmp_path):
    params = mm.init_params(CFG, jax.random.PRNGKey(0))
    path = tmp_path / "m.safetensors"
    export_safetensors(path, params)
    other = mm.init_params(
        MoonshineArchConfig(
            name="bigger", vocab_size=64, hidden_size=64, intermediate_size=64,
            encoder_layers=1, decoder_layers=1, encoder_heads=4, decoder_heads=4,
            encoder_kv_heads=4, decoder_kv_heads=4,
        ),
        jax.random.PRNGKey(0),
    )
    with pytest.raises(ValueError):
        import_safetensors(path, other)


def test_orbax_roundtrip(tmp_path):
    import optax

    from moonshine_tpu.train.step import init_train_state

    state = init_train_state(CFG, optax.adamw(1e-3), jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "ck", state)
    zero_state = jax.tree.map(lambda x: jax.numpy.zeros_like(x), state)
    restored = restore_checkpoint(tmp_path / "ck", zero_state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distributed_helpers_single_process():
    from moonshine_tpu.parallel.distributed import (
        all_reduce_metrics,
        global_mesh,
        host_local_batch_to_global,
        initialize,
    )

    initialize()  # no-op single process
    mesh = global_mesh(model=2)
    assert mesh.shape["model"] == 2
    batch = {"x": np.ones((8, 4), np.float32)}
    out = host_local_batch_to_global(mesh, batch)
    assert out["x"].shape == (8, 4)
    m = all_reduce_metrics({"errors": 3, "words": 10})
    assert m == {"errors": 3.0, "words": 10.0}
