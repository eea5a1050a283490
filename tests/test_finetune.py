"""Domain-customization finetuning (train/finetune.py).

The reference offers this only as a commercial service (README.md
Domain Customization); here it's the training stack reading the same
data layouts the eval harness reads, pjit-shardable.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moonshine_tpu.core.config import MoonshineArchConfig
from moonshine_tpu.core.tokenizer import BinTokenizer
from moonshine_tpu.train.finetune import finetune

CFG = MoonshineArchConfig(
    name="ft-micro",
    vocab_size=32768,
    hidden_size=64,
    intermediate_size=256,
    encoder_layers=1,
    decoder_layers=1,
    encoder_heads=4,
    decoder_heads=4,
    encoder_kv_heads=4,
    decoder_kv_heads=4,
)


@pytest.fixture(scope="module")
def examples(tokenizer_bin_path):
    rng = np.random.RandomState(0)
    texts = ["hello world", "good morning"]
    return [
        ((rng.randn(16000) * 0.1).astype(np.float32), t) for t in texts
    ], BinTokenizer.from_file(tokenizer_bin_path)


def test_finetune_reduces_loss_and_adapts(examples, tokenizer_bin_path):
    exs, tok = examples
    res = finetune(CFG, tok, exs, steps=150, batch_size=2,
                   learning_rate=2e-3, log_every=25)
    assert res.steps == 150 and res.examples == 2
    assert len(res.losses) >= 2
    assert res.losses[-1] < 0.5 * res.losses[0]

    # The adapted params drop into the product Transcriber.
    import moonshine_tpu as mt

    t = mt.Transcriber(
        model=CFG, tokenizer_path=tokenizer_bin_path,
        options=mt.TranscriberOptions(vad=mt.VadOptions(threshold=0.0)),
    ).with_params(res.params).load()
    out = t.transcribe(exs[0][0])
    assert out.lines  # runs end-to-end with the finetuned weights


def test_finetune_resumes_from_init_params(examples):
    exs, tok = examples
    from moonshine_tpu.models import moonshine as mm

    init = mm.init_params(CFG, jax.random.PRNGKey(42))
    res = finetune(CFG, tok, exs, init_params=init, steps=25, batch_size=2)
    # Params moved away from the provided init (adaptation happened).
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), init, res.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_finetune_on_mesh(examples):
    """pjit-sharded finetuning on the virtual 8-device mesh — the
    multi-chip domain-customization path."""
    exs, tok = examples
    from moonshine_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    res = finetune(CFG, tok, exs * 2, mesh=mesh, steps=8, batch_size=4)
    assert res.steps == 8
    assert np.isfinite(res.losses[-1])


def test_finetune_safetensors_round_trip(examples, tmp_path):
    exs, tok = examples
    from moonshine_tpu.models import moonshine as mm
    from moonshine_tpu.train.checkpoint import export_safetensors, import_safetensors

    res = finetune(CFG, tok, exs, steps=5, batch_size=2)
    path = str(tmp_path / "adapted.safetensors")
    export_safetensors(path, res.params)
    target = mm.init_params(CFG, jax.random.PRNGKey(0))
    loaded = import_safetensors(path, target)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
