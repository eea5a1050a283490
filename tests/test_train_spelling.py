"""SpellingCNN training on the REAL captured set — the repo's end-to-end
training demonstration (reference analog: micro/stt-training).

Chance on the 36-way task is ~2.8%; the assertion is that a few epochs of
the real training loop drive train accuracy far beyond that on the real
220-clip data."""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training-heavy (fast/slow split, conftest)

DATA = "/root/reference/test-assets/alphanumeric"

needs_data = pytest.mark.skipif(not os.path.isdir(DATA), reason="captured set unavailable")


@needs_data
def test_dataset_loader_reads_captured_set():
    from moonshine_tpu.train.spelling import load_directory_dataset

    ds = load_directory_dataset(DATA)
    assert ds.audio.shape == (len(ds.labels), 16000)
    assert len(ds.labels) >= 200
    assert ds.audio.dtype == np.float32
    # Every one of the 36 classes is represented.
    assert len(set(ds.labels.tolist())) == 36


@needs_data
def test_single_batch_memorization():
    """The optimizer mechanics: 25 steps on one real batch must crush the
    loss well below the ln(36)=3.58 chance floor."""
    import jax
    import jax.numpy as jnp
    import optax

    from moonshine_tpu.models import spelling as sp
    from moonshine_tpu.train.spelling import _adam_step, load_directory_dataset

    ds = load_directory_dataset(DATA)
    params = sp.init_params(jax.random.PRNGKey(0))
    opt_state = optax.adam(3e-3).init(params)
    a, y = jnp.asarray(ds.audio[:32]), jnp.asarray(ds.labels[:32])
    for i in range(25):
        params, opt_state, loss = _adam_step(params, opt_state, a, y, i, lr=3e-3)
    assert float(loss) < 2.0


@needs_data
def test_training_learns_real_data():
    from moonshine_tpu.train.spelling import load_directory_dataset, train

    ds = load_directory_dataset(DATA)
    res = train(ds, epochs=15, batch_size=32, lr=3e-3, seed=0, use_augment=False)
    # Real-data learning: loss falls and train accuracy leaves the ~2.8%
    # chance floor well behind within a CPU-affordable budget (the point is
    # that the loop optimizes the real objective on real audio, not to
    # reach the reference's converged 90% — that takes its full synthetic
    # corpus, micro/stt-training/README.md).
    assert res.losses[0] > res.losses[-1] + 0.3
    assert res.train_accuracy > 0.09  # > 3x chance


def test_augment_preserves_shape_and_labels_free():
    from moonshine_tpu.train.spelling import augment

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 16000)).astype(np.float32) * 0.1
    y = augment(rng, x)
    assert y.shape == x.shape and y.dtype == np.float32
    assert not np.allclose(x, y)
