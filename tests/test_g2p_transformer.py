"""Neural OOV G2P transformer: distillation, artifact round-trip, routing.

The model is the TPU-native slot for the reference's neural G2P helpers
(reference: core/moonshine-tts/src/lang-specific/g2p-transformer-model.h,
english-hand-oov.h).  Tests train a tiny config on a slice of the
engine-labeled dataset (fast CPU overfit) and assert real learning, a
self-describing save/load artifact, and correct lexicon-first routing in
GraphemeToPhonemizer.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training-heavy (fast/slow split, conftest)

from moonshine_tpu.train.g2p import build_dataset, distill
from moonshine_tpu.tts.g2p import GraphemeToPhonemizer
from moonshine_tpu.tts.g2p_transformer import (
    G2PModelConfig,
    G2PTransformer,
    encode_word,
)

TINY = G2PModelConfig(dim=64, layers=1, heads=4)


@pytest.fixture(scope="module")
def trained():
    model, acc = distill("en", TINY, steps=400, batch_size=32, lr=5e-3, limit=48, seed=0)
    return model, acc


def test_build_dataset_covers_lexicon_and_rules():
    engine, pairs = build_dataset("en")
    words = {w for w, _ in pairs}
    assert "through" in words  # dictionary irregular
    assert "chat" in words  # rule-family word
    assert len(pairs) > 300
    # Every target matches what the full engine would output.
    for w, ipa in pairs[:20]:
        assert engine.word_to_ipa(w) == ipa


def test_build_dataset_prefers_real_pronunciations():
    from moonshine_tpu.tts.g2p_dict import load_baked_dict

    real = load_baked_dict()
    if not real:
        pytest.skip("reference assets not mounted")
    _, pairs = build_dataset("en")
    labels = dict(pairs)
    # Real dictionary entries override engine labels (stress-marked IPA).
    assert labels["people"] == real["people"] == "pˈipəl"
    assert len(pairs) >= len(real)


def test_distillation_learns(trained):
    model, acc = trained
    # 48 pairs, tiny model: must essentially memorize.
    assert acc >= 0.9, f"distillation exact-match too low: {acc}"


def test_predict_batch_matches_predict(trained):
    model, _ = trained
    words = ["about", "again", "all"]
    batch = model.predict_batch(words)
    singles = [model.predict(w) for w in words]
    assert batch == singles


def test_encode_word_static_shape():
    ids = encode_word("hello", 28)
    assert ids.shape == (28,) and ids.dtype == np.int32
    # truncation keeps BOS/EOS framing
    long = encode_word("x" * 100, 28)
    assert long[0] == 1 and (long == 2).sum() == 1


def test_artifact_round_trip(tmp_path, trained):
    model, _ = trained
    path = tmp_path / "en_oov.safetensors"
    model.save(path)
    loaded = G2PTransformer.load(path)
    assert loaded.cfg == model.cfg
    assert loaded.out_vocab == model.out_vocab
    words = ["cat", "through", "zorblax"]
    assert loaded.predict_batch(words) == model.predict_batch(words)


def test_load_rejects_foreign_safetensors(tmp_path):
    from safetensors.numpy import save_file

    p = tmp_path / "other.safetensors"
    save_file({"x": np.zeros(3, np.float32)}, str(p))
    with pytest.raises(ValueError, match="not a G2PTransformer artifact"):
        G2PTransformer.load(p)


def test_phonemizer_routing(trained, tmp_path):
    model, _ = trained
    g = GraphemeToPhonemizer("en", oov_model=model)
    # Dictionary words NEVER go through the network.
    assert g.word_to_ipa("through") == "θɹˈu"
    assert g.word_to_ipa("people") == "pˈipəl"
    # OOV words go through the model (the reference's ONNX OOV slot sits
    # between the dictionary and the hand rules): same result as calling
    # it directly, plus the stress pass every path applies.
    from moonshine_tpu.tts.lang_rules import en_add_primary_stress

    assert (g.word_to_ipa("zorblax")
            == en_add_primary_stress(model.predict("zorblax")))
    # Path-based construction works too.
    p = tmp_path / "m.safetensors"
    model.save(p)
    g2 = GraphemeToPhonemizer("en", oov_model=str(p))
    assert g2.word_to_ipa("zorblax") == g.word_to_ipa("zorblax")


def test_phonemizer_without_model_unchanged():
    g = GraphemeToPhonemizer("en")
    assert g.oov_model is None
    assert g.word_to_ipa("cat") == "kˈæt"
