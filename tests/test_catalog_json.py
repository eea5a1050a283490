"""Catalog / dependency JSON surface (VERDICT r3 item 8).

The reference exposes eight moonshine_get_* catalog/dependency entry
points (moonshine-c-api.h:910-1074); our service-boundary analog is
catalog.catalog_request_json dispatched by the server's "catalog" RPC
and the native mt_client_catalog_json.  Python shape tests here; the
native loopback drive lives in test_native_client.py.
"""

from __future__ import annotations

import json

import pytest

from moonshine_tpu import catalog


def test_stt_catalog_shape():
    doc = json.loads(catalog.stt_catalog_json())
    assert "languages" in doc and doc["languages"]
    en = next(l for l in doc["languages"] if l["code"] == "en")
    assert en["english_name"] == "English"
    assert any(m["is_default"] for m in en["models"])
    # default model sorts first (reference: first model = default)
    assert en["models"][0]["is_default"]


def test_stt_dependencies_shape_and_language_name_resolution():
    doc = json.loads(catalog.stt_dependencies_json("English"))
    assert doc["groups"] and doc["groups"][0]["files"]
    names = [f["name"] for f in doc["groups"][0]["files"]]
    assert "model.safetensors" in names and "tokenizer.bin" in names
    for f in doc["groups"][0]["files"]:
        assert set(f) == {"name", "url", "size", "checksum",
                          "checksum_type"}


def test_stt_dependencies_spelling_group():
    doc = json.loads(catalog.stt_dependencies_json(
        "en", include_spelling=True))
    assert len(doc["groups"]) == 2
    assert doc["groups"][1]["files"][0]["name"] == "spelling.safetensors"


def test_stt_dependencies_unknown_language_raises():
    with pytest.raises(KeyError):
        catalog.stt_dependencies_json("klingon")


def test_base_url_threads_into_urls(monkeypatch):
    monkeypatch.setenv("MOONSHINE_TPU_MODEL_URL", "https://example.test/m")
    doc = json.loads(catalog.stt_dependencies_json("en"))
    f = doc["groups"][0]["files"][0]
    assert f["url"] == f"https://example.test/m/tiny-en/{f['name']}"
    assert doc["groups"][0]["base_url"] == "https://example.test/m/tiny-en"


def test_embedding_and_diarization_dependencies():
    emb = json.loads(catalog.embedding_dependencies_json())
    assert emb["groups"][0]["files"]
    with pytest.raises(KeyError):
        catalog.embedding_dependencies_json("not-a-model")
    dia = json.loads(catalog.diarization_dependencies_json())
    names = [f["name"] for f in dia["groups"][0]["files"]]
    assert names == ["segmentation.safetensors", "embedding.safetensors"]


def test_tts_voices_states(tmp_path):
    doc = json.loads(catalog.tts_voices_json("en,ja", root=tmp_path))
    assert set(doc) == {"en", "ja"}
    ids = [v["id"] for v in doc["en"]]
    assert "style_default" in ids and "neural-pack" in ids
    # catalog-known packs with no file under root list as missing
    # (ADVICE r4: the docstring's missing-state promise is now real)
    assert {"id": "alto", "state": "missing"} in doc["en"]
    (tmp_path / "alto.voicepack.safetensors").write_bytes(b"x")
    doc = json.loads(catalog.tts_voices_json("en", root=tmp_path))
    assert {"id": "alto", "state": "found"} in doc["en"]
    assert {"id": "alto", "state": "missing"} not in doc["en"]


def test_tts_voices_untrusted_root_confined(tmp_path, monkeypatch):
    """The server RPC path must not glob arbitrary server directories
    (ADVICE r4): an out-of-cache root falls back to cache_dir()."""
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "tenor.voicepack.safetensors").write_bytes(b"x")
    outside = tmp_path / "outside"
    outside.mkdir()
    (outside / "leak.voicepack.safetensors").write_bytes(b"x")
    monkeypatch.setenv(catalog.DEFAULT_CACHE_ENV, str(cache))
    doc = json.loads(catalog.catalog_request_json(
        "tts_voices", "en", {"root": str(outside)}))
    ids = {v["id"] for v in doc["en"]}
    assert "leak" not in ids and "tenor" in ids
    # trusted (in-process) callers may still point anywhere
    doc = json.loads(catalog.tts_voices_json("en", root=outside))
    assert "leak" in {v["id"] for v in doc["en"]}


def test_embedding_dependencies_variant_selection():
    """ADVICE r4: the variant selects the model file and unknown
    variants raise (reference: moonshine-c-api.h:1018-1027)."""
    doc = json.loads(catalog.embedding_dependencies_json(variant="fp32"))
    names = [f["name"] for f in doc["groups"][0]["files"]]
    assert "model_fp32.safetensors" in names
    default = json.loads(catalog.embedding_dependencies_json())
    dnames = [f["name"] for f in default["groups"][0]["files"]]
    assert "model_bf16.safetensors" in dnames  # default variant
    with pytest.raises(KeyError):
        catalog.embedding_dependencies_json(variant="q4")


def test_dispatch_known_and_unknown_kinds():
    for kind, arg in (("stt_catalog", None), ("embedding_catalog", None),
                      ("tts_voices", "en"), ("stt_dependencies", "en"),
                      ("tts_dependencies", "en"),
                      ("g2p_dependencies", "en"),
                      ("embedding_dependencies", None),
                      ("diarization_dependencies", None)):
        json.loads(catalog.catalog_request_json(kind, arg))
    with pytest.raises(KeyError):
        catalog.catalog_request_json("nope")
