"""Piper/VITS-architecture voice graph through the ONNX interpreter
(VERDICT r3 item 6 — the measured bucketed-duration attempt).

No published voice ONNX exists in this zero-egress environment, so the
test exports an architecture-faithful VITS inference graph (text
encoder → duration predictor → comparison-built alignment length
regulation → coupling flow → HiFiGAN-style ConvTranspose decoder; see
scripts/spike_piper_vits.py) at a small bucket and requires end-to-end
numerical parity with torch.  The dynamic-shape core (duration →
cumsum → alignment matmul) runs on FIXED bucket shapes with masks —
the production bucketing recipe.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # torch export + XLA compile ~1 min

_SPEC = importlib.util.spec_from_file_location(
    "spike_piper_vits",
    Path(__file__).resolve().parents[1] / "scripts" / "spike_piper_vits.py")
sp = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sp)


def test_vits_graph_bucketed_parity(tmp_path):
    torch.manual_seed(0)
    model = sp.PiperLikeVits(d=48).eval()
    T, F = 32, 96
    ids = torch.randint(1, 64, (1, T))
    ids[0, 20:] = 0
    text_mask = (torch.arange(T)[None, :] < 20).float()
    frame_pos = torch.arange(F).float()
    noise = torch.randn(1, 48, F)
    scales = torch.tensor([0.667, 1.0, 0.8])
    with torch.no_grad():
        ref = model(ids, text_mask, frame_pos, noise, scales).numpy()

    path = tmp_path / "vits.onnx"
    torch.onnx.export(
        model, (ids, text_mask, frame_pos, noise, scales), str(path),
        input_names=["input", "text_mask", "frame_pos", "noise", "scales"],
        output_names=["output"], opset_version=17, dynamo=False)

    from moonshine_tpu.core.onnx_io import load_onnx
    from moonshine_tpu.ops.onnx_graph import execute

    g = load_onnx(str(path))
    out = np.asarray(execute(g, {
        "input": np.asarray(ids), "text_mask": np.asarray(text_mask),
        "frame_pos": np.asarray(frame_pos), "noise": np.asarray(noise),
        "scales": np.asarray(scales)})[0])
    assert out.shape == ref.shape == (1, 1, F * 256)
    np.testing.assert_allclose(out, ref, atol=5e-4)

    # padding exactness: growing the frame bucket must not change the
    # populated frames' audio (the bucketing contract)
    F2 = 128
    frame_pos2 = torch.arange(F2).float()
    noise2 = torch.zeros(1, 48, F2)
    noise2[..., :F] = noise
    with torch.no_grad():
        ref2 = model(ids, text_mask, frame_pos2, noise2, scales).numpy()
    n_frames = int(min(
        np.ceil(np.exp(0)),  # placeholder; compare shared prefix below
        F))
    # frames beyond the true total duration are zero-masked before the
    # decoder; the shared [0, F) prefix of the upsampled wave agrees
    # wherever the decoder's receptive field sees identical frames
    pad = 8 * 256
    np.testing.assert_allclose(
        ref2[..., : F * 256 - pad], ref[..., : F * 256 - pad], atol=5e-4)
