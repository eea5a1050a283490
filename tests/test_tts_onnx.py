"""ONNX vocoder path: torch-exported graphs through the ONNX->XLA interpreter.

The strongest available zero-egress validation of the published-voice
path (reference vocoder.ort slot, zipvoice-tts.h:84-104): build real
HiFiGAN/Vocos-class torch modules, export them with torch.onnx, execute
the exported graph through ops/onnx_graph.py, and require numerical parity
with torch — the same exported file ONNX Runtime would consume.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# The torchscript exporter post-processes the serialized model with the
# `onnx` package ONLY to inline custom onnxscript functions; none of these
# graphs have any, and the package isn't in this image — make the hook the
# identity it would be anyway.
from torch.onnx._internal.torchscript_exporter import onnx_proto_utils as _opu

_opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

import jax.numpy as jnp

from moonshine_tpu.core.onnx_io import load_onnx
from moonshine_tpu.ops.onnx_graph import execute


def _roundtrip(module, inputs, tmp_path, atol=2e-4, opset=17):
    """Export module(inputs) to ONNX, run both, compare."""
    module.eval()
    path = str(tmp_path / "m.onnx")
    with torch.no_grad():
        expected = module(*inputs)
    torch.onnx.export(
        module, tuple(inputs), path, opset_version=opset, dynamo=False,
        input_names=[f"in{i}" for i in range(len(inputs))],
    )
    graph = load_onnx(path)
    feeds = {
        name: jnp.asarray(x.numpy())
        for (name, _), x in zip(graph.inputs, inputs)
    }
    got = np.asarray(execute(graph, feeds)[0])
    np.testing.assert_allclose(got, expected.numpy(), atol=atol, rtol=1e-3)
    return graph


class ResBlock(torch.nn.Module):
    """HiFiGAN-style dilated residual block (leaky relu + dilated convs)."""

    def __init__(self, ch, kernel=3, dilations=(1, 3)):
        super().__init__()
        self.convs = torch.nn.ModuleList([
            torch.nn.Conv1d(ch, ch, kernel, dilation=d, padding=d * (kernel - 1) // 2)
            for d in dilations
        ])

    def forward(self, x):
        for c in self.convs:
            x = x + c(torch.nn.functional.leaky_relu(x, 0.1))
        return x


class MiniHiFiGAN(torch.nn.Module):
    """Structurally faithful miniature of the HiFiGAN generator: pre-conv,
    ConvTranspose upsampling stages with residual stacks, post-conv, tanh."""

    def __init__(self, n_mels=20, ch=32, ups=(4, 4)):
        super().__init__()
        self.pre = torch.nn.Conv1d(n_mels, ch, 7, padding=3)
        self.ups = torch.nn.ModuleList()
        self.res = torch.nn.ModuleList()
        c = ch
        for u in ups:
            self.ups.append(
                torch.nn.ConvTranspose1d(c, c // 2, u * 2, stride=u, padding=u // 2)
            )
            self.res.append(ResBlock(c // 2))
            c //= 2
        self.post = torch.nn.Conv1d(c, 1, 7, padding=3)

    def forward(self, mel):
        x = self.pre(mel)
        for up, res in zip(self.ups, self.res):
            x = up(torch.nn.functional.leaky_relu(x, 0.1))
            x = res(x)
        return torch.tanh(self.post(torch.nn.functional.leaky_relu(x, 0.1)))


def test_mini_hifigan_parity(tmp_path):
    torch.manual_seed(0)
    m = MiniHiFiGAN()
    mel = torch.randn(1, 20, 37)
    _roundtrip(m, [mel], tmp_path)


def test_grouped_conv_transpose_parity(tmp_path):
    torch.manual_seed(1)
    m = torch.nn.ConvTranspose1d(8, 12, 5, stride=3, padding=2,
                                 output_padding=1, groups=4)
    _roundtrip(m, [torch.randn(2, 8, 11)], tmp_path)


def test_conv_transpose_2d_parity(tmp_path):
    torch.manual_seed(2)
    m = torch.nn.ConvTranspose2d(3, 5, (4, 3), stride=(2, 1), padding=(1, 1))
    _roundtrip(m, [torch.randn(1, 3, 9, 7)], tmp_path)


class VocosBlock(torch.nn.Module):
    """ConvNeXt-flavored Vocos backbone block: depthwise conv, LayerNorm,
    pointwise MLP with GELU (erf path), residual."""

    def __init__(self, ch=24):
        super().__init__()
        self.dw = torch.nn.Conv1d(ch, ch, 7, padding=3, groups=ch)
        self.norm = torch.nn.LayerNorm(ch)
        self.fc1 = torch.nn.Linear(ch, ch * 3)
        self.fc2 = torch.nn.Linear(ch * 3, ch)

    def forward(self, x):  # [B, C, T]
        h = self.dw(x).transpose(1, 2)
        h = self.norm(h)
        h = self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x + h.transpose(1, 2)


def test_vocos_backbone_parity(tmp_path):
    torch.manual_seed(3)
    m = torch.nn.Sequential(VocosBlock(), VocosBlock())
    _roundtrip(m, [torch.randn(1, 24, 19)], tmp_path)


class OpsSampler(torch.nn.Module):
    """Exercises the long tail of vocoder-graph ops in one export: Split,
    Where/compare, reductions, Expand/Gather, Pow/Sqrt/Exp, PRelu."""

    def __init__(self):
        super().__init__()
        self.prelu = torch.nn.PReLU(6)

    def forward(self, x):  # [B, 6, T]
        a, b = torch.split(x, 3, dim=1)
        y = torch.where(a > b, a, b * 2.0)
        z = (y.pow(2).mean(dim=-1, keepdim=True) + 1e-5).sqrt()
        g = torch.exp(-z).expand(-1, 3, x.shape[-1])
        out = torch.cat([y / (z + 1.0), g], dim=1)
        return self.prelu(out)


def test_ops_sampler_parity(tmp_path):
    torch.manual_seed(4)
    _roundtrip(OpsSampler(), [torch.randn(2, 6, 13)], tmp_path)


def test_onnx_vocoder_wrapper(tmp_path):
    from moonshine_tpu.models.tts_onnx import OnnxVocoder

    torch.manual_seed(5)
    m = MiniHiFiGAN().eval()
    path = str(tmp_path / "voc.onnx")
    mel = torch.randn(1, 20, 25)
    torch.onnx.export(m, (mel,), path, opset_version=17, dynamo=False, input_names=["mel"])
    voc = OnnxVocoder.from_onnx(path)
    wav = voc(mel.numpy()[0])
    with torch.no_grad():
        expected = m(mel).numpy().reshape(-1)
    assert wav.shape == expected.shape == (25 * 16,)  # 4*4 upsample
    np.testing.assert_allclose(wav, expected, atol=2e-4, rtol=1e-3)


def test_voice_cloner_with_onnx_vocoder(tmp_path):
    """Full cloning flow with the external vocoder in the vocoder.ort slot
    (mel hop 256 = upsample 4*4*4*4)."""
    from moonshine_tpu.models.voice_clone import SAMPLE_RATE, VoiceCloner

    torch.manual_seed(6)
    m = MiniHiFiGAN(n_mels=100, ch=16, ups=(4, 4, 4, 4)).eval()
    path = str(tmp_path / "voc256.onnx")
    torch.onnx.export(m, (torch.randn(1, 100, 32),), path,
                      opset_version=17, dynamo=False, input_names=["mel"],
                      dynamic_axes={"mel": {2: "frames"}})
    cloner = VoiceCloner(vocoder_onnx=path)
    rng = np.random.RandomState(0)
    cloner.set_reference(rng.randn(SAMPLE_RATE).astype(np.float32) * 0.1,
                         "reference clip")
    wav = cloner.synthesize("hello there")
    assert wav.dtype == np.float32 and wav.ndim == 1 and len(wav) > 0
    assert np.max(np.abs(wav)) <= 1.0
