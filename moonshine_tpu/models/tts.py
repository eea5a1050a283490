"""Neural TTS acoustic model + iSTFT vocoder, TPU-native.

Capability mirror of the reference's Kokoro/Piper engines (reference:
core/moonshine-tts/src/moonshine-tts.cpp, piper-tts.*: phoneme-driven
synthesis at 24 kHz with per-voice style vectors — ``.kokorovoice`` style
embeddings): a StyleTTS-flavored architecture re-designed for XLA static
shapes:

  phoneme ids -> text encoder (conv + rotary transformer, style-conditioned)
  -> duration predictor -> length regulation (static frame budget, masked)
  -> frame decoder -> iSTFT head (magnitude + phase -> overlap-add)
  -> 24 kHz waveform

Everything jits with static [max_phonemes, max_frames] shapes; the host
slices the waveform to the predicted length.  Voices are style vectors;
a voice pack is a dict name -> [style_dim] array.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotary import apply_rotary, rotary_tables
from .layers import ACTIVATIONS, Params, dense, dense_init, layer_norm, norm_init

SAMPLE_RATE = 24000
N_FFT = 1024
HOP = 256
STYLE_DIM = 128
MAX_PHONEMES = 256
MAX_FRAMES = 1024  # ~10.9 s at 93.75 fps

# Phoneme inventory: IPA symbols the G2P engines emit + specials.
_IPA_SYMBOLS = [
    "<pad>", "<bos>", "<eos>", " ", "|", "‖",
    "a", "b", "d", "e", "f", "h", "i", "j", "k", "l", "m", "n", "o", "p",
    "r", "s", "t", "u", "v", "w", "x", "z",
    "æ", "ɑ", "ɔ", "ə", "ɛ", "ɝ", "ɪ", "ʊ", "ʌ", "ŋ", "ɡ", "ɹ", "ɾ",
    "ʃ", "ʒ", "θ", "ð", "ʝ", "ɲ", "ʔ",
    "aɪ", "aʊ", "eɪ", "oʊ", "ɔɪ", "tʃ", "dʒ", "ju", "kw", "ks",
    # Appended (ids above stay stable): stress marks + r-colored schwa,
    # emitted by the baked real-pronunciation dictionary (tts/g2p_dict.py;
    # reference: micro/g2p/src/g2p_dict_data.h kG2pPhones).
    "ˈ", "ˌ", "ɚ",
]
PHONEME_TO_ID = {p: i for i, p in enumerate(_IPA_SYMBOLS)}
VOCAB = len(_IPA_SYMBOLS)
PAD, BOS, EOS = 0, 1, 2


def ipa_to_ids(ipa: str) -> list[int]:
    """Greedy longest-match IPA string -> phoneme ids."""
    ids = [BOS]
    i = 0
    while i < len(ipa):
        if ipa[i : i + 2] in PHONEME_TO_ID:
            ids.append(PHONEME_TO_ID[ipa[i : i + 2]])
            i += 2
        elif ipa[i] in PHONEME_TO_ID:
            ids.append(PHONEME_TO_ID[ipa[i]])
            i += 1
        else:
            i += 1  # unknown symbol: skip
    ids.append(EOS)
    return ids[:MAX_PHONEMES]


class TTSConfig(NamedTuple):
    dim: int = 256
    encoder_layers: int = 4
    decoder_layers: int = 4
    heads: int = 4
    style_dim: int = STYLE_DIM


def _block_init(rng, dim: int):
    k = jax.random.split(rng, 3)
    return {
        "ln1": norm_init(dim),
        "attn": {
            "q": dense_init(k[0], dim, dim, bias=False),
            "k": dense_init(k[0], dim, dim, bias=False),
            "v": dense_init(k[0], dim, dim, bias=False),
            "o": dense_init(k[0], dim, dim, bias=False),
        },
        "ln2": norm_init(dim),
        "mlp": {"fc1": dense_init(k[1], dim, dim * 4), "fc2": dense_init(k[2], dim * 4, dim)},
    }


def init_params(cfg: TTSConfig, rng: jax.Array) -> Params:
    r = jax.random.split(rng, 12)
    d = cfg.dim
    enc = [_block_init(k, d) for k in jax.random.split(r[0], cfg.encoder_layers)]
    dec = [_block_init(k, d) for k in jax.random.split(r[1], cfg.decoder_layers)]
    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    n_bins = N_FFT // 2 + 1
    return {
        "embed": jax.random.normal(r[2], (VOCAB, d)) * 0.02,
        "style_proj": dense_init(r[3], cfg.style_dim, d),
        "encoder": {"layers": stack(enc), "norm": norm_init(d)},
        "duration": {
            "fc1": dense_init(r[4], d, d),
            "fc2": dense_init(r[5], d, 1),
        },
        "decoder": {"layers": stack(dec), "norm": norm_init(d)},
        "head_mag": dense_init(r[6], d, n_bins),
        "head_phase": dense_init(r[7], d, 2 * n_bins),
    }


def _transformer(layers_params, h, mask, heads):
    t = h.shape[0]
    cos, sin = rotary_tables(jnp.arange(t), (h.shape[-1] // heads) - ((h.shape[-1] // heads) % 2), 10000.0)

    def body(carry, lp):
        x = layer_norm(lp["ln1"], carry)
        q = dense(lp["attn"]["q"], x).reshape(t, heads, -1)
        k = dense(lp["attn"]["k"], x).reshape(t, heads, -1)
        v = dense(lp["attn"]["v"], x).reshape(t, heads, -1)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        logits = jnp.einsum("shd,thd->hst", q, k, preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(float(q.shape[-1]))
        logits = jnp.where(mask[None, None, :], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("hst,thd->shd", w, v, preferred_element_type=x.dtype)
        h2 = carry + dense(lp["attn"]["o"], o.reshape(t, -1))
        x2 = layer_norm(lp["ln2"], h2)
        return h2 + dense(lp["mlp"]["fc2"], ACTIVATIONS["gelu"](dense(lp["mlp"]["fc1"], x2))), None

    h, _ = jax.lax.scan(body, h, layers_params)
    return h


class SynthesisResult(NamedTuple):
    waveform: jnp.ndarray  # [MAX_FRAMES * HOP] padded
    n_frames: jnp.ndarray  # scalar: valid frames
    durations: jnp.ndarray  # [MAX_PHONEMES] per-phoneme frames


@partial(jax.jit, static_argnames=("cfg",))
def synthesize(
    params: Params,
    cfg: TTSConfig,
    phonemes: jnp.ndarray,  # [MAX_PHONEMES] int32, PAD-padded
    n_phonemes: jnp.ndarray,  # scalar int32
    style: jnp.ndarray,  # [style_dim]
    speed: jnp.ndarray | float = 1.0,
) -> SynthesisResult:
    d = cfg.dim
    pmask = jnp.arange(MAX_PHONEMES) < n_phonemes
    h = params["embed"][phonemes]
    style_vec = dense(params["style_proj"], style)
    h = h + style_vec[None, :]
    h = _transformer(params["encoder"]["layers"], h, pmask, cfg.heads)
    h = layer_norm(params["encoder"]["norm"], h)

    # Durations in frames per phoneme (softplus, >= 1 for real phonemes).
    dur_h = ACTIVATIONS["gelu"](dense(params["duration"]["fc1"], h))
    durations = jax.nn.softplus(dense(params["duration"]["fc2"], dur_h))[..., 0] + 1.0
    durations = durations / speed
    durations = jnp.where(pmask, durations, 0.0)
    # Scale down if the total exceeds the frame budget.
    total = jnp.sum(durations)
    scale = jnp.minimum(1.0, (MAX_FRAMES - 1) / jnp.maximum(total, 1.0))
    durations = durations * scale
    ends = jnp.cumsum(durations)
    n_frames = jnp.minimum(jnp.round(ends[-1]).astype(jnp.int32), MAX_FRAMES)

    # Length regulation: frame t attends to phoneme argmax(t < ends).
    frame_pos = jnp.arange(MAX_FRAMES, dtype=jnp.float32) + 0.5
    src = jnp.searchsorted(ends, frame_pos)  # [MAX_FRAMES] phoneme index
    src = jnp.clip(src, 0, MAX_PHONEMES - 1)
    frames = h[src]  # [MAX_FRAMES, d]
    fmask = jnp.arange(MAX_FRAMES) < n_frames

    frames = frames + style_vec[None, :]
    frames = _transformer(params["decoder"]["layers"], frames, fmask, cfg.heads)
    frames = layer_norm(params["decoder"]["norm"], frames)

    # iSTFT head: log-magnitude + unit-normalized phase pair per bin.
    n_bins = N_FFT // 2 + 1
    log_mag = dense(params["head_mag"], frames)
    mag = jnp.exp(jnp.clip(log_mag, -8.0, 6.0))
    pp = dense(params["head_phase"], frames).reshape(MAX_FRAMES, n_bins, 2)
    norm = jnp.maximum(jnp.linalg.norm(pp, axis=-1), 1e-6)
    cos_p, sin_p = pp[..., 0] / norm, pp[..., 1] / norm
    re = mag * cos_p
    im = mag * sin_p
    re = jnp.where(fmask[:, None], re, 0.0)
    im = jnp.where(fmask[:, None], im, 0.0)

    wav = _istft(re, im)
    return SynthesisResult(wav, n_frames, durations)


def _istft(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """[T, n_bins] real/imag -> overlap-added waveform [T*HOP]."""
    t, n_bins = re.shape
    spec = re + 1j * im
    # Full spectrum via conjugate symmetry, then irfft.
    frames = jnp.fft.irfft(spec, n=N_FFT, axis=-1)  # [T, N_FFT]
    window = jnp.asarray(np.hanning(N_FFT).astype(np.float32))
    frames = frames * window[None, :]
    out_len = t * HOP + N_FFT
    idx = (jnp.arange(t)[:, None] * HOP + jnp.arange(N_FFT)[None, :]).reshape(-1)
    wav = jnp.zeros(out_len, jnp.float32).at[idx].add(frames.reshape(-1))
    # Window overlap normalization.
    wsum = jnp.zeros(out_len, jnp.float32).at[idx].add(
        jnp.tile(window * window, (t,))
    )
    wav = wav / jnp.maximum(wsum, 1e-6)
    return wav[N_FFT // 2 : N_FFT // 2 + t * HOP]


def make_voice(rng: jax.Array) -> jnp.ndarray:
    """A random style vector — the .kokorovoice analog; real voice packs
    ship trained vectors keyed by name."""
    return jax.random.normal(rng, (STYLE_DIM,)) * 0.5
