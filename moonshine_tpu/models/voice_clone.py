"""Zero-shot voice cloning via conditional flow matching.

Capability mirror of the reference ZipVoice engine (reference:
core/moonshine-tts/src/zipvoice-tts.h:21-108, zipvoice-mel.h:11-30):
text encoder + flow-matching decoder + vocoder at 24 kHz, cloned from a
reference clip (prompt mel + its transcript), with the reference's
sampling contract: distill defaults 8 steps / guidance 3.0 (full: 16 /
1.0), ``t_shift`` 0.5 time warp, ``feat_scale`` 0.1, ``target_rms`` 0.1,
deterministic seeded Gaussian latent, pause compression post-process.

TPU design: mel features and the Euler ODE run fully jitted with static
shapes; classifier-free guidance batches the conditional and
unconditional branches on one leading axis so each ODE step is a single
device call.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import log_mel
from ..ops.rotary import apply_rotary, rotary_tables
from .layers import ACTIVATIONS, Params, dense, dense_init, layer_norm, norm_init
from .tts import MAX_PHONEMES, VOCAB, ipa_to_ids

SAMPLE_RATE = 24000  # reference: zipvoice-tts.h kSampleRateHz
N_FFT = 1024  # reference: zipvoice-mel.h
HOP = 256
N_MELS = 100
MAX_FRAMES = 1024
DISTILL_STEPS, DISTILL_GUIDANCE = 8, 3.0  # reference: zipvoice-tts.h:33-36
FULL_STEPS, FULL_GUIDANCE = 16, 1.0


class CloneConfig(NamedTuple):
    dim: int = 256
    text_layers: int = 2
    fm_layers: int = 4
    heads: int = 4
    t_shift: float = 0.5
    feat_scale: float = 0.1
    target_rms: float = 0.1


def compute_mel(audio: jnp.ndarray) -> jnp.ndarray:
    """[B, N] 24 kHz waveform -> [B, T, 100] log-mel (VocosFbank contract)."""
    return log_mel(audio, n_fft=N_FFT, hop=HOP, n_mels=N_MELS, sample_rate=SAMPLE_RATE)


def _block_init(rng, dim):
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


def init_params(cfg: CloneConfig, rng: jax.Array) -> Params:
    r = jax.random.split(rng, 12)
    d = cfg.dim
    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "embed": jax.random.normal(r[0], (VOCAB, d)) * 0.02,
        "text": {
            "layers": stack([_block_init(k, d) for k in jax.random.split(r[1], cfg.text_layers)]),
            "norm": norm_init(d),
        },
        "in_proj": dense_init(r[2], N_MELS * 2 + d, d),  # x_t + prompt-cond mel + text
        "time_mlp": {"fc1": dense_init(r[3], 64, d), "fc2": dense_init(r[4], d, d)},
        "fm": {
            "layers": stack([_block_init(k, d) for k in jax.random.split(r[5], cfg.fm_layers)]),
            "norm": norm_init(d),
        },
        "out_proj": dense_init(r[6], d, N_MELS),
        "vocoder": {
            "fc1": dense_init(r[7], N_MELS, d),
            "fc2": dense_init(r[8], d, d),
            "mag": dense_init(r[9], d, N_FFT // 2 + 1),
            "phase": dense_init(r[10], d, 2 * (N_FFT // 2 + 1)),
        },
    }


def _transformer(layers_params, h, mask, heads):
    b, t, d = h.shape
    cos, sin = rotary_tables(jnp.arange(t), (d // heads) - ((d // heads) % 2), 10000.0)

    def body(carry, lp):
        x = layer_norm(lp["ln1"], carry)
        q = dense(lp["attn"]["q"], x).reshape(b, t, heads, -1)
        k = dense(lp["attn"]["k"], x).reshape(b, t, heads, -1)
        v = dense(lp["attn"]["v"], x).reshape(b, t, heads, -1)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(float(q.shape[-1]))
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhst,bthd->bshd", w, v, preferred_element_type=x.dtype)
        h2 = carry + dense(lp["attn"]["o"], o.reshape(b, t, d))
        x2 = layer_norm(lp["ln2"], h2)
        return h2 + dense(lp["mlp"]["fc2"], ACTIVATIONS["gelu"](dense(lp["mlp"]["fc1"], x2))), None

    h, _ = jax.lax.scan(body, h, layers_params)
    return h


def _time_embedding(t: jnp.ndarray, dim: int = 64) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    ang = t[..., None] * freqs * 1000.0
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _velocity(params, cfg: CloneConfig, x_t, t, text_cond, prompt_cond, fmask):
    """Predict the flow velocity field.  Leading axis batches the CFG pair."""
    b = x_t.shape[0]
    te = _time_embedding(jnp.full((b,), t))
    temb = dense(params["time_mlp"]["fc2"], ACTIVATIONS["silu"](dense(params["time_mlp"]["fc1"], te)))
    h = dense(params["in_proj"], jnp.concatenate([x_t, prompt_cond, text_cond], axis=-1))
    h = h + temb[:, None, :]
    h = _transformer(params["fm"]["layers"], h, fmask, cfg.heads)
    h = layer_norm(params["fm"]["norm"], h)
    return dense(params["out_proj"], h)


@partial(jax.jit, static_argnames=("cfg", "num_steps"))
def flow_matching_sample(
    params: Params,
    cfg: CloneConfig,
    text_cond: jnp.ndarray,  # [T_frames, d] upsampled text condition
    prompt_cond: jnp.ndarray,  # [T_frames, n_mels] prompt mel (zeros past prompt)
    fmask: jnp.ndarray,  # [T_frames] valid-frame mask
    seed: jnp.ndarray,  # scalar uint32
    guidance_scale: float | jnp.ndarray = DISTILL_GUIDANCE,
    num_steps: int = DISTILL_STEPS,
) -> jnp.ndarray:
    """Euler ODE from seeded Gaussian noise -> mel frames [T_frames, n_mels].

    Classifier-free guidance runs the conditional and text-free branches as
    one batch of 2 per step (reference: distill 8 steps / guidance 3.0).
    """
    t_frames = text_cond.shape[0]
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (t_frames, N_MELS))

    cond = jnp.stack([text_cond, jnp.zeros_like(text_cond)])  # [2, T, d]
    pc = jnp.stack([prompt_cond, prompt_cond])
    mask2 = jnp.stack([fmask, fmask])

    # Time grid with the reference's t_shift warp: t' = s*t / (1 + (s-1)*t).
    ts = jnp.linspace(0.0, 1.0, num_steps + 1)
    s = cfg.t_shift
    ts = s * ts / (1.0 + (s - 1.0) * ts)

    def step(i, x):
        t0, t1 = ts[i], ts[i + 1]
        v = _velocity(params, cfg, jnp.stack([x, x]), t0, cond, pc, mask2)
        v_cond, v_uncond = v[0], v[1]
        v_guided = v_uncond + guidance_scale * (v_cond - v_uncond)
        return x + (t1 - t0) * v_guided

    x = jax.lax.fori_loop(0, num_steps, step, x)
    return jnp.where(fmask[:, None], x, 0.0)


@partial(jax.jit, static_argnames=())
def vocode(params: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """[T, n_mels] mel -> waveform [T * HOP] via iSTFT head."""
    v = params["vocoder"]
    h = ACTIVATIONS["gelu"](dense(v["fc1"], mel))
    h = ACTIVATIONS["gelu"](dense(v["fc2"], h)) + h
    n_bins = N_FFT // 2 + 1
    mag = jnp.exp(jnp.clip(dense(v["mag"], h), -8.0, 6.0))
    pp = dense(v["phase"], h).reshape(mel.shape[0], n_bins, 2)
    norm = jnp.maximum(jnp.linalg.norm(pp, axis=-1), 1e-6)
    re = mag * pp[..., 0] / norm
    im = mag * pp[..., 1] / norm
    return _istft_24k(re, im)


def _istft_24k(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    t, n_bins = re.shape
    spec = re + 1j * im
    frames = jnp.fft.irfft(spec, n=N_FFT, axis=-1)
    window = jnp.asarray(np.hanning(N_FFT).astype(np.float32))
    frames = frames * window[None, :]
    out_len = t * HOP + N_FFT
    idx = (jnp.arange(t)[:, None] * HOP + jnp.arange(N_FFT)[None, :]).reshape(-1)
    wav = jnp.zeros(out_len, jnp.float32).at[idx].add(frames.reshape(-1))
    wsum = jnp.zeros(out_len, jnp.float32).at[idx].add(jnp.tile(window * window, (t,)))
    return (wav / jnp.maximum(wsum, 1e-6))[N_FFT // 2 : N_FFT // 2 + t * HOP]


class VoiceCloner:
    """Text -> waveform in a cloned voice (reference: ZipVoiceTTS API)."""

    def __init__(
        self,
        params: Params | None = None,
        cfg: CloneConfig | None = None,
        distill: bool = True,
        seed: int = 666,  # reference default
        speed: float = 1.0,
        vocoder_onnx: str | None = None,
    ):
        import jax

        self.cfg = cfg or CloneConfig()
        self.params = params if params is not None else init_params(self.cfg, jax.random.PRNGKey(0))
        self.num_steps = DISTILL_STEPS if distill else FULL_STEPS
        self.guidance = DISTILL_GUIDANCE if distill else FULL_GUIDANCE
        self.seed = seed
        self.speed = speed
        # Published mel->wav vocoder export in the reference's vocoder.ort
        # slot (zipvoice-tts.h:84-104); runs via the ONNX->XLA interpreter.
        # Contract: [n_mels, T] in, T*HOP samples out (Vocos 24k/1024/256).
        if vocoder_onnx is not None:
            from .tts_onnx import OnnxVocoder

            self.vocoder = OnnxVocoder.from_onnx(vocoder_onnx)
        else:
            self.vocoder = None
        self._prompt_mel: np.ndarray | None = None
        self._prompt_ipa = ""

    def set_reference(
        self, clone_pcm: np.ndarray, clone_transcript: str = "", sample_rate: int = SAMPLE_RATE
    ) -> None:
        if sample_rate != SAMPLE_RATE:
            from ..audio.resample import resample_audio

            clone_pcm = resample_audio(clone_pcm, sample_rate, SAMPLE_RATE)
        # RMS-normalize the prompt to target_rms (reference: target_rms 0.1).
        rms = float(np.sqrt(np.mean(np.square(clone_pcm)) + 1e-12))
        if rms > 1e-6:
            clone_pcm = clone_pcm * (self.cfg.target_rms / rms)
        mel = np.asarray(compute_mel(jnp.asarray(clone_pcm, jnp.float32)[None]))[0]
        self._prompt_mel = mel * self.cfg.feat_scale
        if clone_transcript:
            from ..tts.g2p import GraphemeToPhonemizer

            self._prompt_ipa = GraphemeToPhonemizer("en").text_to_ipa(clone_transcript)

    def synthesize_from_ipa(self, ipa: str) -> np.ndarray:
        if self._prompt_mel is None:
            raise RuntimeError("Call set_reference() with a clone clip first")
        ids = ipa_to_ids(ipa.replace(" ", ""))
        prompt_ids = ipa_to_ids(self._prompt_ipa.replace(" ", "")) if self._prompt_ipa else []
        prompt_frames = min(len(self._prompt_mel), MAX_FRAMES // 2)

        # Target length by phoneme-rate ratio against the prompt (ZipVoice's
        # length estimate), bounded by the static budget.
        if prompt_ids:
            frames_per_phoneme = prompt_frames / max(len(prompt_ids), 1)
        else:
            frames_per_phoneme = 8.0
        gen_frames = int(len(ids) * frames_per_phoneme / self.speed)
        gen_frames = max(min(gen_frames, MAX_FRAMES - prompt_frames), 8)
        total = prompt_frames + gen_frames

        # Text condition: phoneme embeddings through the text encoder,
        # upsampled uniformly over the generated span.
        phon = np.zeros(MAX_PHONEMES, np.int32)
        seq = (prompt_ids + ids)[:MAX_PHONEMES]
        phon[: len(seq)] = seq
        pmask = jnp.arange(MAX_PHONEMES) < len(seq)
        h = self.params["embed"][jnp.asarray(phon)][None]
        h = _transformer(self.params["text"]["layers"], h, pmask[None], self.cfg.heads)
        h = layer_norm(self.params["text"]["norm"], h)[0]  # [MAX_PHONEMES, d]
        # Uniform frame->phoneme map over the whole utterance.
        src = np.minimum(
            (np.arange(MAX_FRAMES) * max(len(seq), 1) // max(total, 1)), len(seq) - 1
        ).astype(np.int32)
        text_cond = np.asarray(h)[src]

        prompt_cond = np.zeros((MAX_FRAMES, N_MELS), np.float32)
        prompt_cond[:prompt_frames] = self._prompt_mel[:prompt_frames]
        fmask = np.arange(MAX_FRAMES) < total

        mel = flow_matching_sample(
            self.params,
            self.cfg,
            jnp.asarray(text_cond),
            jnp.asarray(prompt_cond),
            jnp.asarray(fmask),
            jnp.asarray(self.seed, jnp.uint32),
            guidance_scale=self.guidance,
            num_steps=self.num_steps,
        )
        mel = mel / self.cfg.feat_scale
        if self.vocoder is not None:
            # External vocoders take [n_mels, T] mel.
            wav = np.asarray(self.vocoder(np.asarray(mel).T))
        else:
            wav = np.asarray(vocode(self.params, mel))
        wav = wav[prompt_frames * HOP : total * HOP]
        wav = np.clip(wav, -1.0, 1.0)  # reference: always clip, no peak norm
        return compress_long_pauses(wav, SAMPLE_RATE)

    def synthesize(self, text: str) -> np.ndarray:
        from ..tts.g2p import GraphemeToPhonemizer

        return self.synthesize_from_ipa(GraphemeToPhonemizer("en").text_to_ipa(text))


def compress_long_pauses(
    wav: np.ndarray,
    sample_rate: int,
    max_silence_ms: float = 350.0,
    keep_silence_ms: float = 180.0,
    fade_ms: float = 12.0,
) -> np.ndarray:
    """Shorten internal pauses with crossfades (reference:
    zipvoice_compress_long_pauses, zipvoice-tts.h:97-104)."""
    wav = np.asarray(wav, np.float32)
    if wav.size == 0:
        return wav
    win = max(int(sample_rate * 0.01), 1)
    n_win = len(wav) // win
    if n_win == 0:
        return wav
    energy = np.sqrt(np.mean(wav[: n_win * win].reshape(n_win, win) ** 2, axis=1))
    thresh = max(float(np.max(energy)) * 0.03, 1e-5)
    silent = energy < thresh

    max_wins = int(max_silence_ms / 10)
    keep_wins = max(int(keep_silence_ms / 10), 1)
    fade = max(int(sample_rate * fade_ms / 1000), 1)

    out: list[np.ndarray] = []
    i = 0
    while i < n_win:
        if not silent[i]:
            out.append(wav[i * win : (i + 1) * win])
            i += 1
            continue
        j = i
        while j < n_win and silent[j]:
            j += 1
        run = j - i
        if run > max_wins and i > 0 and j < n_win:
            keep = wav[i * win : (i + keep_wins) * win].copy()
            # Crossfade the trim boundary.
            k = min(fade, len(keep))
            keep[-k:] *= np.linspace(1.0, 0.0, k, dtype=np.float32)
            nxt_start = j * win
            out.append(keep)
            lead_in = wav[nxt_start : nxt_start + k].copy()
            if len(lead_in):
                lead_in *= np.linspace(0.0, 1.0, len(lead_in), dtype=np.float32)
                out.append(lead_in)
                i = j + (k + win - 1) // win
                continue
        else:
            out.append(wav[i * win : j * win])
        i = j
    tail = wav[n_win * win :]
    if tail.size:
        out.append(tail)
    return np.concatenate(out) if out else wav
