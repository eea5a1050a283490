"""Train the diarization model pair on labeled multi-speaker audio.

The reference ships *trained* segmentation/embedding checkpoints fetched
from a CDN (reference: core/cpp-annote/README.md — the pyannote
community-1 pipeline) and manufactures its labeled diarization fixtures
by stitching distinct synthesized voices into one clip
(reference: scripts/generate-diarization-test-audio.py ->
test-assets/endgame_nagg_nell.wav, asserted in core/transcriber-test.cpp).

Zero egress forbids downloading the published checkpoints, so this module
is the training analog: given a few labeled single-speaker recordings it

- stitches labeled multi-speaker training windows (the reference's own
  fixture-manufacture trick, turned into a data pipeline),
- trains ``models/diarization.SegmentationModel`` with permutation-
  invariant powerset cross-entropy (the pyannote training objective for
  the powerset head),
- trains ``models/diarization.EmbeddingModel`` with an additive-margin
  softmax over speaker identities using the same masked attentive-stats
  pooling the diarizer calls at inference,
- fits a two-covariance PLDA from the labeled embeddings so the VBx
  clustering path (pipeline/vbx.py) runs with *matched* statistics.

tests/test_diarization_trained.py runs this end-to-end on the two real
voices in the reference's test assets and scores the full SpeakerDiarizer
with eval/der.py — the first measured diarization number in this repo.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.diarization import (
    FRAMES_PER_SECOND,
    MAX_LOCAL_SPEAKERS,
    MEL_HOP,
    POWERSET,
    SAMPLE_RATE,
    WINDOW_SAMPLES,
    embedding_forward,
    init_embedding_params,
    init_segmentation_params,
    segmentation_forward,
)
from ..pipeline.vbx import PldaModel

__all__ = [
    "voiced_crops",
    "stitch_conversation",
    "make_training_windows",
    "train_segmentation",
    "train_embedding",
    "fit_plda",
    "train_diarization_models",
]


# ---------------------------------------------------------------------------
# Data construction
# ---------------------------------------------------------------------------


def voiced_crops(
    audio: np.ndarray,
    crop_seconds: float = 1.0,
    hop_seconds: float = 0.5,
    energy_percentile: float = 40.0,
) -> np.ndarray:
    """[N, crop] energetic crops of one speaker's recording.

    A cheap energy gate stands in for VAD here: these fixtures are read
    speech, so dropping the quietest windows removes pauses.
    """
    crop = int(crop_seconds * SAMPLE_RATE)
    hop = int(hop_seconds * SAMPLE_RATE)
    audio = np.asarray(audio, np.float32)
    starts = range(0, max(len(audio) - crop, 0) + 1, hop)
    crops = np.stack([audio[s : s + crop] for s in starts]) if len(audio) >= crop else np.zeros((0, crop), np.float32)
    if len(crops) == 0:
        return crops
    rms = np.sqrt(np.mean(np.square(crops), axis=1))
    keep = rms >= np.percentile(rms, energy_percentile)
    return crops[keep]


class Conversation(NamedTuple):
    audio: np.ndarray  # [n_samples]
    turns: list[tuple[int, float, float]]  # (speaker, start_sec, end_sec)


def stitch_conversation(
    rng: np.random.Generator,
    crops_by_speaker: Sequence[np.ndarray],
    *,
    n_turns: int = 12,
    crops_per_turn: tuple[int, int] = (1, 3),
    gap_seconds: tuple[float, float] = (0.25, 0.7),
    lead_seconds: float = 0.4,
) -> Conversation:
    """Alternating-speaker conversation with known turn boundaries.

    The reference manufactures its diarization fixture exactly this way
    (scripts/generate-diarization-test-audio.py); here the voices are the
    two distinct real recordings instead of two ZipVoice speakers.
    """
    n_spk = len(crops_by_speaker)
    pieces: list[np.ndarray] = []
    turns: list[tuple[int, float, float]] = []
    t = lead_seconds
    pieces.append(np.zeros(int(lead_seconds * SAMPLE_RATE), np.float32))
    prev = -1
    for _ in range(n_turns):
        spk = int(rng.integers(n_spk))
        if spk == prev:
            spk = (spk + 1) % n_spk
        prev = spk
        k = int(rng.integers(crops_per_turn[0], crops_per_turn[1] + 1))
        idx = rng.integers(len(crops_by_speaker[spk]), size=k)
        seg = np.concatenate([crops_by_speaker[spk][i] for i in idx])
        pieces.append(seg)
        turns.append((spk, t, t + len(seg) / SAMPLE_RATE))
        t += len(seg) / SAMPLE_RATE
        gap = float(rng.uniform(*gap_seconds))
        pieces.append(np.zeros(int(gap * SAMPLE_RATE), np.float32))
        t += gap
    return Conversation(np.concatenate(pieces), turns)


def make_training_windows(
    rng: np.random.Generator,
    crops_by_speaker: Sequence[np.ndarray],
    n_windows: int,
    seg_frames: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Stitch labeled analysis windows.

    Returns ``windows [N, WINDOW_SAMPLES]`` and per-frame speaker
    activity ``activity [N, seg_frames, MAX_LOCAL_SPEAKERS]`` on the
    segmentation model's output grid.  Local slot = global speaker index
    (PIT during training makes the slot order immaterial).
    """
    n_spk = len(crops_by_speaker)
    windows = np.zeros((n_windows, WINDOW_SAMPLES), np.float32)
    activity = np.zeros((n_windows, seg_frames, MAX_LOCAL_SPEAKERS), np.float32)
    for w in range(n_windows):
        conv = stitch_conversation(
            rng,
            crops_by_speaker,
            n_turns=int(rng.integers(3, 7)),
            gap_seconds=(0.2, 0.9),
            lead_seconds=float(rng.uniform(0.0, 0.8)),
        )
        a = conv.audio[:WINDOW_SAMPLES]
        windows[w, : len(a)] = a
        for spk, start, end in conv.turns:
            if spk >= n_spk or start >= WINDOW_SAMPLES / SAMPLE_RATE:
                continue
            f0 = int(start * FRAMES_PER_SECOND)
            f1 = min(int(np.ceil(end * FRAMES_PER_SECOND)), seg_frames)
            activity[w, f0:f1, spk] = 1.0
    return windows, activity


# ---------------------------------------------------------------------------
# Segmentation training: permutation-invariant powerset cross-entropy
# ---------------------------------------------------------------------------


def _powerset_class_table() -> np.ndarray:
    """bitmask over MAX_LOCAL_SPEAKERS -> powerset class index.

    Masks not in the powerset (|s| > 2) map to the largest contained
    subset's class; the stitched data never produces them.
    """
    table = np.zeros(2 ** MAX_LOCAL_SPEAKERS, np.int32)
    index = {frozenset(s): i for i, s in enumerate(POWERSET)}
    for bits in range(2 ** MAX_LOCAL_SPEAKERS):
        active = frozenset(s for s in range(MAX_LOCAL_SPEAKERS) if bits >> s & 1)
        while active not in index:
            active = frozenset(sorted(active)[:-1])
        table[bits] = index[active]
    return table


def _pit_powerset_loss(params, windows, activity, class_table, perms):
    logits = segmentation_forward(params, windows)  # [B, T, C]
    logp = jax.nn.log_softmax(logits, axis=-1)
    weights = 2 ** jnp.arange(MAX_LOCAL_SPEAKERS, dtype=jnp.int32)

    def perm_loss(perm):
        y = activity[:, :, perm]
        bits = (y.astype(jnp.int32) * weights).sum(-1)  # [B, T]
        cls = class_table[bits]
        ce = -jnp.take_along_axis(logp, cls[..., None], axis=-1)[..., 0]
        return ce.mean(axis=1)  # [B]

    losses = jnp.stack([perm_loss(p) for p in perms])  # [P, B]
    return jnp.min(losses, axis=0).mean()


def train_segmentation(
    rng_key: jax.Array,
    crops_by_speaker: Sequence[np.ndarray],
    *,
    dim: int = 64,
    depth: int = 1,
    steps: int = 120,
    batch: int = 8,
    pool_windows: int = 32,
    lr: float = 2e-3,
    data_seed: int = 0,
) -> dict:
    """Train the powerset segmentation model on stitched labeled windows."""
    params = init_segmentation_params(rng_key, dim=dim, depth=depth)
    seg_frames = int(
        segmentation_forward(params, jnp.zeros((1, WINDOW_SAMPLES), jnp.float32)).shape[1]
    )
    nprng = np.random.default_rng(data_seed)
    windows, activity = make_training_windows(
        nprng, crops_by_speaker, pool_windows, seg_frames
    )
    windows_j = jnp.asarray(windows)
    activity_j = jnp.asarray(activity)
    class_table = jnp.asarray(_powerset_class_table())
    from itertools import permutations

    perms = [jnp.asarray(p, jnp.int32) for p in permutations(range(MAX_LOCAL_SPEAKERS))]

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, idx):
        loss, grads = jax.value_and_grad(_pit_powerset_loss)(
            params, windows_j[idx], activity_j[idx], class_table, perms
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    last = None
    for i in range(steps):
        idx = jnp.asarray(nprng.integers(pool_windows, size=batch))
        params, opt_state, last = step(params, opt_state, idx)
    return {"params": params, "final_loss": float(last)}


# ---------------------------------------------------------------------------
# Embedding training: additive-margin softmax with masked pooling
# ---------------------------------------------------------------------------


def _embedding_examples(
    rng: np.random.Generator,
    crops_by_speaker: Sequence[np.ndarray],
    n_windows: int,
    mel_frames: int,
    seg_frames: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(windows, frame_weights, labels) shaped exactly like the diarizer's
    embedding_fn call: full analysis windows + per-speaker mel masks."""
    windows, activity = make_training_windows(
        rng, crops_by_speaker, n_windows, seg_frames
    )
    xs, ws, ys = [], [], []
    for w in range(n_windows):
        for spk in range(len(crops_by_speaker)):
            act = activity[w, :, spk]
            if act.sum() / FRAMES_PER_SECOND < 0.4:
                continue
            mask = np.repeat(act, mel_frames // seg_frames + 1)[:mel_frames]
            xs.append(windows[w])
            ws.append(mask.astype(np.float32))
            ys.append(spk)
    if not xs:
        raise ValueError(
            "no (window, speaker) pair reached the 0.4 s activity "
            "threshold — the input recordings are too short or too "
            "quiet to mint embedding training examples"
        )
    return np.stack(xs), np.stack(ws), np.asarray(ys, np.int32)


def _contrastive_loss(state, windows, weights, labels, neg_margin=0.25):
    """Pairwise cosine push-pull on the L2-normalized embeddings.

    AHC clusters on *raw cosine distance* (pipeline/diarization.py::
    cluster_embeddings), so the training objective must shape that exact
    geometry: same-speaker pairs toward cos=1, different-speaker pairs
    below ``neg_margin``.  (A classifier-head softmax can reach zero loss
    while the embedding cloud stays collapsed around a common mode — the
    head reads the tiny discriminative component, AHC cannot.)
    """
    emb = embedding_forward(state["emb"], windows, weights)  # [B, 192] L2-normed
    cos = emb @ emb.T
    same = labels[:, None] == labels[None, :]
    off_diag = ~jnp.eye(len(labels), dtype=bool)
    pos_mask = (same & off_diag).astype(jnp.float32)
    neg_mask = (~same).astype(jnp.float32)
    pos = ((1.0 - cos) * pos_mask).sum() / jnp.maximum(pos_mask.sum(), 1.0)
    neg = (jax.nn.relu(cos - neg_margin) * neg_mask).sum() / jnp.maximum(
        neg_mask.sum(), 1.0
    )
    return pos + neg


def train_embedding(
    rng_key: jax.Array,
    crops_by_speaker: Sequence[np.ndarray],
    *,
    dim: int = 64,
    steps: int = 120,
    batch: int = 16,
    pool_windows: int = 24,
    lr: float = 2e-3,
    data_seed: int = 1,
) -> dict:
    """Train the speaker embedding with a pairwise contrastive objective."""
    kp, kprobe = jax.random.split(rng_key)
    mel_frames = WINDOW_SAMPLES // MEL_HOP + 1
    # Probe the segmentation net for its output frame count rather than
    # duplicating the DOWNSAMPLE math (train_segmentation does the same).
    seg_frames = int(
        segmentation_forward(
            init_segmentation_params(kprobe, dim=8, depth=1),
            jnp.zeros((1, WINDOW_SAMPLES), jnp.float32),
        ).shape[1]
    )
    nprng = np.random.default_rng(data_seed)
    xs, ws, ys = _embedding_examples(
        nprng, crops_by_speaker, pool_windows, mel_frames, seg_frames
    )
    state = {"emb": init_embedding_params(kp, dim=dim)}
    xs_j, ws_j, ys_j = jnp.asarray(xs), jnp.asarray(ws), jnp.asarray(ys)
    opt = optax.adam(lr)
    opt_state = opt.init(state)

    @jax.jit
    def step(state, opt_state, idx):
        loss, grads = jax.value_and_grad(_contrastive_loss)(
            state, xs_j[idx], ws_j[idx], ys_j[idx]
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(state, updates), opt_state, loss

    last = None
    for _ in range(steps):
        idx = jnp.asarray(nprng.integers(len(xs), size=batch))
        state, opt_state, last = step(state, opt_state, idx)
    return {
        "params": state["emb"],
        "final_loss": float(last),
        "examples": (xs, ws, ys),
    }


# ---------------------------------------------------------------------------
# PLDA fit from labeled embeddings (two-covariance model)
# ---------------------------------------------------------------------------


def fit_plda(
    embeddings: np.ndarray, labels: np.ndarray, lda_dim: int | None = None
) -> PldaModel:
    """Fit a two-covariance PLDA in the VBx wire convention.

    Simultaneous diagonalization of the between/within scatters via the
    generalized eigenproblem gives ``tr`` with ``tr W trᵀ = I`` and
    ``tr B trᵀ = diag(psi)`` — exactly the (tr, psi) pair
    PldaModel.from_arrays expects (reference: plda_vbx.cpp:120-156; the
    reference loads these arrays from Kaldi-trained npz files, here they
    come from the labeled training embeddings).
    """
    import scipy.linalg

    emb = np.asarray(embeddings, np.float64)
    labels = np.asarray(labels)
    d = emb.shape[1]
    mean1 = emb.mean(0)
    x = emb - mean1
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12) * np.sqrt(d)
    lda = np.eye(d)
    mean2 = np.zeros(d)
    y = x @ lda - mean2
    y = y / np.maximum(np.linalg.norm(y, axis=1, keepdims=True), 1e-12) * np.sqrt(d)

    classes = np.unique(labels)
    mu = y.mean(0)
    within = np.zeros((d, d))
    between = np.zeros((d, d))
    for c in classes:
        yc = y[labels == c]
        mc = yc.mean(0)
        within += (yc - mc).T @ (yc - mc)
        between += len(yc) * np.outer(mc - mu, mc - mu)
    within = within / len(y) + 1e-4 * np.eye(d)
    between = between / len(y) + 1e-6 * np.eye(d)

    evals, evecs = scipy.linalg.eigh(between, within)  # ascending
    order = np.argsort(evals)[::-1]
    tr = evecs.T[order]
    psi = np.maximum(evals[order], 1e-6)
    return PldaModel.from_arrays(mean1, mean2, lda, mu, tr, psi, lda_dim or d)


# ---------------------------------------------------------------------------
# Convenience driver
# ---------------------------------------------------------------------------


def train_diarization_models(
    rng_key: jax.Array,
    speaker_waves: Sequence[np.ndarray],
    *,
    seg_dim: int = 64,
    seg_depth: int = 1,
    emb_dim: int = 64,
    seg_steps: int = 120,
    emb_steps: int = 120,
) -> dict:
    """Train segmentation + embedding + PLDA from single-speaker waves."""
    crops = [voiced_crops(w) for w in speaker_waves]
    k1, k2 = jax.random.split(rng_key)
    seg = train_segmentation(
        k1, crops, dim=seg_dim, depth=seg_depth, steps=seg_steps
    )
    emb = train_embedding(k2, crops, dim=emb_dim, steps=emb_steps)
    xs, ws, ys = emb["examples"]
    trained_embs = np.asarray(embedding_forward(emb["params"], jnp.asarray(xs), jnp.asarray(ws)))
    plda = fit_plda(trained_embs, ys)
    return {
        "segmentation": seg["params"],
        "embedding": emb["params"],
        "plda": plda,
        "seg_loss": seg["final_loss"],
        "emb_loss": emb["final_loss"],
        "crops": crops,
    }
