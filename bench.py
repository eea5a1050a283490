"""Benchmark: live streaming service + batched offline decode on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-seconds/s", "vs_baseline": N}

HEADLINE (default --mode both): the multi-stream STREAMING service —
N concurrent live streams on one chip through serving.StreamingService
(masked frontend ingest + windowed encode + speculative verify + greedy
continue, ONE fused device program per update).  value = aggregate
audio-seconds ingested+transcribed per wall second (= streams x realtime).
``vs_baseline`` = reference post-phrase latency on Linux x86 for the same
arch DIVIDED by our p50 final-update latency (>1 = each stream's finals
land faster than the reference's single stream on a Linux x86 CPU —
BASELINE.md:25-27, reference README.md:194-199); the chip serves
``n_streams`` of them at once.  Extra keys carry p50/p95 update wall,
final-update latency, and the OFFLINE batched-decode numbers of round 1
(offline_*, with offline_vs_sol the fraction of the chip's analytic
speed-of-light for that workload).

HBM SAFETY: --mode both runs each measurement PHASE in its own
subprocess (offline, steady, churn, governed, trained) so device memory
is returned to the chip between phases — one process previously held the
B=512 offline decode, FOUR 64-stream medium service instantiations and a
600-step Adam overfit simultaneously and died RESOURCE_EXHAUSTED.  The
package-level persistent XLA compile cache makes the repeated warmups
cheap (identical shapes across phases hit the cache).

Weights are randomly initialized — compute is weight-independent, so
throughput is representative; speculative ACCEPTANCE is pessimistic with
random weights (hypotheses churn as streaming context grows), so the
streaming numbers are a worst-case floor, not a best case.  The trained
phase overfits the bench arch on the bench audio and reports MEASURED
acceptance both in-distribution (serving the training clip) and
off-distribution (serving held-out beckett.wav — real hypothesis drift).

Reference methodology mirrored: core/benchmark.cpp:94-105 (0.5 s update
interval, compute %% of audio, post-phrase latency on two_cities.wav).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp


# v5e (TPU v5 lite) single-chip peaks.
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_BPS = 819e9


def speed_of_light_seconds(cfg, batch: int, n_samples: int, max_tokens: int, bytes_per_el: int) -> float:
    """Analytic lower bound on pipeline wall time for this workload.

    Sums per-phase max(compute, memory) times:
      encode  — one pass over T_enc frames (FLOPs dominate at batch>=32);
      decode  — max_tokens sequential steps; each reads all decoder weights
                once (batch-amortized) plus the per-stream KV cache.
    Attention score FLOPs and small ops are included coarsely; the bound is
    deliberately optimistic (true speed of light, not an achievable target).
    """
    d = cfg.hidden_size
    ffn = cfg.intermediate_size
    t_enc = n_samples
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        t_enc = (t_enc - k) // s + 1

    # Encoder FLOPs per frame: qkvo (4d^2) + mlp (2*d*ffn), x2 for MAC.
    enc_flops_frame = 2 * (4 * d * d + 2 * d * ffn) * cfg.encoder_layers
    # Attention scores: 2 * T^2 * d per layer (both bmms), per batch elem.
    enc_attn_flops = 2 * 2 * t_enc * t_enc * d * cfg.encoder_layers
    # Frontend conv FLOPs (stage channels ~d): dominated by stage 1.
    conv_flops = 2 * n_samples * cfg.conv_kernels[0] * d // cfg.conv_strides[0]
    enc_flops = batch * (t_enc * enc_flops_frame + enc_attn_flops + conv_flops)
    enc_bytes = (4 * d * d + 2 * d * ffn) * cfg.encoder_layers * bytes_per_el
    t_encode = max(enc_flops / PEAK_FLOPS_BF16, enc_bytes / PEAK_HBM_BPS)

    # Decoder: per step, per batch elem: self qkvo 4d^2 + cross q,o 2d^2 +
    # swiglu 3*d*ffn; weights read once per step; KV read per elem.
    dec_params = (
        4 * d * d + 4 * d * d + 3 * d * ffn
    ) * cfg.decoder_layers + cfg.vocab_size * d
    step_flops = batch * 2 * dec_params
    kv_bytes_per_elem = (
        cfg.decoder_layers * (max_tokens + t_enc) * 2 * d * bytes_per_el
    )
    step_bytes = dec_params * bytes_per_el + batch * kv_bytes_per_elem
    t_decode = max_tokens * max(
        step_flops / PEAK_FLOPS_BF16, step_bytes / PEAK_HBM_BPS
    )
    return t_encode + t_decode


def offline_bench(args) -> dict:
    """Batched offline greedy decode (the round-1 headline workload)."""
    import numpy as np

    from moonshine_tpu.core.config import ARCHS
    from moonshine_tpu.decoding.greedy import greedy_decode
    from moonshine_tpu.models import moonshine as mm

    cfg = ARCHS[args.arch]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = mm.init_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(dtype), params)
    # static rotary pair-swap permutation folded into the weights once
    # (prepare_rotary_params) instead of per-step in-trace gathers
    params = mm.prepare_rotary_params(params, cfg)
    if args.w8a8:
        from moonshine_tpu.quant import quantize_tree_exec

        # int8 weights executed on the MXU int8 path (w8a8 dynamic — the
        # reference's ORT dynamic-quantization arithmetic); frontend and
        # embed stay float per the reference's policy.
        params = quantize_tree_exec(params)

    n_samples = int(16000 * args.duration)
    max_tokens = max(int(args.duration * cfg.max_tokens_per_second), 8)
    rng = jax.random.PRNGKey(1)
    audio = jax.random.normal(rng, (args.batch, n_samples), jnp.float32) * 0.1
    # Force full-length decode so timing is worst-case (no early EOS).
    caps = jnp.full((args.batch,), max_tokens, jnp.int32)

    encode = jax.jit(lambda p, a: mm.encode(p, cfg, a, attn_impl="auto"))

    if args.decode == "beam":
        from moonshine_tpu.decoding.beam import beam_decode

        def pipeline(params, audio):
            memory, mask = encode(params, audio)
            return beam_decode(
                params, cfg, memory, mask, beam_size=args.beam_size,
                max_tokens=max_tokens, token_caps=caps, kv_int8=args.kv_int8,
            )
    else:
        def pipeline(params, audio):
            memory, mask = encode(params, audio)
            return greedy_decode(
                params, cfg, memory, mask, max_tokens=max_tokens, token_caps=caps,
                kv_int8=args.kv_int8,
            )

    # Warmup / compile.  NOTE: through the axon relay block_until_ready does
    # not actually synchronize; a host transfer is the reliable fence.
    res = pipeline(params, audio)
    np.asarray(res.tokens)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        res = pipeline(params, audio)
        np.asarray(res.tokens)
        times.append(time.perf_counter() - t0)

    best = min(times)
    audio_seconds = args.batch * args.duration
    throughput = audio_seconds / best
    bytes_per_el = 2 if args.dtype == "bfloat16" else 4
    # Speed of light keeps the bf16 KV byte count even under --kv-int8 so
    # vs_sol stays comparable across configurations (int8 should CLOSE the
    # gap to the same bound, not move the bound).
    # Beam multiplies the per-step KV/compute by beam_size; scale the bound
    # so vs_sol stays an honest fraction for either decode.
    sol_batch = args.batch * (args.beam_size if args.decode == "beam" else 1)
    t_sol = speed_of_light_seconds(cfg, sol_batch, n_samples, max_tokens, bytes_per_el)
    kv_tag = (", int8 KV" if args.kv_int8 else "") + (
        ", w8a8 weights" if args.w8a8 else ""
    )
    decode_tag = (
        f"beam-{args.beam_size} decode" if args.decode == "beam" else "greedy decode"
    )
    return {
        "metric": f"audio-seconds/s, Moonshine {args.arch} batched {decode_tag} "
        f"(batch={args.batch}, {args.duration:.0f}s utterances, "
        f"{max_tokens} tokens, {args.dtype}{kv_tag}, 1 chip)",
        "value": round(throughput, 2),
        "unit": "audio-seconds/s",
        "vs_sol": round(best and t_sol / best, 4),
        "realtime_x": round(throughput, 1),
        "sol_seconds": round(t_sol, 4),
        "wall_seconds": round(best, 4),
    }


def spec_bench(args) -> dict:
    """Batched cross-model speculative decoding (BASELINE config 4; mirrors
    the reference's greedy-vs-speculative comparison,
    core/speculative-decode-bench.cpp:1-6).

    With random weights the tiny draft and base verifier are two unrelated
    models, so acceptance ~= 0 — that run is the FLOOR.  The CEILING uses
    the verify model as its own draft (acceptance = 1), measuring the fused
    verify+rollback+continue machinery at full acceptance.  A trained
    draft/verify pair lands between the two (the reference measured 103->74
    ms on Medium Streaming with its real pair, CHANGELOGS.md:11).
    """
    import numpy as np

    from moonshine_tpu.core.config import ARCHS
    from moonshine_tpu.decoding.greedy import greedy_decode
    from moonshine_tpu.decoding.speculative import speculative_decode_batched
    from moonshine_tpu.models import moonshine as mm

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    vcfg, dcfg = ARCHS["base"], ARCHS["tiny"]
    vparams = jax.tree.map(lambda x: x.astype(dtype), mm.init_params(vcfg, jax.random.PRNGKey(0)))
    dparams = jax.tree.map(lambda x: x.astype(dtype), mm.init_params(dcfg, jax.random.PRNGKey(1)))

    B = min(args.batch, 32)  # spec decode compiles 2 models; keep it modest
    n_samples = int(16000 * args.duration)
    max_tokens = max(int(args.duration * vcfg.max_tokens_per_second), 8)
    audio = jax.random.normal(jax.random.PRNGKey(2), (B, n_samples), jnp.float32) * 0.1
    caps = jnp.full((B,), max_tokens, jnp.int32)

    venc = jax.jit(lambda p, a: mm.encode(p, vcfg, a, attn_impl="auto"))
    denc = jax.jit(lambda p, a: mm.encode(p, dcfg, a, attn_impl="auto"))
    vmem, vmask = venc(vparams, audio)
    dmem, dmask = denc(dparams, audio)
    np.asarray(vmem[0, 0, :2]); np.asarray(dmem[0, 0, :2])

    def time_fn(fn):
        out = fn()
        np.asarray(out.tokens)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out.tokens)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_greedy = time_fn(lambda: greedy_decode(
        vparams, vcfg, vmem, vmask, max_tokens=max_tokens, token_caps=caps))
    t_floor = time_fn(lambda: speculative_decode_batched(
        dparams, dcfg, vparams, vcfg, dmem, dmask, vmem, vmask,
        gamma=4, max_tokens=max_tokens, token_caps=caps))
    t_ceil = time_fn(lambda: speculative_decode_batched(
        vparams, vcfg, vparams, vcfg, vmem, vmask, vmem, vmask,
        gamma=4, max_tokens=max_tokens, token_caps=caps))
    return {
        "metric": f"speculative decode vs greedy (tiny-draft/base-verify, "
        f"batch={B}, {max_tokens} tokens, {args.dtype}, 1 chip)",
        "value": round(t_greedy / t_ceil, 3),
        "unit": "speedup-x (acceptance=1 ceiling)",
        "vs_baseline": round(t_greedy / t_ceil, 3),
        "greedy_ms": round(t_greedy * 1000, 1),
        "spec_floor_ms_random_weights": round(t_floor * 1000, 1),
        "spec_ceiling_ms_full_acceptance": round(t_ceil * 1000, 1),
        "note": "trained draft/verify pairs land between floor and ceiling",
    }


def spec_trained_bench(args) -> dict:
    """Trained-pair batched speculative decoding at bench scale (BASELINE
    config 4 as a measured configuration, not a ceiling).

    Loads the draft/verify pair the ``spec-train`` phase overfit on the
    bench audio (the protocol of tests/test_train_overfit.py::
    test_speculative_cross_model_trained_pair scaled to real dims), then
    measures on one chip, B lanes of real speech:

      * the verifier's own greedy decode (natural EOS at the ~60-token
        transcripts the labels fill — same token count as the forced-cap
        greedy headline), and
      * ``speculative_decode_batched`` with the trained draft — greedy
        acceptance, so output tokens are bit-identical to the verifier's
        greedy decode; MEASURED acceptance comes from the trained pair.

    Also runs the same pair on held-out beckett.wav windows (never seen
    in training) for the off-distribution acceptance floor.
    Reference: core/speculative-decode-bench.cpp:1-6 (greedy vs
    speculative decoder time), CHANGELOGS.md:11 (103 -> 74 ms from
    speculative decoding on the real pair).
    """
    import numpy as np

    from moonshine_tpu.core.config import ARCHS
    from moonshine_tpu.decoding.greedy import greedy_decode
    from moonshine_tpu.decoding.speculative import speculative_decode_batched
    from moonshine_tpu.models import moonshine as mm
    from moonshine_tpu.train.checkpoint import import_safetensors

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    vcfg = ARCHS[args.arch]
    dcfg = _spec_draft_cfg(args)
    vparams = import_safetensors(
        _SPEC_VERIFY_WEIGHTS, mm.init_params(vcfg, jax.random.PRNGKey(0)))
    dparams = import_safetensors(
        _SPEC_DRAFT_WEIGHTS, mm.init_params(dcfg, jax.random.PRNGKey(1)))
    vparams = jax.tree.map(lambda x: x.astype(dtype), vparams)
    dparams = jax.tree.map(lambda x: x.astype(dtype), dparams)
    vparams = mm.prepare_rotary_params(vparams, vcfg)
    dparams = mm.prepare_rotary_params(dparams, dcfg)

    B = args.batch
    windows, _ = _offline_training_windows(args.duration)
    n_samples = windows.shape[1]
    audio = jnp.asarray(np.stack([windows[i % len(windows)]
                                  for i in range(B)]))
    max_tokens = max(int(args.duration * vcfg.max_tokens_per_second), 8)
    gamma = args.spec_gamma

    venc = jax.jit(lambda p, a: mm.encode(p, vcfg, a, attn_impl="auto"))
    denc = jax.jit(lambda p, a: mm.encode(p, dcfg, a, attn_impl="auto"))

    def time_fn(fn):
        out = fn()
        np.asarray(out.tokens)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out.tokens)
            times.append(time.perf_counter() - t0)
        return min(times), out

    # End-to-end pipelines (encode included), mirroring offline_bench.
    def greedy_pipe():
        vmem, vmask = venc(vparams, audio)
        return greedy_decode(vparams, vcfg, vmem, vmask,
                             max_tokens=max_tokens, kv_int8=args.kv_int8)

    def spec_pipe():
        vmem, vmask = venc(vparams, audio)
        dmem, dmask = denc(dparams, audio)
        return speculative_decode_batched(
            dparams, dcfg, vparams, vcfg, dmem, dmask, vmem, vmask,
            gamma=gamma, max_tokens=max_tokens, kv_int8=args.kv_int8)

    t_greedy, g = time_fn(greedy_pipe)
    t_spec, s = time_fn(spec_pipe)
    g_tokens = np.asarray(g.tokens)
    s_tokens = np.asarray(s.tokens)
    match = float((g_tokens == s_tokens).mean())
    lengths = np.asarray(s.lengths)
    accepted = np.asarray(s.accepted_draft_tokens)
    acceptance = float(accepted.sum() / max(lengths.sum(), 1))

    # Held-out audio (never trained on): off-distribution acceptance.
    ho_tiled, ho_base = _load_bench_audio(_BECKETT)
    ho = jnp.asarray(np.stack([
        ho_tiled[(i % 12) * ho_base // 12:][:n_samples] for i in range(B)
    ]))

    def spec_ho():
        vmem, vmask = venc(vparams, ho)
        dmem, dmask = denc(dparams, ho)
        return speculative_decode_batched(
            dparams, dcfg, vparams, vcfg, dmem, dmask, vmem, vmask,
            gamma=gamma, max_tokens=max_tokens, kv_int8=args.kv_int8)

    t_ho, sh = time_fn(spec_ho)
    ho_len = np.asarray(sh.lengths)
    ho_acc = float(np.asarray(sh.accepted_draft_tokens).sum()
                   / max(ho_len.sum(), 1))

    audio_seconds = B * args.duration
    bytes_per_el = 2 if args.dtype == "bfloat16" else 4
    t_sol = speed_of_light_seconds(vcfg, B, n_samples, max_tokens, bytes_per_el)
    return {
        "metric": f"audio-seconds/s, {dcfg.name}-draft/{vcfg.name}-verify "
        f"TRAINED-PAIR speculative decode (batch={B}, "
        f"{args.duration:.0f}s utterances, gamma={gamma}, {args.dtype}, "
        f"1 chip)",
        "value": round(audio_seconds / t_spec, 2),
        "unit": "audio-seconds/s",
        "vs_sol": round(t_sol / t_spec, 4),
        "acceptance": round(acceptance, 4),
        "speedup_vs_greedy_x": round(t_greedy / t_spec, 3),
        "greedy_trained_value": round(audio_seconds / t_greedy, 2),
        "greedy_trained_vs_sol": round(t_sol / t_greedy, 4),
        "token_match_vs_greedy": round(match, 4),
        "mean_tokens": round(float(lengths.mean()), 1),
        "rounds": int(s.rounds),
        "heldout_value": round(audio_seconds / t_ho, 2),
        "heldout_acceptance": round(ho_acc, 4),
        "heldout_mean_tokens": round(float(ho_len.mean()), 1),
        "wall_seconds": round(t_spec, 4),
    }


# Reference post-phrase latency on Linux x86 CPU for each streaming arch
# (BASELINE.md:25-27 / reference README.md:194-199, two_cities.wav); the
# MacBook Pro M-series column is carried for the stretch comparison.
REF_FINAL_LATENCY_MS = {
    "tiny_streaming": {"linux_x86": 69.0, "macbook": 32.0},
    "small_streaming": {"linux_x86": 165.0, "macbook": 49.0},
    "medium_streaming": {"linux_x86": 269.0, "macbook": 74.0},
}


_TOKENIZER_BIN = ("/root/reference/language-bindings/python/src/"
                  "moonshine_voice/assets/tiny-en/tokenizer.bin")
_TWO_CITIES = "/root/reference/test-assets/two_cities_16k.wav"
_BECKETT = "/root/reference/test-assets/beckett.wav"
# hand-off file between the train-weights and trained phases
_TRAINED_WEIGHTS = "/tmp/moonshine_bench_trained_weights.safetensors"
# hand-off files between the spec-train and spec phases
_SPEC_VERIFY_WEIGHTS = "/tmp/moonshine_bench_spec_verify.safetensors"
_SPEC_DRAFT_WEIGHTS = "/tmp/moonshine_bench_spec_draft.safetensors"

# Dickens ch.1 running text (public domain) — labels for the offline
# trained-pair protocol; windows take ~45 consecutive words each so the
# transcripts FILL the 6.5 tok/s budget (decode length matches the
# forced-cap greedy headline instead of ending in an early EOS).
_TALE_TEXT = (
    "It was the best of times, it was the worst of times, it was the age "
    "of wisdom, it was the age of foolishness, it was the epoch of belief, "
    "it was the epoch of incredulity, it was the season of Light, it was "
    "the season of Darkness, it was the spring of hope, it was the winter "
    "of despair, we had everything before us, we had nothing before us, we "
    "were all going direct to Heaven, we were all going direct the other "
    "way, in short, the period was so far like the present period, that "
    "some of its noisiest authorities insisted on its being received, for "
    "good or for evil, in the superlative degree of comparison only."
)


def _spec_draft_cfg(args):
    """Draft arch for the trained-pair speculative phase: the published
    tiny (BASELINE config 4's tiny-draft/base-verify), or a half-tiny
    'nano' draft — cheaper proposals at the same shared 32768 vocab."""
    from moonshine_tpu.core.config import ARCHS, MoonshineArchConfig

    if args.spec_draft == "tiny":
        return ARCHS["tiny"]
    if args.spec_draft == "pico":
        return MoonshineArchConfig(
            name="pico", hidden_size=96, intermediate_size=384,
            encoder_layers=2, decoder_layers=2, encoder_heads=4,
            decoder_heads=4, encoder_kv_heads=4, decoder_kv_heads=4,
        )
    return MoonshineArchConfig(
        name="nano", hidden_size=144, intermediate_size=576,
        encoder_layers=3, decoder_layers=3, encoder_heads=4,
        decoder_heads=4, encoder_kv_heads=4, decoder_kv_heads=4,
    )


def _offline_training_windows(duration: float, n_examples: int = 12):
    """``n_examples`` distinct real-speech windows of ``duration`` seconds
    spread across the two_cities clip, plus per-window label token lists
    that fill the per-utterance token budget."""
    import numpy as np

    tiled, base_len = _load_bench_audio()
    n = int(16000 * duration)
    windows = np.stack([
        tiled[k * base_len // n_examples:][:n] for k in range(n_examples)
    ])
    return windows, base_len


def _offline_training_batch(cfg, duration: float, n_examples: int = 12):
    """Teacher-forced batch for the offline trained-pair protocol."""
    import numpy as np

    from moonshine_tpu.core.tokenizer import BinTokenizer
    from moonshine_tpu.train import step as ts

    tok = BinTokenizer.from_file(_TOKENIZER_BIN)
    windows, _ = _offline_training_windows(duration, n_examples)
    budget = max(int(duration * cfg.max_tokens_per_second) - 2, 4)
    words = _TALE_TEXT.split()
    labels = []
    for k in range(n_examples):
        start = (k * 9) % len(words)
        text, toks = "", []
        for j in range(len(words)):
            cand = (text + " " + words[(start + j) % len(words)]).strip()
            cand_toks = tok.text_to_tokens(cand)
            if len(cand_toks) > budget:
                break
            text, toks = cand, cand_toks
        labels.append(list(toks))

    s_max = max(len(t) for t in labels) + 1
    B = n_examples
    batch = ts.Batch(
        audio=jnp.asarray(windows, jnp.float32),
        audio_lengths=jnp.full((B,), windows.shape[1], jnp.int32),
        tokens_in=jnp.asarray(np.stack([
            np.pad([cfg.decoder_start_token_id] + t, (0, s_max - len(t) - 1))
            for t in labels
        ]), jnp.int32),
        tokens_out=jnp.asarray(np.stack([
            np.pad(t + [cfg.eos_token_id], (0, s_max - len(t) - 1))
            for t in labels
        ]), jnp.int32),
        token_mask=jnp.asarray(np.stack([
            np.arange(s_max) <= len(t) for t in labels
        ])),
    )
    return batch


def _train_offline_model(cfg, batch, steps: int, seed: int):
    """Overfit one offline Moonshine model on the bench windows."""
    import optax

    from moonshine_tpu.train import step as ts

    opt = optax.adam(2e-3)
    state = ts.init_train_state(cfg, opt, jax.random.PRNGKey(seed))
    train_step = ts.make_train_step(cfg, opt)
    t0 = time.perf_counter()
    loss = float("inf")
    for i in range(steps):
        state, metrics = train_step(state, batch)
        if (i + 1) % 25 == 0:
            loss = float(metrics["loss"])
            if loss < 0.02:
                break
    return state.params, float(metrics["loss"]), i + 1, time.perf_counter() - t0


def _train_streaming_weights(cfg, audio, steps=600, clip_seconds=2.56,
                             n_clips=12, seed=0):
    """Overfit the bench arch on the bench audio itself (the looped
    two_cities clip every stream replays), so the service bench can run
    with REAL trained weights: hypotheses stabilize because the model
    knows the audio, exactly the steady state the reference's speculative
    design assumes (moonshine-streaming-model.cpp:1244-1316)."""
    import optax

    from moonshine_tpu.core.tokenizer import BinTokenizer
    from moonshine_tpu.models import streaming as ms
    from moonshine_tpu.train.streaming_step import make_batched_overfit_step

    tok = BinTokenizer.from_file(_TOKENIZER_BIN)
    phrases = [
        "it was the best of times", "it was the worst of times",
        "it was the age of wisdom", "it was the age of foolishness",
        "it was the epoch of belief", "it was the epoch of incredulity",
        "it was the season of light", "it was the season of darkness",
        "it was the spring of hope", "it was the winter of despair",
        "we had everything before us", "we had nothing before us",
    ]
    n = int(clip_seconds * 16000) // cfg.frame_len * cfg.frame_len
    budget = int(clip_seconds * 6.5) - 2
    examples = []
    for k in range(n_clips):
        clip = audio[k * n:(k + 1) * n]
        if len(clip) < n:
            break
        phrase = phrases[k % len(phrases)]
        toks = tok.text_to_tokens(phrase)
        while len(toks) > budget:
            phrase = phrase.rsplit(" ", 1)[0]
            toks = tok.text_to_tokens(phrase)
        s_len = len(toks) + 1
        examples.append((
            jnp.asarray(clip, jnp.float32),
            jnp.asarray([cfg.bos_id] + list(toks), jnp.int32),
            jnp.asarray(list(toks) + [cfg.eos_id], jnp.int32),
            jnp.ones((s_len,), bool),
        ))
    opt = optax.adam(2e-3)
    params = ms.init_params(cfg, jax.random.PRNGKey(seed))
    opt_state = opt.init(params)
    step = make_batched_overfit_step(cfg, opt, examples)
    t0 = time.perf_counter()
    loss = float("inf")
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if (i + 1) % 25 == 0 and float(loss) < 0.02:
            break
    # Release the optimizer state (2x params of HBM) before the caller
    # instantiates the serving state on the same chip.
    del opt_state
    return params, float(loss), time.perf_counter() - t0, i + 1


def _load_bench_audio(path=_TWO_CITIES, min_seconds=200.0):
    """Load a clip and tile it to at least ``min_seconds``.

    Returns (tiled, base_len): ``base_len`` is the untiled clip length in
    samples — stream start offsets are spread across ONE clip period so
    force-splits stagger instead of landing in lockstep.
    """
    import numpy as np

    from moonshine_tpu.audio.wav import load_wav

    try:
        audio, sr = load_wav(path)
        if sr != 16000:
            from moonshine_tpu.audio.resample import resample

            audio = resample(audio, sr, 16000)
        audio = np.asarray(audio, np.float32)
    except Exception:
        audio = (np.random.RandomState(0).randn(16000 * 44) * 0.1).astype(
            np.float32)
    tile = max(4, int(np.ceil(min_seconds * 16000 / len(audio))))
    return np.concatenate([audio] * tile), len(audio)


class _ServiceHarness:
    """Shared setup for the streaming-service phases.

    Builds config/params once; ``measure`` constructs the service, runs
    the timed update loop and DROPS the service before returning, so one
    process can run two measurements back-to-back (e.g. the trained
    phase's in-distribution + held-out passes) without accumulating HBM.
    """

    def __init__(self, args, streams=None, cohorts=None, seg_seconds=None,
                 mem_bucket=None):
        from moonshine_tpu.core.config import STREAMING_ARCHS
        from moonshine_tpu.models import streaming as ms

        self.args = args
        self.cfg = STREAMING_ARCHS[args.streaming_arch]
        self.dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        self.params = ms.init_params(self.cfg, jax.random.PRNGKey(0))
        self.S = streams if streams is not None else args.streams
        self.K = cohorts if cohorts is not None else args.cohorts
        self.seg_seconds = seg_seconds if seg_seconds is not None else 15.0
        self.update_frames = 128  # 0.64 s — one ENC_STEP per pass
        self.step = self.update_frames * self.cfg.frame_len
        if mem_bucket is not None:
            self.mem_bucket = mem_bucket
        else:
            # Segment cap -> memory frames (200 frames/s of audio through
            # the 8x frontend), 128-rounded with ENC_STEP slack.
            frames = int(self.seg_seconds * 16000 / self.cfg.frame_len)
            self.mem_bucket = (frames + 127) // 128 * 128 + 128
        self.draft_cap = 128  # >= 6.5 tok/s * 15 s
        self.tiled, self.base_len = _load_bench_audio()
        self.vad = None
        if args.vad:
            from moonshine_tpu.models.vad import TinyVad

            # Real TinyVadCNN weights from the reference tree: live VAD
            # segmentation in the service (BASELINE config 3), one extra
            # batched device call per tick.
            self.vad = TinyVad.from_onnx(
                "/root/reference/micro/models/tinyvad_cnn_speech_mel.onnx"
            )

    def stable_params(self):
        """Stable-hypothesis twin: zero ONLY the cross-attn output weight
        leaf (same pytree structure, same arithmetic, memory-independent
        decode)."""
        p = self.params
        new_o = dict(p["decoder"]["layers"]["cross_attn"]["o"])
        new_o["w"] = jnp.zeros_like(new_o["w"])
        new_ca = dict(p["decoder"]["layers"]["cross_attn"], o=new_o)
        new_lay = dict(p["decoder"]["layers"], cross_attn=new_ca)
        new_dec = dict(p["decoder"], layers=new_lay)
        return dict(p, decoder=new_dec)

    def measure(self, p, source=None, track_acceptance=False,
                governor=None, diar=False) -> dict:
        import numpy as np

        from moonshine_tpu.serving import (ShardedStreamingService,
                                           StreamingService)

        diar_ms: list[float] = []
        if diar:
            # Speaker-embedding + segmentation batched ALONGSIDE the ASR
            # service on the same chip (BASELINE config 5; reference:
            # core/speaker-diarizer.h:36-51): every other update period
            # each stream's last 10 s window (pipeline/diarization.py
            # WINDOW_SECONDS) goes through segmentation activations and
            # the speaker embedder as ONE batched call — a ~1.28 s
            # per-stream cadence vs the reference's 1.0 s analyze cadence.
            from moonshine_tpu.models import diarization as dm

            seg_params = dm.init_segmentation_params(jax.random.PRNGKey(3))
            emb_params = dm.init_embedding_params(jax.random.PRNGKey(4))
            diar_w = int(10.0 * 16000)
            # Device-side rolling 10 s windows per cohort: only the NEW
            # 1.28 s of audio crosses the host->device boundary per
            # analysis pass (a full-window upload measures 519 ms through
            # the axon relay vs 8.4 ms of actual seg+emb compute).
            diar_bufs: dict = {}

            @jax.jit
            def _diar_pass(sp, ep, buf, new):
                # ONE device program per pass: roll + segmentation +
                # embedding (3 separate dispatches each pay the relay's
                # ~20 ms round trip).
                buf = jnp.roll(buf, -new.shape[1], axis=1)
                buf = buf.at[:, -new.shape[1]:].set(new)
                return buf, dm.segmentation_activations(sp, buf), \
                    dm.embedding_forward(ep, buf)

        args, cfg, S, K = self.args, self.cfg, self.S, self.K
        step, seg_seconds = self.step, self.seg_seconds
        if source is None:
            tiled, base_len = self.tiled, self.base_len
        else:
            tiled, base_len = source
        offsets = [int(i * base_len / S) for i in range(S)]
        period = int(seg_seconds * 16000)

        if args.w8a8:
            from moonshine_tpu.quant import quantize_tree_exec

            p = quantize_tree_exec(p)
        kw = dict(
            update_frames=self.update_frames, mem_bucket=self.mem_bucket,
            draft_cap=self.draft_cap, max_segment_seconds=seg_seconds,
            compute_dtype=self.dtype, kv_int8=args.kv_int8, vad=self.vad,
        )
        if K > 1:
            # Staggered cohorts: tick one S/K-stream device program per
            # call — every stream keeps the S/K-level update latency while
            # the chip serves all S (serving.ShardedStreamingService).
            svc = ShardedStreamingService(
                p, cfg, tokenizer=None, n_streams=S, n_cohorts=K, **kw
            )
        else:
            svc = StreamingService(p, cfg, tokenizer=None, n_streams=S, **kw)
        svc.warmup()  # compiles once; sibling cohorts hit the jit cache
        cursors = list(offsets)

        def feed(slot: int, n: int) -> None:
            c = cursors[slot]
            svc.add_audio(slot, tiled[c : c + n])
            cursors[slot] = c + n

        # Stagger: pre-fill slot i with i/S of a segment period so
        # force-splits spread over updates instead of landing in lockstep.
        for i in range(S):
            feed(i, (i * period // S) // step * step)
        # Drain the pre-fill backlog without timing it.
        for _ in range(int(seg_seconds / 0.64) + 4):
            if K > 1:
                svc.update_all()
            else:
                svc.update()

        def diar_tick(lo: int, hi: int) -> float:
            """One batched segmentation+embedding pass over streams
            [lo, hi)'s last 10 s; returns its wall ms.  The window lives
            on device; only the new audio since the last pass uploads."""
            t0 = time.perf_counter()
            new_n = 2 * step  # 1.28 s: every-other-period cadence
            chunk = np.zeros((hi - lo, new_n), np.float32)
            for j, i in enumerate(range(lo, hi)):
                c0 = max(cursors[i] - new_n, 0)
                seg = tiled[c0:cursors[i]]
                chunk[j, new_n - len(seg):] = seg
            buf = diar_bufs.get(lo)
            if buf is None:
                buf = jnp.zeros((hi - lo, diar_w), jnp.float32)
            buf, acts, embs = _diar_pass(seg_params, emb_params, buf,
                                         jnp.asarray(chunk))
            diar_bufs[lo] = buf
            np.asarray(embs[:1])
            return (time.perf_counter() - t0) * 1000.0

        if diar:
            diar_tick(0, S // K)  # compile outside the timed loop

        update_ms: list[float] = []
        final_ms: list[float] = []
        n_finals = 0
        acc_num = acc_den = 0
        t_bench0 = time.perf_counter()
        for u in range(args.updates):
            # One full update period: feed + tick each cohort in turn (the
            # K=1 path is the same loop with a single all-streams cohort).
            for c in range(K):
                for i in range(c * S // K, (c + 1) * S // K):
                    feed(i, step)
                sub = svc.cohorts[c] if K > 1 else svc
                if track_acceptance:
                    drafts = [list(sl.tokens) for sl in sub.slots]
                decode = True
                if governor is not None:
                    decode = governor.decode_this_tick()
                t0 = time.perf_counter()
                if K > 1:
                    events = svc.update(cohort=c, decode_tick=decode)
                else:
                    events = svc.update(decode_tick=decode)
                dt = (time.perf_counter() - t0) * 1000.0
                if governor is not None:
                    governor.record(dt)
                if track_acceptance and decode:
                    # Accepted prefix of the previous hypothesis (the
                    # speculative draft) in the new decode — the measured
                    # acceptance rate the stable-hypothesis surrogate
                    # stands in for.
                    for sl, old in zip(sub.slots, drafts):
                        if not old:
                            continue
                        new = sl.tokens
                        k_pref = 0
                        for a, b in zip(old, new):
                            if a != b:
                                break
                            k_pref += 1
                        acc_num += k_pref
                        acc_den += len(old)
                update_ms.append(dt)
                if diar and (u + c) % 2 == 0:
                    diar_ms.append(diar_tick(c * S // K, (c + 1) * S // K))
                finals = [e for e in events if e.is_final]
                if finals:
                    final_ms.append(dt)
                    n_finals += len(finals)
        total_wall = time.perf_counter() - t_bench0

        audio_seconds = S * args.updates * step / 16000.0
        p50 = float(np.percentile(update_ms, 50))
        p50_final = float(np.percentile(final_ms, 50)) if final_ms else p50
        out = {
            "agg": audio_seconds / total_wall,
            "p50": p50,
            "p95": float(np.percentile(update_ms, 95)),
            "p50_final": p50_final,
            "n_final_updates": len(final_ms),
            "n_finals": n_finals,
        }
        if track_acceptance:
            out["acceptance"] = acc_num / max(acc_den, 1)
        if diar:
            out["diar_p50_added_ms"] = float(np.percentile(diar_ms, 50))
            out["diar_calls"] = len(diar_ms)
        if governor is not None:
            out["backoff"] = governor.backoff
        # Drop the service's device state before returning (a second
        # measure() in the same process starts from a clean chip; the jit
        # cache keeps the compiled programs).
        del svc
        return out


def streaming_phase(args, phase: str) -> dict:
    """Run ONE streaming-service measurement in this process."""
    if phase == "latency":
        # Latency-floor configuration (reference headline metric:
        # single-stream post-phrase latency on two_cities,
        # README.md:192-199, methodology core/benchmark.cpp:94-105):
        # ONE stream, 5 s segments, the TRAINED weights of the
        # train-weights phase (so speculative verify mostly accepts —
        # the reference's speculative-on default), p50 wall of the
        # updates that deliver a final.
        from moonshine_tpu.train.checkpoint import import_safetensors

        largs = argparse.Namespace(**vars(args))
        largs.updates = max(args.updates, 200)  # S=1 ticks are cheap;
        # ~25 finals at 5 s segments make the percentile meaningful
        h = _ServiceHarness(largs, streams=1, cohorts=1, seg_seconds=5.0)
        t_params = import_safetensors(_TRAINED_WEIGHTS, h.params)
        out = h.measure(t_params, track_acceptance=True)
        # Scaling point: S=8 in 8 single-stream cohorts — every stream
        # keeps the one-stream latency while the chip serves eight
        # (measured p50 ~29 ms vs the reference's 74 ms best-machine
        # single stream; per-period wall 8 ticks << the 640 ms budget).
        largs.updates = 120
        h8 = _ServiceHarness(largs, streams=8, cohorts=8, seg_seconds=5.0)
        s8 = h8.measure(import_safetensors(_TRAINED_WEIGHTS, h8.params),
                        track_acceptance=True)
        out.update({f"s8_{k}": v for k, v in s8.items()})
        return out
    if phase == "diar":
        h = _ServiceHarness(args)
        return h.measure(h.stable_params(), diar=True)
    h = _ServiceHarness(args)
    if phase == "steady":
        return h.measure(h.stable_params())
    if phase == "churn":
        return h.measure(h.params)
    if phase == "governed":
        from moonshine_tpu.serving import ServiceGovernor

        gov = ServiceGovernor(update_period_s=h.step / 16000.0,
                              n_cohorts=h.K)
        return h.measure(h.params, governor=gov)
    if phase == "train-weights":
        # Training runs in ITS OWN process: the 600-step Adam arena for
        # the 245M-class arch plus a 64-stream service exceed one chip's
        # HBM together (round-3/4 RESOURCE_EXHAUSTED); weights round-trip
        # through disk so the serving phase starts on an empty chip.
        from moonshine_tpu.train.checkpoint import export_safetensors

        t_params, t_loss, t_train_s, t_steps = _train_streaming_weights(
            h.cfg, h.tiled)
        export_safetensors(_TRAINED_WEIGHTS, t_params)
        return {"loss": t_loss, "train_s": t_train_s, "steps": t_steps}
    if phase == "trained":
        # REAL trained weights (train-weights phase) on the same looped
        # speech: measured acceptance replaces the stable-hypothesis
        # surrogate (VERDICT r2 item 4); then the SAME weights serve
        # held-out beckett.wav — off-distribution acceptance with real
        # hypothesis drift, governor active (VERDICT r3 item 5).
        from moonshine_tpu.train.checkpoint import import_safetensors

        t_params = import_safetensors(_TRAINED_WEIGHTS, h.params)
        out = h.measure(t_params, track_acceptance=True)
        from moonshine_tpu.serving import ServiceGovernor

        heldout = _load_bench_audio(_BECKETT)
        gov = ServiceGovernor(update_period_s=h.step / 16000.0,
                              n_cohorts=h.K)
        ho = h.measure(t_params, source=heldout, track_acceptance=True,
                       governor=gov)
        out.update({f"heldout_{k}": v for k, v in ho.items()})
        return out
    raise ValueError(phase)


def spec_train_phase(args) -> dict:
    """Overfit the draft/verify pair for the trained-pair speculative
    phase (the bench's train-weights protocol at offline dims); weights
    round-trip through disk so the measuring phase starts on an empty
    chip."""
    from moonshine_tpu.core.config import ARCHS
    from moonshine_tpu.train.checkpoint import export_safetensors

    vcfg = ARCHS[args.arch]
    dcfg = _spec_draft_cfg(args)
    batch = _offline_training_batch(vcfg, args.duration)
    vparams, vloss, vsteps, vwall = _train_offline_model(
        vcfg, batch, args.spec_steps, seed=0)
    export_safetensors(_SPEC_VERIFY_WEIGHTS, vparams)
    del vparams
    # The draft gets extra steps: it must MATCH the verifier's argmax
    # stream, and the smaller model converges slower per step.
    dparams, dloss, dsteps, dwall = _train_offline_model(
        dcfg, batch, args.spec_steps * 2, seed=1)
    export_safetensors(_SPEC_DRAFT_WEIGHTS, dparams)
    return {"verify_loss": round(vloss, 4), "verify_steps": vsteps,
            "draft_loss": round(dloss, 4), "draft_steps": dsteps,
            "train_s": round(vwall + dwall, 1)}


_PHASE_TIMEOUT_S = {"offline": 1800, "offline-beam": 1800, "steady": 1800,
                    "churn": 1800, "governed": 1800, "diar": 1800,
                    "train-weights": 3600, "trained": 1800,
                    "latency": 1800, "spec-train": 3600, "spec": 2400}


def _phase_argv(args, phase: str) -> list[str]:
    argv = [sys.executable, os.path.abspath(__file__), "--phase", phase]
    for k in ("arch", "batch", "duration", "iters", "dtype",
              "streaming-arch", "streams", "cohorts", "updates", "decode",
              "beam-size", "beam-batch", "spec-gamma", "spec-draft",
              "spec-steps"):
        argv += [f"--{k}", str(getattr(args, k.replace("-", "_")))]
    for flag in ("vad", "w8a8", "kv-int8"):
        on = getattr(args, flag.replace("-", "_"))
        argv.append(("--" if on else "--no-") + flag)
    return argv


def _run_phase(args, phase: str) -> dict:
    """Run one bench phase in a fresh subprocess (its HBM is freed on
    exit) and parse the JSON line it prints."""
    proc = subprocess.run(
        _phase_argv(args, phase), capture_output=True, text=True,
        timeout=_PHASE_TIMEOUT_S[phase],
    )
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip()[-500:]
        raise RuntimeError(f"phase {phase} rc={proc.returncode}: {tail}")
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"phase {phase}: no JSON line in output")


def assemble_streaming(args, phases: dict) -> dict:
    """Merge per-phase results into the round's streaming JSON schema."""
    steady = phases["steady"]
    ref = REF_FINAL_LATENCY_MS[args.streaming_arch]
    from moonshine_tpu.core.config import STREAMING_ARCHS

    # update_frames (harness constant) x the arch's real frame length —
    # NOT hardcoded 80, so update_budget_ms stays right for any arch.
    step = 128 * STREAMING_ARCHS[args.streaming_arch].frame_len
    update_budget_ms = step / 16000.0 * 1000.0
    S, K = args.streams, args.cohorts
    cohort_tag = f", {K} staggered cohorts" if K > 1 else ""
    out = {
        "metric": f"audio-seconds/s, {args.streaming_arch} live service "
        f"({S} concurrent streams{cohort_tag}, 0.64 s updates, 15 s segments, "
        f"{args.dtype}{', int8 KV' if args.kv_int8 else ''}"
        f"{', w8a8 weights' if args.w8a8 else ''}"
        f"{', live TinyVad' if args.vad else ''}, 1 chip, "
        f"stable-hypothesis steady state)",
        "value": round(steady["agg"], 2),
        "unit": "audio-seconds/s",
        "vs_baseline": round(ref["linux_x86"] / steady["p50_final"], 4),
        "streams": S,
        "cohorts": K,
        "p50_update_ms": round(steady["p50"], 1),
        "p95_update_ms": round(steady["p95"], 1),
        "p50_final_latency_ms": round(steady["p50_final"], 1),
        "n_final_updates": steady["n_final_updates"],
        "n_finals": steady["n_finals"],
        # K cohort ticks must fit one update period.
        "realtime_headroom_x": round(update_budget_ms / (K * steady["p50"]), 2),
        "vs_linux_x86_latency": round(ref["linux_x86"] / steady["p50_final"], 2),
        "vs_macbook_latency": round(ref["macbook"] / steady["p50_final"], 2),
    }
    churn = phases.get("churn")
    if churn:
        # Adversarial floor: untrained weights churn the hypothesis every
        # update (acceptance ~ 0 -> near-full serial regeneration).
        out["churn_floor_agg"] = round(churn["agg"], 2)
        out["churn_floor_p50_update_ms"] = round(churn["p50"], 1)
    governed = phases.get("governed")
    if governed:
        # ... and its mitigation: decode-backoff governor keeps the tick
        # budget under the same churn storm (ingest stays realtime).
        out["churn_governed_agg"] = round(governed["agg"], 2)
        out["churn_governed_p50_update_ms"] = round(governed["p50"], 1)
        out["churn_governed_backoff"] = governed["backoff"]
    diar = phases.get("diar")
    if diar:
        # BASELINE config 5: speaker segmentation+embedding batched
        # alongside the live ASR service on the same chip — aggregate
        # throughput with the diar work interleaved, its p50 added wall
        # per batched pass, and the ASR p50 delta vs the diar-free
        # steady phase.
        out["diar_alongside_agg"] = round(diar["agg"], 2)
        out["diar_alongside_p50_update_ms"] = round(diar["p50"], 1)
        out["diar_added_p50_ms"] = round(diar["diar_p50_added_ms"], 1)
        out["diar_p50_delta_ms"] = round(diar["p50"] - steady["p50"], 1)
    latency = phases.get("latency")
    if latency:
        # Latency-floor configuration (S=1, 5 s segments, trained
        # weights): the reference's headline single-stream post-phrase
        # latency row is 74 ms Medium Streaming on MacBook Pro /
        # 269 ms Linux x86 (README.md:192-199).
        out["latency_floor_p50_ms"] = round(latency["p50_final"], 1)
        out["latency_floor_p50_update_ms"] = round(latency["p50"], 1)
        out["latency_floor_n_finals"] = latency["n_finals"]
        out["latency_floor_acceptance"] = round(
            latency.get("acceptance", 0.0), 4)
        out["latency_floor_vs_macbook"] = round(
            ref["macbook"] / latency["p50_final"], 2)
        out["latency_floor_vs_linux_x86"] = round(
            ref["linux_x86"] / latency["p50_final"], 2)
        if "s8_p50_final" in latency:
            # 8 concurrent single-stream cohorts: every stream holds the
            # one-stream latency floor simultaneously.
            out["latency_s8_p50_ms"] = round(latency["s8_p50_final"], 1)
            out["latency_s8_n_finals"] = latency["s8_n_finals"]
            out["latency_s8_vs_macbook"] = round(
                ref["macbook"] / latency["s8_p50_final"], 2)
    trained = phases.get("trained")
    if trained:
        out.update({
            # REAL trained weights, measured speculative acceptance —
            # in-distribution (serving the training clip) ...
            "trained_agg": round(trained["agg"], 2),
            "trained_p50_update_ms": round(trained["p50"], 1),
            "trained_p50_final_latency_ms": round(trained["p50_final"], 1),
            "trained_acceptance": round(trained["acceptance"], 4),
            "trained_loss": round(trained["loss"], 4),
            "trained_steps": trained["steps"],
            "trained_train_s": round(trained["train_s"], 1),
            # ... and OFF-distribution: the same weights serving held-out
            # beckett.wav (never seen in training) with the governor
            # active — acceptance under real hypothesis drift.
            "trained_heldout_agg": round(trained["heldout_agg"], 2),
            "trained_heldout_p50_update_ms": round(trained["heldout_p50"], 1),
            "trained_heldout_acceptance": round(
                trained["heldout_acceptance"], 4),
            "trained_heldout_backoff": trained["heldout_backoff"],
        })
    return out


def run_both(args) -> dict:
    """Driver default: every phase in its own subprocess (HBM-safe)."""
    off = err = None
    try:
        off = _run_phase(args, "offline")
    except Exception as e:  # pragma: no cover - depends on chip state
        err = f"offline: {e!r}"

    phases: dict = {}
    phase_errors: list[str] = []
    for name in ("offline-beam", "steady", "churn", "governed", "diar"):
        try:
            phases[name] = _run_phase(args, name)
        except Exception as e:
            phase_errors.append(f"{name}: {e!r}")
    if args.trained:
        # two processes: training HBM is fully returned before serving
        try:
            train_stats = _run_phase(args, "train-weights")
            phases["trained"] = {**_run_phase(args, "trained"),
                                 **train_stats}
        except Exception as e:
            phase_errors.append(f"trained: {e!r}")
        if "trained" in phases:
            # latency floor reuses the trained streaming weights
            try:
                phases["latency"] = _run_phase(args, "latency")
            except Exception as e:
                phase_errors.append(f"latency: {e!r}")
    if args.spec:
        # trained-pair speculative offline headline (BASELINE config 4):
        # train in one process, measure in another (HBM hand-off on disk)
        try:
            spec_stats = _run_phase(args, "spec-train")
            phases["spec"] = {**_run_phase(args, "spec"), **spec_stats}
        except Exception as e:
            phase_errors.append(f"spec: {e!r}")

    if "steady" in phases:
        out = assemble_streaming(args, phases)
        if off:
            out["offline_metric"] = off["metric"]
            out["offline_value"] = off["value"]
            out["offline_vs_sol"] = off["vs_sol"]
            out["offline_wall_seconds"] = off["wall_seconds"]
        elif err:
            out["offline_error"] = err
    elif off:  # never lose the round's bench to a streaming bug
        out = dict(off)
        out["vs_baseline"] = out.pop("vs_sol")
    else:
        out = {"metric": "bench failed", "value": 0.0, "unit": "none",
               "vs_baseline": 0.0}
        if err:
            phase_errors.insert(0, err)
    beam = phases.get("offline-beam")
    if beam:
        # BASELINE config 2: batched beam decode as a driver artifact.
        out["offline_beam_metric"] = beam["metric"]
        out["offline_beam_value"] = beam["value"]
        out["offline_beam_vs_sol"] = beam["vs_sol"]
    spec = phases.get("spec")
    if spec:
        # BASELINE config 4: trained-pair speculative decoding — the
        # sanctioned multiplier past the greedy decode bandwidth
        # roofline.  Acceptance is MEASURED from the trained pair.
        out["spec_metric"] = spec["metric"]
        out["spec_value"] = spec["value"]
        out["spec_vs_sol"] = spec["vs_sol"]
        out["spec_acceptance"] = spec["acceptance"]
        out["spec_speedup_vs_greedy_x"] = spec["speedup_vs_greedy_x"]
        out["spec_greedy_trained_value"] = spec["greedy_trained_value"]
        out["spec_token_match_vs_greedy"] = spec["token_match_vs_greedy"]
        out["spec_mean_tokens"] = spec["mean_tokens"]
        out["spec_heldout_value"] = spec["heldout_value"]
        out["spec_heldout_acceptance"] = spec["heldout_acceptance"]
        out["spec_draft_loss"] = spec["draft_loss"]
        out["spec_verify_loss"] = spec["verify_loss"]
        out["spec_train_s"] = spec["train_s"]
    if phase_errors:
        out["streaming_error"] = "; ".join(phase_errors)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="both",
                   choices=["both", "offline", "streaming", "spec"])
    p.add_argument("--phase", default=None,
                   choices=["offline", "offline-beam", "steady", "churn",
                            "governed", "diar", "train-weights", "trained",
                            "latency", "spec-train", "spec"],
                   help="internal: run ONE measurement phase in this "
                   "process and print its raw JSON (used by --mode both's "
                   "subprocess isolation)")
    p.add_argument("--arch", default="base")
    # Throughput keeps rising past 256 (256/512/768/1024 -> 5.4k/7.2k/7.4k/
    # 7.6k audio-s/s); 512 is the knee — near-max throughput at half the
    # wall of 1024 (docs/PERF.md round-2 sweep).
    p.add_argument("--batch", type=int, default=512)
    # 9.26 s = 384 encoder frames = 3x128 lanes: the eval bucketer's
    # 128-aligned default (eval bucketing, docs/PERF.md shape-choice
    # note) is now also the bench headline; pass --duration 10 for the
    # round-1/2 comparability number.
    p.add_argument("--duration", type=float, default=9.26,
                   help="seconds per utterance (default 128-lane-aligned)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--streaming-arch", default="medium_streaming")
    # 64 medium streams in 2 staggered cohorts: p50 update 200 ms (< the
    # reference's 269 ms single-stream Linux x86 post-phrase latency) while
    # serving 64 concurrent streams — each cohort tick is a 32-stream
    # device program, the measured latency sweet spot (docs/PERF.md).
    p.add_argument("--streams", type=int, default=64)
    p.add_argument("--cohorts", type=int, default=2,
                   help="shard streams into K staggered cohorts; each "
                   "update() ticks one S/K-stream device program, keeping "
                   "per-stream update latency at the S/K level while the "
                   "chip serves all S (serving.ShardedStreamingService)")
    p.add_argument("--updates", type=int, default=40)
    p.add_argument("--trained", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="also overfit the bench arch on the bench audio "
                   "and measure the service with REAL trained weights "
                   "(reports measured speculative acceptance, in-dist + "
                   "held-out beckett.wav). NOTE: changes default-run wall "
                   "time vs rounds 1-2; numbers stay comparable because "
                   "each phase is subprocess-isolated")
    p.add_argument("--decode", default="greedy", choices=["greedy", "beam"],
                   help="offline decode mode (BASELINE config 2 asks for "
                   "batched beam; beam pays ~beam_size x decode cost)")
    p.add_argument("--beam-size", type=int, default=4)
    p.add_argument("--beam-batch", type=int, default=128,
                   help="batch for the offline-beam phase (effective "
                   "decode batch = beam_batch * beam_size)")
    p.add_argument("--spec", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="also train a draft/verify pair on the bench "
                   "audio and measure trained-pair batched speculative "
                   "decoding (BASELINE config 4) as a driver phase")
    p.add_argument("--spec-gamma", type=int, default=8,
                   help="draft proposals per speculative round")
    p.add_argument("--spec-draft", default="pico",
                   choices=["tiny", "nano", "pico"],
                   help="draft arch for the trained pair: the published "
                   "tiny, a half-tiny nano, or a 2-layer pico draft "
                   "(cheaper proposals)")
    p.add_argument("--spec-steps", type=int, default=900,
                   help="max overfit steps for the spec verify model "
                   "(draft gets 2x)")
    p.add_argument("--vad", default=False, action=argparse.BooleanOptionalAction,
                   help="real-weight TinyVadCNN segmentation inside the "
                   "streaming service (live VAD, BASELINE config 3)")
    p.add_argument("--w8a8", default=False,
                   action=argparse.BooleanOptionalAction,
                   help="execute offline dense layers as dynamic w8a8 int8 "
                   "matmuls on the MXU int8 path (quant.quantize_tree_exec; "
                   "the reference's ORT dynamic-quantization arithmetic)")
    p.add_argument("--kv-int8", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="int8 KV caches with fused dequant (ops/int8_kv.py); "
                   "measured +14%% offline, verified token-identical to bf16 "
                   "KV on real audio (docs/PERF.md)")
    args = p.parse_args()

    if args.phase:
        if args.phase == "offline":
            print(json.dumps(offline_bench(args)))
        elif args.phase == "offline-beam":
            bargs = argparse.Namespace(**vars(args))
            bargs.decode, bargs.batch = "beam", args.beam_batch
            print(json.dumps(offline_bench(bargs)))
        elif args.phase == "spec-train":
            print(json.dumps(spec_train_phase(args)))
        elif args.phase == "spec":
            print(json.dumps(spec_trained_bench(args)))
        else:
            print(json.dumps(streaming_phase(args, args.phase)))
        return

    if args.mode == "offline":
        out = offline_bench(args)
        out["vs_baseline"] = out.pop("vs_sol")
        print(json.dumps(out))
        return
    if args.mode == "streaming":
        # Single-process streaming run (no offline phase, no subprocess
        # isolation): steady + churn + governed [+ trained] sequentially;
        # HBM-safe because measure() drops the service between phases.
        phases = {"steady": streaming_phase(args, "steady"),
                  "churn": streaming_phase(args, "churn"),
                  "governed": streaming_phase(args, "governed")}
        if args.trained:
            stats = streaming_phase(args, "train-weights")
            phases["trained"] = {**streaming_phase(args, "trained"),
                                 **stats}
        print(json.dumps(assemble_streaming(args, phases)))
        return
    if args.mode == "spec":
        print(json.dumps(spec_bench(args)))
        return

    print(json.dumps(run_both(args)))


if __name__ == "__main__":
    main()
