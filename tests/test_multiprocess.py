"""True multi-process jax.distributed test (the multi-host path).

The reference has no cluster mode; SURVEY §4 says the distributed-test
layer must be invented here: two OS processes bring up jax.distributed
over a localhost coordinator (4 virtual CPU devices each -> one 8-device
global mesh), assemble per-host batch shards into a global batch, run the
pjit-sharded train step, and all-reduce metrics.  Both processes must
agree with each other AND with a single-process run of the same global
batch — cross-host sharding must be numerically invisible.
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training-heavy (fast/slow split, conftest)

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MT_REPO"])

import numpy as np
import optax

from moonshine_tpu.parallel import distributed as dist
from moonshine_tpu.train import step as ts
from moonshine_tpu.core.config import MoonshineArchConfig

pid = int(os.environ["MT_PROC"])
dist.initialize(
    coordinator_address=os.environ["MT_COORD"], num_processes=2, process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and len(jax.local_devices()) == 4

mesh = dist.global_mesh(model=2)  # data=4 x model=2 over both processes

cfg = MoonshineArchConfig(
    name="mp", vocab_size=256, hidden_size=128, intermediate_size=256,
    encoder_layers=1, decoder_layers=1,
)
optimizer = optax.sgd(1e-2)
state = ts.init_train_state(cfg, optimizer, jax.random.PRNGKey(0))
state = ts.shard_train_state(mesh, state)

# Global batch of 4: each process owns rows [2*pid, 2*pid+2).
rng = np.random.RandomState(7)
audio_g = rng.randn(4, 2000).astype(np.float32) * 0.1
tokens_g = rng.randint(3, 250, size=(4, 6)).astype(np.int32)
local = slice(2 * pid, 2 * pid + 2)
batch_local = ts.Batch(
    audio=audio_g[local],
    audio_lengths=np.full((2,), 2000, np.int32),
    tokens_in=tokens_g[local],
    tokens_out=tokens_g[local],
    token_mask=np.ones((2, 6), bool),
)
batch = dist.host_local_batch_to_global(mesh, batch_local)

train_step = ts.make_train_step(cfg, optimizer, mesh)
state, metrics = train_step(state, batch)
loss = float(metrics["loss"])

reduced = dist.all_reduce_metrics({"errors": 10.0 * (pid + 1), "n": 2.0})
print(json.dumps({"pid": pid, "loss": loss, "reduced": reduced}), flush=True)
"""

SINGLE = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MT_REPO"])

import numpy as np
import optax

from moonshine_tpu.parallel import distributed as dist
from moonshine_tpu.train import step as ts
from moonshine_tpu.core.config import MoonshineArchConfig

mesh = dist.global_mesh(model=2)
cfg = MoonshineArchConfig(
    name="mp", vocab_size=256, hidden_size=128, intermediate_size=256,
    encoder_layers=1, decoder_layers=1,
)
optimizer = optax.sgd(1e-2)
state = ts.init_train_state(cfg, optimizer, jax.random.PRNGKey(0))
state = ts.shard_train_state(mesh, state)
rng = np.random.RandomState(7)
audio_g = rng.randn(4, 2000).astype(np.float32) * 0.1
tokens_g = rng.randint(3, 250, size=(4, 6)).astype(np.int32)
batch = ts.Batch(
    audio=audio_g,
    audio_lengths=np.full((4,), 2000, np.int32),
    tokens_in=tokens_g,
    tokens_out=tokens_g,
    token_mask=np.ones((4, 6), bool),
)
batch = dist.host_local_batch_to_global(mesh, batch)
train_step = ts.make_train_step(cfg, optimizer, mesh)
state, metrics = train_step(state, batch)
print(json.dumps({"loss": float(metrics["loss"])}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    env_base = {
        "MT_REPO": str(REPO),
        "MT_COORD": f"127.0.0.1:{port}",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
    }
    procs = []
    for pid in range(2):
        env = dict(env_base, MT_PROC=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    losses = sorted((o["pid"], o["loss"]) for o in outs)
    assert losses[0][1] == pytest.approx(losses[1][1], rel=1e-6)
    # Metric all-reduce: 10 + 20 errors, 2 + 2 counts on both processes.
    for o in outs:
        assert o["reduced"]["errors"] == pytest.approx(30.0)
        assert o["reduced"]["n"] == pytest.approx(4.0)

    # Single-process ground truth on the same global batch.
    sp = subprocess.run(
        [sys.executable, "-c", SINGLE], env=env_base,
        capture_output=True, text=True, timeout=420,
    )
    assert sp.returncode == 0, sp.stderr[-3000:]
    ref = json.loads(sp.stdout.strip().splitlines()[-1])
    assert losses[0][1] == pytest.approx(ref["loss"], rel=1e-5)
