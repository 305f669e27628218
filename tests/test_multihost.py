"""Multi-host execution evidence (VERDICT round-2 item #7): the
`--multihost` train path — `jax.distributed.initialize` via the reference
launcher's env contract (MASTER_ADDR/PORT, RANK, WORLD_SIZE; reference
common.py:96-102), a global mesh spanning both processes, per-process
global-batch assembly (`place_sharded`), and rank-0-gated outputs — run
for real as TWO coordinated CPU processes.

Each process gets 2 virtual CPU devices, so the jitted train step runs
SPMD over a 4-device global mesh with compiler-inserted cross-process
collectives (gloo/TCP on CPU)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from multi_modal_image_fusion_tpu.data.io import imwrite

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_datasets")
    data_dir = root / "tinyset"
    rng = np.random.RandomState(0)
    for mod in ("vis", "ir"):
        os.makedirs(data_dir / "train" / mod)
    for i in range(8):
        base = (rng.rand(96, 96) * 255).astype(np.uint8)
        imwrite(str(data_dir / "train" / "vis" / f"{i + 1}.png"), base)
        imwrite(str(data_dir / "train" / "ir" / f"{i + 1}.png"),
                255 - base // 2)
    return str(root)


def test_two_process_train_smoke(tiny_dataset, tmp_path):
    port = _free_port()
    ckpt_root = str(tmp_path / "checkpoints")
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            MMIF_PLATFORM="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            RANK=str(rank),
            WORLD_SIZE="2",
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        # JAX_PLATFORMS in the parent env would fight MMIF_PLATFORM
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "multi_modal_image_fusion_tpu.cli.train",
             "--data", "tinyset", "--data_root", tiny_dataset,
             "--ckpt_root", ckpt_root, "--model", "deepfuse",
             "--bs", "4", "--epoch", "1", "--multihost"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost smoke timed out:\n"
                        + "\n".join(outs))
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    # rank 0 (and only rank 0) wrote the checkpoint tree
    runs = os.listdir(ckpt_root)
    assert len(runs) == 1, runs
    ckpt_dir = os.path.join(ckpt_root, runs[0])
    assert os.path.isfile(os.path.join(ckpt_dir, "epoch_last.ckpt"))
    with open(os.path.join(ckpt_dir, "scalars.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    losses = [r["value"] for r in recs if r["tag"] == "train_loss_iter"]
    assert losses and all(np.isfinite(v) for v in losses)
