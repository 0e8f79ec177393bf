"""Multi-process (2-host simulation) sharded eval end-to-end.

Proves the rank-padded eval protocol (`train/evaluate.py::rank_padded_indices`)
under REAL multi-process SPMD: 2 processes x 2 virtual CPU devices joined via
jax.distributed run `evaluate_miou` over n=5 samples (odd on purpose — the
unpadded rank-strided split gives the processes unequal batch counts, the
deadlock/UB case), and rank 0's mIoU must equal a serial single-process
oracle over the same samples.

The worker half of this file re-executes it as `__main__` with
PW_EVAL_WORKER set (same pattern as `__graft_entry__.dryrun_multihost`).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

N_SAMPLES = 5
N_CLASSES = 4
SHAPE = (4, 4, 2)  # tiny voxel grid


def _make_sample(i: int):
    """Deterministic sample: prediction is a pure function of `imgs` so the
    multi-process result can be oracled serially."""
    rng = np.random.default_rng(100 + i)
    return {
        "imgs": rng.uniform(0.0, 1.0, SHAPE).astype(np.float32),
        "voxel_semantics": rng.integers(0, N_CLASSES, SHAPE).astype(np.int64),
    }


def _predict_np(imgs: np.ndarray) -> np.ndarray:
    return (np.abs(imgs) * 7.0).astype(np.int32) % N_CLASSES


def _worker(rank: int, world: int, port: int):
    os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=world,
        process_id=rank,
    )
    from types import SimpleNamespace

    from preworld_tpu.parallel import make_mesh
    from preworld_tpu.train.evaluate import evaluate_miou, rank_padded_indices

    mesh = make_mesh(n_data=world * jax.local_device_count(), n_seq=1)
    samples = (
        {**_make_sample(i), "_valid": v}
        for i, v in rank_padded_indices(N_SAMPLES)
    )
    state = SimpleNamespace(step=0, params={}, ema_params={}, batch_stats={})

    @jax.jit
    def predict_fn(params, batch_stats, b):
        occ = (jnp.abs(b["imgs"]) * 7.0).astype(jnp.int32) % N_CLASSES
        return {"semantic_occ": occ}

    res = evaluate_miou(
        None, state, samples, mesh,
        num_classes=N_CLASSES, use_image_mask=False,
        predict_fn=predict_fn,
    )
    if rank == 0:
        print("EVAL_RESULT " + json.dumps({"miou": float(res["mIoU"])}))


@pytest.mark.slow
def test_two_process_eval_matches_serial_oracle(tmp_path):
    from preworld_tpu.metrics import MetricMIoU

    # serial oracle over the same 5 samples
    m = MetricMIoU(num_classes=N_CLASSES, use_image_mask=False)
    for i in range(N_SAMPLES):
        s = _make_sample(i)
        m.add_batch(_predict_np(s["imgs"]), s["voxel_semantics"], None, None)
    expected = m.count_miou()["mIoU"]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        env["GLOO_SOCKET_IFNAME"] = "lo"
        env["PW_EVAL_WORKER"] = f"{rank},2,{port}"
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out
    # other writers (Gloo banners) can interleave on stdout without a
    # newline; raw_decode tolerates trailing junk after the JSON object
    line = next(
        ln for ln in outs[0].splitlines() if "EVAL_RESULT " in ln
    )
    payload = line.split("EVAL_RESULT ", 1)[1]
    got = json.JSONDecoder().raw_decode(payload)[0]["miou"]
    assert got == pytest.approx(expected, abs=1e-9), (got, expected)


if __name__ == "__main__":
    spec = os.environ.get("PW_EVAL_WORKER")
    if spec:
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        r, w, pt = map(int, spec.split(","))
        _worker(r, w, pt)
