"""Multi-host DP over the real jax.distributed runtime: 2 OS processes,
loopback coordinator, 4 virtual CPU devices each -> one 8-device global mesh.

Each process loads only its host_shard of a deterministic global batch,
assembles the global array via parallel.multihost.global_batch, and computes
a data-parallel gradient.  Both processes must agree with each other AND with
the single-process serial result — that is the DCN data-parallel contract.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from imagecaptioner_tpu.parallel import multihost as MH
from imagecaptioner_tpu.core import mesh as MS

port, pid = sys.argv[1], int(sys.argv[2])
assert MH.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid,
                     initialization_timeout=300,
                     heartbeat_timeout_seconds=300,
                     shutdown_timeout_seconds=300)
info = MH.process_info()
assert info["process_count"] == 2 and info["process_index"] == pid
assert len(jax.devices()) == 4  # 2 local x 2 processes

mesh = MS.create_mesh()  # all 4 global devices on the data axis

# deterministic "dataset": every host holds the full host-side copy, loads
# only its shard (what a per-host loader would do)
N, D, T = 16, 4, 3
rng = np.random.default_rng(0)
X = rng.standard_normal((N, D)).astype(np.float32)
C = rng.integers(0, 9, (T, N)).astype(np.int32)
idx = MH.host_shard(N)
local = {"images": X[idx], "captions": C[:, idx],
         "lengths": np.full((len(idx),), T, np.int32)}
gb = MH.global_batch(mesh, local)
assert gb["images"].shape == (N, D)
assert gb["captions"].shape == (T, N)

w = jax.device_put(np.linspace(0.1, 0.4, D, dtype=np.float32),
                   MS.replicated(mesh))

@jax.jit
def grad_step(w, batch):
    def loss(w):
        pred = batch["images"] @ w
        tgt = batch["captions"].astype(np.float32).mean(axis=0)
        return ((pred - tgt) ** 2).mean()
    return jax.grad(loss)(w)

g = np.asarray(jax.device_get(grad_step(w, gb)))
print("RESULT::" + json.dumps({"pid": pid, "grad": g.tolist()}), flush=True)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ic-dp-test-done")
jax.distributed.shutdown()
"""


KD_COMMON = r"""
import numpy as np, jax, jax.numpy as jnp
from imagecaptioner_tpu.core import mesh as MS
from imagecaptioner_tpu.core.config import (
    DistillConfig, KDTrainConfig, TeacherConfig, compact_student_config)
from imagecaptioner_tpu.distill.projector import create_feature_projectors
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.train import common, optim as O, steps

IMG, T, A, BG = 32, 8, 2, 16  # global batch 16 over 8 devices
t_cfg = TeacherConfig(vocab_size=64, embed_size=32, num_heads=4,
                      num_decoder_layers=2, dropout=0.1, encoder_dim=24,
                      encoder_depth=2, encoder_heads=3, image_size=IMG,
                      patch_size=16)
s_cfg = compact_student_config(64, embed_size=16, hidden_size=16,
                               dropout=0.0, image_size=IMG)
tr = KDTrainConfig(batch_size=BG, accumulation_steps=A, num_epochs=1)

def build_state():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher_params = TM.teacher_init(k1, t_cfg)
    s_params, s_state = SM.student_init(k2, s_cfg)
    projectors, _ = create_feature_projectors(
        k3, teacher_embed=32, student_embed=16, student_hidden=16,
        student_seq_len=s_cfg.feature_tokens, teacher_seq_len=t_cfg.num_tokens)
    params = {"student": s_params, "projectors": projectors}
    return teacher_params, steps.TrainState(params, O.adamw_init(params),
                                            s_state)

def global_data():
    rng = np.random.default_rng(7)
    return {
        "images": rng.integers(0, 255, (A, BG, IMG, IMG, 3), dtype=np.uint8),
        "captions": rng.integers(1, 64, (A, T, BG)).astype(np.int32),
        "lengths": np.full((A, BG), T, np.int32),
    }

def run_one_step(mesh, loader, val_batch):
    teacher_params, state = build_state()
    state = MS.replicate(mesh, state)
    teacher_params = MS.replicate(mesh, teacher_params)
    step = steps.make_kd_train_step(t_cfg, s_cfg, DistillConfig(), tr,
                                    compute_dtype=jnp.float32)
    stacks = list(common.stacked_batches(loader, A, mesh=mesh))
    (state, metrics) = step(state, teacher_params, stacks[0],
                            jnp.float32(0.0), jnp.int32(0),
                            jax.random.PRNGKey(3))
    loss = float(jax.device_get(metrics["total_loss"]))
    leaves = jax.tree.leaves(state.params["student"])
    sq = sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves)
    # validation: host-local val shard -> GLOBAL eval batch, replicated
    # outputs fetchable on every process (ADVICE r2 multi-host validation)
    eval_step = steps.make_kd_eval_step(t_cfg, s_cfg, DistillConfig(),
                                        compute_dtype=jnp.float32, mesh=mesh)
    gb = common.put_global_batch(mesh, val_batch, stacked=False)
    vloss, _, preds, cap_tgt = eval_step(state.params, state.model_state,
                                         teacher_params, gb, jnp.int32(0))
    assert preds.shape[1] == BG  # global batch, not the host-local shard
    pred_sum = int(np.asarray(preds).sum()) + int(np.asarray(cap_tgt).sum())
    return loss, float(jnp.sqrt(sq)), float(jax.device_get(vloss)), pred_sum
"""

KD_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
from imagecaptioner_tpu.parallel import multihost as MH
from imagecaptioner_tpu.core.runtime import enable_compile_cache, cpu_cache_dir
enable_compile_cache(cpu_cache_dir())
# generous timeouts: an oversubscribed box can stall a worker for minutes
assert MH.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid,
                     initialization_timeout=300,
                     heartbeat_timeout_seconds=300,
                     shutdown_timeout_seconds=300)
""" + KD_COMMON + r"""
mesh = MS.create_mesh()  # 4 global devices (2 local x 2 processes)
g = global_data()
sh = MH.host_shard(BG)  # this host's batch columns

class HostShardLoader:
    def __iter__(self):
        for a in range(A):
            yield {"images": g["images"][a][sh],
                   "captions": g["captions"][a][:, sh],
                   "lengths": g["lengths"][a][sh]}

val = {"images": g["images"][1][sh], "captions": g["captions"][1][:, sh],
       "lengths": g["lengths"][1][sh]}
loss, wnorm, vloss, psum = run_one_step(mesh, HostShardLoader(), val)
print("RESULT::" + json.dumps({"pid": pid, "loss": loss, "wnorm": wnorm,
                               "vloss": vloss, "psum": psum}),
      flush=True)
# processes can drift on uncached compiles or a loaded box; reaching
# shutdown >30s apart trips the coordination-service shutdown barrier, so
# align, then shut down explicitly BEFORE python teardown
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ic-kd-test-done")
jax.distributed.shutdown()
"""

KD_SERIAL = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
from imagecaptioner_tpu.core.runtime import enable_compile_cache, cpu_cache_dir
enable_compile_cache(cpu_cache_dir())
from imagecaptioner_tpu.parallel import multihost as MH
""" + KD_COMMON + r"""
import numpy as np
mesh = MS.create_mesh()  # 4 local devices, single process
g = global_data()
# multi-process concatenation order = [host0 shard, host1 shard]
perm = np.concatenate([MH.host_shard(BG, process_index=i, process_count=2)
                       for i in range(2)])

class PermLoader:
    def __iter__(self):
        for a in range(A):
            yield {"images": g["images"][a][perm],
                   "captions": g["captions"][a][:, perm],
                   "lengths": g["lengths"][a][perm]}

val = {"images": g["images"][1][perm], "captions": g["captions"][1][:, perm],
       "lengths": g["lengths"][1][perm]}
loss, wnorm, vloss, psum = run_one_step(mesh, PermLoader(), val)
print("RESULT::" + json.dumps({"loss": loss, "wnorm": wnorm, "vloss": vloss,
                               "psum": psum}), flush=True)
"""


def _collect_results(outs):
    res = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT::"):
                res.append(json.loads(line[len("RESULT::"):]))
    return res


def _run_workers(env, port):
    """Launch the two KD workers; returns (outputs, barrier_flake)."""
    env_mp = dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [
        subprocess.Popen([sys.executable, "-c", KD_WORKER, str(port), str(i)],
                         env=env_mp, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("kd multihost worker timed out")
        outs.append((p.returncode, out))
    if all(rc == 0 for rc, _ in outs):
        return [o for _, o in outs], False
    # A loaded box can still trip the 30s shutdown barrier even after the
    # pre-exit sync, or time out the 30s Gloo collective-connect while a
    # worker is descheduled (observed at load average ~8 on 1 core); both
    # are timing flakes, not correctness failures — report distinctly so
    # the caller can retry.
    flake = any("Shutdown barrier" in o or "DEADLINE_EXCEEDED" in o
                for _, o in outs)
    if not flake:
        bad = next(o for rc, o in outs if rc != 0)
        pytest.fail(f"kd worker failed:\n{bad[-3000:]}")
    return [o for _, o in outs], True


def test_two_process_kd_train_step_matches_serial():
    """The REAL KD train step (teacher fwd + student fwd/bwd + AdamW) over 2
    processes x 2 devices, fed through common.stacked_batches from per-host
    dataset shards, reproduces the single-process 4-device result."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)

    attempts = 3
    for attempt in range(attempts):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        outs, flake = _run_workers(env, port)
        workers = _collect_results(outs)
        if len(workers) == 2:
            break  # both RESULTs emitted — numbers are valid even on a flake
        assert flake and attempt < attempts - 1, (
            "no results from workers:\n"
            + "\n---\n".join(o[-2000:] for o in outs))

    # serial reference runs AFTER the workers: it must not compete for CPU
    # with the collective-coupled pair on an oversubscribed box
    env_sp = dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=4")
    serial = subprocess.Popen([sys.executable, "-c", KD_SERIAL], env=env_sp,
                              cwd=REPO, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
    try:
        s_out, _ = serial.communicate(timeout=420)
    except subprocess.TimeoutExpired:
        serial.kill()
        pytest.fail("serial reference timed out")
    assert serial.returncode == 0, f"serial failed:\n{s_out[-3000:]}"

    ref = _collect_results([s_out])[0]
    assert len(workers) == 2
    assert abs(workers[0]["loss"] - workers[1]["loss"]) < 1e-6
    assert abs(workers[0]["loss"] - ref["loss"]) < 1e-4
    assert abs(workers[0]["wnorm"] - ref["wnorm"]) < 1e-4
    # validation: both processes computed the SAME global val loss and could
    # fetch the full replicated preds/targets, matching serial
    assert abs(workers[0]["vloss"] - workers[1]["vloss"]) < 1e-6
    assert abs(workers[0]["vloss"] - ref["vloss"]) < 1e-4
    assert workers[0]["psum"] == workers[1]["psum"] == ref["psum"]


# -- single-process unit coverage of the wiring ------------------------------

def test_host_shard_disjoint_equal_deterministic():
    from imagecaptioner_tpu.parallel import multihost as MH

    shards = [MH.host_shard(41, process_index=i, process_count=4)
              for i in range(4)]
    assert all(len(s) == 10 for s in shards)  # 41 // 4, remainder dropped
    flat = np.concatenate(shards)
    assert len(set(flat.tolist())) == len(flat)  # disjoint
    np.testing.assert_array_equal(
        shards[1], MH.host_shard(41, process_index=1, process_count=4))


def test_dataset_select_keeps_vocab(tmp_path):
    from imagecaptioner_tpu.data.dataset import CaptionDataset

    csv = tmp_path / "caps.csv"
    csv.write_text("image,caption\n" + "".join(
        f"i{k}.jpg,a dog runs a dog runs number{k}\n" for k in range(6)))
    ds = CaptionDataset(str(tmp_path), str(csv), freq_threshold=2)
    full_vocab = dict(ds.vocab.stoi)
    ds.select([1, 3, 5])
    assert len(ds) == 3
    assert ds.imgs == ["i1.jpg", "i3.jpg", "i5.jpg"]
    assert ds.vocab.stoi == full_vocab  # vocab still built over ALL captions


def test_maybe_mesh_refuses_indivisible_multihost(monkeypatch):
    import jax

    from imagecaptioner_tpu.train import common

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="multi-host"):
        common.maybe_mesh(3)  # global batch 6 over 8 devices


def test_get_loader_host_shard_noop_single_process(tmp_path):
    """host_shard=True must leave the dataset intact when there is only one
    process (the trainers pass it unconditionally)."""
    from imagecaptioner_tpu.data.loader import get_loader

    csv = tmp_path / "caps.csv"
    csv.write_text("image,caption\n" + "".join(
        f"i{k}.jpg,a dog runs fast\n" for k in range(8)))
    _, ds_plain = get_loader(str(tmp_path), str(csv))
    _, ds_shard = get_loader(str(tmp_path), str(csv), host_shard=True)
    assert len(ds_shard) == len(ds_plain) == 8
    assert ds_shard.imgs == ds_plain.imgs


def test_initialize_noop_single_process():
    from imagecaptioner_tpu.parallel import multihost as MH

    assert MH.initialize() is False
    assert MH.initialize(num_processes=1) is False


def _serial_reference():
    """Same computation, plain numpy, full batch — the ground truth."""
    N, D, T = 16, 4, 3
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D)).astype(np.float32)
    C = rng.integers(0, 9, (T, N)).astype(np.int32)
    # host_shard(pi::2) order interleaves examples; gradient of a mean is
    # permutation-invariant, so the serial full-batch gradient is the target
    w = np.linspace(0.1, 0.4, D, dtype=np.float32)
    pred = X @ w
    tgt = C.astype(np.float32).mean(axis=0)
    return 2.0 / N * X.T @ (pred - tgt)


def test_two_process_data_parallel_gradient():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(port), str(i)],
                         env=env, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    grads = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT::"):
                d = json.loads(line[len("RESULT::"):])
                grads[d["pid"]] = np.asarray(d["grad"], np.float32)
    assert set(grads) == {0, 1}
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-6)
    np.testing.assert_allclose(grads[0], _serial_reference(), rtol=1e-4)
