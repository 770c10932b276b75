"""Multi-process (multi-host) data parallelism.

The reference scales past one node with torch DDP: ``WORLD_SIZE`` / ``RANK``
/ ``LOCAL_RANK`` env plumbing (``yolov5/train.py:60-62``) and
``dist.init_process_group(nccl|gloo)`` (``train.py:535``).  The TPU-native
equivalent (SURVEY.md §2.8: "DCN only for multi-host batch parallelism") is
``jax.distributed.initialize`` plus a global mesh spanning every process's
devices: the batch axis sharded over ``data`` rides ICI within a host and
DCN across hosts, and XLA inserts the same gradient allreduce as in the
single-process case — trainer code is unchanged (see
``lpr_tpu/train/lpsr.py`` / ``train/yolo.py``, which only ever talk to the
mesh).

Env contract (mirrors the reference's DDP launcher variables):

- ``COORDINATOR_ADDRESS`` — ``host:port`` of process 0 (DDP's MASTER_ADDR
  + MASTER_PORT rolled into one, the jax.distributed convention).
- ``WORLD_SIZE`` — number of processes.
- ``RANK`` — this process's id.

``python -m lpr_tpu.parallel.multiproc`` self-checks the whole story on one
machine: it runs the LPSR DP train step (a) single-process over 8 virtual
CPU devices and (b) 2 processes x 4 virtual CPU devices over the gloo-backed
coordination service, and asserts losses and updated parameters match to
reduction-order tolerance (the cross-process allreduce sums in a different
order than the single-process fused reduction; measured 7.4e-9 rel —
torch DDP has the same property vs single-GPU).  ``__graft_entry__.dryrun_multichip`` and
``tests/test_multiproc.py`` both drive this check.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from typing import Optional, Tuple

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def initialize_from_env() -> bool:
    """``jax.distributed.initialize`` from the env contract above.

    Returns True if multi-process mode was initialized, False when the env
    is absent (single-process — the common case; callers need no branch).
    Mirrors the reference's "if LOCAL_RANK != -1" DDP gate
    (``yolov5/train.py:96-101``).
    """
    world = int(os.environ.get("WORLD_SIZE", "1"))
    if world <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=os.environ["COORDINATOR_ADDRESS"],
        num_processes=world,
        process_id=int(os.environ["RANK"]),
    )
    return True


def local_slice(global_len: int) -> slice:
    """This process's contiguous slice of a leading-axis-sharded global
    batch (the DistributedSampler equivalent).  ``global_len`` must divide
    evenly by the process count."""
    import jax

    n, i = jax.process_count(), jax.process_index()
    if global_len % n:
        raise ValueError(f"global batch {global_len} not divisible by "
                         f"{n} processes")
    per = global_len // n
    return slice(i * per, (i + 1) * per)


def is_main_process() -> bool:
    """Rank-0 gate for logging/checkpointing (reference train.py's
    ``RANK in {-1, 0}`` idiom)."""
    import jax

    return jax.process_index() == 0


# ----------------------------------------------------------------------
# Self-check harness: 2 proc x 4 dev == 1 proc x 8 dev, bitwise.
# ----------------------------------------------------------------------

def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _payload() -> dict:
    """Two LPSR DP train steps on deterministic data; returns loss and a
    parameter fingerprint.  Runs identically under 1 or N processes — the
    only multi-process-aware line is the ``local_slice`` data split."""
    import jax
    import numpy as np

    from lpr_tpu.models.lpsr import LPSRConfig
    from lpr_tpu.parallel.mesh import make_mesh
    from lpr_tpu.train.lpsr import LPSRTrainConfig, LPSRTrainer

    mesh = make_mesh()  # all global devices
    lcfg = LPSRConfig(num_features=8, growth_rate=4, num_blocks=2,
                      num_layers=2)
    trainer = LPSRTrainer(LPSRTrainConfig(), lcfg, mesh=mesh)
    state = trainer.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    losses = []
    # global batch == global device count so the mesh divides it at any
    # world size (dryrun_multichip may ask for 16+ devices)
    b = jax.device_count()
    for _ in range(2):
        lr_img = rng.rand(b, 8, 16, 3).astype(np.float32)
        hr_img = rng.rand(b, 8, 16, 1).astype(np.float32)
        sl = local_slice(b)
        state, loss = trainer.step(state, lr_img[sl], hr_img[sl])
        losses.append(float(loss))

    leaves = jax.tree.leaves(state["params"])
    fp = float(sum(np.float64(np.asarray(l)).sum() for l in leaves))
    return {"losses": losses, "fingerprint": fp,
            "n_devices": len(jax.devices()),
            "n_processes": jax.process_count()}


def _run_role(role: str, rank: int, world: int, port: int,
              devices_per_process: int) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(
        f"--xla_force_host_platform_device_count={devices_per_process}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    if role == "worker":
        env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["WORLD_SIZE"] = str(world)
        env["RANK"] = str(rank)
    else:
        env.pop("WORLD_SIZE", None)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from lpr_tpu.parallel import multiproc as m; "
            "m.initialize_from_env(); import json; "
            "r = m._payload(); "
            "print('PAYLOAD ' + json.dumps(r)) "
            "if m.is_main_process() else None")
    return subprocess.Popen([sys.executable, "-c", code], env=env,
                            cwd=_REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _collect(proc: subprocess.Popen, tag: str,
             timeout: float) -> Optional[dict]:
    out, err = proc.communicate(timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"{tag} failed (rc={proc.returncode}):\n"
                           f"{err[-4000:]}")
    for line in out.splitlines():
        if line.startswith("PAYLOAD "):
            return json.loads(line[len("PAYLOAD "):])
    return None


def multiproc_dp_check(n_processes: int = 2, devices_per_process: int = 4,
                       timeout: float = 600.0) -> Tuple[dict, dict]:
    """Run the payload single-process (``n*d`` devices) and multi-process
    (``n`` procs x ``d`` devices) and assert bitwise-identical training.
    Returns (single_result, multi_result)."""
    total = n_processes * devices_per_process
    single_p = _run_role("single", 0, 1, 0, total)
    single = _collect(single_p, "single-process baseline", timeout)
    assert single and single["n_devices"] == total, single

    port = _free_port()
    workers = [_run_role("worker", r, n_processes, port, devices_per_process)
               for r in range(n_processes)]
    multi = None
    errs = []
    for r, w in enumerate(workers):
        try:
            got = _collect(w, f"worker {r}", timeout)
            if got is not None:
                multi = got
        except RuntimeError as e:  # collect every failure before raising
            errs.append(str(e))
    if errs:
        raise RuntimeError("\n".join(errs))
    assert multi is not None, "rank 0 produced no payload"
    assert multi["n_processes"] == n_processes, multi
    assert multi["n_devices"] == total, multi

    # The cross-process gradient allreduce (gloo here, ICI/DCN on TPU pods)
    # reduces in a different order than the single-process fused reduction,
    # so float32 results match to reduction-order noise (~1e-7 rel), not
    # bitwise — identical to torch DDP vs single-GPU.  Measured: 7.4e-9 rel.
    for got, want in zip(multi["losses"], single["losses"]):
        if abs(got - want) > 2e-6 * abs(want):
            raise AssertionError(
                f"multi-process losses {multi['losses']} != "
                f"single-process {single['losses']}")
    fp_m, fp_s = multi["fingerprint"], single["fingerprint"]
    if abs(fp_m - fp_s) > 1e-5 * max(1.0, abs(fp_s)):
        raise AssertionError(
            f"param fingerprint diverged: {fp_m} vs {fp_s}")
    return single, multi


if __name__ == "__main__":
    single, multi = multiproc_dp_check()
    print(f"multiproc dp check ok: {multi['n_processes']} procs x "
          f"{multi['n_devices'] // multi['n_processes']} devices == "
          f"single-process {single['n_devices']} devices "
          f"(losses {multi['losses']}, reduction-order tolerance)")
