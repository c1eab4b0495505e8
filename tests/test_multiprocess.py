"""Multi-host simulation: 2 jax.distributed processes on localhost running a
cross-host collective (SURVEY.md §4 tier 3; replaces the reference's
never-exercised NCCL init)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collective():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform itself
    procs = [subprocess.Popen([sys.executable, worker, str(port), str(i), "2"],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "MP_OK 24.0" in out  # 8 elems/proc * (1+2) summed = 24


def test_two_process_train_matches_single_process(tmp_path):
    """REAL multi-host supervised train + allgather eval (VERDICT round-1
    item 5): 2 jax.distributed processes (2 CPU devices each) must produce
    the same eval AUC as 1 process with 4 devices — same global batches
    (loader process sharding), same seeds, same schedule."""
    from map_tpu.data import synth

    data_dir = str(tmp_path / "data")
    synth.generate(data_dir, name="synth", num_rows=2000, num_fields=6,
                   vocab_per_field=30, seed=3)
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    auc1 = _run_train(worker, env, data_dir, 1, "exact")[0][0]
    res2 = _run_train(worker, env, data_dir, 2, "exact")
    aucs2 = [a for a, _, _ in res2]
    assert all(m == "exact" for _, m, _ in res2)
    assert abs(aucs2[0] - aucs2[1]) < 1e-9  # both processes agree exactly
    assert abs(auc1 - aucs2[0]) < 2e-5, (auc1, aucs2)

    # VERDICT round-2 item 6: with no flags, a multi-process run must
    # auto-select the streaming-histogram eval (no per-example allgather) and
    # its AUC must sit within the estimator's certified band of the exact
    # value (32768 bins on a 200-row eval split: collisions are rare, the
    # bound is ~0; 5e-4 is a conservative ceiling).
    res2s = _run_train(worker, env, data_dir, 2, "default")
    assert all(m == "stream" for _, m, _ in res2s), res2s
    assert abs(res2s[0][0] - aucs2[0]) < 5e-4, (res2s, aucs2)


def test_two_process_rowsharded_mfp_matches_single_process(tmp_path):
    """Row-sharded table exchange ACROSS a process boundary (VERDICT round-2
    item 7): the MFP pretrain step on a ('data','model') = 2x2 mesh, tables
    row-sharded over 'model', run as 2 jax.distributed processes (2 devices
    each — so the model axis spans the process boundary) must produce the
    same eval NCE loss as the identical single-process 4-device run."""
    from map_tpu.data import synth

    data_dir = str(tmp_path / "data")
    synth.generate(data_dir, name="synth", num_rows=1500, num_fields=6,
                   vocab_per_field=30, seed=5)
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    res1 = _run_train(worker, env, data_dir, 1, "exact", "mfp")
    res2 = _run_train(worker, env, data_dir, 2, "exact", "mfp")
    loss1, acc1 = res1[0][0], float(res1[0][2])
    losses2 = [r[0] for r in res2]
    assert abs(losses2[0] - losses2[1]) < 1e-9  # processes agree exactly
    assert abs(loss1 - losses2[0]) < 2e-5, (res1, res2)
    assert abs(acc1 - float(res2[0][2])) < 2e-3, (res1, res2)


def test_two_process_device_resident_matches_host_pipeline(tmp_path):
    """device_resident_data=on across 2 jax.distributed processes: the
    replicated HBM matrix + sharded index batches + scalar-count weight
    rebuild must reproduce the host-pipeline AUC exactly."""
    from map_tpu.data import synth

    data_dir = str(tmp_path / "data")
    synth.generate(data_dir, name="synth", num_rows=1500, num_fields=6,
                   vocab_per_field=30, seed=9)
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    host = _run_train(worker, env, data_dir, 2, "exact", "sup")
    res = _run_train(worker, env, data_dir, 2, "exact", "resident")
    assert abs(res[0][0] - res[1][0]) < 1e-9
    assert abs(host[0][0] - res[0][0]) < 1e-9, (host, res)


def _run_train(worker, env, data_dir, nprocs, eval_mode, objective="sup"):
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, worker, "train", str(port), str(i), str(nprocs),
         data_dir, eval_mode, objective],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(nprocs)]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"{nprocs}-process train worker timed out")
        assert p.returncode == 0, err[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("TRAIN_OK")]
        assert line, out[-1000:]
        parts = line[0].split()
        results.append((float(parts[1]), parts[2],
                        parts[3] if len(parts) > 3 else ""))
    return results
