"""Worker for the REAL 2-process distributed test (SURVEY.md section 5.8).

Launched as ``python tests/distributed_worker.py <coordinator> <n> <i>`` by
tests/test_distributed.py.  Each process:

1. jax.distributed.initialize against a localhost coordinator (CPU backend),
2. reads its OWN shard of a synthetic sample stream (PrefetchReader with
   shard_index=i — the multi-host input path, cli.run_train wiring),
3. assembles the global batch via make_array_from_process_local_data
   (parallel.mesh.shard_batch's multi-process branch),
4. runs one data-parallel train step of the tiny flagship config (GSPMD
   emits the cross-process gradient all-reduce),
5. verifies the assembled global batch has DISTINCT per-process rows
   (process_allgather on a row fingerprint) and the loss is finite and
   IDENTICAL on both processes (the all-reduce ran).

Prints "DISTRIBUTED_OK <loss>" on success; any exception exits nonzero.
"""

import sys


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")
    # 2 local devices per process -> 4-device global mesh over 2 processes
    jax.config.update("jax_num_cpu_devices", 2)

    from cmpc_refseg_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_processes,
                           process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * num_processes

    import numpy as np

    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.data.reader import PrefetchReader
    from cmpc_refseg_tpu.parallel.mesh import make_mesh, shard_batch
    from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                               make_train_step,
                                               prepare_image_batch_u8)

    cfg = get_config("CMPC_model", H=16, W=16, num_steps=6, vocab_size=30,
                     glove_dim=8, rnn_size=16, v_emb_dim=16, mlp_dim=12,
                     res4_blocks=2, batch_size=4)     # global batch 4

    # deterministic synthetic dataset, sharded per process like cli.run_train
    def load(i):
        r = np.random.default_rng(1000 + i)
        return {
            "im_batch": r.integers(0, 256, (16, 16, 3)).astype(np.uint8),
            "mask_batch": (r.random((16, 16)) > 0.6),
            "text_batch": np.concatenate(
                [r.integers(3, 30, 3), np.zeros(3)]).astype(np.int32),
            "seq_length": np.int64(3),
            "sample_id": np.int64(i),
        }

    reader = PrefetchReader(8, load, shuffle=True, seed=0,
                            shard_index=jax.process_index(),
                            shard_count=jax.process_count())
    local_bs = cfg.batch_size // num_processes
    samples = [reader.read() for _ in range(local_bs)]
    collated = {k: np.stack([np.asarray(s[k]) for s in samples])
                for k in samples[0]}
    local_ids = collated.pop("sample_id")

    mesh = make_mesh()          # all 4 global devices, 'data' axis
    batch = prepare_image_batch_u8(collated)
    sharded = shard_batch(batch, mesh)   # multi-process branch

    # distinct-rows check: allgather each process's local sample ids
    from jax.experimental.multihost_utils import process_allgather
    all_ids = np.asarray(process_allgather(local_ids)).reshape(-1)
    assert len(set(all_ids.tolist())) == cfg.batch_size, (
        f"duplicated samples across processes: {all_ids}")

    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg)
    state, metrics = step_fn(state, sharded)
    loss = float(metrics["loss_cls_all"])
    assert np.isfinite(loss), loss

    # the loss is computed from the GLOBAL batch — identical on every
    # process iff the data all-reduce actually spanned both
    losses = np.asarray(process_allgather(np.asarray([loss])))
    assert np.allclose(losses, loss), losses

    print(f"DISTRIBUTED_OK {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
