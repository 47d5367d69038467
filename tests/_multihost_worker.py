"""Subprocess worker for tests/test_multihost.py.

One REAL `jax.distributed` process (CPU backend, gloo collectives): runs a
few `--multihost` trainer steps through the actual CLI, then exercises the
`process_allgather` branch of `weighted_reduce_metrics` with per-process
payloads. The parent test launches two of these against one rendezvous —
the single-controller analog of the reference's 2-rank NCCL bring-up
(`utils/distributed_utils.py:74-111`, `tools/train.py:336-342`).

argv: <process_id> <num_processes> <coordinator host:port> <model_dir>
"""
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    addr, model_dir = sys.argv[3], sys.argv[4]

    import jax

    # Backend config must precede the first backend touch (the axon TPU
    # plugin would otherwise claim the process — and two processes cannot
    # share the one real chip).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from rnnpose_tpu.tools.train import main as train_main

    train_main([
        "--model_dir", model_dir, "--synthetic",
        "--syn_image_size", "64", "--syn_zoom", "32",
        "--steps", "3", "--display_step", "1", "--eval_frames", "0",
        "--multihost", "--coordinator_address", addr,
        "--num_processes", str(nproc), "--process_id", str(pid),
    ])

    assert jax.process_count() == nproc, jax.process_count()

    from rnnpose_tpu.parallel.collectives import weighted_reduce_metrics

    # Distinct per-process summaries with different COUNTS (process 1
    # carries two) — the pytree-mismatch case the naive gather dies on.
    if pid == 0:
        local = [{"add01": 1.0, "seq_len": 10}]
    else:
        local = [{"add01": 0.0, "seq_len": 15}, {"add01": 0.4, "seq_len": 5}]
    red = weighted_reduce_metrics(local)
    want = (1.0 * 10 + 0.0 * 15 + 0.4 * 5) / 30.0
    assert abs(red["add01"] - want) < 1e-9, red
    assert red["seq_len"] == 30, red
    assert isinstance(red["add01"], float)
    print(f"MULTIHOST_WORKER_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
