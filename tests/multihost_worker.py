"""Worker process for the multi-host (multi-process) collective test.

Launched by tests/test_multihost.py: two OS processes, each owning 2
virtual CPU devices, join one jax.distributed cluster through
parallel.mesh.initialize_multihost and run the sharded screen + psum
elect over the GLOBAL 4-device dp mesh — the faked-locally form of a
multi-host TPU run (SURVEY.md §4, §2.4 communication-backend row).

Usage: python multihost_worker.py <coordinator_port> <process_id> <outdir>
"""

import os
import sys


def main() -> int:
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pacbioassembly_tpu.parallel import initialize_multihost, sharded_elect, sharded_screen

    mesh = initialize_multihost(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    # deterministic inputs, identical in both processes
    rng = np.random.default_rng(0)
    N, E, L = 16, 10, 64
    ops = rng.choice([1, 1, 1, 3, 2], size=(N, E)).astype(np.uint8)
    ops[:, 0] = 1  # first edit cannot be INSERT (ref_seq.h:24)
    vals = rng.integers(0, 4, (N, E)).astype(np.uint8)
    start = rng.integers(E, L - E, N).astype(np.int32)
    fwd = rng.integers(0, 2, N).astype(bool)
    en = np.ones(N, bool)

    B, LA, LB, W = 8, 48, 40, 13
    a = rng.integers(0, 4, (B, LA)).astype(np.uint8)
    b = a[:, :LB].copy()
    mut = rng.random((B, LB)) < 0.05
    b = np.where(mut, (b + 1) % 4, b).astype(np.uint8)
    la = np.full(B, LA, np.int32)
    lb = np.full(B, LB, np.int32)

    def gshard(x, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    delta = sharded_elect(
        mesh,
        gshard(ops, P("dp", None)),
        gshard(vals, P("dp", None)),
        gshard(start, P("dp")),
        gshard(fwd, P("dp")),
        gshard(en, P("dp")),
        L,
    )
    scores = sharded_screen(
        mesh,
        gshard(a, P("dp", None)),
        gshard(la, P("dp")),
        gshard(b, P("dp", None)),
        gshard(lb, P("dp")),
        la_max=LA,
        w_max=W,
        ratio=0.3,
    )
    # elect outputs are replicated (psum); screening outputs are dp-sharded
    # and need a cross-process gather to materialize on every host
    from jax.experimental import multihost_utils

    accept = np.asarray(multihost_utils.process_allgather(scores.accept, tiled=True))
    cost = np.asarray(multihost_utils.process_allgather(scores.cost, tiled=True))
    np.savez(
        os.path.join(outdir, f"proc{pid}.npz"),
        sel=np.asarray(delta.sel),
        sup=np.asarray(delta.sup),
        total=np.asarray(delta.total),
        accept=accept,
        cost=cost,
        ops=ops,
        vals=vals,
        start=start,
        fwd=fwd,
        a=a,
        la=la,
        b=b,
        lb=lb,
    )
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
