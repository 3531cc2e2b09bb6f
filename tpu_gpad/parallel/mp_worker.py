"""Multi-process ``jax.distributed`` check: the multi-host/DCN code path.

SURVEY.md section 4(d) plans "multi-host tests on CPU via jax.distributed +
fake-device meshes — the thing the reference lacks entirely". The virtual
8-device mesh used everywhere else in tests/ is a SINGLE process; this module
actually crosses a process boundary: N processes x M virtual CPU devices
each, one global mesh, ``solve_batch_sharded`` in fixed and eps modes (the
eps all-converged psum spans processes — on real hardware that reduction
rides DCN between hosts).

Two entry points:

- ``python -m tpu_gpad.parallel.mp_worker --process-id i ...`` — one worker
  process (process 0 hosts the coordinator). Verifies its addressable
  shards against the NumPy oracle; process 0 also allgathers the full
  result and writes it to ``--out`` for the parent to compare against a
  single-process solve.
- ``run_multiprocess_check(...)`` — parent-side launcher used by
  tests/test_multiprocess.py and ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def _worker(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    import tpu_gpad
    from tpu_gpad import problems
    from tpu_gpad.parallel import make_mesh, shard_batch, solve_batch_sharded
    from tpu_gpad.solver import SolverConfig
    from tpu_gpad.solver.reference import gpad_solve_qp

    assert jax.process_count() == args.num_processes
    n_dev = len(jax.devices())
    assert n_dev == args.num_processes * args.local_devices, (
        f"{n_dev} global devices, expected "
        f"{args.num_processes}x{args.local_devices}"
    )

    qp = tpu_gpad.condense(problems.battery(n_cells=3, horizon=4))
    data = tpu_gpad.dualize(qp, iterations=400, paired=True)
    rng = np.random.default_rng(7)  # same seed in every process
    B = 4 * n_dev
    X0 = rng.uniform(-0.5, 0.5, size=(B, 3)).astype(np.float32)

    mesh = make_mesh(n_data=n_dev)
    X0g = shard_batch(mesh, jnp.asarray(X0))

    # fixed mode: each process checks ITS addressable shards vs the oracle
    out = solve_batch_sharded(data, X0g, SolverConfig(iterations=100), mesh=mesh)
    n_checked = 0
    for shard in out.u.addressable_shards:
        i0 = shard.index[0].start or 0
        u_loc = np.asarray(shard.data)
        for j in range(u_loc.shape[0]):
            ref = gpad_solve_qp(
                qp, X0[i0 + j].astype(np.float64), iterations=100
            )
            np.testing.assert_allclose(u_loc[j], ref.u, atol=1e-4)
            n_checked += 1
    assert n_checked == B // args.num_processes

    # eps mode: the all-converged stopping psum crosses the process boundary
    cfg_eps = SolverConfig(
        mode="eps", eps_g=1e-4, eps_V=1e-4, check_every=10,
        iterations=400, restart=True,
    )
    out_eps = solve_batch_sharded(data, X0g, cfg_eps, mesh=mesh)

    # gather the full (cross-process) results and let process 0 persist them
    u_fixed = multihost_utils.process_allgather(out.u, tiled=True)
    u_eps = multihost_utils.process_allgather(out_eps.u, tiled=True)
    iters_eps = multihost_utils.process_allgather(out_eps.iterations, tiled=True)
    conv_eps = multihost_utils.process_allgather(out_eps.converged, tiled=True)
    assert np.asarray(conv_eps).all(), "eps scenarios failed to converge"
    if args.process_id == 0 and args.out:
        np.savez(
            args.out,
            X0=X0,
            u_fixed=np.asarray(u_fixed),
            u_eps=np.asarray(u_eps),
            iters_eps=np.asarray(iters_eps),
        )
    print(
        f"MP_OK process={args.process_id} devices={n_dev} "
        f"checked={n_checked} eps_converged={int(np.asarray(conv_eps).sum())}/{B}",
        flush=True,
    )


def run_multiprocess_check(
    num_processes: int = 2,
    local_devices: int = 4,
    out_path: str | None = None,
    timeout_s: float = 600.0,
) -> None:
    """Launch the N-process jax.distributed run and raise on any failure.

    Used by tests/test_multiprocess.py and the driver dryrun. Each child is
    a fresh interpreter with ``local_devices`` virtual CPU devices; process
    0 hosts the TCP coordinator on a free localhost port."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    procs = []
    for pid in range(num_processes):
        cmd = [
            sys.executable, "-m", "tpu_gpad.parallel.mp_worker",
            "--num-processes", str(num_processes),
            "--process-id", str(pid),
            "--port", str(port),
            "--local-devices", str(local_devices),
        ]
        if pid == 0 and out_path:
            cmd += ["--out", str(out_path)]
        procs.append(
            subprocess.Popen(
                cmd, cwd=repo_root, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout_s)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise RuntimeError(
            "multi-process check timed out; partial output:\n"
            + "\n---\n".join(outputs)
        )
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        if p.returncode != 0 or "MP_OK" not in out:
            raise RuntimeError(
                f"worker {pid} failed (rc={p.returncode}):\n{out}"
            )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--local-devices", type=int, default=4)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    _worker(args)


if __name__ == "__main__":
    main()
