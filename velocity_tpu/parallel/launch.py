"""Multi-host runtime entry (BASELINE.json config 5; SURVEY.md §2.4 comm row).

On a real TPU pod slice every host runs the same program; this module owns the
runtime bring-up:

  1. ``initialize()`` calls ``jax.distributed.initialize`` (env-driven on
     Cloud TPU: coordinator/process count/process id come from the TPU
     metadata, so bare ``initialize()`` is correct there; off-pod the three
     values are passed explicitly);
  2. ``global_mesh()`` builds the pod-wide mesh from ``jax.devices()``, which
     after initialize() spans ALL hosts' chips — collectives over its axes
     ride ICI within a slice and DCN across slices, chosen by XLA;
  3. the distributed solvers (parallel/ba_dist.py, parallel/windows.py) run
     unchanged over that mesh: ``make_global`` turns each host's copy of a
     global numpy array into a sharded ``jax.Array``.

``selftest_multiprocess()`` validates the whole path without a pod: it spawns
N real OS processes (JAX treats each as a "host"), each owning a disjoint set
of virtual CPU devices, runs ``jax.distributed.initialize`` + a pod-style
point-sharded Schur BA over the global 2-process mesh, and checks the result
against the single-process solver. CLI:

  python -m velocity_tpu.parallel.launch --selftest
  python -m velocity_tpu.parallel.launch --worker ...   (internal)
"""

from __future__ import annotations

import os
import sys

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_count: int | None = None) -> None:
    """Bring up the multi-host runtime.

    On Cloud TPU all arguments default from the environment; for CPU/GPU
    clusters pass coordinator ("host:port"), process count and id. With
    ``local_device_count`` the host platform exposes that many virtual CPU
    devices (must run before any backend initializes).
    """
    import jax

    if local_device_count is not None:
        import re

        # FORCE the requested count — an inherited flag (e.g. a test
        # harness's 8-device override) would give every process the wrong
        # local device set and break mesh/process alignment
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={local_device_count}"
        ).strip()
        # CPU "hosts": pick the platform and its cross-process collective
        # implementation BEFORE the runtime comes up
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_sizes: dict[str, int] | None = None):
    """Pod-wide mesh over all hosts' devices (call after ``initialize``)."""
    from velocity_tpu.parallel.mesh import make_mesh

    return make_mesh(axis_sizes)


def make_global(mesh, pspec, value: np.ndarray):
    """Shard a host-replicated numpy array into a global ``jax.Array``.

    Every process passes the SAME full array; each host materializes only its
    addressable shards (multi-host safe, unlike plain ``jnp.asarray``).
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def run_distributed_ba(problem, mesh=None, axis: str = "point", config=None):
    """Point-sharded Schur BA over the pod mesh (ba_dist.ba_schur_sharded,
    with the problem arrays lifted to global jax.Arrays first)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from velocity_tpu.config import BAConfig
    from velocity_tpu.parallel.ba_dist import ba_schur_sharded
    from velocity_tpu.solvers.ba import BAProblem

    if mesh is None:
        mesh = global_mesh({axis: -1})
    if config is None:
        config = BAConfig()
    gp = BAProblem(
        intr=problem.intr,
        pixels=make_global(mesh, P(None, axis, None), np.asarray(problem.pixels)),
        mask=make_global(mesh, P(None, axis), np.asarray(problem.mask)),
        points0=make_global(mesh, P(axis, None), np.asarray(problem.points0)),
        cams0=make_global(mesh, P(), np.asarray(problem.cams0)),
    )
    return ba_schur_sharded(gp, mesh, axis, config)


# --------------------------------------------------------------- selftest
def _make_problem(nc=6, nt=64, seed=0):
    import jax.numpy as jnp
    from velocity_tpu.geometry import Intrinsics
    from velocity_tpu.solvers.ba import BAProblem

    rng = np.random.default_rng(seed)
    intr = Intrinsics(fx=jnp.float32(500.0), fy=jnp.float32(500.0),
                      cx=jnp.float32(200.0), cy=jnp.float32(150.0),
                      skew=jnp.float32(0.0))
    pts = np.concatenate(
        [rng.uniform(-1, 1, (nt, 2)), rng.uniform(4, 6, (nt, 1))], axis=1
    ).astype(np.float32)
    cams = np.zeros((nc, 6), np.float32)
    cams[:, 0] = np.linspace(0, 0.4, nc)
    pc = pts[None] + cams[:, None, 0:3]
    pix = np.stack([500 * pc[..., 0] / pc[..., 2] + 200,
                    500 * pc[..., 1] / pc[..., 2] + 150], axis=-1)
    pix = (pix + rng.normal(0, 0.2, pix.shape)).astype(np.float32)
    pts0 = (pts + rng.normal(0, 0.02, pts.shape)).astype(np.float32)
    return BAProblem(intr=intr, pixels=pix, mask=np.ones((nc, nt), bool),
                     points0=pts0, cams0=cams)


def _worker(coordinator: str, nprocs: int, pid: int, devs: int) -> int:
    import jax

    initialize(coordinator, nprocs, pid, local_device_count=devs)
    from velocity_tpu.config import BAConfig

    assert jax.process_count() == nprocs, jax.process_count()
    mesh = global_mesh({"point": nprocs * devs})
    prob = _make_problem()
    res = run_distributed_ba(prob, mesh, "point", BAConfig(max_iters=6))
    # gather the point shards to every host (all_gather over the mesh axis)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = jax.device_put(res.points, NamedSharding(mesh, P()))
    pts = np.asarray(rep.addressable_data(0))
    if pid == 0:
        np.save("/tmp/velocity_launch_selftest.npy", pts.reshape(-1, 3))
        print(f"worker0: mesh={dict(mesh.shape)} "
              f"processes={jax.process_count()} ok", flush=True)
    return 0


def _worker2(coordinator: str, nprocs: int, pid: int, devs: int) -> int:
    """2-axis window x point worker: the windowed_ba the long-video driver
    actually runs (VERDICT r4 weak #7 asked for multi-process coverage of
    this solver, not just the 1-axis point-sharded one)."""
    import jax

    initialize(coordinator, nprocs, pid, local_device_count=devs)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from velocity_tpu.config import BAConfig
    from velocity_tpu.parallel.windows import windowed_ba

    assert jax.process_count() == nprocs, jax.process_count()
    mesh = global_mesh({"window": nprocs, "point": devs})
    pix, msk, pts0, cams0, intr = _make_windowed_problem()
    g_pix = make_global(mesh, P("window", None, "point", None), pix)
    g_msk = make_global(mesh, P("window", None, "point"), msk)
    g_pts = make_global(mesh, P("window", "point", None), pts0)
    g_cams = make_global(mesh, P("window", None, None), cams0)
    ptsR, camsR, iters = windowed_ba(
        g_pix, g_msk, g_pts, g_cams, intr, mesh,
        config=BAConfig(max_iters=6), fix_rotations=True, pin_tracks=2,
    )
    rep = jax.device_put(camsR, NamedSharding(mesh, P()))
    cams = np.asarray(rep.addressable_data(0))
    if pid == 0:
        np.save("/tmp/velocity_launch_selftest2.npy", cams)
        print(f"worker2-0: mesh={dict(mesh.shape)} "
              f"processes={jax.process_count()} ok", flush=True)
    return 0


def _make_windowed_problem(nw=2, nc=6, nt=64, seed=1):
    import jax.numpy as jnp
    from velocity_tpu.geometry import Intrinsics

    rng = np.random.default_rng(seed)
    intr = Intrinsics(fx=jnp.float32(500.0), fy=jnp.float32(500.0),
                      cx=jnp.float32(200.0), cy=jnp.float32(150.0),
                      skew=jnp.float32(0.0))
    pix = np.zeros((nw, nc, nt, 2), np.float32)
    pts0 = np.zeros((nw, nt, 3), np.float32)
    cams0 = np.zeros((nw, nc, 6), np.float32)
    for w in range(nw):
        pts = np.concatenate(
            [rng.uniform(-1, 1, (nt, 2)), rng.uniform(4, 6, (nt, 1))], axis=1
        ).astype(np.float32)
        cams0[w, :, 0] = np.linspace(0, 0.4, nc)
        pc = pts[None] + cams0[w, :, None, 0:3]
        p = np.stack([500 * pc[..., 0] / pc[..., 2] + 200,
                      500 * pc[..., 1] / pc[..., 2] + 150], axis=-1)
        pix[w] = p + rng.normal(0, 0.2, p.shape)
        pts0[w] = pts + rng.normal(0, 0.02, pts.shape)
    return pix, np.ones((nw, nc, nt), bool), pts0, cams0, intr


def selftest_multiprocess_windowed(nprocs: int = 2, devs: int = 2,
                                   port: int = 53433) -> bool:
    """2-axis (window x point) multi-process selftest of windowed_ba vs the
    single-process result on a local 1-process mesh of the same shape."""
    import subprocess

    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "velocity_tpu.parallel.launch",
             "--worker2", coord, str(nprocs), str(pid), str(devs)],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
        )
        for pid in range(nprocs)
    ]
    rc = [p.wait(timeout=600) for p in procs]
    if any(rc):
        return False
    got = np.load("/tmp/velocity_launch_selftest2.npy")

    import jax
    import jax.numpy as jnp
    from velocity_tpu.config import BAConfig
    from velocity_tpu.parallel.mesh import make_mesh
    from velocity_tpu.parallel.windows import windowed_ba

    pix, msk, pts0, cams0, intr = _make_windowed_problem()
    # single-device reference: a 1x1 mesh runs every window via the inner
    # vmap — same math, no collectives
    mesh = make_mesh({"window": 1, "point": 1},
                     devices=np.array(jax.devices()[:1]).reshape(1, 1))
    _p, camsR, _i = windowed_ba(
        jnp.asarray(pix), jnp.asarray(msk), jnp.asarray(pts0),
        jnp.asarray(cams0), intr, mesh, config=BAConfig(max_iters=6),
        fix_rotations=True, pin_tracks=2,
    )
    ref = np.asarray(camsR)
    ok = np.allclose(got, ref, atol=1e-5)
    print(f"selftest_multiprocess_windowed: {'OK' if ok else 'MISMATCH'} "
          f"(max diff {np.abs(got - ref).max():.2e})")
    return ok


def selftest_multiprocess(nprocs: int = 2, devs: int = 2,
                          port: int = 53421) -> bool:
    """Spawn nprocs real processes, run pod-style distributed BA, and check
    the result against the single-process Schur solver."""
    import subprocess

    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "velocity_tpu.parallel.launch", "--worker",
             coord, str(nprocs), str(pid), str(devs)],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
        )
        for pid in range(nprocs)
    ]
    rc = [p.wait(timeout=600) for p in procs]
    if any(rc):
        return False
    got = np.load("/tmp/velocity_launch_selftest.npy")

    # single-process reference
    import jax

    from velocity_tpu.config import BAConfig
    from velocity_tpu.solvers.schur import ba_schur

    prob = _make_problem()
    import jax.numpy as jnp

    ref = ba_schur(
        prob._replace(pixels=jnp.asarray(prob.pixels),
                      mask=jnp.asarray(prob.mask),
                      points0=jnp.asarray(prob.points0),
                      cams0=jnp.asarray(prob.cams0)),
        BAConfig(max_iters=6),
    )
    ok = np.allclose(got[: prob.points0.shape[0]], np.asarray(ref.points),
                     atol=1e-5)
    print(f"selftest_multiprocess: {'OK' if ok else 'MISMATCH'} "
          f"(max diff {np.abs(got[: prob.points0.shape[0]] - np.asarray(ref.points)).max():.2e})")
    return ok


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv[:1] == ["--worker"]:
        return _worker(argv[1], int(argv[2]), int(argv[3]), int(argv[4]))
    if argv[:1] == ["--worker2"]:
        return _worker2(argv[1], int(argv[2]), int(argv[3]), int(argv[4]))
    if argv[:1] == ["--selftest"]:
        return 0 if selftest_multiprocess() else 1
    if argv[:1] == ["--selftest-windowed"]:
        return 0 if selftest_multiprocess_windowed() else 1
    print(__doc__)
    return 0


if __name__ == "__main__":
    sys.exit(main())
