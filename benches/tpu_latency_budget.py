"""Latency budget for the 100 ms-class pose rungs (VERDICT r4 item 8).

The thin rungs (parking-garage 1.35x, sphere2500 ~1.5x) are
dispatch-bound: on the remote-tunnel TPU runtime every non-trivial
executable launch costs ~23 ms of round-trip before any device work
(measured by timing `jit(lambda x: x + const)` — 23.1 ms — against
`jit(lambda x: x + 1)` — 0.02 ms; see doc/performance.md round-5
latency-budget table), and fetching the result tree costs another ~23 ms.
A single-dispatch LM solve therefore carries ~46 ms of FIXED tunnel cost
that no solver improvement can remove; on a locally attached TPU the
same fixed cost is sub-millisecond.

This harness measures, for each rung:
  - total: wall time of a warm `optimize()` (what bench.py reports)
  - dispatch+device: wall time of the solve dispatch alone
    (block_until_ready on the carried state, no host fetch)
  - fetch: device_get of the final state tree
  - device/iter: (dispatch+device - dispatch_floor) / LM iterations

Usage: python benches/tpu_latency_budget.py [--runs 3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

RUNGS = {
    # name -> (generator kwargs, baseline ms)
    "sphere2500": (dict(n_poses=2500, rings=50, seed=0), 176.3),
    "parking-garage": (dict(n_poses=1661, rings=30, seed=0,
                            closure_strides=(1, 2, 3)), 153.1),
    "cubicle": (dict(n_poses=5750, rings=230, seed=0,
                     closure_strides=(1, 2)), 512.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--rungs", nargs="+", default=list(RUNGS))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import apex_tpu as apx
    from apex_tpu.io import synthetic

    # dispatch floor: a minimal executable that still carries a captured
    # buffer (the trivial x+1 form takes a fast path the real
    # executables never see)
    const = jnp.asarray(np.arange(16, dtype=np.float32))
    probe = jax.jit(lambda x: x + const[:8])
    z = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(probe(z))
    floor = min(
        _timed(lambda: jax.block_until_ready(probe(z))) for _ in range(10))
    print(f"# dispatch floor (captured-const executable): {floor * 1e3:.1f} ms",
          flush=True)

    for name in args.rungs:
        kw, baseline = RUNGS[name]
        g = synthetic.synthetic_pose_graph_3d(**kw)
        cp = g.to_problem().compile(dtype=np.float32)
        cfg = apx.LevenbergMarquardtConfig(
            mode="jit", max_iterations=100, cost_tolerance=1e-4,
            linear_solver_type="sparse_cholesky", damping="auto")
        lm = apx.LevenbergMarquardt(cfg)
        res = lm.optimize(cp)  # warmup/compile
        total = min(_timed(lambda: lm.optimize(cp)) for _ in range(args.runs))

        init_run, _ = lm._run_cache[id(cp)]
        vals = cp.initial_values()
        cap = jnp.asarray(cfg.max_iterations, jnp.int32)
        state = init_run(vals, cap)
        jax.block_until_ready(state)
        t_disp = min(
            _timed(lambda: jax.block_until_ready(init_run(vals, cap)))
            for _ in range(args.runs))
        t_fetch = min(_timed(lambda: jax.device_get(state))
                      for _ in range(args.runs))
        dev = t_disp - floor
        per_iter = dev / max(res.iterations, 1)
        print(
            f"{name:>16}: total {total * 1e3:7.1f} ms = dispatch+device "
            f"{t_disp * 1e3:6.1f} + fetch {t_fetch * 1e3:5.1f} (+host) | "
            f"device ~{dev * 1e3:6.1f} ms / {res.iterations} iters = "
            f"{per_iter * 1e3:5.1f} ms/iter | fixed tunnel cost "
            f"{(floor + t_fetch) * 1e3:5.1f} ms = "
            f"{(floor + t_fetch) / total * 100:2.0f}% of wall | "
            f"{baseline / (total * 1e3):.2f}x baseline "
            f"({baseline / (dev * 1e3):.2f}x on device time alone)",
            flush=True)


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
