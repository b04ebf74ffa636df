"""Per-phase micro-profile of the UniformSchur plane pipeline on the
default device: assembly, landmark-plane inverse, preconditioner build,
each PCG product, one full linear solve, and a full LM step. Each phase
is jitted and amortized over a fori_loop (or repeat calls for the
once-per-step phases) so dispatch latency washes out.

Usage: python benches/tpu_plane_profile.py [n_cameras n_points obs_per_cam]
"""

import sys
import time

sys.path.insert(0, ".")

REPS = 20


def _sync(x):
    import jax

    # block_until_ready is unreliable on the remote TPU backend
    # (doc/performance.md round-3 note) — fetch a dependent scalar.
    leaves = jax.tree_util.tree_leaves(x)
    return float(leaves[0].ravel()[0].astype("float32"))


def timeit(name, fn, *args, reps=1):
    from apex_tpu.utils.hoist import hoisted_jit

    # hoist closed-over index plans/data to runtime args: jitting the raw
    # closure embeds them as MLIR constants and the remote compile tunnel
    # rejects the >200 MB executable with HTTP 413 (utils/hoist.py).
    f = hoisted_jit(fn, *args)
    _sync(f(*args))  # compile
    t0 = time.perf_counter()
    out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {name:38s} {dt:9.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apex_tpu.ba import build_ba_problem
    from apex_tpu.io import synthetic
    from apex_tpu.linalg.schur import SchurContext
    from apex_tpu.linalg.schur_planes import sym6_clamped_inv, sym6_matvec

    c, p, opc = (int(x) for x in (sys.argv[1:4] or [1723, 156502, 394]))
    t0 = time.perf_counter()
    ds = synthetic.synthetic_ba_large(n_cameras=c, n_points=p,
                                      obs_per_camera=opc, seed=0)
    cp = build_ba_problem(ds, mode="self_calibration").compile(dtype=np.float32)
    ctx = SchurContext(cp, variant="iterative", preconditioner="schur_jacobi")
    u = ctx.uniform
    assert u is not None, "problem did not take the plane path"
    values = cp.initial_values()
    K = sum(int(g.ent_ids.shape[0]) for g in u.ugroups)
    print(f"C={c} P={p} K={K} Dc={ctx.Dc} device={jax.devices()[0].platform} "
          f"build {time.perf_counter() - t0:.0f}s", flush=True)
    dt_ = cp.dtype
    damping = jnp.asarray(1e-3, dt_)

    # once-per-LM-step phases
    out = timeit("assemble (Hcc,gc,hpp6,gp3,W,cost)",
                 lambda v: u.assemble(v, damping), values)
    for ug in u.ugroups:
        if ug.lm_slot is None:
            continue
        g = u._group(ug.gi)
        timeit(f"  linearize_planes g{ug.gi} (K={g.count})",
               lambda v, g=g: u._linearize_planes(v, g), values)
    Hcc, gc, hpp6, gp3, Wps, cost = out
    hinv6 = timeit("sym6_clamped_inv", sym6_clamped_inv, hpp6)
    timeit("prec_blocks (Schur-Jacobi)",
           lambda: u.prec_blocks(Hcc, hinv6, Wps, True))
    timeit("cost only", cp.cost, values)

    # per-PCG-iteration products, fori_loop-amortized
    x = jnp.ones((ctx.Dc,), dt_)

    def loop(f):
        def run(x0):
            return jax.lax.fori_loop(0, REPS, lambda i, xx: f(xx), x0)
        return run

    def wt_x(xx):
        t = u.wt_x(Wps, xx)
        return xx + t.sum() * 1e-30

    def w_u(xx):
        t3 = jnp.ones((3, u.num_landmarks), dt_) * xx[0]
        return xx + u.w_u(Wps, t3) * 1e-30

    def hpp_mv(xx):
        t3 = jnp.ones((3, u.num_landmarks), dt_) * xx[0]
        return xx + sym6_matvec(hinv6, t3).sum() * 1e-30

    def hcc_mv(xx):
        return xx + ctx._hcc_matvec(Hcc, xx) * 1e-30

    def s_apply(xx):
        t = u.wt_x(Wps, xx)
        uu = sym6_matvec(hinv6, t)
        return ctx._hcc_matvec(Hcc, xx) - u.w_u(Wps, uu)

    timeit(f"W^T x (x{REPS})", loop(wt_x), x, reps=REPS)
    timeit(f"W u + ent segsum (x{REPS})", loop(w_u), x, reps=REPS)
    timeit(f"hpp6 matvec (x{REPS})", loop(hpp_mv), x, reps=REPS)
    timeit(f"Hcc matvec (x{REPS})", loop(hcc_mv), x, reps=REPS)
    timeit(f"full S-apply (x{REPS})", loop(s_apply), x, reps=REPS)

    fused = u.make_fused_apply_S(Hcc, hinv6, Wps)
    timeit(f"fused S-apply (x{REPS})", loop(lambda xx: fused(xx)), x,
           reps=REPS)

    # one full linear solve (forcing iteration 0 and late floor)
    timeit("linear solve (iter 0, loose rtol)",
           lambda v: u.solve(v, damping, iteration=0)[-1], values)
    timeit("linear solve (iter 9, rtol floor)",
           lambda v: u.solve(v, damping, iteration=9)[-1], values)


if __name__ == "__main__":
    main()
