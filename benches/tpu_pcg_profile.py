"""Micro-profile the implicit-Schur PCG building blocks on the default
device. Times, per op: S-apply, its pieces (W^T x, W u, Hpp solve, Hcc
matvec), the preconditioner apply, and the f64 dots — each in a jitted
fori_loop of REPS iterations so dispatch latency amortizes out.

Usage: python benches/tpu_pcg_profile.py [n_cameras n_points obs_per_cam]
"""

import sys
import time

sys.path.insert(0, ".")

REPS = 50


def timeit(name, fn, *args):
    import jax

    out = jax.block_until_ready(jax.jit(fn)(*args))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"  {name:34s} {dt:8.2f} ms/op", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apex_tpu.ba import build_ba_problem
    from apex_tpu.io import synthetic
    from apex_tpu.linalg.schur import SchurContext, landmark_inverse

    c, p, opc = (int(x) for x in (sys.argv[1:4] or [1723, 156502, 222]))
    ds = synthetic.synthetic_ba_large(n_cameras=c, n_points=p, obs_per_camera=opc)
    cp = build_ba_problem(ds, mode="self_calibration").compile(dtype=np.float32)
    ctx = SchurContext(cp, variant="iterative", preconditioner="schur_jacobi")
    values = cp.initial_values()
    K = sum(int(mc.ent_ids.shape[0]) for mc in ctx.mcouplings)
    print(f"C={c} P={p} K={K} Dc={ctx.Dc} device={jax.devices()[0].platform}",
          flush=True)

    Hcc, gc, Hpp, gp, Ws, cost = jax.jit(
        lambda v: ctx.assemble(v, jnp.asarray(1e-3, cp.dtype)))(values)
    Hpp_inv = jax.jit(landmark_inverse)(Hpp)
    x = jnp.ones((ctx.Dc,), cp.dtype)

    def loop(f):
        def run(x0):
            return jax.lax.fori_loop(0, REPS, lambda i, x: f(x), x0)
        return run

    # pieces (each maps x -> x-shaped so fori_loop chains without fusion
    # collapsing the loop)
    def wt_x(x):
        t = ctx._wt_x(Ws, x)
        return x + t.sum() * 0

    def w_u(x):
        u = jnp.ones((ctx.num_landmarks, 3), cp.dtype) * x[0]
        return x + ctx._w_u(Ws, u)[: ctx.Dc] * 1e-30

    def hpp_solve(x):
        t = jnp.ones((ctx.num_landmarks, 3), cp.dtype) * x[0]
        from apex_tpu.linalg.smallmm import es as _es
        u = _es("kij,kj->ki", Hpp_inv, t)
        return x + u.sum() * 0

    def hcc_mv(x):
        return x + ctx._hcc_matvec(Hcc, x) * 1e-30

    def s_apply(x):
        t = ctx._wt_x(Ws, x)
        from apex_tpu.linalg.smallmm import es as _es
        u = _es("kij,kj->ki", Hpp_inv, t)
        return ctx._hcc_matvec(Hcc, x) - ctx._w_u(Ws, u)

    inv_blocks = jax.jit(lambda: ctx._entity_prec_inv(
        Hcc, Hpp_inv, Ws, schur_jacobi=True))()

    def prec(x):
        return ctx._entity_prec_apply(inv_blocks, x)

    def dots(x):
        return x + ctx._dot64(x, x).astype(x.dtype) * 1e-30

    timeit("W^T x (gather+segsum->lm)", loop(wt_x), x)
    timeit("W u (gather+segsum->ent)", loop(w_u), x)
    timeit("Hpp^-1 t (batched 3x3)", loop(hpp_solve), x)
    timeit("Hcc matvec", loop(hcc_mv), x)
    timeit("S apply (full)", loop(s_apply), x)
    timeit("preconditioner apply", loop(prec), x)
    timeit("f64 dot", loop(dots), x)

    def pcg_full(x):
        return ctx._pcg(s_apply, prec, x, rtol=1e-20, max_iter=REPS)

    import time as _t
    jax.block_until_ready(jax.jit(pcg_full)(x))
    t0 = _t.perf_counter()
    jax.block_until_ready(jax.jit(pcg_full)(x))
    print(f"  {'full PCG iteration':34s} {(_t.perf_counter()-t0)/REPS*1e3:8.2f} ms/op",
          flush=True)


def profile_step(c=1723, p=156502, opc=222):
    """Time the full LM step and its phases at scale."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import apex_tpu as apx
    from apex_tpu.ba import build_ba_problem
    from apex_tpu.io import synthetic
    from apex_tpu.linalg.schur import SchurContext, landmark_inverse

    ds = synthetic.synthetic_ba_large(n_cameras=c, n_points=p, obs_per_camera=opc)
    cp = build_ba_problem(ds, mode="self_calibration").compile(dtype=np.float32)
    ctx = SchurContext(cp, variant="iterative", preconditioner="schur_jacobi")
    values = cp.initial_values()
    dt = cp.dtype

    def t(name, fn, *args, reps=3):
        out = jax.block_until_ready(jax.jit(fn)(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"  {name:30s} {(time.perf_counter()-t0)/reps*1e3:9.1f} ms",
              flush=True)
        return out

    t("cost", cp.cost, values)
    lam = jnp.asarray(1e-3, dt)
    Hcc, gc, Hpp, gp, Ws, cost = t("assemble", lambda v: ctx.assemble(v, lam), values)
    Hpp_inv = t("landmark_inverse", landmark_inverse, Hpp)
    t("prec build", lambda: ctx._entity_prec_inv(Hcc, Hpp_inv, Ws, True))
    t("schur solve (full)", lambda v: ctx.solve(v, lam, iteration=0)[0], values)
    t("schur solve (it=29)", lambda v: ctx.solve(v, lam, iteration=29)[0], values)

    lm = apx.LevenbergMarquardt(apx.LevenbergMarquardtConfig(
        linear_solver_type="schur_implicit", schur_preconditioner="schur_jacobi",
        max_iterations=30, mode="jit"))
    step = lm._make_step_fn(cp)
    jac = jnp.ones((cp.total_dof,), dt)
    args = (values, lam, jnp.asarray(2.0, dt), cp.cost(values),
            jnp.asarray(0, jnp.int32), jac)
    t("full LM step (it=0)", step, *args)
    args29 = (values, lam, jnp.asarray(2.0, dt), cp.cost(values),
              jnp.asarray(29, jnp.int32), jac)
    t("full LM step (it=29)", step, *args29)


if __name__ == "__main__":
    if sys.argv[1:2] == ["step"]:
        if len(sys.argv) > 2:
            profile_step(*(int(x) for x in sys.argv[2:5]))
        else:
            profile_step()
    else:
        main()
