"""Multi-chip bundle adjustment: landmark-partitioned plane-pipeline Schur.

Runs the sharded LM step over an n-device mesh (real chips if you have
them; set XLA_FLAGS=--xla_force_host_platform_device_count=8 with
JAX_PLATFORMS=cpu to simulate). Each chip owns 1/n of the landmarks and
their observation planes; only the camera-entity system and one psum per
PCG iteration cross the mesh (SURVEY.md §2.6 / BASELINE north star).

Usage: python examples/multichip_ba.py [n_devices]
"""

import sys

sys.path.insert(0, ".")


def main():
    import os

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # some TPU plugins in this environment ignore the env var; the
        # config update is authoritative (must run before backend init)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from apex_tpu.ba import build_ba_problem, rmse
    from apex_tpu.io import synthetic
    from apex_tpu.parallel import make_sharded_schur_step

    devs = jax.devices()[:n]
    if len(devs) < n:
        sys.exit(f"need {n} devices, have {len(devs)} "
                 f"(set JAX_PLATFORMS=cpu for a virtual mesh)")
    mesh = Mesh(np.array(devs), ("data",))

    ds = synthetic.synthetic_ba(n_cameras=8, n_points=200, seed=0)
    cp = build_ba_problem(ds, mode="self_calibration").compile()
    step, _ = make_sharded_schur_step(cp, mesh)
    print(f"mesh: {n} devices | plane path: {hasattr(step, 'solve')} | "
          f"{ds.num_observations} observations, {ds.num_points} landmarks "
          f"(~{-(-ds.num_points // n)} per chip)")

    values = cp.initial_values()
    damping = jnp.asarray(1e-3, cp.dtype)
    nu = jnp.asarray(2.0, cp.dtype)
    cost = cp.cost(values)
    print(f"initial cost {float(cost):.6e} "
          f"(RMSE {rmse(float(cost), ds.num_observations):.3f} px)")
    for it in range(8):
        values, damping, nu, cost = step(values, damping, nu, cost)
        print(f"iter {it}: cost {float(cost):.6e} "
              f"(RMSE {rmse(float(cost), ds.num_observations):.3f} px, "
              f"damping {float(damping):.2e})")


if __name__ == "__main__":
    main()
