"""On-chip correctness pin for the f64-tier measurement transform path.

site_to_r_batched routes f64 inputs through a df32 Ozaki digit-plane
matmul ON ACCELERATORS ONLY (measure/transforms.py — XLA's emulated f64
dot is ~20x slower), so the CPU test suite never exercises that branch.
This compares it against a host-exact accumulation on the real chip.
Part of tools/tpu_checklist.sh.
"""

import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.measure import transforms
    from dqmc_tpu.measure.context import make_context

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    lat = square_lattice(8, 8)
    ctx = make_context(lat, jnp.float64)
    ns = lat.n_sites
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((3, ns, ns)))
    out = jax.jit(lambda x: transforms.site_to_r_batched(x, ctx))(X)
    out = np.asarray(out).reshape(3, -1)
    nd = out.shape[1]
    pc = np.asarray(ctx.pair_cols)
    ref = np.zeros((3, nd))
    Xn = np.asarray(X).reshape(3, -1)
    for k in range(ns * ns):
        ref[:, pc[k]] += Xn[:, k]
    ref /= ctx.n_cells
    err = np.abs(out - ref).max()
    print(f"site_to_r f64->df32 path vs host-exact: max err {err:.3e}",
          file=sys.stderr)
    assert err < 1e-12, err
    print('{"ok": true, "check": "f64-tier site_to_r df32 path", '
          f'"err": {err:.3e}}}')


if __name__ == "__main__":
    main()
