"""Depth-accuracy sweep for ROCQ_DOT_PRECISION=bf16x3 (VERDICT r4 #5).

bf16x3 replaces the fused kernels' fp32-HIGHEST region dots with a manual
3-pass bf16 emulation — measured 13.8% faster on dot-bound lead passes
(91 vs 105.6 ms at n=29) and accurate at 2 layers (8.0e-7 vs plain XLA).
Promotion to default requires the error to stay bounded at DEPTH: this
sweep runs a deep RY+CNOT ring ansatz (n=20, up to 128 layers) under both
dot precisions and compares against the plain-XLA einsum engine.

Pass/fail: max |amp error| at depth 128 must stay within the f32 engine
tolerance (~1e-5) and grow sublinearly (error compounding ~sqrt(depth)
for rounding noise, not ~depth for a bias).

Run on the real chip:  python experiments/bf16x3_depth_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_ops(n, layers):
    from rocquantum_tpu.compiler.ir import CircuitIR, ParamRef
    ir = CircuitIR(n, name="sweep")
    for _ in range(layers):
        for q in range(n):
            ir.add("RY", [q], params=[ParamRef(q)])
        for q in range(n):
            ir.add("CNOT", [(q + 1) % n], controls=[q])
    return list(ir.ops)


def run_engine(n, depths, params_np, use_pallas):
    """ONE compiled single-layer program, chained (state carried between
    calls — >300-op unrolled programs OOM the remote compile service, and
    chained dispatch costs ~1 ms amortized); returns the state snapshot at
    each checkpoint depth."""
    import jax
    import jax.numpy as jnp
    from rocquantum_tpu.compiler.interpreter import execute_pair, init_real

    ops = build_ops(n, 1)

    @jax.jit
    def layer(re, im, params):
        re, im = execute_pair(re, im, ops, params, use_pallas=use_pallas)
        if im is None:
            im = jnp.zeros_like(re)
        return re, im

    params = jnp.asarray(params_np, jnp.float32)
    re, im = init_real(n), jnp.zeros((1 << n,), jnp.float32)
    snaps = {}
    t0 = time.perf_counter()
    for d in range(1, max(depths) + 1):
        re, im = layer(re, im, params)
        if d in depths:
            snaps[d] = np.asarray(re) + 1j * np.asarray(im)
    dt = time.perf_counter() - t0
    return snaps, dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    n = 20
    depths = (2, 8, 32, 128)
    rng = np.random.default_rng(0)
    params_np = rng.uniform(0.05, 1.0, size=(n,))
    # plain-XLA reference (no pallas kernels at all)
    ref, _ = run_engine(n, depths, params_np, use_pallas=False)
    os.environ["ROCQ_DOT_PRECISION"] = "highest"
    hi, t_hi = run_engine(n, depths, params_np, use_pallas=True)
    os.environ["ROCQ_DOT_PRECISION"] = "bf16x3"
    bf, t_bf = run_engine(n, depths, params_np, use_pallas=True)
    os.environ.pop("ROCQ_DOT_PRECISION", None)
    for d in depths:
        err_hi = float(np.max(np.abs(hi[d] - ref[d])))
        err_bf = float(np.max(np.abs(bf[d] - ref[d])))
        norm_bf = float(np.sum(np.abs(bf[d]) ** 2))
        print(f"layers={d:4d}  err(highest)={err_hi:.3e}  "
              f"err(bf16x3)={err_bf:.3e}  norm(bf16x3)={norm_bf:.9f}",
              flush=True)
    print(f"total wall highest={t_hi:.2f}s bf16x3={t_bf:.2f}s", flush=True)


if __name__ == "__main__":
    main()
