"""Mosaic feasibility: (32,4096)->(32,32,128) reshape + dot_general on MXU
inside a pallas kernel, fp32 HIGHEST precision."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T, C = 32, 4096

def kernel(m_ref, x_ref, o_ref):
    x = x_ref[...].reshape(T, C // 128, 128)
    m = m_ref[...]
    y = jax.lax.dot_general(x, m, (((2,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    o_ref[...] = y.reshape(T, C)

def run(n_rows):
    R = n_rows
    x = np.random.default_rng(0).normal(size=(R, C)).astype(np.float32)
    m = np.random.default_rng(1).normal(size=(128, 128)).astype(np.float32)
    blk = pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(kernel, grid=(R // T,),
                       in_specs=[mspec, blk], out_specs=blk,
                       out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
                       input_output_aliases={1: 0})
    @jax.jit
    def prog(m, x):
        y = f(m, x)
        return jnp.sum(y * y)
    t0 = time.time()
    got = float(prog(jnp.asarray(m), jnp.asarray(x)))
    ref = x.reshape(R, C // 128, 128) @ m
    want = float(np.sum(ref * ref))
    rel = abs(got - want) / abs(want)
    print(f"rows={R}: rel_err={rel:.2e} compile+run={time.time()-t0:.1f}s", flush=True)

run(1 << 7)
# also a left-dot on the row axis: (32,32)@(32,4096)
def kernel2(a_ref, x_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(a_ref[...], x_ref[...],
                                     (((1,), (0,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST,
                                     preferred_element_type=jnp.float32)
def run2():
    R = 1 << 7
    x = np.random.default_rng(0).normal(size=(R, C)).astype(np.float32)
    a = np.random.default_rng(1).normal(size=(T, T)).astype(np.float32)
    blk = pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(kernel2, grid=(R // T,),
                       in_specs=[aspec, blk], out_specs=blk,
                       out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
                       input_output_aliases={1: 0})
    @jax.jit
    def prog(a, x):
        return jnp.sum(f(a, x) ** 2)
    t0 = time.time()
    got = float(prog(jnp.asarray(a), jnp.asarray(x)))
    want = 0.0
    for i in range(R // T):
        want += float(np.sum((a @ x[i*T:(i+1)*T]) ** 2))
    rel = abs(got - want) / abs(want)
    print(f"leftdot: rel_err={rel:.2e} ({time.time()-t0:.1f}s)", flush=True)
run2()
print("DONE", flush=True)
