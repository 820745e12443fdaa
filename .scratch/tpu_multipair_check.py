"""TPU validation: multi-pair kernel (k=1,2,3) vs CPU dense reference.
Computes overlap |<ref|out>|^2 on device; prints one line per case."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rocquantum_tpu.ops.pallas_sv import apply_fused_layer, pack_gate_mats

rng = np.random.default_rng(1)
def ry(t):
    c, s = np.cos(t/2), np.sin(t/2)
    return np.array([[c, -s], [s, c]])
def rx(t):
    c, s = np.cos(t/2), np.sin(t/2)
    return np.array([[c, -1j*s], [-1j*s, c]])

def cpu_ref(n, specs, mats):
    st = np.zeros(1<<n, complex); st[0] = 1.0
    for spec, m in zip(specs, mats):
        if spec[0] == "CNOT":
            c, t = spec[1], spec[2]
            v = st.reshape([2]*n)  # axis j = bit n-1-j
            # apply CNOT via index arithmetic
            idx = np.arange(1<<n)
            src = idx ^ (((idx >> c) & 1) << t)
            st = st[src]
        else:
            q = spec[1]
            v = st.reshape(-1, 2, 1<<q)  # middle axis = bit q
            a,b,cc,d = m[0,0], m[0,1], m[1,0], m[1,1]
            x0 = v[:,0,:].copy(); x1 = v[:,1,:].copy()
            v[:,0,:] = a*x0 + b*x1; v[:,1,:] = cc*x0 + d*x1
            st = v.reshape(-1)
    return st

def check(n, specs, mats, pairs, flags, label):
    ref = cpu_ref(n, specs, mats)
    gm = jnp.asarray(pack_gate_mats(mats))
    rr = jnp.asarray(ref.real, jnp.float32); ri = jnp.asarray(ref.imag, jnp.float32)
    @jax.jit
    def prog(gm, rr, ri):
        re = jnp.zeros((1<<n,), jnp.float32).at[0].set(1.0)
        im = jnp.zeros((1<<n,), jnp.float32)
        ore, oim = apply_fused_layer(re, im, specs, gm, pair_bits=pairs, real_flags=flags)
        dot_re = jnp.sum(ore*rr + oim*ri)
        dot_im = jnp.sum(ore*ri - oim*rr)
        return dot_re*dot_re + dot_im*dot_im
    t0 = time.time()
    try:
        ov = float(prog(gm, rr, ri))
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    print(f"{label}: overlap={ov:.8f} ({time.time()-t0:.1f}s)", flush=True)

n = 20
# k=1 regression
specs = (("U",17),("U",3)); mats = [rx(0.5), ry(0.8)]
check(n, specs, mats, (17,), (False,True), "k1")
# k=2
specs = (("U",17),("U",18),("CNOT",17,18),("U",9)); mats = [rx(0.5), ry(0.8), np.eye(2), ry(0.3)]
check(n, specs, mats, (17,18), (False,True,True,True), "k2")
# k=3
specs = (("U",17),("U",18),("U",19),("CNOT",18,19),("U",1))
mats = [rx(0.5), ry(0.8), rx(1.1), np.eye(2), ry(0.3)]
check(n, specs, mats, (17,18,19), (False,True,False,True,True), "k3")
print("DONE", flush=True)
