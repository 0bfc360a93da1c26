"""fp8_block XLA formulations: can XLA fuse (upcast * blockscale) into
one big dot's weight read?"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

L, K, N, M, B = 16, 4096, 14336, 32, 128
Kb = K // B
rng = np.random.RandomState(0)
qw = jnp.asarray(rng.randn(L, K, N).astype(np.float32) * 0.05).astype(jnp.float8_e4m3fn)
sc = jnp.asarray(rng.rand(L, Kb, N).astype(np.float32) * 0.01 + 1.0)
x = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
fetch = jax.jit(lambda t: t.ravel()[0])
gb = L * K * N / 1e9

def timeit(name, fn, n=10):
    r = fn(); np.asarray(fetch(r))
    t0 = time.perf_counter()
    for _ in range(n): r = fn()
    np.asarray(fetch(r))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:8.3f} ms  {gb/dt:7.1f} GB/s", flush=True)

def scan16(call, *arrs):
    @jax.jit
    def f(x, *a):
        def body(c, w):
            y = call(c, *w)
            return (x + y[:, :K].astype(x.dtype) * 1e-6).astype(x.dtype), None
        return jax.lax.scan(body, x, a)[0]
    return lambda: f(x, *arrs)

# V3: one big dot over fused (upcast * blockscale) producer
def v3(c, q, s):
    w = (q.reshape(Kb, B, N).astype(jnp.bfloat16)
         * s.astype(jnp.bfloat16)[:, None, :]).reshape(K, N)
    return jnp.matmul(c, w, preferred_element_type=jnp.float32)

# V4: scale folded as bf16 multiply AFTER reshape on flat [K, N] via
# broadcast-by-gather (row index -> scale row)
ridx = jnp.arange(K, dtype=jnp.int32) // B
def v4(c, q, s):
    w = q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[ridx, :]
    return jnp.matmul(c, w, preferred_element_type=jnp.float32)

timeit("V3 fused reshape-scale big dot", scan16(v3, qw, sc))
timeit("V4 fused gather-scale big dot", scan16(v4, qw, sc))
want = (np.asarray(x, np.float32) @ (np.asarray(qw[0], np.float32) * np.repeat(np.asarray(sc[0]), B, axis=0)))
for nm, f in (("V3", v3), ("V4", v4)):
    got = np.asarray(jax.jit(f)(x, qw[0], sc[0]), np.float32)
    print(nm, "rel-err", round(float(np.abs(got-want).max()/np.abs(want).max()), 5), flush=True)
