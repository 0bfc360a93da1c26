"""fp8_block kernel lab: why is the blockwise kernel 6x slower than the
plain fp8 kernel? Variants timed on the real chip."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

L, K, N, M = 16, 4096, 14336, 32
TILE_N, CK = 256, 512
rng = np.random.RandomState(0)
qw = jnp.asarray(
    rng.randn(L, K, N).astype(np.float32) * 0.05
).astype(jnp.float8_e4m3fn)
sc = jnp.asarray(rng.rand(L, K // 128, N).astype(np.float32) * 0.01 + 1.0)
x = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
fetch = jax.jit(lambda t: t.ravel()[0])
gb = L * K * N / 1e9


def timeit(name, fn, n=10):
    r = fn()
    np.asarray(fetch(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(fetch(r))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:8.3f} ms  {gb/dt:7.1f} GB/s", flush=True)


def scan16(call, *arrs):
    @jax.jit
    def f(x, *a):
        def body(c, w):
            y = call(c, *w)
            return (x + y[:, :K].astype(x.dtype) * 1e-6).astype(x.dtype), None
        return jax.lax.scan(body, x, a)[0]
    return lambda: f(x, *arrs)


# V0: plain fp8 one-dot kernel, scale ignored (baseline structure)
def _k0(x_ref, q_ref, o_ref, acc, *, ck):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    w = q_ref[:].astype(jnp.bfloat16)
    acc[:] += jnp.dot(x_ref[:, pl.ds(k * ck, ck)], w,
                      preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


# V1: per-128 sub-dots + partial scale (current fp8_block structure)
def _k1(x_ref, q_ref, s_ref, o_ref, acc, *, ck):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    nb, tn = s_ref.shape
    G = ck // nb
    for g in range(nb):
        wg = q_ref[pl.ds(g * G, G), :].astype(jnp.bfloat16)
        part = jnp.dot(x_ref[:, pl.ds(k * ck + g * G, G)], wg,
                       preferred_element_type=jnp.float32)
        acc[:] += part * s_ref[g, :][None, :]

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


# V2: one big dot per chunk + in-kernel scale on weights WITHOUT reshape:
# scale rows broadcast via repeat-free indexing is impossible; instead do
# the big dot and apply a SINGLE scale row per k-chunk with CK=128
def _k2(x_ref, q_ref, s_ref, o_ref, acc, *, ck):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    w = q_ref[:].astype(jnp.bfloat16)              # [128, tn]
    part = jnp.dot(x_ref[:, pl.ds(k * ck, ck)], w,
                   preferred_element_type=jnp.float32)
    srow = s_ref[pl.ds(jax.lax.rem(k, 8), 1), :]   # [1, tn]
    acc[:] += part * srow

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def mk(kernel, ck, scale_spec):
    @jax.jit
    def call(x, q, s):
        tb = max(8, M)
        grid = (1, N // TILE_N, K // ck)
        specs = [
            pl.BlockSpec((tb, K), lambda b, n, k: (b, 0)),
            pl.BlockSpec((ck, TILE_N), lambda b, n, k: (k, n)),
        ]
        args = [x, q]
        if scale_spec is not None:
            specs.append(scale_spec)
            args.append(s)
        return pl.pallas_call(
            functools.partial(kernel, ck=ck),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((tb, TILE_N), lambda b, n, k: (b, n)),
            out_shape=jax.ShapeDtypeStruct((tb, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tb, TILE_N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(*args)
    return call

print("M =", M, flush=True)
c0 = mk(_k0, CK, None)
timeit("V0 plain one-dot (no scale)", scan16(lambda c, q, s: c0(c, q, s), qw, sc))
c1 = mk(_k1, 1024, pl.BlockSpec((8, TILE_N), lambda b, n, k: (k, n)))
timeit("V1 per-128 sub-dots + partial scale", scan16(lambda c, q, s: c1(c, q, s), qw, sc))
c2 = mk(_k2, 128, pl.BlockSpec((8, TILE_N), lambda b, n, k: (k // 8, n)))
timeit("V2 CK=128 one-dot + row scale", scan16(lambda c, q, s: c2(c, q, s), qw, sc))

# correctness vs dequant
want = (np.asarray(x, np.float32) @ (
    np.asarray(qw[0], np.float32)
    * np.repeat(np.asarray(sc[0]), 128, axis=0)
))
for nm, cc in (("V1", c1), ("V2", c2)):
    got = np.asarray(cc(x, qw[0], sc[0]), np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(nm, "rel-err", round(float(rel), 5), flush=True)
