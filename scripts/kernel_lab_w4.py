"""W4A16 kernel variants lab — find a dequant structure whose VPU cost
doesn't eat the 4x bandwidth win (current kernel: 153 GB/s int4 streaming
vs 567 GB/s bf16 matmul on the same shape; the per-weight
widen/mask/shift/cvt/FMA chain is compute-bound on the VPU).

Run: python scripts/kernel_lab_w4.py [M]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, K, N, G = 32, 4096, 14336, 128
M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
TILE_N = 256
GPC = 8

print("devices:", jax.devices(), "M =", M, flush=True)

rng = np.random.RandomState(0)
qw = jnp.asarray(rng.randint(0, 256, (L, K // 2, N), dtype=np.uint8))
sc = jnp.asarray(rng.rand(L, K // G, N).astype(np.float32) * 0.01)
zr = jnp.asarray(rng.rand(L, K // G, N).astype(np.float32) * -0.05)
x = jnp.asarray(rng.randn(M, K), np.float32).astype(jnp.bfloat16)
wb = jnp.asarray(rng.randn(L, K, N), np.float32).astype(jnp.bfloat16) * 0.01

int4_gb = L * (K // 2 * N + 2 * (K // G) * N * 4) / 1e9
bf16_gb = L * K * N * 2 / 1e9
fetch = jax.jit(lambda t: t.ravel()[0])


def timeit(label, fn, gb, n=12):
    r = fn()
    np.asarray(fetch(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(fetch(r))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:8.3f} ms  {gb/dt:7.1f} GB/s", flush=True)
    return dt


def scan_over_layers(kernel_call):
    @jax.jit
    def f(x, qw, sc, zr):
        def body(carry, w):
            q, s, z = w
            y = kernel_call(carry, q, s, z)
            return (x + y[:, :K] * 1e-6).astype(x.dtype), None

        out, _ = jax.lax.scan(body, x, (qw, sc, zr))
        return out

    return lambda: f(x, qw, sc, zr)


# ---------------------------------------------------------------- current
from sglang_custom_tpu.ops.w4a16_matmul import w4a16_matmul_pallas

# ------------------------------------------- V1: group-partial MXU dots
def _kernel_v1(x_ref, q_ref, slo_ref, zlo_ref, shi_ref, zhi_ref, o_ref,
               acc, *, ckp, half):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.bfloat16)        # raw levels 0..15
    hi = (q >> 4).astype(jnp.bfloat16)
    gpc, tn = slo_ref.shape
    Gk = ckp // gpc
    tb = x_ref.shape[0]

    def half_acc(vals, s_ref, z_ref, x_off):
        for g in range(gpc):
            xg = x_ref[:, pl.ds(x_off + k * ckp + g * Gk, Gk)]
            wg = vals[g * Gk:(g + 1) * Gk, :]
            part = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            s = s_ref[g, :][None, :]
            z = z_ref[g, :][None, :]
            xs = jnp.sum(xg.astype(jnp.float32), axis=1)[:, None]
            acc[:] += part * s + xs * z

    half_acc(lo, slo_ref, zlo_ref, 0)
    half_acc(hi, shi_ref, zhi_ref, half)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def make_v1(ckp=GPC * G):
    half = K // 2
    gpc = GPC

    @functools.partial(jax.jit)
    def call(x, qweight, scales, zeros):
        Mx = x.shape[0]
        tb = max(8, Mx)
        grid = (1, N // TILE_N, half // ckp)
        off = half // G // gpc
        out = pl.pallas_call(
            functools.partial(_kernel_v1, ckp=ckp, half=half),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, K), lambda b, n, k: (b, 0)),
                pl.BlockSpec((ckp, TILE_N), lambda b, n, k: (k, n)),
                pl.BlockSpec((gpc, TILE_N), lambda b, n, k: (k, n)),
                pl.BlockSpec((gpc, TILE_N), lambda b, n, k: (k, n)),
                pl.BlockSpec((gpc, TILE_N),
                             lambda b, n, k: (off + k, n)),
                pl.BlockSpec((gpc, TILE_N),
                             lambda b, n, k: (off + k, n)),
            ],
            out_specs=pl.BlockSpec((tb, TILE_N), lambda b, n, k: (b, n)),
            out_shape=jax.ShapeDtypeStruct((tb, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((tb, TILE_N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x.astype(jnp.bfloat16), qweight, scales, zeros, scales, zeros)
        return out[:Mx]

    return call


# -------------------------- V2: single big dot, scales via prescaled X? no
# V2: like current but uint8-domain bit ops + fold (v*s+z) as one
# multiply_add on bf16 without the reshape-broadcast (keep FMA, cheaper ops)
def _kernel_v2(x_ref, q_ref, slo_ref, zlo_ref, shi_ref, zhi_ref, o_ref,
               acc, *, ckp, half):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[:]
    lo = (q & jnp.uint8(0xF)).astype(jnp.int32).astype(jnp.bfloat16)
    hi = (q >> jnp.uint8(4)).astype(jnp.int32).astype(jnp.bfloat16)
    gpc, tn = slo_ref.shape
    Gk = ckp // gpc

    def half_acc(vals, s_ref, z_ref, x_off):
        for g in range(gpc):
            xg = x_ref[:, pl.ds(x_off + k * ckp + g * Gk, Gk)]
            wg = vals[g * Gk:(g + 1) * Gk, :]
            part = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            s = s_ref[g, :][None, :]
            z = z_ref[g, :][None, :]
            xs = jnp.sum(xg.astype(jnp.float32), axis=1)[:, None]
            acc[:] += part * s + xs * z

    half_acc(lo, slo_ref, zlo_ref, 0)
    half_acc(hi, shi_ref, zhi_ref, half)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def make_v2(ckp=GPC * G):
    half = K // 2
    gpc = GPC

    @functools.partial(jax.jit)
    def call(x, qweight, scales, zeros):
        Mx = x.shape[0]
        tb = max(8, Mx)
        grid = (1, N // TILE_N, half // ckp)
        off = half // G // gpc
        out = pl.pallas_call(
            functools.partial(_kernel_v2, ckp=ckp, half=half),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, K), lambda b, n, k: (b, 0)),
                pl.BlockSpec((ckp, TILE_N), lambda b, n, k: (k, n)),
                pl.BlockSpec((gpc, TILE_N), lambda b, n, k: (k, n)),
                pl.BlockSpec((gpc, TILE_N), lambda b, n, k: (k, n)),
                pl.BlockSpec((gpc, TILE_N), lambda b, n, k: (off + k, n)),
                pl.BlockSpec((gpc, TILE_N), lambda b, n, k: (off + k, n)),
            ],
            out_specs=pl.BlockSpec((tb, TILE_N), lambda b, n, k: (b, n)),
            out_shape=jax.ShapeDtypeStruct((tb, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((tb, TILE_N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x.astype(jnp.bfloat16), qweight, scales, zeros, scales, zeros)
        return out[:Mx]

    return call


@jax.jit
def bf16_scan(x, wb):
    def body(carry, w):
        y = jnp.matmul(carry, w)
        return (x + y[:, :K] * 1e-6).astype(x.dtype), None

    out, _ = jax.lax.scan(body, x, wb)
    return out


# correctness check vs reference dequant on layer 0
def ref_out(xv, l):
    q = np.asarray(qw[l]).astype(np.int32)
    lo, hi = q & 0xF, q >> 4
    w4 = np.concatenate([lo, hi], axis=0).astype(np.float32)
    s = np.repeat(np.asarray(sc[l]), G, axis=0)
    z = np.repeat(np.asarray(zr[l]), G, axis=0)
    w = w4 * s + z
    return np.asarray(xv, np.float32) @ w


for name, mk in [("v1", make_v1)]:
    try:
        got = np.asarray(mk()(x, qw[0], sc[0], zr[0]), np.float32)
        want = ref_out(x, 0)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        print(f"{name} correctness rel-err: {err:.4f}", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {e}"[:300], flush=True)

timeit("current kernel (scan x32)",
       scan_over_layers(lambda c, q, s, z: w4a16_matmul_pallas(c, q, s, z)),
       int4_gb)
timeit("v1 group-dots int32-unpack (scan x32)",
       scan_over_layers(lambda c, q, s, z: make_v1()(c, q, s, z)), int4_gb)
timeit("bf16 matmul (scan x32)", lambda: bf16_scan(x, wb), bf16_gb)
