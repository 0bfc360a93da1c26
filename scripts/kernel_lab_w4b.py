"""W4A16 lab round 2: isolate the VPU unpack cost and test cheaper
unpack formulations.

  E1 unpack-only  : byte -> 2 bf16 nibbles, reduce-add to out (no MXU)
  E2 big-dot bf16 : the 2-large-dot structure with PRE-dequantized bf16
                    weights (2x HBM bytes) — pure dot+stream baseline
  E7 i16 domain   : widen u8->i16, mask/shift in i16, cvt i16->bf16
  E4 magic f32    : (q & 0xF) << 19 | 0x41800000 bitcast f32 == 16+v,
                    cvt f32->bf16, value offset folded into zeros

Run: python scripts/kernel_lab_w4b.py [M]
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
CKP = 1024  # packed rows per chunk

print("devices:", jax.devices(), "M =", M, flush=True)

rng = np.random.RandomState(0)
qw = jnp.asarray(rng.randint(0, 256, (L, K // 2, N), dtype=np.uint8))
sc = jnp.asarray(rng.rand(L, K // G, N).astype(np.float32) * 0.01)
zr = jnp.asarray(rng.rand(L, K // G, N).astype(np.float32) * -0.05)
x = jnp.asarray(rng.randn(M, K), np.float32).astype(jnp.bfloat16)

int4_gb = L * (K // 2 * N + 2 * (K // G) * N * 4) / 1e9
fetch = jax.jit(lambda t: t.ravel()[0])


def timeit(label, fn, gb, n=12):
    try:
        r = fn()
        np.asarray(fetch(r))
    except Exception as e:
        print(f"{label:44s} FAILED {type(e).__name__}: {e}"[:200],
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(fetch(r))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:8.3f} ms  {gb/dt:7.1f} GB/s", flush=True)
    return dt


def scan32(call, *arrays):
    @jax.jit
    def f(x, *arrs):
        def body(carry, w):
            y = call(carry, *w)
            return (x + y[:, :K] * 1e-6).astype(x.dtype), None

        out, _ = jax.lax.scan(body, x, arrs)
        return out

    return lambda: f(x, *arrays)


def mk_pallas(kernel, extra_specs, extra_args, half=K // 2):
    @jax.jit
    def call(x, qweight, *extras):
        tb = max(8, x.shape[0])
        grid = (1, N // TILE_N, half // CKP)
        out = pl.pallas_call(
            functools.partial(kernel, ckp=CKP, half=half),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, K), lambda b, n, k: (b, 0)),
                pl.BlockSpec((CKP, TILE_N), lambda b, n, k: (k, n)),
            ] + extra_specs,
            out_specs=pl.BlockSpec((tb, TILE_N), lambda b, n, k: (b, n)),
            out_shape=jax.ShapeDtypeStruct((tb, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((tb, TILE_N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x.astype(jnp.bfloat16), qweight, *extras)
        return out[: x.shape[0]]

    return call


# ------------------------------------------------ E1: unpack only, no MXU
def _k_unpack(x_ref, q_ref, o_ref, acc, *, ckp, half):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.bfloat16)
    hi = (q >> 4).astype(jnp.bfloat16)
    s = (lo + hi).astype(jnp.float32)          # [CKP, TILE_N]
    acc[:] += s[: o_ref.shape[0], :]           # touch, no dot

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


# ----------------------------------- E7: i16-domain unpack + the 2 big dots
def _k_i16(x_ref, q_ref, slo_ref, zlo_ref, shi_ref, zhi_ref, o_ref, acc,
           *, ckp, half):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[:].astype(jnp.int16)
    lo = (q & jnp.int16(0xF)).astype(jnp.bfloat16)
    hi = ((q >> jnp.int16(4)) & jnp.int16(0xF)).astype(jnp.bfloat16)
    gpc, tn = slo_ref.shape
    Gg = ckp // gpc

    def deq(vals, s_ref, z_ref):
        v = vals.reshape(gpc, Gg, tn)
        s = s_ref[:].astype(jnp.bfloat16)[:, None, :]
        z = z_ref[:].astype(jnp.bfloat16)[:, None, :]
        return (v * s + z).reshape(ckp, tn)

    w_lo = deq(lo, slo_ref, zlo_ref)
    w_hi = deq(hi, shi_ref, zhi_ref)
    x_lo = x_ref[:, pl.ds(k * ckp, ckp)]
    x_hi = x_ref[:, pl.ds(half + k * ckp, ckp)]
    acc[:] += jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


# --------------------------- E4: magic-number f32 unpack + the 2 big dots
def _k_magic(x_ref, q_ref, slo_ref, zlo_ref, shi_ref, zhi_ref, o_ref, acc,
             *, ckp, half):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[:].astype(jnp.int32)
    MAGIC = jnp.int32(0x41800000)  # f32 16.0
    lo_f = jax.lax.bitcast_convert_type(
        ((q & 0xF) << 19) | MAGIC, jnp.float32
    )  # == 16 + v
    hi_f = jax.lax.bitcast_convert_type(
        ((q >> 4) << 19) | MAGIC, jnp.float32
    )
    lo = lo_f.astype(jnp.bfloat16)
    hi = hi_f.astype(jnp.bfloat16)
    gpc, tn = slo_ref.shape
    Gg = ckp // gpc

    def deq(vals, s_ref, z_ref):
        v = vals.reshape(gpc, Gg, tn)
        s = s_ref[:].astype(jnp.bfloat16)[:, None, :]
        # zeros adjusted on host for the +16 offset: z' = z - 16*s
        z = z_ref[:].astype(jnp.bfloat16)[:, None, :]
        return (v * s + z).reshape(ckp, tn)

    w_lo = deq(lo, slo_ref, zlo_ref)
    w_hi = deq(hi, shi_ref, zhi_ref)
    x_lo = x_ref[:, pl.ds(k * ckp, ckp)]
    x_hi = x_ref[:, pl.ds(half + k * ckp, ckp)]
    acc[:] += jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


GPC = CKP // G  # 8
off = (K // 2) // G // GPC
sz_specs = [
    pl.BlockSpec((GPC, TILE_N), lambda b, n, k: (k, n)),
    pl.BlockSpec((GPC, TILE_N), lambda b, n, k: (k, n)),
    pl.BlockSpec((GPC, TILE_N), lambda b, n, k, o=off: (o + k, n)),
    pl.BlockSpec((GPC, TILE_N), lambda b, n, k, o=off: (o + k, n)),
]

unpack_call = mk_pallas(_k_unpack, [], [])
i16_call = mk_pallas(_k_i16, sz_specs, [])
magic_call = mk_pallas(_k_magic, sz_specs, [])

# correctness of magic/i16 vs reference (layer 0)
def ref_out(xv, l, magic=False):
    q = np.asarray(qw[l]).astype(np.int32)
    lo, hi = q & 0xF, q >> 4
    w4 = np.concatenate([lo, hi], axis=0).astype(np.float32)
    if magic:
        w4 = w4 + 16.0
    s = np.repeat(np.asarray(sc[l]), G, axis=0)
    z = np.repeat(np.asarray(zr[l]), G, axis=0)
    if magic:
        z = z - 16.0 * s
    return np.asarray(xv, np.float32) @ (w4 * s + z)

zr_adj = zr - 16.0 * sc  # host-folded magic offset
for name, call, zz, mg in [("magic", magic_call, zr_adj, True)]:
    try:
        got = np.asarray(
            call(x, qw[0], sc[0], zz[0], sc[0], zz[0]), np.float32
        )
        want = ref_out(x, 0, magic=False)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        print(f"{name} correctness rel-err: {err:.4f}", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {e}"[:250], flush=True)

from sglang_custom_tpu.ops.w4a16_matmul import w4a16_matmul_pallas

timeit("current kernel (scan x32)",
       scan32(lambda c, q, s, z: w4a16_matmul_pallas(c, q, s, z),
              qw, sc, zr), int4_gb)
timeit("E1 unpack-only no-dot (scan x32)",
       scan32(lambda c, q: unpack_call(c, q), qw), int4_gb)
timeit("E4 magic-f32 unpack (scan x32)",
       scan32(lambda c, q, s, z: magic_call(c, q, s, z, s, z),
              qw, sc, zr_adj), int4_gb)
