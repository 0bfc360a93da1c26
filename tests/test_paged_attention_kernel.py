"""Pallas ragged paged attention vs the pure-XLA reference backend.

Reference analog: kernel unit tests like python/sglang/test/attention/
test_flashattn_backend.py — kernel output diffed against a naive SDPA.
Runs the kernel in interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_custom_tpu.ops.ragged_paged_attention import (
    paged_attention_decode,
    paged_attention_extend,
)


LAYER = 1  # pools are built with 2 layers; kernels run on layer 1
N_LAYERS = 2


def make_case(B, Hq, Hkv, D, ps, pmax, seed=0):
    rng = np.random.RandomState(seed)
    P = B * pmax + 1
    kv = rng.randn(N_LAYERS, Hkv, P, ps, 2 * D).astype(np.float32)
    # each seq gets its own pages (1-based, page 0 = garbage)
    page_table = np.zeros((B, pmax), np.int32)
    for b in range(B):
        page_table[b] = np.arange(1 + b * pmax, 1 + (b + 1) * pmax)
    seq_lens = rng.randint(1, pmax * ps + 1, size=B).astype(np.int32)
    q = rng.randn(B, Hq, D).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(kv), jnp.asarray(page_table), jnp.asarray(seq_lens)


def make_kv_new(B, Hkv, D, seed=100):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, Hkv, 2 * D).astype(np.float32))


def host_write(kv, kv_new, page_table, seq_lens, ps):
    """Numpy reference of the fused decode KV insert at position seq_len-1."""
    kv = np.asarray(kv).copy()
    kv_new = np.asarray(kv_new)
    pt = np.asarray(page_table)
    for b in range(pt.shape[0]):
        pos = int(seq_lens[b]) - 1
        page = pt[b, pos // ps]
        kv[LAYER, :, page, pos % ps] = kv_new[b]
    return jnp.asarray(kv)


def run_decode(q, kv, page_table, seq_lens, **kw):
    """New-interface decode with a random fused KV write; returns (out,
    host-updated kv for the reference, kernel-updated kv)."""
    B, Hq, D = q.shape
    Hkv = kv.shape[1]
    ps = kv.shape[3]
    kv_new = make_kv_new(B, Hkv, D)
    expect_kv = host_write(kv, kv_new, page_table, seq_lens, ps)
    out, kv_out = paged_attention_decode(
        q, kv_new, kv, jnp.asarray(LAYER, jnp.int32), page_table, seq_lens,
        interpret=True, **kw,
    )
    return out, expect_kv, kv_out


def xla_reference(q, kv_full, page_table, seq_lens, scale):
    """Dense-gather reference: mask + softmax over the padded context."""
    kv = kv_full[LAYER]
    B, Hq, D = q.shape
    Hkv, P, ps = kv.shape[:3]
    G = Hq // Hkv
    S = page_table.shape[1] * ps
    gathered = kv[:, page_table]  # [Hkv, B, PMAX, ps, 2, D]
    k = gathered[..., :D].reshape(Hkv, B, S, D)
    v = gathered[..., D:].reshape(Hkv, B, S, D)
    qg = q.reshape(B, Hkv, G, D)
    s = jnp.einsum("bkgd,kbsd->bkgs", qg, k) * scale
    kv_pos = jnp.arange(S)[None, None, None, :]
    s = jnp.where(kv_pos < seq_lens[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgs,kbsd->bkgd", p, v)
    return o.reshape(B, Hq, D)


@pytest.mark.parametrize(
    "B,Hq,Hkv,D,ps,pmax",
    [
        (4, 8, 4, 64, 16, 4),
        (2, 8, 8, 128, 32, 2),   # MHA
        (3, 16, 2, 64, 8, 5),    # high GQA ratio
        (1, 4, 1, 128, 16, 3),
        (2, 8, 4, 64, 16, 16),   # multi-strip: kb=8, 2 strips
    ],
)
def test_decode_kernel_matches_reference(B, Hq, Hkv, D, ps, pmax):
    q, kv, page_table, seq_lens = make_case(B, Hq, Hkv, D, ps, pmax)
    scale = 1.0 / np.sqrt(D)
    out, expect_kv, kv_out = run_decode(q, kv, page_table, seq_lens, scale=scale)
    ref = xla_reference(q, expect_kv, page_table, seq_lens, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # the fused in-kernel write must land exactly the host-side scatter
    np.testing.assert_allclose(
        np.asarray(kv_out), np.asarray(expect_kv), rtol=0, atol=0
    )


def xla_extend_reference(q, kv_full, page_table, seq_lens, extend_lens, scale):
    """Dense reference with causal-within-extend masking."""
    kv = kv_full[LAYER]
    B, T, Hq, D = q.shape
    Hkv, P, ps = kv.shape[:3]
    G = Hq // Hkv
    S = page_table.shape[1] * ps
    gathered = kv[:, page_table]
    k = gathered[..., :D].reshape(Hkv, B, S, D)
    v = gathered[..., D:].reshape(Hkv, B, S, D)
    qg = q.reshape(B, T, Hkv, G, D)
    s = jnp.einsum("btkgd,kbsd->bktgs", qg, k) * scale
    kv_pos = jnp.arange(S)[None, None, None, None, :]
    start = (seq_lens - extend_lens)[:, None, None, None, None]
    q_pos = start + jnp.arange(T)[None, None, :, None, None]
    mask = (kv_pos <= q_pos) & (kv_pos < seq_lens[:, None, None, None, None])
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bktgs,kbsd->btkgd", p, v)
    return o.reshape(B, T, Hq, D)


@pytest.mark.parametrize(
    "B,Hq,Hkv,D,ps,pmax,T,q_block",
    [
        (2, 8, 4, 64, 16, 4, 16, 8),      # 2 q blocks, ragged extends
        (3, 8, 2, 64, 8, 6, 24, 16),      # partial last block
        (1, 4, 4, 128, 16, 2, 8, 8),      # MHA one block
        (2, 8, 4, 64, 8, 32, 16, 16),     # multi-strip prefix: kb=16, 2 strips
    ],
)
def test_extend_kernel_matches_reference(B, Hq, Hkv, D, ps, pmax, T, q_block):
    rng = np.random.RandomState(1)
    P = B * pmax + 1
    kv = jnp.asarray(rng.randn(N_LAYERS, Hkv, P, ps, 2 * D).astype(np.float32))
    page_table = np.zeros((B, pmax), np.int32)
    for b in range(B):
        page_table[b] = np.arange(1 + b * pmax, 1 + (b + 1) * pmax)
    page_table = jnp.asarray(page_table)
    # ragged: each row has its own (prefix, extend) split
    extend_lens = jnp.asarray(rng.randint(1, T + 1, size=B), jnp.int32)
    prefix = jnp.asarray(rng.randint(0, pmax * ps - T, size=B), jnp.int32)
    seq_lens = prefix + extend_lens
    q = jnp.asarray(rng.randn(B, T, Hq, D).astype(np.float32))
    scale = 1.0 / np.sqrt(D)

    out, kv = paged_attention_extend(
        q, kv, jnp.asarray(LAYER, jnp.int32), page_table, seq_lens,
        extend_lens, scale=scale, q_block=q_block, interpret=True,
    )
    ref = xla_extend_reference(q, kv, page_table, seq_lens, extend_lens, scale)
    # only rows t < extend_len are meaningful
    for b in range(B):
        e = int(extend_lens[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :e], np.asarray(ref)[b, :e],
            rtol=2e-5, atol=2e-5, err_msg=f"row {b} ext={e}",
        )


def test_decode_kernel_single_token_seq():
    q, kv, page_table, seq_lens = make_case(2, 8, 4, 64, 16, 2)
    seq_lens = jnp.asarray([1, 5], jnp.int32)
    scale = 0.125
    out, expect_kv, kv_out = run_decode(q, kv, page_table, seq_lens, scale=scale)
    ref = xla_reference(q, expect_kv, page_table, seq_lens, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(kv_out), np.asarray(expect_kv))


def xla_windowed_reference(q, kv_full, page_table, seq_lens, scale, window,
                           softcap=0.0):
    """Decode reference with sliding window + optional logit softcap."""
    kv = kv_full[LAYER]
    B, Hq, D = q.shape
    Hkv, P, ps = kv.shape[:3]
    G = Hq // Hkv
    S = page_table.shape[1] * ps
    gathered = kv[:, page_table]
    k = gathered[..., :D].reshape(Hkv, B, S, D)
    v = gathered[..., D:].reshape(Hkv, B, S, D)
    qg = q.reshape(B, Hkv, G, D)
    s = jnp.einsum("bkgd,kbsd->bkgs", qg, k) * scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    kv_pos = jnp.arange(S)[None, None, None, :]
    sl = seq_lens[:, None, None, None]
    mask = (kv_pos < sl) & (kv_pos >= sl - window)
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgs,kbsd->bkgd", p, v)
    return o.reshape(B, Hq, D)


@pytest.mark.parametrize("window", [1, 7, 40, 1 << 30])
def test_decode_kernel_sliding_window(window):
    # multi-strip so windowing skips whole strips (kb=8 @ ps=16 -> S=128)
    q, kv, page_table, seq_lens = make_case(3, 8, 4, 64, 16, 16, seed=7)
    seq_lens = jnp.asarray([250, 129, 64], jnp.int32)
    scale = 0.125
    out, expect_kv, kv_out = run_decode(
        q, kv, page_table, seq_lens, scale=scale,
        window=jnp.asarray(window, jnp.int32),
    )
    ref = xla_windowed_reference(q, expect_kv, page_table, seq_lens, scale, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(kv_out), np.asarray(expect_kv))


def test_decode_kernel_softcap():
    q, kv, page_table, seq_lens = make_case(2, 8, 4, 64, 16, 4, seed=8)
    scale = 0.125
    out, expect_kv, _ = run_decode(
        q, kv, page_table, seq_lens, scale=scale, softcap=50.0
    )
    ref = xla_windowed_reference(
        q, expect_kv, page_table, seq_lens, scale, 1 << 30, softcap=50.0
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("window", [1, 5, 30, 300, 1 << 30])
def test_extend_kernel_sliding_window(window):
    rng = np.random.RandomState(9)
    B, Hq, Hkv, D, ps, pmax, T = 2, 8, 4, 64, 16, 16, 16
    P = B * pmax + 1
    kv = jnp.asarray(rng.randn(N_LAYERS, Hkv, P, ps, 2 * D).astype(np.float32))
    page_table = np.zeros((B, pmax), np.int32)
    for b in range(B):
        page_table[b] = np.arange(1 + b * pmax, 1 + (b + 1) * pmax)
    page_table = jnp.asarray(page_table)
    extend_lens = jnp.asarray([T, 5], jnp.int32)
    seq_lens = jnp.asarray([220, 150], jnp.int32)
    q = jnp.asarray(rng.randn(B, T, Hq, D).astype(np.float32))
    scale = 0.125

    out, kv = paged_attention_extend(
        q, kv, jnp.asarray(LAYER, jnp.int32), page_table, seq_lens,
        extend_lens, scale=scale,
        window=jnp.asarray(window, jnp.int32), q_block=8, interpret=True,
    )
    # dense reference with window mask
    S = pmax * ps
    gathered = kv[LAYER][:, page_table]
    k = gathered[..., :D].reshape(Hkv, B, S, D)
    v = gathered[..., D:].reshape(Hkv, B, S, D)
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    s = jnp.einsum("btkgd,kbsd->bktgs", qg, k) * scale
    kv_pos = jnp.arange(S)[None, None, None, None, :]
    start = (seq_lens - extend_lens)[:, None, None, None, None]
    q_pos = start + jnp.arange(T)[None, None, :, None, None]
    mask = (
        (kv_pos <= q_pos)
        & (kv_pos < seq_lens[:, None, None, None, None])
        & (kv_pos > q_pos - window)
    )
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bktgs,kbsd->btkgd", p, v).reshape(B, T, Hq, D)
    for b in range(2):
        e = int(extend_lens[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :e], np.asarray(ref)[b, :e],
            rtol=2e-5, atol=2e-5, err_msg=f"row {b} window={window}",
        )


def test_extend_kernel_tree_mask():
    """Speculative-tree masking vs a dense reference: q token t attends
    the full prefix (< tree_start) plus node-region offsets j with
    tree_mask[t, j] (reference: eagle_utils.cu TARGET_VERIFY mask)."""
    rng = np.random.RandomState(7)
    B, Hq, Hkv, D, ps, pmax, T = 2, 8, 4, 64, 8, 8, 8
    P = B * pmax + 1
    kv = jnp.asarray(rng.randn(N_LAYERS, Hkv, P, ps, 2 * D).astype(np.float32))
    page_table = np.zeros((B, pmax), np.int32)
    for b in range(B):
        page_table[b] = np.arange(1 + b * pmax, 1 + (b + 1) * pmax)
    page_table = jnp.asarray(page_table)
    prefix = jnp.asarray([13, 29], jnp.int32)   # per-row tree_start
    seq_lens = prefix + T
    extend_lens = jnp.full((B,), T, jnp.int32)
    q = jnp.asarray(rng.randn(B, T, Hq, D).astype(np.float32))
    scale = 1.0 / np.sqrt(D)
    # binary tree ancestors: node 0 root; node j's parent (j-1)//2
    mask = np.zeros((T, T), bool)
    for t in range(T):
        j = t
        while True:
            mask[t, j] = True
            if j == 0:
                break
            j = (j - 1) // 2
    tree_mask = jnp.asarray(mask)

    out, kv = paged_attention_extend(
        q, kv, jnp.asarray(LAYER, jnp.int32), page_table, seq_lens,
        extend_lens, scale=scale, q_block=8, interpret=True,
        tree_mask=tree_mask, tree_start=prefix,
    )

    # dense reference
    kvl = kv[LAYER]
    G = Hq // Hkv
    S = pmax * ps
    gathered = kvl[:, page_table]
    k = gathered[..., :D].reshape(Hkv, B, S, D)
    v = gathered[..., D:].reshape(Hkv, B, S, D)
    qg = q.reshape(B, T, Hkv, G, D)
    s = jnp.einsum("btkgd,kbsd->bktgs", qg, k) * scale
    kv_pos = np.arange(S)[None, None, None, None, :]
    ts = np.asarray(prefix)[:, None, None, None, None]
    rel = np.clip(kv_pos - ts, 0, T - 1)
    tm = np.moveaxis(mask[:, rel[:, 0, 0, 0, :]], 0, 1)  # [B, T, S]
    in_region = (kv_pos >= ts) & (kv_pos < ts + T)
    full = np.where(in_region, tm[:, None, :, None, :], kv_pos < ts)
    full = full & (kv_pos < np.asarray(seq_lens)[:, None, None, None, None])
    s = jnp.where(jnp.asarray(full), s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bktgs,kbsd->btkgd", p, v).reshape(B, T, Hq, D)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_paged_kv_write_kernel_interpret():
    """Pallas page-granular KV writer (ops/kv_write.py) vs the XLA
    scatter, including page-crossing extends, cached-prefix offsets, and
    padded rows."""
    from sglang_custom_tpu.ops.kv_write import paged_kv_write

    rng = np.random.RandomState(3)
    L, Hkv, P, ps, F = 3, 4, 16, 8, 32
    B, T = 3, 11
    pool0 = jnp.asarray(rng.randn(L, Hkv, P, ps, F), jnp.float32)
    kv_new = jnp.asarray(rng.randn(B, T, Hkv, F), jnp.float32)
    # per-row start offsets: row 0 fresh, row 1 mid-page prefix, row 2 pad
    c = np.asarray([0, 5, 3], np.int32)
    e = np.asarray([11, 9, 0], np.int32)   # row 2 fully padded
    positions = np.stack([ci + np.arange(T) for ci in c]).astype(np.int32)
    pmax = (int((c + e).max()) + ps - 1) // ps + 1
    page_table = np.zeros((B, pmax), np.int32)
    pid = 1
    for b in range(B):
        for j in range(pmax):
            page_table[b, j] = pid
            pid += 1

    # reference scatter
    want = np.asarray(pool0).copy()
    for b in range(B):
        for t in range(int(e[b])):
            pos = int(positions[b, t])
            pg = int(page_table[b, pos // ps])
            want[1, :, pg, pos % ps] = np.asarray(kv_new)[b, t]

    got = paged_kv_write(
        kv_new, pool0, jnp.asarray(1, jnp.int32),
        jnp.asarray(page_table), jnp.asarray(positions),
        jnp.asarray(e), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want)
