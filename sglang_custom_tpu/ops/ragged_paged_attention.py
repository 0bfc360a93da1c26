"""Pallas ragged paged attention kernels.

The TPU-native equivalent of the reference's attention kernel zoo
(reference: srt/layers/attention/flashinfer_backend.py, triton_ops/
decode_attention.py — paged KV decode/extend kernels; sgl-kernel csrc).
Re-designed for the TPU memory system rather than translated:

- KV pages live in HBM with layout ``[Hkv, P, page_size, 2, D]``: K and V
  of one token are *adjacent in lanes* (folded view
  ``[Hkv, P, page_size, 2D]``). One DMA per page fetches K and V together,
  and the folded lane dim ``2D`` is 128-aligned for every head_dim that is
  a multiple of 64 — Mosaic rejects DMA slices whose minor dim is not a
  multiple of the 128-lane tile, which rules out a K/V-split layout for
  the D=64 model families (Llama-3.2-1B/3B etc).
- Head and page are *leading* (untiled) dims, so every DMA slices only
  untiled dims and the tiled (page_size, 2D) tile always moves whole.
- Pages are fetched in *strips* of KB pages per DMA round so the KV block
  a matmul sees is >=128 tokens wide (full MXU/VPU lanes), double-buffered
  to overlap DMA with the online-softmax update (flash-attention style).
- Page indices are scalar-prefetched (SMEM) so the kernel issues page DMAs
  before compute.
- GQA is a batched matmul over kv-heads: q ``[Hkv, G, D]`` x k
  ``[Hkv, S, D]`` — no head replication is ever materialized.
- When ``D % 128 == 0`` the kernel slices K/V out of the folded strip
  (both halves are tile-aligned) and contracts over D — full MXU
  efficiency. When ``D % 128 != 0`` (e.g. 64) it computes *folded*: q is
  zero-padded to 2D lanes so the score matmul contracts K lanes only, and
  the PV matmul produces [.., 2D] whose V half is the answer. Decode is
  HBM-bandwidth-bound, so the extra MXU work is hidden behind the page
  DMAs.

See PAPERS.md "Ragged Paged Attention" for the general TPU design space.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Target tokens per KV strip (lanes of the score matmul).
_STRIP_TOKENS = 128


def _sublanes(kv_dtype) -> int:
    return 16 if kv_dtype == jnp.bfloat16 else 8


def supports_geometry(head_dim: int, page_size: int, kv_dtype) -> bool:
    """Whether these kernels compile on real TPU hardware for this KV
    geometry. The folded lane dim (2*head_dim) must be a multiple of the
    128-lane tile, and strip offsets (multiples of page_size) must be
    sublane-aligned. FP8 pools (kv_cache_dtype=fp8_e4m3) take the XLA
    backend: the kernels' strip DMAs assume 16/8-sublane tiles."""
    if kv_dtype not in (jnp.bfloat16, jnp.float32):
        return False
    return (2 * head_dim) % 128 == 0 and page_size % _sublanes(kv_dtype) == 0


def _strip_pages(page_size: int, kv_dtype) -> int:
    """Pages per DMA round. Strip offsets inside the scratch buffer must be
    sublane-aligned for the kv dtype; fall back to 1 page per round if the
    page size itself is unaligned."""
    if page_size % _sublanes(kv_dtype) != 0:
        return 1
    return max(1, _STRIP_TOKENS // page_size)


def _strip_dmas(kv_ref, kv_scratch, sems, page_table_ref, *,
                layer, slot, strip, kb, ps, pmax, row_off):
    """The KB page-DMAs of one strip: HBM pages -> contiguous scratch run.

    kv_ref     : [L, Hkv, P, ps, 2D] (HBM, full pool); ``layer`` selects L
    kv_scratch : [2slots, Hkv, KB*ps, 2D] (VMEM)
    sems       : [2slots, KB]
    """
    dmas = []
    for j in range(kb):
        # Clamp reads past the table to its last entry; masked in compute.
        idx = jnp.minimum(strip * kb + j, pmax - 1)
        page = page_table_ref[row_off + idx]
        dmas.append(
            pltpu.make_async_copy(
                kv_ref.at[layer, :, page],
                kv_scratch.at[slot, :, pl.ds(j * ps, ps)],
                sems.at[slot, j],
            )
        )
    return dmas


def _attn_strip(q, strip, *, scale, valid_mask, m, l, acc, fold, D,
                softcap=0.0):
    """One online-softmax update against a KV strip.

    q     : [Hkv, R, D] (split) or [Hkv, R, 2D] zero-padded (folded)
    strip : [Hkv, S, 2D] — K in lanes [:D], V in lanes [D:]
    valid_mask : [*, R?, S] bool (broadcastable to scores)
    acc   : [Hkv, R, D] (split) or [Hkv, R, 2D] (folded)
    softcap: static logit soft cap (gemma2); 0 disables.
    """
    if fold:
        kmat = strip          # scores contract all 2D lanes; V lanes see q=0
    else:
        kmat = strip[..., :D]
    s = jax.lax.dot_general(
        q, kmat,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [Hkv, R, S]
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    s = jnp.where(valid_mask, s, _NEG_INF)

    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m - m_new)
    l_new = l * correction + jnp.sum(p, axis=-1, keepdims=True)
    vmat = strip if fold else strip[..., D:]
    pv = jax.lax.dot_general(
        p, vmat,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hkv, R, D or 2D]
    return m_new, l_new, acc * correction + pv


def _decode_kernel(
    # scalar prefetch
    page_table_ref,  # [B * PMAX] int32 (SMEM)
    seq_lens_ref,    # [B] int32 (SMEM)
    group_of_ref,    # [MAXK] int32 (SMEM) — flat work item -> row group
    strip_of_ref,    # [MAXK] int32 (SMEM) — flat work item -> strip index
    flags_ref,       # [MAXK] int32 (SMEM) — bit0 first-of-group, bit1 last
    total_ref,       # [1] int32 (SMEM) — number of live flat work items
    window_ref,      # [1] int32 (SMEM) — sliding window (FULL_WINDOW = none)
    layer_ref,       # [1] int32 (SMEM) — which pool layer
    # inputs
    q_ref,           # [B, Hkv, G, D or 2D] (VMEM, whole array)
    kvnew_ref,       # [B, Hkv, 2D] (VMEM) — this step's K|V per row
    kv_ref,          # [L, Hkv, P, ps, 2D] (HBM / ANY) — full pool
    # outputs
    o_ref,           # [B, Hkv, G, D or 2D] (VMEM)
    kv_out_ref,      # [L, Hkv, P, ps, 2D] (HBM) — aliased with kv_ref
    # scratch
    ring,            # [NS, R, Hkv, KB*ps, 2D] (VMEM) strip ring buffer
    sems,            # [NS, R, KB] DMA semaphores (strip fetches)
    wb_sems,         # [NS, R] DMA semaphores (page write-backs)
    wb_flags,        # [NS, R] int32 (SMEM) — write-back pending per slot/row
    *,
    scale: float,
    pmax: int,
    kb: int,
    num_kv_heads: int,
    head_dim: int,
    fold: bool,
    softcap: float,
):
    """Fused decode over a FLAT pipelined work list.

    Round-2's kernel ran one grid program per batch row: 64 rows x 16
    layers = 1024 serialized programs per token-step, each paying strip-DMA
    latency with no cross-row overlap (measured 3.4 ms/step vs the 0.8 ms
    KV-bandwidth floor). This version is a single program that walks a
    host-precomputed flat list of (row-group, strip) work items with an
    NS-deep DMA ring, so up to (NS-1)*R*KB page fetches are in flight at
    all times and softmax updates for group k overlap the fetches for
    groups k+1..k+NS-1. Rows are processed R at a time so each online-
    softmax update is one batched [R*Hkv] matmul pair (amortizing VPU/MXU
    fixed costs), and matmuls consume the KV strips in the pool dtype
    directly (bf16 on the MXU) instead of materializing an f32 copy.

    This step's K/V token is still written into its page *inside* the
    kernel (read-modify-write while the page is in VMEM for attention), so
    the step needs no separate XLA scatter; the pool updates in place via
    input_output_aliases. Replaces the reference's set_kv_buffer + decode
    kernel pair (srt/layers/attention/triton_ops/decode_attention.py) with
    one pass over the data."""
    NS, R = ring.shape[0], ring.shape[1]
    S = ring.shape[3]
    ps = S // kb
    D = head_dim
    Dq = q_ref.shape[3]      # D (split) or 2D (folded)
    Hkv = num_kv_heads
    G = q_ref.shape[2]
    layer = layer_ref[0]
    total = total_ref[0]
    window = window_ref[0]

    def wb_dma(slot, r, w_off, w_page):
        return pltpu.make_async_copy(
            ring.at[slot, r, :, pl.ds(w_off, ps)],
            kv_out_ref.at[layer, :, w_page],
            wb_sems.at[slot, r],
        )

    def wb_wait(slot, r):
        # Waits are by byte count; the page shape is static, so a
        # descriptor with any valid offsets drains the pending copy.
        wb_dma(slot, r, 0, 0).wait()

    def strip_dma(slot, r, row, i, j):
        idx = jnp.minimum(i * kb + j, pmax - 1)
        page = page_table_ref[row * pmax + idx]
        return pltpu.make_async_copy(
            kv_ref.at[layer, :, page],
            ring.at[slot, r, :, pl.ds(j * ps, ps)],
            sems.at[slot, r, j],
        )

    def issue(k):
        """Start the R*KB page fetches of flat work item k."""
        slot = jax.lax.rem(k, NS)
        g = group_of_ref[k]
        i = strip_of_ref[k]
        for r in range(R):
            @pl.when(wb_flags[slot, r] == 1)
            def _():
                wb_wait(slot, r)
                wb_flags[slot, r] = 0
            for j in range(kb):
                strip_dma(slot, r, g * R + r, i, j).start()

    for s in range(NS):
        for r in range(R):
            wb_flags[s, r] = 0
    # Fill the pipeline: NS-1 work items in flight (the consuming iteration
    # re-issues into the slot it just drained, one iteration behind).
    for kk in range(NS - 1):
        @pl.when(kk < total)
        def _():
            issue(kk)

    Dacc = 2 * D if fold else D
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S, 2 * D), 1)

    def body(k, carry):
        m, l, acc = carry
        slot = jax.lax.rem(k, NS)
        g = group_of_ref[k]
        i = strip_of_ref[k]
        fl = flags_ref[k]
        is_first = (fl & 1) == 1
        is_last = (fl & 2) == 2

        for r in range(R):
            for j in range(kb):
                strip_dma(slot, r, g * R + r, i, j).wait()

        # Reset the online-softmax state at each group's first strip.
        m = jnp.where(is_first, _NEG_INF, m)
        l = jnp.where(is_first, 0.0, l)
        acc = jnp.where(is_first, 0.0, acc)

        # Per-row: patch this step's token into the strip that holds
        # position seq_len-1 and write that page back to HBM.
        sls = []
        for r in range(R):
            sl_r = seq_lens_ref[g * R + r]
            sls.append(sl_r)
            is_rows_last = i == (sl_r - 1) // S

            @pl.when(is_rows_last)
            def _():
                w_pos = sl_r - 1
                w_row = w_pos - i * S
                newkv = kvnew_ref[g * R + r]  # [Hkv, 2D]
                ring[slot, r] = jnp.where(
                    row_iota == w_row,
                    newkv[:, None, :].astype(ring.dtype),
                    ring[slot, r],
                )
                w_page = page_table_ref[
                    (g * R + r) * pmax + jnp.minimum(w_pos // ps, pmax - 1)
                ]
                wb_dma(slot, r, (w_row // ps) * ps, w_page).start()
                wb_flags[slot, r] = 1

        # Collapse (R, Hkv) -> one batch dim (Mosaic matmuls support a
        # single batch dim; leading-dim merges are free relayouts).
        strip = ring[slot].reshape(R * Hkv, S, 2 * D)  # pool dtype
        qg = q_ref[pl.ds(g * R, R)].astype(strip.dtype)
        qg = qg.reshape(R * Hkv, G, Dq)
        kmat = strip if fold else strip[..., :D]
        s = jax.lax.dot_general(
            qg, kmat,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [R*Hkv, G, S]
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        kv_pos = i * S + jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
        masks = []
        for r in range(R):
            lo_r = jnp.maximum(sls[r] - window, 0)
            masks.append(
                jnp.broadcast_to(
                    (kv_pos < sls[r]) & (kv_pos >= lo_r), (Hkv, 1, S)
                )
            )
        s = jnp.where(jnp.concatenate(masks, axis=0), s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m - m_new)
        l = l * correction + jnp.sum(p, axis=-1, keepdims=True)
        vmat = strip if fold else strip[..., D:]
        pv = jax.lax.dot_general(
            p.astype(strip.dtype), vmat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [R*Hkv, G, Dacc]
        acc = acc * correction + pv

        @pl.when(is_last)
        def _():
            # Rows shorter than the group's longest see only fully-masked
            # strips after their own end (p == 0 -> state frozen), so every
            # row's output is final here.
            out = acc / jnp.maximum(l, 1e-30)
            o_ref[pl.ds(g * R, R)] = out.reshape(
                R, Hkv, G, Dq
            ).astype(o_ref.dtype)

        @pl.when(k + NS - 1 < total)
        def _():
            issue(k + NS - 1)

        return m_new, l, acc

    m0 = jnp.full((R * Hkv, G, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((R * Hkv, G, 1), jnp.float32)
    acc0 = jnp.zeros((R * Hkv, G, Dacc), jnp.float32)
    jax.lax.fori_loop(0, total, body, (m0, l0, acc0))

    for s in range(NS):
        for r in range(R):
            @pl.when(wb_flags[s, r] == 1)
            def _():
                wb_wait(s, r)


def _extend_kernel(
    # scalar prefetch
    page_table_ref,   # [B * PMAX] int32 (SMEM)
    seq_lens_ref,     # [B] int32
    extend_lens_ref,  # [B] int32
    window_ref,       # [1] int32 — sliding window (FULL_WINDOW = none)
    layer_ref,        # [1] int32 — which pool layer
    tree_start_ref,   # [B] int32 — node-region base (tree mode only)
    # inputs
    q_ref,            # [1, Hkv, TB, G, D or 2D] block (VMEM), head-major
    kv_ref,           # [L, Hkv, P, ps, 2D] (HBM, full pool)
    # tree mode inserts here: tree_ref [TB, Np] f32 ancestor-matrix block
    # outputs / scratch (parsed from *rest below)
    *rest,            # (o_ref, kv_scratch [2,Hkv,KB*ps,2D], sems [2,KB])
    scale: float,
    pmax: int,
    kb: int,
    num_kv_heads: int,
    head_dim: int,
    fold: bool,
    softcap: float,
    tree: bool,
):
    # Grid = (B, num_blocks). q/out are pre-arranged [B, Hkv, T, G, D] so a
    # grid cell owns whole (sublane, lane) tiles — Mosaic disallows
    # dynamically-offset sub-tile stores, so head grouping happens in the
    # BlockSpec layout, not in the kernel.
    # kv_alias_ref is the pool ALIASED as an output and never written: it
    # makes the read in-place so XLA stops inserting a defensive full-pool
    # copy per scan layer around the custom call (r5 profile: ~13 ms/layer
    # — 16 x 2 GiB copies dominated spec verify AND chunked prefill).
    if tree:
        tree_ref, o_ref, kv_alias_ref, kv_scratch, sems = rest
    else:
        (o_ref, kv_alias_ref, kv_scratch, sems), tree_ref = rest, None
    del kv_alias_ref
    b = pl.program_id(0)
    tb = pl.program_id(1)
    ps = kv_scratch.shape[2] // kb
    S = kv_scratch.shape[2]
    TB = q_ref.shape[2]
    G = q_ref.shape[3]
    Dq = q_ref.shape[4]
    D = head_dim
    Hkv = num_kv_heads

    seq_len = seq_lens_ref[b]
    ext = extend_lens_ref[b]
    start = seq_len - ext                       # abs position of q token 0
    blk_start = tb * TB                          # q-token offset in this row
    # Only blocks holding real extend tokens do work; the rest still zero
    # their output so o_ref is fully defined.
    active = blk_start < ext

    @pl.when(jnp.logical_not(active))
    def _():
        o_ref[0] = jnp.zeros((Hkv, TB, G, Dq), dtype=o_ref.dtype)

    @pl.when(active)
    def _():
        # Highest absolute position any q row in this block attends to.
        q_hi = start + jnp.minimum(blk_start + TB, ext) - 1
        n_strips = pl.cdiv(jnp.minimum(q_hi + 1, seq_len), S)
        w = window_ref[0]
        # Lowest kv position any q row here can see (q row 0 is position
        # start + blk_start; window keeps kv_pos > q_pos - w).
        lo = jnp.maximum(start + blk_start - w + 1, 0)
        first = lo // S

        def strip_dmas(slot, i):
            return _strip_dmas(
                kv_ref, kv_scratch, sems, page_table_ref,
                layer=layer_ref[0], slot=slot, strip=i, kb=kb, ps=ps,
                pmax=pmax, row_off=b * pmax,
            )

        for d in strip_dmas(0, first):
            d.start()

        q = q_ref[0].reshape(Hkv, TB * G, Dq).astype(jnp.float32)
        # Absolute position of each q row (row r belongs to token r // G).
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (1, TB * G, 1), 1) // G
        q_pos = start + blk_start + row_tok  # [1, TB*G, 1]

        def body(t, carry):
            m, l, acc = carry
            i = first + t
            slot = t % 2

            @pl.when(i + 1 < n_strips)
            def _():
                for d in strip_dmas((t + 1) % 2, i + 1):
                    d.start()

            for d in strip_dmas(slot, i):
                d.wait()
            strip = kv_scratch[slot].astype(jnp.float32)  # [Hkv, S, 2D]
            kv_pos = i * S + jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
            if tree:
                # Speculative-tree step: prefix kv (< tree_start) fully
                # attended; inside the node region the ancestor matrix
                # decides. The strip-aligned visibility is ONE small
                # matmul — vis[rows, Np] @ onehot[Np, S] where
                # onehot[j, s] = (strip col s holds node j) — instead of a
                # per-column gather Mosaic can't vectorize (reference:
                # TARGET_VERIFY custom mask, eagle_utils.cu).
                ts = tree_start_ref[b]
                Np = tree_ref.shape[1]
                vis = tree_ref[...]  # [TB, Np] f32 0/1
                vis_rows = jnp.broadcast_to(
                    vis[:, None, :], (TB, G, Np)
                ).reshape(TB * G, Np)
                col = jax.lax.broadcasted_iota(jnp.int32, (Np, S), 1)
                jidx = jax.lax.broadcasted_iota(jnp.int32, (Np, S), 0)
                onehot = (col - (ts - i * S) == jidx).astype(jnp.float32)
                treevis = jax.lax.dot(
                    vis_rows, onehot, preferred_element_type=jnp.float32
                )  # [TB*G, S]
                mask = ((kv_pos < ts) | (treevis[None] > 0.5)) & (
                    kv_pos < seq_len
                )
            else:
                mask = (
                    (kv_pos <= q_pos)
                    & (kv_pos < seq_len)
                    & (kv_pos > q_pos - w)
                )
            return _attn_strip(
                q, strip, scale=scale, valid_mask=mask,
                m=m, l=l, acc=acc, fold=fold, D=D, softcap=softcap,
            )

        Dacc = 2 * D if fold else D
        m0 = jnp.full((Hkv, TB * G, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((Hkv, TB * G, 1), jnp.float32)
        acc0 = jnp.zeros((Hkv, TB * G, Dacc), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_strips - first, body, (m0, l0, acc0))

        out = acc / jnp.maximum(l, 1e-30)
        o_ref[0] = out.reshape(Hkv, TB, G, Dacc).astype(o_ref.dtype)


def _pick_q_block(
    q_block: int, T: int, Hq: int, Hkv: int, S: int, D: int, fold: bool,
) -> int:
    """Largest power-of-two q block whose VMEM working set fits the ~16MB
    scoped limit (with margin). Dominant terms: fp32 score/prob tensors
    [Hq*TB, S], the fp32 accumulator [Hq*TB, Dacc], fp32 q copy, and the
    double-buffered KV scratch (+fp32 cast)."""
    Dq = 2 * D if fold else D
    Dacc = Dq
    scratch = 6 * Hkv * S * 2 * D  # bf16 buffers + fp32 cast
    tb = q_block
    while tb > 8:
        est = (
            4 * Hq * tb * (2 * S + Dq + Dacc + 4)
            + 2 * Hq * tb * 2 * Dq
            + scratch
        )
        if est <= 10 * 2**20:
            break
        tb //= 2
    return max(tb, 8)


def _fold_q(q: jax.Array, fold: bool) -> jax.Array:
    """Zero-pad the lane dim D -> 2D so the folded score matmul contracts
    only K lanes (V lanes multiply against zeros)."""
    if not fold:
        return q
    return jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("scale", "q_block", "interpret", "softcap"),
    donate_argnums=(1,),
)
def paged_attention_extend(
    q: jax.Array,            # [B, T, Hq, D]
    kv_pool: jax.Array,      # [L, Hkv, P, ps, 2D] (full pool, read-only)
    layer,                   # traced int32 scalar
    page_table: jax.Array,   # [B, PMAX] int32
    seq_lens: jax.Array,     # [B] int32 (total context incl. new tokens)
    extend_lens: jax.Array,  # [B] int32 (new tokens this step)
    *,
    scale: float,
    window=None,             # traced int32 scalar sliding window, or None
    softcap: float = 0.0,
    q_block: int = 128,
    interpret: bool = False,
    tree_mask=None,          # [T, N] bool ancestor matrix (spec verify)
    tree_start=None,         # [B] int32 node-region base
) -> jax.Array:
    """Ragged chunked-prefill attention over paged KV. Returns [B, T, Hq, D].

    Causal within the extend; full attention over the cached prefix —
    the fused equivalent of the reference's extend_attention + prefix-cache
    merge path (triton_ops/extend_attention.py, merge_state). New KV must
    already be scattered into the pool (write_kv_pages).

    With ``tree_mask``/``tree_start``: speculative-tree attention — q token
    t attends kv < tree_start plus node-region offsets j with
    tree_mask[t, j] (replaces the causal rule; reference: eagle_utils.cu
    tree masks). This is the production path for EAGLE draft/verify."""
    B, T, Hq, D = q.shape
    L, num_kv_heads, P, ps = kv_pool.shape[:4]
    G = Hq // num_kv_heads
    fold = D % 128 != 0
    Dq = 2 * D if fold else D
    kvf = kv_pool  # already stored K|V-folded [L, Hkv, P, ps, 2D]
    pmax = page_table.shape[1]
    kb = min(_strip_pages(ps, kv_pool.dtype), pmax)
    S_strip = kb * ps
    TB = min(_pick_q_block(q_block, T, Hq, num_kv_heads, S_strip, D, fold), T)
    num_blocks = pl.cdiv(T, TB)
    Tp = num_blocks * TB
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    q = _fold_q(q, fold)
    # Head-major layout: [B, Hkv, Tp, G, Dq] so each (b, tb) grid cell owns
    # whole tiles (see kernel comment).
    qh = q.reshape(B, Tp, num_kv_heads, G, Dq).transpose(0, 2, 1, 3, 4)

    window_arr = (
        jnp.full((1,), 1 << 30, jnp.int32)
        if window is None
        else jnp.asarray(window, jnp.int32).reshape(1)
    )
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    tree = tree_mask is not None
    if tree:
        ts_arr = jnp.asarray(tree_start, jnp.int32).reshape(B)
        N = tree_mask.shape[1]
        Np = -(-N // 128) * 128
        tm = jnp.pad(
            tree_mask.astype(jnp.float32),
            ((0, Tp - tree_mask.shape[0]), (0, Np - N)),
        )  # [Tp, Np]
    else:
        ts_arr = jnp.zeros((qh.shape[0],), jnp.int32)
    kernel = functools.partial(
        _extend_kernel, scale=scale, pmax=pmax, kb=kb,
        num_kv_heads=num_kv_heads, head_dim=D, fold=fold, softcap=softcap,
        tree=tree,
    )
    in_specs = [
        pl.BlockSpec(
            (1, num_kv_heads, TB, G, Dq), lambda b, tb, *_: (b, 0, tb, 0, 0)
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [
        page_table.reshape(-1), seq_lens, extend_lens, window_arr, layer_arr,
        ts_arr, qh, kvf,
    ]
    if tree:
        in_specs.append(pl.BlockSpec((TB, tm.shape[1]), lambda b, tb, *_: (tb, 0)))
        args.append(tm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B, num_blocks),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, num_kv_heads, TB, G, Dq),
                lambda b, tb, *_: (b, 0, tb, 0, 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, num_kv_heads, kb * ps, 2 * D), kv_pool.dtype),
            pltpu.SemaphoreType.DMA((2, kb)),
        ],
    )
    # Args flatten as (pt, sl, el, win, layer, ts, qh, kvf[, tm]) -> the
    # pool is input 7; aliasing it onto output 1 (returned unchanged) makes
    # the read in-place — without it XLA copies the 2 GiB pool around the
    # custom call at EVERY layer of the scan (see _extend_kernel comment).
    out, kvf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(qh.shape, q.dtype),
            jax.ShapeDtypeStruct(kv_pool.shape, kv_pool.dtype),
        ),
        input_output_aliases={7: 1},
        interpret=interpret,
    )(*args)
    if fold:
        out = out[..., D:]  # V half of the folded accumulator
    return (
        out.transpose(0, 2, 1, 3, 4).reshape(B, Tp, Hq, D)[:, :T],
        kvf,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "softcap"),
    donate_argnums=(2,),
)
def paged_attention_decode(
    q: jax.Array,          # [B, Hq, D]
    kv_new: jax.Array,     # [B, Hkv, 2D] — this step's K|V folded (pre-write)
    kv_pool: jax.Array,    # [L, Hkv, P, ps, 2D] (full pool, DONATED)
    layer,                 # traced int32 scalar
    page_table: jax.Array, # [B, PMAX] int32
    seq_lens: jax.Array,   # [B] int32
    *,
    scale: float,
    window=None,           # traced int32 scalar sliding window, or None
    softcap: float = 0.0,
    interpret: bool = False,
):
    """Single-token-per-sequence paged attention with fused in-place KV
    insert. Returns (out [B, Hq, D], updated kv_pool — same buffer).

    See _decode_kernel: one pipelined program over a flat (row-group,
    strip) work list. The flat maps are computed here (host side of the
    jit) from seq_lens; groups of R rows share strip iterations, so the
    scheduler should keep decode batches roughly sorted by context length
    to minimize masked-strip DMA waste (uniform batches waste nothing)."""
    B, Hq, D = q.shape
    L, num_kv_heads, P, ps = kv_pool.shape[:4]
    fold = D % 128 != 0
    Dq = 2 * D if fold else D
    kvn = kv_new.astype(kv_pool.dtype)
    pmax = page_table.shape[1]
    kb = min(_strip_pages(ps, kv_pool.dtype), pmax)
    S = kb * ps
    q = _fold_q(q, fold)

    R = min(8, B)
    if B % R:
        padB = R * pl.cdiv(B, R) - B
        q = jnp.pad(q, ((0, padB), (0, 0), (0, 0)))
        kvn = jnp.pad(kvn, ((0, padB), (0, 0), (0, 0)))
        page_table = jnp.pad(page_table, ((0, padB), (0, 0)))
        seq_lens = jnp.pad(seq_lens, (0, padB), constant_values=1)
    Bp = q.shape[0]
    G_ = Bp // R
    G = Hq // num_kv_heads
    qh = q.reshape(Bp, num_kv_heads, G, Dq)

    # Flat (group, strip) work list. Window skips whole strips below the
    # group's lowest visible position.
    win = (1 << 30) if window is None else window
    n_strips = (seq_lens + S - 1) // S                       # [Bp]
    first = jnp.maximum(seq_lens - win, 0) // S              # [Bp]
    first_g = first.reshape(G_, R).min(axis=1)               # [G_]
    n_g = n_strips.reshape(G_, R).max(axis=1)                # [G_]
    counts = n_g - first_g                                   # [G_] >= 1
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )                                                        # [G_+1]
    total = starts[G_].reshape(1)
    max_strips = -(-pmax // kb)
    kidx = jnp.arange(G_ * max_strips, dtype=jnp.int32)
    g_of = jnp.clip(
        jnp.searchsorted(starts[1:], kidx, side="right"), 0, G_ - 1
    ).astype(jnp.int32)
    strip_of = kidx - starts[g_of] + first_g[g_of]
    flags = (
        (kidx == starts[g_of]).astype(jnp.int32)
        + 2 * (kidx == starts[g_of + 1] - 1).astype(jnp.int32)
    )

    window_arr = jnp.full((1,), win, jnp.int32)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    # Ring depth: enough in-flight bytes to hide DMA latency, bounded by
    # VMEM (slots are R * Hkv * S * 2D each).
    slot_bytes = R * num_kv_heads * S * 2 * D * kv_pool.dtype.itemsize
    NS = int(max(2, min(4, (6 * 2**20) // max(slot_bytes, 1))))

    kernel = functools.partial(
        _decode_kernel, scale=scale, pmax=pmax, kb=kb,
        num_kv_heads=num_kv_heads, head_dim=D, fold=fold, softcap=softcap,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (Bp, num_kv_heads, G, Dq), lambda i, *_: (0, 0, 0, 0)
            ),
            pl.BlockSpec(
                (Bp, num_kv_heads, 2 * D), lambda i, *_: (0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (Bp, num_kv_heads, G, Dq), lambda i, *_: (0, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((NS, R, num_kv_heads, S, 2 * D), kv_pool.dtype),
            pltpu.SemaphoreType.DMA((NS, R, kb)),
            pltpu.SemaphoreType.DMA((NS, R)),
            pltpu.SMEM((NS, R), jnp.int32),
        ],
    )
    out, kvf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(qh.shape, q.dtype),
            jax.ShapeDtypeStruct(kv_pool.shape, kv_pool.dtype),
        ),
        # Args flatten as (page_table, seq_lens, group_of, strip_of, flags,
        # total, window, layer, q, kv_new, kvf) -> kvf is input 10; aliased
        # onto output 1 (the pool).
        input_output_aliases={10: 1},
        interpret=interpret,
    )(
        page_table.reshape(-1), seq_lens, g_of, strip_of, flags, total,
        window_arr, layer_arr, qh, kvn, kv_pool,
    )
    out = out.reshape(Bp, Hq, Dq)[:B]
    if fold:
        out = out[..., D:]
    return out, kvf
