"""Double-sparsity decode attention (heavy-channel labels + token top-k).

Capability analog of the reference's double-sparsity backend
(reference: srt/layers/attention/double_sparsity_backend.py +
DoubleSparseTokenToKVPool memory_pool.py, flags server_args.py:199-204;
method: Yang et al., "Post-Training Sparse Attention with Double
Sparsity"). TPU-first re-design:

- **Label cache folded into the paged pool**: r heavy channels of K ride
  the SAME pages as K|V ([..., 2D:2D+r]), written in the same scatter —
  allocator, radix tree, retraction, and PD transfer stay untouched
  (the reference keeps a separate label tensor pool).
- **Decode**: approximate scores = q(heavy) . labels over the whole
  context (r/2D of the full K read), per-kv-head token top-k via
  ``lax.approx_max_k`` (the TPU-native MIPS path — no full sort), then
  exact attention over ONLY the selected tokens plus a forced recent
  window. Top-k candidates exclude the recent region, so the two segments
  never duplicate a token.
- **Prefill / windowed / tree steps**: dense path (prefill is
  compute-bound; sparsity buys decode bandwidth).

Heavy channels are chosen per (layer, kv-head) offline from the weights
(``channels_from_weights``): ||Wk[:, d]|| * mean_g ||Wq[:, d]|| — a
zero-egress stand-in for the reference's activation-calibrated channel
config (its ds-channel-config file is also accepted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_custom_tpu.layers.attention.base import write_kv_pages
from sglang_custom_tpu.layers.attention.xla_backend import XlaAttentionBackend
from sglang_custom_tpu.model_executor.forward_batch import ForwardMeta

_NEG_INF = -1e30


def channels_from_weights(params: dict, cfg, r: int = 16) -> np.ndarray:
    """[L, Hkv, r] heavy-channel indices from projection weight norms."""
    wq = np.asarray(params["layers"]["q_proj"], np.float32)  # [L, H, Hq*D]
    wk = np.asarray(params["layers"]["k_proj"], np.float32)  # [L, H, Hkv*D]
    L = wq.shape[0]
    D, Hq, Hkv = cfg.head_dim, cfg.num_q_heads, cfg.num_kv_heads
    G = Hq // Hkv
    nk = np.linalg.norm(wk, axis=1).reshape(L, Hkv, D)
    nq = np.linalg.norm(wq, axis=1).reshape(L, Hkv, G, D).mean(axis=2)
    imp = nk * nq                                           # [L, Hkv, D]
    idx = np.argsort(-imp, axis=-1)[..., :r]
    return np.ascontiguousarray(np.sort(idx, axis=-1).astype(np.int32))


class DoubleSparsityBackend(XlaAttentionBackend):
    """Wraps the XLA dense path; decode steps over long contexts take the
    sparse route. The pool MUST be created with extra_feat == r."""

    def __init__(self, channels: np.ndarray, token_budget: int = 256,
                 recent: int = 64, min_seq: int = 1024,
                 kv_scale: float = 1.0):
        super().__init__(kv_scale=kv_scale)
        self.channels = jnp.asarray(channels)       # [L, Hkv, r]
        self.r = int(channels.shape[-1])
        self.token_budget = int(token_budget)
        self.recent = int(recent)
        self.min_seq = int(min_seq)

    def __call__(self, q, k_new, v_new, kv_pool, layer, meta: ForwardMeta,
                 scale, window=None, softcap: float = 0.0):
        ch = self.channels[layer]                   # [Hkv, r] (traced)
        labels = jnp.take_along_axis(
            k_new, ch[None, None], axis=-1
        )                                           # [B, T, Hkv, r]
        kv_pool = write_kv_pages(
            k_new, v_new, kv_pool, layer, meta,
            kv_scale=self.kv_scale, labels=labels,
        )
        B, T, Hq, D = q.shape
        ps = kv_pool.shape[3]
        S = meta.page_table.shape[1] * ps
        sparse_ok = (
            T == 1
            and meta.tree_mask is None
            and window is None
            and softcap == 0.0
            and S >= self.min_seq
            and S > self.token_budget + self.recent
        )
        if not sparse_ok:
            out = self._attend(
                q, kv_pool, layer, meta, scale, window, softcap
            )
            return out, kv_pool
        return (
            self._sparse_decode(q, kv_pool, layer, ch, meta, scale),
            kv_pool,
        )

    def _sparse_decode(self, q, kv_pool, layer, ch, meta, scale):
        B, T, Hq, D = q.shape
        layer_kv = jax.lax.dynamic_index_in_dim(
            kv_pool, layer, axis=0, keepdims=False
        )                                           # [Hkv, P, ps, 2D+r]
        Hkv, P, ps = layer_kv.shape[:3]
        G = Hq // Hkv
        S = meta.page_table.shape[1] * ps
        kk, rec = self.token_budget, self.recent

        # ---- stage 1: approximate scores from the label cache (r lanes)
        lab = layer_kv[..., 2 * D:]
        lab_g = lab[:, meta.page_table].reshape(Hkv, B, S, self.r)
        if lab_g.dtype == jnp.float8_e4m3fn:
            lab_g = lab_g.astype(q.dtype) * jnp.asarray(
                self.kv_scale, q.dtype
            )
        qh = q[:, 0].reshape(B, Hkv, G, D)
        q_heavy = jnp.take_along_axis(
            qh, ch[None, :, None, :], axis=-1
        )                                           # [B, Hkv, G, r]
        approx = jnp.einsum(
            "bkgr,kbsr->bks", q_heavy.astype(jnp.float32),
            lab_g.astype(jnp.float32),
        )                                           # [B, Hkv, S]
        kv_pos = jnp.arange(S, dtype=jnp.int32)
        sl = meta.seq_lens[:, None]                 # [B, 1]
        # candidates: real tokens strictly before the forced recent window
        cand = kv_pos[None, :] < (sl - rec)
        approx = jnp.where(cand[:, None, :], approx, _NEG_INF)
        _, sel = jax.lax.approx_max_k(
            approx.reshape(B * Hkv, S), kk
        )
        sel = sel.reshape(B, Hkv, kk)

        # forced recent window (always attended; includes this token)
        rpos = sl - rec + jnp.arange(rec, dtype=jnp.int32)[None, :]
        rsel = jnp.broadcast_to(
            jnp.maximum(rpos, 0)[:, None, :], (B, Hkv, rec)
        )
        allsel = jnp.concatenate([sel, rsel], axis=-1)  # [B, Hkv, n]
        n = kk + rec
        # validity: top-k picks must be real candidates (approx_max_k can
        # return masked slots when candidates < kk); recent picks must be
        # >= 0 and < seq_len
        v_top = jnp.take_along_axis(
            cand[:, None, :].repeat(Hkv, 1), sel, axis=-1
        )
        v_rec = (rpos[:, None, :] >= 0) & (
            rsel < sl[:, None, :]
        )
        valid = jnp.concatenate([v_top, v_rec], axis=-1)  # [B, Hkv, n]

        # ---- stage 2: exact attention over the selected tokens
        page = jnp.take_along_axis(
            meta.page_table[:, None, :].repeat(Hkv, 1),
            allsel // ps, axis=-1,
        )
        flat = page * ps + allsel % ps              # [B, Hkv, n]
        kvflat = layer_kv[..., : 2 * D].reshape(Hkv, P * ps, 2 * D)
        kv_sel = kvflat[
            jnp.arange(Hkv)[:, None, None], flat.transpose(1, 0, 2)
        ]                                           # [Hkv, B, n, 2D]
        if kv_sel.dtype == jnp.float8_e4m3fn:
            kv_sel = kv_sel.astype(q.dtype) * jnp.asarray(
                self.kv_scale, q.dtype
            )
        k_sel = kv_sel[..., :D]
        v_sel = kv_sel[..., D:2 * D]
        scores = jnp.einsum(
            "bkgd,kbnd->bkgn", qh.astype(jnp.float32),
            k_sel.astype(jnp.float32),
        ) * scale
        scores = jnp.where(
            valid.transpose(0, 1, 2)[:, :, None, :], scores, _NEG_INF
        )
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bkgn,kbnd->bkgd", probs, v_sel.astype(jnp.float32)
        )
        return out.reshape(B, 1, Hq, D).astype(q.dtype)
