"""DP-attention + expert-parallel MoE + two-batch overlap (MLA scale-out).

TPU re-design of the reference's data-parallel attention
(reference: srt/layers/dp_attention.py:61 — replica-local attention with a
TP-group gather before the MLP and a scatter after) and two-batch overlap
(reference: srt/two_batch_overlap.py:361 — microbatch interleaving so one
microbatch's MoE all-to-all hides behind the other's attention compute).

Why the reference needs it: MLA has a single latent KV "head", so tensor
parallelism cannot shard the KV cache — every TP rank duplicates the whole
latent pool, and attention FLOPs shrink 1/tp while KV bandwidth does not.
The fix is to run attention *data*-parallel across the ranks of the TP
group (each rank owns its batch rows end-to-end through attention) and keep
the FFN/MoE tensor/expert-parallel, converting between the two layouts at
the FFN boundary.

TPU-first expression — no process groups, no NCCL:

- **Attention**: MLA weights stay replicated over the ``tensor`` axis and
  activations carry a batch-dim sharding constraint over it.  GSPMD then
  executes attention data-parallel — each chip computes its batch shard
  with full heads — which is exactly the reference's "local attention"
  without any hand-written gather/scatter.
- **MoE**: a ``shard_map`` over the ``tensor`` axis implements the
  GShard-style expert-parallel FFN: ``all_gather`` the batch-sharded
  tokens (the reference's gather into the TP group), route identically on
  every chip, each chip computes only its expert shard's assignments into
  a fixed-capacity buffer, and a ``psum_scatter`` both sums the expert
  contributions and returns tokens to their owning chip (the reference's
  scatter).  The capacity buffer keeps shapes static for XLA; overflow
  assignments are dropped GShard-style (set ``capacity_factor >= tp`` for
  exact, drop-free execution — the CPU-mesh tests do).
- **Two-batch overlap**: the token stream is split into ``n`` microbatches
  and the MoE body is emitted once per microbatch in one XLA program.
  The chains are data-independent, so XLA's latency-hiding scheduler
  overlaps microbatch *i+1*'s ``all_gather`` with microbatch *i*'s expert
  GEMMs — the reference's TboForwardBatchPreparer effect without manual
  stream management.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_custom_tpu.parallel.mesh import TENSOR_AXIS, MeshContext


@dataclasses.dataclass
class DpAttentionContext:
    """Static plan for dp-attention over the ``tensor`` mesh axis."""

    mesh_ctx: MeshContext
    # capacity per chip = capacity_factor * N*K / tp (rounded up to 8).
    # >= tp means no assignment can ever be dropped.
    capacity_factor: float = 2.0
    # microbatches for two-batch overlap (1 = off)
    num_microbatches: int = 1

    @property
    def tp(self) -> int:
        return self.mesh_ctx.tp_size

    def supports(self, num_experts: int) -> bool:
        return self.tp > 1 and num_experts % self.tp == 0

    def batch_sharded(self, x: jax.Array) -> jax.Array:
        """Constrain a [B, T, ...] activation to batch-sharding over the
        tensor axis — the dp-attention layout."""
        spec = P(TENSOR_AXIS, *([None] * (x.ndim - 1)))
        return lax.with_sharding_constraint(
            x, NamedSharding(self.mesh_ctx.mesh, spec)
        )

    def capacity(self, n_assignments: int) -> int:
        c = math.ceil(self.capacity_factor * n_assignments / self.tp)
        return max(8, min(n_assignments, -(-c // 8) * 8))


def _local_expert_ffn(xg, topk_w, topk_e, gp, up, dn, lo, E_local, C):
    """One chip's expert shard applied to its routed assignments.

    xg: [N, H] gathered tokens; topk_*: [N, K] global routing;
    gp/up/dn: [E_local, ...] local expert weights; lo: first local expert.
    Returns [N, H] partial output (zero for tokens not routed here).
    """
    N, H = xg.shape
    K = topk_e.shape[1]
    flat_e = topk_e.reshape(-1)
    flat_w = topk_w.reshape(-1)
    # sort key: local assignments by local expert id, non-local last
    local = (flat_e >= lo) & (flat_e < lo + E_local)
    key = jnp.where(local, flat_e - lo, E_local)
    order = jnp.argsort(key, stable=True)[:C]
    sel_e = key[order]                       # [C] in [0, E_local]
    valid = sel_e < E_local
    sel_tok = order // K
    xs = jnp.where(valid[:, None], xg[sel_tok], 0)
    group_sizes = jnp.bincount(sel_e, length=E_local)
    gate = lax.ragged_dot(xs, gp, group_sizes)
    upp = lax.ragged_dot(xs, up, group_sizes)
    out = lax.ragged_dot(jax.nn.silu(gate) * upp, dn, group_sizes)
    w = jnp.where(valid, flat_w[order], 0.0).astype(out.dtype)
    out = jnp.where(valid[:, None], out, 0) * w[:, None]
    return jnp.zeros((N, H), out.dtype).at[sel_tok].add(
        out, mode="drop"
    )


def dp_moe_ffn(ctx: DpAttentionContext, x, lp, cfg, router_fn):
    """Expert-parallel MoE over the tensor axis for batch-sharded tokens.

    x: [N, H] tokens whose leading dim is batch-sharded over ``tensor``
    (the dp-attention activation layout). lp: the layer's param subtree
    (expert stacks sharded [E@tensor, ...]). router_fn(x, lp, cfg) ->
    (topk_w [N,K] f32, topk_e [N,K] i32), computed identically per chip.
    Returns [N, H] batch-sharded output (routed experts only — shared
    experts stay on the dense GSPMD path outside).
    """
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    tp = ctx.tp
    E_local = E // tp
    N = x.shape[0]
    C = ctx.capacity(N * K)
    mesh = ctx.mesh_ctx.mesh

    has_bias = "router_bias" in lp

    def shard(x_loc, router, router_bias, gp, up, dn):
        # [N/tp, H] -> [N, H]: the reference's TP-group gather
        xg = lax.all_gather(x_loc, TENSOR_AXIS, axis=0, tiled=True)
        rlp = {"router": router}
        if has_bias:
            rlp["router_bias"] = router_bias
        topk_w, topk_e = router_fn(xg, rlp, cfg)
        lo = lax.axis_index(TENSOR_AXIS) * E_local
        y = _local_expert_ffn(
            xg, topk_w, topk_e, gp, up, dn, lo, E_local, C
        )
        # sum expert contributions across chips AND hand each chip back
        # its own batch rows — the reference's scatter, fused into one
        # collective
        return lax.psum_scatter(y, TENSOR_AXIS, scatter_dimension=0,
                                tiled=True)

    e_spec = P(TENSOR_AXIS, None, None)
    bias = lp["router_bias"] if has_bias else jnp.zeros((E,), x.dtype)
    in_specs = (
        P(TENSOR_AXIS, None), P(), P(), e_spec, e_spec, e_spec,
    )
    fn = jax.shard_map(
        shard, mesh=mesh,
        in_specs=in_specs, out_specs=P(TENSOR_AXIS, None),
        check_vma=False,
    )

    nmb = max(1, ctx.num_microbatches)
    rows = x.shape[0]
    if nmb > 1 and rows % (nmb * tp) == 0:
        # two-batch overlap: independent gather->ffn->scatter chains that
        # XLA's latency-hiding scheduler interleaves
        parts = jnp.split(x, nmb, axis=0)
        outs = [
            fn(p, lp["router"], bias, lp["gate_proj"], lp["up_proj"],
               lp["down_proj"])
            for p in parts
        ]
        return jnp.concatenate(outs, axis=0)
    return fn(x, lp["router"], bias, lp["gate_proj"], lp["up_proj"],
              lp["down_proj"])
