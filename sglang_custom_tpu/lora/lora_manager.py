"""Batched multi-adapter LoRA serving.

Analog of the reference's LoRA stack (reference: srt/lora/lora_manager.py:46
LoRAManager with dynamic load/unload, lora/mem_pool.py GPU slot pool, and the
batched SGMV triton kernels under lora/triton_ops/). TPU-first re-design:

- Adapters live in **stacked device pools** ``[L, slots, in, r]`` /
  ``[L, slots, r, out]`` per target projection — the scanned model gathers
  each row's adapter by slot id and applies two small batched matmuls
  (the bgmv formulation). XLA batches these onto the MXU; no custom
  kernel needed at serving ranks (r <= 64).
- Slot 0 is the **zero adapter**: requests without LoRA ride the same
  batch with slot 0 and get an exact no-op, so LoRA and base requests
  mix freely in one continuous batch (reference: prepare_lora_batch
  lora_manager.py:192 does this with a sentinel uid).
- Loading is a host-side safetensors read + one ``at[slot].set`` per
  pool — no recompilation (pool shapes are static).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)

# HF/PEFT module name per supported target projection.
TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


def target_dims(cfg: ModelConfig) -> Dict[str, tuple]:
    H, D = cfg.hidden_size, cfg.head_dim
    Hq, Hkv, I = cfg.num_q_heads, cfg.num_kv_heads, cfg.intermediate_size
    return {
        "q_proj": (H, Hq * D),
        "k_proj": (H, Hkv * D),
        "v_proj": (H, Hkv * D),
        "o_proj": (Hq * D, H),
        "gate_proj": (H, I),
        "up_proj": (H, I),
        "down_proj": (I, H),
    }


class LoRAManager:
    def __init__(
        self,
        cfg: ModelConfig,
        max_adapters: int = 8,
        max_rank: int = 16,
        dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.max_rank = max_rank
        self.num_slots = max_adapters + 1  # slot 0 = zero adapter
        L = cfg.num_layers
        S, r = self.num_slots, max_rank
        self.pools: Dict[str, Dict[str, jax.Array]] = {
            t: {
                "A": jnp.zeros((L, S, din, r), dtype),
                "B": jnp.zeros((L, S, r, dout), dtype),
            }
            for t, (din, dout) in target_dims(cfg).items()
        }
        self.scales = np.zeros((S,), np.float32)
        self._by_name: Dict[str, int] = {}
        self._free = list(range(self.num_slots - 1, 0, -1))

    # ----------------------------------------------------------- adapters

    def slot_of(self, name_or_path: str) -> int:
        """Resolve a loaded adapter name, loading from disk on first use
        (reference: lora_manager load-on-demand via lora_path)."""
        if name_or_path in self._by_name:
            return self._by_name[name_or_path]
        return self.load(name_or_path, name_or_path)

    def load(self, name: str, path: str) -> int:
        if name in self._by_name:
            return self._by_name[name]
        if not self._free:
            raise RuntimeError(
                f"all {self.num_slots - 1} LoRA slots in use "
                "(unload an adapter or raise --max-loras)"
            )
        cfg_path = os.path.join(path, "adapter_config.json")
        with open(cfg_path) as f:
            acfg = json.load(f)
        r = acfg["r"]
        alpha = acfg.get("lora_alpha", r)
        if r > self.max_rank:
            raise ValueError(
                f"adapter rank {r} exceeds --max-lora-rank {self.max_rank}"
            )
        weights = self._read_weights(path)
        slot = self._free.pop()
        self._write_slot(slot, weights, r)
        self.scales[slot] = alpha / r
        self._by_name[name] = slot
        logger.info("loaded LoRA %s (r=%d alpha=%s) into slot %d",
                    name, r, alpha, slot)
        return slot

    def unload(self, name: str) -> bool:
        slot = self._by_name.pop(name, None)
        if slot is None:
            return False
        # Zero the slot so a stale id can't leak the old adapter.
        for t in self.pools:
            self.pools[t]["A"] = self.pools[t]["A"].at[:, slot].set(0.0)
            self.pools[t]["B"] = self.pools[t]["B"].at[:, slot].set(0.0)
        self.scales[slot] = 0.0
        self._free.append(slot)
        return True

    def loaded_adapters(self) -> Dict[str, int]:
        return dict(self._by_name)

    # ----------------------------------------------------------- internals

    @staticmethod
    def _read_weights(path: str) -> Dict[str, np.ndarray]:
        from safetensors import safe_open

        f = os.path.join(path, "adapter_model.safetensors")
        out = {}
        with safe_open(f, framework="pt") as st:
            for name in st.keys():
                out[name] = st.get_tensor(name).float().numpy()
        return out

    def _write_slot(self, slot: int, weights: Dict[str, np.ndarray], r: int):
        L = self.cfg.num_layers
        dims = target_dims(self.cfg)
        rmax = self.max_rank
        for t, (din, dout) in dims.items():
            A = np.zeros((L, din, rmax), np.float32)
            B = np.zeros((L, rmax, dout), np.float32)
            found = False
            for l in range(L):
                a = self._find(weights, l, t, "lora_A")
                b = self._find(weights, l, t, "lora_B")
                if a is None or b is None:
                    continue
                found = True
                A[l, :, :r] = a.T   # PEFT stores [r, in]
                B[l, :r, :] = b.T   # PEFT stores [out, r]
            if not found:
                continue
            dt = self.pools[t]["A"].dtype
            self.pools[t]["A"] = (
                self.pools[t]["A"].at[:, slot].set(A.astype(dt))
            )
            self.pools[t]["B"] = (
                self.pools[t]["B"].at[:, slot].set(B.astype(dt))
            )

    @staticmethod
    def _find(weights, l: int, target: str, kind: str):
        for prefix in ("base_model.model.model.layers.", "model.layers."):
            stem = f"{prefix}{l}."
            for mid in ("self_attn.", "mlp."):
                for suffix in (f"{kind}.weight", f"{kind}.default.weight"):
                    key = stem + mid + target + "." + suffix
                    if key in weights:
                        return weights[key]
        return None

    # ------------------------------------------------------------ step prep

    def row_meta(self, reqs) -> tuple:
        """(lora_ids [B] i32, lora_scale [B] f32) for a batch."""
        ids = np.asarray([getattr(r, "lora_slot", 0) for r in reqs], np.int32)
        return ids, self.scales[ids].astype(np.float32)
