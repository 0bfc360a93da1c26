"""Server configuration.

TPU-native analog of the reference's single-source-of-truth flag system
(reference: python/sglang/srt/server_args.py:46-266 — a ~190-flag dataclass
mirrored into argparse). We keep the same pattern: one dataclass, CLI mirror,
``__post_init__`` heuristics — but the flags describe a single-controller JAX
topology (mesh axes, bucket sets) instead of per-GPU worker processes.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional


@dataclasses.dataclass
class ServerArgs:
    # Model
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    dtype: str = "bfloat16"            # activation/weight compute dtype
    kv_cache_dtype: str = "auto"       # auto | bfloat16 | float32 | fp8_e4m3
    # Static FP8-KV dequant scale (kv_cache_dtype=fp8_e4m3): the pool
    # stores kv/scale, attention multiplies it back (reference:
    # layers/quantization/kv_cache.py k_scale/v_scale)
    kv_cache_scale: float = 1.0
    context_length: Optional[int] = None
    quantization: Optional[str] = None  # None | w4a16 | awq | gptq | fp8 | fp8_block | int8 | compressed-tensors
    load_format: str = "auto"          # auto | safetensors | dummy | sharded
    random_seed: int = 0

    # KV cache / memory
    page_size: int = 32                # tokens per KV page
    mem_fraction_static: float = 0.85  # fraction of HBM for weights+KV
    max_num_pages: Optional[int] = None  # override computed page count
    max_running_requests: int = 256
    max_prefill_tokens: int = 8192     # token budget per prefill batch
    chunked_prefill_size: int = 4096   # -1 disables chunking
    # Ring-attention sequence-sharded prefill over the data axis
    # (parallel/ring_prefill.py — SURVEY §7's net-new capability; the
    # reference has no SP/CP at all). Long fresh prompts shard their
    # token axis across the mesh instead of grinding on one device.
    enable_ring_prefill: bool = False
    ring_prefill_threshold: int = 4096  # min prompt tokens to use the ring
    # Double-sparsity decode attention (reference: --enable-double-sparsity
    # + ds_* flags server_args.py:199-204, double_sparsity_backend.py):
    # heavy-channel label cache + per-head token top-k at decode.
    enable_double_sparsity: bool = False
    ds_heavy_channels: int = 16        # label channels per kv head
    ds_token_budget: int = 256         # top-k tokens attended per head
    ds_recent: int = 64                # always-attended recent window
    ds_min_seq: int = 1024             # dense below this padded context
    ds_channel_config: Optional[str] = None  # .npz [L,Hkv,r] override
    # DP-attention for MLA models (reference: --enable-dp-attention,
    # srt/layers/dp_attention.py): attention runs batch-parallel over the
    # tensor axis (latent KV cannot be head-sharded), MoE stays
    # expert-parallel via a shard_map gather/psum_scatter
    # (parallel/dp_attention.py). Overlap: --tbo microbatch count
    # (reference: srt/two_batch_overlap.py).
    enable_dp_attention: bool = False
    dp_attention_capacity_factor: float = 2.0  # GShard capacity per chip
    tbo_microbatches: int = 1          # >1 enables two-batch overlap
    disable_radix_cache: bool = False
    # Hierarchical (host-offload) KV cache (reference: --enable-hierarchical-cache,
    # hicache_ratio; mem_cache/hiradix_cache.py)
    enable_hierarchical_cache: bool = False
    hicache_ratio: float = 2.0         # host tier size as multiple of device pool
    hicache_host_pages: Optional[int] = None  # absolute override
    # 3rd tier: content-addressed file store, write-through from the host
    # tier (reference: mem_cache/hicache_storage.py). None disables.
    hicache_storage_dir: Optional[str] = None

    # Robustness (reference: --watchdog-timeout server_args.py:97,
    # scheduler watchdog :2186; crash dump tokenizer_manager.py:1284;
    # NaN detection sampler.py:63)
    watchdog_timeout: float = 300.0    # s of a stuck scheduler step; 0 off
    watchdog_abort: bool = False       # kill the process on watchdog fire
    crash_dump_folder: Optional[str] = None  # last-requests dump on failure
    enable_nan_detection: bool = False # check fetched logprobs for NaN
    # Allow "module:function" custom_logit_processor specs in requests
    # (reference: --enable-custom-logit-processor server_args.py; the spec
    # is IMPORTED and invoked server-side, so it must be opt-in — an
    # unauthenticated /generate client must not get arbitrary-module
    # import). In-process callables via the Python Engine API are always
    # allowed (JSON cannot carry a callable).
    enable_custom_logit_processor: bool = False
    # KV event stream for external cache observers (reference:
    # disaggregation/kv_events.py ZmqEventPublisher; drained via
    # Engine.get_kv_events / GET /get_kv_events)
    enable_kv_events: bool = False

    # Scheduling
    schedule_policy: str = "lpm"       # lpm | fcfs | lof | random
    attention_backend: str = "auto"    # auto | pallas | xla
    schedule_conservativeness: float = 1.0
    stream_interval: int = 1
    # Decode-burst: run K decode iterations inside one jitted device program
    # (lax.scan), so sampled tokens feed the next iteration on-device and the
    # host pays one dispatch per K tokens. The TPU-native answer to the
    # reference's overlap scheduler (tp_worker_overlap_thread.py:53 hides
    # host work behind one GPU step; here the host leaves the loop
    # entirely). 1 disables. Finished-mid-burst rows waste their remaining
    # iterations, mirroring the overlap scheduler's one-step lag.
    decode_burst_size: int = 8

    # Overlap scheduler (reference: tp_worker_overlap_thread.py:53 /
    # --disable-overlap-schedule): dispatch step N+1 before fetching step
    # N's tokens. The token-feedback loop stays on the device via a slot
    # table (model_runner.tok_slots); host batch prep, detokenization and
    # finish checks run while the device computes. Disabled automatically
    # for speculative decoding.
    disable_overlap_schedule: bool = False
    # In-flight dispatched hot batches before the scheduler blocks on a
    # result fetch. >2 hides device->host latency on remote-attached chips
    # (each fetch costs a tunnel roundtrip); the cost is (depth-1) bursts
    # of extra token latency before finish checks see a token.
    overlap_inflight: int = 2

    # Parallelism (mesh axes over ICI/DCN)
    tp_size: int = 1                   # tensor axis
    dp_size: int = 1                   # data axis (replica count)
    # dp>1 request balancing (reference: data_parallel_controller.py:249
    # round_robin, :266 shortest_queue)
    dp_balance_policy: str = "shortest_queue"
    ep_size: int = 1                   # expert axis for MoE
    # Runtime expert-load rebalancing (reference: --enable-eplb +
    # eplb_manager.py). 0 disables the auto loop; rebalance stays
    # available via the /rebalance_experts RPC.
    enable_eplb: bool = False
    eplb_rebalance_interval_s: float = 0.0
    eplb_min_recorded_steps: int = 8
    num_hosts: int = 1
    host_rank: int = 0
    dist_init_addr: Optional[str] = None

    # Precompiled shape buckets (the CUDA-graph analog: one jit cache entry
    # per bucket; reference: model_executor/cuda_graph_runner.py:138).
    decode_bs_buckets: tuple = (1, 2, 4, 8, 16, 32, 64, 128, 256)
    prefill_token_buckets: tuple = (128, 256, 512, 1024, 2048, 4096, 8192)

    # Embedding serving (reference: serving_embedding.py): pooling of the
    # final hidden states. "last" (e5-mistral/gte style, chunk-safe) or
    # "mean" (mean over prompt tokens; incompatible with chunked prefill).
    embedding_pooling: str = "last"

    # Server
    host: str = "127.0.0.1"
    port: int = 30000
    log_level: str = "info"
    served_model_name: Optional[str] = None  # name reported by /v1/models
    # Output parsers (reference: --tool-call-parser / --reasoning-parser)
    tool_call_parser: str = "json"     # see parsers.function_call registry
    reasoning_parser: Optional[str] = None  # e.g. deepseek-r1 | qwen3 | kimi

    # Speculative decoding
    # PD disaggregation (reference: --disaggregation-mode prefill|decode,
    # srt/disaggregation/; here KV rides TCP over DCN instead of RDMA)
    disaggregation_mode: str = "none"  # none | prefill | decode
    disaggregation_kv_port: int = 0    # decode-side KV listener (0 = ephemeral)

    # LoRA (reference: --enable-lora / --max-loras-per-batch / --max-lora-rank)
    enable_lora: bool = False
    max_loras: int = 8                 # adapter pool slots
    max_lora_rank: int = 16
    lora_paths: Optional[str] = None   # comma-separated name=path preloads

    speculative_algorithm: Optional[str] = None  # None | eagle
    speculative_draft_model_path: Optional[str] = None
    speculative_num_steps: int = 3       # tree depth (draft forwards)
    speculative_num_draft_tokens: int = 4  # tree node budget
    # top-k children per tree node (reference: --speculative-eagle-topk);
    # 1 = chain drafting
    speculative_eagle_topk: int = 1
    # BENCH-ONLY: force every draft node on the deepest path to be
    # "accepted" so spec throughput is measurable with dummy weights
    # (reference analog: SIMULATE_ACC_LEN env in srt/speculative/
    # eagle_worker.py). Output tokens are NOT model-correct under this
    # flag; never enable it in serving.
    speculative_simulate_acc: bool = False
    # Fused spec steps per dispatch (the decode_burst_size analog for
    # speculative batches): the draft->verify->accept chain runs S times
    # on-device with token/position feedback in the scan carry, so the
    # host round-trip amortizes over up to S*(depth+1) tokens. Finish
    # checks lag by the burst horizon (speculative/eagle_worker.py).
    speculative_burst_size: int = 1

    # Testing / dev
    device: str = "auto"               # auto | tpu | cpu
    skip_tokenizer_init: bool = False
    enable_overlap_schedule: bool = True

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.chunked_prefill_size == -1:
            self.chunked_prefill_size = 1 << 30
        if self.kv_cache_dtype == "auto":
            self.kv_cache_dtype = self.dtype
        assert self.page_size > 0 and (self.page_size & (self.page_size - 1)) == 0, (
            "page_size must be a power of two"
        )

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(ServerArgs):
            if f.type in ("tuple", tuple):
                continue
            arg = "--" + f.name.replace("_", "-")
            default = f.default
            tname = str(f.type).replace("Optional[", "").rstrip("]")
            if tname == "bool":
                parser.add_argument(arg, action="store_true", default=default)
            else:
                cast = {"int": int, "float": float}.get(tname, str)
                parser.add_argument(arg, type=cast, default=default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in fields})
