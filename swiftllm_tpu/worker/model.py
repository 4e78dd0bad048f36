"""LlamaModel — the data-plane worker.

Capability parity with the reference's ``swiftllm/worker/model.py:18-408``
(load_weights / profile_num_blocks / init_kvcache_and_swap / forward /
swap_in_seqs / swap_out_seqs / free_seqs_resources), redesigned TPU-first:

- ``forward`` consumes a list of ScheduledSeqs (mixed prefill chunks +
  decodes), pads to static buckets, and runs ONE jitted SPMD program.
- ``profile_num_blocks`` sizes the KV cache from the compiled program's
  ``memory_analysis()`` instead of the reference's run-and-measure forged
  forward (model.py:93-131) — no OOM risk, no throwaway work.
- Swap in/out is ``jax.device_put``/``device_get`` of gathered cache pages to
  a pinned host buffer, replacing the reference's C++ ``swap_blocks``
  cudaMemcpyAsync extension (csrc/src/block_swapping.cpp:22-85).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.models.llama import StepBatch, make_step_fn
from swiftllm_tpu.parallel.mesh import (AXIS_DP, AXIS_TP, BATCH_SPECS,
                                        FEEDBACK_SPEC, KV_CACHE_SPEC,
                                        make_mesh, named)
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import Request
from swiftllm_tpu.utils import GB, cdiv, next_power_of_2
from swiftllm_tpu.worker.batch_builder import BucketKey, build_step_batch
from swiftllm_tpu.worker.block_manager import BlockManager


def _enable_compilation_cache(cache_dir: str):
    """Best-effort persistent XLA compile cache (huge win for serving
    restarts: every bucket's step program compiles once per machine)."""
    import os
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:   # unsupported backend / read-only fs: run uncached
        pass


def _device_memory_stats() -> dict:
    """Per-device HBM stats for cache sizing (patchable in tests)."""
    try:
        return jax.local_devices()[0].memory_stats() or {}
    except Exception:   # backends without memory_stats (some CPU builds)
        return {}


def _assert_decode_prefix(batch_np, key, dp: int):
    """Host-side guard for the fused decode kernel's row contract: valid
    decode rows must form a CONTIGUOUS PREFIX of each dp group's row axis
    (ops/paged_attention.py — the kernel's cross-row DMA prefetch chain only
    checks row b+1, so a valid row after an invalid one would wait on a
    semaphore nobody ever signals and hang the DEVICE). build_step_batch packs
    decode rows first, so this should never fire for engine traffic; it
    converts a violating direct caller's device hang into a stack trace."""
    q_lens = np.asarray(batch_np.q_lens).reshape(dp, -1)
    if key.q_len > 1:
        dec = np.asarray(batch_np.decode_row).reshape(dp, -1)
        valid = (q_lens > 0) & dec
    else:
        valid = q_lens > 0
    counts = valid.sum(axis=1)
    for g in range(dp):
        n = int(counts[g])
        if n and not valid[g, :n].all():
            raise ValueError(
                f"dp group {g}: decode-kind rows are not a contiguous prefix "
                f"(valid rows at {np.nonzero(valid[g])[0].tolist()}) — this "
                "violates the fused decode kernel's row contract and would "
                "hang the device; pack decode rows first (see "
                "worker/batch_builder.build_step_batch)")


class LlamaModel:
    def __init__(self, engine_config: EngineConfig,
                 model_config: LlamaModelConfig | None = None, mesh=None):
        self.engine_config = engine_config
        if engine_config.compilation_cache_dir:
            _enable_compilation_cache(engine_config.compilation_cache_dir)
        self.model_config = model_config or LlamaModelConfig.load_from_model_path(
            engine_config.model_path)
        self.mesh = mesh if mesh is not None else make_mesh(
            engine_config.dp_size, engine_config.tp_size)
        self.dp = self.mesh.shape[AXIS_DP]
        self.tp = self.mesh.shape[AXIS_TP]
        from swiftllm_tpu.worker.weights import effective_num_kv_heads
        self.num_kv_eff = effective_num_kv_heads(self.model_config, self.tp)

        self.dtype = jnp.dtype(engine_config.dtype)
        self.kv_dtype = (jnp.dtype(jnp.float8_e4m3fn)
                         if engine_config.kv_quant == "fp8" else self.dtype)
        self.params = None
        self.kv_cache = None          # [L, dp*S_local, 2, n_kv, hd], donated each step
        self.last_logprobs = None     # f32[dp*B] device array (enable_logprobs)
        self.last_key = None          # BucketKey of the most recent dispatch
        self.lora_slots: dict[str, int] = {}   # adapter name → slot (>= 1)
        self.lora_targets: tuple[str, ...] = ()
        self.token_feedback = None    # i32[dp*(max_seqs+1)] last sample per seq slot
        self.cpu_cache = None         # host numpy [L, cpu_slots, 2, n_kv, hd]
        self.hbm_block_mgrs: list[BlockManager] = []
        self.cpu_block_mgr: BlockManager | None = None
        self.num_blocks_per_shard = 0
        self._step_fns: dict[tuple, object] = {}
        self._swap_fns: dict[tuple, object] = {}
        self._batch_shardings = StepBatch(**named(self.mesh, BATCH_SPECS))
        self._cache_sharding = NamedSharding(self.mesh, KV_CACHE_SPEC)
        self._feedback_sharding = NamedSharding(self.mesh, FEEDBACK_SPEC)
        self._flat_batch_sharding = NamedSharding(self.mesh, P(AXIS_DP))

    # --- init -----------------------------------------------------------------
    def load_weights(self):
        from swiftllm_tpu.worker.weights import load_params
        self.params = load_params(self.engine_config, self.model_config, self.mesh)
        if self.engine_config.lora_paths:
            self._load_loras()

    def _load_loras(self):
        """Load the configured LoRA adapters into the params tree BEFORE any
        step compiles (the stacked adapters are part of the program).
        lora_paths: "name=/path,name2=/path2", or "dummy:a,b[,r=K]" for
        deterministic random adapters (tests/benches, no files)."""
        import jax.numpy as jnp
        import ml_dtypes

        from swiftllm_tpu.parallel.mesh import named, param_specs
        from swiftllm_tpu.worker.lora import (load_lora_adapters,
                                              make_dummy_loras)
        spec_raw = self.engine_config.lora_paths
        dtype = (ml_dtypes.bfloat16
                 if jnp.dtype(self.engine_config.dtype) == jnp.bfloat16
                 else np.dtype(self.engine_config.dtype))
        if spec_raw.startswith("dummy:"):
            parts = [p for p in spec_raw[len("dummy:"):].split(",") if p]
            r = 8
            names = []
            for p in parts:
                if p.startswith("r="):
                    r = int(p[2:])
                else:
                    names.append(p)
            entries, scales, slots, targets = make_dummy_loras(
                names, self.model_config, self.num_kv_eff, dtype, r=r)
        else:
            paths = dict(item.split("=", 1)
                         for item in spec_raw.split(",") if item)
            entries, scales, slots, targets = load_lora_adapters(
                paths, self.model_config, self.num_kv_eff, dtype)
        self.lora_slots = slots
        self.lora_targets = targets
        specs = param_specs(self.engine_config.quant, qkv_bias=False,
                            lora_targets=targets)
        lora_shardings = named(self.mesh,
                               {k: specs["layers"][k]
                                for k in entries})
        for k, v in entries.items():
            self.params["layers"][k] = jax.tree.map(
                lambda arr, s: jax.device_put(arr, s), v, lora_shardings[k])
        self.params["lora_scale"] = jax.device_put(
            scales, named(self.mesh, specs["lora_scale"]))

    def _weights_bytes(self) -> int:
        return sum(x.nbytes for x in jax.tree.leaves(self.params))

    def _lanes_global(self) -> int:
        """Cache lane width across all tp shards: [K_all ‖ V_all] per shard,
        plus one per-shard scale-lane tile under fp8 KV quant (per-token
        power-of-2 K/V scales — models/llama.py FP8_SCALE_LANES)."""
        from swiftllm_tpu.models.llama import FP8_SCALE_LANES
        lanes = self.num_kv_eff * 2 * self.model_config.head_dim
        if self.engine_config.kv_quant == "fp8":
            lanes += self.tp * FP8_SCALE_LANES
        return lanes

    def _cache_shape(self, num_blocks_per_shard: int) -> tuple[int, ...]:
        """3-D [L, S, lanes]; each tp shard's lane slice is [K_all ‖ V_all
        (‖ scales)] (its K heads contiguous, then its V heads) — stored in
        exactly the shape the jitted step scans over (a reshape at the scan
        boundary breaks XLA carry aliasing: two full-cache copies per step)."""
        mc, cfg = self.model_config, self.engine_config
        s_local = (num_blocks_per_shard + 1) * cfg.block_size   # +1 garbage page
        return (mc.num_layers, self.dp * s_local, self._lanes_global())

    def profile_num_blocks(self) -> int:
        """Pages per dp shard that fit in HBM, from compiled-program memory stats
        (replaces reference model.py:93-131 run-and-measure)."""
        cfg = self.engine_config
        if cfg.num_hbm_blocks is not None:
            return cfg.num_hbm_blocks
        stats = _device_memory_stats()
        # Backends that don't report memory_stats get a conservative default:
        # 16 GB matches the v5e HBM, but a CPU backend assuming 16 GB would
        # try to materialize a ~15 GB host cache (measured: examples/offline.py
        # on the 1-core CPU box effectively hung zeroing it).
        default_limit = (16 * GB if jax.local_devices()[0].platform != "cpu"
                         else 1 * GB)
        limit = stats.get("bytes_limit", default_limit)
        in_use = stats.get("bytes_in_use", self._weights_bytes())

        # Compile the worst-case bucket to learn peak temp usage. The pages
        # bucket is capped by the kernel's page-table budget (temp usage
        # scales with the token/row buckets, not with Pg).
        from swiftllm_tpu.ops.paged_attention import max_pages_cap
        rows = next_power_of_2(cfg.max_batch_size)
        pages = min(cfg.page_buckets[-1], max_pages_cap(rows))
        key = BucketKey(tokens=cfg.token_buckets[-1],
                        rows=rows,
                        pages=pages,
                        q_len=next_power_of_2(min(cfg.prefill_chunk_size,
                                                  cfg.max_tokens_in_batch)))
        probe_blocks = max(key.pages, 1)
        compiled = self._lower(key, probe_blocks)
        mem = compiled.memory_analysis()
        temp = getattr(mem, "temp_size_in_bytes", 0)

        mc = self.model_config
        block_bytes = (mc.num_layers * self._lanes_global()
                       * self.kv_dtype.itemsize * cfg.block_size
                       // self.tp)  # per-shard pages hold n_kv_eff/tp heads
        usable = int(limit * cfg.hbm_mem_utilization) - in_use - temp
        num = usable // (block_bytes * 1)
        if num <= 0:
            raise RuntimeError(
                f"no HBM left for KV cache: limit={limit/GB:.1f}GB in_use={in_use/GB:.1f}GB "
                f"temp={temp/GB:.1f}GB")
        return int(num)

    def init_kvcache_and_swap(self, num_blocks_per_shard: int | None = None):
        cfg = self.engine_config
        mc = self.model_config
        if num_blocks_per_shard is None:
            num_blocks_per_shard = self.profile_num_blocks()
        if jax.process_count() > 1:
            # Every host must size the cache identically (profiling can
            # differ slightly across hosts); process 0's count wins.
            from swiftllm_tpu.parallel.distributed import agree_num_blocks
            num_blocks_per_shard = agree_num_blocks(num_blocks_per_shard)
        self.num_blocks_per_shard = num_blocks_per_shard
        shape = self._cache_shape(num_blocks_per_shard)
        self.kv_cache = jax.jit(
            lambda: jnp.zeros(shape, self.kv_dtype),
            out_shardings=self._cache_sharding)()
        fb_local = cfg.max_seqs_in_block_table + 1   # +1 garbage slot
        self.token_feedback = jax.jit(
            lambda: jnp.zeros((self.dp * fb_local,), jnp.int32),
            out_shardings=self._feedback_sharding)()
        self.hbm_block_mgrs = [
            BlockManager(f"hbm{g}", num_blocks_per_shard, cfg.block_size,
                         cfg.max_seqs_in_block_table, cfg.max_blocks_per_seq,
                         enable_prefix_caching=cfg.enable_prefix_caching)
            for g in range(self.dp)]
        # One host swap pool shared by all dp groups; rows are keyed by
        # (dp_group, seq_id) since seq ids are per-group (see _cpu_key).
        self.cpu_block_mgr = BlockManager(
            "cpu", cfg.num_cpu_blocks, cfg.block_size,
            self.dp * cfg.max_seqs_in_block_table, cfg.max_blocks_per_seq)
        if cfg.num_cpu_blocks > 0:
            self.cpu_cache = np.zeros(
                (mc.num_layers, cfg.num_cpu_blocks * cfg.block_size,
                 self._lanes_global()),
                dtype=self.kv_dtype)

    @property
    def num_hbm_blocks(self) -> int:
        """Total page budget the scheduler sees (pages per dp shard — each shard
        must be able to hold its share)."""
        return self.num_blocks_per_shard

    # --- the step --------------------------------------------------------------
    def _get_step_fn(self, key: BucketKey, return_logits: bool = False):
        k = (key, return_logits)
        if k not in self._step_fns:
            self._step_fns[k] = make_step_fn(
                self.mesh, self.model_config, page_size=self.engine_config.block_size,
                q_bucket=key.q_len, use_pallas=self.engine_config.use_pallas,
                T=key.tokens, B=key.rows, Pg=key.pages,
                return_logits=return_logits, quant=self.engine_config.quant,
                use_sampler=bool(key.sampling),
                fp8_scaled=self.engine_config.kv_quant == "fp8",
                return_logprobs=self.engine_config.enable_logprobs,
                lora_targets=self.lora_targets,
                sample_span=key.spec, multi_step=key.steps)
        return self._step_fns[k]

    def _lower(self, key: BucketKey, num_blocks: int):
        """AOT-compile the step for a bucket (for profiling / warmup)."""
        mc, cfg = self.model_config, self.engine_config
        dp = self.dp
        s_local = (num_blocks + 1) * cfg.block_size
        cache = jax.ShapeDtypeStruct(
            self._cache_shape(num_blocks), self.kv_dtype,
            sharding=self._cache_sharding)
        from swiftllm_tpu.worker.batch_builder import packed_len
        batch = jax.ShapeDtypeStruct((packed_len(key, dp),), jnp.int32,
                                     sharding=self._flat_batch_sharding)
        params_sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            self.params)
        feedback = jax.ShapeDtypeStruct(
            (dp * (cfg.max_seqs_in_block_table + 1),), jnp.int32,
            sharding=self._feedback_sharding)
        fn = self._get_step_fn(key)
        return fn.lower(params_sds, cache, feedback, batch).compile()

    def forward_async(self, scheduled: list[ScheduledSeq],
                      groups: list[list[ScheduledSeq]] | None = None,
                      return_logits: bool = False, multi_step: int = 1):
        """Dispatch one step WITHOUT waiting for the result.

        Returns (tokens, rows[, logits]) where ``tokens`` is a DEVICE array
        whose copy-to-host has been started asynchronously — call
        ``np.asarray(jax.device_get(tokens))`` (or ``resolve_tokens``) to
        block. Thanks to the on-device feedback buffer, the NEXT step can be
        dispatched before this one's token values reach the host (the
        builder reads unresolved tokens from the feedback buffer). This is
        what hides host↔device latency on TPU (reference model.py:359 instead
        eats a .tolist() sync every step).
        """
        if groups is None:
            assert self.dp == 1, "pass explicit dp groups when dp > 1"
            groups = [scheduled]
        batch_np, key, rows = build_step_batch(groups, self.hbm_block_mgrs,
                                               self.engine_config,
                                               multi_step=multi_step)
        if self.engine_config.use_pallas:
            _assert_decode_prefix(batch_np, key, self.dp)
        from swiftllm_tpu.worker.batch_builder import pack_step_batch
        flat_np = pack_step_batch(batch_np, self.dp)
        if jax.process_count() > 1:
            # Multi-host: announce this step so every follower enters the same
            # compiled program with the same batch (parallel/distributed.py).
            from swiftllm_tpu.parallel.distributed import broadcast_step
            flat_np, key = broadcast_step(flat_np, key, dp=self.dp,
                                          return_logits=return_logits)
        out = self.execute_packed(flat_np, key, return_logits)
        if return_logits:
            tokens, logits = out
            return tokens, rows, logits
        return out, rows

    def execute_packed(self, flat_np: np.ndarray, key: BucketKey,
                       return_logits: bool = False):
        """Run one step from an already-packed batch buffer (the follower path
        of a multi-host run, and the tail of forward_async). Returns the
        device tokens array (with the host copy started) — or (tokens, logits)
        when return_logits."""
        flat = jax.device_put(flat_np, self._flat_batch_sharding)
        self.last_key = key   # the engine reads bucket variant info (e.g. the
                              # spec span width) right after dispatch
        step = self._get_step_fn(key, return_logits)
        out = step(self.params, self.kv_cache, self.token_feedback, flat)
        lp = None
        if self.engine_config.enable_logprobs:
            tokens, self.kv_cache, self.token_feedback, lp, *rest = out
        else:
            tokens, self.kv_cache, self.token_feedback, *rest = out
        logits = rest[0] if return_logits else None
        # Stash the logprobs DEVICE array next to the tokens; the engine
        # captures it right after dispatch and resolves it with the tokens
        # (same async copy pattern — never on the dispatch critical path).
        self.last_logprobs = lp
        for arr in (tokens, lp):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        return (tokens, logits) if return_logits else tokens

    def forward(self, scheduled: list[ScheduledSeq],
                groups: list[list[ScheduledSeq]] | None = None,
                return_logits: bool = False, multi_step: int = 1):
        """Run one step synchronously. Returns (tokens i32[dp*B_bucket], rows)
        — rows[i] is the ScheduledSeq for row i (None for padding). The caller
        applies tokens to requests where ``rows[i].samples_token``. With
        ``multi_step`` S > 1 tokens come out [dp*B_bucket*S], row-major."""
        out = self.forward_async(scheduled, groups, return_logits, multi_step)
        if return_logits:
            tokens, rows, logits = out
            return (np.asarray(jax.device_get(tokens)), rows,
                    np.asarray(jax.device_get(logits)))
        tokens, rows = out
        return np.asarray(jax.device_get(tokens)), rows

    # --- swap (host offload) ------------------------------------------------------
    # Whole-sequence granularity like the reference (SURVEY.md §3.4); page data
    # moves as one gather/device_get (out) or device_put/scatter (in).

    def _swap_gather_fn(self, n_pages_bucket: int):
        k = ("gather", n_pages_bucket)
        if k not in self._swap_fns:
            ps = self.engine_config.block_size

            def gather(cache, pages):
                slots = (pages[:, None] * ps
                         + jnp.arange(ps, dtype=jnp.int32)[None, :]).reshape(-1)
                return cache[:, slots]
            # Replicated output: one all-gather over the mesh, so EVERY host
            # holds the full page data and can stage it into its (identical)
            # host swap pool — this is what makes host-offload work on
            # multi-host runs, where each process can only device_get the
            # shards its own devices hold.
            self._swap_fns[k] = jax.jit(
                gather, out_shardings=NamedSharding(self.mesh, P()))
        return self._swap_fns[k]

    def _swap_scatter_fn(self, n_pages_bucket: int):
        k = ("scatter", n_pages_bucket)
        if k not in self._swap_fns:
            ps = self.engine_config.block_size

            def scatter(cache, pages, data):
                slots = (pages[:, None] * ps
                         + jnp.arange(ps, dtype=jnp.int32)[None, :]).reshape(-1)
                return cache.at[:, slots].set(data)
            self._swap_fns[k] = jax.jit(scatter, donate_argnums=(0,))
        return self._swap_fns[k]

    def _cpu_key(self, r: Request) -> int:
        """Row in the (shared) host swap pool: seq ids are per-dp-group."""
        return r.dp_group * self.engine_config.max_seqs_in_block_table + r.seq_id

    def _global_pages(self, g: int, pages) -> np.ndarray:
        """Group-local page ids → flat page ids into the [L, dp*S_local, ..]
        cache (each group's pool occupies a contiguous slot range, matching
        the "dp" sharding of axis 1)."""
        return np.asarray(pages) + g * (self.num_blocks_per_shard + 1)

    def _pad_pages(self, pages: np.ndarray, garbage_page: int) -> tuple[np.ndarray, int]:
        """Pad a page-id list to a pow2 bucket (pointing extras at the group's
        garbage page, keeping padded traffic within its shard) to bound
        swap-fn recompiles."""
        n = len(pages)
        bucket = next_power_of_2(max(n, 1))
        padded = np.full(bucket, garbage_page, np.int32)
        padded[:n] = pages
        return padded, n

    def _page_bytes(self) -> int:
        return (self.engine_config.block_size * self._lanes_global()
                * self.kv_dtype.itemsize)

    @staticmethod
    def _encode_swap_payload(entries) -> np.ndarray:
        """[per request: dp_group, seq_id, n_tokens, n_pages, page ids...] —
        the flat i32 wire format every host replays a swap op from
        (parallel/distributed.py broadcast_swap)."""
        out: list[int] = []
        for g, seq_id, n_tokens, pages in entries:
            out += [g, seq_id, n_tokens, len(pages)]
            out += [int(p) for p in pages]
        return np.asarray(out, np.int32)

    @staticmethod
    def _decode_swap_payload(payload: np.ndarray):
        i, n = 0, len(payload)
        while i < n:
            g, seq_id, n_tokens, n_pages = (int(x) for x in payload[i:i + 4])
            yield g, seq_id, n_tokens, np.asarray(payload[i + 4:i + 4 + n_pages])
            i += 4 + n_pages

    def swap_out_seqs(self, requests: list[Request]):
        """Offload whole sequences' KV pages to the host swap pool. On
        multi-host runs the op is broadcast so every process stages the
        (replicated) gathered page data into its own identical swap pool —
        the reference is single-GPU (model.py:361-399); this is the SPMD
        version of its swap_blocks path."""
        payload = self._encode_swap_payload(
            [(r.dp_group, r.seq_id, r.num_cached_tokens,
              self._global_pages(r.dp_group,
                                 self.hbm_block_mgrs[r.dp_group]
                                 .seq_block_ids(r.seq_id)))
             for r in requests])
        if jax.process_count() > 1:
            from swiftllm_tpu.parallel.distributed import (OP_SWAP_OUT,
                                                           broadcast_swap)
            broadcast_swap(OP_SWAP_OUT, payload)
        self.apply_swap_out(payload)
        for r in requests:   # control-plane page accounting (primary only)
            self.hbm_block_mgrs[r.dp_group].free_seq(r.seq_id)

    def apply_swap_out(self, payload: np.ndarray):
        """Every host: gather the pages from the (sharded) device cache and
        stage them into the host swap pool. Page ids come from the payload,
        NOT the block managers — followers don't track HBM pages."""
        from swiftllm_tpu.native import copy_pages
        cpu = self.cpu_block_mgr
        smax = self.engine_config.max_seqs_in_block_table
        for g, seq_id, n_tokens, src_pages in self._decode_swap_payload(payload):
            dst_pages = cpu.allocate_fresh_for_seq(g * smax + seq_id, n_tokens)
            padded, n = self._pad_pages(
                src_pages, int(self._global_pages(g, self.num_blocks_per_shard)))
            # numpy in: jit replicates host-local values onto the (possibly
            # multi-host) mesh — every process passes identical bytes.
            data = self._swap_gather_fn(len(padded))(self.kv_cache, padded)
            data = np.ascontiguousarray(jax.device_get(data))
            # Host scatter staging→swap-cache: native run-coalesced memcpy.
            copy_pages(self.cpu_cache, data, dst_pages,
                       np.arange(n, dtype=np.int32), self._page_bytes())

    def swap_in_seqs(self, requests: list[Request]):
        """Restore swapped-out sequences into HBM pages. The primary allocates
        the destination pages (it owns the HBM block managers) and broadcasts
        them; every host scatters its identical staged data back."""
        payload = self._encode_swap_payload(
            [(r.dp_group, r.seq_id, r.num_cached_tokens,
              self.hbm_block_mgrs[r.dp_group]
              .allocate_fresh_for_seq(r.seq_id, r.num_cached_tokens))
             for r in requests])
        if jax.process_count() > 1:
            from swiftllm_tpu.parallel.distributed import (OP_SWAP_IN,
                                                           broadcast_swap)
            broadcast_swap(OP_SWAP_IN, payload)
        self.apply_swap_in(payload)

    def apply_swap_in(self, payload: np.ndarray):
        """Every host: stage swap-pool pages back and scatter into the device
        cache (payload pages are group-LOCAL destination page ids)."""
        from swiftllm_tpu.native import copy_pages
        cfg = self.engine_config
        cpu = self.cpu_block_mgr
        smax = cfg.max_seqs_in_block_table
        for g, seq_id, n_tokens, dst_local in self._decode_swap_payload(payload):
            src_pages = cpu.seq_block_ids(g * smax + seq_id).copy()
            padded, n = self._pad_pages(
                self._global_pages(g, dst_local),
                int(self._global_pages(g, self.num_blocks_per_shard)))
            pad_data = np.zeros((self.model_config.num_layers,
                                 len(padded) * cfg.block_size,
                                 self._lanes_global()),
                                self.kv_dtype)
            # Host gather swap-cache→staging: native run-coalesced memcpy.
            copy_pages(pad_data, self.cpu_cache,
                       np.arange(n, dtype=np.int32), src_pages, self._page_bytes())
            self.kv_cache = self._swap_scatter_fn(len(padded))(
                self.kv_cache, padded, pad_data)
            cpu.free_seq(g * smax + seq_id)

    def free_seqs_resources(self, requests: list[Request]):
        """Release all pages of finished sequences (reference model.py:401-408)."""
        for r in requests:
            self.hbm_block_mgrs[r.dp_group].free_seq(r.seq_id)

    def match_prefix(self, request: Request) -> int:
        """Automatic prefix caching: install cached full prompt pages into the
        newly admitted request's page list and mark those tokens cached.
        Called by the scheduler at admission (after seq_id/dp_group are
        assigned, before the step batch is built)."""
        matched = self.hbm_block_mgrs[request.dp_group].match_prefix(
            request.seq_id, request.prompt_token_ids,
            namespace=request.lora_slot)
        if matched:
            request.num_cached_tokens = matched
        return matched

    def free_swap_resources(self, requests: list[Request]):
        """Release the host swap pages of requests that died while swapped out
        (broadcast on multi-host so every pool replica frees in lockstep)."""
        if self.cpu_block_mgr is None or not requests:
            return
        payload = self._encode_swap_payload(
            [(r.dp_group, r.seq_id, 0, ()) for r in requests])
        if jax.process_count() > 1:
            from swiftllm_tpu.parallel.distributed import (OP_SWAP_FREE,
                                                           broadcast_swap)
            broadcast_swap(OP_SWAP_FREE, payload)
        self.apply_swap_free(payload)

    def apply_swap_free(self, payload: np.ndarray):
        smax = self.engine_config.max_seqs_in_block_table
        for g, seq_id, _, _ in self._decode_swap_payload(payload):
            self.cpu_block_mgr.free_seq(g * smax + seq_id)
