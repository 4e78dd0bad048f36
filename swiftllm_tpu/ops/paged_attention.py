"""Ragged paged attention — Pallas TPU kernels.

Replaces both of the reference's attention paths — the varlen causal prefill
flash attention (swiftllm/worker/kernels/prefill_attn.py, and its
vllm_flash_attn stand-in, transformer_layer.py:86-96) and the two-phase
flash-decoding paged attention (swiftllm/worker/kernels/paged_attn.py:10-149)
— which is what lets the scheduler put prefill chunks and decode tokens in the
same step.

Contract (identical to models.llama._ragged_paged_attention_jnp): batch row b
has q_lens[b] query tokens, contiguous in the flat token stream starting at
q_starts[b]; they are the LAST q_lens[b] positions of a sequence whose total
KV length (after this step's cache writes) is seq_lens[b], with KV living in
pages page_table[b]. Causal within the tail: query i of row b has position
seq_lens[b] - q_lens[b] + i.

Two variants share the KV-streaming core (per-page async copies HBM→VMEM,
double-buffered across KV chunks, copying only pages that hold data; online
softmax in fp32):

- **decode** (q_bucket == 1): one grid step per row with the KV-cache UPDATE
  fused in (cache aliased in/out; page read-modify-write DMA; the new token's
  attention folds in from VMEM). All q heads ride the sublane axis → n_kv
  matmuls of [group, chunk] per chunk. The next row's first chunk prefetches
  across grid steps; the page write-back completes during the next row.
- **mixed/prefill** (q_bucket > 1): grid (B, q_tiles); each tile DMAs its q
  rows from HBM at a dynamic offset; the caller scatters the new KV first.
  The builder aligns every sequence's span to the (>=16-row) tile so offsets
  are provably tile-aligned — Mosaic rejects unaligned or single-row dynamic
  slices.

Mosaic layout rules this design honors (learned the hard way):
- memrefs are lane-tiled (last dim padded to 128): DMA-sliced arrays are
  passed as 2-D views with 128-aligned minor dims ([T, n_q*hd],
  [S, 2*n_kv*hd]); heads are extracted with lane slices on VMEM values (no
  lane-splitting reshapes, which fail for hd < 128).
- dynamic row-slices must be sublane-tile aligned (8 f32 / 16 bf16); BlockSpec
  blocks need >=8 sublanes or the full array dim.
- The reference's seq_block_size SM-occupancy heuristic (model.py:305-324) has
  no TPU analog: one core walks chunks sequentially, sized by a VMEM budget.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swiftllm_tpu.utils import cdiv, next_power_of_2, tile_q_for

NEG_INF = -1e30
# Sliding-window mask value: strictly BELOW the online-softmax init m0
# (= NEG_INF), so a chunk whose keys are ALL window-masked keeps mi at m0 and
# exp(WIN_NEG - m0) underflows to exact 0 — with the mask at m0 itself,
# exp(0) = 1 would poison l/acc. (Causal masking never fully masks a chunk:
# the loop bounds already stop at the causal KV need.)
WIN_NEG = -2e30

# v5e scalar memory (SMEM) is 1 MiB; the scalar-prefetched page table
# [rows, Pg] i32 is by far its largest tenant. Reserve headroom for the other
# per-row scalar vectors and the compiler's own scoped allocations.
SMEM_BYTES = 1 << 20
SMEM_HEADROOM = 64 * 1024


def smem_pages_cap(rows: int) -> int:
    """Largest pages-per-seq bucket whose scalar-prefetched page table still
    fits SMEM at this row bucket (pow2-floored). Buckets beyond this switch
    to the HBM-staged page-table path (per-row page-list DMAs into SMEM
    scratch inside the kernel), whose own ceiling is staged_pages_cap()."""
    cap = (SMEM_BYTES - SMEM_HEADROOM) // (4 * max(rows, 1))
    return max(1, 1 << (cap.bit_length() - 1))


def _decode_r() -> int:
    """Rows per grid step of the grouped decode kernel. R=4 measured +16% on
    v5e in r2 (rows share one double-block-diagonal matmul; the serial kernel
    was issue-bound); the block-diag padding FLOPs grow as R^2, so the win
    inverts at some R. Env-sweepable for on-chip tuning."""
    return int(os.environ.get("SWIFTLLM_DECODE_R", "4"))


def decode_group_geometry(B: int) -> tuple[int, int, int]:
    """(R, Bp, GB) the decode dispatch will use for a B-row bucket — callers
    building the deferred-commit pending buffer ([L, GB, P*R*W], group-major)
    must match the kernel's grouping exactly."""
    R = min(_decode_r(), B)
    Bp = B if B % R == 0 else R
    return R, Bp, Bp // R


def _decode_split() -> bool:
    """Contract K and V in separate half-width block-diagonal matmuls (vs one
    combined-width matmul whose V half multiplies q_blk zeros). Halves MXU
    work but adds per-chunk lane-slice relayouts; env-sweepable on chip."""
    return os.environ.get("SWIFTLLM_DECODE_SPLIT", "1") == "1"




def staged_pages_cap() -> int:
    """Pages-per-seq ceiling of the HBM-staged page-table path: the decode
    kernel stages each group's R page lists into a double-buffered SMEM
    scratch [2, R, Pg] i32, which must fit SMEM with headroom. Independent of
    the ROWS bucket — this is what lifts the [rows, Pg] scalar-prefetch
    product limit (16Ki tokens/seq at rows=128/block16) to 256Ki tokens at
    block16 / 512Ki at block32, covering the reference's 131Ki-token chart
    point (docs/assets/offline-llama-3-7b-a100.png) and its largest
    configurable context (engine_config.py:66-71: 32768 blocks x 16)."""
    cap = (SMEM_BYTES - 2 * SMEM_HEADROOM) // (4 * 2 * max(_decode_r(), 4))
    return max(1, 1 << (cap.bit_length() - 1))


def max_pages_cap(rows: int) -> int:
    """Largest compilable pages-per-seq bucket at this row bucket (either
    page-table mode). Admission/bucket logic must stay under this."""
    return max(smem_pages_cap(rows), staged_pages_cap())


def kernel_supports(n_q: int, n_kv: int, hd: int, scale_lanes: int = 0) -> bool:
    """Whether PER-SHARD head shapes satisfy the kernel's Mosaic layout
    contract (128-lane tiling of the flat q and cache-lane views). Small
    models sharded at high tp can violate this (e.g. n_q=2, hd=32 at tp=4);
    the model falls back to the jnp attention path for such shards instead of
    failing at trace time."""
    W = 2 * n_kv * hd + scale_lanes
    return (n_q * hd) % 128 == 0 and W % 128 == 0 and W % hd == 0


def _tile_bf16_scores() -> bool:
    """Compute the tile kernel's softmax passes on bf16 scores. MEASURED
    NEGATIVE on v5e (r5): 0.648 -> 0.568 of roofline at 1b/b8/c2048 — the
    MXU accumulator must stay 32-bit (Mosaic), so bf16 needs an extra
    f32->bf16 cast pass plus (8,128)->(16,128) tile relayouts that cost more
    than the narrower exp2/mask passes save. Kept as a gated, tested record
    of the experiment (the f32 softmax also preserves HF-exact numerics).
    fp8/window paths keep f32 regardless."""
    return os.environ.get("SWIFTLLM_TILE_BF16_SCORES", "0") == "1"


def _interpret_default() -> bool:
    """SWIFTLLM_PALLAS_INTERPRET=1 runs every kernel in interpret mode — the
    CI hook that lets the FULL model path (use_pallas=True, shard_map tp>1)
    execute on the CPU backend where Mosaic cannot compile."""
    return os.environ.get("SWIFTLLM_PALLAS_INTERPRET", "0") == "1"


_FAST_SIZES = (1, 2, 4, 8, 16, 32)


def _make_chunk_io(cache_hbm, layer, pt_read, kv_buf, kv_sems, *,
                   page_size: int, chunk_pages: int):
    """Async-copy helpers for one row's KV chunks over a FLAT per-slot buffer
    kv_buf [2, chunk_pages*page_size, lanes]. ``pt_read(b, j)`` returns row
    b's j-th page id (from the scalar-prefetched table, or from the SMEM
    staging buffer on the HBM-staged path).

    Two paths, selected by the per-row ``sel`` scalar the dispatch computes:
    - sel > 0 (row's pages are CONSECUTIVE in the pool and fit one chunk —
      the common case with a fresh allocator): ONE DMA of sel pages. sel is
      the pow2 page count ≥ need, so the copy size is static; the over-read
      is masked like any padding.
    - sel == 0: per-page DMAs, copying only pages that actually hold KV
      (`need` = cdiv(hist, page_size)). Skipped buffer regions hold stale
      data, which the masks discard.

    The per-page path costs ~2 scalar-core ops per page per chunk per row —
    at large batch that is the dominant decode cost, which is what the
    contiguous path removes."""
    sizes = [z for z in _FAST_SIZES if z <= chunk_pages]

    def start_chunk(b, c, slot, need, sel=None):
        """sel: z in _FAST_SIZES = whole history in one pow2 DMA (issued at
        chunk 0); -1 = contiguous multi-chunk rows, one static
        chunk_pages-sized DMA per FULL chunk (per-page only for the ragged
        tail); 0/None = per-page copies."""
        base = c * chunk_pages
        if sel is not None:
            for z in sizes:
                @pl.when((c == 0) & (sel == z))
                def _(z=z):
                    p0 = pt_read(b, 0)
                    pltpu.make_async_copy(
                        cache_hbm.at[layer, pl.ds(p0 * page_size,
                                                  z * page_size)],
                        kv_buf.at[slot, pl.ds(0, z * page_size)],
                        kv_sems.at[slot, 0],
                    ).start()
            @pl.when((sel == -1) & (base + chunk_pages <= need))
            def _():
                p0 = pt_read(b, base)
                pltpu.make_async_copy(
                    cache_hbm.at[layer, pl.ds(p0 * page_size,
                                              chunk_pages * page_size)],
                    kv_buf.at[slot],
                    kv_sems.at[slot, 0],
                ).start()
            fallback = (sel == 0) | ((sel == -1) & (base + chunk_pages > need))
        else:
            fallback = True
        for j in range(chunk_pages):
            @pl.when(fallback & (base + j < need))
            def _(j=j):
                page = pt_read(b, base + j)
                pltpu.make_async_copy(
                    cache_hbm.at[layer, pl.ds(page * page_size, page_size)],
                    kv_buf.at[slot, pl.ds(j * page_size, page_size)],
                    kv_sems.at[slot, j],
                ).start()

    def wait_chunk(slot, base, need, sel=None):
        if sel is not None:
            for z in sizes:
                @pl.when((base == 0) & (sel == z))
                def _(z=z):
                    pltpu.make_async_copy(
                        cache_hbm.at[0, pl.ds(0, z * page_size)],  # shape-only
                        kv_buf.at[slot, pl.ds(0, z * page_size)],
                        kv_sems.at[slot, 0],
                    ).wait()
            @pl.when((sel == -1) & (base + chunk_pages <= need))
            def _():
                pltpu.make_async_copy(
                    cache_hbm.at[0, pl.ds(0, chunk_pages * page_size)],
                    kv_buf.at[slot],
                    kv_sems.at[slot, 0],
                ).wait()
            fallback = (sel == 0) | ((sel == -1) & (base + chunk_pages > need))
        else:
            fallback = True
        for j in range(chunk_pages):
            @pl.when(fallback & (base + j < need))
            def _(j=j):
                # Reconstruct an equivalent copy to wait on its semaphore.
                pltpu.make_async_copy(
                    cache_hbm.at[0, pl.ds(0, page_size)],  # shape-only
                    kv_buf.at[slot, pl.ds(j * page_size, page_size)],
                    kv_sems.at[slot, j],
                ).wait()

    return start_chunk, wait_chunk


def _decode_kernel_grouped(
    *refs,
    page_size, chunk_pages, sm_scale, n_q, n_kv, hd, n_rows, R, br, W,
    wgran, staged=False, window=0, pend=0,
):
    """R-row batched decode attention with the KV-cache update fused in.

    The single-row kernel's cost is NOT bandwidth — it is the per-row serial
    issue of small VPU/MXU ops (~96 µs/layer at B=64 on v5e, 8x the KV-stream
    roofline). This variant processes R rows per grid step with ONE matmul:

      q_blk [R*n_q, R*W] is double-block-diagonal — query row i (group-row r,
      kv head h) occupies lanes r*W + h*hd (the K half of its row's lane
      block); everything else is zero. Each row's KV chunk streams into its
      own W-wide lane block of kv_buf [chunk, R*W]. Then
          scores = q_blk @ kv_buf^T       (one [R*n_q, chunk] matmul)
      computes every row's scores against ITS OWN keys (cross terms hit
      zeros), and
          pv = probs @ kv_buf             ([R*n_q, R*W])
      yields each row's p@V in the V half of its own diagonal block. The
      extra MXU work (contracting R*W instead of W) is free at these shapes;
      the softmax bookkeeping batches R-fold.

    DMA layout: per-row chunks land at lane offset r*W (W = 2*n_kv*hd is a
    multiple of 128, so lane-sliced destinations are legal). The per-row
    contiguous-page fast path, cross-GROUP prefetch chain, and deferred
    read-modify-write page write-back all carry over from the single-row
    kernel; write-back bookkeeping is per-row (wpend_ref is [R] flags).

    kv_new arrives reshaped [n_rows//R, R*W] (row g = the R rows' fresh K‖V
    side by side) and blocked ``br`` group-rows at a time so each grid step
    reads an [br, R*W] value instead of the whole [n_rows, W] array.

    Page-table modes: ``staged=False`` reads page ids from the
    scalar-prefetched [rows, Pg] table; ``staged=True`` (contexts beyond
    smem_pages_cap) takes the table as an HBM operand and DMAs each group's R
    page lists into a parity-double-buffered SMEM scratch one group ahead,
    so id reads still come from SMEM with no stall on the critical path.

    Positional refs (flat, per pallas_call):
      scalars:  layer, q_lens, seq_lens, [page_table], kv_slots, sel
      inputs:   q [R*n_q, hd] block, kv_new [br, R*W] block,
                cache_in [L, S, W] HBM (aliased), [pt_hbm [rows, Pg] HBM]
      outputs:  o [R*n_q, hd] block, cache_out (alias of cache_in)
      scratch:  kv_buf, kv_sems, w_buf, w_rsems, w_wsems, ctr, wpend,
                [pt_smem [2, R, Pg] SMEM, pt_sems [2, R]]
    """
    if pend:
        # Deferred-commit variant (multi-step decode): NO cache write-back —
        # the window's COMPLETED tokens live in kv_pend_ref (npend_ref - 1 of
        # them are live this inner step; kv_new_ref still carries the current
        # token) and the caller commits the window once after the scan. All
        # RMW machinery (w_buf/w_rsems/w_wsems/wpend, the per-group parity
        # waits, the cache alias) drops out of the grid step. MEASURED
        # NEGATIVE on v5e (r5, gated off by default): the write-back was
        # already hidden behind the next group's compute (+1% deleted), and
        # the window-commit scatter costs -17% — see docs/RESULTS_r5.md.
        if staged:
            (layer_ref, q_lens_ref, seq_lens_ref, npend_ref, sel_ref,
             q_ref, kv_new_ref, kv_pend_ref, cache_in, pt_hbm, o_ref,
             kv_buf, kv_sems, ctr_ref, pt_smem, pt_sems) = refs
        else:
            (layer_ref, q_lens_ref, seq_lens_ref, page_table_ref, npend_ref,
             sel_ref, q_ref, kv_new_ref, kv_pend_ref, cache_in, o_ref,
             kv_buf, kv_sems, ctr_ref) = refs
        cache_out = kv_slots_ref = None
        w_buf = w_rsems = w_wsems = wpend_ref = None
    elif staged:
        (layer_ref, q_lens_ref, seq_lens_ref, kv_slots_ref, sel_ref,
         q_ref, kv_new_ref, cache_in, pt_hbm, o_ref, cache_out,
         kv_buf, kv_sems, w_buf, w_rsems, w_wsems, ctr_ref, wpend_ref,
         pt_smem, pt_sems) = refs
    else:
        (layer_ref, q_lens_ref, seq_lens_ref, page_table_ref, kv_slots_ref,
         sel_ref, q_ref, kv_new_ref, cache_in, o_ref, cache_out,
         kv_buf, kv_sems, w_buf, w_rsems, w_wsems, ctr_ref, wpend_ref) = refs
    g = pl.program_id(0)
    layer = layer_ref[0]
    chunk = chunk_pages * page_size
    group = n_q // n_kv
    KH = n_kv * hd

    if pend:
        # Cached history excludes the window's pending tokens (npend of them,
        # same for every row — the multi-step scan's inner step index + 1).
        def hist_of(b):
            return jnp.maximum(seq_lens_ref[b] - npend_ref[0], 0)
    else:
        def hist_of(b):
            return jnp.maximum(seq_lens_ref[b] - 1, 0)
    SL = W - 2 * KH          # fp8 per-token scale lanes (0 or 128)
    sizes = [z for z in _FAST_SIZES if z <= chunk_pages]
    n_groups = n_rows // R

    def scale_selector():
        """Constant [2R, RW] matrix whose row 2r (2r+1) one-hot-selects row
        block r's K (V) scale lane. ``E @ kv2^T`` then yields every key's
        scales as ROWS [2R, chunk] — the MXU transposes the per-key scale
        column for free, so fp8 un-scaling happens in SCORE space ([RN,chunk]
        multiplies) instead of re-materializing the whole KV chunk (which
        measured ~950 µs/layer at 8K context — 3.6x the bf16 kernel)."""
        ri = jax.lax.broadcasted_iota(jnp.int32, (2 * R, R * W), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (2 * R, R * W), 1)
        target = (ri // 2) * W + 2 * KH + (ri % 2)
        return (ci == target).astype(jnp.bfloat16)

    def per_key_inv_scales(E, kv2b):
        """[2R, chunk] reciprocals of the chunk's per-key K/V scales."""
        sel = jax.lax.dot_general(E, kv2b, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return 1.0 / jnp.maximum(sel, 1e-20)

    if staged:
        def pt_read(b, r, j):
            # Parity of b's group: staged one group ahead (see start_pt).
            return pt_smem[(b // R) % 2, r, j]
    else:
        def pt_read(b, r, j):
            return page_table_ref[b, j]

    def start_pt(gb, par):
        """Stage group gb's R page lists HBM→SMEM into parity ``par``."""
        if not staged:
            return
        for r in range(R):
            b = gb * R + r
            @pl.when(q_lens_ref[b] > 0)
            def _(b=b, r=r):
                pltpu.make_async_copy(pt_hbm.at[b], pt_smem.at[par, r],
                                      pt_sems.at[par, r]).start()

    def wait_pt(gb, par):
        if not staged:
            return
        for r in range(R):
            b = gb * R + r
            @pl.when(q_lens_ref[b] > 0)
            def _(b=b, r=r):
                pltpu.make_async_copy(pt_hbm.at[b], pt_smem.at[par, r],
                                      pt_sems.at[par, r]).wait()

    def start_row(b, r, c, slot):
        """Start row b's chunk-c DMAs into lane block r of kv_buf[slot].

        sel encodes the row's DMA shape: z in _FAST_SIZES = whole history in
        ONE pow2-sized DMA (single-chunk rows); -1 = pages contiguous but
        multi-chunk, so every FULL chunk is one static chunk_pages-sized DMA
        (middle chunks read exactly the row's own pages — no over-read) and
        only the ragged tail chunk falls back to per-page copies; 0 =
        non-contiguous, per-page copies throughout."""
        sel = sel_ref[b]
        need = pl.cdiv(hist_of(b), page_size)
        base = c * chunk_pages
        for z in sizes:
            @pl.when((c == 0) & (sel == z))
            def _(z=z):
                p0 = pt_read(b, r, 0)
                pltpu.make_async_copy(
                    cache_in.at[layer, pl.ds(p0 * page_size, z * page_size)],
                    kv_buf.at[slot, pl.ds(0, z * page_size),
                              pl.ds(r * W, W)],
                    kv_sems.at[slot, r, 0],
                ).start()
        # sel == -2: the tail chunk too is one full-size DMA (over-reads
        # neighbouring pool pages — finite, masked; guarded at trace level).
        full = (((sel == -1) & (base + chunk_pages <= need))
                | ((sel == -2) & (base < need)))

        @pl.when(full)
        def _():
            p0 = pt_read(b, r, base)
            pltpu.make_async_copy(
                cache_in.at[layer, pl.ds(p0 * page_size,
                                         chunk_pages * page_size)],
                kv_buf.at[slot, :, pl.ds(r * W, W)],
                kv_sems.at[slot, r, 0],
            ).start()
        tail = (sel == 0) | ((sel == -1) & (base + chunk_pages > need))
        for j in range(chunk_pages):
            @pl.when(tail & (base + j < need))
            def _(j=j):
                page = pt_read(b, r, base + j)
                pltpu.make_async_copy(
                    cache_in.at[layer, pl.ds(page * page_size, page_size)],
                    kv_buf.at[slot, pl.ds(j * page_size, page_size),
                              pl.ds(r * W, W)],
                    kv_sems.at[slot, r, j],
                ).start()

    def wait_row(b, r, c, slot):
        sel = sel_ref[b]
        need = pl.cdiv(hist_of(b), page_size)
        base = c * chunk_pages
        for z in sizes:
            @pl.when((c == 0) & (sel == z))
            def _(z=z):
                pltpu.make_async_copy(
                    cache_in.at[0, pl.ds(0, z * page_size)],   # shape-only
                    kv_buf.at[slot, pl.ds(0, z * page_size), pl.ds(r * W, W)],
                    kv_sems.at[slot, r, 0],
                ).wait()
        full = (((sel == -1) & (base + chunk_pages <= need))
                | ((sel == -2) & (base < need)))

        @pl.when(full)
        def _():
            pltpu.make_async_copy(
                cache_in.at[0, pl.ds(0, chunk_pages * page_size)],  # shape-only
                kv_buf.at[slot, :, pl.ds(r * W, W)],
                kv_sems.at[slot, r, 0],
            ).wait()
        tail = (sel == 0) | ((sel == -1) & (base + chunk_pages > need))
        for j in range(chunk_pages):
            @pl.when(tail & (base + j < need))
            def _(j=j):
                pltpu.make_async_copy(
                    cache_in.at[0, pl.ds(0, page_size)],       # shape-only
                    kv_buf.at[slot, pl.ds(j * page_size, page_size),
                              pl.ds(r * W, W)],
                    kv_sems.at[slot, r, j],
                ).wait()

    def grp_c_lo(gb):
        """First chunk with any window-visible key for group gb (0 without a
        sliding window). Chunks below it are fully masked for EVERY row of
        the group (min over valid rows), so they are never DMA'd or scored.
        Clamped to nc-1 so the loop always runs ≥1 iteration — the
        cross-group prefetch chain needs a body iteration to continue.
        Single-chunk rows (pow2 fast path, issued at c == 0) always have
        c_lo_r == 0, so they force the group to 0 and never lose their DMA."""
        if not window:
            return 0
        lo, ncg = None, None
        for r in range(R):
            b = gb * R + r
            v = q_lens_ref[b] > 0
            h = hist_of(b)
            cl = jnp.where(v, jnp.maximum(h - (window - 1), 0) // chunk,
                           jnp.int32(1 << 30))
            ncr = jnp.where(v, pl.cdiv(h, chunk), 0)
            lo = cl if lo is None else jnp.minimum(lo, cl)
            ncg = ncr if ncg is None else jnp.maximum(ncg, ncr)
        return jnp.clip(lo, 0, jnp.maximum(ncg - 1, 0))

    def start_grp(gb, c, slot):
        for r in range(R):
            b = gb * R + r
            @pl.when(q_lens_ref[b] > 0)
            def _(b=b, r=r):
                start_row(b, r, c, slot)

    def wait_grp(gb, c, slot):
        for r in range(R):
            b = gb * R + r
            @pl.when(q_lens_ref[b] > 0)
            def _(b=b, r=r):
                wait_row(b, r, c, slot)

    def start_rmw_reads(gb, par):
        """Start group gb's read-modify-write reads into parity ``par``.

        Granularity is the dtype's SUBLANE TILE (``wgran`` rows: 16 bf16 /
        8 f32 / 32 fp8-int8) — the smallest DMA-legal row block — NOT the
        page: a page-granularity RMW moved 2 x page_size x W bytes to write
        ONE token's W bytes (128x amplification at 64-token pages; ~8 MiB
        and ~10 us per layer at b64, measured r4). Tiles never straddle a
        page (page_size is a multiple of the tile), so page ownership is
        preserved. Deferred-commit (pend) mode has no write-back at all."""
        if pend:
            return
        for r in range(R):
            b = gb * R + r

            @pl.when(q_lens_ref[b] > 0)
            def _(b=b, r=r):
                w_base = (kv_slots_ref[b] // wgran) * wgran
                pltpu.make_async_copy(
                    cache_in.at[layer, pl.ds(w_base, wgran)],
                    w_buf.at[par, r], w_rsems.at[par, r]).start()

    @pl.when(g == 0)
    def _():
        ctr_ref[0] = 0
        if not pend:
            for p_ in range(2):
                for r in range(R):
                    wpend_ref[p_, r] = 0
        # Zero-fill the KV buffers ONCE: never-DMA'd regions then hold zeros
        # (first use) or a previous row's finite KV (later uses) — never NaN
        # bit patterns that would poison the p@v matmul through 0*NaN. This
        # replaces a per-chunk masking pass over the whole buffer.
        kv_buf[0] = jnp.zeros_like(kv_buf[0])
        kv_buf[1] = jnp.zeros_like(kv_buf[1])

        @pl.when(q_lens_ref[0] > 0)     # a fully masked step starts nothing
        def _():
            start_pt(0, 0)
            wait_pt(0, 0)
            c00 = grp_c_lo(0)
            start_grp(0, c00, c00 % 2)   # % works for int and traced alike
            start_rmw_reads(0, 0)

    # Valid rows form a contiguous prefix (builder contract), so group
    # validity == its first row's validity.
    @pl.when(q_lens_ref[g * R] > 0)
    def _group():
        base = ctr_ref[0]
        par = jax.lax.rem(g, 2)
        par_n = 1 - par
        valids = [q_lens_ref[g * R + r] > 0 for r in range(R)]
        hists = [hist_of(g * R + r) for r in range(R)]
        nc = pl.cdiv(hists[0], chunk)
        for r in range(1, R):
            nc = jnp.maximum(nc, jnp.where(valids[r],
                                           pl.cdiv(hists[r], chunk), 0))
        g_next = jnp.minimum(g + 1, n_groups - 1)
        next_valid = (g + 1 < n_groups) & (q_lens_ref[g_next * R] > 0)

        # RMW page buffers are parity-double-buffered: THIS group's reads
        # (parity par) were started a group ago and are in flight behind the
        # previous group's compute. Start the NEXT group's reads now (parity
        # par_n) — after waiting out group g-1's write-backs, which used the
        # same parity and read from the same buffers.
        if not pend:
            for r in range(R):
                @pl.when(wpend_ref[par_n, r] == 1)
                def _(r=r):
                    pltpu.make_async_copy(
                        w_buf.at[par_n, r],
                        cache_out.at[layer, pl.ds(0, wgran)],
                        w_wsems.at[par_n, r]).wait()   # shape-equivalent
                    wpend_ref[par_n, r] = 0

        @pl.when(next_valid)
        def _():
            # Stage the NEXT group's page lists first so the id DMA flies
            # behind the RMW page reads; wait before any start_grp(g_next)
            # can consume them (first possible use: the nc==0 branch below).
            start_pt(g_next, par_n)
            start_rmw_reads(g_next, par_n)
            wait_pt(g_next, par_n)

        c_lo = grp_c_lo(g)            # own group's first visible chunk
        cn_next = grp_c_lo(g_next)    # next group's (for the prefetch chain)

        # hist == 0 groups run zero chunk iterations; keep the prefetch chain
        # alive here instead.
        @pl.when((nc == 0) & next_valid)
        def _():
            start_grp(g_next, cn_next, (base + cn_next) % 2)

        # --- build the double-block-diagonal q [R*n_q, R*KW] -----------------
        # KW: lane width of one row block in score space. When KH is a full
        # lane tile the kernel SPLITS K and V into separate [chunk, R*KH]
        # views (built per chunk from lane slices of the combined DMA buffer),
        # halving both block-diagonal matmuls' contraction/output width — the
        # combined-width form burns half its MXU work on q_blk's zero V lanes
        # (measured 59 µs/layer at 1B b64; matmuls were ~35 µs of it).
        # Misaligned shapes (KH % 128 != 0, tests/tiny models) keep the
        # combined width, where (col % W) // hd >= n_kv on V lanes never
        # matches a q row's kv head, so the V half stays zero.
        split = (KH % 128 == 0) and _decode_split()
        KW = KH if split else W
        q = q_ref[...]                                     # [R*n_q, hd]
        RN, RW = R * n_q, R * W
        RK = R * KW
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (RN, RK), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (RN, RK), 1)
        on_diag = (row_iota // n_q) == (col_iota // KW)     # same group-row
        h_match = ((row_iota % n_q) // group) == ((col_iota % KW) // hd)
        q_blk = jnp.where(on_diag & h_match,
                          jnp.concatenate([q] * (RK // hd), axis=1), 0)

        # Per-row scalar vectors broadcast to compute shapes.
        def per_row_rows(vals):
            """[RN, 1] vector: sublane block r (of size n_q) = vals[r]."""
            row_r = jax.lax.broadcasted_iota(jnp.int32, (RN, 1), 0) // n_q
            out = jnp.zeros((RN, 1), jnp.int32)
            for r in range(R):
                out = jnp.where(row_r == r, vals[r], out)
            return out

        hist_rows = per_row_rows(hists)                     # [RN, 1]
        row_blk = jax.lax.broadcasted_iota(jnp.int32, (RN, 1), 0) // n_q
        E = scale_selector() if SL else None

        m0 = jnp.full((RN, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((RN, 1), jnp.float32)
        a0 = jnp.zeros((RN, KH), jnp.float32)

        def body(c, carry):
            m, l, acc = carry
            slot = jax.lax.rem(base + c, 2)

            @pl.when(c + 1 < nc)
            def _():
                start_grp(g, c + 1, jax.lax.rem(base + c + 1, 2))

            @pl.when((c + 1 >= nc) & next_valid)
            def _():
                start_grp(g_next, cn_next, (base + nc + cn_next) % 2)

            wait_grp(g, c, slot)
            # Regions never DMA'd hold zeros or a previous row's finite KV
            # (buffers zero-filled at g == 0): the causal mask turns their
            # probabilities into exact zeros, so no data masking is needed.
            kvb = kv_buf[slot]                              # [chunk, RW]
            if split:
                k2 = jnp.concatenate(
                    [kvb[:, r * W:r * W + KH] for r in range(R)],
                    axis=1).astype(q_blk.dtype)             # [chunk, R*KH]
                v2 = jnp.concatenate(
                    [kvb[:, r * W + KH:r * W + 2 * KH] for r in range(R)],
                    axis=1).astype(q_blk.dtype)
            else:
                k2 = v2 = kvb.astype(q_blk.dtype)           # [chunk, RW]

            sc = jax.lax.dot_general(
                q_blk, k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # [RN, chunk]
            if SL:
                # fp8: scores/probs carry the stored scales; divide them out
                # in SCORE space (per key, per row block). The selector needs
                # the COMBINED buffer (scale lanes live past the V half).
                inv = per_key_inv_scales(E, kvb.astype(q_blk.dtype))
                kmat = jnp.zeros((RN, chunk), jnp.float32)
                vmat = jnp.zeros((RN, chunk), jnp.float32)
                for r in range(R):
                    kmat = jnp.where(row_blk == r, inv[2 * r:2 * r + 1], kmat)
                    vmat = jnp.where(row_blk == r, inv[2 * r + 1:2 * r + 2],
                                     vmat)
                sc = sc * kmat
            key_row = c * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (1, chunk), 1)
            sc = jnp.where(key_row < hist_rows, sc, NEG_INF)
            if window:
                # Sliding window: the query sits at position hist_rows
                # (= seq_len-1), so only keys > hist_rows - window stay.
                sc = jnp.where(key_row > hist_rows - window, sc, WIN_NEG)

            mi = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
            pr = jnp.exp(sc - mi)
            scale = jnp.exp(m - mi)
            li = l * scale + jnp.sum(pr, axis=-1, keepdims=True)
            pr_v = (pr * vmat) if SL else pr    # un-scale V via the probs
            pv = jax.lax.dot_general(
                pr_v.astype(q.dtype), v2,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [RN, R*KW]
            # Extract each row block's OWN V block.
            row_r = jax.lax.broadcasted_iota(jnp.int32, (RN, KH), 0) // n_q
            own_v = jnp.zeros((RN, KH), jnp.float32)
            for r in range(R):
                off = r * KW if split else r * W + KH
                own_v = jnp.where(row_r == r, pv[:, off:off + KH], own_v)
            return (mi, li, acc * scale + own_v)

        m, l, acc = jax.lax.fori_loop(c_lo, nc, body, (m0, l0, a0))

        # --- fold in the new tokens from VMEM --------------------------------
        # kv_new block row (g % br) is this group's R rows' K‖V side by side —
        # exactly the [1, RW] lane layout q_blk expects. In deferred-commit
        # (pend) mode the block row is [1, P*RW] — P pending tokens' rows
        # side by side, of which the first npend are live this inner step.
        if pend:
            # Window fold: the npend-1 COMPLETED pending tokens come from the
            # kv_pend block (read-only, layer-indexed by BlockSpec); the
            # current token comes from kv_new as usual — appended as the last
            # row, always valid.
            P = pend
            pend_rows = kv_pend_ref[...][0]                  # [br, P*RW]
            new_rows = kv_new_ref[...]                       # [br, RW]
            bi = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)
            sel_p = jnp.sum(jnp.where(bi == g % br, pend_rows,
                                      jnp.zeros_like(pend_rows)),
                            axis=0, keepdims=True)           # [1, P*RW]
            sel_n = jnp.sum(jnp.where(bi == g % br, new_rows,
                                      jnp.zeros_like(new_rows)),
                            axis=0, keepdims=True)           # [1, RW]
            knew = jnp.concatenate(
                [sel_p[:, j * RW:(j + 1) * RW] for j in range(P)] + [sel_n],
                axis=0)                                      # [P+1, RW]
            knew_k = (jnp.concatenate(
                [knew[:, r * W:r * W + KH] for r in range(R)], axis=1)
                if split else knew)                          # [P+1, R*KW]
            s_new = jax.lax.dot_general(
                q_blk, knew_k.astype(q_blk.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # [RN, P+1]
            col_p = jax.lax.broadcasted_iota(jnp.int32, (RN, P + 1), 1)
            s_new = jnp.where((col_p == P) | (col_p < npend_ref[0] - 1),
                              s_new, NEG_INF)
            mi = jnp.maximum(m, jnp.max(s_new, axis=-1, keepdims=True))
            scale = jnp.exp(m - mi)
            p_new = jnp.exp(s_new - mi)      # masked cols underflow to 0
            l = l * scale + jnp.sum(p_new, axis=-1, keepdims=True)
            knew_v = jnp.concatenate(
                [knew[:, r * W + KH:r * W + 2 * KH] for r in range(R)],
                axis=1)                                      # [P, R*KH]
            pv_new = jax.lax.dot_general(
                p_new.astype(q_blk.dtype), knew_v.astype(q_blk.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [RN, R*KH]
            row_rp = jax.lax.broadcasted_iota(jnp.int32, (RN, KH), 0) // n_q
            v_own = jnp.zeros((RN, KH), jnp.float32)
            for r in range(R):
                v_own = jnp.where(row_rp == r,
                                  pv_new[:, r * KH:(r + 1) * KH], v_own)
            acc = (acc * scale + v_own) / jnp.maximum(l, 1e-30)

            out = jnp.zeros((RN, hd), jnp.float32)
            h_of_row = (jax.lax.broadcasted_iota(jnp.int32, (RN, hd), 0)
                        % n_q) // group
            for h in range(n_kv):
                out = jnp.where(h_of_row == h,
                                acc[:, h * hd:(h + 1) * hd], out)
            o_ref[...] = out.astype(o_ref.dtype)
            ctr_ref[0] = jax.lax.rem(base + nc, 2)
            return

        blk_rows = kv_new_ref[...].astype(jnp.float32)       # [br, RW]
        bi = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)
        knew_cat = jnp.sum(jnp.where(bi == g % br, blk_rows, 0),
                           axis=0, keepdims=True)            # [1, RW] stored
        knew_k = (jnp.concatenate(
            [knew_cat[:, r * W:r * W + KH] for r in range(R)], axis=1)
            if split else knew_cat)                          # [1, R*KW]
        s_new = jnp.sum(q_blk.astype(jnp.float32) * knew_k,
                        axis=-1, keepdims=True) * sm_scale   # [RN, 1]
        if SL:
            kcol = jnp.zeros((RN, 1), jnp.float32)
            vcol = jnp.zeros((RN, 1), jnp.float32)
            for r in range(R):
                base_ = r * W + 2 * KH
                ik = 1.0 / jnp.maximum(knew_cat[:, base_:base_ + 1], 1e-20)
                iv = 1.0 / jnp.maximum(knew_cat[:, base_ + 1:base_ + 2], 1e-20)
                kcol = jnp.where(row_blk == r, ik, kcol)
                vcol = jnp.where(row_blk == r, iv, vcol)
            s_new = s_new * kcol
        mi = jnp.maximum(m, s_new)
        scale = jnp.exp(m - mi)
        p_new = jnp.exp(s_new - mi)
        l = l * scale + p_new
        p_eff = (p_new * vcol) if SL else p_new
        row_r = jax.lax.broadcasted_iota(jnp.int32, (RN, KH), 0) // n_q
        v_own = jnp.zeros((RN, KH), jnp.float32)
        for r in range(R):
            v_own = jnp.where(row_r == r,
                              knew_cat[:, r * W + KH:r * W + 2 * KH], v_own)
        acc = (acc * scale + p_eff * v_own) / jnp.maximum(l, 1e-30)

        # Extract each q row's own head block from [RN, KH].
        out = jnp.zeros((RN, hd), jnp.float32)
        h_of_row = (jax.lax.broadcasted_iota(jnp.int32, (RN, hd), 0)
                    % n_q) // group
        for h in range(n_kv):
            out = jnp.where(h_of_row == h, acc[:, h * hd:(h + 1) * hd], out)
        o_ref[...] = out.astype(o_ref.dtype)
        ctr_ref[0] = jax.lax.rem(base + nc, 2)

        # --- merge each row's new K/V into its page and write back -----------
        for r in range(R):
            b = g * R + r

            @pl.when(valids[r] & (seq_lens_ref[b] > 0))
            def _(r=r, b=b):
                pltpu.make_async_copy(
                    cache_in.at[layer, pl.ds(0, wgran)],       # shape-only
                    w_buf.at[par, r], w_rsems.at[par, r]).wait()
                w_off = kv_slots_ref[b] % wgran
                w_base = (kv_slots_ref[b] // wgran) * wgran
                kv_new_r = knew_cat[:, r * W:(r + 1) * W]      # [1, W] f32
                sub_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (wgran, 1), 0)
                w_buf[par, r] = jnp.where(sub_iota == w_off,
                                          kv_new_r.astype(w_buf.dtype),
                                          w_buf[par, r])
                pltpu.make_async_copy(
                    w_buf.at[par, r],
                    cache_out.at[layer, pl.ds(w_base, wgran)],
                    w_wsems.at[par, r]).start()
                wpend_ref[par, r] = 1

        @pl.when(jnp.logical_not(next_valid))
        def _():   # last valid group: all writes must land before kernel exit
            for p_ in range(2):
                for r in range(R):
                    @pl.when(wpend_ref[p_, r] == 1)
                    def _(p_=p_, r=r):
                        pltpu.make_async_copy(
                            w_buf.at[p_, r],
                            cache_out.at[layer, pl.ds(0, wgran)],
                            w_wsems.at[p_, r]).wait()
                        wpend_ref[p_, r] = 0


def _tiles_kernel(
    *refs,
    page_size, span, align, chunk_pages, sm_scale, n_q, n_kv, hd, W,
    staged=False, window=0, fused=False,
):
    """Prefill/mixed tile attention, heads batched per KV head.

    ``span`` q rows are processed per grid step — up to 4 builder tiles
    (``align`` = tile_q_for(q_bucket), the only alignment the batch builder
    guarantees). Each span streams its KV ONCE: with the old one-tile-per-step
    geometry every 128-row tile re-streamed the row's whole history, so DMA
    traffic and per-chunk fixed costs multiplied by tiles x chunks — the
    measured cause of prefill sitting at 0.46 of the compute roofline in r2.
    Chunk granularity (>=256 tokens) already rounded each tile's causal KV
    bound up, so fusing <=4 adjacent tiles adds at most one chunk of masked
    score FLOPs per span while dividing the KV traffic by the fused count.

    q arrives FLAT [T, n_q*hd] — the projection GEMM's natural dense output.
    (Round 3 used a head-major [n_q, T, hdp] layout; the XLA transpose feeding
    it got folded INTO the wq GEMM, which then wrote a strided {2,0,1} layout
    at 46% MXU efficiency — measured via the r4 step profile. The flat layout
    keeps wq at wo's ~96% and drops the hdp pad, halving q/o staging VMEM.)
    In-kernel, heads are extracted with 64-lane slices of the staged q tile —
    the same lane-slice pattern the kv buffer already uses for kh/vh. The
    tile's queries stack each GQA group onto SUBLANES: per KV head ONE
    [group*tile_q, chunk] matmul scores the whole group at once, and the
    online-softmax bookkeeping batches group-wide. The per-q-head loop this
    replaces issued n_q tiny matmuls + n_q softmax chains per chunk and
    measured ~180x its FLOP cost (19.6 ms of a 50 ms 2k-token prefill step at
    1B dims on v5e).

    Page-table modes as in the decode kernel: scalar-prefetched [rows, Pg]
    table, or (``staged``) an HBM table staged per ROW into SMEM scratch at
    the row's first tile — the grid is row-major (b, t), so tiles t > 0 reuse
    the staged list with no further DMAs.

    ``fused``: the tile ALSO writes its own span's fresh KV (kvn_hbm [T, W],
    the step's projected K‖V rows in cache dtype) into the row's pages before
    streaming — replacing the XLA token scatter that cost 0.197 ms/layer at
    T=2048 on v5e (9% of the whole prefill step; r4 profile). Full pages are
    one kvn_buf→cache DMA each; the ragged tail page is a read-modify-write.
    CONTRACT: every row's span start (seq_len - q_len) is page-aligned (the
    scheduler sizes non-final prefill chunks to page multiples; spec-verify
    buckets, whose spans start anywhere, keep the scatter path)."""
    it = iter(refs)
    layer_ref, q_starts_ref, q_lens_ref, seq_lens_ref = (
        next(it), next(it), next(it), next(it))
    page_table_ref = None if staged else next(it)
    sel_ref = next(it)
    q_hbm = next(it)
    kvn_hbm = next(it) if fused else None
    cache_hbm = next(it)
    pt_hbm = next(it) if staged else None
    o_hbm = next(it)
    cache_out = next(it) if fused else None
    q_buf, kv_buf, o_buf, q_sem, kv_sems, o_sem = (
        next(it), next(it), next(it), next(it), next(it), next(it))
    if fused:
        kvn_buf, kvn_sem, pw_buf, pw_sem, wr_sems = (
            next(it), next(it), next(it), next(it), next(it))
    if staged:
        pt_smem, pt_sem = next(it), next(it)
    b = pl.program_id(0)
    t = pl.program_id(1)
    chunk = chunk_pages * page_size
    group = n_q // n_kv
    KH = n_kv * hd
    NG = group * span
    q_len = q_lens_ref[b]
    seq_len = seq_lens_ref[b]
    q_start = q_starts_ref[b]
    if staged:
        pt_read = lambda b_, j: pt_smem[j]
    else:
        pt_read = lambda b_, j: page_table_ref[b_, j]
    # Fused mode reads the cache through the ALIASED OUTPUT ref: on hardware
    # cache_hbm and cache_out are the same buffer, but the interpreter keeps
    # separate copies — reads must go where the span writes land.
    cache_rd = cache_out if fused else cache_hbm
    start_chunk, wait_chunk = _make_chunk_io(
        cache_rd, layer_ref[0], pt_read, kv_buf, kv_sems,
        page_size=page_size, chunk_pages=chunk_pages)

    @pl.when((q_len > t * span) & (seq_len > 0))
    def _run():
        if staged:
            @pl.when(t == 0)   # stage THIS row's page list once per row
            def _():
                cp = pltpu.make_async_copy(pt_hbm.at[b], pt_smem, pt_sem)
                cp.start()
                cp.wait()
        # Row starts are ALIGN-aligned by the builder (span is a multiple of
        # align, so span offsets preserve it); q/o are span-overshoot-padded
        # at the call site so the fixed-size DMA never reads past the array.
        tile_start = pl.multiple_of(q_start + t * span, align)
        q_dma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(tile_start, span), :], q_buf, q_sem)
        q_dma.start()

        if fused:
            # Write this span's fresh KV into the row's pages BEFORE the
            # chunk loop streams them back (the causal tail reads its own new
            # keys). Grid steps are sequential and every write is waited
            # in-step, so later tiles/rows always see completed writes.
            n_new = jnp.minimum(q_len - t * span, span)
            pos0 = seq_len - q_len + t * span      # page-aligned (contract)
            pg0 = pos0 // page_size
            kvn_dma = pltpu.make_async_copy(
                kvn_hbm.at[pl.ds(tile_start, span), :], kvn_buf, kvn_sem)
            kvn_dma.start()
            kvn_dma.wait()
            NPG = span // page_size
            for i in range(NPG):
                cov = n_new - i * page_size      # tokens landing in page i

                @pl.when(cov >= page_size)       # full page: direct copy
                def _(i=i):
                    page = pt_read(b, pg0 + i)
                    pltpu.make_async_copy(
                        kvn_buf.at[pl.ds(i * page_size, page_size)],
                        cache_out.at[layer_ref[0],
                                     pl.ds(page * page_size, page_size)],
                        wr_sems.at[i]).start()

                @pl.when((cov > 0) & (cov < page_size))   # ragged tail: RMW
                def _(i=i):
                    page = pt_read(b, pg0 + i)
                    rd = pltpu.make_async_copy(
                        cache_rd.at[layer_ref[0],
                                    pl.ds(page * page_size, page_size)],
                        pw_buf, pw_sem)
                    rd.start()
                    rd.wait()
                    rows_i = jax.lax.broadcasted_iota(
                        jnp.int32, (page_size, 1), 0)
                    pw_buf[...] = jnp.where(
                        rows_i < cov,
                        kvn_buf[i * page_size:(i + 1) * page_size], pw_buf[...])
                    pltpu.make_async_copy(
                        pw_buf,
                        cache_out.at[layer_ref[0],
                                     pl.ds(page * page_size, page_size)],
                        wr_sems.at[i]).start()
            for i in range(NPG):   # all writes land before any chunk read
                @pl.when(n_new > i * page_size)
                def _(i=i):
                    pltpu.make_async_copy(
                        kvn_buf.at[pl.ds(0, page_size)],             # shape-
                        cache_out.at[layer_ref[0], pl.ds(0, page_size)],  # only
                        wr_sems.at[i]).wait()

        # Causal upper bound on the KV this span can see.
        kv_needed = jnp.minimum(seq_len, seq_len - q_len + (t + 1) * span)
        num_chunks = pl.cdiv(kv_needed, chunk)
        pages_needed = pl.cdiv(kv_needed, page_size)
        dma_sel = sel_ref[b]   # NB: `sel` is shadowed by the fp8 selector below

        if window:
            # Sliding window: chunks wholly below the FIRST query's window
            # are masked for every query in the span (later queries only
            # move the window forward) — skip their DMAs and scores. Clamped
            # to num_chunks-1 so the started chunk is always waited on.
            # (Pow2 whole-history rows are single-chunk → c_lo == 0 there.)
            first_q = seq_len - q_len + t * span
            c_lo = jnp.clip(jnp.maximum(first_q - (window - 1), 0) // chunk,
                            0, jnp.maximum(num_chunks - 1, 0))
        else:
            c_lo = 0
        start_chunk(b, c_lo, c_lo % 2, pages_needed, dma_sel)
        q_dma.wait()
        q4 = q_buf[...]                 # [span, n_q*hd]

        def qh_rows(h):
            """KV head h's GQA group stacked on sublanes: [group*span, hd].

            Heads at lane offsets that are not 128-aligned (hd < 128) are
            lane-rotated to offset 0 first: Mosaic cannot concatenate vectors
            whose lane offsets differ ("result/input offset mismatch on
            non-concat dimension"), and a raw 64-offset slice keeps its
            offset-64 layout. One VPU rotate per odd head, once per tile."""
            outs = []
            for j in range(group):
                base = (h * group + j) * hd
                off = base % 128
                if off:
                    # Mosaic's lane rotate is 32-bit only: roll in f32 and
                    # cast back (two VPU passes per odd head, once per tile).
                    w = pltpu.roll(
                        q4[:, base - off:base - off + 128].astype(jnp.float32),
                        shift=128 - off, axis=1)
                    outs.append(w[:, :hd].astype(q4.dtype))
                else:
                    outs.append(q4[:, base:base + hd])
            return jnp.concatenate(outs, axis=0)

        # Hoisted out of the chunk loop: the per-head sublane-stacked q views
        # (a [NG, hd] VMEM copy each — rebuilding them per CHUNK per head
        # measured as pure VPU overhead) and the rider lane block (constant).
        qhs = [qh_rows(h) for h in range(n_kv)]
        # Compute sub-chunk length (DMA stays chunk-granular; see make_body):
        # SUBSPLIT mode bounds the f32 temps at [NG, 512] per fori step, but
        # measured 20% SLOWER on v5e prefill (carry copies + lost MXU/VPU
        # interleaving), so the default keeps full-chunk compute and bounds
        # VMEM via the span instead. SWIFTLLM_TILE_SUBSPLIT=1 forces the
        # split (also used by interpret-mode parity tests on tiny shapes).
        force = os.environ.get("SWIFTLLM_TILE_SUBSPLIT")
        if force == "1" and chunk % 2 == 0:
            NSUB = chunk // 512 if (chunk > 512 and chunk % 512 == 0) else 2
        else:
            NSUB = 1
        SUBLEN = chunk // NSUB
        # MXU row-sum rider: [SUBLEN, hd] lane block whose lane 0 is one.
        # p @ [V ‖ e0] yields p@V AND sum(p) in ONE matmul — hd=64 leaves
        # half the MXU output lanes idle, so the sum column rides free and
        # the separate [NG, chunk] f32 sum pass (the kernel is VPU-bound at
        # hd=64) disappears. p is cast to bf16 INSIDE the exp2 pass (fused);
        # numerator and denominator then see the SAME rounded p, so the
        # normalization cancels most of the rounding.
        e0 = (jax.lax.broadcasted_iota(jnp.int32, (SUBLEN, hd), 1)
              == 0).astype(q4.dtype)

        # Query position of stacked row i: its span position is i % span.
        q_pos = (seq_len - q_len + t * span
                 + jax.lax.broadcasted_iota(jnp.int32, (NG, 1), 0) % span)

        # Online softmax runs in LOG2 space: raw scores are multiplied by
        # sm_scale*log2(e) INSIDE the exp2 argument (one fused pass) instead
        # of a standalone scale pass + exp's internal log2e multiply. At
        # hd=64 the softmax's elementwise VPU work rivals the score matmuls'
        # MXU time, so shaving passes over [NG, chunk] is first-order.
        K2E = sm_scale * 1.4426950408889634
        # Mask-multiply softmax (see make_body): env-sweepable; windows keep
        # the select path (WIN_NEG sentinel ordering needs masked scores).
        maskmul = (not window
                   and os.environ.get("SWIFTLLM_TILE_MASKMUL", "1") == "1")
        m0 = jnp.full((n_kv, NG, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((n_kv, NG, 1), jnp.float32)
        a0 = jnp.zeros((n_kv, NG, hd), jnp.float32)

        def make_body(masked):
            """Chunk body. NOTE: a two-phase loop (mask-free chunks below the
            causal diagonal, masked tail) measured 13% SLOWER than one masked
            loop on v5e — splitting the fori_loop breaks the chunk-DMA
            software pipeline across the boundary — so the kernel always
            runs the masked body; the ``masked`` knob is kept for the
            (cheap, single-phase) geometry experiments."""

            def body(c, carry):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < num_chunks)
                def _():
                    start_chunk(b, c + 1, jax.lax.rem(c + 1, 2), pages_needed,
                                dma_sel)

                wait_chunk(slot, c * chunk_pages, pages_needed, dma_sel)

                # Compute in SUB-chunks under a fori_loop: the f32 score/prob
                # temps become [NG, SUBLEN] instead of [NG, chunk], and the
                # loop is a HARD liveness boundary (a python-unrolled split
                # measured no stack reduction — Mosaic interleaved the
                # sub-chunks and kept every temp live; at span 512 / chunk
                # 1024 the full-chunk temps hit ~99 MiB of scoped VMEM, over
                # the 128 MiB plan budget once a mixed program adds the
                # decode kernel). The DMA stays chunk-granular.
                def sub(u, carry2):
                    m, l, acc = carry2
                    base_u = u * SUBLEN
                    kvs = kv_buf[slot, pl.ds(base_u, SUBLEN)].reshape(
                        SUBLEN, W)                           # [SUBLEN, W]
                    if masked:
                        # Zero rows never DMA'd (stale VMEM): 0 * NaN poisons
                        # p@v. Only the final chunk can be partially covered,
                        # so the masking pass is gated on it.
                        key_col = (c * chunk + base_u
                                   + jax.lax.broadcasted_iota(
                                       jnp.int32, (SUBLEN, 1), 0))
                        lim = pages_needed * (chunk // chunk_pages)
                        kvs = jax.lax.cond(
                            lim < c * chunk + base_u + SUBLEN,
                            lambda k: jnp.where(key_col < lim, k, 0),
                            lambda k: k, kvs)
                    if W > 2 * KH:
                        # fp8 per-token scales: recover in SCORE space via a
                        # one-hot selector matmul (MXU transposes the scale
                        # column for free).
                        ri2 = jax.lax.broadcasted_iota(jnp.int32, (2, W), 0)
                        ci2 = jax.lax.broadcasted_iota(jnp.int32, (2, W), 1)
                        E2 = (ci2 == 2 * KH + ri2).astype(q4.dtype)
                        sel = jax.lax.dot_general(
                            E2, kvs.astype(q4.dtype), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        inv2 = 1.0 / jnp.maximum(sel, 1e-20)
                        # Fold the log2-space conversion (or, for window
                        # models which stay in linear space, sm_scale) in.
                        krow = inv2[0:1] * (sm_scale if window else K2E)
                        vrow = inv2[1:2]                     # [1, SUBLEN]
                    else:
                        krow = vrow = None
                    if masked:
                        key_pos = (c * chunk + base_u
                                   + jax.lax.broadcasted_iota(
                                       jnp.int32, (1, SUBLEN), 1))
                        valid = (key_pos <= q_pos) & (key_pos < seq_len)
                        # Sliding window: keys in (q_pos - window, q_pos]
                        # only. Masked at WIN_NEG (below m0) because early
                        # chunks can be window-masked in FULL.
                        in_win = ((key_pos > q_pos - window) if window
                                  else None)
                        # Mask-MULTIPLY (non-window): instead of a per-head
                        # select pass over the scores, zero the PROBABILITIES
                        # with one shared mask. The row max then runs over
                        # raw scores — any max >= the masked max keeps the
                        # online softmax exact (numerator and denominator
                        # scale identically; zeroed p's enter neither), and
                        # invalid keys are real finite cache tokens, so the
                        # raw max has the same magnitude as the masked one.
                        mask01 = (valid.astype(jnp.float32)
                                  if maskmul else None)

                    # bf16 scores (opt-in): the [NG, chunk] score matrix and
                    # the exp2 pass run in bf16 — the VPU softmax is the tile
                    # kernel's bottleneck at hd=64, and halving its element
                    # width halves those passes. Only on the standard path
                    # (fp8 folds scales into the scores, window needs the
                    # WIN_NEG sentinel ordering — both keep f32).
                    bf16_sc = (_tile_bf16_scores() and krow is None
                               and not window)
                    s_dtype = jnp.bfloat16 if bf16_sc else jnp.float32
                    new_m, new_l, new_acc = [], [], []
                    for h in range(n_kv):
                        qh = qhs[h]                          # [NG, hd]
                        kh = kvs[:, h * hd:(h + 1) * hd]
                        vh = kvs[:, KH + h * hd:KH + (h + 1) * hd]
                        # MXU accumulators must be 32-bit (Mosaic rejects a
                        # bf16 preferred_element_type); the bf16-scores mode
                        # narrows right after the matmul so the max/exp2/mask
                        # passes run at half width.
                        s = jax.lax.dot_general(
                            qh, kh.astype(qh.dtype), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # RAW scores
                        if bf16_sc:
                            s = s.astype(jnp.bfloat16)
                        if krow is not None:  # fp8: per-key unscale (+scale)
                            s = s * krow
                        elif window:
                            s = s * sm_scale  # linear space (WIN_NEG sentinel
                                              # ordering vs NEG_INF needs it)
                        if masked and not maskmul:
                            s = jnp.where(valid, s, NEG_INF)
                            if in_win is not None:
                                s = jnp.where(in_win, s, WIN_NEG)
                        if window:
                            mi = jnp.maximum(
                                m[h], jnp.max(s, axis=-1, keepdims=True))
                            p = jnp.exp(s - mi)
                            scale = jnp.exp(m[h] - mi)
                        else:
                            # m/l live in LOG2 space: the row max of the raw
                            # scores is rescaled on the [NG, 1] axis (cheap)
                            # and exp2's fused multiply applies K2E to the
                            # full tile in one pass — no standalone sm_scale
                            # pass, no exp-internal log2e multiply.
                            if krow is None:
                                mi = jnp.maximum(
                                    m[h],
                                    jnp.max(s, axis=-1, keepdims=True)
                                    .astype(jnp.float32) * K2E)
                                p = jnp.exp2(s * s_dtype(K2E)
                                             - mi.astype(s_dtype))
                            else:   # fp8: krow already folded K2E into s
                                mi = jnp.maximum(
                                    m[h], jnp.max(s, axis=-1, keepdims=True))
                                p = jnp.exp2(s - mi)
                            scale = jnp.exp2(m[h] - mi)
                        if masked and maskmul:
                            p = p * mask01.astype(p.dtype)
                        if vrow is not None or hd >= 128:
                            # fp8: l needs sum(p) UNscaled while p@V needs
                            # p*vrow — the rider column can't serve both. And
                            # at hd >= 128 the output lanes are already full,
                            # so the rider would WIDEN the matmul instead of
                            # riding free.
                            p_v = p * vrow if vrow is not None else p
                            li = (l[h] * scale
                                  + jnp.sum(p, axis=-1, keepdims=True))
                            ai = acc[h] * scale + jax.lax.dot_general(
                                p_v.astype(qh.dtype), vh.astype(qh.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        else:
                            pv = jax.lax.dot_general(
                                p.astype(qh.dtype),
                                jnp.concatenate([vh.astype(qh.dtype), e0],
                                                axis=1),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            li = l[h] * scale + pv[:, hd:hd + 1]
                            ai = acc[h] * scale + pv[:, :hd]
                        new_m.append(mi)
                        new_l.append(li)
                        new_acc.append(ai)
                    return (jnp.stack(new_m), jnp.stack(new_l),
                            jnp.stack(new_acc))

                if NSUB == 1:
                    return sub(0, carry)
                return jax.lax.fori_loop(0, NSUB, sub, carry)

            return body

        m, l, acc = jax.lax.fori_loop(c_lo, num_chunks, make_body(True),
                                      (m0, l0, a0))
        for h in range(n_kv):
            out_h = (acc[h] / jnp.maximum(l[h], 1e-30)).astype(o_buf.dtype)
            for j in range(group):
                o_buf[:, (h * group + j) * hd:(h * group + j + 1) * hd] = (
                    out_h[j * span:(j + 1) * span])
        o_dma = pltpu.make_async_copy(
            o_buf, o_hbm.at[pl.ds(tile_start, span), :], o_sem)
        o_dma.start()
        o_dma.wait()


def _chunk_geometry(Pg, page_size, W, itemsize, max_chunk_pages):
    """KV chunk sizing (W = cache lane width). Measured on v5e (SURVEY sweep
    2026-08-16): ~512KB per buffer with double-buffering reaches streaming
    peak; full-context chunks serialize DMA behind compute and crater to
    <10% of peak."""
    buf_budget = 512 * 1024
    max_chunk_tokens = max(page_size, buf_budget // (W * itemsize))
    chunk_pages = max(1, min(Pg, next_power_of_2(max_chunk_tokens // page_size + 1) // 2))
    # v5e has 512 DMA-semaphore slots ("sflag" space); the double-buffered
    # per-page semaphore array (2 x chunk_pages) must fit with headroom.
    chunk_pages = min(chunk_pages, 128)
    if max_chunk_pages is not None:
        chunk_pages = min(chunk_pages, max_chunk_pages)
    return chunk_pages, cdiv(Pg, chunk_pages)


def ragged_paged_attention(q, cache3, layer, batch, *, n_kv: int,
                           page_size: int, sm_scale: float, q_bucket: int,
                           kv_new=None, kv_pend=None, npend=None,
                           interpret: bool | None = None,
                           max_chunk_pages: int | None = None,
                           staged_pt: bool | None = None,
                           window: int = 0):
    """q: [T, n_q, hd]; cache3: [L, S, n_kv*2*hd] — the FULL 3-D cache
    (per-shard), lanes laid out as [K_all ‖ V_all]: the shard's n_kv K heads
    contiguous, then its V heads. The kernel indexes the
    layer (a traced scalar) directly on the HBM ref, so XLA never materializes
    a per-layer slice or a layout change of the cache.

    kv_new: optional [T, n_kv*2*hd] — the step's freshly projected K‖V. When
    given (decode path), the KERNEL writes it to the cache slots
    (batch.kv_slots) with the cache aliased in/out, and returns
    (out, updated_cache). An XLA-level scatter next to this custom call forces
    whole-cache copies every layer; the fused write keeps the update in place.
    Without kv_new, returns just `out` (caller has already scattered).

    kv_pend/npend (deferred-commit decode, multi-step windows): kv_pend is
    [L, GB, P*R*W] (group-major; see decode_group_geometry) — the window's
    COMPLETED pending tokens per layer, of which the first ``npend - 1``
    (traced scalar) are live; kv_new still carries the CURRENT token. The
    row's CACHED history is seq_lens - npend keys. The kernel does NOT touch
    the cache (returns just `out`; the caller commits the whole window once,
    after the multi-step scan) — removing the per-grid-step read-modify-write
    page write-back that dominated short-context decode's fixed cost
    (docs/RESULTS_r4.md)."""
    if interpret is None:
        interpret = _interpret_default()
    T, n_q, hd = q.shape
    B, Pg = batch.page_table.shape
    # Lane width: [K_all ‖ V_all] plus, under fp8 KV quant, one trailing
    # 128-lane tile of per-token power-of-2 K/V scales (lane 0 = K, 1 = V).
    SL = cache3.shape[2] - 2 * n_kv * hd
    assert cache3.ndim == 3 and SL in (0, 128), \
        f"cache lanes {cache3.shape[2]} vs 2*n_kv*hd={2*n_kv*hd}"
    W = 2 * n_kv * hd + SL
    assert (n_q * hd) % 128 == 0, f"n_q*hd={n_q*hd} must be 128-aligned"
    assert W % 128 == 0, f"cache lane dim {W} must be 128-aligned"
    assert W % hd == 0

    itemsize = jnp.dtype(cache3.dtype).itemsize
    chunk_pages, max_chunks = _chunk_geometry(
        Pg, page_size, W, itemsize, max_chunk_pages)
    # Pad the page table so chunk reads never index out of bounds.
    pt = batch.page_table
    pad_pages = chunk_pages * max_chunks - Pg
    if pad_pages:
        pt = jnp.pad(pt, ((0, 0), (0, pad_pages)))
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))

    tile_q = tile_q_for(q_bucket)
    scalars = (layer_arr, batch.q_starts, batch.q_lens, batch.seq_lens, pt)

    if tile_q == 1:
        # Decode: the builder packs decode tokens so flat index == row index.
        # CONTRACT: valid rows (q_lens > 0) must form a contiguous PREFIX of
        # the batch — the kernel's cross-row DMA prefetch chain only checks
        # row b+1, so a valid row after an invalid one would wait on a
        # semaphore nobody signaled and hang the device. build_step_batch
        # packs decode rows first, which guarantees this; direct callers must
        # uphold it themselves (q_lens is traced, so it cannot be checked here).
        assert T >= B, f"decode path needs T({T}) >= B({B})"
        deferred = kv_pend is not None
        if deferred:
            assert kv_new is not None and npend is not None, \
                "deferred commit: kv_new carries the current token, kv_pend " \
                "the window's completed tokens"
            assert SL == 0, "deferred commit holds unscaled rows (no fp8)"
            npend_arr = jnp.reshape(jnp.asarray(npend, jnp.int32), (1,))
        else:
            assert kv_new is not None, "decode path fuses the KV-cache update"
        kv_slots_l = batch.kv_slots[:B]
        # Contiguous fast path: rows whose `need` pages are consecutive pool
        # pages AND fit one chunk take ONE pow2-sized DMA instead of
        # per-page copies (sel = that pow2 count; 0 = per-page path).
        hist = (jnp.maximum(batch.seq_lens - npend_arr[0], 0) if deferred
                else jnp.maximum(batch.seq_lens - 1, 0))
        need = (hist + page_size - 1) // page_size                     # [B]
        idx = jnp.arange(Pg - 1, dtype=jnp.int32)
        steps_ok = jnp.where(
            idx[None, :] < (need - 1)[:, None],
            batch.page_table[:, 1:] == batch.page_table[:, :-1] + 1, True)
        contig = jnp.all(steps_ok, axis=1)
        pow2 = jnp.select([need <= z for z in _FAST_SIZES],
                          list(_FAST_SIZES), 0)
        pages_per_layer = cache3.shape[1] // page_size
        fits = batch.page_table[:, 0] + pow2 <= pages_per_layer
        sel = jnp.where((need > 0) & (batch.q_lens[:B] > 0) & contig & fits
                        & (pow2 > 0) & (pow2 <= chunk_pages),
                        pow2, 0).astype(jnp.int32)
        # RMW write-back granule: the dtype's sublane tile (the smallest
        # safely-DMA-legal row block), capped at the page so a granule never
        # spans two rows' pages (tiny test pages; production fp8 validates
        # block_size % 32 == 0).
        wgran = min({4: 8, 2: 16, 1: 32}[itemsize], page_size)
        # Rows per grid step (grouped kernel), capped by the batch itself:
        # padding a 1-row batch up to R=4 quadruples every lane block, DMA
        # buffer and block-diag matmul for nothing (b1 long-context decode
        # measured 4x the MXU work of R=1). B is a pow2 bucket, so R | B.
        R, Bp, _GB = decode_group_geometry(B)
        # Grouped kernel: bigger per-slot KV buffers (R lane blocks wide).
        # ~256-token chunks: the block-diag matmuls span the whole chunk
        # buffer (masked), so oversizing the chunk burns MXU FLOPs on
        # padding — at short serving contexts a 512-token chunk doubled
        # the attention matmul work for nothing. 256 still covers typical
        # short-context histories with ONE fast-path DMA, and bounds the
        # padding waste at long context to under one chunk.
        base_tokens = int(os.environ.get("SWIFTLLM_DECODE_CHUNK", "256"))
        chunk_pages = max(1, min(Pg, max(base_tokens // page_size, 1)))
        # Long histories: grow the chunk so a row's whole history streams in
        # ~16 chunk rounds — at 131Ki tokens a 256-token chunk runs 512
        # serial DMA+score rounds per layer, pure latency. The short-context
        # floor stays 256 tokens (bounds block-diag padding waste); ceilings:
        # the VMEM budget below and the DMA-semaphore cap.
        want = next_power_of_2(max(cdiv(Pg * page_size, 16), 1))
        chunk_pages = max(chunk_pages, min(Pg, want // page_size))
        # VMEM guard (wide-W models) + 512-slot DMA-semaphore cap
        # (kv_sems is 2*R*chunk_pages + 2R write-back pairs).
        while (2 * R * chunk_pages * page_size * W * itemsize
               > 8 * 1024 * 1024) and chunk_pages > 1:
            chunk_pages //= 2
        chunk_pages = min(chunk_pages, max(32, 256 // (2 * R)))
        if max_chunk_pages is not None:
            chunk_pages = min(chunk_pages, max_chunk_pages)
        max_chunks = cdiv(Pg, chunk_pages)
        pad_pages = chunk_pages * max_chunks - Pg
        pt_g = (jnp.pad(batch.page_table, ((0, 0), (0, pad_pages)))
                if pad_pages else batch.page_table)
        sel = jnp.where(sel <= chunk_pages, sel, 0)
        # Contiguous MULTI-chunk rows (long histories): every full chunk is
        # one static chunk_pages-sized DMA (sel = -1; the kernel's per-page
        # path covers only the ragged tail). Middle chunks read exactly the
        # row's own consecutive pages, so no over-read guard is needed.
        sel = jnp.where((sel == 0) & contig & (batch.q_lens[:B] > 0)
                        & (need > chunk_pages), -1, sel)
        # sel = -2: like -1, but the ragged TAIL chunk is also ONE full
        # chunk-sized DMA that over-reads the neighbouring pool pages
        # (finite KV of other rows; scores past the row's history are
        # masked) — per-page tail copies cost a DMA issue per page, which
        # dominates the kernel at short contexts. Requires the over-read to
        # stay inside the pool.
        row_chunks = (need + chunk_pages - 1) // chunk_pages
        safe = (batch.page_table[:, 0] + row_chunks * chunk_pages
                <= pages_per_layer)
        sel = jnp.where((sel == -1) & safe, -2, sel)
        q_lens_l = batch.q_lens
        seq_lens_l = batch.seq_lens
        q_rows = q[:B].reshape(B * n_q, hd)
        kv_new_rows = kv_new[:B]
        if Bp != B:
            rp = Bp - B
            q_lens_l = jnp.pad(q_lens_l, (0, rp))
            seq_lens_l = jnp.pad(seq_lens_l, (0, rp))
            kv_slots_l = jnp.pad(kv_slots_l, (0, rp))
            sel = jnp.pad(sel, (0, rp))
            pt_g = jnp.pad(pt_g, ((0, rp), (0, 0)))
            q_rows = jnp.pad(q_rows, ((0, rp * n_q), (0, 0)))
            kv_new_rows = jnp.pad(kv_new_rows, ((0, rp), (0, 0)))
        GB = Bp // R
        br = 8 if GB % 8 == 0 else GB
        Pg_p = pt_g.shape[1]
        # Page-table mode: scalar-prefetch while [rows, Pg] fits SMEM; beyond
        # that, ship the table as an HBM operand and let the kernel stage it
        # (staged_pages_cap is the hard ceiling either way).
        staged = (staged_pt if staged_pt is not None
                  else Bp * Pg_p * 4 > SMEM_BYTES - SMEM_HEADROOM)
        if staged:
            # The per-row staging DMA (pt_hbm.at[b] -> SMEM) requires the
            # table's minor dim be a full lane tile; pad Pg up to 128.
            if Pg_p % 128:
                pt_g = jnp.pad(pt_g, ((0, 0), (0, 128 - Pg_p % 128)))
                Pg_p = pt_g.shape[1]
            assert Pg_p <= staged_pages_cap(), (
                f"pages/seq {Pg_p} exceeds the HBM-staged page-table cap "
                f"{staged_pages_cap()} (≈{staged_pages_cap() * page_size} "
                f"tokens at this page size)")
        kv_val = kv_new_rows.reshape(GB, R * W)
        in_specs = [
            pl.BlockSpec((R * n_q, hd), lambda g, *refs: (g, 0)),  # q
            pl.BlockSpec((br, R * W), lambda g, *refs: (g // br, 0)),
        ]
        if deferred:
            # Pending buffer [L, GB, P*RW], ALREADY in the kernel's
            # group-major lane layout (decode_group_geometry tells the caller
            # R): the BlockSpec indexes the LAYER via the scalar-prefetched
            # layer id, so no per-layer XLA slice/relayout ever materializes.
            Lp, GBp, PRW = kv_pend.shape
            assert GBp == GB and PRW % (R * W) == 0, \
                f"kv_pend {kv_pend.shape} vs GB={GB}, RW={R * W}"
            P = PRW // (R * W)
            in_specs.append(pl.BlockSpec(
                (1, br, PRW), lambda g, *refs: (refs[0][0], g // br, 0)))
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.HBM))  # cache (aliased/read-only)
        scratch = [
            pltpu.VMEM((2, chunk_pages * page_size, R * W),
                       cache3.dtype),
            pltpu.SemaphoreType.DMA((2, R, chunk_pages)),
        ]
        if not deferred:
            scratch += [
                pltpu.VMEM((2, R, wgran, W), cache3.dtype),  # w_buf (RMW tile)
                pltpu.SemaphoreType.DMA((2, R)),   # page reads
                pltpu.SemaphoreType.DMA((2, R)),   # page writes (deferred)
            ]
        scratch += [pltpu.SMEM((1,), jnp.int32)]   # chunk-slot parity
        if not deferred:
            scratch += [pltpu.SMEM((2, R), jnp.int32)]  # write pending flags
        slot_scalar = npend_arr if deferred else kv_slots_l
        kv_in = (q_rows, kv_val) + ((kv_pend,) if deferred else ())
        if staged:
            scalars = (layer_arr, q_lens_l, seq_lens_l, slot_scalar, sel)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # pt
            scratch += [pltpu.SMEM((2, R, Pg_p), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, R))]
            inputs = kv_in + (cache3, pt_g)
        else:
            scalars = (layer_arr, q_lens_l, seq_lens_l, pt_g, slot_scalar,
                       sel)
            inputs = kv_in + (cache3,)
        n_sc = len(scalars)
        out_specs = [pl.BlockSpec((R * n_q, hd), lambda g, *refs: (g, 0))]
        out_shape = [jax.ShapeDtypeStruct((Bp * n_q, hd), q.dtype)]
        if deferred:
            aliases = {}
        else:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # cache out
            out_shape.append(jax.ShapeDtypeStruct(cache3.shape, cache3.dtype))
            # cache operand index: scalars + q + kv (+0) = n_sc + 2.
            aliases = {n_sc + 2: 1}
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_sc,
            grid=(GB,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        kernel = functools.partial(
            _decode_kernel_grouped, page_size=page_size,
            chunk_pages=chunk_pages, sm_scale=sm_scale, n_q=n_q,
            n_kv=n_kv, hd=hd, n_rows=Bp, R=R, br=br, W=W, wgran=wgran,
            staged=staged, window=window, pend=P if deferred else 0)
        # Realistic VMEM hint: kv_buf is guarded to <= 8 MiB, w_buf/scores are
        # small. A blanket 100 MiB hint made XLA's VMEM planner reject MIXED
        # programs (decode + tile kernels in one step: 100 + 100 > the chip's
        # 128 MiB plan budget).
        res = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*scalars, *inputs)
        out = res[0]
        if not deferred:
            cache3 = res[1]
        out = out[:B * n_q].reshape(B, n_q * hd)
        if T > B:
            out = jnp.pad(out, ((0, T - B), (0, 0)))
        out = out.reshape(T, n_q, hd)
        return out if deferred else (out, cache3)

    # Tile path: each q-tile re-streams its row's KV history, so the
    # per-chunk fixed cost (DMA waits + loop bookkeeping) multiplies by
    # tiles x chunks. Use larger chunks than the decode path (2 MiB/slot) to
    # cut the iteration count; the 512-slot semaphore cap still binds.
    # Oversized chunks waste score/pv work on masked keys when histories are
    # short (num_chunks rounds kv_needed UP to a whole chunk) — env-sweepable.
    tile_budget = int(os.environ.get("SWIFTLLM_TILE_CHUNK_BYTES",
                                     2 * 1024 * 1024))
    tile_tokens = max(page_size, tile_budget // (W * itemsize))
    chunk_pages = max(1, min(Pg, tile_tokens // page_size))
    chunk_pages = min(chunk_pages, 32)
    # Cap chunk TOKENS too: big pages would otherwise grow the chunk (and
    # with it the f32 [NG, chunk] score temps) past the VMEM plan budget.
    chunk_pages = min(chunk_pages, max(1, 1024 // page_size))
    if max_chunk_pages is not None:
        chunk_pages = min(chunk_pages, max_chunk_pages)
    max_chunks = cdiv(Pg, chunk_pages)
    pad_pages = chunk_pages * max_chunks - Pg
    pt = (jnp.pad(batch.page_table, ((0, 0), (0, pad_pages)))
          if pad_pages else batch.page_table)
    Pg_p = pt.shape[1]
    # Contiguous-page DMA coalescing (same sel encoding as the decode path):
    # rows whose pages are consecutive pool pages stream each FULL chunk as
    # one DMA (sel = -1), or the whole history as one pow2-sized DMA when it
    # fits a single chunk (sel = pow2). Fresh-allocator prefill rows are
    # almost always contiguous, so this removes the per-page DMA issue cost
    # that multiplies across tiles x chunks.
    need_t = (batch.seq_lens + page_size - 1) // page_size            # [B]
    idx_t = jnp.arange(Pg_p - 1, dtype=jnp.int32)
    steps_ok_t = jnp.where(idx_t[None, :] < (need_t - 1)[:, None],
                           pt[:, 1:] == pt[:, :-1] + 1, True)
    contig_t = jnp.all(steps_ok_t, axis=1)
    pow2_t = jnp.select([need_t <= z for z in _FAST_SIZES],
                        list(_FAST_SIZES), 0)
    fits_t = pt[:, 0] + pow2_t <= cache3.shape[1] // page_size
    valid_t = (batch.q_lens > 0) & (need_t > 0)
    sel_t = jnp.where(valid_t & contig_t & fits_t & (pow2_t > 0)
                      & (pow2_t <= chunk_pages), pow2_t, 0)
    sel_t = jnp.where((sel_t == 0) & valid_t & contig_t
                      & (need_t > chunk_pages), -1, sel_t).astype(jnp.int32)
    staged = (staged_pt if staged_pt is not None
              else B * Pg_p * 4 > SMEM_BYTES - SMEM_HEADROOM)
    if staged:
        # Lane-tile alignment for the per-row staging DMA (see decode path).
        if Pg_p % 128:
            pt = jnp.pad(pt, ((0, 0), (0, 128 - Pg_p % 128)))
            Pg_p = pt.shape[1]
        assert Pg_p * 4 <= SMEM_BYTES - 2 * SMEM_HEADROOM, \
            f"pages/seq {Pg_p} exceeds the tile kernel's staged SMEM budget"
        scalars = (layer_arr, batch.q_starts, batch.q_lens, batch.seq_lens,
                   sel_t)
        extra_in = [pl.BlockSpec(memory_space=pltpu.HBM)]       # pt
        extra_scratch = [pltpu.SMEM((Pg_p,), jnp.int32),
                         pltpu.SemaphoreType.DMA]
    else:
        scalars = (layer_arr, batch.q_starts, batch.q_lens, batch.seq_lens,
                   pt, sel_t)
        extra_in = []
        extra_scratch = []

    # Span selection: fuse up to 4 builder tiles per grid step (each span
    # streams its KV once — see _tiles_kernel) subject to a VMEM budget for
    # the span-sized q/o staging and fp32 online-softmax state. ~10 MiB keeps
    # the kernel, KV double-buffers and compiler temps inside the ~16 MiB
    # physical VMEM.
    span = tile_q
    FQ = n_q * hd                       # flat q/o lane width (128-aligned)
    per_row = FQ * 2 * jnp.dtype(q.dtype).itemsize + FQ * 4
    # Span cap: the kernel's scoped-VMEM peak is dominated by f32 [NG, chunk]
    # score/prob temps (NG = group*span), so the span is the VMEM lever that
    # does NOT serialize compute (fori sub-chunking measured 20% slower).
    # Default mult 2 (span 256 at 1B dims): measured FASTER than span 512 on
    # v5e (0.616 vs 0.548 MFU at b8/c2048 — smaller temps schedule better)
    # AND it keeps tile + decode inside the 128 MiB VMEM plan for mixed
    # programs. Env-sweepable via SWIFTLLM_TILE_SPAN_MULT.
    max_mult = int(os.environ.get("SWIFTLLM_TILE_SPAN_MULT", "2"))
    for mult in (4, 2):
        cand = tile_q * mult
        if (mult <= max_mult and cand <= q_bucket
                and cand * per_row <= 10 * 1024 * 1024):
            span = cand
            break
    # Fused span-KV write (kv_new given): the kernel writes each tile's fresh
    # KV into the row's pages itself, replacing the XLA token scatter (see
    # _tiles_kernel docstring). Requires page-aligned span starts, which the
    # caller guarantees only for page-multiple q buckets.
    fused = kv_new is not None
    if fused:
        assert q_bucket % page_size == 0 and span % page_size == 0, (
            f"fused tile KV write needs page-multiple spans "
            f"(q_bucket={q_bucket}, span={span}, page_size={page_size})")
        assert kv_new.shape == (T, W), (kv_new.shape, (T, W))
    # The fixed-size span DMA can overshoot a short row's tile-aligned
    # allotment into (and past) the following rows; pad q/o so the overshoot
    # stays in-bounds (the overshot rows are causally masked).
    T_pad = T + (span - tile_q)
    T_pad = cdiv(T_pad, tile_q) * tile_q

    fused_in = [pl.BlockSpec(memory_space=pltpu.HBM)] if fused else []
    fused_scratch = ([
        pltpu.VMEM((span, W), cache3.dtype),            # kvn_buf
        pltpu.SemaphoreType.DMA,                        # kvn_sem
        pltpu.VMEM((page_size, W), cache3.dtype),       # pw_buf (tail RMW)
        pltpu.SemaphoreType.DMA,                        # pw_sem
        pltpu.SemaphoreType.DMA((span // page_size,)),  # wr_sems
    ] if fused else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(B, cdiv(q_bucket, span)),
        in_specs=[
            # Explicit HBM: with pl.ANY the compiler may promote small arrays
            # to VMEM, where unaligned slices are illegal.
            pl.BlockSpec(memory_space=pltpu.HBM),   # q
        ] + fused_in + [                            # [kv_new]
            pl.BlockSpec(memory_space=pltpu.HBM),   # cache
        ] + extra_in,
        out_specs=([pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec(memory_space=pltpu.HBM)] if fused
                   else pl.BlockSpec(memory_space=pltpu.HBM)),
        scratch_shapes=[
            pltpu.VMEM((span, FQ), q.dtype),                                # q_buf
            pltpu.VMEM((2, chunk_pages * page_size, W), cache3.dtype),
            pltpu.VMEM((span, FQ), q.dtype),                                # o_buf
            pltpu.SemaphoreType.DMA,                                        # q_sem
            pltpu.SemaphoreType.DMA((2, chunk_pages)),                      # kv_sems
            pltpu.SemaphoreType.DMA,                                        # o_sem
        ] + fused_scratch + extra_scratch,
    )
    kernel = functools.partial(
        _tiles_kernel, page_size=page_size, span=span, align=tile_q,
        chunk_pages=chunk_pages, sm_scale=sm_scale, n_q=n_q, n_kv=n_kv, hd=hd,
        W=W, staged=staged, window=window, fused=fused)
    # Flat [T, n_q*hd] q in/out: the projection GEMM's own dense layout, no
    # boundary transpose (a head-major operand layout was getting folded into
    # the wq GEMM, halving its MXU efficiency — r4 step profile).
    q_fl = q.reshape(T, FQ)
    if T_pad > T:
        q_fl = jnp.pad(q_fl, ((0, T_pad - T), (0, 0)))
    inputs = (q_fl,)
    if fused:
        kvn = kv_new if T_pad == T else jnp.pad(kv_new,
                                                ((0, T_pad - T), (0, 0)))
        inputs += (kvn,)
    inputs += (cache3,)
    if staged:
        inputs += (pt,)
    if fused:
        # flat operand index of the cache: scalars, q, kv_new, cache.
        aliases = {len(scalars) + 2: 1}
        out_shape = [jax.ShapeDtypeStruct((T_pad, FQ), q.dtype),
                     jax.ShapeDtypeStruct(cache3.shape, cache3.dtype)]
    else:
        aliases = {}
        out_shape = jax.ShapeDtypeStruct((T_pad, FQ), q.dtype)
    # VMEM hint from the actual geometry: ~6 concurrently-live f32
    # [NG, chunk] score/prob temps (measured ~99 MiB at span 512/chunk 1024,
    # 32 MiB at 8B-dims span 256/chunk 256) + the double-buffered KV slab,
    # q/o staging, softmax carry state, and a fixed compiler margin.
    NG_ = (n_q // n_kv) * span
    chunk_t = chunk_pages * page_size
    tile_vmem = min(
        100 * 1024 * 1024,
        16 * 1024 * 1024                                  # compiler margin
        + 6 * NG_ * chunk_t * 4                           # score/prob temps
        + 2 * chunk_t * W * itemsize                      # kv_buf slots
        + 2 * span * FQ * jnp.dtype(q.dtype).itemsize * 2   # q/o staging
        + 2 * n_kv * NG_ * (hd + 8) * 4)                  # m/l/acc carries
    out2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=tile_vmem),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*scalars, *inputs)
    if fused:
        out2, cache3 = out2
        return out2[:T].reshape(T, n_q, hd), cache3
    return out2[:T].reshape(T, n_q, hd)
